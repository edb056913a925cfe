package graft
import org.apache.spark.sql.SparkSession
object ScratchCount {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val shuffle = raw"(?<!Broadcast)Exchange (hash|range)partitioning".r
    if (args.headOption.contains("schema")) {
      // gate-representation sweep: flag output columns the driver's pandas
      // comparator cannot hash/sort reliably (arrays/maps/structs, and
      // decimals wider than 18 digits whose values can exceed 2^53)
      import org.apache.spark.sql.types._
      graft.operators.Catalog.all
        .filterNot(q => q.name.startsWith("x") ||
          q.name == "e05_eth_stream_scan" || q.name == "e06_arrow_roundtrip" ||
          q.name == "d24_incremental_clusters")
        .foreach { q =>
          val schema = q.build(spark, "/root/testdata/sf0.001").schema
          val bad = schema.fields.collect {
            case f if f.dataType.isInstanceOf[ArrayType] ||
              f.dataType.isInstanceOf[MapType] ||
              f.dataType.isInstanceOf[StructType] => s"${f.name}:${f.dataType.simpleString}"
            case f @ StructField(_, d: DecimalType, _, _) if d.precision > 18 =>
              s"${f.name}:${d.simpleString}"
          }
          if (bad.nonEmpty) println(s"[schema] ${q.name} ${bad.mkString(" ")}")
        }
      println("[schema] sweep done")
    } else {
      val names = args.toSeq
      names.foreach { n =>
        val df = graft.operators.Catalog.byName(n).build(spark, "/root/testdata/sf0.001")
        val plan = df.queryExecution.executedPlan.toString
        val smells = Seq("CartesianProduct", "BroadcastNestedLoopJoin", "SinglePartition")
          .filter(plan.contains)
        println(s"[scratch] $n shuffles=${shuffle.findAllIn(plan).size} smells=${smells.mkString(",")}")
      }
    }
    spark.stop()
  }
}
