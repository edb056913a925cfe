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
    val names = Seq("c61_variant")
    names.foreach { n =>
      val df = graft.operators.Catalog.byName(n).build(spark, "/root/testdata/sf0.001")
      val plan = df.queryExecution.executedPlan.toString
      val smells = Seq("CartesianProduct", "BroadcastNestedLoopJoin", "SinglePartition")
        .filter(plan.contains)
      println(s"[scratch] $n shuffles=${shuffle.findAllIn(plan).size} smells=${smells.mkString(",")}")
    }
    spark.stop()
  }
}
