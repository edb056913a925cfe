package graft.arrow

import java.io.{File, FileOutputStream}
import java.nio.channels.Channels

import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.complex.ListVector
import org.apache.arrow.vector.ipc.{ArrowStreamReader, ArrowStreamWriter}
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ArrowSchema}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Arrow IPC edge (SURVEY M5 — reference S16/S17/S21): the columnar output
  * surface. The reference hand-populates Arrow vectors per dataset with a
  * two-pass pre-size-then-fill loop (Converter.java:126-293); here one
  * generic schema-driven writer covers every DataFrame, executed
  * partition-parallel: each task writes its partition as an independent
  * Arrow IPC stream file (the unit a Flight `do_get` endpoint would serve).
  *
  * Supported Spark types: the reference schemas' closure — string, long,
  * int, boolean, double, binary, array<string>.
  */
object ArrowEdge {

  /** Arrow schema mirroring a Spark schema (nullable everywhere, like the
    * reference's schemas — Converter.java:41-52).
    */
  def toArrowSchema(schema: StructType): ArrowSchema = {
    val fields = schema.fields.map { f =>
      f.dataType match {
        case StringType => Field.nullable(f.name, ArrowType.Utf8.INSTANCE)
        case LongType => Field.nullable(f.name, new ArrowType.Int(64, true))
        case IntegerType => Field.nullable(f.name, new ArrowType.Int(32, true))
        case BooleanType => Field.nullable(f.name, ArrowType.Bool.INSTANCE)
        case DoubleType =>
          Field.nullable(f.name, new ArrowType.FloatingPoint(
            org.apache.arrow.vector.types.FloatingPointPrecision.DOUBLE))
        case BinaryType => Field.nullable(f.name, ArrowType.Binary.INSTANCE)
        case ArrayType(StringType, _) =>
          new Field(f.name, FieldType.nullable(ArrowType.List.INSTANCE),
            List(Field.nullable("item", ArrowType.Utf8.INSTANCE)).asJava)
        case other => throw new IllegalArgumentException(
          s"ArrowEdge: unsupported type ${other.sql} for column ${f.name}")
      }
    }
    new ArrowSchema(fields.toList.asJava)
  }

  private def fill(root: VectorSchemaRoot, schema: StructType, rows: Seq[Row]): Unit = {
    root.allocateNew()
    rows.zipWithIndex.foreach { case (row, i) =>
      schema.fields.zipWithIndex.foreach { case (f, c) =>
        val vec = root.getVector(c)
        if (row.isNullAt(c)) {
          vec match {
            case v: ListVector => v.setNull(i)
            case v: BaseFixedWidthVector => v.setNull(i)
            case v: BaseVariableWidthVector => v.setNull(i)
            case _ => throw new IllegalStateException(s"unhandled null vector ${vec.getClass}")
          }
        } else f.dataType match {
          case StringType =>
            vec.asInstanceOf[VarCharVector].setSafe(i, row.getString(c).getBytes("UTF-8"))
          case LongType => vec.asInstanceOf[BigIntVector].setSafe(i, row.getLong(c))
          case IntegerType => vec.asInstanceOf[IntVector].setSafe(i, row.getInt(c))
          case BooleanType =>
            vec.asInstanceOf[BitVector].setSafe(i, if (row.getBoolean(c)) 1 else 0)
          case DoubleType => vec.asInstanceOf[Float8Vector].setSafe(i, row.getDouble(c))
          case BinaryType =>
            vec.asInstanceOf[VarBinaryVector].setSafe(i, row.getAs[Array[Byte]](c))
          case ArrayType(StringType, _) =>
            val lv = vec.asInstanceOf[ListVector]
            val writer = lv.getWriter
            writer.setPosition(i)
            writer.startList()
            row.getSeq[String](c).foreach { s =>
              val bytes = s.getBytes("UTF-8")
              val buf = lv.getAllocator.buffer(bytes.length)
              try {
                buf.writeBytes(bytes)
                writer.varChar().writeVarChar(0, bytes.length, buf)
              } finally buf.close()
            }
            writer.endList()
          case other => throw new IllegalArgumentException(s"unsupported ${other.sql}")
        }
      }
    }
    root.setRowCount(rows.size)
  }

  /** Write a DataFrame as Arrow IPC stream files, one per partition,
    * batching `batchSize` rows per Arrow record batch (the `batch_size`
    * the reference documents but never implemented — README.md:26,
    * SURVEY §8.1). Runs on executors; no driver collect.
    */
  def writeIpc(df: DataFrame, dir: String, batchSize: Int = 4096): Unit = {
    val schema = df.schema
    val arrowSchemaJson = schema.json // ship the Spark schema, rebuild per task
    df.rdd.foreachPartition { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val sparkSchema = DataType.fromJson(arrowSchemaJson).asInstanceOf[StructType]
      val allocator = new RootAllocator()
      val root = VectorSchemaRoot.create(toArrowSchema(sparkSchema), allocator)
      val out = new File(dir)
      out.mkdirs()
      val fos = new FileOutputStream(new File(out, f"part-$pid%05d.arrow"))
      val writer = new ArrowStreamWriter(root, null, Channels.newChannel(fos))
      try {
        writer.start()
        it.grouped(batchSize).foreach { batch =>
          root.clear()
          fill(root, sparkSchema, batch)
          writer.writeBatch()
        }
        writer.end()
      } finally {
        writer.close(); fos.close(); root.close(); allocator.close()
      }
    }
  }

  /** Read Arrow IPC stream files back (driver-side; test/debug surface —
    * the reference's client consume loop, FlightRpcClient.java:33-55).
    */
  def readIpc(dir: String): Seq[Seq[Any]] = {
    val files = Option(new File(dir).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".arrow")).sortBy(_.getName)
    val allocator = new RootAllocator()
    try {
      files.toSeq.flatMap { f =>
        val in = new java.io.FileInputStream(f)
        val reader = new ArrowStreamReader(in, allocator)
        try {
          val root = reader.getVectorSchemaRoot
          val out = Seq.newBuilder[Seq[Any]]
          while (reader.loadNextBatch()) {
            (0 until root.getRowCount).foreach { i =>
              out += root.getFieldVectors.asScala.toSeq.map { v =>
                if (v.isNull(i)) null
                else v.getObject(i) match {
                  case t: org.apache.arrow.vector.util.Text => t.toString
                  case l: java.util.List[_] => l.asScala.toList.map {
                    case t: org.apache.arrow.vector.util.Text => t.toString
                    case x => x
                  }
                  case x => x
                }
              }
            }
          }
          out.result()
        } finally { reader.close(); in.close() }
      }
    } finally allocator.close()
  }
}
