package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Catalog._

/** Event-time window semantics (SURVEY §2c streaming gap: tumbling /
  * sliding / session windows). These batch queries pin the *semantics*
  * against the DuckDB oracle; the same plans run as Structured Streaming
  * with watermarks in `graft.streaming` (spec-tested — a streaming query
  * can't be oracle-dumped).
  */
object StreamShape {

  private val fmtSec = "yyyy-MM-dd HH:mm:ss"

  // unique memory-sink names so repeated builds in one session never collide
  private val memId = new java.util.concurrent.atomic.AtomicInteger(0)

  val all: Seq[Q] = Seq(
    // Tumbling 1-hour event-time window (streaming: groupBy(window($"ts","1 hour"))).
    Q("x01_tumbling_window",
      (s, d) => t(s, d, "events")
        .withColumn("win_start", date_format(date_trunc("hour", col("ts")), fmtSec))
        .groupBy("win_start", "event_type")
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
        .orderBy("win_start", "event_type"),
      Some(s"""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
                      event_type, COUNT(*) AS n, ${sqlDsum("value")} AS total
               FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""")),

    // Sliding 2-hour window every 1 hour: each event lands in 2 windows.
    Q("x02_sliding_window",
      (s, d) => t(s, d, "events")
        .select(window(col("ts"), "2 hours", "1 hour").as("w"), col("value"))
        .groupBy(date_format(col("w.start"), fmtSec).as("win_start"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
        .orderBy("win_start"),
      Some(s"""SELECT strftime(date_trunc('hour', ts) - o.h * INTERVAL 1 HOUR, '%Y-%m-%d %H:%M:%S') AS win_start,
                      COUNT(*) AS n, ${sqlDsum("value")} AS total
               FROM events CROSS JOIN (VALUES (0), (1)) o(h)
               GROUP BY 1 ORDER BY win_start""")),

    // The SAME tumbling aggregation as x01, but executed through the REAL
    // Structured Streaming path: readStream(parquet) → window agg →
    // complete-mode memory sink, Trigger.AvailableNow, drained to a batch
    // DataFrame — so a streaming-path result sits inside the hash-compare
    // gate (same oracle as x01), not only in specs.
    Q("x04_stream_tumbling",
      (s, d) => {
        import org.apache.spark.sql.streaming.Trigger
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val schema = s.read.parquet(s"$d/events.parquet").schema
        val name = s"x04_mem_${memId.incrementAndGet()}"
        val ckpt = java.nio.file.Files.createTempDirectory("x04ckpt").toString
        // the file-stream source lists a DIRECTORY; the driver's table is a
        // single parquet file → stage it into a temp dir (one tiny copy,
        // Verify-only — a production stream would already read a directory)
        val srcDir = java.nio.file.Files.createTempDirectory("x04src")
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$d/events.parquet"),
          srcDir.resolve("events.parquet"))
        val sq = s.readStream.schema(schema).parquet(srcDir.toString)
          .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
          .groupBy(window(col("ts"), "1 hour").as("win"), col("event_type"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
          .select(date_format(col("win.start"), fmtSec).as("win_start"),
            col("event_type"), col("n"), col("total"))
          .writeStream.format("memory").queryName(name)
          .outputMode("complete").trigger(Trigger.AvailableNow())
          .option("checkpointLocation", ckpt)
          .start()
        sq.awaitTermination()
        s.table(name).orderBy("win_start", "event_type")
      },
      Some(s"""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
                      event_type, COUNT(*) AS n, ${sqlDsum("value")} AS total
               FROM events GROUP BY 1, 2 ORDER BY win_start, event_type"""),
      bench = false),

    // Session windows with a 30-minute inactivity gap per user
    // (streaming: session_window($"ts", "30 minutes")).
    Q("x03_session_window",
      (s, d) => t(s, d, "events")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
        .select(col("user_id"),
          date_format(col("session_window.start"), fmtSec).as("session_start"),
          col("n"), col("total"))
        .orderBy("user_id", "session_start"),
      Some(s"""WITH marked AS (
                 SELECT user_id, ts, value,
                        CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 30 MINUTE
                             THEN 1 ELSE 0 END AS new_session
                 FROM events),
               sess AS (
                 SELECT user_id, ts, value,
                        SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
                 FROM marked)
               SELECT user_id,
                      strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
                      COUNT(*) AS n, ${sqlDsum("value")} AS total
               FROM sess GROUP BY user_id, sid
               ORDER BY user_id, session_start"""))
  )
}
