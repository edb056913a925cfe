package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Catalog._

/** The reference's client-side analytic workload (SURVEY §2b, A1-A15 —
  * notebooks/ethereum_data_analysis.ipynb) re-expressed over the driver
  * test tables. Every query is declarative DataFrame code: filters and
  * projections reach the parquet scan, aggregates run partial+final,
  * joins pick broadcast vs shuffle via Catalyst/AQE.
  */
object RelationalQueries {

  val all: Seq[Q] = Seq(
    // A1: bounded range scan with a pushed-down range predicate
    // (reference: block-range tickets, LogsService.java:505-523).
    Q("a01_range_scan",
      (s, d) => t(s, d, "events")
        .where(col("event_id").between(100, 499))
        .select("event_id", "user_id", "event_type")
        .orderBy("event_id"),
      Some("""SELECT event_id, user_id, event_type FROM events
              WHERE event_id BETWEEN 100 AND 499 ORDER BY event_id""")),

    // A2: case-insensitive membership filter
    // (reference: address filters compare lowercased, LogSubscription.java:44-45).
    Q("a02_ci_member_filter",
      (s, d) => t(s, d, "customer")
        .where(lower(col("c_mktsegment")).isin("building", "automobile"))
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
              WHERE lower(c_mktsegment) IN ('building','automobile')
              ORDER BY c_custkey""")),

    // A3: projection / column pruning (notebook cell 22).
    Q("a03_projection",
      (s, d) => t(s, d, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
              ORDER BY o_orderkey""")),

    // A4: array element extraction (topics[0] → element_at, notebook cell 10).
    Q("a04_array_element",
      (s, d) => t(s, d, "embeddings")
        .select(col("vec_id"), element_at(col("embedding"), 1).as("first_dim"))
        .orderBy("vec_id"),
      Some("""SELECT vec_id, embedding[1] AS first_dim FROM embeddings
              ORDER BY vec_id""")),

    // A5: array length (len(transactions) → size, notebook cell 20).
    Q("a05_array_length",
      (s, d) => t(s, d, "embeddings")
        .select(col("vec_id"), size(col("embedding")).as("dim"))
        .orderBy("vec_id"),
      Some("""SELECT vec_id, CAST(len(embedding) AS INT) AS dim FROM embeddings
              ORDER BY vec_id""")),

    // A6: dict-lookup decode via a literal map + coalesce default
    // (event-signature → name decode, notebook cell 10).
    Q("a06_map_decode",
      (s, d) => {
        val lookup = map(lit("purchase"), lit("Buy"), lit("signup"), lit("Join"))
        t(s, d, "events")
          .withColumn("decoded", coalesce(element_at(lookup, col("event_type")), lit("Other")))
          .groupBy("decoded").agg(count(lit(1)).as("n"))
          .orderBy("decoded")
      },
      Some("""SELECT CASE WHEN event_type='purchase' THEN 'Buy'
                          WHEN event_type='signup' THEN 'Join'
                          ELSE 'Other' END AS decoded,
                     COUNT(*) AS n
              FROM events GROUP BY 1 ORDER BY decoded""")),

    // A7: value_counts — group-by count ordered by count (notebook cells 10, 24).
    Q("a07_group_count",
      (s, d) => t(s, d, "events")
        .groupBy("event_type").agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), col("event_type")),
      Some("""SELECT event_type, COUNT(*) AS n FROM events
              GROUP BY event_type ORDER BY n DESC, event_type""")),

    // A8: per-key time series — logs per block analog (notebook cell 14).
    Q("a08_per_key_count",
      (s, d) => t(s, d, "events")
        .groupBy("user_id").agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
        .orderBy("user_id"),
      Some(s"""SELECT user_id, COUNT(*) AS n, ${sqlDsum("value")} AS total_value
               FROM events GROUP BY user_id ORDER BY user_id""")),

    // A9: distinct count (nunique, notebook cells 8, 24).
    Q("a09_distinct_count",
      (s, d) => t(s, d, "events")
        .groupBy("event_type").agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy("event_type"),
      Some("""SELECT event_type, COUNT(DISTINCT user_id) AS n_users
              FROM events GROUP BY event_type ORDER BY event_type""")),

    // A10: min/max/mean/sum profile (notebook cells 8, 14, 18, 20, 24).
    Q("a10_stats",
      (s, d) => t(s, d, "lineitem")
        .groupBy("l_returnflag").agg(
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"),
          dsum(col("l_quantity")).as("sum_qty"),
          davg(col("l_quantity")).as("avg_qty"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag"),
      Some(s"""SELECT l_returnflag,
                      MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
                      ${sqlDsum("l_quantity")} AS sum_qty,
                      ${sqlDavg("l_quantity")} AS avg_qty,
                      COUNT(*) AS n
               FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // A11: derived arithmetic column (gas_utilization analog, notebook cell 18).
    Q("a11_derived_column",
      (s, d) => t(s, d, "lineitem")
        .withColumn("revenue", col("l_extendedprice") * (lit(1) - col("l_discount")))
        .select("l_orderkey", "l_linenumber", "revenue")
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber,
                     l_extendedprice * (1 - l_discount) AS revenue
              FROM lineitem ORDER BY l_orderkey, l_linenumber""")),

    // A12: boolean-count (count_if analog, notebook cells 8, 20).
    Q("a12_bool_count",
      (s, d) => t(s, d, "orders").agg(
        sum(when(col("o_totalprice") > 100000, 1).otherwise(0)).as("n_big"),
        count(lit(1)).as("n_all")),
      Some("""SELECT CAST(SUM(CASE WHEN o_totalprice > 100000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
                     COUNT(*) AS n_all
              FROM orders""")),

    // A13: equi-join fact×dim (logs×blocks merge, notebook cell 22).
    Q("a13_left_join",
      (s, d) => {
        val li = t(s, d, "lineitem")
        val o = t(s, d, "orders").select("o_orderkey", "o_custkey", "o_orderstatus")
        li.join(o, li("l_orderkey") === o("o_orderkey"), "left")
          .select(col("l_orderkey"), col("l_linenumber"), col("o_custkey"), col("o_orderstatus"))
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber, o_custkey, o_orderstatus
              FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
              ORDER BY l_orderkey, l_linenumber""")),

    // A14: epoch-seconds → timestamp (pd.to_datetime(unit='s'), notebook cell 22).
    Q("a14_epoch_to_ts",
      (s, d) => t(s, d, "events")
        .select(col("event_id"), to_timestamp(from_unixtime(col("event_id"))).as("as_ts"))
        .orderBy("event_id"),
      Some("""SELECT event_id, CAST(to_timestamp(event_id) AS TIMESTAMP) AS as_ts
              FROM events ORDER BY event_id""")),

    // A15: top-k by frequency (most-active contract, notebook cells 24, 26)
    // — TakeOrderedAndProject, deterministic tie-break on the key.
    Q("a15_topk",
      (s, d) => t(s, d, "events")
        .groupBy("user_id").agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), col("user_id"))
        .limit(5),
      Some("""SELECT user_id, COUNT(*) AS n FROM events
              GROUP BY user_id ORDER BY n DESC, user_id LIMIT 5"""))
  )
}
