package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import graft.core.Tables

/** Joins from SURVEY.md §2.4 as verifiable batch queries.
  * The streaming stream-stream variants live in graft.streaming; these
  * exercise the same join semantics (equi key + time-range predicate,
  * broadcast dim enrichment, config-broadcast routing) on the batch engine,
  * where the DuckDB oracle can check them exactly.
  */
object JoinOps {

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** J1 — interval join, symmetric bounds (RT/app/dwm/OrderWideApp.java:77-85:
    * order ⋈ detail on id within ±5s; here orders ⋈ lineitem on orderkey with
    * l_shipdate ∈ [o_orderdate, o_orderdate+30d]). Equi-key + range predicate:
    * Catalyst plans the equi part as the join key, range as post-filter —
    * a shuffled hash/sort-merge join on the key, NOT a cartesian. */
  val j1IntervalJoin = OpQuery(
    "j1_interval_join",
    "keyed interval join with time-range predicate (OrderWideApp order⋈detail analog)",
    (s, dir) => {
      val o = t(s, dir, "orders").select("o_orderkey", "o_orderdate")
      val l = t(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_shipdate", "l_extendedprice")
      l.join(o, col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate").between(
            col("o_orderdate"), col("o_orderdate") + expr("INTERVAL 30 DAYS")))
        .select(
          col("o_orderkey"), col("l_linenumber"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
          date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_date"),
          col("l_extendedprice").cast("double").as("amount"))
        .orderBy("o_orderkey", "l_linenumber", "ship_date", "amount")
    },
    Some("""SELECT o_orderkey, l_linenumber,
            strftime(o_orderdate, '%Y-%m-%d') AS order_date,
            strftime(l_shipdate, '%Y-%m-%d') AS ship_date,
            CAST(l_extendedprice AS DOUBLE) AS amount
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             AND l_shipdate >= o_orderdate
             AND l_shipdate <= o_orderdate + INTERVAL 30 DAY
            ORDER BY o_orderkey, l_linenumber, ship_date, amount"""))

  /** J2 — interval join, asymmetric bounds (RT/app/dwm/PaymentWideApp.java:78-86:
    * payment ⋈ order_wide with order.ts ∈ [pay.ts−15min, pay.ts+5s]; here
    * purchase events ⋈ signup events of the same user in that window). */
  val j2IntervalJoinAsym = OpQuery(
    "j2_interval_join_asym",
    "asymmetric-bounds interval join (PaymentWideApp payment⋈order_wide analog)",
    (s, dir) => {
      val ev = t(s, dir, "events")
      val pay = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("pay_id"), col("user_id").as("pay_user"), col("ts").as("pay_ts"))
      val ord = ev.filter(col("event_type") === "signup")
        .select(col("event_id").as("ord_id"), col("user_id").as("ord_user"), col("ts").as("ord_ts"))
      pay.join(ord, col("pay_user") === col("ord_user") &&
          col("ord_ts").between(
            col("pay_ts") - expr("INTERVAL 15 MINUTES"),
            col("pay_ts") + expr("INTERVAL 5 SECONDS")))
        .select(col("pay_id"), col("ord_id"), col("pay_user").as("user_id"))
        .orderBy("pay_id", "ord_id")
    },
    Some("""SELECT p.event_id AS pay_id, o.event_id AS ord_id, p.user_id AS user_id
            FROM (SELECT * FROM events WHERE event_type = 'purchase') p
            JOIN (SELECT * FROM events WHERE event_type = 'signup') o
              ON p.user_id = o.user_id
             AND o.ts >= p.ts - INTERVAL 15 MINUTE
             AND o.ts <= p.ts + INTERVAL 5 SECOND
            ORDER BY pay_id, ord_id"""))

  /** J3 — dimension enrichment: fact joined to a chain of small dims, each
    * broadcast (RT/utils/DimAsyncFunction.java:28-53 + the ×10 call sites in
    * OrderWideApp/ProductStatsApp). The reference does async point lookups
    * with a Redis cache; on Spark the whole dim snapshot broadcasts once per
    * batch — cache, invalidation and thread pool all collapse into
    * broadcast-hash-join. */
  val j3DimEnrichment = OpQuery(
    "j3_dim_enrichment",
    "multi-dim broadcast enrichment join chain (DimAsyncFunction ×6 analog)",
    (s, dir) => {
      val l = t(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
      val p = t(s, dir, "part").select("p_partkey", "p_name")
      val su = t(s, dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
      val n = t(s, dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
      val r = t(s, dir, "region").select("r_regionkey", "r_name")
      l.join(broadcast(p), col("l_partkey") === col("p_partkey"), "left")
        .join(broadcast(su), col("l_suppkey") === col("s_suppkey"), "left")
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"), "left")
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"), "left")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("p_name"), col("s_name"), col("n_name"), col("r_name"))
        // (l_orderkey, l_linenumber) is not unique in the synthetic data —
        // sort by every column for a deterministic row order
        .orderBy("l_orderkey", "l_linenumber", "p_name", "s_name", "n_name", "r_name")
    },
    Some("""SELECT l_orderkey, l_linenumber, p_name, s_name, n_name, r_name
            FROM lineitem
            LEFT JOIN part ON l_partkey = p_partkey
            LEFT JOIN supplier ON l_suppkey = s_suppkey
            LEFT JOIN nation ON s_nationkey = n_nationkey
            LEFT JOIN region ON n_regionkey = r_regionkey
            ORDER BY l_orderkey, l_linenumber, p_name, s_name, n_name, r_name"""))

  /** J4 — broadcast config-table routing (RT/app/dwd/BaseDBApp.java:74-106 +
    * TableProcessFunction: each record looks up (sourceTable,type) in a tiny
    * config map, gets a sinkTable tag and a kafka-vs-hbase route; unknown
    * keys dropped). Config is an inline DataFrame here; in the streaming
    * layer it is re-read per micro-batch. */
  val j4ConfigRouting = OpQuery(
    "j4_config_routing",
    "broadcast config join + sink routing (BaseDBApp/TableProcessFunction analog)",
    (s, dir) => {
      import s.implicits._
      val cfg = Seq(
        ("view", "kafka", "dwd_view_log"),
        ("click", "kafka", "dwd_click_log"),
        ("purchase", "hbase", "dim_purchase"),
        ("signup", "kafka", "dwd_signup_log"))
        .toDF("source_type", "sink_type", "sink_table")
      t(s, dir, "events")
        .join(broadcast(cfg), col("event_type") === col("source_type"))
        .filter(col("sink_type") === "kafka") // the kafka route; hbase route = complement
        .select(col("event_id"), col("event_type"), col("sink_table"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id, event_type, sink_table
            FROM events
            JOIN (VALUES ('view','kafka','dwd_view_log'),
                         ('click','kafka','dwd_click_log'),
                         ('purchase','hbase','dim_purchase'),
                         ('signup','kafka','dwd_signup_log'))
                 AS cfg(source_type, sink_type, sink_table)
              ON event_type = source_type
            WHERE sink_type = 'kafka'
            ORDER BY event_id"""))

  /** J6 (beyond ref) — as-of join: each purchase event enriched with the
    * user's most recent signup value at purchase time. The union +
    * partitioned-window arrangement (one keyed shuffle, no per-row
    * subquery) is documented on [[graft.ops.AsOfJoin]]; the oracle is
    * DuckDB's NATIVE ASOF JOIN — an independent implementation of the
    * same operator, so parity here is a cross-engine semantic check,
    * not a mirrored formula. */
  val j6AsofJoin = OpQuery(
    "j6_asof_join",
    "as-of join: purchases x latest prior signup per user (point-in-time)",
    (s, dir) => {
      val e = t(s, dir, "events")
      val fact = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"),
          col("value").as("purchase_value"))
      val dim = e.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts").as("vts"),
          col("value").as("signup_value"))
      graft.ops.AsOfJoin.asOf(fact, dim, Seq("user_id"), "ts", "vts")
        .select(col("event_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts"),
          col("purchase_value"), col("signup_value"))
        .orderBy("event_id")
    },
    Some("""SELECT f.event_id, f.user_id,
              strftime(f.ts, '%Y-%m-%d %H:%M:%S') AS ts,
              f.value AS purchase_value, d.value AS signup_value
            FROM (SELECT * FROM events WHERE event_type = 'purchase') f
            ASOF LEFT JOIN
              (SELECT user_id, ts, value FROM events
               WHERE event_type = 'signup') d
              ON f.user_id = d.user_id AND f.ts >= d.ts
            ORDER BY event_id"""))

  /** J7 (beyond ref) — explicit salted skew join: 600k lineitem rows over
    * only 1k supplier keys is the hot-key shape AQE's skew split handles
    * at shuffle time; [[graft.ops.SkewJoin.saltedJoin]] is the explicit
    * fallback for placements AQE can't touch (stream-static joins,
    * pre-shuffle stages). Correctness is salt-independent: the oracle is
    * the plain (unsalted) join, so parity proves the scatter/replicate
    * arrangement loses and duplicates nothing. */
  val j7SkewJoin = OpQuery(
    "j7_skew_join",
    "salted skew join lineitem x supplier, revenue rollup per supplier",
    (s, dir) => {
      val l = t(s, dir, "lineitem")
        .select(col("l_suppkey"),
          col("l_extendedprice").cast("decimal(18,2)").as("p"))
      val sup = t(s, dir, "supplier").select(col("s_suppkey"), col("s_name"))
      graft.ops.SkewJoin.saltedJoin(l, sup, "l_suppkey", "s_suppkey",
          buckets = 8)
        .groupBy(col("s_suppkey"), col("s_name"))
        .agg(count(lit(1)).as("ct"), sum(col("p")).cast("double").as("revenue"))
        .orderBy("s_suppkey")
    },
    Some("""SELECT s_suppkey, s_name, CAST(count(*) AS BIGINT) AS ct,
              CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                AS revenue
            FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
            GROUP BY s_suppkey, s_name
            ORDER BY s_suppkey"""))

  /** J8 (beyond ref) — semi/anti join pair: existence filtering without
    * materializing the match. left_semi/left_anti move ONLY the probe
    * side's columns through the plan (the build side reduces to its key),
    * and a match short-circuits — at 100 TB this is the shape for "keep
    * documents seen in the allowlist" / "drop ids already ingested",
    * where a plain join + distinct would explode matched rows first and
    * dedup after. */
  val j8SemiAnti = OpQuery(
    "j8_semi_anti",
    "semi/anti join: customers partitioned into active vs dormant",
    (s, dir) => {
      val c = t(s, dir, "customer").select(col("c_custkey"), col("c_name"))
      val o = t(s, dir, "orders").select(col("o_custkey"))
      val active = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .withColumn("status", lit("active"))
      val dormant = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .withColumn("status", lit("dormant"))
      active.unionByName(dormant).orderBy("c_custkey")
    },
    Some("""SELECT c_custkey, c_name, 'active' AS status FROM customer
            WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
            UNION ALL
            SELECT c_custkey, c_name, 'dormant' AS status FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
            ORDER BY c_custkey"""))

  /** J9 — pure range join (no equi key): per signup, platform-wide event
    * count in the following hour. There is no shared key between the
    * interval side and the point side, the shape Catalyst can only plan
    * as a nested-loop — [[graft.ops.RangeJoin]] rewrites it to a binned
    * equi-join (point → its bin, interval → covered bins, residual
    * BETWEEN inside the bucket), the standard scalable treatment.
    * PlanSpec asserts the nested-loop never appears. */
  val j9RangeJoin = OpQuery(
    "j9_range_join",
    "pure range join via bin expansion: events within 1h after each signup",
    (s, dir) => {
      val ev = t(s, dir, "events")
      val points = ev.select(col("event_id").as("ev_id"),
        unix_micros(col("ts")).as("ev_us"))
      val hourUs = 3600L * 1000000L
      val intervals = ev.filter(col("event_type") === "signup")
        .select(col("event_id").as("sig_id"),
          unix_micros(col("ts")).as("lo"),
          (unix_micros(col("ts")) + lit(hourUs)).as("hi"))
      graft.ops.RangeJoin
        .pointInInterval(points, "ev_us", intervals, "lo", "hi",
          binWidth = hourUs)
        .groupBy("sig_id").agg(count(lit(1)).as("n_events"))
        .orderBy("sig_id")
    },
    Some("""SELECT s.event_id AS sig_id, CAST(count(*) AS BIGINT) AS n_events
            FROM events s JOIN events e
              ON epoch_us(e.ts) >= epoch_us(s.ts)
             AND epoch_us(e.ts) <= epoch_us(s.ts) + 3600000000
            WHERE s.event_type = 'signup'
            GROUP BY 1 ORDER BY 1"""))

  val all: Seq[OpQuery] =
    Seq(j1IntervalJoin, j2IntervalJoinAsym, j3DimEnrichment, j4ConfigRouting,
      j6AsofJoin, j7SkewJoin, j8SemiAnti, j9RangeJoin)
}
