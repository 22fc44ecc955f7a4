package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import graft.core.Tables

/** Windowed / grouped aggregations from SURVEY.md §2.5 plus the serving
  * layer (A7) and the ReplacingMergeTree reader view (K5), as verifiable
  * batch queries. Tumbling windows use functions.window aligned to the epoch,
  * matching the oracle's floor(epoch/N)*N arithmetic exactly.
  *
  * Exactness: measure sums run through DECIMAL(18,2) (order-independent,
  * bit-identical to DuckDB) and cast to DOUBLE at the end; distinct counts
  * are exact (COUNT DISTINCT), matching the reference's Set-union semantics
  * (RT/app/dws/ProductStatsApp.java:205-242) rather than an approximation.
  */
object AggOps {

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)
  private val fmt = "yyyy-MM-dd HH:mm:ss"

  /** A1 — tumbling 10s window + keyed measure sums with window start/end
    * stamping (RT/app/dws/VisitorStatsApp.java:111-149). Computes TRUE sums
    * for every measure — deliberately not replicating the reference reducer
    * bug (see SURVEY §2.5 semantics note). */
  val a1VisitorWindow = OpQuery(
    "a1_visitor_window",
    "10s tumbling event-time window agg with stt/edt stamping (VisitorStatsApp)",
    (s, dir) =>
      t(s, dir, "events")
        .groupBy(window(col("ts"), "10 seconds").as("w"), col("event_type"))
        .agg(
          count(lit(1)).as("pv_ct"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("dur_sum"))
        .select(
          date_format(col("w.start"), fmt).as("stt"),
          date_format(col("w.end"), fmt).as("edt"),
          col("event_type"), col("pv_ct"), col("dur_sum"))
        .orderBy("stt", "event_type"),
    Some("""WITH w AS (
              SELECT to_timestamp(CAST(floor(epoch(ts) / 10) * 10 AS BIGINT)) AS ws,
                     event_type, value
              FROM events)
            SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS stt,
                   strftime(ws + INTERVAL 10 SECOND, '%Y-%m-%d %H:%M:%S') AS edt,
                   event_type,
                   CAST(count(*) AS BIGINT) AS pv_ct,
                   CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS dur_sum
            FROM w GROUP BY ws, event_type
            ORDER BY stt, event_type"""))

  /** A2 — grouped agg with EXACT distinct-id counts + one-hot measure sums
    * (RT/app/dws/ProductStatsApp.java:203-242: per-sku sums + orderIdSet
    * size; COUNT DISTINCT replaces the Set-union accumulator). */
  val a2ProductStats = OpQuery(
    "a2_product_stats",
    "grouped sums + exact count-distinct (ProductStatsApp Set-union analog)",
    (s, dir) =>
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(
          sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("click_ct"),
          countDistinct(when(col("event_type") === "purchase", col("event_id")))
            .as("order_ct"),
          sum(when(col("event_type") === "purchase", col("value")).otherwise(0.0)
            .cast("decimal(18,2)")).cast("double").as("order_amount"))
        .orderBy("user_id"),
    Some("""SELECT user_id,
            CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click_ct,
            CAST(count(DISTINCT CASE WHEN event_type = 'purchase' THEN event_id END) AS BIGINT) AS order_ct,
            CAST(sum(CAST(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END
                          AS DECIMAL(18,2))) AS DOUBLE) AS order_amount
            FROM events GROUP BY user_id ORDER BY user_id"""))

  /** A3 — SQL-style windowed agg by region dims with count(distinct order)
    * (RT/app/dws/ProvinceStatsSqlApp.java:53-72; nation stands in for
    * province, 1-day tumbling window over o_orderdate). */
  val a3ProvinceStats = OpQuery(
    "a3_province_stats",
    "per-dim tumbling window agg + distinct orders (ProvinceStatsSqlApp)",
    (s, dir) => {
      val o = t(s, dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
      val c = t(s, dir, "customer").select("c_custkey", "c_nationkey")
      val n = t(s, dir, "nation").select("n_nationkey", "n_name")
      o.join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(window(col("o_orderdate"), "1 day").as("w"), col("n_name"))
        .agg(
          countDistinct(col("o_orderkey")).as("order_count"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("order_amount"))
        .select(
          date_format(col("w.start"), fmt).as("stt"),
          date_format(col("w.end"), fmt).as("edt"),
          col("n_name").as("province_name"), col("order_count"), col("order_amount"))
        .orderBy("stt", "province_name")
    },
    Some("""WITH w AS (
              SELECT to_timestamp(CAST(floor(epoch(o_orderdate) / 86400) * 86400 AS BIGINT)) AS ws,
                     n_name, o_orderkey, o_totalprice
              FROM orders
              JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey)
            SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS stt,
                   strftime(ws + INTERVAL 1 DAY, '%Y-%m-%d %H:%M:%S') AS edt,
                   n_name AS province_name,
                   CAST(count(DISTINCT o_orderkey) AS BIGINT) AS order_count,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS order_amount
            FROM w GROUP BY ws, n_name
            ORDER BY stt, province_name"""))

  /** A4 — keyword stats: tokenizer UDTF + per-word count with a literal
    * source tag (RT/app/dws/KeywordStatsApp.java:55-75). */
  val a4KeywordStats = OpQuery(
    "a4_keyword_stats",
    "tokenize + explode + per-word count (KeywordStatsApp split_words)",
    (s, dir) =>
      t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(length(col("word")) > 0)
        .groupBy(col("word"))
        .agg(count(lit(1)).as("ct"))
        .select(col("word"), lit("search").as("source"), col("ct"))
        .orderBy("word"),
    Some("""SELECT word, 'search' AS source, CAST(count(*) AS BIGINT) AS ct
            FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
            WHERE length(word) > 0
            GROUP BY word ORDER BY word"""))

  /** A7 — serving-layer top-N: group/having/order/limit
    * (PUB/mapper/ProductStatsMapper.java:20-24: spu revenue top N;
    * p_brand stands in for spu). Deterministic tie-break on brand. */
  val a7ServingTopN = OpQuery(
    "a7_serving_topn",
    "serving SQL: grouped revenue + having + order by + limit (ProductStatsMapper)",
    (s, dir) => {
      val l = t(s, dir, "lineitem")
        .select("l_partkey", "l_extendedprice", "l_discount")
      val p = t(s, dir, "part").select("p_partkey", "p_brand")
      l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
            ((lit(1) - col("l_discount")).cast("decimal(8,4)")))
          .cast("double").as("order_amount"))
        .filter(col("order_amount") > 0)
        .orderBy(col("order_amount").desc, col("p_brand"))
        .limit(10)
    },
    Some("""SELECT p_brand,
            CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                     CAST(1 - l_discount AS DECIMAL(8,4))) AS DOUBLE) AS order_amount
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY p_brand HAVING order_amount > 0
            ORDER BY order_amount DESC, p_brand LIMIT 10"""))

  /** K5/§2.8 — ReplacingMergeTree(ts) reader view: latest version per key
    * (DDL comments RT/app/dws/ProductStatsApp.java:337-339): one
    * row_number over (key ORDER BY ts DESC) = 1. */
  val k5LatestVersion = OpQuery(
    "k5_latest_version",
    "ReplacingMergeTree-style latest-row-per-key dedup view",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts").desc, col("event_id").desc)
      t(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type"), col("event_id"),
          col("value").cast("double").as("value"))
        .orderBy("user_id", "event_type")
    },
    Some("""SELECT user_id, event_type, event_id, CAST(value AS DOUBLE) AS value
            FROM (SELECT *, row_number() OVER (
                    PARTITION BY user_id, event_type
                    ORDER BY ts DESC, event_id DESC) AS rn
                  FROM events)
            WHERE rn = 1 ORDER BY user_id, event_type"""))

  /** Beyond the reference (tumbling-only): session windows — the
    * sessionization primitive (native session_window; streaming-capable
    * with watermarks). Window end = last event + gap, per Spark's
    * definition; the oracle reproduces it with gaps-and-islands SQL. */
  val a8SessionWindow = OpQuery(
    "a8_session_window",
    "session windows (30 min gap) per user: count + exact value sum",
    (s, dir) =>
      t(s, dir, "events")
        .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
        .agg(
          count(lit(1)).as("ct"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("val_sum"))
        .select(
          col("user_id"),
          date_format(col("w.start"), fmt).as("stt"),
          date_format(col("w.end"), fmt).as("edt"),
          col("ct"), col("val_sum"))
        .orderBy("user_id", "stt"),
    Some("""WITH e AS (SELECT user_id, ts, value, epoch_us(ts) AS us FROM events),
            d AS (SELECT *, CASE WHEN lag(us) OVER w IS NULL
                     OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS brk
                  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
            s AS (SELECT *, sum(brk) OVER
                    (PARTITION BY user_id ORDER BY us ROWS UNBOUNDED PRECEDING) AS sid
                  FROM d)
            SELECT user_id,
              strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS stt,
              strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS edt,
              CAST(count(*) AS BIGINT) AS ct,
              CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS val_sum
            FROM s GROUP BY user_id, sid
            ORDER BY user_id, stt"""))

  /** Beyond the reference: sliding (hopping) windows — 30s length, 10s
    * hop, so each event lands in 3 windows. The oracle expands each event
    * into its member windows explicitly. */
  val a9SlidingWindow = OpQuery(
    "a9_sliding_window",
    "sliding 30s/10s window counts per event_type",
    (s, dir) =>
      t(s, dir, "events")
        .groupBy(window(col("ts"), "30 seconds", "10 seconds").as("w"),
          col("event_type"))
        .agg(count(lit(1)).as("ct"))
        .select(
          date_format(col("w.start"), fmt).as("stt"),
          col("event_type"), col("ct"))
        .orderBy("stt", "event_type"),
    Some("""WITH w AS (
              SELECT to_timestamp(CAST(floor(epoch(ts) / 10) * 10 - g.k * 10 AS BIGINT)) AS ws,
                     event_type
              FROM events, (SELECT unnest(generate_series(0, 2)) AS k) g)
            SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS stt, event_type,
                   CAST(count(*) AS BIGINT) AS ct
            FROM w GROUP BY ws, event_type
            ORDER BY stt, event_type"""))

  /** Ordered funnel with a 24h per-step deadline — the ADS conversion
    * query beside the reference's topN serving layer. The user-keyed
    * cascade and deliberate lag()-free rollup are documented on
    * [[graft.ads.Behavior.funnelSteps]]. */
  val a10Funnel = OpQuery(
    "a10_funnel_steps",
    "view->click->purchase funnel, 24h per-step deadline, per-stage conversion",
    (s, dir) =>
      graft.ads.Behavior.funnelSteps(t(s, dir, "events"), "user_id",
          "event_type", "ts", Seq("view", "click", "purchase"),
          withinSecs = 86400L)
        .orderBy("stage_idx"),
    Some("""WITH s0 AS (SELECT user_id AS uid, min(ts) AS t FROM events
              WHERE event_type = 'view' GROUP BY 1),
            s1 AS (SELECT e.user_id AS uid, min(e.ts) AS t FROM events e
              JOIN s0 ON s0.uid = e.user_id
              WHERE e.event_type = 'click' AND e.ts > s0.t
                AND e.ts <= s0.t + INTERVAL 86400 SECONDS GROUP BY 1),
            s2 AS (SELECT e.user_id AS uid, min(e.ts) AS t FROM events e
              JOIN s1 ON s1.uid = e.user_id
              WHERE e.event_type = 'purchase' AND e.ts > s1.t
                AND e.ts <= s1.t + INTERVAL 86400 SECONDS GROUP BY 1),
            c AS (SELECT 0 AS stage_idx, 'view' AS stage, count(*) AS n FROM s0
              UNION ALL SELECT 1, 'click', count(*) FROM s1
              UNION ALL SELECT 2, 'purchase', count(*) FROM s2)
            SELECT CAST(c.stage_idx AS BIGINT) AS stage_idx, c.stage,
                   CAST(c.n AS BIGINT) AS n_users,
                   CAST(CASE WHEN p.n IS NULL THEN 1.0
                     ELSE floor(CAST(c.n AS DOUBLE) / p.n * 10000.0) / 10000.0
                     END AS DOUBLE) AS conv_from_prev
            FROM c LEFT JOIN c p ON p.stage_idx = c.stage_idx - 1
            ORDER BY stage_idx"""))

  /** Daily cohort retention — first-activity cohorts × day offsets.
    * Scale shape on [[graft.ads.Behavior.retentionCohorts]]. */
  val a11Retention = OpQuery(
    "a11_retention_cohorts",
    "daily cohort retention: first-activity cohort x active-day offset",
    (s, dir) =>
      graft.ads.Behavior.retentionCohorts(t(s, dir, "events"), "user_id", "ts")
        .orderBy("cohort_day", "day_offset"),
    Some("""WITH d AS (SELECT DISTINCT user_id AS uid, CAST(ts AS DATE) AS day
              FROM events),
            cohort AS (SELECT uid, min(day) AS cohort_day FROM d GROUP BY 1),
            sizes AS (SELECT cohort_day, count(*) AS sz FROM cohort GROUP BY 1),
            act AS (SELECT c.cohort_day, d.day, count(*) AS n_users
              FROM d JOIN cohort c USING (uid) GROUP BY 1, 2)
            SELECT strftime(a.cohort_day, '%Y-%m-%d') AS cohort_day,
                   CAST(date_diff('day', a.cohort_day, a.day) AS BIGINT)
                     AS day_offset,
                   CAST(a.n_users AS BIGINT) AS n_users,
                   CAST(floor(CAST(a.n_users AS DOUBLE) / s.sz * 10000.0)
                     / 10000.0 AS DOUBLE) AS retention
            FROM act a JOIN sizes s USING (cohort_day)
            ORDER BY cohort_day, day_offset"""))

  /** Session path analysis — top event-type journeys per 30-min-gap
    * session (the same gap as a8's session windows). Scale shape on
    * [[graft.ads.Behavior.sessionPaths]]. */
  val a12SessionPaths = OpQuery(
    "a12_session_paths",
    "top-20 session event-type paths (30-min inactivity gap)",
    (s, dir) =>
      graft.ads.Behavior.sessionPaths(t(s, dir, "events"), "user_id", "ts",
        "event_type", "event_id", gapMinutes = 30L, k = 20),
    Some("""WITH e AS (SELECT user_id, ts, event_id, event_type,
              lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                AS prev
              FROM events),
            f AS (SELECT *, CASE WHEN prev IS NULL
                OR epoch_us(ts) - epoch_us(prev) > 1800000000
                THEN 1 ELSE 0 END AS ns FROM e),
            s AS (SELECT *, sum(ns) OVER (PARTITION BY user_id
                ORDER BY ts, event_id) AS sid FROM f),
            p AS (SELECT user_id, sid,
                string_agg(event_type, '>' ORDER BY ts, event_id) AS path
              FROM s GROUP BY 1, 2)
            SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
            FROM p GROUP BY path
            ORDER BY n_sessions DESC, path LIMIT 20"""))

  /** Time-to-convert through the a10 funnel, exact microseconds. */
  val a13ConversionLag = OpQuery(
    "a13_conversion_lag",
    "view->purchase conversion lag per fully-converting user (exact usec)",
    (s, dir) =>
      graft.ads.Behavior.conversionLags(t(s, dir, "events"), "user_id",
          "event_type", "ts", Seq("view", "click", "purchase"),
          withinSecs = 86400L)
        .orderBy("user_id"),
    Some("""WITH s0 AS (SELECT user_id AS uid, min(ts) AS t FROM events
              WHERE event_type = 'view' GROUP BY 1),
            s1 AS (SELECT e.user_id AS uid, min(e.ts) AS t FROM events e
              JOIN s0 ON s0.uid = e.user_id
              WHERE e.event_type = 'click' AND e.ts > s0.t
                AND e.ts <= s0.t + INTERVAL 86400 SECONDS GROUP BY 1),
            s2 AS (SELECT e.user_id AS uid, min(e.ts) AS t FROM events e
              JOIN s1 ON s1.uid = e.user_id
              WHERE e.event_type = 'purchase' AND e.ts > s1.t
                AND e.ts <= s1.t + INTERVAL 86400 SECONDS GROUP BY 1)
            SELECT s2.uid AS user_id,
                   CAST(epoch_us(s2.t) - epoch_us(s0.t) AS BIGINT) AS lag_usec
            FROM s2 JOIN s0 ON s0.uid = s2.uid
            ORDER BY user_id"""))

  /** A14 (beyond ref) — multi-level rollup in ONE pass: nation x year
    * revenue with subtotals and grand total via ROLLUP. At 100 TB this is
    * the difference between one shuffle (Expand feeds a single partial
    * aggregation) and re-scanning the fact table once per grouping level;
    * `grouping_id()` / DuckDB `GROUPING(a,b)` share the same bitmask
    * contract, so lvl itself is oracle-checked. */
  val a14GroupingSets = OpQuery(
    "a14_grouping_sets",
    "ROLLUP(nation, year) revenue: detail + subtotal + grand total, one pass",
    (s, dir) => {
      val o = t(s, dir, "orders")
        .select(col("o_custkey"), col("o_totalprice"), col("o_orderdate"))
      val c = t(s, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
      val n = t(s, dir, "nation").select(col("n_nationkey"), col("n_name"))
      o.join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name"), year(col("o_orderdate")).cast("string").as("yr"),
          col("o_totalprice").cast("decimal(18,2)").as("p"))
        .rollup(col("n_name"), col("yr"))
        .agg(grouping_id().as("lvl"), count(lit(1)).as("ct"),
          sum(col("p")).cast("double").as("revenue"))
        .select(
          coalesce(col("n_name"), lit("ALL")).as("nation"),
          coalesce(col("yr"), lit("ALL")).as("yr"),
          col("lvl").cast("long").as("lvl"), col("ct"), col("revenue"))
        .orderBy("lvl", "nation", "yr")
    },
    Some("""SELECT coalesce(n_name, 'ALL') AS nation,
              coalesce(CAST(year(o_orderdate) AS VARCHAR), 'ALL') AS yr,
              CAST(GROUPING(n_name, year(o_orderdate)) AS BIGINT) AS lvl,
              CAST(count(*) AS BIGINT) AS ct,
              CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                AS revenue
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY ROLLUP(n_name, year(o_orderdate))
            ORDER BY lvl, nation, yr"""))

  /** A15 (beyond ref) — pivot (long-to-wide) on a bounded category set:
    * revenue per nation split into one column per order status. The value
    * list is EXPLICIT (`pivot(col, Seq(...))`) — the two-pass
    * distinct-collect form is a full extra scan at scale and
    * nondeterministic column order besides. Plans as a single hash
    * aggregate over CASE-WHEN projections; the oracle is the equivalent
    * FILTER-clause conditional aggregation. */
  val a15Pivot = OpQuery(
    "a15_pivot",
    "pivot order status to columns: per-nation revenue by status",
    (s, dir) => {
      val o = t(s, dir, "orders")
        .select(col("o_custkey"), col("o_totalprice"), col("o_orderstatus"))
      val c = t(s, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
      val n = t(s, dir, "nation").select(col("n_nationkey"), col("n_name"))
      val zero = lit(0).cast("decimal(18,2)")
      o.join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name").as("nation"), col("o_orderstatus"),
          col("o_totalprice").cast("decimal(18,2)").as("p"))
        .groupBy(col("nation"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(sum(col("p")))
        .select(col("nation"),
          coalesce(col("F"), zero).cast("double").as("rev_f"),
          coalesce(col("O"), zero).cast("double").as("rev_o"),
          coalesce(col("P"), zero).cast("double").as("rev_p"))
        .orderBy("nation")
    },
    Some("""SELECT n_name AS nation,
              CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                FILTER (WHERE o_orderstatus = 'F'), 0) AS DOUBLE) AS rev_f,
              CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                FILTER (WHERE o_orderstatus = 'O'), 0) AS DOUBLE) AS rev_o,
              CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                FILTER (WHERE o_orderstatus = 'P'), 0) AS DOUBLE) AS rev_p
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
            ORDER BY nation"""))

  /** A16 (beyond ref) — trailing-range rolling window (7-day rolling
    * event volume): RANGE BETWEEN over an integer day number, per type.
    * The scale discipline is the two-level shape: the corpus-sized frame
    * reduces to (type, day) FIRST, and the range window runs over that
    * tiny daily frame — never a per-row window over raw events. All
    * arithmetic is integer (day numbers, counts), so parity is exact. */
  val a16RollingWindow = OpQuery(
    "a16_rolling_window",
    "7-day trailing rolling sum of daily event counts per type",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = t(s, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("d"))
        .agg(count(lit(1)).as("ct"))
      val w = Window.partitionBy("event_type").orderBy(col("dnum"))
        .rangeBetween(-6, 0)
      daily
        .withColumn("dnum",
          datediff(col("d"), lit("1970-01-01").cast("date")).cast("long"))
        .withColumn("ct_7d", sum(col("ct")).over(w))
        .select(col("event_type"),
          date_format(col("d"), "yyyy-MM-dd").as("dt"),
          col("ct"), col("ct_7d"))
        .orderBy("event_type", "dt")
    },
    Some("""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
                   CAST(count(*) AS BIGINT) AS ct
                 FROM events GROUP BY event_type, CAST(ts AS DATE))
            SELECT event_type, strftime(d, '%Y-%m-%d') AS dt, ct,
              CAST(sum(ct) OVER (PARTITION BY event_type ORDER BY d
                RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
                AS BIGINT) AS ct_7d
            FROM daily ORDER BY event_type, dt"""))

  /** A17 (beyond ref) — last-touch marketing attribution: each purchase
    * is credited to the user's most recent view/click within 24h, else
    * 'direct', and revenue rolls up per (channel, day). Composes the
    * as-of join ([[graft.ops.AsOfJoin]] — one keyed shuffle, join-free
    * carry-forward plan) into a serving metric; the oracle composes
    * DuckDB's NATIVE ASOF JOIN the same way, so parity cross-checks two
    * independent as-of implementations inside a larger rollup. Touches
    * are deduped per (user, ts) with a deterministic max-priority before
    * the join — AsOfJoin's documented (key, rightTs) uniqueness
    * precondition, and the same rule inlined in the oracle. */
  val a17Attribution = OpQuery(
    "a17_attribution",
    "last-touch attribution: purchase revenue per channel and day (24h window)",
    (s, dir) => {
      val e = t(s, dir, "events")
      val purch = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      // the as-of payload excludes the right ts column by contract, so
      // the touch time rides along as an explicit payload copy
      val mkt = e.filter(col("event_type").isin("view", "click"))
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_type")).as("src_type"))
        .withColumnRenamed("ts", "vts")
        .withColumn("touch_ts", col("vts"))
      graft.ops.AsOfJoin.asOf(purch, mkt, Seq("user_id"), "ts", "vts")
        .withColumn("channel",
          when(col("src_type").isNull ||
            unix_micros(col("ts")) - unix_micros(col("touch_ts")) >
              lit(86400000000L), "direct")
            .otherwise(col("src_type")))
        .groupBy(col("channel"), to_date(col("ts")).as("d"))
        .agg(count(lit(1)).as("ct"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("revenue"))
        .select(col("channel"), date_format(col("d"), "yyyy-MM-dd").as("dt"),
          col("ct"), col("revenue"))
        .orderBy("channel", "dt")
    },
    Some("""WITH p AS (SELECT event_id, user_id, ts, value FROM events
                       WHERE event_type = 'purchase'),
            m AS (SELECT user_id, ts AS vts, max(event_type) AS src_type
                  FROM events WHERE event_type IN ('view', 'click')
                  GROUP BY user_id, ts),
            a AS (SELECT p.event_id, p.user_id, p.ts, p.value, m.vts,
                         m.src_type
                  FROM p ASOF LEFT JOIN m
                    ON p.user_id = m.user_id AND p.ts >= m.vts),
            c AS (SELECT CASE WHEN src_type IS NULL
                     OR epoch_us(ts) - epoch_us(vts) > 86400000000
                     THEN 'direct' ELSE src_type END AS channel,
                   CAST(ts AS DATE) AS d, value FROM a)
            SELECT channel, strftime(d, '%Y-%m-%d') AS dt,
                   CAST(count(*) AS BIGINT) AS ct,
                   CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                     AS revenue
            FROM c GROUP BY channel, d ORDER BY channel, dt"""))

  /** A18 (beyond ref) — exponentially time-decayed trending items: the
    * burst-detection extension of the reference's KeywordStats (A4 counts
    * forever; a trend board must forget). Each event contributes
    * 2^-age_days of weight toward its item (daily half-life), so a burst
    * of recent activity outranks a steady historical drip.
    *
    * Engine-parity design: the decay is INTEGER-exact, never float pow —
    * weight = 10^12 >> age_days (age in whole days below the corpus
    * horizon, integer division over epoch micros, capped at 40 where the
    * shift underflows to 0), summed as BIGINT. Summation is therefore
    * order-independent and bit-identical across engines — the same reason
    * the money columns ride DECIMAL. The horizon is max(ts) over the
    * corpus (a 1-row broadcast), making the query deterministic for a
    * frozen table; a production trend board passes `now()` instead.
    *
    * Scale shape: one scan, one 1-row broadcast crossJoin, one groupBy
    * over the item key — map-side partial sums do the heavy lifting, the
    * exchange carries one row per (partition, item). The decayed/raw
    * contrast (trend_w vs ct) is what a curation dashboard plots. */
  /** The decayed-weight aggregation shared by a18_trend_decay, its
    * streaming twin, and StateBoundednessSpec (which drives THIS def, not
    * a spec-local copy): buckets each (item, ts) row's age below
    * `horizonUs` into whole days (integer epoch-micro division, capped at
    * 40 where the shift underflows), weights it 10^12 >> days, and sums
    * per item with a parallel raw count.
    *
    * The bucket is clamped to [0, 40]: an event NEWER than the horizon
    * (the production `now()` path under clock skew) counts at full weight
    * (bucket 0) instead of feeding a negative shift count into
    * shiftright — Spark masks a negative shift to `count & 63` (-1 → 63 →
    * weight 0, silently zeroing the NEWEST events) and DuckDB's `>>`
    * treats it differently again, so without the clamp the two engines
    * diverge exactly where the data is hottest. The committed queries
    * freeze horizon = max(ts) and never hit the clamp; the oracles mirror
    * it anyway (greatest(..., 0)) so both engines state one rule. */
  private[graft] def trendDecayAgg(items: org.apache.spark.sql.DataFrame,
      horizonUs: org.apache.spark.sql.Column): org.apache.spark.sql.DataFrame =
    items
      .withColumn("_ageus", horizonUs - unix_micros(col("ts")))
      .withColumn("_bkt",
        greatest(least(expr("_ageus div 86400000000"), lit(40L)), lit(0L)))
      .withColumn("_w", expr("shiftright(1000000000000L, cast(_bkt as int))"))
      .groupBy(col("item"))
      .agg(sum(col("_w")).as("trend_w"), count(lit(1)).as("ct"))

  val a18TrendDecay = OpQuery(
    "a18_trend_decay",
    "time-decayed trending items: 2^-age_days weights (integer-exact), decayed vs raw",
    (s, dir) => {
      val e = t(s, dir, "events")
        .select(get_json_object(col("props"), "$.k").cast("long").as("item"),
          col("ts"))
        .filter(col("item").isNotNull)
      val hor = e.agg(max(col("ts")).as("_h"))
      trendDecayAgg(e.crossJoin(broadcast(hor)), unix_micros(col("_h")))
        .orderBy("item")
    },
    Some("""WITH e AS (SELECT TRY_CAST(json_extract_string(props, '$.k')
                         AS BIGINT) AS item, ts
                       FROM events
                       WHERE TRY_CAST(json_extract_string(props, '$.k')
                         AS BIGINT) IS NOT NULL),
            h AS (SELECT max(ts) AS mh FROM events
                  WHERE TRY_CAST(json_extract_string(props, '$.k')
                    AS BIGINT) IS NOT NULL),
            w AS (SELECT item,
                    greatest(least((epoch_us(mh) - epoch_us(ts))
                      // 86400000000, 40), 0) AS bkt
                  FROM e, h)
            SELECT item, CAST(sum(1000000000000 >> bkt) AS BIGINT) AS trend_w,
                   CAST(count(*) AS BIGINT) AS ct
            FROM w GROUP BY item ORDER BY item"""))

  /** A21 (beyond ref) — the serving arrangement of A18: the trend BOARD,
    * top-10 decayed items with a deterministic tie-break (integer weights
    * make ties exact, `item` breaks them identically in both engines).
    * orderBy+limit plans as TakeOrderedAndProject — a per-partition
    * bounded heap then a 10-row merge, never a global sort
    * (PlanSpec-pinned); the reference's ProductStatsMapper top-N is the
    * analog (a7's shape over the decayed measure). */
  val a21TrendTopk = OpQuery(
    "a21_trend_topk",
    "serving trend board: top-10 decayed items (TakeOrdered, no global sort)",
    (s, dir) => {
      val e = t(s, dir, "events")
        .select(get_json_object(col("props"), "$.k").cast("long").as("item"),
          col("ts"))
        .filter(col("item").isNotNull)
      val hor = e.agg(max(col("ts")).as("_h"))
      trendDecayAgg(e.crossJoin(broadcast(hor)), unix_micros(col("_h")))
        .orderBy(col("trend_w").desc, col("item"))
        .limit(10)
    },
    Some("""WITH e AS (SELECT TRY_CAST(json_extract_string(props, '$.k')
                         AS BIGINT) AS item, ts
                       FROM events
                       WHERE TRY_CAST(json_extract_string(props, '$.k')
                         AS BIGINT) IS NOT NULL),
            h AS (SELECT max(ts) AS mh FROM e),
            w AS (SELECT item,
                    greatest(least((epoch_us(mh) - epoch_us(ts))
                      // 86400000000, 40), 0) AS bkt
                  FROM e, h)
            SELECT item, CAST(sum(1000000000000 >> bkt) AS BIGINT) AS trend_w,
                   CAST(count(*) AS BIGINT) AS ct
            FROM w GROUP BY item
            ORDER BY trend_w DESC, item LIMIT 10"""))

  /** A19 (beyond ref) — gap-filled resampling: per-user event counts on a
    * regular 6-hour grid with explicit ZEROS for silent buckets — the
    * time-series op every monitoring/trend consumer needs (a groupBy
    * alone emits nothing for silent periods, so downstream
    * moving-averages and anomaly rules silently skip them).
    *
    * Scale shape: the grid is SPAN-BOUNDED per user (sequence(min,max)
    * per key, never the global calendar × every user — a user active two
    * days does not pay a year of zeros). Output rows = Σ user spans;
    * the explode is map-side after one groupBy, the count join is
    * grid-keyed. Buckets are integer epoch-6h — no timestamp formatting
    * in the compare. */
  val a19ResampleZerofill = OpQuery(
    "a19_resample_zerofill",
    "gap-filled per-user 6h-grid event counts: sequence-exploded span, zeros explicit",
    (s, dir) => {
      val e = t(s, dir, "events")
        .select(col("user_id"),
          expr("unix_micros(ts) div 21600000000").as("bkt"))
      val perBkt = e.groupBy(col("user_id"), col("bkt"))
        .agg(count(lit(1)).as("ct"))
      val grid = e.groupBy(col("user_id"))
        .agg(min(col("bkt")).as("b0"), max(col("bkt")).as("b1"))
        .select(col("user_id"),
          explode(sequence(col("b0"), col("b1"))).as("bkt"))
      grid.join(perBkt, Seq("user_id", "bkt"), "left")
        .select(col("user_id"), col("bkt"),
          coalesce(col("ct"), lit(0L)).as("ct"))
        .orderBy("user_id", "bkt")
    },
    Some("""WITH e AS (SELECT user_id, epoch_us(ts) // 21600000000 AS bkt
                       FROM events),
            per AS (SELECT user_id, bkt, count(*) AS ct
                    FROM e GROUP BY user_id, bkt),
            spans AS (SELECT user_id, min(bkt) AS b0, max(bkt) AS b1
                      FROM e GROUP BY user_id),
            grid AS (SELECT user_id, unnest(generate_series(b0, b1)) AS bkt
                     FROM spans)
            SELECT grid.user_id, grid.bkt,
                   CAST(coalesce(per.ct, 0) AS BIGINT) AS ct
            FROM grid LEFT JOIN per
              ON per.user_id = grid.user_id AND per.bkt = grid.bkt
            ORDER BY grid.user_id, grid.bkt"""))

  /** A20 (beyond ref) — min-gap (debounce) filter: drop an event arriving
    * within `gap` of the PREVIOUS event of the same (user, type) — the
    * standard duplicate-fire suppressor for noisy clients. Deliberately
    * lag-against-previous-EVENT semantics (one window pass, stateless
    * beyond the frame) rather than previous-KEPT (which is a running
    * fold — [[a22RateLimit]] ships that contract):
    * both engines state the lag rule identically, so the query is
    * directly hash-gated. Window partition key = (user, type) —
    * bounded by a single key's event count, never a global sort. */
  val a20Debounce = OpQuery(
    "a20_debounce",
    "min-gap debounce: drop events within 60s of the previous same-(user,type) event",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("us"), col("event_id"))
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
        .withColumn("_prev", lag(col("us"), 1).over(w))
        .filter(col("_prev").isNull || col("us") - col("_prev") >= 60000000L)
        .select("event_id", "user_id", "event_type", "us")
        .orderBy("event_id")
    },
    Some("""WITH e AS (SELECT event_id, user_id, event_type,
                         epoch_us(ts) AS us,
                         lag(epoch_us(ts)) OVER (
                           PARTITION BY user_id, event_type
                           ORDER BY epoch_us(ts), event_id) AS prev
                       FROM events)
            SELECT event_id, user_id, event_type, us
            FROM e WHERE prev IS NULL OR us - prev >= 60000000
            ORDER BY event_id"""))

  /** A22 (beyond ref) — the TRUE rate limiter: previous-KEPT min-gap.
    * a20's debounce drops an event within 60s of the previous EVENT (a
    * stateless lag); the production rate limiter advances its reference
    * point only on events it KEEPS, so a sustained burst emits one event
    * per 60s instead of suppressing everything after the first (under
    * a20, events at t=0,30,60,90 keep only t=0 — each is within 60s of
    * its predecessor; under a22 they keep t=0,60 — a trickle, which is
    * the rate-limiting contract).
    *
    * The fold is data-dependent (keep decisions feed the state that
    * decides later keeps), so no fixed-depth window expresses it: the
    * Spark side is a SECONDARY SORT — hash-repartition on the key, local
    * sort on (key, event-time, id), then a mapPartitions streaming fold
    * that resets its one-long state at key boundaries. Unlike the
    * flatMapGroups + toSeq shape this replaced (VERDICT r13: `toSeq`
    * cannot spill — one hot key with millions of batch events OOMs the
    * task), the local sort runs through Spark's external sorter (spills
    * to disk) and the fold holds O(1) state regardless of key skew.
    * The oracle is a recursive CTE stepping row_number order per key
    * (depth = max per-key count, ≤ 29 on these fixtures). Both engines
    * state identical (event-time, id) ordering, so the query hash-gates. */
  val a22RateLimit = OpQuery(
    "a22_ratelimit",
    "previous-KEPT min-gap rate limiter: 60s per (user, type), fold not lag",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
        .repartition(col("user_id"), col("event_type"))
        .sortWithinPartitions("user_id", "event_type", "us", "event_id")
        .as[(Long, Long, String, Long)]
        .mapPartitions { it =>
          // streaming fold over the spilled-sorted run: key-boundary reset,
          // one long of live state, never a per-key buffer
          var open = false
          var curU = 0L
          var curTy: String = null
          var lastKept = Long.MinValue
          it.flatMap { case (id, u, ty, us) =>
            if (!open || u != curU || ty != curTy) {
              open = true; curU = u; curTy = ty; lastKept = Long.MinValue
            }
            if (lastKept == Long.MinValue || us - lastKept >= 60000000L) {
              lastKept = us
              Some((id, u, ty, us))
            } else None
          }
        }
        .toDF("event_id", "user_id", "event_type", "us")
        .orderBy("event_id")
    },
    Some("""WITH RECURSIVE e AS MATERIALIZED (
              SELECT event_id, user_id, event_type, epoch_us(ts) AS us,
                     row_number() OVER (PARTITION BY user_id, event_type
                       ORDER BY epoch_us(ts), event_id) AS rn
              FROM events),
            r AS (
              SELECT user_id, event_type, rn, event_id, us,
                     us AS last_kept, TRUE AS keep
              FROM e WHERE rn = 1
              UNION ALL
              SELECT e.user_id, e.event_type, e.rn, e.event_id, e.us,
                     CASE WHEN e.us - r.last_kept >= 60000000
                          THEN e.us ELSE r.last_kept END,
                     e.us - r.last_kept >= 60000000
              FROM r JOIN e ON e.user_id = r.user_id
                AND e.event_type = r.event_type AND e.rn = r.rn + 1)
            SELECT event_id, user_id, event_type, us
            FROM r WHERE keep ORDER BY event_id"""))

  /** A23 (beyond ref) — forward-fill resampling: a19 zero-fills COUNTS
    * (absence of events means zero events); a gauge reading carries
    * forward instead (absence of a reading means the last reading still
    * stands — last observation carried forward). Same span-bounded
    * per-user 6h grid as a19 (never global-calendar × users), plus ONE
    * running last_value(ignore nulls) window per user — the grid join's
    * user-keyed shuffle already co-locates the window partition, so the
    * fill adds no exchange (same-key window rides the existing
    * partitioning). Per-bucket gauge = max(value) as DECIMAL (exact,
    * order-independent in both engines), cast to DOUBLE at the end. The
    * grid starts at each user's first observed bucket, so row 1 of every
    * partition is non-null and no leading-null policy is needed. */
  val a23ResampleFfill = OpQuery(
    "a23_resample_ffill",
    "forward-fill per-user 6h-grid gauge: last observation carried forward",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val e = t(s, dir, "events")
        .select(col("user_id"),
          expr("unix_micros(ts) div 21600000000").as("bkt"),
          col("value").cast("decimal(18,2)").as("v"))
      val perBkt = e.groupBy(col("user_id"), col("bkt"))
        .agg(max(col("v")).as("g"))
      val grid = e.groupBy(col("user_id"))
        .agg(min(col("bkt")).as("b0"), max(col("bkt")).as("b1"))
        .select(col("user_id"),
          explode(sequence(col("b0"), col("b1"))).as("bkt"))
      val w = Window.partitionBy("user_id").orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(perBkt, Seq("user_id", "bkt"), "left")
        .withColumn("gauge",
          last(col("g"), ignoreNulls = true).over(w).cast("double"))
        .select(col("user_id"), col("bkt"), col("gauge"))
        .orderBy("user_id", "bkt")
    },
    Some("""WITH e AS (SELECT user_id, epoch_us(ts) // 21600000000 AS bkt,
                         CAST(value AS DECIMAL(18,2)) AS v
                       FROM events),
            per AS (SELECT user_id, bkt, max(v) AS g
                    FROM e GROUP BY user_id, bkt),
            spans AS (SELECT user_id, min(bkt) AS b0, max(bkt) AS b1
                      FROM e GROUP BY user_id),
            grid AS (SELECT user_id, unnest(generate_series(b0, b1)) AS bkt
                     FROM spans),
            j AS (SELECT grid.user_id, grid.bkt, per.g
                  FROM grid LEFT JOIN per
                    ON per.user_id = grid.user_id AND per.bkt = grid.bkt)
            SELECT user_id, bkt,
                   CAST(last_value(g IGNORE NULLS) OVER (
                     PARTITION BY user_id ORDER BY bkt
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS DOUBLE) AS gauge
            FROM j ORDER BY user_id, bkt"""))

  /** A24 (beyond ref) — exponentially weighted moving average, the
    * standard monitoring smoother next to a18's decayed sums: one
    * smoothed reading per event, s_t = (c_t + s_{t-1}) / 2 (α = 1/2).
    * Like a22 the recurrence is data-dependent (each output feeds the
    * next), so no fixed-depth window expresses it — secondary-sort
    * streaming fold on the Spark side (same spill-safe shape as a22:
    * repartition + sortWithinPartitions + mapPartitions, O(1) live state
    * per key), recursive CTE on the oracle side.
    *
    * Engine-parity design: the reading is the event value in exact CENTS
    * (DECIMAL(18,2) × 100 → BIGINT — integral-valued, so truncate-vs-
    * round cast semantics cannot diverge) and each step floors the
    * integer average — both engines state floor division over
    * non-negative operands, so every intermediate s_t is bit-identical
    * and the query hash-gates with no epsilon anywhere. The non-negative
    * precondition is ENFORCED, not assumed ([[requireNonNegCents]] —
    * Spark's Math.floorDiv and DuckDB's truncating `//` diverge on
    * negative operands, so a negative reading fails loudly instead of
    * silently breaking the hash gate). α = 1/2 specifically BECAUSE
    * halving is exact in integers; a production α = 1/2^k chain composes
    * the same halving k times — [[a26EwmaAlpha8]] ships that chain. */
  /** a24/a25/a26 precondition breaker: the integer-exact EWMA's
    * engine parity holds only for non-negative cents — Spark's
    * Math.floorDiv floors toward −∞ while DuckDB's `//` truncates toward
    * zero (−7 // 2 = −3 vs floorDiv(−7, 2) = −4), identical exactly when
    * both operands are ≥ 0. Rather than assume, fail loudly the first
    * time a negative reading appears (ADVICE r13: a regenerated fixture
    * with a negative value would otherwise silently diverge the hash
    * gate). */
  private[graft] def requireNonNegCents(q: String, id: Long, c: Long): Unit =
    if (c < 0L) throw new IllegalArgumentException(
      s"$q: negative cents reading c=$c at event_id=$id — the " +
        "integer-exact EWMA's cross-engine parity is only proven for " +
        "non-negative readings; offset or scrub the reading upstream")

  val a24Ewma = OpQuery(
    "a24_ewma",
    "integer-exact EWMA (alpha=1/2) of value cents per user, one reading per event",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("us"),
          (col("value").cast("decimal(18,2)") * 100).cast("long").as("c"))
        .repartition(col("user_id"))
        .sortWithinPartitions("user_id", "us", "event_id")
        .as[(Long, Long, Long, Long)]
        .mapPartitions { it =>
          var open = false
          var curU = 0L
          var sAcc = Long.MinValue
          it.map { case (id, u, us, c) =>
            requireNonNegCents("a24_ewma", id, c)
            if (!open || u != curU) { open = true; curU = u; sAcc = Long.MinValue }
            sAcc = if (sAcc == Long.MinValue) c
              else Math.floorDiv(c + sAcc, 2L)
            (id, u, us, sAcc)
          }
        }
        .toDF("event_id", "user_id", "us", "ewma_c")
        .orderBy("event_id")
    },
    Some("""WITH RECURSIVE e AS MATERIALIZED (
              SELECT event_id, user_id, epoch_us(ts) AS us,
                     CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c,
                     row_number() OVER (PARTITION BY user_id
                       ORDER BY epoch_us(ts), event_id) AS rn
              FROM events),
            r AS (
              SELECT user_id, rn, event_id, us, c AS ewma_c
              FROM e WHERE rn = 1
              UNION ALL
              SELECT e.user_id, e.rn, e.event_id, e.us,
                     (e.c + r.ewma_c) // 2
              FROM r JOIN e ON e.user_id = r.user_id AND e.rn = r.rn + 1)
            SELECT event_id, user_id, us, ewma_c
            FROM r ORDER BY event_id"""))

  /** A25 (beyond ref) — EWMA-residual anomaly flags, the alerting stage
    * the monitoring family builds toward (resample → smooth → debounce/
    * ratelimit → FLAG): an event is a spike iff its reading deviates
    * from the PREVIOUS smoothed value by ≥ 50.00 (5000 cents — the
    * fixture's ~p75 residual, so both classes populate at every SF); the
    * first event per user has no baseline and is never a spike. The
    * deviation is measured BEFORE the reading folds into the average —
    * a spike must not vouch for itself. Same integer-exact recurrence as
    * a24 (shared rule, stated identically in the recursive CTE), so the
    * flag is bit-deterministic, no epsilon. */
  val a25EwmaAnomaly = OpQuery(
    "a25_ewma_anomaly",
    "EWMA-residual spike flags: |cents - prev smoothed| >= 5000, first event exempt",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("us"),
          (col("value").cast("decimal(18,2)") * 100).cast("long").as("c"))
        .repartition(col("user_id"))
        .sortWithinPartitions("user_id", "us", "event_id")
        .as[(Long, Long, Long, Long)]
        .mapPartitions { it =>
          var open = false
          var curU = 0L
          var sAcc = Long.MinValue
          it.map { case (id, u, us, c) =>
            requireNonNegCents("a25_ewma_anomaly", id, c)
            if (!open || u != curU) { open = true; curU = u; sAcc = Long.MinValue }
            val spike =
              if (sAcc == Long.MinValue) 0L
              else if (math.abs(c - sAcc) >= 5000L) 1L else 0L
            sAcc = if (sAcc == Long.MinValue) c
              else Math.floorDiv(c + sAcc, 2L)
            (id, u, us, sAcc, spike)
          }
        }
        .toDF("event_id", "user_id", "us", "ewma_c", "is_spike")
        .orderBy("event_id")
    },
    Some("""WITH RECURSIVE e AS MATERIALIZED (
              SELECT event_id, user_id, epoch_us(ts) AS us,
                     CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c,
                     row_number() OVER (PARTITION BY user_id
                       ORDER BY epoch_us(ts), event_id) AS rn
              FROM events),
            r AS (
              SELECT user_id, rn, event_id, us, c AS ewma_c,
                     CAST(0 AS BIGINT) AS is_spike
              FROM e WHERE rn = 1
              UNION ALL
              SELECT e.user_id, e.rn, e.event_id, e.us,
                     (e.c + r.ewma_c) // 2,
                     CAST(abs(e.c - r.ewma_c) >= 5000 AS BIGINT)
              FROM r JOIN e ON e.user_id = r.user_id AND e.rn = r.rn + 1)
            SELECT event_id, user_id, us, ewma_c, is_spike
            FROM r ORDER BY event_id"""))

  /** A26 (beyond ref) — the PRODUCTION-α EWMA: a24's scaladoc claims
    * "a production α = 1/2^k chain composes the same halving k times";
    * this query proves it at k = 3 (α = 1/8, the monitoring default for
    * slow baselines). s_t = ⌊(c_t + 7·s_{t−1}) / 8⌋ IS three composed
    * floor-halvings — for non-negative x, ⌊⌊⌊x/2⌋/2⌋/2⌋ = ⌊x/8⌋ — so the
    * exactness argument carries verbatim: readings are integral cents,
    * both operands stay non-negative (enforced by [[requireNonNegCents]];
    * s is a convex-combination floor of non-negatives), floor division
    * equals DuckDB's truncating `//` on that domain, every intermediate
    * s_t is bit-identical, no epsilon anywhere. Same spill-safe
    * secondary-sort fold as a24; same recursive-CTE oracle pattern. */
  val a26EwmaAlpha8 = OpQuery(
    "a26_ewma_alpha8",
    "integer-exact EWMA at production alpha=1/8: three composed halvings per step",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("us"),
          (col("value").cast("decimal(18,2)") * 100).cast("long").as("c"))
        .repartition(col("user_id"))
        .sortWithinPartitions("user_id", "us", "event_id")
        .as[(Long, Long, Long, Long)]
        .mapPartitions { it =>
          var open = false
          var curU = 0L
          var sAcc = Long.MinValue
          it.map { case (id, u, us, c) =>
            requireNonNegCents("a26_ewma_alpha8", id, c)
            if (!open || u != curU) { open = true; curU = u; sAcc = Long.MinValue }
            sAcc = if (sAcc == Long.MinValue) c
              else Math.floorDiv(c + 7L * sAcc, 8L)
            (id, u, us, sAcc)
          }
        }
        .toDF("event_id", "user_id", "us", "ewma_c")
        .orderBy("event_id")
    },
    Some("""WITH RECURSIVE e AS MATERIALIZED (
              SELECT event_id, user_id, epoch_us(ts) AS us,
                     CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c,
                     row_number() OVER (PARTITION BY user_id
                       ORDER BY epoch_us(ts), event_id) AS rn
              FROM events),
            r AS (
              SELECT user_id, rn, event_id, us, c AS ewma_c
              FROM e WHERE rn = 1
              UNION ALL
              SELECT e.user_id, e.rn, e.event_id, e.us,
                     (e.c + 7 * r.ewma_c) // 8
              FROM r JOIN e ON e.user_id = r.user_id AND e.rn = r.rn + 1)
            SELECT event_id, user_id, us, ewma_c
            FROM r ORDER BY event_id"""))

  /** PSI composition over a zero-filled (side, bucket, n) histogram grid
    * (`side` ∈ ref/cur, buckets 0..nBuckets−1): Population Stability
    * Index Σᵢ (pᵢ − qᵢ)·ln(pᵢ/qᵢ) with add-one smoothing, in the
    * x_domain_kl exactness recipe — each log term floor-truncated at
    * 4 dp, weighted by an EXACT INTEGER numerator (pᵢ − qᵢ =
    * [(c_refᵢ+1)(nq+B) − (c_curᵢ+1)(np+B)] / [(np+B)(nq+B)] — the
    * denominator is bucket-independent so it divides ONCE after the
    * exact DECIMAL sum), final value floor-truncated at 6 dp. Returns
    * one row per bucket: (bucket, c_ref, c_cur, psi, is_drift) with
    * the standard 0.2 alert threshold. Shared by a27_psi_drift and
    * st_psi_drift_stream (the counts differ in provenance only). */
  private[graft] def psiFromCounts(filled: org.apache.spark.sql.DataFrame,
      nBuckets: Int): org.apache.spark.sql.DataFrame = {
    val pivoted = filled.groupBy("bucket").agg(
      sum(when(col("side") === "ref", col("n")).otherwise(0L)).as("c_ref"),
      sum(when(col("side") === "cur", col("n")).otherwise(0L)).as("c_cur"))
    val tots = pivoted.agg(sum("c_ref").as("np"), sum("c_cur").as("nq"))
    val b = lit(nBuckets.toLong)
    val terms = pivoted.crossJoin(broadcast(tots))
      .withColumn("lnr",
        floor(log(((col("c_ref") + 1L) * (col("nq") + b)).cast("double") /
          ((col("c_cur") + 1L) * (col("np") + b))) * 10000.0) / 10000.0)
      .withColumn("dnum",
        (col("c_ref") + 1L) * (col("nq") + b) -
          (col("c_cur") + 1L) * (col("np") + b))
      .withColumn("w", col("lnr").cast("decimal(18,4)") * col("dnum"))
    val psi = terms.groupBy("np", "nq").agg(sum("w").as("sw"))
      .select((floor(col("sw").cast("double") /
        ((col("np") + b) * (col("nq") + b)) * 1000000.0) / 1000000.0)
        .as("psi"))
    pivoted.crossJoin(broadcast(psi))
      .select(col("bucket"), col("c_ref"), col("c_cur"), col("psi"),
        (col("psi") >= 0.2).cast("long").as("is_drift"))
      .orderBy("bucket")
  }

  /** The (side, bucket) tagging both PSI queries share: side = which
    * time half the event falls in (vs frozen span bounds — integer
    * arithmetic only, us·2 ≤ lo+hi avoids division), bucket = value
    * cents scaled into nBuckets equal-width bins over [0, maxCents]
    * (exact integer div). Bounds arrive as COLUMNS so the batch query
    * passes the broadcast 1-row frame's refs while the streaming twin
    * passes frozen literals (the st_trend_decay shape — no stream-static
    * crossJoin in the streaming plan). Row-local either way. */
  private[graft] def psiTag(e: org.apache.spark.sql.DataFrame,
      lo: org.apache.spark.sql.Column, hi: org.apache.spark.sql.Column,
      mc: org.apache.spark.sql.Column,
      nBuckets: Int): org.apache.spark.sql.DataFrame = {
    // exact integer floor division (c·B div (mc+1)) without a SQL-string
    // div: subtract the remainder first, so the double division is of
    // exactly-divisible longs and the quotient is bit-exact
    val num = col("c") * lit(nBuckets.toLong)
    val den = mc + lit(1L)
    e.select(
      when(col("us") * 2 <= lo + hi, lit("ref"))
        .otherwise(lit("cur")).as("side"),
      least(((num - pmod(num, den)) / den).cast("long"),
        lit(nBuckets.toLong - 1L)).as("bucket"))
  }

  private[graft] def psiGrid(s: SparkSession, nBuckets: Int) = {
    import s.implicits._
    s.range(nBuckets.toLong).select(col("id").as("bucket"))
      .crossJoin(Seq("ref", "cur").toDF("side"))
  }

  /** A27 (beyond ref) — PSI distribution-drift detector, the monitoring
    * family's DATA-DRIFT stage (resample → smooth → flag → DRIFT): the
    * Population Stability Index of the value distribution between the
    * observation span's two time halves, over 10 equal-width cent
    * buckets. PSI is the standard train/serve drift metric for a
    * training-data pipeline (psi < 0.1 stable, ≥ 0.2 actionable drift —
    * the emitted `is_drift` flag uses 0.2). Integer-exact except the
    * per-bucket ln term, which follows x_domain_kl's proven recipe
    * (4-dp floor per term → exact DECIMAL weighting → one final 6-dp
    * floor), so the query hash-gates. */
  val a27PsiDrift = OpQuery(
    "a27_psi_drift",
    "PSI drift of value cents between time halves: 10 buckets, KL-recipe exactness",
    (s, dir) => {
      val e = t(s, dir, "events")
        .select(unix_micros(col("ts")).as("us"),
          (col("value").cast("decimal(18,2)") * 100).cast("long").as("c"))
      val bounds = e.agg(min("us").as("lo"), max("us").as("hi"),
        max("c").as("mc"))
      val counts = psiTag(e.crossJoin(broadcast(bounds)),
          col("lo"), col("hi"), col("mc"), 10)
        .groupBy("side", "bucket").agg(count(lit(1)).as("n"))
      val filled = psiGrid(s, 10).join(counts, Seq("side", "bucket"), "left")
        .select(col("side"), col("bucket"),
          coalesce(col("n"), lit(0L)).as("n"))
      psiFromCounts(filled, 10)
    },
    Some("""WITH e AS (SELECT epoch_us(ts) AS us,
                         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
                       FROM events),
            b AS (SELECT min(us) AS lo, max(us) AS hi, max(c) AS mc FROM e),
            tagged AS (SELECT
                CASE WHEN e.us * 2 <= b.lo + b.hi THEN 'ref' ELSE 'cur' END
                  AS side,
                least(e.c * 10 // (b.mc + 1), 9) AS bucket
              FROM e, b),
            counts AS (SELECT side, bucket, count(*) AS n
                       FROM tagged GROUP BY 1, 2),
            grid AS (SELECT s.side, g.bucket
                     FROM (SELECT unnest(['ref', 'cur']) AS side) s,
                          (SELECT unnest(generate_series(0, 9)) AS bucket) g),
            filled AS (SELECT grid.side, grid.bucket,
                coalesce(counts.n, 0) AS n
              FROM grid LEFT JOIN counts USING (side, bucket)),
            p AS (SELECT bucket,
                sum(CASE WHEN side = 'ref' THEN n ELSE 0 END) AS c_ref,
                sum(CASE WHEN side = 'cur' THEN n ELSE 0 END) AS c_cur
              FROM filled GROUP BY 1),
            t AS (SELECT sum(c_ref) AS np, sum(c_cur) AS nq FROM p),
            terms AS (SELECT p.bucket, p.c_ref, p.c_cur, t.np, t.nq,
                floor(ln(CAST((p.c_ref + 1) * (t.nq + 10) AS DOUBLE)
                  / ((p.c_cur + 1) * (t.np + 10))) * 10000.0) / 10000.0
                  AS lnr,
                (p.c_ref + 1) * (t.nq + 10) - (p.c_cur + 1) * (t.np + 10)
                  AS dnum
              FROM p, t),
            sw AS (SELECT np, nq,
                sum(CAST(lnr AS DECIMAL(18,4)) * dnum) AS s
              FROM terms GROUP BY 1, 2),
            psi AS (SELECT floor(CAST(s AS DOUBLE)
                / ((np + 10) * (nq + 10)) * 1000000.0) / 1000000.0 AS v
              FROM sw)
            SELECT CAST(terms.bucket AS BIGINT) AS bucket,
                   CAST(terms.c_ref AS BIGINT) AS c_ref,
                   CAST(terms.c_cur AS BIGINT) AS c_cur,
                   CAST(psi.v AS DOUBLE) AS psi,
                   CAST(psi.v >= 0.2 AS BIGINT) AS is_drift
            FROM terms, psi ORDER BY bucket"""))

  /** a28/st_cusum constants: slack K = 10.00 (the half-drift the chart is
    * tuned to ignore) and decision threshold H = 200.00, in cents. On the
    * driver fixture (mean ≈ 49.63, heavy right tail) both alarm classes
    * populate at every SF: single large readings trip the positive side
    * immediately, sustained below-target runs accumulate the negative
    * side over ~6 events. */
  private[graft] val CusumSlackCents = 1000L
  private[graft] val CusumThresholdCents = 20000L

  /** One CUSUM step, shared verbatim by the a28 batch fold and
    * st_cusum_stream's keyed state machine so the two can never drift:
    * from the carried post-reset accumulators (gp, gn) and a reading c,
    * produce (gpRaw, gnRaw, alarm, gpNext, gnNext). Raw values are
    * emitted; post-alarm the accumulators restart at 0 so the chart
    * re-arms and a long deviation yields repeated alarms rather than a
    * single saturating one. Only +/−/max over BIGINT — sign-agnostic,
    * so unlike the EWMA family there is NO non-negativity precondition
    * on the readings. */
  private[graft] def cusumStep(gp: Long, gn: Long, c: Long, tgt: Long):
      (Long, Long, Long, Long, Long) = {
    val gpRaw = math.max(0L, gp + c - tgt - CusumSlackCents)
    val gnRaw = math.max(0L, gn + tgt - c - CusumSlackCents)
    val alarm =
      if (gpRaw >= CusumThresholdCents || gnRaw >= CusumThresholdCents) 1L
      else 0L
    if (alarm == 1L) (gpRaw, gnRaw, alarm, 0L, 0L)
    else (gpRaw, gnRaw, alarm, gpRaw, gnRaw)
  }

  /** A28 (beyond ref) — CUSUM change-point detection (Page 1954), the
    * monitoring family's CHANGE-POINT stage (resample → smooth → flag →
    * drift → change-point): PSI (a27) says the distribution moved; CUSUM
    * says WHEN the level moved, per key. Two-sided: gp accumulates
    * above-target deviation max(0, gp + c − T − K), gn below-target
    * max(0, gn + T − c − K); alarm when either crosses H, then both
    * restart (re-armed chart). The reference level T is FROZEN at the
    * global integral mean of the cents readings — exactly how a
    * production chart calibrates μ₀ offline — computed with Spark's
    * `div` ≡ DuckDB's truncating `//` (identical on all signs, so no
    * sign precondition anywhere in this query; the recurrence itself is
    * +/−/max only). Same spill-safe secondary-sort fold as a24, same
    * recursive-CTE oracle family; every emitted accumulator is
    * bit-identical across engines, no epsilon. */
  val a28Cusum = OpQuery(
    "a28_cusum",
    "two-sided integer CUSUM change-point per user vs frozen global target, re-armed after alarm",
    (s, dir) => {
      import s.implicits._
      val e = t(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("us"),
          (col("value").cast("decimal(18,2)") * 100).cast("long").as("c"))
      val target = e.agg(sum("c").as("sc"), count(lit(1)).as("n"))
        .select(expr("sc div n").as("tgt"))
      e.crossJoin(broadcast(target))
        .repartition(col("user_id"))
        .sortWithinPartitions("user_id", "us", "event_id")
        .as[(Long, Long, Long, Long, Long)]
        .mapPartitions { it =>
          var open = false
          var curU = 0L
          var gp = 0L
          var gn = 0L
          it.map { case (id, u, us, c, tgt) =>
            if (!open || u != curU) { open = true; curU = u; gp = 0L; gn = 0L }
            val (gpRaw, gnRaw, alarm, gpN, gnN) = cusumStep(gp, gn, c, tgt)
            gp = gpN; gn = gnN
            (id, u, us, gpRaw, gnRaw, alarm)
          }
        }
        .toDF("event_id", "user_id", "us", "gp", "gn", "is_alarm")
        .orderBy("event_id")
    },
    Some("""WITH RECURSIVE e AS MATERIALIZED (
              SELECT event_id, user_id, epoch_us(ts) AS us,
                     CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c,
                     row_number() OVER (PARTITION BY user_id
                       ORDER BY epoch_us(ts), event_id) AS rn
              FROM events),
            t AS MATERIALIZED (SELECT CAST(sum(c) // count(*) AS BIGINT) AS tgt FROM e),
            r AS (
              SELECT e.user_id, e.rn, e.event_id, e.us,
                     greatest(0, e.c - t.tgt - 1000) AS gp,
                     greatest(0, t.tgt - e.c - 1000) AS gn,
                     CAST(greatest(0, e.c - t.tgt - 1000) >= 20000
                       OR greatest(0, t.tgt - e.c - 1000) >= 20000
                       AS BIGINT) AS is_alarm
              FROM e CROSS JOIN t WHERE e.rn = 1
              UNION ALL
              SELECT e.user_id, e.rn, e.event_id, e.us,
                     greatest(0, (CASE WHEN r.is_alarm = 1 THEN 0 ELSE r.gp END)
                       + e.c - t.tgt - 1000),
                     greatest(0, (CASE WHEN r.is_alarm = 1 THEN 0 ELSE r.gn END)
                       + t.tgt - e.c - 1000),
                     CAST(greatest(0, (CASE WHEN r.is_alarm = 1 THEN 0 ELSE r.gp END)
                         + e.c - t.tgt - 1000) >= 20000
                       OR greatest(0, (CASE WHEN r.is_alarm = 1 THEN 0 ELSE r.gn END)
                         + t.tgt - e.c - 1000) >= 20000
                       AS BIGINT) AS is_alarm
              FROM r JOIN e ON e.user_id = r.user_id AND e.rn = r.rn + 1
              CROSS JOIN t)
            SELECT event_id, user_id, us, gp, gn, is_alarm
            FROM r ORDER BY event_id"""))

  /** Lower (discrete) median of an integer-valued reading from its
    * HISTOGRAM: given per-(event_type, v) counts, select the v whose
    * cumulative count first reaches ⌈n/2⌉ = (n+1) div 2. This is the
    * 100-TB shape for exact medians over integer domains — the shuffle
    * is keyed by (type, value) (bounded-domain, never skewed by a hot
    * type) and the window sort runs over DISTINCT values per type
    * (≤ cents domain), not over raw rows. Selection by rank is
    * tie-safe: equal values collapse into one histogram row, so the
    * chosen v is unique by construction. */
  private[graft] def histLowerMedian(counts: org.apache.spark.sql.DataFrame):
      org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("event_type").orderBy("v")
    val cum = counts.withColumn("cum", sum("cnt").over(w))
    val tot = counts.groupBy("event_type").agg(sum("cnt").as("n"))
      .withColumn("target", expr("(n + 1) div 2"))
    cum.join(broadcast(tot), Seq("event_type"))
      .filter(col("cum") >= col("target") &&
        col("cum") - col("cnt") < col("target"))
      .select(col("event_type"), col("v"))
  }

  /** Per-type (med_c, mad_c) frames of a cents reading, shared by
    * a29_robust_outliers, a30_monitor_e2e and st_monitor_e2e_stream so
    * the three scrub surfaces can never drift: med = histogram-CDF lower
    * median of `c` per event_type ([[histLowerMedian]]), mad = the same
    * selection over |c − med|. `e` must carry (event_type, c). */
  private[graft] def medMadByType(e: org.apache.spark.sql.DataFrame):
      (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val med = histLowerMedian(
        e.groupBy(col("event_type"), col("c").as("v"))
          .agg(count(lit(1)).as("cnt")))
      .withColumnRenamed("v", "med_c")
    val mad = histLowerMedian(
        e.join(broadcast(med), Seq("event_type"))
          .groupBy(col("event_type"), abs(col("c") - col("med_c")).as("v"))
          .agg(count(lit(1)).as("cnt")))
      .withColumnRenamed("v", "mad_c")
    (med, mad)
  }

  /** A29 (beyond ref) — robust outlier flags via median/MAD, the
    * monitoring family's OUTLIER stage and the data-quality scrub a
    * training pipeline runs before a25's EWMA ever sees a reading (mean/
    * stddev-based z-scores are dragged by the very outliers they hunt;
    * the median and the Median Absolute Deviation have 50% breakdown).
    * Per event_type: med = lower discrete median of the cents readings,
    * mad = lower discrete median of |c − med|, flag = |c − med| > 3·mad.
    * Everything is BIGINT selection-and-compare — no interpolation, no
    * 1.4826 consistency scaling (the 3·mad gate absorbs the constant) —
    * so the query is bit-deterministic and hash-gates with no epsilon.
    * Both medians come from [[histLowerMedian]]'s histogram-CDF
    * selection: the scale-honest exact shape (bounded-domain shuffles;
    * the sort is over distinct values, not rows). The oracle states the
    * same lower median via row_number — rank selection over sorted
    * values and CDF selection over the histogram pick the same element
    * by definition.
    *
    * Relationship to x_mad_outliers (`ext.Profiling.madOutliers`): that
    * query emits the per-TYPE profile (med/mad/n/n_outliers, one row per
    * group — the data-quality dashboard surface) via the same discrete
    * selection computed through the distributed PrefixSum machinery;
    * THIS query emits the per-EVENT flags — the actionable scrub surface
    * a30_monitor_e2e composes — and stays in the integer domain so the
    * monitoring family's no-epsilon contract holds end to end. */
  val a29RobustOutliers = OpQuery(
    "a29_robust_outliers",
    "median/MAD robust outlier flags per event_type: |c - med| > 3*mad, integer-exact",
    (s, dir) => {
      val e = t(s, dir, "events")
        .select(col("event_id"), col("event_type"),
          (col("value").cast("decimal(18,2)") * 100).cast("long").as("c"))
      val (med, mad) = medMadByType(e)
      e.join(broadcast(med), Seq("event_type"))
        .withColumn("dev", abs(col("c") - col("med_c")))
        .join(broadcast(mad), Seq("event_type"))
        .select(col("event_id"), col("event_type"), col("c"),
          col("med_c"), col("mad_c"),
          (col("dev") > lit(3L) * col("mad_c")).cast("long").as("is_outlier"))
        .orderBy("event_id")
    },
    Some("""WITH e AS (SELECT event_id, event_type,
                         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
                       FROM events),
            m AS (SELECT event_type, c AS med_c FROM (
                    SELECT event_type, c,
                           row_number() OVER (PARTITION BY event_type
                             ORDER BY c, event_id) AS rn,
                           count(*) OVER (PARTITION BY event_type) AS n
                    FROM e) WHERE rn = (n + 1) // 2),
            d AS (SELECT e.event_id, e.event_type, e.c, m.med_c,
                         abs(e.c - m.med_c) AS dev
                  FROM e JOIN m USING (event_type)),
            md AS (SELECT event_type, dev AS mad_c FROM (
                     SELECT event_type, dev, event_id,
                            row_number() OVER (PARTITION BY event_type
                              ORDER BY dev, event_id) AS rn,
                            count(*) OVER (PARTITION BY event_type) AS n
                     FROM d) WHERE rn = (n + 1) // 2)
            SELECT d.event_id, d.event_type, d.c, d.med_c, md.mad_c,
                   CAST(d.dev > 3 * md.mad_c AS BIGINT) AS is_outlier
            FROM d JOIN md USING (event_type) ORDER BY event_id"""))

  /** a30/st_monitor_e2e alert gap: one alert per user per 7 days — sized
    * to the fixture's ~4-day mean inter-spike gap per user so BOTH alert
    * classes (kept and suppressed) populate at every SF. */
  private[graft] val AlertGapUs = 7L * 86400L * 1000000L

  /** The a30 per-user state machine, shared verbatim with
    * st_monitor_e2e_stream (the cusumStep pattern): from the carried
    * (smoothed, lastAlertUs) state and a scrubbed reading, produce the
    * post-fold smoothed value and whether this reading raises an ALERT —
    * a spike (|c − previous smoothed| ≥ 5000, a25's contract: measured
    * BEFORE the reading folds in, first reading per key exempt) that is
    * not suppressed by the per-key alert rate limit (a22's previous-KEPT
    * contract at [[AlertGapUs]]). Long.MinValue seeds both state
    * scalars. */
  private[graft] def monitorStep(sAcc: Long, lastAlert: Long, us: Long,
      c: Long): (Long, Long, Boolean) = {
    val spike = sAcc != Long.MinValue && math.abs(c - sAcc) >= 5000L
    val sNext =
      if (sAcc == Long.MinValue) c else Math.floorDiv(c + sAcc, 2L)
    val alert = spike &&
      (lastAlert == Long.MinValue || us - lastAlert >= AlertGapUs)
    (sNext, if (alert) us else lastAlert, alert)
  }

  /** A30 (beyond ref) — the monitoring family's E2E CAPSTONE, composing
    * the shipped stages into the pipeline a production monitor actually
    * runs, as ONE query with ONE full SQL restatement: (1) SCRUB — drop
    * readings deviating > 3·MAD from their type's median (a29's robust
    * gate: corrupt readings must not poison the baseline), (2) SMOOTH +
    * FLAG — a24's integer-exact EWMA with a25's spike contract over the
    * surviving readings, (3) ALERT — a22's previous-KEPT rate limit over
    * the spikes (one alert per user per [[AlertGapUs]]; a sustained
    * incident pages once a week, not once a minute). Emits only the
    * alert rows. The whole chain is a SINGLE secondary-sort fold per
    * user after two broadcast scrub joins — the scrub is row-local once
    * med/mad broadcast, and stages 2+3 share one pass (state: two
    * longs). Oracle: a29's median CTEs → a24's recursive EWMA CTE over
    * the kept rows → a22's recursive rate-limit CTE over the spike rows,
    * with the two recursion inputs MATERIALIZED (an unmaterialized CTE
    * feeding a recursive join re-evaluates per iteration — measured
    * 120 s+ → 0.4 s at sf0.1). Same integer-exactness as every stage it
    * composes: no epsilon anywhere. */
  val a30MonitorE2e = OpQuery(
    "a30_monitor_e2e",
    "monitoring pipeline e2e: MAD-scrub -> integer EWMA spikes -> rate-limited alerts",
    (s, dir) => {
      import s.implicits._
      val e = t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"),
          (col("value").cast("decimal(18,2)") * 100).cast("long").as("c"))
      val (med, mad) = medMadByType(e)
      e.join(broadcast(med), Seq("event_type"))
        .withColumn("dev", abs(col("c") - col("med_c")))
        .join(broadcast(mad), Seq("event_type"))
        .filter(col("dev") <= lit(3L) * col("mad_c"))
        .select(col("event_id"), col("user_id"), col("us"), col("c"))
        .repartition(col("user_id"))
        .sortWithinPartitions("user_id", "us", "event_id")
        .as[(Long, Long, Long, Long)]
        .mapPartitions { it =>
          var open = false
          var curU = 0L
          var sAcc = Long.MinValue
          var lastAlert = Long.MinValue
          it.flatMap { case (id, u, us, c) =>
            requireNonNegCents("a30_monitor_e2e", id, c)
            if (!open || u != curU) {
              open = true; curU = u
              sAcc = Long.MinValue; lastAlert = Long.MinValue
            }
            val (sN, laN, alert) = monitorStep(sAcc, lastAlert, us, c)
            sAcc = sN; lastAlert = laN
            if (alert) Some((id, u, us, sAcc)) else None
          }
        }
        .toDF("event_id", "user_id", "us", "ewma_c")
        .orderBy("event_id")
    },
    Some("""WITH RECURSIVE e AS MATERIALIZED (SELECT event_id, user_id, event_type,
                epoch_us(ts) AS us,
                CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
              FROM events),
            m AS (SELECT event_type, c AS med_c FROM (
                    SELECT event_type, c, event_id,
                           row_number() OVER (PARTITION BY event_type
                             ORDER BY c, event_id) AS rn,
                           count(*) OVER (PARTITION BY event_type) AS n
                    FROM e) WHERE rn = (n + 1) // 2),
            d AS (SELECT e.event_id, e.user_id, e.us, e.c, e.event_type,
                         abs(e.c - m.med_c) AS dev
                  FROM e JOIN m USING (event_type)),
            md AS (SELECT event_type, dev AS mad_c FROM (
                     SELECT event_type, dev, event_id,
                            row_number() OVER (PARTITION BY event_type
                              ORDER BY dev, event_id) AS rn,
                            count(*) OVER (PARTITION BY event_type) AS n
                     FROM d) WHERE rn = (n + 1) // 2),
            kept AS MATERIALIZED (
              SELECT d.event_id, d.user_id, d.us, d.c,
                     row_number() OVER (PARTITION BY d.user_id
                       ORDER BY d.us, d.event_id) AS rn
              FROM d JOIN md USING (event_type)
              WHERE d.dev <= 3 * md.mad_c),
            r AS (
              SELECT user_id, rn, event_id, us, c AS ewma_c,
                     CAST(0 AS BIGINT) AS is_spike
              FROM kept WHERE rn = 1
              UNION ALL
              SELECT k.user_id, k.rn, k.event_id, k.us,
                     (k.c + r.ewma_c) // 2,
                     CAST(abs(k.c - r.ewma_c) >= 5000 AS BIGINT)
              FROM r JOIN kept k
                ON k.user_id = r.user_id AND k.rn = r.rn + 1),
            sp AS MATERIALIZED (
              SELECT user_id, event_id, us, ewma_c,
                     row_number() OVER (PARTITION BY user_id
                       ORDER BY us, event_id) AS srn
              FROM r WHERE is_spike = 1),
            al AS (
              SELECT user_id, srn, event_id, us, ewma_c,
                     CAST(1 AS BIGINT) AS kept_alert, us AS last_us
              FROM sp WHERE srn = 1
              UNION ALL
              SELECT s.user_id, s.srn, s.event_id, s.us, s.ewma_c,
                     CAST(s.us - al.last_us >= 604800000000 AS BIGINT),
                     CASE WHEN s.us - al.last_us >= 604800000000
                       THEN s.us ELSE al.last_us END
              FROM al JOIN sp s
                ON s.user_id = al.user_id AND s.srn = al.srn + 1)
            SELECT event_id, user_id, us, ewma_c
            FROM al WHERE kept_alert = 1 ORDER BY event_id"""))

  /** A31 (beyond ref) — SCD TYPE-2 dimension history, the auditable twin
    * of the reference's latest-only dim store (K3's upsertDim keeps the
    * newest row per key, RT/app/func/DimSink — the HBase/Phoenix upsert;
    * K5's ReplacingMergeTree view reads the newest version): every change
    * record becomes a VERSION with a validity interval
    * [valid_from, valid_to), valid_to = the next version's effective
    * time, NULL while current. The standard warehouse answer to "what
    * did this dimension row say when the fact happened" — j6_asof_join
    * is exactly a lookup into this table's intervals.
    *
    * Change feed: the signup events per user, effective at event time,
    * versioned attribute = the reading in exact cents (the same
    * integral-cents contract as a24, so the frame is hash-exact with no
    * epsilon). Version numbers and interval edges are assigned in
    * (event-time, id) order — deterministic under ties.
    *
    * Scale shape: ONE shuffle keyed by the dimension key; the per-key
    * window sort is bounded by that key's version count (a dim key's
    * change history — thousands, not millions), nothing global. At
    * 100 TB of change records this is the same layout the dim table
    * itself needs, and the window spills through Spark's external sorter
    * if a key is pathological. */
  /** The SCD2 interval build over any change-record frame
    * (event_id, user_id, us, c) — factored so Scd2PropSpec can drive
    * randomized corpora through the REAL build. */
  private[queries] def scd2FromChanges(changes: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    changes
      // no-op-change collapse (standard SCD2): a real CDC feed re-writes
      // rows whose tracked attribute did NOT change; a new version opens
      // only on a VALUE change, else consecutive equal values would mint
      // zero-information versions that bloat the history table and the
      // broadcast lookup side. The collapsed row simply extends the open
      // version's interval (its valid_to stays the NEXT real change).
      // Both windows share the partitioning+ordering, so Catalyst plans
      // ONE exchange + one sort for the lag and the renumbering.
      .withColumn("_pc", lag(col("c"), 1).over(w))
      .filter(col("_pc").isNull || col("_pc") =!= col("c"))
      .drop("_pc")
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("valid_from_us", col("us"))
      .withColumn("valid_to_us", lead(col("us"), 1).over(w))
      .select(col("user_id"), col("version"), col("event_id"),
        col("valid_from_us"), col("valid_to_us"), col("c"),
        col("valid_to_us").isNull.cast("long").as("is_current"))
  }

  /** The a31/a32 interval frame: (user_id, version, event_id,
    * valid_from_us, valid_to_us, c, is_current), unordered. Factored so
    * the lookup query joins the SAME build the history query gates. */
  private[queries] def scd2Frame(s: SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame =
    scd2FromChanges(
      t(s, dir, "events")
        .filter(col("event_type") === "signup")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("us"),
          (col("value").cast("decimal(18,2)") * 100).cast("long").as("c")))

  val a31Scd2History = OpQuery(
    "a31_scd2_history",
    "SCD2 dimension history: versioned validity intervals from the change feed",
    (s, dir) => scd2Frame(s, dir).orderBy("user_id", "version"),
    Some("""WITH f AS (
              SELECT event_id, user_id, epoch_us(ts) AS us,
                     CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c,
                     lag(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                       OVER (PARTITION BY user_id
                             ORDER BY epoch_us(ts), event_id) AS pc
              FROM events WHERE event_type = 'signup')
            SELECT user_id,
              CAST(row_number() OVER w AS BIGINT) AS version,
              event_id,
              us AS valid_from_us,
              lead(us) OVER w AS valid_to_us,
              c,
              CAST(lead(us) OVER w IS NULL AS BIGINT) AS is_current
            FROM f WHERE pc IS NULL OR pc <> c
            WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
            ORDER BY user_id, version"""))

  /** A33 (beyond ref) — the no-op-change collapse made VISIBLE: an SCD2
    * status history over a change feed that genuinely carries consecutive
    * duplicates (every event of a user, tracked attribute = the event
    * type's code; ~20% of the fixture's consecutive pairs repeat). The
    * a31 signup feed is near-duplicate-free, so this query is the
    * oracle-gated proof that the collapse drops exactly the re-written
    * unchanged values and extends the surviving versions' intervals over
    * them — the behavior a real CDC feed (which re-emits whole rows on
    * any column's update) demands of the dimension build. */
  val a33Scd2Collapse = OpQuery(
    "a33_scd2_collapse",
    "SCD2 no-op collapse: status history from a feed with consecutive duplicates",
    (s, dir) => scd2FromChanges(
      t(s, dir, "events").select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("us"),
        ascii(col("event_type")).cast("long").as("c")))
      .orderBy("user_id", "version"),
    Some("""WITH f AS (
              SELECT event_id, user_id, epoch_us(ts) AS us,
                     CAST(ascii(event_type) AS BIGINT) AS c,
                     lag(CAST(ascii(event_type) AS BIGINT))
                       OVER (PARTITION BY user_id
                             ORDER BY epoch_us(ts), event_id) AS pc
              FROM events)
            SELECT user_id,
              CAST(row_number() OVER w AS BIGINT) AS version,
              event_id,
              us AS valid_from_us,
              lead(us) OVER w AS valid_to_us,
              c,
              CAST(lead(us) OVER w IS NULL AS BIGINT) AS is_current
            FROM f WHERE pc IS NULL OR pc <> c
            WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
            ORDER BY user_id, version"""))

  /** A32 (beyond ref) — POINT-IN-TIME fact enrichment through the SCD2
    * interval table: each purchase joins the dimension version whose
    * validity interval contains the fact's event time. This is the query
    * a31's scaladoc promises ("j6_asof_join is exactly a lookup into this
    * table's intervals") executed and gated: the intervals partition each
    * key's timeline, so at most one version matches and the left join
    * stays 1:1 — facts before any version keep NULLs, like j6's ASOF
    * LEFT. Where two changes share a timestamp, the earlier version's
    * interval is zero-width and matches nothing — the interval semantics
    * resolve the tie j6's "latest prior row" phrasing leaves ambiguous.
    *
    * Scale shape: the dim HISTORY is orders of magnitude smaller than
    * the fact stream, so it broadcasts (the J3 rationale; PlanSpec pins
    * BroadcastHashJoin on the equi key with the interval bounds as the
    * join residual). Past broadcast size the same plan degrades to a
    * user-keyed sort-merge join — the range predicates ride the equi key
    * either way; never a cartesian. */
  /** The a32 join: facts (event_id, user_id, us) × history (user_id,
    * version, valid_from_us, valid_to_us, c) on containment of the fact
    * time in the version's validity interval. Factored so the spec can
    * drive hand corpora (the shared-timestamp tie case). */
  private[queries] def scd2Lookup(facts: org.apache.spark.sql.DataFrame,
      hist: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    facts.join(broadcast(hist),
        facts("user_id") === hist("user_id") &&
          col("us") >= col("valid_from_us") &&
          (col("valid_to_us").isNull || col("us") < col("valid_to_us")),
        "left")
      .select(facts("event_id"), facts("user_id"), col("us"),
        col("version"), col("c"))

  val a32Scd2Lookup = OpQuery(
    "a32_scd2_lookup",
    "point-in-time enrichment: purchases x the SCD2 version valid at event time",
    (s, dir) => {
      val hist = scd2Frame(s, dir)
        .select(col("user_id"), col("version"), col("valid_from_us"),
          col("valid_to_us"), col("c"))
      val facts = t(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("us"))
      scd2Lookup(facts, hist).orderBy("event_id")
    },
    Some("""WITH ch AS (
              SELECT event_id, user_id, epoch_us(ts) AS us,
                     CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c,
                     lag(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                       OVER (PARTITION BY user_id
                             ORDER BY epoch_us(ts), event_id) AS pc
              FROM events WHERE event_type = 'signup'),
            h AS (
              SELECT user_id,
                CAST(row_number() OVER w AS BIGINT) AS version,
                us AS vf,
                lead(us) OVER w AS vt,
                c
              FROM ch WHERE pc IS NULL OR pc <> c
              WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id))
            SELECT f.event_id, f.user_id, epoch_us(f.ts) AS us,
                   h.version, h.c
            FROM events f LEFT JOIN h ON h.user_id = f.user_id
              AND epoch_us(f.ts) >= h.vf
              AND (h.vt IS NULL OR epoch_us(f.ts) < h.vt)
            WHERE f.event_type = 'purchase'
            ORDER BY event_id"""))

  val all: Seq[OpQuery] = Seq(
    a1VisitorWindow, a2ProductStats, a3ProvinceStats, a4KeywordStats,
    a7ServingTopN, a8SessionWindow, a9SlidingWindow, a10Funnel, a11Retention,
    a12SessionPaths, a13ConversionLag, a14GroupingSets, a15Pivot,
    a16RollingWindow, a17Attribution, a18TrendDecay, a19ResampleZerofill,
    a20Debounce, a21TrendTopk, a22RateLimit, a23ResampleFfill, a24Ewma,
    a25EwmaAnomaly, a26EwmaAlpha8, a27PsiDrift, a28Cusum, a29RobustOutliers,
    a30MonitorE2e, a31Scd2History, a32Scd2Lookup, a33Scd2Collapse,
    k5LatestVersion)
}
