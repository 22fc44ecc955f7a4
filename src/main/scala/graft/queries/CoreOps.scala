package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Sources / projections / row-level transforms from SURVEY.md §2.1-2.3, §2.7,
  * re-expressed as verifiable batch queries over the testdata tables.
  * Reference citations are in each query's doc string.
  */
object CoreOps {

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** S7 — JDBC-style batch read + snake_case→camelCase rename
    * (RT/utils/JdbcUtil.java:15-49). Rename = toDF/alias, no reflection. */
  val s7ReadRename = OpQuery(
    "s7_read_rename",
    "batch source read with column rename (JdbcUtil.queryList analog)",
    (s, dir) =>
      t(s, dir, "customer")
        .select(
          col("c_custkey").as("custKey"),
          col("c_name").as("custName"),
          col("c_acctbal").cast("double").as("acctBal"))
        .orderBy("custKey"),
    Some("""SELECT c_custkey AS custKey, c_name AS custName,
            CAST(c_acctbal AS DOUBLE) AS acctBal
            FROM customer ORDER BY custKey"""))

  /** P1/P2 — JSON field extraction from a string payload
    * (RT/app/dwd/BaseLogApp.java:35-48 parse; here get_json_object —
    * codegen'd, no UDF). Malformed rows would yield NULL (the "dirty" route
    * is a second filter over the same parsed column). */
  val p1JsonParse = OpQuery(
    "p1_json_parse",
    "JSON parse of events.props with null-on-corrupt semantics (BaseLogApp dirty split)",
    (s, dir) =>
      t(s, dir, "events")
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("prop_k"))
        .filter(col("prop_k").isNotNull)
        .orderBy("event_id"),
    Some("""SELECT event_id, prop_k
            FROM (SELECT event_id,
                    TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
                  FROM events)
            WHERE prop_k IS NOT NULL
            ORDER BY event_id"""))

  /** P3 — predicate filter dropping one CDC op type
    * (RT/app/dwd/BaseDBApp.java:39-45 keeps type != 'delete';
    * 'error' events stand in for deletes). Filter is pushed to the scan. */
  val p3FilterDeletes = OpQuery(
    "p3_filter_deletes",
    "drop-deletes predicate filter (BaseDBApp type!='delete' analog)",
    (s, dir) =>
      t(s, dir, "events")
        .filter(col("event_type") =!= "error")
        .select(col("event_id"), col("event_type"))
        .orderBy("event_id"),
    Some("""SELECT event_id, event_type FROM events
            WHERE event_type <> 'error' ORDER BY event_id"""))

  /** P4 — data-driven column projection: keep only the columns listed in a
    * config row (RT/app/function/TableProcessFunction.java:77-86
    * filterColumn). The config-driven select IS the operator. */
  val p4ColumnProjection = OpQuery(
    "p4_column_projection",
    "config-driven column pruning (TableProcessFunction.filterColumn analog)",
    (s, dir) => {
      val sinkColumns = Seq("l_orderkey", "l_linenumber", "l_quantity") // from config
      t(s, dir, "lineitem")
        .select(sinkColumns.map(col): _*)
        .orderBy("l_orderkey", "l_linenumber", "l_quantity")
    },
    Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
            ORDER BY l_orderkey, l_linenumber, l_quantity"""))

  /** P5/F9 — generator: split text into words and explode one row per word,
    * keeping the parent key (RT/app/dwd/BaseLogApp.java:101-113 display
    * explode; RT/app/function/SplitFunction.java:13-30 UDTF shape). */
  val p5SplitExplode = OpQuery(
    "p5_split_explode",
    "array explode with parent key (BaseLogApp displays[] / split_words UDTF analog)",
    (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .filter(length(col("word")) > 0)
        .orderBy("doc_id", "word"),
    Some("""SELECT doc_id, word FROM (
              SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
            WHERE length(word) > 0 ORDER BY doc_id, word"""))

  /** P6/F1/F2/F3 — derived event-time fields: date string, hour, epoch-ms
    * (RT/app/dwm/OrderWideApp.java:42-48). */
  val p6DerivedTime = OpQuery(
    "p6_derived_time",
    "derive create_date/create_hour/create_ts from a timestamp (OrderWideApp analog)",
    (s, dir) =>
      t(s, dir, "orders")
        .select(
          col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("create_date"),
          hour(col("o_orderdate")).cast("long").as("create_hour"),
          (unix_timestamp(col("o_orderdate")) * 1000).as("create_ts"))
        .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey,
            strftime(o_orderdate, '%Y-%m-%d') AS create_date,
            CAST(EXTRACT(hour FROM o_orderdate) AS BIGINT) AS create_hour,
            CAST(epoch(o_orderdate) AS BIGINT) * 1000 AS create_ts
            FROM orders ORDER BY o_orderkey"""))

  /** P7 + C2 — normalize heterogeneous streams onto one one-hot measure
    * schema then union (RT/app/dws/VisitorStatsApp.java:46-95: pv/uv/uj
    * streams → VisitorStats rows → union). */
  val p7OnehotUnion = OpQuery(
    "p7_onehot_union",
    "one-hot measure normalization + 3-way unionByName (VisitorStatsApp pre-agg)",
    (s, dir) => {
      val ev = t(s, dir, "events")
      def shaped(typ: String, pv: Int, uv: Int, uj: Int, dur: Boolean) =
        ev.filter(col("event_type") === typ).select(
          col("event_id"), col("user_id"),
          lit(pv.toLong).as("pv_ct"), lit(uv.toLong).as("uv_ct"),
          lit(uj.toLong).as("uj_ct"),
          (if (dur) col("value").cast("double") else lit(0.0)).as("dur_sum"))
      shaped("view", 1, 0, 0, dur = true)
        .unionByName(shaped("signup", 0, 1, 0, dur = false))
        .unionByName(shaped("error", 0, 0, 1, dur = false))
        .orderBy("event_id")
    },
    Some("""SELECT * FROM (
              SELECT event_id, user_id, CAST(1 AS BIGINT) AS pv_ct,
                     CAST(0 AS BIGINT) AS uv_ct, CAST(0 AS BIGINT) AS uj_ct,
                     CAST(value AS DOUBLE) AS dur_sum
              FROM events WHERE event_type = 'view'
              UNION ALL
              SELECT event_id, user_id, 0, 1, 0, 0.0
              FROM events WHERE event_type = 'signup'
              UNION ALL
              SELECT event_id, user_id, 0, 0, 1, 0.0
              FROM events WHERE event_type = 'error')
            ORDER BY event_id"""))

  /** F2/F6/F7 — scalar string/date surface: date_format round-trip, split,
    * lower (RT/utils/DateTimeUtil.java:10-18, OrderWideApp.java:42-45). */
  val fScalarPack = OpQuery(
    "f_scalar_pack",
    "scalar date/string functions (DateTimeUtil + split/substr surface)",
    (s, dir) =>
      t(s, dir, "orders")
        .select(
          col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("ymdhms"),
          split(col("o_orderpriority"), "-").getItem(0).as("prio_code"),
          lower(col("o_orderpriority")).as("prio_lower"),
          substring(col("o_orderstatus"), 1, 1).as("status_c"))
        .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey,
            strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS ymdhms,
            string_split(o_orderpriority, '-')[1] AS prio_code,
            lower(o_orderpriority) AS prio_lower,
            substring(o_orderstatus, 1, 1) AS status_c
            FROM orders ORDER BY o_orderkey"""))

  /** F8 — age-from-date derivation floor(datediff/365)
    * (RT/app/dwm/OrderWideApp.java:103-108; anchor date fixed for
    * determinism instead of current_date). */
  val f8AgeDerive = OpQuery(
    "f8_age_derive",
    "age derivation floor(datediff(anchor,dt)/365) (DimAsyncFunction user_age analog)",
    (s, dir) =>
      t(s, dir, "orders")
        .select(
          col("o_orderkey"),
          floor(datediff(to_date(lit("2002-01-01")), col("o_orderdate")) / 365)
            .cast("long").as("age_years"))
        .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey,
            CAST(floor(date_diff('day', o_orderdate, DATE '2002-01-01') / 365.0) AS BIGINT)
              AS age_years
            FROM orders ORDER BY o_orderkey"""))

  val all: Seq[OpQuery] = Seq(
    s7ReadRename, p1JsonParse, p3FilterDeletes, p4ColumnProjection,
    p5SplitExplode, p6DerivedTime, p7OnehotUnion, fScalarPack, f8AgeDerive)
}
