package graft.streaming.dws

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Tokenize

/** DWS layer — the four summary apps (RT/app/dws) as streaming
  * window-agg transforms. All use 10s tumbling event-time windows with
  * per-app watermark delays, stamping stt/edt strings like the ClickHouse
  * schemas expect.
  */
object WindowStats {

  private val fmt = "yyyy-MM-dd HH:mm:ss"

  /** Exact distinct order-id count with bounded state: a per-group set
    * capped at 1M elements (graft.functions.BoundedDistinctAgg) instead of
    * an unbounded collect_set. Within a 10s window a key's distinct
    * cardinality is business-bounded; if that ever breaks the aggregate
    * fails loudly instead of OOMing an executor. Count of distinct is
    * preserved by the injective cast to string. */
  private val distinctCap = 1 << 20
  private def exactDistinct(c: org.apache.spark.sql.Column) =
    graft.functions.TopK.boundedDistinct(distinctCap)(c.cast("string"))

  /** Tag ONE input leg with its event-time watermark BEFORE a multi-source
    * union. Required for append-mode correctness: a single watermark node
    * placed AFTER a union tracks max(event time) over ALL rows seen so far,
    * so a slow leg's rows (e.g. a dwm topic that commits one batch behind
    * its upstream) arrive behind the watermark and are silently dropped as
    * late. One watermark node per leg + Spark's default min policy
    * (spark.sql.streaming.multipleWatermarkPolicy=min) makes the global
    * watermark wait for the slowest leg — Flink's per-source watermark
    * semantics, which is what the reference's multi-stream unions assume.
    * Batch compositions skip this (watermark is a no-op there). */
  def leg(df: DataFrame, delay: String): DataFrame =
    df.withColumn("rt", timestamp_millis(col("ts")))
      .withWatermark("rt", delay)

  /** Idempotent: a caller that pre-watermarked its legs (see [[leg]])
    * already carries `rt`; single-source callers and batch twins get the
    * watermark added here. */
  private def windowed(df: DataFrame, delay: String): DataFrame =
    if (df.columns.contains("rt")) df else leg(df, delay)

  /** A1 — VisitorStats (RT/app/dws/VisitorStatsApp.java:95-149): union of
    * one-hot pv/uv/uj measure rows (P7) pre-shaped by the caller, keyed by
    * (vc, ch, ar, is_new), 10s window, TRUE sums of every measure —
    * deliberately fixing the reference's reducer bug (SURVEY §2.5 note:
    * its reducer only summed dur_sum). Watermark 11s
    * (VisitorStatsApp.java:100-101). */
  def visitorStats(oneHot: DataFrame): DataFrame =
    windowed(oneHot, "11 seconds")
      .groupBy(window(col("rt"), "10 seconds").as("w"),
        col("vc"), col("ch"), col("ar"), col("is_new"))
      .agg(
        sum("uv_ct").as("uv_ct"), sum("pv_ct").as("pv_ct"),
        sum("sv_ct").as("sv_ct"), sum("uj_ct").as("uj_ct"),
        sum("dur_sum").as("dur_sum"))
      .select(
        date_format(col("w.start"), fmt).as("stt"),
        date_format(col("w.end"), fmt).as("edt"),
        col("vc"), col("ch"), col("ar"), col("is_new"),
        col("uv_ct"), col("pv_ct"), col("sv_ct"), col("uj_ct"), col("dur_sum"))

  /** A2 — ProductStats (RT/app/dws/ProductStatsApp.java:185-242): 7-way
    * unioned one-hot rows keyed by sku_id; sums + EXACT distinct order-id
    * counts (the reference's per-window order-id Sets; streaming agg can't
    * use count(distinct) — exactDistinct above is the bounded-state
    * equivalent). Watermark 2s (ProductStatsApp.java:195). */
  def productStats(oneHot: DataFrame): DataFrame =
    windowed(oneHot, "2 seconds")
      .groupBy(window(col("rt"), "10 seconds").as("w"), col("sku_id"))
      .agg(
        sum("click_ct").as("click_ct"),
        sum("display_ct").as("display_ct"),
        sum("favor_ct").as("favor_ct"),
        sum("cart_ct").as("cart_ct"),
        sum("order_amount").as("order_amount"),
        exactDistinct(col("order_id")).as("order_ct"),
        sum("payment_amount").as("payment_amount"),
        exactDistinct(col("paid_order_id")).as("paid_order_ct"),
        sum("refund_amount").as("refund_amount"),
        exactDistinct(col("refund_order_id")).as("refund_order_ct"),
        sum("comment_ct").as("comment_ct"),
        sum("good_comment_ct").as("good_comment_ct"))
      .select(
        date_format(col("w.start"), fmt).as("stt") +:
        date_format(col("w.end"), fmt).as("edt") +:
        col("sku_id") +: Seq("click_ct", "display_ct", "favor_ct", "cart_ct",
          "order_amount", "order_ct", "payment_amount", "paid_order_ct",
          "refund_amount", "refund_order_ct", "comment_ct",
          "good_comment_ct").map(col): _*)

  /** A3 — ProvinceStats (RT/app/dws/ProvinceStatsSqlApp.java:53-72): from
    * the order-wide stream, 10s window × province dims, distinct order
    * count + split amount sum. Watermark 1s (DDL
    * ProvinceStatsSqlApp.java:48). */
  def provinceStats(orderWide: DataFrame): DataFrame =
    windowed(orderWide, "1 second")
      .groupBy(window(col("rt"), "10 seconds").as("w"),
        col("province_id"), col("province_name"), col("province_area_code"),
        col("province_iso_code"))
      .agg(
        exactDistinct(col("order_id")).as("order_count"),
        sum(col("split_total_amount")).as("order_amount"))
      .select(
        date_format(col("w.start"), fmt).as("stt"),
        date_format(col("w.end"), fmt).as("edt"),
        col("province_id"), col("province_name"), col("province_area_code"),
        col("province_iso_code"), col("order_count"), col("order_amount"))

  /** A4/F9 — KeywordStats (RT/app/dws/KeywordStatsApp.java:45-75): filter
    * search pages, tokenize the search item (split_words UDTF → explode),
    * 10s window per-word count with literal source tag. */
  def keywordStats(pageLog: DataFrame)(implicit spark: SparkSession): DataFrame = {
    Tokenize.register(spark)
    windowed(
      pageLog
        .filter(col("page.last_page_id") === "search" &&
          col("page.item").isNotNull)
        .select(col("ts"), col("page.item").as("full_word")),
      "2 seconds")
      .select(col("rt"), explode(call_udf("split_words", col("full_word"))).as("word"))
      .groupBy(window(col("rt"), "10 seconds").as("w"), col("word"))
      .agg(count(lit(1)).as("ct"))
      .select(
        date_format(col("w.start"), fmt).as("stt"),
        date_format(col("w.end"), fmt).as("edt"),
        col("word"), lit("search").as("source"), col("ct"))
  }
}
