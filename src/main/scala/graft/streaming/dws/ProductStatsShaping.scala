package graft.streaming.dws

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.streaming.Constants

/** P8/P9 — the seven ProductStats measure builders
  * (RT/app/dws/ProductStatsApp.java:60-192): each source stream is
  * projected onto ONE common one-hot schema keyed by sku_id, then unioned
  * (C2) and windowed (A2, WindowStats.productStats).
  *
  * One-hot shape: exactly one measure group non-zero per row, so the
  * window agg's sums count each event once — the invariant the
  * reference's mutating reducer silently relied on (SURVEY §2.5 note).
  */
object ProductStatsShaping {

  private val zero = lit(0L)
  // 0, not NULL: the reference's ProductStats bean defaults amounts to
  // BigDecimal.ZERO (ProductStatsApp.java:60-192) and its ClickHouse
  // columns are non-nullable — a window with no contributing rows for a
  // measure must sum to 0.00, not NULL
  private val zeroAmt = lit(0).cast("decimal(18,2)")
  private val noId = lit(null).cast("long")

  /** All measure columns with their neutral values. */
  private val defaults: Seq[(String, Column)] = Seq(
    "click_ct" -> zero, "display_ct" -> zero, "favor_ct" -> zero,
    "cart_ct" -> zero,
    "order_amount" -> zeroAmt, "order_id" -> noId,
    "payment_amount" -> zeroAmt, "paid_order_id" -> noId,
    "refund_amount" -> zeroAmt, "refund_order_id" -> noId,
    "comment_ct" -> zero, "good_comment_ct" -> zero)

  private def shaped(src: DataFrame, skuId: Column, ts: Column,
      overrides: (String, Column)*): DataFrame = {
    val o = overrides.toMap
    src.select(
      (skuId.cast("long").as("sku_id") +: ts.as("ts") +:
        defaults.map { case (n, d) => o.getOrElse(n, d).as(n) }): _*)
  }

  /** P8 — page-log clicks: good_detail page with a sku item
    * (ProductStatsApp.java:64-77). */
  def fromPageClicks(pageLog: DataFrame): DataFrame =
    shaped(
      pageLog.filter(col("page.page_id") === "good_detail" &&
        col("page.item_type") === "sku_id"),
      col("page.item"), col("ts"),
      "click_ct" -> lit(1L))

  /** P8 — exploded display rows with sku items
    * (ProductStatsApp.java:78-95). */
  def fromDisplays(pageLog: DataFrame): DataFrame =
    shaped(
      pageLog.filter(size(col("displays")) > 0)
        .select(col("ts"), explode(col("displays")).as("d"))
        .filter(col("d.item_type") === "sku_id"),
      col("d.item"), col("ts"),
      "display_ct" -> lit(1L))

  /** P9 — favor_info rows (ProductStatsApp.java:98-107). */
  def fromFavor(favor: DataFrame): DataFrame =
    shaped(favor, col("sku_id"), col("ts"), "favor_ct" -> lit(1L))

  /** P9 — cart_info rows (ProductStatsApp.java:110-119). */
  def fromCart(cart: DataFrame): DataFrame =
    shaped(cart, col("sku_id"), col("ts"), "cart_ct" -> lit(1L))

  /** P9 — order_wide rows seed amount + distinct order id
    * (ProductStatsApp.java:122-133). */
  def fromOrders(orderWide: DataFrame): DataFrame =
    shaped(orderWide, col("sku_id"), col("ts"),
      "order_amount" -> col("split_total_amount").cast("decimal(18,2)"),
      "order_id" -> col("order_id").cast("long"))

  /** P9 — payment_wide rows (ProductStatsApp.java:136-147). */
  def fromPayments(paymentWide: DataFrame): DataFrame =
    shaped(paymentWide, col("sku_id"), col("ts"),
      "payment_amount" -> col("split_total_amount").cast("decimal(18,2)"),
      "paid_order_id" -> col("order_id").cast("long"))

  /** P9 — refund rows (ProductStatsApp.java:150-161). */
  def fromRefunds(refund: DataFrame): DataFrame =
    shaped(refund, col("sku_id"), col("ts"),
      "refund_amount" -> col("refund_amount").cast("decimal(18,2)"),
      "refund_order_id" -> col("order_id").cast("long"))

  /** P9 — comment rows; good iff appraise = 1201
    * (ProductStatsApp.java:164-181, GmallConstant.APPRAISE_GOOD). */
  def fromComments(comment: DataFrame): DataFrame =
    shaped(comment, col("sku_id"), col("ts"),
      "comment_ct" -> lit(1L),
      "good_comment_ct" ->
        when(col("appraise") === Constants.AppraiseGood, 1L).otherwise(0L))

  /** C2 — the 7-way union (ProductStatsApp.java:185-192). */
  def unionAll(streams: Seq[DataFrame]): DataFrame =
    streams.reduce(_.unionByName(_))
}
