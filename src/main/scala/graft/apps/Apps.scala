package graft.apps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.streaming.dwd.{BaseLog, DbRouting}
import graft.streaming.dwm.{Bounce, OrderWide, PaymentWide, UniqueVisit}
import graft.streaming.dws.{ProductStatsShaping, WindowStats}

/** 1:1 app compositions mirroring the reference's eleven programs — each
  * reference main() becomes one function from input frame(s) to output
  * frame(s). Sources and sinks stay at the caller's edge (Kafka in
  * production, MemoryStream/files in tests), exactly like the reference's
  * apps are glued by topics.
  *
  * A user of the reference maps their deployment one-to-one:
  * BaseLogApp → baseLog, BaseDBApp → baseDb, UniqueVisitApp →
  * uniqueVisit, UserJumpDetailApp → userJumpDetail, OrderWideApp →
  * orderWide, PaymentWideApp → paymentWide, VisitorStatsApp →
  * visitorStats, ProductStatsApp → productStats, ProvinceStatsSqlApp →
  * provinceStats, KeywordStatsApp → keywordStats, publisher →
  * graft.ads.Serving.
  */
object Apps {

  /** BaseLogApp (RT/app/dwd/BaseLogApp.java): raw log lines →
    * (page, start, display, dirty) streams with is_new repaired. */
  case class BaseLogOut(page: DataFrame, start: DataFrame,
      display: DataFrame, dirty: DataFrame)

  def baseLog(rawLines: DataFrame): BaseLogOut = {
    val parsed = BaseLog.parse(rawLines)
    val repaired = BaseLog.repairIsNew(BaseLog.clean(parsed))
    BaseLogOut(
      page = BaseLog.pageLog(repaired),
      start = BaseLog.startLog(repaired),
      display = BaseLog.displayLog(repaired),
      dirty = BaseLog.dirty(parsed))
  }

  /** BaseDBApp (RT/app/dwd/BaseDBApp.java): CDC lines + config table →
    * kafka-routed facts and hbase-routed dims (projected + tagged). */
  case class BaseDbOut(kafka: DataFrame, hbase: DataFrame)

  def baseDb(rawCdc: DataFrame, config: DataFrame): BaseDbOut = {
    val routed = DbRouting.route(
      DbRouting.dropDeletes(DbRouting.parseCdc(rawCdc)), config)
    BaseDbOut(DbRouting.kafkaRoute(routed), DbRouting.hbaseRoute(routed))
  }

  /** UniqueVisitApp: page stream → first visit per mid per day. */
  def uniqueVisit(page: DataFrame, ttlMs: Long = UniqueVisit.StateTtlMs): DataFrame =
    UniqueVisit.dedup(page, ttlMs)

  /** UserJumpDetailApp: page stream → bounce records (match + timeout). */
  def userJumpDetail(page: DataFrame,
      watermarkDelay: String = "2 seconds"): DataFrame =
    Bounce.detect(page, watermarkDelay)

  /** OrderWideApp: order_info ⋈ order_detail (±5s) + dim enrichment.
    * `dims` = (prefix, dimDf, factKey, dimKey) per lookup, e.g. the six
    * user/province/sku/spu/tm/category3 dims. */
  def orderWide(orderInfo: DataFrame, orderDetail: DataFrame,
      dims: Seq[(String, DataFrame, String, String)]): DataFrame =
    OrderWide.enrich(
      OrderWide.intervalJoin(
        OrderWide.prefixed(orderInfo, "o_"),
        OrderWide.prefixed(orderDetail, "d_")),
      dims)

  /** PaymentWideApp: payment ⋈ order_wide (−15min/+5s). */
  def paymentWide(payment: DataFrame, orderWideDf: DataFrame): DataFrame =
    PaymentWide.mergedView(
      PaymentWide.intervalJoin(
        OrderWide.prefixed(payment, "p_"),
        OrderWide.prefixed(orderWideDf, "ow_")))

  /** VisitorStatsApp: pre-shaped one-hot pv/uv/uj rows → 10s windows. */
  def visitorStats(oneHot: DataFrame): DataFrame =
    WindowStats.visitorStats(oneHot)

  /** ProductStatsApp: the 7 source streams → one-hot union → 10s windows
    * with exact distinct order counts. */
  def productStats(pageLog: DataFrame, favor: DataFrame, cart: DataFrame,
      orderWide: DataFrame, paymentWide: DataFrame, refund: DataFrame,
      comment: DataFrame): DataFrame =
    WindowStats.productStats(ProductStatsShaping.unionAll(Seq(
      ProductStatsShaping.fromPageClicks(pageLog),
      ProductStatsShaping.fromDisplays(pageLog),
      ProductStatsShaping.fromFavor(favor),
      ProductStatsShaping.fromCart(cart),
      ProductStatsShaping.fromOrders(orderWide),
      ProductStatsShaping.fromPayments(paymentWide),
      ProductStatsShaping.fromRefunds(refund),
      ProductStatsShaping.fromComments(comment))))

  /** ProvinceStatsSqlApp: order_wide stream → per-province 10s windows. */
  def provinceStats(orderWideDf: DataFrame): DataFrame =
    WindowStats.provinceStats(orderWideDf)

  /** KeywordStatsApp: page stream → tokenized search keywords per window. */
  def keywordStats(page: DataFrame)(implicit spark: SparkSession): DataFrame =
    WindowStats.keywordStats(page)
}
