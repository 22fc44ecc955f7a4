package graft.streaming

import org.apache.spark.sql.types._

/** Wire-format schemas for the reference's JSON streams (FIXTURES.md §A).
  *
  * Citations: page log shape per RT/app/dwd/dwd_page_log.txt and
  * RT/app/dwm/UniqueVisitApp.java:21-23; CDC envelope per
  * RT/utils/CustomerDeserialization.java:17-26; config row per
  * RT/bean/TableProcess.java:6-19.
  */
object Schemas {

  /** common{} block of every log record. */
  val common: StructType = StructType(Seq(
    "ar", "ba", "ch", "is_new", "md", "mid", "os", "uid", "vc")
    .map(StructField(_, StringType)))

  /** page{} block. */
  val page: StructType = StructType(Seq(
    StructField("page_id", StringType),
    StructField("last_page_id", StringType),
    StructField("item", StringType),
    StructField("item_type", StringType),
    StructField("source_type", StringType),
    StructField("during_time", LongType)))

  /** start{} block (presence ⇒ start-log split, BaseLogApp.java:93-95). */
  val start: StructType = StructType(Seq(
    StructField("entry", StringType),
    StructField("open_ad_skip_ms", LongType),
    StructField("open_ad_ms", LongType),
    StructField("loading_time", LongType),
    StructField("open_ad_id", LongType)))

  val display: StructType = StructType(Seq(
    StructField("display_type", StringType),
    StructField("item", StringType),
    StructField("item_type", StringType),
    StructField("pos_id", LongType),
    StructField("order", LongType)))

  val action: StructType = StructType(Seq(
    StructField("item", StringType),
    StructField("action_id", StringType),
    StructField("item_type", StringType),
    StructField("ts", LongType)))

  /** Full page-log envelope (topic ods_base_log). */
  val pageLog: StructType = StructType(Seq(
    StructField("common", common),
    StructField("page", page),
    StructField("start", start),
    StructField("displays", ArrayType(display)),
    StructField("actions", ArrayType(action)),
    StructField("ts", LongType)))

  /** CDC envelope (topic ods_base_db) — the input contract replacing the
    * reference's MySQL binlog source (CustomerDeserialization output):
    * before/after as string maps, type ∈ {insert, update, delete}. */
  val cdcEnvelope: StructType = StructType(Seq(
    StructField("database", StringType),
    StructField("tableName", StringType),
    StructField("before", MapType(StringType, StringType)),
    StructField("after", MapType(StringType, StringType)),
    StructField("type", StringType)))

  /** Routed fact value on the dwd_* topics: the projected `after` object
    * serialized by the db router — a flat string→string JSON object
    * (BaseDBApp.java:107-113; typed casts happen at each consumer's edge,
    * mirroring the reference's JSONObject.parseObject→bean step). */
  val cdcValue: MapType = MapType(StringType, StringType)

  /** Routing config row (table_process). */
  val tableProcess: StructType = StructType(Seq(
    StructField("sourceTable", StringType),
    StructField("operateType", StringType),
    StructField("sinkType", StringType),
    StructField("sinkTable", StringType),
    StructField("sinkColumns", StringType),
    StructField("sinkPk", StringType),
    StructField("sinkExtend", StringType)))
}

/** Typed beans mirroring the RT/bean classes (only the fields the pipeline consumes). */
object Beans {
  /** RT/bean/OrderInfo.java:8-24 (create_ts derived per OrderWideApp.java:42-48). */
  case class OrderInfo(
      id: Long, province_id: Long, user_id: Long, order_status: String,
      total_amount: BigDecimal, create_time: String,
      create_date: String, create_hour: String, create_ts: Long)

  /** RT/bean/OrderDetail.java:8-20. */
  case class OrderDetail(
      id: Long, order_id: Long, sku_id: Long, sku_num: Long,
      sku_name: String, order_price: BigDecimal,
      split_total_amount: BigDecimal, create_time: String, create_ts: Long)

  /** RT/bean/PaymentInfo.java:8-17. */
  case class PaymentInfo(
      id: Long, order_id: Long, user_id: Long, total_amount: BigDecimal,
      subject: String, payment_type: String, create_time: String,
      create_ts: Long)

  /** RT/bean/VisitorStats.java:8-33 — one-hot measure row pre-aggregation. */
  case class VisitorStats(
      stt: String, edt: String, vc: String, ch: String, ar: String,
      is_new: String, uv_ct: Long, pv_ct: Long, sv_ct: Long, uj_ct: Long,
      dur_sum: Long, ts: Long)
}
