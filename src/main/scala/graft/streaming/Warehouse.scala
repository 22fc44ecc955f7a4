package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import graft.apps.Apps
import graft.io.KafkaTopology
import graft.streaming.dwd.{BaseLog, DbRouting}
import graft.streaming.dwm.{Bounce, OrderWide, PaymentWide, UniqueVisit}
import graft.streaming.dws.{ProductStatsShaping, WindowStats}

/** The reference deployment SHAPE, executed: all warehouse layers as
  * CONCURRENT checkpointed StreamingQueries chained through the
  * [[KafkaTopology.Topics]] topic graph, with file directories standing in
  * for brokers (one dir per topic, parquet files of a single `value`
  * string column — the wire is still "JSON strings on a named topic",
  * exactly what each layer's decode edge expects).
  *
  * The reference's defining property is ELEVEN SIMULTANEOUS JVMs glued by
  * Kafka (RT/app/dwd/BaseLogApp.java:19-20 chain comments; topic graph
  * RT/utils/MyKafkaUtil.java:40-53): ods_base_log → BaseLogApp →
  * dwd_page_log → {UniqueVisitApp, UserJumpDetailApp, VisitorStatsApp,
  * KeywordStatsApp}; ods_base_db → BaseDBApp → dwd_order_info/_detail →
  * OrderWideApp → dwm_order_wide → {PaymentWideApp, ProvinceStatsSqlApp,
  * ProductStatsApp}. Every layer here is individually oracle-green as an
  * st_* twin; THIS module proves they compose under shared resources —
  * one JVM, ten live queries, checkpoints interleaving, upstream batches
  * feeding downstream file sources while both run.
  *
  * Input is derived deterministically from the driver fixtures so the
  * chain's terminal output is externally gated: each `events` row becomes
  * one ods_base_log page-log line with ch = event_type and during_time =
  * the event's value in CENTS (exact integer transport; the gate divides
  * back to DECIMAL), so the live chain's VisitorStats output must
  * hash-match a1_visitor_window's DuckDB oracle verbatim. The db side
  * feeds a deterministic orders subset through CDC envelopes; its outputs
  * are gated by stream≡batch equivalence (same shaping code, engine mode
  * the only variable — the batch composition being what the a2/a3 oracle
  * family already proves externally).
  *
  * Determinism precondition (same contract as a20/a22's (ts, id)
  * ordering): per-mid event times are unique — Bounce sorts each key's
  * rows by ts alone, so a same-(mid, ts) pair could fold in either order.
  * The driver fixtures satisfy this at sf0.01 AND sf0.1 (checked: zero
  * duplicate (user_id, ts) pairs); the generator would need a tiebreak
  * field before feeding a corpus that does not.
  */
object Warehouse {

  import KafkaTopology.Topics._

  /** st_warehouse_e2e instrumentation (VERDICT r15 #1: a 2.1× same-tree,
    * cross-environment spread on the suite's most expensive query that
    * nobody had root-caused). Collects per-phase walls (input gen, query
    * start, every drain barrier), per-query micro-batch counts +
    * trigger-execution sums from the progress history, and an env
    * fingerprint (cores, GC wall, JVM uptime), then appends ONE JSON line
    * to profiles/wh_profile.jsonl — a COMMITTED path, so builder-side and
    * driver-side runs of the same tree leave directly comparable
    * evidence. Pure observation: no change to the query plan or the
    * drain sequence (the bench fingerprint must not churn). */
  final class WhProf {
    private val born = System.nanoTime()
    private val gc0 = WhProf.gcMs
    val phases = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    def time[T](name: String)(body: => T): T = {
      val s = System.nanoTime()
      try body
      finally phases += name -> ((System.nanoTime() - s) / 1000000L)
    }
    /** Call after the drain, while the queries still hold their progress
      * histories; `note` tags the run context (sf dir). */
    def finish(qs: Map[String, StreamingQuery], note: String): Unit = {
      val perQ = qs.toSeq.sortBy(_._1).map { case (name, q) =>
        val ps = q.recentProgress
        val lastBatch = ps.lastOption.map(_.batchId).getOrElse(-1L)
        val trigMs = ps.map(p =>
          Option(p.durationMs.get("triggerExecution"))
            .map(_.longValue).getOrElse(0L)).sum
        val inRows = ps.map(_.numInputRows).sum
        s""""$name":{"batches":${lastBatch + 1},"progress_n":${ps.length},""" +
          s""""trigger_ms":$trigMs,"input_rows":$inRows}"""
      }.mkString(",")
      val ph = phases.map { case (n, ms) => s""""$n":$ms""" }.mkString(",")
      val rt = java.lang.management.ManagementFactory.getRuntimeMXBean
      val (fsP50, fsMax) = WhProf.fsyncProbe()
      val line =
        s"""{"ts_ms":${System.currentTimeMillis()},"note":"$note",""" +
          s""""cores":${Runtime.getRuntime.availableProcessors},""" +
          s""""jvm_uptime_ms":${rt.getUptime},""" +
          s""""gc_ms":${WhProf.gcMs - gc0},""" +
          f""""fsync_p50_ms":$fsP50%.2f,"fsync_max_ms":$fsMax%.2f,""" +
          s""""total_ms":${(System.nanoTime() - born) / 1000000L},""" +
          s""""phases":{$ph},"queries":{$perQ}}"""
      try {
        val dir = java.nio.file.Paths.get("profiles")
        java.nio.file.Files.createDirectories(dir)
        java.nio.file.Files.writeString(dir.resolve("wh_profile.jsonl"),
          line + "\n", java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.APPEND)
      } catch { case _: java.io.IOException => () } // never fail the query
      System.err.println(s"[wh_profile] $line")
    }
  }
  object WhProf {
    private def gcMs: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(b => math.max(0L, b.getCollectionTime)).sum
    }
    /** Small-file fsync latency (p50, max over 32 samples) on the same
      * filesystem the chain's checkpoints live on (java.io.tmpdir). The
      * warehouse commits ~45 micro-batches × 10 queries, each a handful
      * of offset/commit-log fsyncs — an environment with slow DURABILITY
      * (not slow throughput: the bench's MB/s io probe misses it) taxes
      * exactly this query and nothing else in the suite. */
    private[Warehouse] def fsyncProbe(): (Double, Double) = try {
      val dir = java.nio.file.Paths
        .get(System.getProperty("java.io.tmpdir"), "graft_fsync_probe")
      java.nio.file.Files.createDirectories(dir)
      val samples = (0 until 32).map { i =>
        val f = dir.resolve(s"s$i")
        val t0 = System.nanoTime()
        val ch = java.nio.channels.FileChannel.open(f,
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.WRITE)
        try {
          ch.write(java.nio.ByteBuffer.wrap(Array.fill(64)(i.toByte)))
          ch.force(true)
        } finally ch.close()
        java.nio.file.Files.deleteIfExists(f)
        (System.nanoTime() - t0) / 1e6
      }.sorted
      (samples(samples.length / 2), samples.last)
    } catch { case _: java.io.IOException => (-1.0, -1.0) }
  }

  /** File-topic + checkpoint layout for one chain run. */
  final case class Layout(root: String) {
    def topic(name: String): String = s"$root/topics/$name"
    /** db-router output partition dir for one dynamic sink table. */
    def dbTopic(name: String): String = s"$root/topics/db/sinkTable=$name"
    def dbRoot: String = s"$root/topics/db"
    def ck(name: String): String = s"$root/ck/$name"
    def dimProvince: String = s"$root/dim/dim_base_province"
    /** Durable DWS table dir (the ClickHouse-table analog, K5 shape). */
    def dws(name: String): String = s"$root/dws/$name"
  }

  /** DWS group keys per summary app — the ReplacingMergeTree ORDER BY
    * of the reference's ClickHouse DDL (RT/app/dws/ProductStatsApp
    * .java:310-340): [[dwsTable]] keeps the highest-version row per key. */
  private val DwsKeys: Map[String, Seq[String]] = Map(
    "visitor" -> Seq("stt", "edt", "vc", "ch", "ar", "is_new"),
    "province" -> Seq("stt", "edt", "province_id", "province_name",
      "province_area_code", "province_iso_code"),
    "keyword" -> Seq("stt", "edt", "word"),
    "product" -> Seq("stt", "edt", "sku_id"))

  /** Reader view of a durable DWS dir: latest `_ver` per group key —
    * exactly the reference's ReplacingMergeTree read contract
    * ([[graft.ads.Serving.dedupView]], K5). Rows persist across chain
    * restarts with NO post-restart batch required (VERDICT r13 #5: the
    * complete-mode memory sinks this replaced forgot their rows on stop
    * and needed a new batch to repopulate). */
  def dwsTable(spark: SparkSession, lay: Layout, name: String): DataFrame =
    graft.ads.Serving.dedupView(
      spark.read.parquet(lay.dws(name)), DwsKeys(name), "_ver")
      .drop("_ver")

  val SentinelMid = "__sentinel"

  // ------------------------------------------------------------------
  // input generation: driver fixtures → ODS wire lines (batch writes)
  // ------------------------------------------------------------------

  /** events → ods_base_log page-log JSON. Deterministic per-event shape:
    *   - ch = event_type (the a1 gate key), mid = "u<user_id>", is_new=0;
    *   - branch on event_id % 3: entry page (UV/bounce fuel) / search
    *     page with an item (keyword fuel) / good_detail sku click
    *     (product-stats fuel) — every branch is still one pv row;
    *   - during_time = value as DECIMAL(18,2) cents (exact transport);
    *   - ba carries the event_id (an opaque client field on the wire)
    *     so chain outputs stay joinable in diagnostics.
    */
  def genBaseLog(spark: SparkSession, sfDir: String, lay: Layout,
      chunks: Int = 1): Unit = {
    val e = graft.core.Tables.load(spark, sfDir, "events")
    val b = pmod(col("event_id"), lit(3))
    val nullS = lit(null).cast("string")
    val line = to_json(struct(
      struct(
        lit("1").as("ar"), col("event_id").cast("string").as("ba"),
        col("event_type").as("ch"), lit("0").as("is_new"), lit("md").as("md"),
        concat(lit("u"), col("user_id")).as("mid"), lit("os").as("os"),
        col("user_id").cast("string").as("uid"), lit("v1").as("vc")).as("common"),
      struct(
        when(b === 2, lit("good_detail")).when(b === 1, lit("good_list"))
          .otherwise(lit("home")).as("page_id"),
        when(b === 1, lit("search")).otherwise(nullS).as("last_page_id"),
        when(b === 1, concat(lit("kw"), pmod(col("event_id"), lit(7))))
          .when(b === 2, (pmod(col("event_id"), lit(20)) + 1).cast("string"))
          .otherwise(nullS).as("item"),
        when(b === 2, lit("sku_id")).otherwise(nullS).as("item_type"),
        nullS.as("source_type"),
        (col("value").cast("decimal(18,2)") * 100).cast("long")
          .as("during_time")).as("page"),
      unix_millis(col("ts")).as("ts")))
    val lines = e.select(line.as("value"), unix_millis(col("ts")).as("_t"))
    if (chunks <= 1)
      lines.select("value").write.mode("append")
        .parquet(topicDir(lay, OdsBaseLog))
    else {
      // time-sliced chunks with staggered mtimes: the file source replays
      // them as ordered micro-batches (maxFilesPerTrigger=1), preserving
      // the per-mid event-time arrival order the keyed folds assume —
      // hash-chunking would scatter a mid's events across batches out of
      // order and the bounce/UV state machines would legitimately diverge
      // from their batch twins
      val mm = lines.agg(min(col("_t")), max(col("_t"))).collect()(0)
      val (lo, hi) = (mm.getLong(0), mm.getLong(1))
      val span = math.max(hi - lo + 1L, 1L)
      val bucketed = lines.withColumn("_b",
        ((col("_t") - lo) * chunks / span).cast("int")).persist()
      bucketed.count()
      val t0 = System.currentTimeMillis() - 3600000L
      new java.io.File(topicDir(lay, OdsBaseLog)).mkdirs()
      try (0 until chunks).foreach { i =>
        // single flat files in the topic dir (the source does not walk
        // non-partition subdirs): write-to-stage, move the part file in
        val stage = s"${lay.root}/_stage/chunk$i"
        bucketed.filter(col("_b") === i).select("value")
          .coalesce(1).write.parquet(stage)
        val part = new java.io.File(stage).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        val dst = java.nio.file.Paths.get(
          topicDir(lay, OdsBaseLog), f"chunk$i%04d.parquet")
        java.nio.file.Files.move(part.toPath, dst)
        dst.toFile.setLastModified(t0 + i * 1000L)
      } finally bucketed.unpersist()
    }
  }

  /** Event-time horizon every sentinel anchors past: one hour beyond the
    * LAST event of the log timeline. The db timeline (orders, 1995-2001)
    * lies years before it, so one anchor clears both — and with per-leg
    * watermarks + min policy, EVERY leg must see a row past this anchor
    * before any window at the log timeline's tail can close. */
  def sentinelTs(spark: SparkSession, sfDir: String): Long =
    graft.core.Tables.load(spark, sfDir, "events")
      .agg(max(unix_millis(col("ts")))).collect()(0).getLong(0) + 3600000L

  /** The watermark drivers for every LOG-derived leg: three page lines for
    * [[SentinelMid]] an hour past the corpus horizon, written AFTER the
    * real data has flowed through the DWM layers — the operational analog
    * of the reference's forever-running clock (in production the next
    * day's traffic plays this role). Append mode closes a window only when
    * the leg-min watermark passes its end, so each line is shaped to
    * SURVIVE one shaped leg's filters and advance its watermark node:
    *   - entry `home` line → pv leg; kept by UniqueVisit (first entry of
    *     its day) → uv leg; left as a >10s-gap pending in Bounce, so the
    *     NEXT line's arrival emits it as a bounce → uj leg;
    *   - `search` line 60s later (the gap that bounces the home line) with
    *     a sentinel item → the keyword leg's search filter;
    *   - `good_detail` line with a sku item AND one displays[] element →
    *     the product clicks leg and the otherwise-EMPTY displays leg
    *     (an empty leg pins its watermark at zero and the min policy would
    *     hold every product window open forever).
    * All three lines share one far-future hour, so their own windows stay
    * OPEN (never emitted — sentinel rows never reach the DWS tables) while
    * every real window closes. Per-mid ts stay unique (Bounce contract). */
  def genSentinel(spark: SparkSession, sfDir: String, lay: Layout,
      horizon: Long = -1L): Unit = {
    import spark.implicits._
    val t0 = if (horizon >= 0L) horizon else sentinelTs(spark, sfDir)
    def common =
      s""""common":{"ar":"1","ba":"-1","ch":"$SentinelMid","is_new":"0","md":"md","mid":"$SentinelMid","os":"os","uid":"-1","vc":"v1"}"""
    val lines = Seq(
      s"""{$common,"page":{"page_id":"home","during_time":0},"ts":$t0}""",
      s"""{$common,"page":{"page_id":"good_list","last_page_id":"search","item":"$SentinelMid","during_time":0},"ts":${t0 + 60000L}}""",
      s"""{$common,"page":{"page_id":"good_detail","last_page_id":"good_list","item":"-1","item_type":"sku_id","during_time":0},"displays":[{"display_type":"query","item":"-1","item_type":"sku_id","pos_id":0,"order":0}],"ts":${t0 + 120000L}}""")
    lines.toDF("value").coalesce(1)
      .write.mode("append").parquet(topicDir(lay, OdsBaseLog))
  }

  /** The watermark drivers for every CDC-derived leg: one far-future CDC
    * envelope per routed fact table, all keyed to the sentinel order id /
    * sku -1 / province -1. The order_info + order_detail pair shares a
    * create_time so the ±5s interval join emits one sentinel row to the
    * order-wide topic (→ province leg + product orders leg); the payment
    * lands 60s later, inside the −15min/+5s bound, so the payment join
    * emits to the payment-wide topic (→ product payments leg); favor /
    * cart / comment / refund cover their four sku legs. Without these,
    * the db legs' watermarks stall at the ORDERS timeline (2001) and the
    * min policy would hold every 2024 log-side product window open. */
  def genDbSentinel(spark: SparkSession, sfDir: String, lay: Layout,
      horizon: Long = -1L): Unit = {
    import spark.implicits._
    val t0 = if (horizon >= 0L) horizon else sentinelTs(spark, sfDir)
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss").withZone(java.time.ZoneOffset.UTC)
    val ct = fmt.format(java.time.Instant.ofEpochMilli(t0))
    val pct = fmt.format(java.time.Instant.ofEpochMilli(t0 + 60000L))
    val id = "900000001"
    def env(table: String, kv: (String, String)*): String = {
      val after = kv.map { case (k, v) => s""""$k":"$v"""" }.mkString(",")
      s"""{"database":"gmall","tableName":"$table","before":{},"after":{$after},"type":"insert"}"""
    }
    Seq(
      env("order_info", "id" -> id, "province_id" -> "-1", "user_id" -> "-1",
        "order_status" -> "1001", "total_amount" -> "0.00",
        "create_time" -> ct),
      env("order_detail", "id" -> id, "order_id" -> id, "sku_id" -> "-1",
        "sku_num" -> "1", "sku_name" -> "sku--1", "order_price" -> "0.00",
        "split_total_amount" -> "0.00", "create_time" -> ct),
      env("payment_info", "id" -> id, "order_id" -> id, "user_id" -> "-1",
        "total_amount" -> "0.00", "subject" -> "order",
        "payment_type" -> "1102", "create_time" -> pct),
      env("favor_info", "id" -> id, "sku_id" -> "-1", "ts" -> t0.toString),
      env("cart_info", "id" -> id, "sku_id" -> "-1", "ts" -> t0.toString),
      env("comment_info", "id" -> id, "sku_id" -> "-1", "appraise" -> "1202",
        "ts" -> t0.toString),
      env("refund_payment", "id" -> id, "order_id" -> id, "sku_id" -> "-1",
        "refund_amount" -> "0.00", "ts" -> t0.toString))
      .toDF("value").coalesce(1)
      .write.mode("append").parquet(topicDir(lay, OdsBaseDb))
  }

  /** The CDC fact subset: every 10th order (deterministic by key), joined
    * to its customer's nation for the province id. One row per order. */
  def orderSeed(spark: SparkSession, sfDir: String): DataFrame = {
    val o = graft.core.Tables.load(spark, sfDir, "orders")
      .filter(pmod(col("o_orderkey"), lit(10)) === 0)
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    val c = graft.core.Tables.load(spark, sfDir, "customer")
      .select("c_custkey", "c_nationkey")
    o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey").as("oid"), col("c_nationkey").as("pid"),
        col("o_custkey").as("uid"),
        col("o_totalprice").cast("decimal(16,2)").as("amt"),
        date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("ct"),
        // o_orderdate ships as TIMESTAMP_NTZ; sessions are pinned UTC, so
        // the cast is value-preserving (same contract as Tables.normalizeTs)
        unix_millis(col("o_orderdate").cast("timestamp")).as("tms"))
  }

  private def cdcLine(table: String, after: org.apache.spark.sql.Column) =
    to_json(struct(lit("gmall").as("database"), lit(table).as("tableName"),
      map().cast("map<string,string>").as("before"), after.as("after"),
      lit("insert").as("type")))

  /** orders/customer/nation → ods_base_db CDC envelopes: order_info,
    * order_detail (one per order, same create_time → inside the ±5s join
    * bound), payment_info (+60s → inside −15min), favor/cart/comment/
    * refund rows (sku-keyed one-hot fuel), and the base_province dim
    * (hbase-routed → DimStore, the K3 path orderWide re-reads per batch).
    * Dims are written as a SEPARATE earlier file so the file source's
    * mtime order replays them first — the reference's "dims preloaded in
    * HBase before facts flow" bootstrap. */
  def genBaseDb(spark: SparkSession, sfDir: String, lay: Layout): Unit = {
    val dim = graft.core.Tables.load(spark, sfDir, "nation")
      .select(cdcLine("base_province", map(
        lit("id"), col("n_nationkey").cast("string"),
        lit("name"), col("n_name"),
        lit("area_code"), (col("n_nationkey") + 100).cast("string"),
        lit("iso_code"), concat(lit("ISO-"), col("n_nationkey")),
        lit("ver"), lit("1"))).as("value"))
    val dimDir = new java.io.File(topicDir(lay, OdsBaseDb))
    dim.coalesce(1).write.mode("append").parquet(dimDir.toString)
    // facts land as a second file with a later mtime than the dim file
    val t0 = System.currentTimeMillis()
    dimDir.listFiles().foreach(_.setLastModified(t0 - 60000L))

    val s = orderSeed(spark, sfDir)
    val sku = (pmod(col("oid"), lit(20)) + 1).cast("string")
    val facts = Seq(
      cdcLine("order_info", map(
        lit("id"), col("oid").cast("string"),
        lit("province_id"), col("pid").cast("string"),
        lit("user_id"), col("uid").cast("string"),
        lit("order_status"), lit("1001"),
        lit("total_amount"), col("amt").cast("string"),
        lit("create_time"), col("ct"))),
      cdcLine("order_detail", map(
        lit("id"), col("oid").cast("string"),
        lit("order_id"), col("oid").cast("string"),
        lit("sku_id"), sku,
        lit("sku_num"), lit("1"),
        lit("sku_name"), concat(lit("sku-"), sku),
        lit("order_price"), col("amt").cast("string"),
        lit("split_total_amount"), col("amt").cast("string"),
        lit("create_time"), col("ct"))),
      cdcLine("payment_info", map(
        lit("id"), col("oid").cast("string"),
        lit("order_id"), col("oid").cast("string"),
        lit("user_id"), col("uid").cast("string"),
        lit("total_amount"), col("amt").cast("string"),
        lit("subject"), lit("order"),
        lit("payment_type"), lit("1102"),
        lit("create_time"), date_format(
          timestamp_millis(col("tms") + 60000L), "yyyy-MM-dd HH:mm:ss"))),
      cdcLine("favor_info", map(
        lit("id"), col("oid").cast("string"), lit("sku_id"), sku,
        lit("ts"), col("tms").cast("string"))),
      cdcLine("cart_info", map(
        lit("id"), col("oid").cast("string"), lit("sku_id"), sku,
        lit("ts"), col("tms").cast("string"))),
      cdcLine("comment_info", map(
        lit("id"), col("oid").cast("string"), lit("sku_id"), sku,
        lit("appraise"),
          when(pmod(col("oid"), lit(2)) === 0, "1201").otherwise("1202"),
        lit("ts"), col("tms").cast("string"))),
      cdcLine("refund_payment", map(
        lit("id"), col("oid").cast("string"),
        lit("order_id"), col("oid").cast("string"), lit("sku_id"), sku,
        lit("refund_amount"), col("amt").cast("string"),
        lit("ts"), col("tms").cast("string"))))
      .map(c => s.select(c.as("value"))).reduce(_.unionByName(_))
    facts.write.mode("append").parquet(topicDir(lay, OdsBaseDb))
  }

  /** The table_process config rows routing the CDC families (J4):
    * facts → kafka dwd_* topics, base_province → hbase dim store. */
  def config(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("order_info", "insert", "kafka", DwdOrderInfo,
        "id,province_id,user_id,order_status,total_amount,create_time", "id", ""),
      ("order_detail", "insert", "kafka", DwdOrderDetail,
        "id,order_id,sku_id,sku_num,sku_name,order_price,split_total_amount,create_time", "id", ""),
      ("payment_info", "insert", "kafka", DwdPaymentInfo,
        "id,order_id,user_id,total_amount,subject,payment_type,create_time", "id", ""),
      ("favor_info", "insert", "kafka", "dwd_favor_info", "id,sku_id,ts", "id", ""),
      ("cart_info", "insert", "kafka", "dwd_cart_info", "id,sku_id,ts", "id", ""),
      ("comment_info", "insert", "kafka", "dwd_comment_info",
        "id,sku_id,appraise,ts", "id", ""),
      ("refund_payment", "insert", "kafka", "dwd_refund_payment",
        "id,order_id,sku_id,refund_amount,ts", "id", ""),
      ("base_province", "insert", "hbase", "dim_base_province",
        "id,name,area_code,iso_code,ver", "id", ""))
      .toDF("sourceTable", "operateType", "sinkType", "sinkTable",
        "sinkColumns", "sinkPk", "sinkExtend")
  }

  // ------------------------------------------------------------------
  // shared wire decode + shaping (identical code on stream AND batch
  // frames — engine mode is the only variable the equivalence gate sees)
  // ------------------------------------------------------------------

  private def topicDir(lay: Layout, name: String): String = lay.topic(name)

  private def valueStream(spark: SparkSession, dir: String,
      options: Map[String, String] = Map.empty): DataFrame =
    spark.readStream.schema("value STRING").options(options).parquet(dir)

  private def valueBatch(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema("value STRING").parquet(dir)

  /** Flat string-map decode of a routed dwd_* value (Schemas.cdcValue). */
  private def mapOf(values: DataFrame): org.apache.spark.sql.Column =
    from_json(col("value"), Schemas.cdcValue)

  private def skuTsFrame(values: DataFrame, extra: (String, String)*): DataFrame =
    values.select(mapOf(values).as("m"))
      .select(col("m")("sku_id").cast("long").as("sku_id") +:
        col("m")("ts").cast("long").as("ts") +:
        extra.map { case (k, t) => col("m")(k).cast(t).as(k) }: _*)

  /** dwm_order_wide wire row → the fields the DWS consumers key on. */
  private def orderWideView(values: DataFrame): DataFrame =
    values.select(mapOf(values).as("m")).select(
      col("m")("o_id").cast("long").as("order_id"),
      col("m")("o_create_ts").cast("long").as("create_ts"),
      col("m")("o_user_id").cast("long").as("user_id"),
      col("m")("o_province_id").cast("long").as("province_id"),
      col("m")("province_name").as("province_name"),
      col("m")("province_area_code").as("province_area_code"),
      col("m")("province_iso_code").as("province_iso_code"),
      col("m")("d_sku_id").cast("long").as("sku_id"),
      col("m")("d_split_total_amount").cast("decimal(16,2)")
        .as("split_total_amount"))

  private def paymentWideView(values: DataFrame): DataFrame =
    values.select(mapOf(values).as("m")).select(
      col("m")("p_id").cast("long").as("payment_id"),
      col("m")("ow_order_id").cast("long").as("order_id"),
      col("m")("p_create_ts").cast("long").as("ts"),
      col("m")("ow_sku_id").cast("long").as("sku_id"),
      col("m")("ow_split_total_amount").cast("decimal(16,2)")
        .as("split_total_amount"))

  /** VisitorStats one-hot shaping (P7) — the three measure streams the
    * reference unions (VisitorStatsApp.java:60-95). `parsed` frames carry
    * Schemas.pageLog columns. */
  private def pvRows(parsed: DataFrame): DataFrame =
    parsed.select(
      col("common.vc").as("vc"), col("common.ch").as("ch"),
      col("common.ar").as("ar"), col("common.is_new").as("is_new"),
      lit(0L).as("uv_ct"), lit(1L).as("pv_ct"),
      when(col("page.last_page_id").isNull ||
        col("page.last_page_id") === "", 1L).otherwise(0L).as("sv_ct"),
      lit(0L).as("uj_ct"),
      coalesce(col("page.during_time"), lit(0L)).as("dur_sum"), col("ts"))

  private def oneHot(parsed: DataFrame, measure: String): DataFrame =
    parsed.select(
      col("common.vc").as("vc"), col("common.ch").as("ch"),
      col("common.ar").as("ar"), col("common.is_new").as("is_new"),
      lit(if (measure == "uv") 1L else 0L).as("uv_ct"), lit(0L).as("pv_ct"),
      lit(0L).as("sv_ct"),
      lit(if (measure == "uj") 1L else 0L).as("uj_ct"),
      lit(0L).as("dur_sum"), col("ts"))

  /** The eight shaped product legs. `wrap` is applied to EACH leg before
    * the union: the live chain passes WindowStats.leg(_, delay) so every
    * leg carries its own watermark node (min policy — see WindowStats.leg
    * scaladoc for why a post-union watermark drops slow-leg rows); batch
    * twins use the identity. */
  private def productLegs(page: DataFrame, favor: DataFrame,
      cart: DataFrame, ow: DataFrame, pw: DataFrame, refund: DataFrame,
      comment: DataFrame): Seq[DataFrame] = Seq(
    ProductStatsShaping.fromPageClicks(page),
    ProductStatsShaping.fromDisplays(page),
    ProductStatsShaping.fromFavor(favor),
    ProductStatsShaping.fromCart(cart),
    ProductStatsShaping.fromOrders(
      ow.withColumnRenamed("create_ts", "ts")),
    ProductStatsShaping.fromPayments(pw),
    ProductStatsShaping.fromRefunds(refund),
    ProductStatsShaping.fromComments(comment))

  private def productInputs(page: DataFrame, favor: DataFrame,
      cart: DataFrame, ow: DataFrame, pw: DataFrame, refund: DataFrame,
      comment: DataFrame,
      wrap: DataFrame => DataFrame = identity): DataFrame =
    ProductStatsShaping.unionAll(
      productLegs(page, favor, cart, ow, pw, refund, comment).map(wrap))

  private def provinceInput(ow: DataFrame): DataFrame =
    ow.select(col("province_id"), col("province_name"),
      col("province_area_code"), col("province_iso_code"),
      col("order_id"), col("split_total_amount"),
      col("create_ts").as("ts"))

  // ------------------------------------------------------------------
  // the concurrent chain
  // ------------------------------------------------------------------

  /** Start every layer as a live checkpointed StreamingQuery. DWS tables
    * land in durable per-layout parquet dirs through the K5 path
    * (complete mode — every window emitted every batch, versioned by
    * batch id, read back via [[dwsTable]]'s ReplacingMergeTree view; the
    * same contract the individual st_* DWS twins gate on). Returns
    * name → query. */
  def start(spark: SparkSession, lay: Layout,
      odsOptions: Map[String, String] = Map.empty): Map[String, StreamingQuery] = {
    // every topic dir must exist before a consumer's file source starts
    Seq(OdsBaseLog, OdsBaseDb, DwdStartLog, DwdDisplayLog, DwdPageLog,
      DwmUniqueVisit, DwmUserJumpDetail, DwmOrderWide, DwmPaymentWide)
      .foreach(t => new java.io.File(lay.topic(t)).mkdirs())
    Seq(DwdOrderInfo, DwdOrderDetail, DwdPaymentInfo, "dwd_favor_info",
      "dwd_cart_info", "dwd_comment_info", "dwd_refund_payment")
      .foreach(t => new java.io.File(lay.dbTopic(t)).mkdirs())
    val cfg = config(spark)

    // ONE file per topic per batch: a multi-part commit is not atomic (the
    // job committer renames task files one by one), so a concurrent
    // downstream listing can catch HALF a batch — the missed parts then
    // arrive as late, out-of-order rows in the consumer's next batch,
    // breaking the per-key ordered-arrival contract the keyed folds
    // document (observed as bounce timers landing behind the watermark).
    // A single rename is atomic: a batch's file is visible entirely or
    // not at all — the file-topic analog of Kafka's per-partition order
    // (which a mid/id-keyed producer gives the real deployment).
    def writeValues(df: DataFrame, dir: String): Unit =
      df.coalesce(1).write.mode("append").parquet(dir)

    // --- BaseLogApp: one consumer, three topic sinks (deployBaseLog shape)
    val repaired = BaseLog.repairIsNew(BaseLog.clean(BaseLog.parse(
      valueStream(spark, lay.topic(OdsBaseLog), odsOptions))))
    val baseLogQ = () => repaired.writeStream
      .option("checkpointLocation", lay.ck("base_log"))
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.persist()
        try {
          val asJson = (df: DataFrame) =>
            df.select(to_json(struct(df.columns.map(col): _*)).as("value"))
          writeValues(asJson(BaseLog.pageLog(batch)), lay.topic(DwdPageLog))
          writeValues(asJson(BaseLog.startLog(batch)), lay.topic(DwdStartLog))
          writeValues(BaseLog.displayLog(batch)
            .select(to_json(struct(col("ts"), col("mid"), col("page_id"),
              col("display_type"), col("item"), col("item_type"),
              col("pos_id"), col("order"))).as("value")),
            lay.topic(DwdDisplayLog))
        } finally batch.unpersist()
      }.start()

    // --- BaseDBApp: dynamic kafka routing + hbase dim upsert (K2 + K3)
    val routed = DbRouting.route(DbRouting.dropDeletes(DbRouting.parseCdc(
      valueStream(spark, lay.topic(OdsBaseDb), odsOptions))), cfg)
    val baseDbQ = () => routed.writeStream
      .option("checkpointLocation", lay.ck("base_db"))
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.persist()
        try {
          // dims COMMIT BEFORE facts publish: a downstream fact consumer
          // must never see a fact file whose batch's dim rows are not yet
          // readable (the reference's HBase write happens in the same
          // routing operator for the same reason)
          val dims = DbRouting.hbaseRoute(batch)
            .filter(col("sinkTable") === "dim_base_province")
            .select(col("after")("id").as("id"), col("after")("name").as("name"),
              col("after")("area_code").as("area_code"),
              col("after")("iso_code").as("iso_code"),
              col("after")("ver").as("ver"))
          if (!dims.isEmpty)
            DbRouting.upsertDim(spark, dims, lay.dimProvince, "id", "ver",
              nBuckets = 8)
          DbRouting.kafkaRoute(batch)
            .select(col("sinkTable"), to_json(col("after")).as("value"))
            .coalesce(1) // one file per sink table per batch (atomic rename)
            .write.mode("append").partitionBy("sinkTable").parquet(lay.dbRoot)
        } finally batch.unpersist()
      }.start()

    // --- DWM over dwd_page_log
    val pageStream = KafkaTopology.parsePageLog(
      valueStream(spark, lay.topic(DwdPageLog)))
    val uvQ = () => Runner.toParquet(
      Apps.uniqueVisit(pageStream, ttlMs = 0L),
      lay.topic(DwmUniqueVisit), lay.ck("unique_visit"),
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    val ujQ = () => Runner.toParquet(
      Bounce.detect(pageStream),
      lay.topic(DwmUserJumpDetail), lay.ck("user_jump"),
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))

    // --- OrderWideApp: stream-stream ±5s join + per-batch dim re-read (K3)
    val joined = OrderWide.intervalJoin(
      OrderWide.prefixed(KafkaTopology.parseOrderInfo(
        valueStream(spark, lay.dbTopic(DwdOrderInfo))), "o_"),
      OrderWide.prefixed(KafkaTopology.parseOrderDetail(
        valueStream(spark, lay.dbTopic(DwdOrderDetail))), "d_"))
    val orderWideQ = () => joined.writeStream
      .option("checkpointLocation", lay.ck("order_wide"))
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val dim =
          if (graft.io.DimStore.exists(spark, lay.dimProvince))
            DbRouting.readDim(spark, lay.dimProvince)
              .select("id", "name", "area_code", "iso_code")
          else spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            StructType(Seq("id", "name", "area_code", "iso_code")
              .map(StructField(_, StringType))))
        val enriched = OrderWide.enrich(batch,
          Seq(("province_", dim, "o_province_id", "id")))
        writeValues(enriched.select(to_json(struct(
          enriched.columns.map(col): _*)).as("value")),
          lay.topic(DwmOrderWide))
      }.start()

    // --- PaymentWideApp: −15min/+5s stream-stream join over the re-entrant
    // order-wide topic (the wire re-parse is the reference's re-consume)
    val owBack = orderWideView(valueStream(spark, lay.topic(DwmOrderWide)))
      .select(col("order_id"), col("create_ts"), col("sku_id"),
        col("split_total_amount"))
    val pw = Apps.paymentWide(KafkaTopology.parsePaymentInfo(
      valueStream(spark, lay.dbTopic(DwdPaymentInfo))), owBack)
    val paymentWideQ = () => pw.writeStream
      .option("checkpointLocation", lay.ck("payment_wide"))
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        writeValues(batch.select(to_json(struct(
          batch.columns.map(col): _*)).as("value")),
          lay.topic(DwmPaymentWide))
      }.start()

    // --- DWS: the four summary apps through the K5 path — APPEND-mode
    // foreachBatch appends each window ONCE, when the watermark closes it,
    // versioned by batch id to durable parquet dirs (the ClickHouse
    // ReplacingMergeTree shape; dwsTable is the RMT reader — exactly the
    // reference's insert-on-window-close ClickHouse contract). State holds
    // OPEN windows only (watermark-evicted on emit), so state size and
    // per-batch write volume are bounded by the windows in flight, not by
    // stream uptime — the complete-mode shape this replaced re-emitted
    // every window since stream start on every batch (VERDICT r14: the
    // one scale-killer left). A replayed batch appends the same closed
    // windows under the same _ver — reader-dedup'd, the reference's own
    // exactly-once story for its ClickHouse sink. Multi-leg inputs are
    // watermarked PER LEG before the union (WindowStats.leg): append mode
    // drops rows behind the watermark, and a single post-union node would
    // run ahead of the slower dwm topics and drop their rows as late.
    def dwsSink(name: String, df: DataFrame): () => StreamingQuery =
      () => df.writeStream
        .option("checkpointLocation", lay.ck(name))
        .outputMode("append")
        .foreachBatch { (batch: DataFrame, id: Long) =>
          batch.withColumn("_ver", lit(id))
            .coalesce(1).write.mode("append").parquet(lay.dws(name))
        }.start()

    val pv = pvRows(pageStream)
    val uv = oneHot(KafkaTopology.parsePageLog(
      valueStream(spark, lay.topic(DwmUniqueVisit))), "uv")
    val uj = oneHot(KafkaTopology.parsePageLog(
      valueStream(spark, lay.topic(DwmUserJumpDetail))), "uj")
    val vLeg = (df: DataFrame) => WindowStats.leg(df, "11 seconds")
    val visitorQ = dwsSink("visitor",
      WindowStats.visitorStats(
        vLeg(pv).unionByName(vLeg(uv)).unionByName(vLeg(uj))))

    val provinceQ = dwsSink("province",
      WindowStats.provinceStats(provinceInput(
        orderWideView(valueStream(spark, lay.topic(DwmOrderWide))))))

    implicit val s: SparkSession = spark
    val keywordQ = dwsSink("keyword", WindowStats.keywordStats(pageStream))

    val productQ = dwsSink("product",
      WindowStats.productStats(productInputs(
        pageStream,
        skuTsFrame(valueStream(spark, lay.dbTopic("dwd_favor_info"))),
        skuTsFrame(valueStream(spark, lay.dbTopic("dwd_cart_info"))),
        orderWideView(valueStream(spark, lay.topic(DwmOrderWide))),
        paymentWideView(valueStream(spark, lay.topic(DwmPaymentWide))),
        skuTsFrame(valueStream(spark, lay.dbTopic("dwd_refund_payment")),
          "order_id" -> "long", "refund_amount" -> "decimal(16,2)"),
        skuTsFrame(valueStream(spark, lay.dbTopic("dwd_comment_info")),
          "appraise" -> "string"),
        wrap = WindowStats.leg(_, "2 seconds"))))

    // r17 (guide §2.6): the ten .start() calls each pay synchronous
    // driver-side analysis + checkpoint setup; the queries are mutually
    // independent at start time (every topic dir exists, no data flows
    // until the caller generates it), so launching them from a pool
    // compresses the start phase from the sum to roughly the max. The
    // thunks above only defer .start(); each query's plan is unchanged.
    val defs = Seq(
      "base_log" -> baseLogQ, "base_db" -> baseDbQ,
      "unique_visit" -> uvQ, "user_jump" -> ujQ,
      "order_wide" -> orderWideQ, "payment_wide" -> paymentWideQ,
      "visitor" -> visitorQ, "province" -> provinceQ,
      "keyword" -> keywordQ, "product" -> productQ)
    val started = new java.util.concurrent.ConcurrentHashMap[String, StreamingQuery]()
    try
      inParallel(defs.map { case (name, mk) =>
        () => { started.put(name, mk()): Unit }
      })
    catch { case e: Throwable =>
      // a failed launch must not leak the queries that did start
      import scala.jdk.CollectionConverters._
      started.values().asScala.foreach(q => try q.stop() catch { case _: Throwable => () })
      throw e
    }
    import scala.jdk.CollectionConverters._
    started.asScala.toMap
  }

  /** Run independent driver-side units on their own threads and await all
    * — guide §2.6's overlap-independent-jobs pattern, the same shape as
    * Curation.inParallelN. Used for (a) the independent input-generation
    * batch writes and (b) drain barriers WITHIN one topological level
    * (queries whose inputs are already fully written, so each wait's
    * completion is independent of the others'). Rethrows the first
    * failure; the pool is torn down before returning. */
  private[graft] def inParallel(thunks: Seq[() => Unit]): Unit = {
    if (thunks.size <= 1) { thunks.foreach(_()); return }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(thunks.size)
    try {
      import scala.jdk.CollectionConverters._
      pool.invokeAll(
        thunks.map { t =>
          new java.util.concurrent.Callable[Unit] { def call(): Unit = t() }
        }.asJava).asScala.foreach(_.get()) // rethrows the first failure
    } finally pool.shutdown()
  }

  /** Drain the chain topologically: upstream processAllAvailable barriers
    * release downstream file sources batch by batch, while every query
    * stays live (the barriers are observation points, not lifecycle —
    * all ten queries hold their checkpoints and state across them). After
    * the real corpus has flowed, the log + db sentinels advance every
    * leg's watermark an hour past the horizon, so the bounce timers fire
    * exactly once and every real DWS window CLOSES (append mode emits a
    * window only at watermark passage; processAllAvailable waits for the
    * watermark-advancing no-data batch that does the emitting).
    *
    * r17: barriers within one topological LEVEL run in parallel — safe
    * exactly when every input of the level is fully written (the prior
    * level's barriers completed), because then each wait's completion
    * cannot depend on a sibling's. Across levels the order stays strict:
    * payment_wide reads the order-wide topic, so its barrier must follow
    * order_wide's, or its processAllAvailable could observe a momentary
    * no-new-data gap before order_wide's last file lands and return
    * under-drained. The two sentinel writes share ONE horizon scan
    * (sentinelTs was computed twice — two identical events aggregations)
    * and submit as independent batch jobs. */
  def drainAll(spark: SparkSession, sfDir: String, lay: Layout,
      qs: Map[String, StreamingQuery], prof: WhProf = null): Unit = {
    def t(name: String)(body: => Unit): Unit =
      if (prof == null) body else prof.time(name)(body)
    def par(names: String*): Unit =
      inParallel(names.map(n => () => qs(n).processAllAvailable()))
    t("drain_base")(par("base_log", "base_db"))
    t("drain_uv_ow")(par("unique_visit", "order_wide"))
    t("drain_pw")(qs("payment_wide").processAllAvailable())
    t("gen_sentinels") {
      val horizon = sentinelTs(spark, sfDir)
      inParallel(Seq(
        () => genSentinel(spark, sfDir, lay, horizon),
        () => genDbSentinel(spark, sfDir, lay, horizon)))
    }
    t("drain2_base")(par("base_log", "base_db"))
    // sentinel batch + timer batches
    t("drain2_uv_uj_ow")(par("unique_visit", "user_jump", "order_wide"))
    t("drain2_pw")(qs("payment_wide").processAllAvailable())
    t("drain2_dws")(par("visitor", "province", "keyword", "product"))
  }

  // ------------------------------------------------------------------
  // the gate: the chain's terminal visitor frame (externally oracle-
  // gated) + stream≡batch equivalence booleans for every other layer
  // ------------------------------------------------------------------

  /** 1-row frame of TRUE iff `a` and `b` are multiset-equal. */
  private def same(a: DataFrame, b: DataFrame, name: String): DataFrame =
    a.exceptAll(b).agg(count(lit(1)).as("_x"))
      .crossJoin(broadcast(b.exceptAll(a).agg(count(lit(1)).as("_y"))))
      .select((col("_x") === 0 && col("_y") === 0).as(name))

  /** The final global watermark of an append-mode streaming agg, restated
    * in batch: min over the query's watermark nodes (one per unioned leg)
    * of max(event time) − delay — Spark's multipleWatermarkPolicy=min. A
    * leg with no rows pins the watermark at −∞ and no window ever closes,
    * exactly like the live query (that is why every leg gets a sentinel).
    * `ts` column, delay in ms. */
  private def finalWatermarkMs(legs: Seq[(DataFrame, Long)]): Option[Long] = {
    val row = legs.map { case (df, d) =>
      df.agg((max(col("ts")) - d).as("wm")) }
      .reduce(_.unionByName(_))
      .agg(min(col("wm")), count(col("wm"))).collect()(0)
    if (row.isNullAt(0) || row.getLong(1) < legs.size) None
    else Some(row.getLong(0))
  }

  /** Batch restatement of append-mode emission: keep only windows the
    * final watermark closed (edt ≤ wm; Spark's boundary predicate differs
    * by at most 1 ms, irrelevant under the 1-hour sentinel margin). Open
    * windows — the sentinels' own, and any genuinely-late stragglers —
    * never reached the live table and are excluded from the twin too. */
  private def closedOnly(stats: DataFrame, wm: Option[Long]): DataFrame =
    wm match {
      case Some(w) =>
        stats.filter(unix_millis(to_timestamp(col("edt"))) <= w)
      case None => stats.limit(0)
    }

  /** The seven per-layer equivalence booleans, one 1-row broadcastable
    * frame. Each compares the LIVE chain's committed wire/memory output
    * against the same shaping code run as a batch composition over the
    * same upstream inputs — engine mode (keyed state machines, stream-
    * stream joins, append-mode watermark-evicted window state,
    * checkpointed fan-out under concurrency) is the only variable. The
    * batch compositions' own external parity is what the a1-a5/c1/j1/j2
    * oracle rows already pin, so TRUE here extends those proofs to the
    * concurrent chain. The three DWS twins are filtered to watermark-
    * closed windows ([[closedOnly]]) — the append-mode contract the live
    * tables now hold. */
  def equivalenceGate(spark: SparkSession, lay: Layout): DataFrame = {
    import graft.core.Materialize.StageSyntax
    val uvStream = KafkaTopology.parsePageLog(
      valueBatch(spark, lay.topic(DwmUniqueVisit)))
      .filter(col("common.mid") =!= SentinelMid)
      .select(col("common.mid").as("mid"), col("ts"))
    val ujStream = KafkaTopology.parsePageLog(
      valueBatch(spark, lay.topic(DwmUserJumpDetail)))
      .filter(col("common.mid") =!= SentinelMid)
      .select(col("common.mid").as("mid"), col("ts"))
    // staged once: the ODS re-parse feeds uv/uj/keyword/product twins and
    // the CDC re-parse + join feeds both the order_ok and payment_ok legs.
    // pgAll keeps the sentinel lines (they drive the leg watermarks); pg
    // is the twin-content view without them. The four stage barriers read
    // four independent committed wire dirs, so they materialize in
    // parallel (guide §2.6) — each thunk stages exactly the frame it
    // would have alone.
    val stagedFrames = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
    inParallel(Seq(
      () => { stagedFrames.put("pgAll", BaseLog.pageLog(BaseLog.clean(
        BaseLog.parse(valueBatch(spark, lay.topic(OdsBaseLog))))).staged): Unit },
      () => { stagedFrames.put("owFull", batchOrderWide(spark, lay).staged): Unit },
      () => { stagedFrames.put("owWire", orderWideView(
        valueBatch(spark, lay.topic(DwmOrderWide))).staged): Unit },
      () => { stagedFrames.put("pwWire", paymentWideView(
        valueBatch(spark, lay.topic(DwmPaymentWide))).staged): Unit }))
    val pgAll = stagedFrames.get("pgAll")
    val pg = pgAll.filter(col("common.mid") =!= SentinelMid)
    val owFull = stagedFrames.get("owFull")
    val owWire = stagedFrames.get("owWire")
    val owStream = owWire
      .select("order_id", "sku_id", "province_name", "split_total_amount",
        "create_ts")
    val owBatch = owFull
      .select(col("o_id").as("order_id"), col("d_sku_id").as("sku_id"),
        col("province_name"),
        col("d_split_total_amount").as("split_total_amount"),
        col("o_create_ts").as("create_ts"))
    val pwWire = stagedFrames.get("pwWire")
    val pwBatch = batchPaymentWide(spark, lay, owFull)
      .select(col("p_id").as("payment_id"), col("ow_order_id").as("order_id"),
        col("p_create_ts").as("ts"), col("ow_sku_id").as("sku_id"),
        col("ow_split_total_amount").as("split_total_amount"))
    // DWS batch twins: ow/pw consumed from the committed wire (their own
    // wire≡batch proof is order_ok/payment_ok) — provenance stays layered.
    // Each twin is cut to the windows its live query's final watermark
    // closed, with leg watermarks computed over the sentinel-INCLUSIVE
    // wire frames (the live watermark nodes saw the sentinels too).
    implicit val s: SparkSession = spark
    val favorB = skuTsFrame(valueBatch(spark, lay.dbTopic("dwd_favor_info")))
    val cartB = skuTsFrame(valueBatch(spark, lay.dbTopic("dwd_cart_info")))
    val refundB = skuTsFrame(
      valueBatch(spark, lay.dbTopic("dwd_refund_payment")),
      "order_id" -> "long", "refund_amount" -> "decimal(16,2)")
    val commentB = skuTsFrame(
      valueBatch(spark, lay.dbTopic("dwd_comment_info")),
      "appraise" -> "string")
    // three independent 1-row watermark collects over the staged frames —
    // same §2.6 overlap (each is one small aggregation job)
    val wms = new Array[Option[Long]](3)
    inParallel(Seq(
      () => wms(0) = finalWatermarkMs(
        Seq((provinceInput(owWire), 1000L))),
      () => wms(1) = finalWatermarkMs(Seq((
        pgAll.filter(col("page.last_page_id") === "search" &&
          col("page.item").isNotNull).select(col("ts")), 2000L))),
      () => wms(2) = finalWatermarkMs(
        productLegs(pgAll, favorB, cartB, owWire, pwWire, refundB, commentB)
          .map(leg => (leg, 2000L)))))
    val (provinceWm, keywordWm, productWm) = (wms(0), wms(1), wms(2))
    val provinceBatch = closedOnly(
      WindowStats.provinceStats(provinceInput(owWire)), provinceWm)
    val keywordBatch = closedOnly(WindowStats.keywordStats(pg), keywordWm)
    val productBatch = closedOnly(WindowStats.productStats(productInputs(
      pg, favorB, cartB, owWire, pwWire, refundB, commentB)), productWm)
    Seq(
      same(uvStream, batchUv(pg), "uv_ok"),
      same(ujStream, batchUj(pg), "uj_ok"),
      same(owStream, owBatch, "order_ok"),
      same(pwWire, pwBatch, "payment_ok"),
      same(dwsTable(spark, lay, "province"), provinceBatch, "province_ok"),
      same(dwsTable(spark, lay, "keyword"), keywordBatch, "keyword_ok"),
      same(dwsTable(spark, lay, "product"), productBatch, "product_ok"))
      .reduce((a, b) => a.crossJoin(broadcast(b)))
  }

  /** The chain's terminal frame in a1_visitor_window's oracle shape: the
    * sentinel's own group dropped, cents divided back to DECIMAL and cast
    * DOUBLE exactly like the oracle's sum(CAST(value AS DECIMAL(18,2))).
    * pv_ct/dur_sum come from the pv one-hot rows; the uv/uj rows merged
    * into the same groups contribute zeros to both (their own measures
    * are proven by uv_ok/uj_ok). */
  def visitorResult(spark: SparkSession, lay: Layout,
      gate: DataFrame): DataFrame =
    dwsTable(spark, lay, "visitor")
      .filter(col("ch") =!= SentinelMid)
      .select(col("stt"), col("edt"), col("ch").as("event_type"),
        col("pv_ct"),
        (col("dur_sum").cast("decimal(22,2)") / 100).cast("double")
          .as("dur_sum"))
      .crossJoin(broadcast(gate))
      .orderBy("stt", "event_type")

  // ------------------------------------------------------------------
  // batch twins (the equivalence side of the gate): the SAME shaping
  // code over batch reads of the same wire dirs' UPSTREAM inputs —
  // stream-specific state machines restated as batch folds/windows
  // ------------------------------------------------------------------

  /** Batch page frame from the ODS dir: parse + clean (is_new repair is a
    * no-op by construction — every generated line says is_new=0), minus
    * the sentinel. */
  def batchPage(spark: SparkSession, lay: Layout): DataFrame =
    BaseLog.pageLog(BaseLog.clean(BaseLog.parse(
      valueBatch(spark, lay.topic(OdsBaseLog)))))
      .filter(col("common.mid") =!= SentinelMid)

  /** Batch UV twin: first entry-page per (mid, day) by (ts, event order);
    * ties cannot occur (unique per-mid ts — module precondition). Takes
    * the (staged) batch page frame so the four page consumers in the
    * gate share one ODS re-parse. */
  def batchUv(page: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val entries = page
      .filter(col("page.last_page_id").isNull || col("page.last_page_id") === "")
    entries
      // date_format renders in the session time zone — the same zone
      // UniqueVisit.dedup buckets its per-mid day state by
      .withColumn("_day",
        date_format(timestamp_millis(col("ts")), "yyyy-MM-dd"))
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("common.mid"), col("_day")).orderBy(col("ts"))))
      .filter(col("_rn") === 1)
      .select(col("common.mid").as("mid"), col("ts"))
  }

  /** Batch bounce twin: the SHIPPED pure transition ([[Bounce.advance]])
    * folded per mid in ts order, trailing pendings flushed — exactly what
    * the streaming timers emit once the sentinel advances the watermark
    * past every pending's window. */
  def batchUj(page: DataFrame): DataFrame = {
    val spark = page.sparkSession
    import spark.implicits._
    page
      .select(col("common.mid").as("mid"), col("ts"),
        coalesce(col("page.last_page_id"), lit("")).as("lastPageId"))
      .as[(String, Long, String)]
      .groupByKey(_._1)
      .flatMapGroups { (mid: String, rows: Iterator[(String, Long, String)]) =>
        val sorted = rows.toSeq.sortBy(_._2)
          .map { case (_, ts, lp) => (ts, lp.isEmpty, ts.toString) }
        val (out, pending) = Bounce.advance(None, sorted)
        (out ++ pending.map(_.json)).map(p => (mid, p.toLong)).iterator
      }
      .toDF("mid", "ts")
  }

  /** Batch order-wide twin: routed CDC re-parsed, equi-join with the ±5s
    * bound as a plain predicate, broadcast dim enrichment from the SAME
    * DimStore snapshot the live chain committed. */
  def batchOrderWide(spark: SparkSession, lay: Layout): DataFrame = {
    val oi = OrderWide.prefixed(KafkaTopology.parseOrderInfo(
      valueBatch(spark, lay.dbTopic(DwdOrderInfo))), "o_")
    val od = OrderWide.prefixed(KafkaTopology.parseOrderDetail(
      valueBatch(spark, lay.dbTopic(DwdOrderDetail))), "d_")
    val joined = oi.join(od, col("o_id") === col("d_order_id") &&
      abs(col("d_create_ts") - col("o_create_ts")) <=
        OrderWide.JoinBoundSec * 1000L)
    val dim = DbRouting.readDim(spark, lay.dimProvince)
      .select("id", "name", "area_code", "iso_code")
    OrderWide.enrich(joined, Seq(("province_", dim, "o_province_id", "id")))
  }

  def batchPaymentWide(spark: SparkSession, lay: Layout,
      orderWideFrame: DataFrame): DataFrame = {
    val pay = OrderWide.prefixed(KafkaTopology.parsePaymentInfo(
      valueBatch(spark, lay.dbTopic(DwdPaymentInfo))), "p_")
    val ow = OrderWide.prefixed(orderWideFrame
      .select(col("o_id").as("order_id"), col("o_create_ts").as("create_ts"),
        col("d_sku_id").as("sku_id"),
        col("d_split_total_amount").as("split_total_amount")), "ow_")
    PaymentWide.mergedView(
      pay.join(ow, col("p_order_id") === col("ow_order_id") &&
        col("ow_create_ts").between(
          col("p_create_ts") - 15L * 60000L, col("p_create_ts") + 5000L)))
  }

}
