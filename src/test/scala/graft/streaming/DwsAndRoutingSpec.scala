package graft.streaming

import graft.SparkTestBase
import graft.streaming.dwd.DbRouting
import graft.streaming.dws.WindowStats
import graft.functions.Tokenize
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.SparkSession

/** DWS window aggs, CDC routing, tokenizer, serving layer. */
case class Hot(ts: Long, vc: String, ch: String, ar: String, is_new: String,
    uv_ct: Long, pv_ct: Long, sv_ct: Long, uj_ct: Long, dur_sum: Long)

class DwsAndRoutingSpec extends SparkTestBase {
  import spark.implicits._

  test("visitor stats: 10s tumbling window, true sums of all measures (A1)") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Hot]
    val q = WindowStats.visitorStats(in.toDF())
      .writeStream.format("memory").queryName("vs_out").outputMode("append").start()
    try {
      in.addData(
        Hot(1000, "v1", "web", "110", "0", 1, 0, 0, 0, 0),
        Hot(2000, "v1", "web", "110", "0", 0, 1, 0, 0, 700),
        Hot(9000, "v1", "web", "110", "0", 0, 1, 0, 1, 300),
        Hot(12000, "v1", "web", "110", "0", 0, 1, 0, 0, 100)) // next window
      q.processAllAvailable()
      in.addData(Hot(100000, "v1", "web", "110", "0", 0, 0, 0, 0, 0)) // close windows
      q.processAllAvailable()
      val rows = spark.table("vs_out")
        .select("stt", "uv_ct", "pv_ct", "uj_ct", "dur_sum")
        .as[(String, Long, Long, Long, Long)].collect().toMap2
      // window [0,10s): uv=1 pv=2 uj=1 dur=1000 — every measure truly summed
      assert(rows("1970-01-01 00:00:00") == (1L, 2L, 1L, 1000L))
      assert(rows("1970-01-01 00:00:10") == (0L, 1L, 0L, 100L))
    } finally q.stop()
  }

  test("keyword stats: search filter + tokenize + windowed count (A4/F9)") {
    implicit val ctx = spark.sqlContext
    implicit val ss: SparkSession = spark
    val in = MemoryStream[String]
    val parsed = graft.streaming.dwd.BaseLog.clean(
      graft.streaming.dwd.BaseLog.parse(in.toDF()))
    val q = WindowStats.keywordStats(parsed)
      .writeStream.format("memory").queryName("kw_out").outputMode("append").start()
    def search(item: String, ts: Long) =
      s"""{"common":{"mid":"m"},"page":{"last_page_id":"search","page_id":"good_list","item":"$item"},"ts":$ts}"""
    def nonSearch(ts: Long) =
      s"""{"common":{"mid":"m"},"page":{"last_page_id":"home","page_id":"good_list","item":"ignored"},"ts":$ts}"""
    try {
      in.addData(search("Apple iPhone", 1000), search("apple watch", 2000), nonSearch(3000))
      q.processAllAvailable()
      in.addData(search("flush", 100000))
      q.processAllAvailable()
      val rows = spark.table("kw_out").select("word", "ct")
        .as[(String, Long)].collect().filter(_._1 != "flush").toSet
      assert(rows == Set(("apple", 2L), ("iphone", 1L), ("watch", 1L)))
    } finally q.stop()
  }

  test("tokenizer: punctuation split + CJK bigrams + failure passthrough (F9)") {
    assert(Tokenize.tokenize("Apple iPhone-12 Pro") ==
      Seq("apple", "iphone", "12", "pro"))
    assert(Tokenize.tokenize("小米手机") == Seq("小米", "米手", "手机"))
    assert(Tokenize.tokenize("Apple手机") == Seq("apple", "手机"))
    assert(Tokenize.tokenize("") == Seq.empty)
    assert(Tokenize.tokenize(null) == Seq.empty)
  }

  test("CDC parse normalizes ops; routing projects + splits sinks (S2/J4/P4/K4)") {
    val cdc = DbRouting.parseCdc(Seq(
      """{"database":"gmall","tableName":"base_trademark","before":{},"after":{"id":"12","tm_name":"Apple","logo_url":"x.png"},"type":"CREATE"}""",
      """{"database":"gmall","tableName":"base_trademark","before":{"id":"13"},"after":{},"type":"delete"}""",
      """{"database":"gmall","tableName":"order_info","before":{},"after":{"id":"7","total_amount":"99.5"},"type":"insert"}""")
      .toDF("value"))
    assert(cdc.filter($"type" === "insert").count() == 2) // create→insert
    val live = DbRouting.dropDeletes(cdc)
    assert(live.count() == 2)
    val config = Seq(
      ("base_trademark", "insert", "hbase", "dim_base_trademark", "id,tm_name", "id", null),
      ("order_info", "insert", "kafka", "dwd_order_info", "id,total_amount", "id", null))
      .toDF("sourceTable", "operateType", "sinkType", "sinkTable",
        "sinkColumns", "sinkPk", "sinkExtend")
    val routed = DbRouting.route(live, config)
    val hbase = DbRouting.hbaseRoute(routed)
    assert(hbase.count() == 1)
    // P4: logo_url not in sinkColumns → projected away from the map
    val after = hbase.select($"after").as[Map[String, String]].head()
    assert(after == Map("id" -> "12", "tm_name" -> "Apple"))
    assert(DbRouting.kafkaRoute(routed).count() == 1)
    val ddl = DbRouting.generateDdl("dim_base_trademark", "id,tm_name", "id", null)
    assert(ddl.contains("CREATE TABLE IF NOT EXISTS") && ddl.contains("`tm_name` STRING"))
  }

  test("dim upsert: last-write-wins by pk across batches (K3)") {
    val dir = tmpDir() + "/dim"
    val b1 = Seq(("1", "Apple", 100L), ("2", "Sony", 100L)).toDF("id", "tm_name", "ver")
    DbRouting.upsertDim(spark, b1, dir, "id", "ver")
    val b2 = Seq(("1", "APPLE-v2", 200L), ("3", "LG", 200L)).toDF("id", "tm_name", "ver")
    DbRouting.upsertDim(spark, b2, dir, "id", "ver")
    val dim = DbRouting.readDim(spark, dir).select("id", "tm_name")
      .as[(String, String)].collect().toSet
    assert(dim == Set(("1", "APPLE-v2"), ("2", "Sony"), ("3", "LG")))
  }

  test("serving layer: gmv + topN by group over product_stats (A7)") {
    import graft.ads.Serving
    val ps = Seq(
      ("2021-12-01 00:00:00", 1L, "spuA", 100.0, 2L, 1000L),
      ("2021-12-01 00:00:10", 1L, "spuA", 50.0, 1L, 2000L),
      ("2021-12-01 00:00:10", 2L, "spuB", 200.0, 1L, 2000L),
      ("2021-12-02 00:00:00", 3L, "spuC", 999.0, 1L, 3000L))
      .toDF("stt", "spu_id", "spu_name", "order_amount", "order_ct", "ts")
      .withColumn("stt", $"stt".cast("timestamp"))
    assert(Serving.gmv(ps, "20211201").as[Double].head() == 350.0)
    val top = Serving.bySpu(ps, "20211201", 1)
      .select("spu_id", "order_amount").as[(Long, Double)].collect().toSeq
    assert(top == Seq((2L, 200.0)))
    // ReplacingMergeTree semantics: same key twice, higher ts wins
    val dedup = Serving.dedupView(ps, Seq("stt", "spu_id"), "ts")
    assert(dedup.count() == ps.count() - 0) // all keys unique here
  }

  implicit class ToMap2(rows: Array[(String, Long, Long, Long, Long)]) {
    def toMap2: Map[String, (Long, Long, Long, Long)] =
      rows.map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
  }
}
