package graft.streaming

import graft.SparkTestBase
import graft.queries.StreamingOps

/** Contract tests for [[WatermarkFold]] beyond what the st_ registry
  * twins exercise: microsecond-precision fold order inside the buffer
  * (the concern behind ADVICE r15 — adjudicated in
  * [[WmLateBoundarySpec]]), the chunked hot-timestamp buffer
  * (ADVICE r15: O(n²) store writes), and the watermark-driven TTL
  * (VERDICT r15 #3). */
class WatermarkFoldSpec extends SparkTestBase {
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

  /** Step that emits a per-key running fold counter as v1 and echoes c
    * as v2 — the counter makes the FOLD ORDER observable in the output
    * and distinguishes a warm accumulator from a cold one. */
  private val countStep: WatermarkFold.Step = (st, e) => {
    val n = st.map(_(0)).getOrElse(0L) + 1L
    (Array(n), Some((n, e.c, 0L)))
  }

  private type Ev = (Long, Long, String, Long, Long, java.sql.Timestamp)

  private def ev(id: Long, user: Long, us: Long, c: Long = 0L): Ev =
    (id, user, "", us, c, new java.sql.Timestamp(us / 1000L))

  private def run(ttlMs: Long = 0L, flushRows: Int = WatermarkFold.FlushRows,
      delay: String = "0 seconds")(
      batches: Seq[Seq[Ev]]): Seq[WatermarkFold.FoldOut] = {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    StreamingOps.withRocksDB(spark) {
      val ms = MemoryStream[Ev]
      val typed = ms.toDF()
        .toDF("event_id", "user_id", "sub", "us", "c", "ts")
        .withWatermark("ts", delay)
        .as[WatermarkFold.FoldEv]
      val out = WatermarkFold(typed, countStep, ttlMs, flushRows)
      val name = s"wmfold_${System.nanoTime()}"
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try batches.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
      finally q.stop()
      spark.table(name).as[WatermarkFold.FoldOut].collect().toSeq
    }
  }

  test("buffered sub-millisecond rows fold in full-microsecond (us, event_id) order") {
    // ids arrive in one batch DESCENDING by microsecond within the same
    // millisecond — the fold must order them by exact us, not by arrival
    // and not by ms-truncated time (where all three would tie and fall
    // back to event_id order, which is also descending here)
    val rows = run()(Seq(
      Seq(ev(9L, 1L, 1000500L), ev(5L, 1L, 1000200L), ev(1L, 1L, 2000100L),
        ev(100L, 2L, 2000100L)),
      Seq(ev(101L, 2L, 10000000L)),
      Seq(ev(102L, 2L, 20000000L))))
    val u1 = rows.filter(_.user_id == 1L).map(r => r.event_id -> r.v1).toMap
    assert(u1 == Map(5L -> 1L, 9L -> 2L, 1L -> 3L),
      s"sub-ms fold order broken: $u1 (want us-ascending: 5,9,1)")
  }

  test("hot timestamp: rows sharing one event-time across flush chunks and batches fold in event_id order") {
    // 10 rows of one key at ONE event-time, ids deliberately shuffled,
    // split over two batches (a 5s watermark delay keeps batch 2 from
    // being late), with flushRows=3 so the buffer spans ≥4 chunks — the
    // fold must still emit counters in ascending event_id
    val us = 2000000L
    val b1 = Seq(7L, 3L, 9L, 1L, 5L).map(id => ev(id, 1L, us, c = id))
    val b2 = Seq(4L, 10L, 2L, 8L, 6L).map(id => ev(id, 1L, us, c = id))
    val rows = run(flushRows = 3, delay = "5 seconds")(Seq(
      b1 :+ ev(100L, 2L, us),
      b2 :+ ev(101L, 2L, us + 1000000L),
      Seq(ev(102L, 2L, 30000000L)),
      Seq(ev(103L, 2L, 31000000L))))
    val u1 = rows.filter(_.user_id == 1L).sortBy(_.event_id)
    assert(u1.map(_.event_id) == (1L to 10L), s"lost rows: ${u1.map(_.event_id)}")
    // counter n assigned to event_id n exactly when fold order == id order
    assert(u1.map(_.v1) == (1L to 10L),
      s"hot-timestamp fold order broken: ${u1.map(r => r.event_id -> r.v1)}")
  }

  test("watermark-driven TTL evicts an idle key's state; a revived key re-folds from cold") {
    // key 1 folds 3 rows (warm counter reaches 3), then sits idle while
    // key 2 drives the watermark far past the 10s TTL; the eviction
    // timer clears ALL of key 1's state, so its next row must emit a
    // COLD counter of 1 (the A5 re-appearing-visitor semantic). The
    // paired ttl=0 run over the IDENTICAL batches stays warm (counter 4)
    // — proving the eviction, not the scenario, resets the accumulator.
    // (RocksDB's numRowsTotal is an estimate, so the assertion is
    // functional rather than a state-row count.)
    val batches = Seq(
      Seq(ev(1L, 1L, 1000000L), ev(2L, 1L, 2000000L), ev(3L, 1L, 3000000L),
        ev(100L, 2L, 3000000L)),
      Seq(ev(101L, 2L, 60000000L)), // wm → 60s: folds key 1's rows
      Seq(ev(102L, 2L, 61000000L)), // fires key 1's 13s eviction timer
      Seq(ev(4L, 1L, 62000000L), ev(103L, 2L, 62000000L)),
      Seq(ev(104L, 2L, 70000000L)),
      Seq(ev(105L, 2L, 71000000L)))
    val cold = run(ttlMs = 10000L)(batches)
      .filter(_.user_id == 1L).map(r => r.event_id -> r.v1).toMap
    assert(cold(1L) == 1L && cold(2L) == 2L && cold(3L) == 3L,
      s"warm fold wrong: $cold")
    assert(cold(4L) == 1L,
      s"revived key must re-fold from cold (state evicted), got $cold")
    val warm = run(ttlMs = 0L)(batches)
      .filter(_.user_id == 1L).map(r => r.event_id -> r.v1).toMap
    assert(warm(4L) == 4L,
      s"ttl=0 must keep the accumulator warm forever, got $warm")
  }
}
