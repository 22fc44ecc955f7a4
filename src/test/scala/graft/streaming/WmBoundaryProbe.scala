package graft.streaming

import graft.SparkTestBase
import graft.queries.StreamingOps

/** Pins Spark's late-filter boundary for SUB-MILLISECOND event times
  * under transformWithState — the empirical fact [[WatermarkFold]]'s
  * fold bound (`us <= wm·1000 + 999`) is built on, and the adjudication
  * of ADVICE r15's contrary claim: the filter is MILLISECOND-granular.
  * At watermark 1000 ms an arriving row with ANY microsecond remainder
  * inside the watermark millisecond (us in [1,000,000 .. 1,000,999]) is
  * dropped as late; the first microsecond of the next millisecond
  * (1,001,000) is kept. A µs-granular filter (drop iff us <= wm·1000)
  * would instead keep 1,000,200/1,000,500/1,000,999 — this spec fails
  * loudly if a Spark upgrade ever changes the semantics, which is the
  * signal to revisit the fold bound. */
class WmLateBoundarySpec extends SparkTestBase {
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

  test("late filter is millisecond-granular: the whole watermark millisecond drops, the next survives") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    StreamingOps.withRocksDB(spark) {
      val ms = MemoryStream[(Long, Long, String, Long, Long, java.sql.Timestamp)]
      val typed = ms.toDF()
        .toDF("event_id", "user_id", "sub", "us", "c", "ts")
        .withWatermark("ts", "0 seconds")
        .as[WatermarkFold.FoldEv]
      val out = WatermarkFold(typed,
        (st, e) => (Array(0L), Some((e.us, 0L, 0L))))
      val name = s"wmprobe_${System.nanoTime()}"
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      def ev(id: Long, us: Long) =
        (id, 1L, "", us, 0L, new java.sql.Timestamp(us / 1000L))
      try {
        // batch 1: max event = 1,000,500 us → watermark floors to 1000 ms
        ms.addData(ev(1L, 1000500L))
        q.processAllAvailable()
        // batch 2: candidates straddling the millisecond boundary
        ms.addData(ev(2L, 1000000L), ev(3L, 1000200L), ev(4L, 1000500L),
          ev(5L, 1000999L), ev(6L, 1001000L), ev(7L, 1001001L))
        q.processAllAvailable()
        val dropped = q.recentProgress.toSeq
          .map(p => p.stateOperators.map(_.numRowsDroppedByWatermark).sum).sum
        assert(dropped == 4L,
          s"expected exactly ids 2-5 (the wm millisecond) dropped, got $dropped")
        // flush the survivors
        ms.addData(ev(100L, 99000000L))
        q.processAllAvailable()
        ms.addData(ev(101L, 999000000L))
        q.processAllAvailable()
        val got = spark.table(name).as[WatermarkFold.FoldOut]
          .collect().toSeq.map(_.event_id).sorted
        assert(got == Seq(1L, 6L, 7L, 100L, 101L),
          s"survivors wrong: $got (1 buffered pre-watermark; 6,7 past the ms)")
      } finally q.stop()
    }
  }
}
