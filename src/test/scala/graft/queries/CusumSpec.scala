package graft.queries

import graft.SparkTestBase

/** Discriminating gate for a28_cusum / st_cusum_stream: the driver
  * fixture populates both alarm classes but cannot show WHERE the alarm
  * fires. This spec drives the SHIPPED registry queries over a corpus
  * with a known level shift (alarms must start only after the shift and
  * re-arm — repeat — while the deviation persists), over a stationary
  * twin (no alarms), and asserts the streaming twin agrees with the
  * batch fold on the shifted corpus. */
class CusumSpec extends SparkTestBase {
  import spark.implicits._

  /** Single-file events.parquet in the driver layout: one user, 2n
    * readings at 1s spacing; first half at `vLo`, second at `vHi`.
    * Times start a day past the epoch: Spark's (inclusive) late filter
    * drops eventTime <= watermark, and the initial watermark is 0 — an
    * epoch-0 row never enters any watermarked stateful operator (the
    * wm-fold twins; measured in r15's boundary probes). */
  private def corpusDir(n: Int, vLo: Double, vHi: Double): String =
    writeEventsParquet((0 until 2 * n).map { i =>
      val v = if (i < n) vLo else vHi
      (i.toLong, new java.sql.Timestamp(86400000L + i * 1000L), 1L, "click", v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))

  test("a level shift trips alarms only after the change point, and the chart re-arms") {
    // 60 @ 95.00 then 20 @ 250.00. Target = (60·9500 + 20·25000) / 80 =
    // 13375; first half sits BELOW target by 13375−9500−1000 = 2875/step
    // (alarm every ⌈20000/2875⌉ = 7 steps — the re-arm cadence), second
    // half ABOVE by 25000−13375−1000 = 10625/step (alarm every 2 steps).
    val dir = writeEventsParquet((0 until 80).map { i =>
      val v = if (i < 60) 95.0 else 250.0
      (i.toLong, new java.sql.Timestamp(86400000L + i * 1000L), 1L, "click", v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))

    val out = Registry.byName("a28_cusum").run(spark, dir)
      .select("event_id", "gp", "gn", "is_alarm")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    val lowAlarms = out.filter(_._1 < 60).filter(_._4 == 1L)
    val highAlarms = out.filter(_._1 >= 60).filter(_._4 == 1L)
    // below-target half: 2875/step into gn, alarm at step 7, re-armed →
    // alarms at event_ids 6, 13, 20, ... (7-step cadence from each reset)
    assert(lowAlarms.map(_._1).toSeq == Seq(6L, 13L, 20L, 27L, 34L, 41L,
      48L, 55L), s"got ${lowAlarms.map(_._1).toSeq}")
    assert(lowAlarms.forall(r => r._3 >= 20000L && r._2 == 0L))
    // above-target half: 10625/step into gp, alarm every 2nd reading
    // from the fresh post-shift state (gn resets to 0 at the first
    // positive step since its increment goes negative there)
    assert(highAlarms.nonEmpty && highAlarms.forall(r => r._2 >= 20000L))
    assert(highAlarms.map(_._1).toSeq == (61L until 80L by 2L).toSeq,
      s"got ${highAlarms.map(_._1).toSeq}")
  }

  test("a stationary series never alarms") {
    val flat = corpusDir(200, vLo = 60.0, vHi = 60.0)
    val out = Registry.byName("a28_cusum").run(spark, flat)
      .select("is_alarm").as[Long].collect()
    assert(out.forall(_ == 0L))
  }

  test("streaming twin equals the batch query on the shifted corpus") {
    val shifted = corpusDir(100, vLo = 30.0, vHi = 220.0)
    val batch = Registry.byName("a28_cusum").run(spark, shifted)
      .collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|"))
    val stream = Registry.byName("st_cusum_stream").run(spark, shifted)
      .collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|"))
    assert(batch.toSeq == stream.toSeq)
    assert(batch.nonEmpty)
  }
}
