package graft.ads

import graft.SparkTestBase
import java.sql.Timestamp

/** Funnel + retention semantics on hand-computed fixtures (sf0.01
  * hash-parity is the oracle gate's job; these pin the ordering and
  * deadline rules a hash can't explain). */
class BehaviorSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(h: Int, m: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-0${1 + h / 24}%s ${h % 24}%02d:$m%02d:00")

  test("funnelSteps: deadline, ordering, and missing-stage rules") {
    // u1 converts fully; u2's click misses the 24h deadline; u3 stops at
    // view; u4 clicks without ever viewing; u5's click PRECEDES its view
    val events = Seq(
      (1L, "view", ts(0)), (1L, "click", ts(1)), (1L, "purchase", ts(2)),
      (2L, "view", ts(0)), (2L, "click", ts(25)),
      (3L, "view", ts(0)),
      (4L, "click", ts(1)),
      (5L, "click", ts(0)), (5L, "view", ts(1)))
      .toDF("user_id", "event_type", "ts")
    val f = Behavior.funnelSteps(events, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"), withinSecs = 86400L)
      .orderBy("stage_idx")
      .select("stage_idx", "stage", "n_users", "conv_from_prev")
      .as[(Long, String, Long, Double)].collect().toSeq
    assert(f == Seq(
      (0L, "view", 4L, 1.0),
      (1L, "click", 1L, 0.25),
      (2L, "purchase", 1L, 1.0)))
  }

  test("conversionLags: exact usec from first-stage entry to completion") {
    val events = Seq(
      (1L, "view", ts(0)), (1L, "click", ts(1)), (1L, "purchase", ts(2)),
      (2L, "view", ts(0)), (2L, "click", ts(1)))  // never completes
      .toDF("user_id", "event_type", "ts")
    val lags = Behavior.conversionLags(events, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"), withinSecs = 86400L)
      .as[(Long, Long)].collect().toSeq
    assert(lags == Seq((1L, 2L * 3600L * 1000000L)))
  }

  test("funnelSteps: a stage event at exactly the entry time does not advance") {
    // strict ts > entry: a click sharing the view's timestamp is ignored
    val events = Seq(
      (1L, "view", ts(0)), (1L, "click", ts(0)),
      (2L, "view", ts(0)), (2L, "click", ts(0)), (2L, "click", ts(3)))
      .toDF("user_id", "event_type", "ts")
    val f = Behavior.funnelSteps(events, "user_id", "event_type", "ts",
        Seq("view", "click"), withinSecs = 86400L)
      .orderBy("stage_idx").select("n_users").as[Long].collect().toSeq
    assert(f == Seq(2L, 1L)) // only u2's later click advances
  }

  test("both plans are window-free (keyed joins/aggregations only)") {
    // the lag-free funnel rollup and join-based retention keep the plans
    // free of ANY Window operator — nothing to degenerate into a
    // partition-less global sort at scale
    val events = Seq((1L, "view", ts(0))).toDF("user_id", "event_type", "ts")
    Seq(
      Behavior.funnelSteps(events, "user_id", "event_type", "ts",
        Seq("view", "click"), 60L),
      Behavior.retentionCohorts(events, "user_id", "ts")
    ).foreach { df =>
      val wins = df.queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }
      assert(wins.isEmpty, wins.mkString("\n"))
    }
  }

  test("funnelAdvance: state continues across micro-batches, no re-emission") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    import Behavior.FunnelEv
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[FunnelEv]
    val reached = input.toDS().groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        Behavior.funnelAdvance(Vector("view", "click"), withinUs = 1000000L) _)
      .toDF("uid", "stage_idx")
    val q = reached.writeStream.format("memory").queryName("funnel_cb")
      .outputMode("append").start()
    try {
      // batch 1: u1 views; u2 clicks without viewing
      input.addData(FunnelEv(1, 1L, 100, "view"), FunnelEv(2, 2L, 100, "click"))
      q.processAllAvailable()
      // batch 2: u1's click qualifies against batch-1 state (within 1s);
      // u2's late view starts its funnel; a second u1 view re-emits nothing
      input.addData(FunnelEv(3, 1L, 500, "click"), FunnelEv(4, 2L, 600, "view"),
        FunnelEv(5, 1L, 700, "view"))
      q.processAllAvailable()
      val rows = spark.table("funnel_cb")
        .as[(Long, Long)].collect().toSeq.sorted
      assert(rows == Seq((1L, 0L), (1L, 1L), (2L, 0L)))
    } finally q.stop()
  }

  test("retentionAdvance: cohort fixed at first sight, days never re-emitted") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    import Behavior.VisitEv
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[VisitEv]
    val out = input.toDS().groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        Behavior.retentionAdvance _)
      .toDF("uid", "cohort", "day")
    val q = out.writeStream.format("memory").queryName("ret_cb")
      .outputMode("append").start()
    try {
      input.addData(VisitEv(1L, 10), VisitEv(1L, 10), VisitEv(2L, 11))
      q.processAllAvailable()
      // batch 2: u1 revisits day 10 (no re-emission) and adds day 12
      // against batch-1 cohort state
      input.addData(VisitEv(1L, 12), VisitEv(1L, 10))
      q.processAllAvailable()
      val rows = spark.table("ret_cb")
        .as[(Long, Long, Long)].collect().toSeq.sorted
      assert(rows == Seq((1L, 10L, 10L), (1L, 10L, 12L), (2L, 11L, 11L)))
    } finally q.stop()
  }

  test("sessionPaths: gap splits sessions, paths are time-ordered, top-k cut") {
    // u1: a>b (1 min apart), then a NEW session c after a 2h gap;
    // u2: the same a>b path — so a>b counts 2 sessions
    val events = Seq(
      (1L, ts(0, 0), 1L, "a"), (1L, ts(0, 1), 2L, "b"), (1L, ts(2, 1), 3L, "c"),
      (2L, ts(0, 0), 4L, "a"), (2L, ts(0, 30), 5L, "b"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val p = Behavior.sessionPaths(events, "user_id", "ts", "event_type",
        "event_id", gapMinutes = 60L, k = 10)
      .as[(String, Long)].collect().toSeq
    assert(p == Seq(("a>b", 2L), ("c", 1L)))
    // k cuts deterministically on (count desc, path)
    val top1 = Behavior.sessionPaths(events, "user_id", "ts", "event_type",
      "event_id", gapMinutes = 60L, k = 1).as[(String, Long)].collect().toSeq
    assert(top1 == Seq(("a>b", 2L)))
  }

  test("retentionCohorts: cohort by first activity, per-day distinct users") {
    val events = Seq(
      (1L, ts(0)), (1L, ts(2)), (1L, ts(24)), // u1: day0 cohort, day0+day1
      (2L, ts(1)),                            // u2: day0 cohort, day0 only
      (3L, ts(48)))                           // u3: day2 cohort
      .toDF("user_id", "ts")
      .withColumn("event_type", org.apache.spark.sql.functions.lit("view"))
    val r = Behavior.retentionCohorts(events, "user_id", "ts")
      .orderBy("cohort_day", "day_offset")
      .select("cohort_day", "day_offset", "n_users", "retention")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(r == Seq(
      ("2024-01-01", 0L, 2L, 1.0),
      ("2024-01-01", 1L, 1L, 0.5),
      ("2024-01-03", 0L, 1L, 1.0)))
  }
}
