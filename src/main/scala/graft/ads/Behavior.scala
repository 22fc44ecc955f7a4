package graft.ads

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupState

/** Behavioral ADS-layer analytics over the event stream: funnel
  * conversion and cohort retention — the two serving queries a commerce
  * warehouse (reference: gmall2021 ADS layer, e.g.
  * RT/app/ads — province/visitor/keyword stats) runs beside topN, here
  * generalized to any ordered event-type cascade.
  *
  * Both are pure keyed-shuffle shapes: every join and aggregation is
  * keyed by user or by (cohort, offset) — no global sort, no
  * partition-less window, no driver-side data. At 100 TB the per-user
  * state is one timestamp per stage, and the event scan per stage is
  * filter-pushed to the type predicate.
  */
object Behavior {

  /** Ordered funnel with a per-step deadline: a user advances to stage
    * i+1 on their FIRST stage-(i+1) event strictly after their stage-i
    * entry time and within `withinSecs` of it. Returns one row per
    * stage: entrants, and conversion from the previous stage
    * (`conv_from_prev`, 4-dp floor-truncated; 1.0 for the first stage).
    *
    * The cascade folds left over `stages`: each step is one
    * user_id-keyed join between the survivors (one row per user) and
    * the next stage's (type-filtered, min-per-user) events — stage
    * predicates reach the scan, and shuffle keys never leave user_id
    * until the final tiny per-stage rollup. */
  def funnelSteps(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, stages: Seq[String], withinSecs: Long): DataFrame = {
    val survivors = funnelSurvivors(events, userCol, typeCol, tsCol,
      stages, withinSecs)
    val reached = stages.indices.map { i =>
      survivors(i).select(col("uid"), lit(i.toLong).as("stage_idx"))
    }.reduce(_.unionByName(_))
    funnelRollup(reached, stages)
  }

  /** The shared stage cascade: survivors(i) = (uid, t) with t the entry
    * time into stage i (first qualifying event; see [[funnelSteps]]). */
  private def funnelSurvivors(events: DataFrame, userCol: String,
      typeCol: String, tsCol: String, stages: Seq[String],
      withinSecs: Long): Seq[DataFrame] = {
    require(stages.nonEmpty, "need at least one funnel stage")
    val first = events.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol).as("uid")).agg(min(col(tsCol)).as("t"))
    stages.tail.scanLeft(first) { (prev, stage) =>
      val nxt = events.filter(col(typeCol) === stage)
        .select(col(userCol).as("uid"), col(tsCol).as("_ts"))
      prev.join(nxt, Seq("uid"))
        .filter(col("_ts") > col("t") &&
          col("_ts") <= col("t") + expr(s"INTERVAL $withinSecs SECONDS"))
        .groupBy("uid").agg(min(col("_ts")).as("t"))
    }
  }

  /** Time-to-convert for users completing the WHOLE funnel: entry time
    * of the first stage minus entry time of the last, in exact
    * microseconds (BIGINT — no float time math). One row per converting
    * user; the downstream percentile/histogram of choice runs on this
    * frame. Same cascade, so the funnel count invariants carry over. */
  def conversionLags(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, stages: Seq[String], withinSecs: Long): DataFrame = {
    val survivors = funnelSurvivors(events, userCol, typeCol, tsCol,
      stages, withinSecs)
    val start = survivors.head.select(col("uid"), col("t").as("_t0"))
    val end = survivors.last.select(col("uid"), col("t").as("_tn"))
    end.join(start, Seq("uid"))
      .select(col("uid").as("user_id"),
        (unix_micros(col("_tn")) - unix_micros(col("_t0"))).as("lag_usec"))
  }

  /** Per-stage rollup of a (uid, stage_idx) reached frame — shared by
    * the batch cascade above and the streaming state-machine twin
    * (st_funnel_stream), so both emit the identical serving shape.
    * Conversion vs the previous stage goes through a shifted self-join:
    * the frame is |stages| rows, and a lag() here would be a
    * partition-less window, banned repo-wide even when harmless. */
  def funnelRollup(reached: DataFrame, stages: Seq[String]): DataFrame = {
    val spark = reached.sparkSession
    import spark.implicits._
    val stageFrame = stages.zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("stage_idx", "stage")
    val counts = stageFrame.join(
        reached.groupBy("stage_idx").agg(count(lit(1)).as("_n")),
        Seq("stage_idx"), "left")
      .withColumn("n_users", coalesce(col("_n"), lit(0L)))
    val prev = counts.select(col("stage_idx") + 1 as "stage_idx",
      col("n_users").as("_prev"))
    counts.join(prev, Seq("stage_idx"), "left")
      .withColumn("conv_from_prev",
        when(col("_prev").isNull, 1.0).otherwise(
          floor(col("n_users").cast("double") / col("_prev") * 10000.0)
            / 10000.0))
      .select("stage_idx", "stage", "n_users", "conv_from_prev")
  }

  case class FunnelEv(event_id: Long, user_id: Long, usec: Long, et: String)

  /** The streaming twin's per-user state machine (flatMapGroupsWithState
    * body): state = entry time (usec) of each stage reached so far; an
    * event advances the user iff it is the next stage's type, strictly
    * after the previous entry, and within the per-step deadline. Folding
    * in event-time order makes "first qualifying event" ≡ the batch
    * cascade's min-per-window join, so both paths share a10's oracle.
    * State continues across micro-batches (a stage entered in batch N
    * accepts qualifying events in batch N+1 — spec-pinned). */
  def funnelAdvance(stages: IndexedSeq[String], withinUs: Long)(
      user: Long, rows: Iterator[FunnelEv],
      state: GroupState[Seq[Long]]): Iterator[(Long, Long)] = {
    var entries = state.getOption.getOrElse(Seq.empty)
    val out = Seq.newBuilder[(Long, Long)]
    rows.toSeq.sortBy(e => (e.usec, e.event_id)).foreach { e =>
      val next = entries.size
      if (next < stages.size && e.et == stages(next) &&
          (next == 0 ||
            (e.usec > entries(next - 1) &&
             e.usec <= entries(next - 1) + withinUs))) {
        entries = entries :+ e.usec
        out += ((user, next.toLong))
      }
    }
    state.update(entries)
    out.result().iterator
  }

  /** Daily cohort retention: users are cohorted by their first activity
    * date; each (cohort_day, day_offset) cell counts the cohort's users
    * active that day, with retention relative to the cohort's size.
    * Two keyed shuffles (user_id, then the cohort×offset cell grid —
    * bounded by days², not by events). `retention` is one IEEE division
    * of two exact integers, 4-dp floor-truncated. */
  def retentionCohorts(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val d = events.select(col(userCol).as("uid"),
      to_date(col(tsCol)).as("day"))
    val cohort = d.groupBy("uid").agg(min(col("day")).as("cohort_day"))
    retentionRollup(d.distinct().join(cohort, Seq("uid")))
  }

  /** Cohort-grid rollup of a per-visit frame (`uid`, `cohort_day` DATE,
    * `day` DATE; one row per user per active day) — shared by the batch
    * path above and the streaming state-machine twin
    * (st_retention_stream). Cohort sizes fall out of the frame itself:
    * every user visits on their own cohort day exactly once. */
  def retentionRollup(perVisit: DataFrame): DataFrame = {
    val active = perVisit
      .groupBy("cohort_day", "day")
      .agg(count(lit(1)).as("n_users"))
      .withColumn("day_offset", datediff(col("day"), col("cohort_day")).cast("long"))
    val sizes = perVisit.filter(col("day") === col("cohort_day"))
      .groupBy("cohort_day").agg(count(lit(1)).as("_size"))
    active.join(sizes, Seq("cohort_day"))
      .withColumn("retention",
        floor(col("n_users").cast("double") / col("_size") * 10000.0) / 10000.0)
      .select(date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"),
        col("day_offset"), col("n_users"), col("retention"))
  }

  /** Session path analysis — the "which journeys happen" ADS query:
    * sessionize each user's events with an inactivity gap
    * (gaps-and-islands: lag + running sum, both over user-partitioned
    * windows — never a global sort), then count the event-type sequences
    * and keep the top `k` (ordered by frequency, path tie-break, so the
    * cut is deterministic). The per-session sequence is assembled with
    * `array_sort(collect_list(struct(...)))` — collect_list order is
    * partition-dependent, the struct sort by (time, event id) makes it
    * exact. Top-k goes through orderBy+limit (TakeOrdered — a bounded
    * heap per partition, not a full global sort). */
  def sessionPaths(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, idCol: String, gapMinutes: Long, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gapUs = gapMinutes * 60L * 1000000L
    val w = Window.partitionBy("uid").orderBy("usec", "eid")
    val sessions = events
      .select(col(userCol).as("uid"), unix_micros(col(tsCol)).as("usec"),
        col(idCol).as("eid"), col(typeCol).as("et"))
      .withColumn("_prev", lag(col("usec"), 1).over(w))
      .withColumn("_ns",
        when(col("_prev").isNull || col("usec") - col("_prev") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("_sid", sum(col("_ns")).over(w))
    sessions.groupBy("uid", "_sid")
      .agg(expr(
        "concat_ws('>', transform(array_sort(collect_list(struct(usec, eid, et))), s -> s.et))")
        .as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(k)
  }

  case class VisitEv(user_id: Long, epochDay: Long)

  /** The retention streaming twin's per-user state machine: state =
    * (cohort epoch-day, set of emitted days); the first-ever event fixes
    * the cohort, each unseen day emits one (uid, cohort, day) row and
    * is never re-emitted. Same single-source ordering caveat as the
    * first-visit dedup state machine (st_uv_dedup_stream): a later
    * micro-batch carrying a day EARLIER than the fixed cohort would
    * mis-cohort that user — the file source delivers event-time order,
    * and the cross-batch spec pins the continuation behavior. */
  def retentionAdvance(user: Long, rows: Iterator[VisitEv],
      state: GroupState[(Long, Set[Long])]): Iterator[(Long, Long, Long)] = {
    var (cohort, seen) = state.getOption.getOrElse((Long.MaxValue, Set.empty[Long]))
    val out = Seq.newBuilder[(Long, Long, Long)]
    rows.toSeq.sortBy(_.epochDay).foreach { e =>
      if (seen.isEmpty) cohort = e.epochDay
      if (!seen(e.epochDay)) {
        seen += e.epochDay
        out += ((user, cohort, e.epochDay))
      }
    }
    state.update((cohort, seen))
    out.result().iterator
  }
}
