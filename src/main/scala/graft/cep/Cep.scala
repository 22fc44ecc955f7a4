package graft.cep

/** A small composable CEP (complex-event-processing) surface.
  *
  * The reference links flink-cep (gmall-realtime/pom.xml:48-52) but
  * instantiates exactly ONE pattern — the bounce detector
  * (RT/app/dwm/UserJumpDetailApp.java:77-89: begin(entry) NEXT entry
  * WITHIN 10s, with a timeout side output). graft.streaming.dwm.Bounce
  * implements that pattern directly; this package is the reusable API a
  * user adding a SECOND pattern needs, covering the Flink-CEP subset the
  * reference's dependency provides (public semantics, Flink CEP docs):
  *
  *   - `Pattern.begin(name, pred)` then `.next(...)` (STRICT contiguity:
  *     the immediately following event must match or the partial match
  *     dies) or `.followedBy(...)` (RELAXED contiguity: non-matching
  *     events are skipped; the FIRST matching event advances the match);
  *   - `.within(window)`: the whole match must complete STRICTLY inside
  *     `window` of its first event — at exactly +window the timeout fires
  *     first (the convention the reference's bounce pattern pins down,
  *     UserJumpDetailApp.java:89, same as Bounce.advance);
  *   - after-match semantics: a new partial match starts at EVERY event
  *     matching the first stage (Flink's default NO_SKIP), so runs are
  *     independent and may share events;
  *   - timed-out partial matches are returned separately (the
  *     PatternTimeoutFunction side-output analog) — the bounce pattern's
  *     "no follow-up ⇒ still a bounce" branch.
  *
  * The matcher core ([[Matcher]]) is a pure fold over one key's
  * time-sorted events — no Spark types — so the algebra is unit- and
  * property-testable: CepSpec replays random event streams through the
  * bounce pattern and checks the emitted set against Bounce.advance,
  * plus split-associativity and match/timeout exclusivity. Within one
  * event, completions/timeouts emit in run-START order (the active list
  * is kept in start order). Batch execution runs the fold per key via
  * `groupByKey(...).flatMapSortedGroups(...)` (secondary sort in the
  * shuffle — no per-group driver collect, state bounded by the runs open
  * inside one window) — the registry query `c2_cep_generic` is that
  * wiring, sharing c1_bounce_detect's DuckDB oracle; streaming execution
  * can hold `Run`s in a flatMapGroupsWithState the same way Bounce does.
  */
final case class Stage[E](name: String, pred: E => Boolean,
    strict: Boolean) extends Serializable

/** An open partial match: events matched so far and the stage awaited.
  * `startTs` anchors the within-window. */
final case class Run[E](startTs: Long, matched: Vector[E], awaiting: Int)

final case class Pattern[E](stages: Vector[Stage[E]], window: Long)
    extends Serializable {
  require(stages.nonEmpty, "pattern needs at least one stage")
  require(window > 0, "within-window must be positive")

  /** Append a STRICT-contiguity stage (Flink `next`). */
  def next(name: String, pred: E => Boolean): Pattern[E] =
    Pattern(stages :+ Stage(name, pred, strict = true), window)

  /** Append a RELAXED-contiguity stage (Flink `followedBy`). */
  def followedBy(name: String, pred: E => Boolean): Pattern[E] =
    Pattern(stages :+ Stage(name, pred, strict = false), window)

  /** Set the within-window (same unit as the event timestamps fed to the
    * matcher — ms or µs, the algebra only subtracts). */
  def within(w: Long): Pattern[E] = copy(window = w)
}

object Pattern {
  /** Start a pattern. The window defaults to "unbounded" and is almost
    * always narrowed with `.within(...)`. */
  def begin[E](name: String, pred: E => Boolean): Pattern[E] =
    Pattern(Vector(Stage(name, pred, strict = false)), Long.MaxValue)
}

object Matcher {

  /** Completed matches, timed-out partial matches, and still-open runs
    * after a fold step. Matches are stage-aligned event vectors (index i
    * = stages(i)); emission order is event-time order of completion /
    * timeout within the step. */
  final case class Result[E](matches: Seq[Vector[E]],
      timeouts: Seq[Vector[E]], active: List[Run[E]])

  /** Fold one key's time-sorted events (ts, event) over the open runs.
    * Per event: (1) runs whose window has expired (ts − start ≥ window)
    * time out FIRST, (2) surviving runs advance — a strict stage kills
    * the run on a non-match, a relaxed stage skips it, (3) a new run
    * starts if the event matches stage 0. Events must arrive in
    * non-decreasing (ts, tiebreak) order — the caller's sort defines
    * "immediately following" for strict stages. */
  def advance[E](pat: Pattern[E], active0: List[Run[E]],
      events: IterableOnce[(Long, E)]): Result[E] = {
    val matches = scala.collection.mutable.ArrayBuffer.empty[Vector[E]]
    val timeouts = scala.collection.mutable.ArrayBuffer.empty[Vector[E]]
    var active = active0
    events.iterator.foreach { case (ts, e) =>
      // (1) expire: timeout fires first at exactly start + window
      val (expired, live) = active.partition(r => ts - r.startTs >= pat.window)
      expired.foreach(r => timeouts += r.matched)
      // (2) advance the live runs
      active = live.flatMap { r =>
        val st = pat.stages(r.awaiting)
        if (st.pred(e)) {
          val m = r.matched :+ e
          if (r.awaiting == pat.stages.size - 1) { matches += m; Nil }
          else List(Run(r.startTs, m, r.awaiting + 1))
        } else if (st.strict) Nil // strict contiguity broken
        else List(r)              // relaxed: skip this event
      }
      // (3) NO_SKIP: every stage-0 match opens an independent run.
      // APPENDED, not prepended: the active list stays in run-start order,
      // so runs completing or timing out at the same event emit oldest-
      // run-first — the documented within-event tiebreak. Runs open at
      // once are bounded by the within-window, so the append is cheap.
      if (pat.stages.head.pred(e)) {
        if (pat.stages.size == 1) matches += Vector(e)
        else active = active :+ Run(ts, Vector(e), 1)
      }
    }
    Result(matches.toSeq, timeouts.toSeq, active)
  }

  /** Expire every run that `watermark` has passed (streaming timeout
    * firing); pass Long.MaxValue to flush everything (end of a batch). */
  def flush[E](pat: Pattern[E], active: List[Run[E]],
      watermark: Long): (Seq[Vector[E]], List[Run[E]]) = {
    val (expired, live) =
      if (watermark == Long.MaxValue) (active, Nil)
      else active.partition(r => watermark - r.startTs >= pat.window)
    (expired.map(_.matched), live)
  }

  /** Batch entry point: fold a complete key history, then flush — every
    * still-open run becomes a timeout (in a bounded batch "no follow-up
    * ever arrives" IS the timeout branch, matching c1_bounce_detect's
    * `next_us IS NULL` arm). */
  def foldAll[E](pat: Pattern[E],
      events: IterableOnce[(Long, E)]): (Seq[Vector[E]], Seq[Vector[E]]) = {
    val r = advance(pat, Nil, events)
    val (late, _) = flush(pat, r.active, Long.MaxValue)
    (r.matches, r.timeouts ++ late)
  }
}
