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
  *   - quantifiers on the last appended stage — `.times(n)`,
  *     `.times(min, max)`, `.oneOrMore` — with Flink's DEFAULT internal
  *     contiguity (relaxed between loop elements), or strict via
  *     `.consecutive`. Entry contiguity stays whatever next/followedBy set.
  *     Like Flink's NFA, a looping stage BRANCHES: on each event a run
  *     may extend the loop AND/OR hand the event to the following stage,
  *     so `a.oneOrMore` over a₁a₂ emits [a₁], [a₁a₂], [a₂] (NO_SKIP);
  *   - `.within(window)`: the whole match must complete STRICTLY inside
  *     `window` of its first event — at exactly +window the timeout fires
  *     first (the convention the reference's bounce pattern pins down,
  *     UserJumpDetailApp.java:89, same as Bounce.advance);
  *   - after-match semantics: a new partial match starts at EVERY event
  *     matching the first stage (Flink's default NO_SKIP), so runs are
  *     independent and may share events. `Matcher.advance(skipPastLast =
  *     true)` opts into SKIP_PAST_LAST_EVENT: a completed match discards
  *     every run that started at or before its last event;
  *   - timed-out partial matches are returned separately (the
  *     PatternTimeoutFunction side-output analog) — the bounce pattern's
  *     "no follow-up ⇒ still a bounce" branch. A final-stage looping run
  *     that already emitted (count ≥ min) expires SILENTLY: it is a
  *     completed match that merely could have grown, not a failure.
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
    strict: Boolean, minTimes: Int = 1, maxTimes: Int = 1,
    loopStrict: Boolean = false)
    extends Serializable {
  require(minTimes >= 1, "minTimes must be ≥ 1 (optional stages not supported)")
  require(maxTimes >= minTimes, "maxTimes must be ≥ minTimes")
  /** Can a run holding `count` loop elements of this stage accept more? */
  def canLoop(count: Int): Boolean = count < maxTimes
}

/** An open partial match: events matched so far, the stage being filled,
  * how many loop elements of that stage are held, whether the LAST event
  * was consumed by this run (`contiguous` — gates advancing into a
  * strict next stage), and whether the stage's loop has been declared
  * over (`closed` — the NFA "stop" branch: spawned when a run declines a
  * matching loop event to wait for the next stage instead, so `times(1,2)`
  * over a₁a₂b emits [a₁b] alongside [a₁a₂b]). `startTs` anchors the
  * within-window. */
final case class Run[E](startTs: Long, matched: Vector[E], awaiting: Int,
    count: Int, contiguous: Boolean, closed: Boolean = false)

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

  /** Quantify the LAST appended stage to exactly `n` occurrences
    * (Flink `times(n)`; internal contiguity relaxed, Flink's default). */
  def times(n: Int): Pattern[E] = times(n, n)

  /** Quantify the LAST appended stage to `min`..`max` occurrences
    * (Flink `times(min, max)`). */
  def times(min: Int, max: Int): Pattern[E] =
    copy(stages = stages.init :+
      stages.last.copy(minTimes = min, maxTimes = max))

  /** Quantify the LAST appended stage to one-or-more occurrences
    * (Flink `oneOrMore`; unbounded, internal contiguity relaxed). */
  def oneOrMore: Pattern[E] = times(1, Int.MaxValue)

  /** Make the LAST stage's loop STRICT internally (Flink `consecutive()`):
    * loop elements must be adjacent — any intervening event breaks the
    * loop (the run may still advance to a relaxed next stage if its
    * count already satisfies the quantifier, but never grows again). */
  def consecutive: Pattern[E] =
    copy(stages = stages.init :+ stages.last.copy(loopStrict = true))

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
    * after a fold step. Matches are event vectors in match order (a
    * quantified stage contributes `count` consecutive entries); emission
    * order is event-time order of completion / timeout within the step. */
  final case class Result[E](matches: Seq[Vector[E]],
      timeouts: Seq[Vector[E]], active: List[Run[E]])

  /** A final-stage run that has emitted (count ≥ min of the last stage)
    * is a completed match still hoping to grow — never a timeout. */
  private def isSatisfiedFinal[E](pat: Pattern[E], r: Run[E]): Boolean =
    r.awaiting == pat.stages.size - 1 &&
      r.count >= pat.stages(r.awaiting).minTimes

  /** Fold one key's time-sorted events (ts, event) over the open runs.
    * Per event: (1) runs whose window has expired (ts − start ≥ window)
    * time out FIRST, (2) surviving runs advance — each run may branch
    * into a loop-extension and/or a next-stage hand-off (quantifiers);
    * a run that can neither loop nor ever advance dies silently (the
    * strict-contiguity kill), (3) a new run starts if the event matches
    * stage 0 (NO_SKIP; suppressed under `skipPastLast` for runs
    * overlapping a match completed at this event). Events must arrive in
    * non-decreasing (ts, tiebreak) order — the caller's sort defines
    * "immediately following" for strict stages. */
  def advance[E](pat: Pattern[E], active0: List[Run[E]],
      events: IterableOnce[(Long, E)],
      skipPastLast: Boolean = false): Result[E] = {
    val matches = scala.collection.mutable.ArrayBuffer.empty[Vector[E]]
    val timeouts = scala.collection.mutable.ArrayBuffer.empty[Vector[E]]
    val last = pat.stages.size - 1
    var active = active0
    events.iterator.foreach { case (ts, e) =>
      // (1) expire: timeout fires first at exactly start + window;
      // satisfied final-stage loopers leave silently (already emitted)
      val (expired, live) = active.partition(r => ts - r.startTs >= pat.window)
      expired.foreach(r =>
        if (!isSatisfiedFinal(pat, r)) timeouts += r.matched)
      var completedHere = false
      // (2) advance the live runs; each may branch into ≤ 3 successors
      // (loop-extend, loop-close-and-wait, next-stage hand-off). Under
      // skipPastLast, the first completion suppresses every later run in
      // start order — Flink's SKIP_PAST_LAST_EVENT prunes all partial
      // matches overlapping the emitted one, including same-event
      // shorter completions (docs example: a+ b over a₁a₂a₃b emits only
      // the a₁-rooted match).
      active = live.flatMap { r =>
        if (skipPastLast && completedHere) Nil
        else {
        val st = pat.stages(r.awaiting)
        val branches = List.newBuilder[Run[E]]
        var consumed = false
        // branch A: extend the current stage's loop; if the loop was
        // already satisfied, ALSO spawn the "stop" branch that declines
        // this event and waits for a (relaxed) next stage — the NFA
        // split that makes every loop length in [min, max] reachable.
        // A `consecutive()` loop additionally requires adjacency: only a
        // run that consumed the PREVIOUS event may extend.
        if (!r.closed && st.canLoop(r.count) && st.pred(e) &&
            (!st.loopStrict || r.count == 0 || r.contiguous)) {
          consumed = true
          val m = r.matched :+ e
          val c2 = r.count + 1
          if (r.awaiting == last && c2 >= st.minTimes) {
            matches += m; completedHere = true
            // keep looping only while the quantifier allows growth
            if (st.canLoop(c2)) branches += Run(r.startTs, m, last, c2, true)
          } else branches += Run(r.startTs, m, r.awaiting, c2, true)
          if (r.count >= st.minTimes && r.awaiting < last &&
              !pat.stages(r.awaiting + 1).strict)
            branches += r.copy(contiguous = false, closed = true)
        }
        // branch B: hand the event to the NEXT stage (the loop is
        // satisfied); a strict next stage additionally requires that
        // THIS run consumed the previous event (no gap)
        if (r.awaiting < last && r.count >= pat.stages(r.awaiting).minTimes) {
          val nxt = pat.stages(r.awaiting + 1)
          if (nxt.pred(e) && (!nxt.strict || r.contiguous)) {
            consumed = true
            val m = r.matched :+ e
            if (r.awaiting + 1 == last && 1 >= nxt.minTimes) {
              matches += m; completedHere = true
              if (nxt.canLoop(1))
                branches += Run(r.startTs, m, last, 1, true)
            } else branches += Run(r.startTs, m, r.awaiting + 1, 1, true)
          }
        }
        if (!consumed) {
          // survival: the run can still loop later (relaxed internal
          // contiguity) or still reach a RELAXED next stage. A run that
          // can do neither — e.g. a filled stage awaiting a strict next
          // — dies silently, the classic strict-contiguity kill (no
          // timeout: it failed, it didn't expire).
          // (runs always hold ≥ 1 element of their stage — entry into
          // stage L+1 is branch B's job, gated by `contiguous` when
          // strict, so only loop/advance survivability matters here)
          // a consecutive() loop is broken for good by this gap — the run
          // survives only if it can still reach a relaxed next stage
          val canLoopLater = !r.closed && st.canLoop(r.count) &&
            !(st.loopStrict && r.count > 0)
          val canAdvanceLater = r.awaiting < last &&
            r.count >= st.minTimes && !pat.stages(r.awaiting + 1).strict
          if (canLoopLater || canAdvanceLater)
            branches += r.copy(contiguous = false)
        }
        branches.result()
        }
      }
      // (3) NO_SKIP: every stage-0 match opens an independent run.
      // APPENDED, not prepended: the active list stays in run-start order,
      // so runs completing or timing out at the same event emit oldest-
      // run-first — the documented within-event tiebreak. Runs open at
      // once are bounded by the within-window, so the append is cheap.
      val s0 = pat.stages.head
      if (s0.pred(e) && !(skipPastLast && completedHere)) {
        if (last == 0 && 1 >= s0.minTimes) {
          matches += Vector(e); completedHere = true
          if (s0.canLoop(1)) active = active :+ Run(ts, Vector(e), 0, 1, true)
        } else active = active :+ Run(ts, Vector(e), 0, 1, true)
      }
      // AFTER_MATCH SKIP_PAST_LAST_EVENT: a completed match discards
      // every run open at its completion event (they all started at or
      // before it — runs are start-ordered and bounded by the window)
      if (skipPastLast && completedHere) active = Nil
    }
    Result(matches.toSeq, timeouts.toSeq, active)
  }

  /** Expire every run that `watermark` has passed (streaming timeout
    * firing); pass Long.MaxValue to flush everything (end of a batch).
    * Satisfied final-stage loopers (already-emitted matches) are dropped
    * silently, same as in [[advance]]. */
  def flush[E](pat: Pattern[E], active: List[Run[E]],
      watermark: Long): (Seq[Vector[E]], List[Run[E]]) = {
    val (expired, live) =
      if (watermark == Long.MaxValue) (active, Nil)
      else active.partition(r => watermark - r.startTs >= pat.window)
    (expired.filterNot(isSatisfiedFinal(pat, _)).map(_.matched), live)
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
