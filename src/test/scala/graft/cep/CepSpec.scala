package graft.cep

import graft.streaming.dwm.Bounce
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the generic CEP matcher (graft.cep).
  *
  * The anchor property replays random event streams through the bounce
  * pattern — `begin(entry).next(entry).within(10s)`, the one pattern the
  * reference instantiates (RT/app/dwm/UserJumpDetailApp.java:77-89) — and
  * checks the generic [[Matcher]] emits exactly the events the
  * hand-written [[Bounce.advance]] emits, match and timeout branches
  * both. Pure — no Spark session; the batch wiring (c2_cep_generic) is
  * gated separately against c1_bounce_detect's DuckDB oracle.
  */
object CepSpec extends Properties("cep.Matcher") {

  private val W = Bounce.WindowMs

  /** The reference's bounce pattern, expressed in the generic API over
    * the same (ts, isEntry, payload) triples Bounce.advance folds. */
  private val bouncePat: Pattern[(Long, Boolean, String)] =
    Pattern.begin[(Long, Boolean, String)]("entry", _._2)
      .next("reentry", _._2).within(W)

  private val genEvents: Gen[Seq[(Long, Boolean, String)]] = for {
    n <- Gen.choose(0, 40)
    gaps <- Gen.listOfN(n, Gen.choose(1L, 2 * W))
    entries <- Gen.listOfN(n, Gen.prob(0.5))
  } yield {
    val ts = gaps.scanLeft(0L)(_ + _).tail
    ts.lazyZip(entries).zipWithIndex.map { case ((t, e), i) => (t, e, s"ev$i") }.toSeq
  }

  private def matcherBounces(evs: Seq[(Long, Boolean, String)]): Seq[String] = {
    val (matches, timeouts) =
      Matcher.foldAll(bouncePat, evs.map(e => (e._1, e)))
    (matches ++ timeouts).map(_.head._3)
  }

  property("bounce pattern reproduces Bounce.advance (match+timeout set)") =
    Prop.forAll(genEvents) { evs =>
      val (emitted, pending) = Bounce.advance(None, evs)
      // batch foldAll flushes the trailing pending as a timeout — the
      // "no follow-up ever arrives" branch — so compare against
      // emitted ++ pending
      val expected = emitted ++ pending.map(_.json)
      matcherBounces(evs).sorted == expected.sorted
    }

  property("match xor timeout: no event emitted twice") =
    Prop.forAll(genEvents) { evs =>
      val out = matcherBounces(evs)
      out.distinct.size == out.size
    }

  property("advance is split-associative (micro-batch boundaries move freely)") =
    Prop.forAll(genEvents, Gen.choose(0, 40)) { (evs, cutRaw) =>
      val cut = math.min(cutRaw, evs.size)
      val (a, b) = evs.splitAt(cut)
      val whole = Matcher.advance(bouncePat, Nil, evs.map(e => (e._1, e)))
      val r1 = Matcher.advance(bouncePat, Nil, a.map(e => (e._1, e)))
      val r2 = Matcher.advance(bouncePat, r1.active, b.map(e => (e._1, e)))
      (r1.matches ++ r2.matches) == whole.matches &&
        (r1.timeouts ++ r2.timeouts) == whole.timeouts &&
        r2.active == whole.active
    }

  property("a timeout fires FIRST at exactly +window (boundary convention)") =
    Prop.forAll(Gen.prob(0.5)) { followUpIsEntry =>
      val evs = Seq((0L, true, "first"), (W, followUpIsEntry, "boundary"))
      matcherBounces(evs).contains("first")
    }

  // Deterministic algebra cases for the surface Bounce does not exercise:

  property("followedBy skips non-matching events (relaxed contiguity)") = Prop {
    type E = (Long, String)
    val pat = Pattern.begin[E]("a", _._2 == "a").followedBy("b", _._2 == "b")
      .within(100L)
    val evs: Seq[E] = Seq((1L, "a"), (2L, "x"), (3L, "b"))
    val (matches, timeouts) = Matcher.foldAll(pat, evs.map(e => (e._1, e)))
    matches == Seq(Vector((1L, "a"), (3L, "b"))) && timeouts.isEmpty
  }

  property("next kills the run on a non-matching event (strict contiguity)") = Prop {
    type E = (Long, String)
    val pat = Pattern.begin[E]("a", _._2 == "a").next("b", _._2 == "b")
      .within(100L)
    val evs: Seq[E] = Seq((1L, "a"), (2L, "x"), (3L, "b"))
    val (matches, timeouts) = Matcher.foldAll(pat, evs.map(e => (e._1, e)))
    matches.isEmpty && timeouts.isEmpty
  }

  property("same-event completions emit in run-START order (NO_SKIP ties)") = Prop {
    type E = (Long, String)
    val pat = Pattern.begin[E]("a", _._2.startsWith("a"))
      .followedBy("b", _._2 == "b").within(1000L)
    val evs: Seq[E] = Seq((1L, "a1"), (2L, "a2"), (3L, "b"))
    val (matches, _) = Matcher.foldAll(pat, evs.map(e => (e._1, e)))
    matches.map(_.head._2) == Seq("a1", "a2")
  }

  property("same-event timeouts emit in run-START order") = Prop {
    type E = (Long, String)
    val pat = Pattern.begin[E]("a", _._2.startsWith("a"))
      .followedBy("b", _._2 == "b").within(5L)
    // two open runs, both expired by the event at t=20
    val evs: Seq[E] = Seq((1L, "a1"), (2L, "a2"), (20L, "x"))
    val r = Matcher.advance(pat, Nil, evs.map(e => (e._1, e)))
    r.timeouts.map(_.head._2) == Seq("a1", "a2") && r.active.isEmpty
  }

  property("flush with Long.MaxValue drains every open run as a timeout") =
    Prop.forAll(genEvents) { evs =>
      val r = Matcher.advance(bouncePat, Nil, evs.map(e => (e._1, e)))
      val (flushed, live) = Matcher.flush(bouncePat, r.active, Long.MaxValue)
      live.isEmpty && flushed == r.active.map(_.matched)
    }

  property("flush at a watermark expires exactly the out-of-window runs") =
    Prop.forAll(genEvents, Gen.choose(0L, 80 * W)) { (evs, wm) =>
      val r = Matcher.advance(bouncePat, Nil, evs.map(e => (e._1, e)))
      val (flushed, live) = Matcher.flush(bouncePat, r.active, wm)
      flushed.size + live.size == r.active.size &&
        live.forall(run => wm - run.startTs < W)
    }
}
