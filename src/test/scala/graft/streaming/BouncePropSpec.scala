package graft.streaming

import graft.streaming.dwm.Bounce
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the bounce CEP state algebra
  * (SURVEY §5: "CEP timeout vs. match exclusivity" checks). Pure — no
  * Spark session; the streaming operator delegates to Bounce.advance. */
object BouncePropSpec extends Properties("Bounce.advance") {

  private val W = Bounce.WindowMs

  private val genEvents: Gen[Seq[(Long, Boolean, String)]] = for {
    n <- Gen.choose(0, 40)
    gaps <- Gen.listOfN(n, Gen.choose(1L, 2 * W))
    entries <- Gen.listOfN(n, Gen.prob(0.5))
  } yield {
    val ts = gaps.scanLeft(0L)(_ + _).tail
    ts.lazyZip(entries).zipWithIndex.map { case ((t, e), i) => (t, e, s"ev$i") }.toSeq
  }

  property("each event emitted at most once (match xor timeout, never both)") =
    Prop.forAll(genEvents) { evs =>
      val (emitted, pending) = Bounce.advance(None, evs)
      val all = emitted ++ pending.map(_.json)
      all.distinct.size == all.size
    }

  property("only entry events can bounce; non-entries are never emitted") =
    Prop.forAll(genEvents) { evs =>
      val entryPayloads = evs.filter(_._2).map(_._3).toSet
      val (emitted, _) = Bounce.advance(None, evs)
      emitted.forall(entryPayloads.contains)
    }

  property("an entry directly followed within the window by an entry bounces") =
    Prop.forAll(genEvents) { evs =>
      val (emitted, _) = Bounce.advance(None, evs)
      val shouldBounce = evs.sliding(2).collect {
        case Seq((t1, true, p1), (t2, true, _)) if t2 - t1 < W => p1
      }.toSet
      shouldBounce.subsetOf(emitted.toSet)
    }

  property("an entry followed within the window by a non-entry never bounces") =
    Prop.forAll(genEvents) { evs =>
      val (emitted, pending) = Bounce.advance(None, evs)
      val browsedOn = evs.sliding(2).collect {
        case Seq((t1, true, p1), (t2, false, _)) if t2 - t1 < W => p1
      }.toSet
      browsedOn.intersect(emitted.toSet ++ pending.map(_.json)).isEmpty
    }

  // Boundary pinned to the reference CEP walkthrough
  // (RT/app/dwm/UserJumpDetailAppBak.java:27-43): within(10s) fires the
  // timeout FIRST at exactly +10s, so a follow-up landing exactly on the
  // boundary cannot kill the match — the pending entry bounces either way.
  property("a follow-up at exactly +window bounces the pending entry") =
    Prop.forAll(Gen.prob(0.5)) { followUpIsEntry =>
      val evs = Seq((0L, true, "entry"), (W, followUpIsEntry, "boundary"))
      val (emitted, _) = Bounce.advance(None, evs)
      emitted.contains("entry")
    }

  property("folding in two chunks equals folding at once (micro-batch split)") =
    Prop.forAll(genEvents, Gen.choose(0, 40)) { (evs, cut) =>
      val k = math.min(cut, evs.size)
      val (e1, p1) = Bounce.advance(None, evs.take(k))
      val (e2, p2) = Bounce.advance(p1, evs.drop(k))
      val (all, pAll) = Bounce.advance(None, evs)
      (e1 ++ e2) == all && p2 == pAll
    }
}
