package graft.functions

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the bounded-aggregate cores. These exercise
  * the Aggregator algebra directly (zero/reduce/merge/finish) — the same
  * calls Spark's TypedImperativeAggregate path makes — so partial
  * aggregation correctness is pinned independently of any plan shape:
  * however Catalyst splits the input across partitions, the merged result
  * must equal the global sort's answer. */
object TopKPropSpec extends Properties("TopKAgg/BoundedDistinctAgg") {

  private val genScored: Gen[List[Scored]] = Gen.listOf(for {
    score <- Gen.chooseNum(-1.0, 1.0)
    id <- Gen.chooseNum(0L, 50L) // small id space → score ties occur
  } yield Scored(score, id))

  private def reference(xs: List[Scored], k: Int): Seq[Scored] =
    xs.sortBy(s => (-s.score, s.id)).take(k)

  private def runSplit(agg: TopKAgg, xs: List[Scored], cut: Int): Seq[Scored] = {
    val (l, r) = xs.splitAt(cut)
    val bl = l.foldLeft(agg.zero)(agg.reduce)
    val br = r.foldLeft(agg.zero)(agg.reduce)
    agg.finish(agg.merge(bl, br)).items
  }

  property("any partition split merges to the global top-k") =
    Prop.forAll(genScored, Gen.chooseNum(1, 8), Gen.chooseNum(0, 100)) {
      (xs, k, cutSeed) =>
        val agg = new TopKAgg(k)
        val cut = if (xs.isEmpty) 0 else cutSeed % (xs.size + 1)
        runSplit(agg, xs, cut) == reference(xs, k)
    }

  property("merge is commutative") =
    Prop.forAll(genScored, genScored, Gen.chooseNum(1, 8)) { (a, b, k) =>
      val agg = new TopKAgg(k)
      val ba = a.foldLeft(agg.zero)(agg.reduce)
      val bb = b.foldLeft(agg.zero)(agg.reduce)
      agg.merge(ba, bb) == agg.merge(bb, ba)
    }

  property("NaN scores never rank and never perturb the result, any split") =
    Prop.forAll(genScored, Gen.chooseNum(1, 8), Gen.chooseNum(0, 100),
        Gen.chooseNum(0, 100)) { (xs, k, nanSeed, cutSeed) =>
      // inject NaN candidates at an arbitrary position: the result must
      // equal running the clean input alone, for any partition split —
      // i.e. NaN handling is layout-independent (the round-3 ADVICE bug
      // let a NaN at the head of a non-full buffer survive merge-order-
      // dependently)
      val at = if (xs.isEmpty) 0 else nanSeed % (xs.size + 1)
      val (l, r) = xs.splitAt(at)
      val dirty = l ++ List(Scored(Double.NaN, 1L), Scored(Double.NaN, 99L)) ++ r
      val agg = new TopKAgg(k)
      val cut = cutSeed % (dirty.size + 1)
      runSplit(agg, dirty, cut) == reference(xs, k)
    }

  property("buffer never exceeds k regardless of input size") =
    Prop.forAll(genScored, Gen.chooseNum(1, 4)) { (xs, k) =>
      val agg = new TopKAgg(k)
      xs.scanLeft(agg.zero)(agg.reduce).forall(_.items.size <= k)
    }

  property("bounded distinct counts exactly like a Set, nulls skipped") =
    Prop.forAll(Gen.listOf(Gen.oneOf(Gen.const(null: String),
        Gen.chooseNum(0, 30).map(_.toString))), Gen.chooseNum(0, 100)) {
      (xs, cutSeed) =>
        val agg = new BoundedDistinctAgg(1000)
        val cut = if (xs.isEmpty) 0 else cutSeed % (xs.size + 1)
        val (l, r) = xs.splitAt(cut)
        val merged = agg.merge(
          l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
        agg.finish(merged) == xs.filter(_ != null).toSet.size
    }

  property("bounded distinct fails loudly past the cap") =
    Prop.forAll(Gen.chooseNum(1, 10)) { cap =>
      val agg = new BoundedDistinctAgg(cap)
      val ok = (1 to cap).map(_.toString).foldLeft(agg.zero)(agg.reduce)
      Prop.throws(classOf[IllegalStateException]) {
        agg.reduce(ok, (cap + 1).toString)
      }
    }
}
