package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** k-center greedy: known-solution geometry, the maximin invariants the
  * oracle can't see (they hold for ANY correct greedy, so the spec pins
  * them structurally), and the k>n exhaustion path. */
class KcenterSpec extends SparkTestBase {
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Float])*) =
    rows.toSeq.toDF("vec_id", "embedding")

  test("farthest-point traversal on a line picks the known extremes") {
    // points at 0, 1, 10, 11 (1-d): seed = min id (0.0); the farthest
    // point is 11, then 10's min-dist (1² = scale²) ties 1's — min id 1
    // wins the tie-break
    val e = vecs(1L -> Seq(0f), 2L -> Seq(1f), 3L -> Seq(10f), 4L -> Seq(11f))
    val got = Similarity.kcenterSelect(e, "vec_id", "embedding", k = 3)
      .orderBy("sel_rank")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))
    // scale=1000: dist(0,11) = 11000² = 121e6; round 3: point 2 (dist 1e6
    // to seed) vs point 3 (dist 1e6 to 11) — tie, min id 2 wins
    assert(got.toSeq == Seq(
      (1L, 1L, -1L),
      (2L, 4L, 121000000L),
      (3L, 2L, 1000000L)))
  }

  test("maximin audit trail: mind non-increasing, ids distinct") {
    val e = (1L to 40L).map(i =>
      (i, Seq.tabulate(4)(d => ((i * 7 + d * 3) % 11).toFloat / 11f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.kcenterSelect(e, "vec_id", "embedding", k = 6)
      .orderBy("sel_rank").collect()
    assert(got.length == 6)
    assert(got.map(_.getLong(1)).distinct.length == 6, "duplicate pick")
    val minds = got.drop(1).map(_.getLong(2))
    assert(minds.zip(minds.drop(1)).forall { case (a, b) => b <= a },
      s"maximin sequence must be non-increasing: ${minds.mkString(",")}")
  }

  test("batched over-selection is BIT-identical to sequential greedy") {
    // small coordinate domain → heavy mind ties, the case where the
    // bound check must STOP a round rather than accept a tied in-batch
    // candidate (an out-of-batch point could share the value with a
    // smaller id); three corpora, k chosen to not divide the batch
    for (seed <- Seq(0, 5, 11)) {
      val pts = (1L to 120L).map(i =>
        (i, Seq.tabulate(3)(d => ((i * 13 + d * 5 + seed) % 7).toFloat)))
      val e = pts.toDF("vec_id", "embedding")
      def run(b: Int) = Similarity
        .kcenterSelect(e, "vec_id", "embedding", k = 17, batch = b)
        .orderBy("sel_rank").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq
      val sequential = run(1)
      for (b <- Seq(4, 6, 32))
        assert(run(b) == sequential,
          s"batch=$b diverged from sequential greedy (seed $seed)")
    }
  }

  test("k past the corpus size stops at n picks") {
    val e = vecs(1L -> Seq(0f, 1f), 2L -> Seq(1f, 0f))
    val got = Similarity.kcenterSelect(e, "vec_id", "embedding", k = 5)
      .collect()
    assert(got.length == 2)
  }

  test("assignment: centers self-assign at 0; dist is the true min; " +
      "objective ≤ the last pick's maximin") {
    val pts = (1L to 30L).map { i =>
      (i, Seq.tabulate(4)(d => (((i * 11 + d * 7) % 19) - 9).toFloat / 9f))
    }
    val e = pts.toDF("vec_id", "embedding")
    val q = pts.map { case (id, v) =>
      id -> v.map(x => math.floor(x.toDouble * 1000.0).toLong)
    }.toMap
    def d2(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val picks = Similarity.kcenterSelect(e, "vec_id", "embedding", k = 4)
      .orderBy("sel_rank").collect()
    val ids = picks.map(_.getLong(1)).toSeq
    val lastMaximin = picks.last.getLong(2)
    val centers = ids.map(id => id -> q(id))
    val got = Similarity.kcenterAssign(e, "vec_id", "embedding", centers)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == pts.size, "assignment dropped or duplicated rows")
    got.foreach { case (vid, cid, dist) =>
      val expect = centers.map { case (id, cv) => (d2(q(vid), cv), id) }.min
      assert((dist, cid) == expect, s"vec $vid: got ($dist,$cid) want $expect")
      if (ids.contains(vid)) assert(dist == 0L && cid == vid,
        s"center $vid must self-assign at 0, got ($cid, $dist)")
    }
    // the greedy's invariant ACROSS the two queries: after the k-th pick
    // joins the set, no vector is farther than that pick was when chosen
    assert(got.map(_._3).max <= lastMaximin,
      s"objective ${got.map(_._3).max} exceeds last maximin $lastMaximin")
  }

  test("selection equals the quadratic reference greedy on a random set") {
    val pts = (1L to 25L).map { i =>
      (i, Seq.tabulate(3)(d => (((i * 13 + d * 5) % 17) - 8).toFloat / 8f))
    }
    val e = pts.toDF("vec_id", "embedding")
    // literal reference: quantize, then greedy with (maxdist, min id)
    val q = pts.map { case (id, v) =>
      id -> v.map(x => math.floor(x.toDouble * 1000.0).toLong)
    }.toMap
    def d2(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    var chosen = Vector(q.keys.min)
    while (chosen.size < 5) {
      val best = q.keys.filterNot(chosen.contains).toSeq
        .map(id => (id, chosen.map(c => d2(q(id), q(c))).min))
        .minBy { case (id, md) => (-md, id) }
      chosen :+= best._1
    }
    val got = Similarity.kcenterSelect(e, "vec_id", "embedding", k = 5)
      .orderBy("sel_rank").collect().map(_.getLong(1)).toVector
    assert(got == chosen, s"greedy diverged: got $got want $chosen")
  }
}
