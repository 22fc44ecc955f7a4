package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The rolling-hash winnowing variant's contract: the SIGMOD'03
  * guarantee (any shared run of ≥ w+k−1 chars shares a fingerprint) is a
  * property of windowed minima, independent of which uniform hash orders
  * the k-grams — so it must hold for the Karp-Rabin roll exactly as the
  * md5 form's oracle proves it there. Plus determinism, windowing-edge
  * parity with the md5 variant (tiny docs), and the density band the
  * x_winnow_rolling_bounds gate enforces corpus-wide. */
class WinnowRollingSpec extends SparkTestBase {
  import spark.implicits._

  private val k = 16; private val w = 4

  private def fps(rows: Seq[(Long, String)]): Map[Long, Set[Long]] =
    graft.ext.TextAnalysis
      .winnowFingerprintsRolling(rows.toDF("doc_id", "text"),
        "text", "doc_id", k, w)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (id, xs) => (id, xs.map(_._2).toSet) }

  test("guarantee: any shared run of >= w+k-1 chars shares a fingerprint") {
    val rnd = new scala.util.Random(13)
    def randText(n: Int) =
      Seq.fill(n)(('a' + rnd.nextInt(26)).toChar).mkString
    for (trial <- 1 to 30) {
      val shared = randText(k + w - 1 + rnd.nextInt(30))
      val a = randText(rnd.nextInt(40)) + shared + randText(rnd.nextInt(40))
      val b = randText(rnd.nextInt(40)) + shared + randText(rnd.nextInt(40))
      val m = fps(Seq((1L, a), (2L, b)))
      assert((m(1L) & m(2L)).nonEmpty,
        s"trial $trial: shared ${shared.length}-char run, no shared fp")
    }
  }

  test("deterministic across evaluations and unaffected by co-rows") {
    val t = "the quick brown fox jumps over the lazy dog again and again"
    val solo = fps(Seq((1L, t)))(1L)
    val paired = fps(Seq((1L, t), (2L, "completely different content here")))(1L)
    assert(solo == paired && solo.nonEmpty)
  }

  test("tiny-doc windowing edges match the md5 variant's shape") {
    // shorter than k: one clipped gram -> exactly one fp; shorter than
    // w grams: one clipped window -> exactly one fp
    val m = fps(Seq((1L, "short"), (2L, "a" * (k + 1))))
    assert(m(1L).size == 1 && m(2L).size == 1)
  }

  test("density stays inside the x_winnow_rolling_bounds band vs md5") {
    val rnd = new scala.util.Random(29)
    val docs = Seq.tabulate(50)(i =>
      (i.toLong, Seq.fill(40 + rnd.nextInt(120))(
        ('a' + rnd.nextInt(26)).toChar).mkString)).toDF("doc_id", "text")
    val m = graft.ext.TextAnalysis
      .winnowFingerprints(docs, "text", "doc_id", k, w)
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
    val r = graft.ext.TextAnalysis
      .winnowFingerprintsRolling(docs, "text", "doc_id", k, w)
      .groupBy("doc_id").agg(count(lit(1)).as("nr"))
    val bad = m.join(r, Seq("doc_id"))
      .filter(col("nr") * 2 < col("n") || col("nr") > col("n") * 2)
      .count()
    assert(bad == 0L)
  }
}
