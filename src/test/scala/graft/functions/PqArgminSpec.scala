package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Differential tests for the native quantizer-assignment expressions:
  * pq_argmin and kmeans_argmax must be BIT-IDENTICAL to the interpreted
  * `aggregate(transform(zip_with(...)))` pyramids they replaced in
  * graft.ext.Similarity (those pyramids are re-stated here verbatim as
  * the reference), including the tie-break (first strict optimum in
  * centroid order), NaN-score skipping, and float→double widening. */
class PqArgminSpec extends SparkTestBase {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)

  private def randVecs(n: Int, dim: Int): Seq[(Long, Seq[Float])] =
    Seq.tabulate(n)(i =>
      (i.toLong, Seq.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)))

  test("pq_argmin matches the interpreted per-subspace L2 argmin") {
    val m = 4; val ksub = 3; val dim = 16
    val dsub = dim / m
    // centroids including exact duplicates (tie-break exercise)
    val base = Seq.fill(ksub)(Seq.fill(dsub)(rnd.nextDouble() * 2 - 1))
    val cents: Seq[Seq[Seq[Double]]] =
      Seq.tabulate(m)(j => base.updated(ksub - 1, base.head)) // dup cell
    val ids: Seq[Seq[Int]] =
      Seq.tabulate(m)(j => List.tabulate(ksub)(j * ksub + _))
    val df = randVecs(50, dim).toDF("id", "e")

    val got = df.select(col("id"), PqArgmin.pqArgmin(spark, col("e"),
        typedLit(cents), typedLit(ids)).as("codes"))
      .as[(Long, Seq[Int])].collect().toMap

    val want = df
      .withColumn("_barr", typedLit(cents))
      .withColumn("_bcell", typedLit(ids))
      .selectExpr("id",
        s"""transform(sequence(0, ${m - 1}), j ->
           |  element_at(element_at(_bcell, j + 1),
           |    aggregate(
           |      transform(sequence(0, size(element_at(_barr, j + 1)) - 1),
           |        p -> named_struct(
           |          'd', aggregate(zip_with(
           |                 transform(slice(e, j * $dsub + 1, $dsub),
           |                   x -> CAST(x AS DOUBLE)),
           |                 element_at(element_at(_barr, j + 1), p + 1),
           |                 (x, y) -> (x - y) * (x - y)),
           |               CAST(0 AS DOUBLE), (a, v) -> a + v),
           |          'p', p)),
           |      named_struct('d', CAST('Infinity' AS DOUBLE), 'p', -1),
           |      (acc, s) -> CASE WHEN s.d < acc.d THEN s ELSE acc END).p + 1))
           |  AS codes""".stripMargin)
      .as[(Long, Seq[Int])].collect().toMap

    assert(got == want)
    // the duplicated centroid can never win a tie against its earlier twin
    assert(got.values.flatten.forall(c => c % ksub != ksub - 1))
  }

  test("kmeans_argmax matches the interpreted fold") {
    val dim = 8; val k = 4
    val cents: Seq[Seq[Double]] = Seq.fill(k)(
      Seq.fill(dim)(rnd.nextDouble() * 2 - 1))
    val ids = (0 until k).toList
    val norms = cents.map(c => math.sqrt(c.map(y => y * y).sum))
    val df = randVecs(50, dim).toDF("id", "e")

    val got = df.select(col("id"),
        PqArgmin.kmeansArgmax(spark, col("e"), typedLit(cents),
          typedLit(ids), typedLit(norms)).as("cl"))
      .as[(Long, Int)].collect().toMap

    val want = df
      .withColumn("_carr", typedLit(cents))
      .withColumn("_cid", typedLit(ids))
      .withColumn("_cnorm", typedLit(norms))
      .selectExpr("id",
        s"""aggregate(
           |  transform(sequence(0, ${k - 1}), p -> named_struct(
           |    's', aggregate(zip_with(e, element_at(_carr, p + 1),
           |           (x, y) -> CAST(x AS DOUBLE) * y),
           |         CAST(0 AS DOUBLE), (a, x) -> a + x)
           |         / element_at(_cnorm, p + 1),
           |    'cl', element_at(_cid, p + 1))),
           |  named_struct('s', CAST('-Infinity' AS DOUBLE), 'cl', -1),
           |  (acc, st) -> CASE WHEN NOT isnan(st.s) AND st.s > acc.s
           |               THEN st ELSE acc END).cl AS cl""".stripMargin)
      .as[(Long, Int)].collect().toMap

    assert(got == want)
  }

  test("kmeans_argmax skips NaN scores where the ANSI fold would throw") {
    // a zero centroid scores dot/|c| = 0/0 = NaN for every vector. The
    // documented rule ("NaN scores are skipped") is what this expression
    // implements; the interpreted CASE/aggregate fold it replaced raised
    // DIVIDE_BY_ZERO under Spark 4's default ANSI mode on this input —
    // a latent crash the native form removes (zero centroids cannot
    // arise from Lloyd updates, which only emit populated cells, but a
    // caller-supplied book could contain one).
    val cents = Seq(Seq(0.0, 0.0), Seq(1.0, 1.0))
    val norms = Seq(0.0, math.sqrt(2.0))
    val df = Seq((1L, Seq(1.0f, 2.0f))).toDF("id", "e")
    val got = df.select(PqArgmin.kmeansArgmax(spark, col("e"),
      typedLit(cents), typedLit(List(7, 8)), typedLit(norms)))
      .as[Int].head()
    assert(got == 8)
    // all scores NaN → -1 (the caller's cell-0 degenerate fallback input)
    val allNaN = df.select(PqArgmin.kmeansArgmax(spark, col("e"),
      typedLit(Seq(Seq(0.0, 0.0))), typedLit(List(7)), typedLit(Seq(0.0))))
      .as[Int].head()
    assert(allNaN == -1)
  }

  test("both accept array<double> input too") {
    val df = Seq((1L, Seq(1.0, 2.0, 3.0, 4.0))).toDF("id", "e")
    val cents = Seq(Seq(Seq(1.0, 2.0), Seq(9.0, 9.0)), Seq(Seq(3.0, 4.0)))
    val ids = Seq(Seq(0, 1), Seq(2))
    val codes = df.select(PqArgmin.pqArgmin(spark, col("e"),
      typedLit(cents), typedLit(ids))).as[Seq[Int]].head()
    assert(codes == Seq(0, 2))
    val cl = df.select(PqArgmin.kmeansArgmax(spark, col("e"),
      typedLit(Seq(Seq(1.0, 2.0, 3.0, 4.0))), typedLit(Seq(5)),
      typedLit(Seq(math.sqrt(30.0))))).as[Int].head()
    assert(cl == 5)
  }
}
