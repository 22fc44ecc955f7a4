package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Native VectorCosine expression: interpreted eval vs codegen vs the
  * zip_with+aggregate composition must agree bit-for-bit (same index-order
  * double accumulation). */
class VectorCosineSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val vecs = Seq(
    (1L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
    (2L, Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(0.5f, -0.5f, 0.25f), Array(-0.5f, 0.5f, 0.75f)))
    .toDF("id", "a", "b")

  private val zipWith =
    "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
      "CAST(0 AS DOUBLE), (acc, x) -> acc + x) / " +
      "(sqrt(aggregate(a, CAST(0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) * " +
      " sqrt(aggregate(b, CAST(0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"

  test("native expression equals the zip_with composition bit-for-bit") {
    VectorCosine.register(spark)
    val rows = vecs.select($"id",
      expr("vec_cosine(a, b)").as("native"),
      expr(zipWith).as("composed")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(2)), r.toString)
    }
  }

  test("interpreted eval matches codegen result") {
    VectorCosine.register(spark)
    // codegen path: through a projection; interpreted: direct eval
    val viaCodegen = vecs.filter($"id" === 1)
      .select(expr("vec_cosine(a, b)")).as[Double].head()
    val direct = VectorCosine(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1.0f, 2.0f, 3.0f)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(4.0f, 5.0f, 6.0f))).eval(null).asInstanceOf[Double]
    assert(java.lang.Double.doubleToLongBits(viaCodegen) ==
      java.lang.Double.doubleToLongBits(direct))
    // known value: 32 / (sqrt(14)*sqrt(77))
    assert(math.abs(direct - 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))) < 1e-12)
  }

  test("orthogonal vectors score 0, nulls propagate") {
    VectorCosine.register(spark)
    assert(vecs.filter($"id" === 2)
      .select(expr("vec_cosine(a, b)")).as[Double].head() == 0.0)
    val n = vecs.select(expr("vec_cosine(a, NULL)").as("c")).select("c")
    assert(n.filter(col("c").isNull).count() == 3)
  }
}
