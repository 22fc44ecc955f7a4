package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native Catalyst expression: per-subspace L2 argmin of a vector against
  * a small trained codebook, returning the matched centroid IDs — the hot
  * loop of every quantizer in [[graft.ext.Similarity]] (PQ training
  * assignment, PQ corpus encoding, and — as the m = 1 degenerate case —
  * k-means cell assignment).
  *
  * Why not the `transform(sequence(..), j -> aggregate(zip_with(..)))`
  * pyramid the quantizers previously inlined? Higher-order functions are
  * interpreted per lambda call: one assignment of a dim-64 vector against
  * an m=16 × ksub=16 book costs ~m·ksub·dsub boxed lambda invocations
  * plus per-comparison struct allocations — measured at ~1.4 s PER
  * TRAINING ROUND on just 2 000 vectors at sf0.1 (examples.PqProfile),
  * i.e. the Lloyd refinement rounds, not the data, dominated x_ann_pq.
  * This expression runs the identical arithmetic as one fused primitive
  * loop under whole-stage codegen.
  *
  * Bit-identical semantics to the HOF form, by construction:
  *   - distances accumulate in double, index-ascending (the zip_with +
  *     left-fold order);
  *   - float inputs are widened element-wise exactly where the SQL form
  *     CAST each element;
  *   - argmin keeps the FIRST strict minimum in centroid-list order (the
  *     `CASE WHEN s.d < acc.d` left-fold rule — ties go to the earlier,
  *     i.e. smaller, cell/code);
  *   - `dsub = size(e) / m` with integer division — trailing dims beyond
  *     m·dsub are ignored, as slice() ignored them.
  *
  * The codebook rides IN the expression (driver state, contract-bounded
  * at ≤ m·ksub centroids — the same bound the literal-book design already
  * collects), referenced from generated code via `addReferenceObj`, so
  * the plan carries no book-sized literal tree and analysis stays flat.
  */
case class PqArgminIds(child: Expression,
    cents: Array[Array[Array[Double]]], ids: Array[Array[Int]])
    extends UnaryExpression {
  require(cents.length == ids.length && cents.nonEmpty,
    "codebook and id table must align per subspace")
  require(cents.indices.forall(j => cents(j).length == ids(j).length &&
    cents(j).nonEmpty), "every subspace needs >= 1 surviving centroid")

  private val m = cents.length
  // inputs must be array<float> or array<double>; ExpectsInputTypes is
  // private[sql] in Spark 4 so the contract is documented + checked here
  private val floatInput: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"pq_argmin expects array<float|double>, got $other")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_argmin"

  override def nullSafeEval(input: Any): Any = {
    val e = input.asInstanceOf[ArrayData]
    val dsub = e.numElements() / m
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      val cj = cents(j)
      var best = Double.PositiveInfinity
      var bi = 0
      var p = 0
      while (p < cj.length) {
        val c = cj(p)
        var d = 0.0
        val off = j * dsub
        var i = 0
        while (i < dsub) {
          val x = if (floatInput) e.getFloat(off + i).toDouble
                  else e.getDouble(off + i)
          val diff = x - c(i)
          d += diff * diff
          i += 1
        }
        if (d < best) { best = d; bi = p }
        p += 1
      }
      out(j) = ids(j)(bi)
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, e => {
      val centsRef = ctx.addReferenceObj("pqCents", cents, "double[][][]")
      val idsRef = ctx.addReferenceObj("pqIds", ids, "int[][]")
      val dsub = ctx.freshName("dsub")
      val out = ctx.freshName("out")
      val j = ctx.freshName("j")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val cj = ctx.freshName("cj")
      val c = ctx.freshName("c")
      val best = ctx.freshName("best")
      val bi = ctx.freshName("bi")
      val d = ctx.freshName("d")
      val off = ctx.freshName("off")
      val x = ctx.freshName("x")
      val diff = ctx.freshName("diff")
      val getter = if (floatInput) s"(double) $e.getFloat" else s"$e.getDouble"
      s"""
         |int $dsub = $e.numElements() / $m;
         |int[] $out = new int[$m];
         |for (int $j = 0; $j < $m; $j++) {
         |  double[][] $cj = $centsRef[$j];
         |  double $best = Double.POSITIVE_INFINITY;
         |  int $bi = 0;
         |  for (int $p = 0; $p < $cj.length; $p++) {
         |    double[] $c = $cj[$p];
         |    double $d = 0.0;
         |    int $off = $j * $dsub;
         |    for (int $i = 0; $i < $dsub; $i++) {
         |      double $x = $getter($off + $i);
         |      double $diff = $x - $c[$i];
         |      $d += $diff * $diff;
         |    }
         |    if ($d < $best) { $best = $d; $bi = $p; }
         |  }
         |  $out[$j] = $idsRef[$j][$bi];
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqArgminIds =
    copy(child = newChild)
}

/** Native Catalyst expression: the k-means ASSIGNMENT rule of
  * [[graft.ext.Similarity.kmeansAssign]] — argmax over literal centroids
  * of score_p = dot(e, c_p) / |c_p|, skipping NaN scores (zero
  * centroids), ties to the FIRST (smallest-cell) maximum, −1 → cell-0
  * degenerate fallback applied by the caller. Bit-identical to the
  * interpreted `aggregate(transform(...))` fold it replaces: the dot
  * accumulates index-ascending in double (the zip_with + left-fold
  * order), each input element widened exactly where the SQL CAST sat,
  * and only strictly-greater non-NaN scores advance the accumulator.
  * Returns the matched centroid ID, or −1 when every score is NaN. */
case class KmeansArgmaxId(child: Expression,
    cents: Array[Array[Double]], ids: Array[Int], norms: Array[Double])
    extends UnaryExpression {
  require(cents.length == ids.length && cents.length == norms.length &&
    cents.nonEmpty, "centroids, ids and norms must align")

  private val floatInput: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"kmeans_argmax expects array<float|double>, got $other")
  }

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "kmeans_argmax"

  override def nullSafeEval(input: Any): Any = {
    val e = input.asInstanceOf[ArrayData]
    val n = e.numElements()
    var best = Double.NegativeInfinity
    var bid = -1
    var p = 0
    while (p < cents.length) {
      val c = cents(p)
      var dot = 0.0
      val len = math.min(n, c.length)
      var i = 0
      while (i < len) {
        val x = if (floatInput) e.getFloat(i).toDouble else e.getDouble(i)
        dot += x * c(i)
        i += 1
      }
      val s = dot / norms(p)
      if (!java.lang.Double.isNaN(s) && s > best) { best = s; bid = ids(p) }
      p += 1
    }
    bid
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, e => {
      val centsRef = ctx.addReferenceObj("kmCents", cents, "double[][]")
      val idsRef = ctx.addReferenceObj("kmIds", ids, "int[]")
      val normsRef = ctx.addReferenceObj("kmNorms", norms, "double[]")
      val n = ctx.freshName("n")
      val best = ctx.freshName("best")
      val bid = ctx.freshName("bid")
      val p = ctx.freshName("p")
      val c = ctx.freshName("c")
      val dot = ctx.freshName("dot")
      val len = ctx.freshName("len")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val getter = if (floatInput) s"(double) $e.getFloat" else s"$e.getDouble"
      s"""
         |int $n = $e.numElements();
         |double $best = Double.NEGATIVE_INFINITY;
         |int $bid = -1;
         |for (int $p = 0; $p < $centsRef.length; $p++) {
         |  double[] $c = $centsRef[$p];
         |  double $dot = 0.0;
         |  int $len = java.lang.Math.min($n, $c.length);
         |  for (int $i = 0; $i < $len; $i++) {
         |    $dot += $getter($i) * $c[$i];
         |  }
         |  double $s = $dot / $normsRef[$p];
         |  if (!java.lang.Double.isNaN($s) && $s > $best) {
         |    $best = $s; $bid = $idsRef[$p];
         |  }
         |}
         |${ev.value} = $bid;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): KmeansArgmaxId =
    copy(child = newChild)
}

object PqArgmin {
  /** Expression builder shared by [[register]] and
    * [[graft.GraftExtensions]]: pq_argmin(vec, centsLit, idsLit) where
    * centsLit is a foldable array<array<array<double>>> ([j][p][dsub])
    * and idsLit a foldable array<array<int>> ([j][p]) — both evaluated
    * at analysis into plain JVM arrays so the plan tree stays flat. */
  val builder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 3, "pq_argmin(vec, cents, ids)")
    require(exprs(1).foldable && exprs(2).foldable,
      "pq_argmin codebook arguments must be literals")
    val centsAd = exprs(1).eval().asInstanceOf[ArrayData]
    val cents = Array.tabulate(centsAd.numElements()) { j =>
      val pj = centsAd.getArray(j)
      Array.tabulate(pj.numElements())(p => pj.getArray(p).toDoubleArray())
    }
    val idsAd = exprs(2).eval().asInstanceOf[ArrayData]
    val ids = Array.tabulate(idsAd.numElements())(j =>
      idsAd.getArray(j).toIntArray())
    PqArgminIds(exprs.head, cents, ids)
  }

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("pq_argmin")))
      reg.createOrReplaceTempFunction("pq_argmin", builder, "built-in")
  }

  /** Column helper: argmin IDs of `vec` against a literal codebook.
    * Registers on `spark`, then resolves through the registry so the
    * literal children are evaluated once at analysis. */
  def pqArgmin(spark: SparkSession, vec: Column, centsLit: Column,
      idsLit: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("pq_argmin",
      vec, centsLit, idsLit)
  }

  /** Expression builder for kmeans_argmax(vec, cents, ids, norms) —
    * all three codebook arguments foldable, evaluated at analysis. */
  val kmeansBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 4, "kmeans_argmax(vec, cents, ids, norms)")
    require(exprs.drop(1).forall(_.foldable),
      "kmeans_argmax centroid arguments must be literals")
    val centsAd = exprs(1).eval().asInstanceOf[ArrayData]
    val cents = Array.tabulate(centsAd.numElements())(p =>
      centsAd.getArray(p).toDoubleArray())
    val ids = exprs(2).eval().asInstanceOf[ArrayData].toIntArray()
    val norms = exprs(3).eval().asInstanceOf[ArrayData].toDoubleArray()
    KmeansArgmaxId(exprs.head, cents, ids, norms)
  }

  def registerKmeans(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("kmeans_argmax")))
      reg.createOrReplaceTempFunction("kmeans_argmax", kmeansBuilder, "built-in")
  }

  /** Column helper: k-means argmax cluster id of `vec` against literal
    * centroids (−1 when all scores are NaN — caller applies the cell-0
    * fallback). */
  def kmeansArgmax(spark: SparkSession, vec: Column, centsLit: Column,
      idsLit: Column, normsLit: Column): Column = {
    registerKmeans(spark)
    org.apache.spark.sql.functions.call_function("kmeans_argmax",
      vec, centsLit, idsLit, normsLit)
  }
}
