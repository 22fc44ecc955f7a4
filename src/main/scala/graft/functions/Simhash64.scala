package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: the 64-bit Charikar simhash of a token
  * array, computed per ROW in one fused loop — no explode, no 64-column
  * aggregate, no shuffle.
  *
  * The composed form ([[graft.ext.Dedup.simhashFast]] at bits = 64)
  * explodes tokens (one row per word), hashes each, and runs a groupBy
  * with 64 conditional-sum aggregate columns — a keyed exchange whose
  * payload is 64 longs per (partition, doc). At 100 TB the sketch should
  * be a MAP-ONLY projection, the same argument as [[WinnowFps]]: the
  * document already holds all its tokens, so the majority vote is
  * row-local. This expression generates a single primitive loop:
  * per token one XXH64 (Spark's own kernel, seed 42 — bit-identical to
  * `xxhash64(token)`), 64 bit-counter increments, then one assembly
  * pass. Bit b of the sketch is set iff 2·count(b) ≥ n over the doc's
  * NON-EMPTY tokens (null/empty elements are skipped, mirroring the
  * composed path's pre-explode `length(word) > 0` filter; a doc with no
  * countable tokens yields NULL, mirroring groupBy dropping it).
  *
  * ExtSpec pins bit-exactness against the composed aggregate on the
  * documents corpus, so [[graft.ext.Dedup.simhashNeardupPairs]] at the
  * production width can ride this kernel without moving
  * x_simhash64_neardup's recall gate.
  */
case class Simhash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val cnts = new Array[Long](64)
    var n = 0L
    var i = 0
    val m = arr.numElements()
    while (i < m) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        if (s.numBytes() > 0) {
          val h = XXH64.hashUnsafeBytes(
            s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
          var b = 0
          while (b < 64) { cnts(b) += (h >>> b) & 1L; b += 1 }
          n += 1L
        }
      }
      i += 1
    }
    if (n == 0L) null
    else {
      var sk = 0L
      var b = 0
      while (b < 64) { if (cnts(b) * 2 >= n) sk |= 1L << b; b += 1 }
      sk
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cnts = ctx.freshName("cnts")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val s = ctx.freshName("s")
      val sk = ctx.freshName("sk")
      s"""
         |long[] $cnts = new long[64];
         |long $n = 0L;
         |int $m = $a.numElements();
         |for (int $i = 0; $i < $m; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    UTF8String $s = $a.getUTF8String($i);
         |    if ($s.numBytes() > 0) {
         |      long $h = org.apache.spark.sql.catalyst.expressions.XXH64
         |        .hashUnsafeBytes($s.getBaseObject(), $s.getBaseOffset(),
         |          $s.numBytes(), 42L);
         |      for (int $b = 0; $b < 64; $b++) $cnts[$b] += ($h >>> $b) & 1L;
         |      $n++;
         |    }
         |  }
         |}
         |if ($n == 0L) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $sk = 0L;
         |  for (int $b = 0; $b < 64; $b++)
         |    if ($cnts[$b] * 2 >= $n) $sk |= 1L << $b;
         |  ${ev.value} = $sk;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Simhash64 =
    copy(child = newChild)
}

object Simhash64 {
  val builder: Seq[Expression] => Expression = exprs => Simhash64(exprs.head)

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("simhash64")))
      reg.createOrReplaceTempFunction("simhash64", builder, "built-in")
  }

  /** Column helper over a raw text column: split on spaces, drop empties
    * inside the expression, sketch. */
  def simhash64(spark: SparkSession, tokensExpr: String): Column = {
    register(spark)
    org.apache.spark.sql.functions.expr(s"simhash64($tokensExpr)")
  }
}
