package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}

/** WinnowFps vs a naive reference implementation, over arbitrary strings
  * (ASCII, accents, CJK — substring semantics are by code point, matching
  * Spark's substr). The expression's deque/digest optimizations must be
  * invisible: same fingerprint set as hash-every-gram + min-every-window
  * computed the obvious O(n·w) way. No SparkSession — the expression is
  * evaluated directly, the same call Spark's interpreted eval makes. */
object WinnowPropSpec extends Properties("WinnowFps") {

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  /** 1-based code-point substring, clipped at the end (SQL substr). */
  private def substrCp(s: String, pos1: Int, len: Int): String = {
    val cps = s.codePoints.toArray
    val from = pos1 - 1
    if (from >= cps.length) ""
    else new String(cps, from, math.min(len, cps.length - from))
  }

  private def naive(s: String, k: Int, w: Int): Set[String] = {
    val n = s.codePointCount(0, s.length)
    val grams = (1 to math.max(n - (k - 1), 1)).map(p => md5Hex(substrCp(s, p, k)))
    val nWin = math.max(grams.size - (w - 1), 1)
    (1 to nWin).map(p => grams.slice(p - 1, p - 1 + w).min).toSet
  }

  private def viaExpression(s: String, k: Int, w: Int): Set[String] = {
    val e = WinnowFps(BoundReference(0, StringType, nullable = true), k, w)
    e.eval(InternalRow(UTF8String.fromString(s)))
      .asInstanceOf[ArrayData]
      .toObjectArray(StringType).map(_.asInstanceOf[UTF8String].toString).toSet
  }

  private val genText: Gen[String] = Gen.frequency(
    4 -> Gen.listOf(Gen.oneOf(('a' to 'z') :+ ' ')).map(_.mkString),
    1 -> Gen.listOf(Gen.oneOf("éüßñ中文日本語 ".toList)).map(_.mkString))

  property("fingerprint set equals the naive O(n·w) reference") =
    Prop.forAll(genText, Gen.chooseNum(1, 20), Gen.chooseNum(1, 6)) { (s, k, w) =>
      viaExpression(s, k, w) == naive(s, k, w)
    }

  private def naiveStridedMin(s: String, k: Int, stride: Int): String = {
    val n = s.codePointCount(0, s.length)
    (1 to math.max(n - (k - 1), 1) by stride)
      .map(p => md5Hex(substrCp(s, p, k))).min
  }

  property("strided min-hash equals the naive transform/array_min form") =
    Prop.forAll(genText, Gen.chooseNum(1, 20), Gen.chooseNum(1, 9)) {
      (s, k, stride) =>
        val e = StridedMinHash(BoundReference(0, StringType, nullable = true),
          k, stride)
        e.eval(InternalRow(UTF8String.fromString(s)))
          .asInstanceOf[UTF8String].toString == naiveStridedMin(s, k, stride)
    }

  property("any shared run of ≥ w+k-1 chars shares a fingerprint (guarantee)") =
    Prop.forAll(Gen.listOfN(25, Gen.alphaLowerChar).map(_.mkString),
        Gen.listOfN(30, Gen.alphaLowerChar).map(_.mkString)) { (shared, tail) =>
      val k = 16; val w = 4
      val run = shared + "commonrunsharedacrossdocs" // ≥ w+k-1 = 19 chars
      val a = viaExpression(run + tail, k, w)
      val b = viaExpression(tail + run, k, w)
      a.intersect(b).nonEmpty
    }
}
