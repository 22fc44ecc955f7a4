package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the full winnowing fingerprint set
  * (Schleimer et al., SIGMOD'03) of a normalized string — md5-hex each
  * k-gram, keep the minimum of every sliding window of w consecutive gram
  * hashes (full windows only; one clipped window when the doc has fewer
  * than w grams), return the distinct minima in first-occurrence order.
  *
  * Why an expression and not higher-order functions? The semantics ARE
  * expressible as `transform` + `slice`/`array_min` — but interpreted HOF
  * eval pays a boxed lambda call, a fresh digest, and a 4-element array
  * copy PER POSITION, which benchmarked 3× slower than even the old
  * explode+window-shuffle shape at sf0.1. This eval is the loop a native
  * engine would run: one reused MessageDigest, one monotonic deque giving
  * O(n) total window minima (not O(n·w)), zero per-position allocation
  * beyond the hex strings themselves. Still zero shuffle: one call per
  * row. Preference order per the design guide: built-ins where they're
  * efficient, a custom Expression where the hot loop justifies it.
  *
  * Parity contract (the DuckDB oracle computes md5(substr(norm, p, k))):
  * k-grams are taken with UTF8String.substringSQL — Spark's own substr —
  * and hashed as their UTF-8 bytes, so results are bit-identical to the
  * SQL form for any input, not just ASCII. Hex minima compare
  * lexicographically = byte order = Spark/DuckDB string order.
  */
/** Shared hot-loop helper: md5 of a byte array as lowercase hex, with a
  * caller-owned reusable digest (one allocation per row, not per gram). */
private[functions] object HexMd5 {
  private val hexDigits = "0123456789abcdef".toCharArray

  def apply(md: java.security.MessageDigest, bytes: Array[Byte]): String = {
    md.reset()
    val d = md.digest(bytes)
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexDigits((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexDigits(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }
}

case class WinnowFps(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {
  require(k > 0 && w > 0, s"k and w must be positive, got k=$k w=$w")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "winnow_fps"

  override def nullSafeEval(input: Any): Any = {
    val norm = input.asInstanceOf[UTF8String]
    val len = norm.numChars()
    val nGrams = math.max(len - (k - 1), 1)
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = new Array[String](nGrams)
    var p = 0
    while (p < nGrams) {
      // 1-based SQL substr semantics, clipped at the end like substr(norm,p,k)
      hex(p) = HexMd5(md, norm.substringSQL(p + 1, k).getBytes)
      p += 1
    }
    val out = new java.util.LinkedHashSet[String]
    if (nGrams < w) {
      // single clipped window = min over all grams
      var best = hex(0); var i = 1
      while (i < nGrams) { if (hex(i).compareTo(best) < 0) best = hex(i); i += 1 }
      out.add(best)
    } else {
      // monotonic deque of indices with increasing hash values
      val dq = new java.util.ArrayDeque[Int]
      var i = 0
      while (i < nGrams) {
        while (!dq.isEmpty && hex(dq.peekLast()).compareTo(hex(i)) >= 0) dq.removeLast()
        dq.addLast(i)
        if (dq.peekFirst() <= i - w) dq.removeFirst()
        if (i >= w - 1) out.add(hex(dq.peekFirst()))
        i += 1
      }
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator(); var j = 0
    while (it.hasNext) { arr(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(arr)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFps =
    copy(child = newChild)
}

/** [[WinnowFps]] with a Karp-Rabin ROLLING hash instead of md5 — the
  * 100-TB production variant. The md5 form exists for ORACLE PARITY
  * (DuckDB can restate md5(substr(...)) bit-for-bit) but pays one full
  * digest PER CHARACTER POSITION: ~150 ns/position ≈ 6–7 MB/s/core,
  * which at corpus scale makes the hash — not I/O, not the shuffle —
  * the fingerprinting bottleneck (SCALING.md §6h). Winnowing only needs
  * a hash ORDER over k-grams, any uniform one: this eval rolls a
  * base-1000003 polynomial over the chars in O(1) per position
  * (~30–100× less hash work), keeps the same monotonic-deque window
  * minima and first-occurrence distinct, and returns LONG fingerprints
  * (8 bytes vs 32-char hex strings — also 4× less fingerprint I/O).
  * Minima compare UNSIGNED so the order matches the uniform-uint64
  * model. Same windowing semantics as [[WinnowFps]] exactly: full
  * windows only, one clipped window when the doc has fewer than w
  * grams, single clipped gram when shorter than k.
  *
  * Guarantee unchanged (it is a property of winnowing, not the hash):
  * any shared run of ≥ w+k−1 chars shares a fingerprint — spec-gated,
  * plus a bounds-gated registry query asserting its per-doc selection
  * density stays within a measured band of the md5 variant's. */
case class WinnowFpsRolling(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {
  require(k > 0 && w > 0, s"k and w must be positive, got k=$k w=$w")

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "winnow_fps_rolling"

  private val B = 1000003L

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val len = s.length
    val nGrams = math.max(len - (k - 1), 1)
    val h = new Array[Long](nGrams)
    if (len < k) {
      // single clipped gram: plain polynomial over what's there
      var acc = 0L; var i = 0
      while (i < len) { acc = acc * B + s.charAt(i); i += 1 }
      h(0) = acc
    } else {
      var acc = 0L; var i = 0
      while (i < k) { acc = acc * B + s.charAt(i); i += 1 }
      h(0) = acc
      // highest-power multiplier for the outgoing char
      var top = 1L; i = 0
      while (i < k - 1) { top *= B; i += 1 }
      var p = 1
      while (p < nGrams) {
        acc = (acc - s.charAt(p - 1) * top) * B + s.charAt(p + k - 1)
        h(p) = acc
        p += 1
      }
    }
    val out = new java.util.LinkedHashSet[Long]
    if (nGrams < w) {
      var best = h(0); var i = 1
      while (i < nGrams) {
        if (java.lang.Long.compareUnsigned(h(i), best) < 0) best = h(i)
        i += 1
      }
      out.add(best)
    } else {
      val dq = new java.util.ArrayDeque[Int]
      var i = 0
      while (i < nGrams) {
        while (!dq.isEmpty &&
          java.lang.Long.compareUnsigned(h(dq.peekLast()), h(i)) >= 0)
          dq.removeLast()
        dq.addLast(i)
        if (dq.peekFirst() <= i - w) dq.removeFirst()
        if (i >= w - 1) out.add(h(dq.peekFirst()))
        i += 1
      }
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator(); var j = 0
    while (it.hasNext) { arr(j) = it.next().longValue(); j += 1 }
    new GenericArrayData(arr)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFpsRolling =
    copy(child = newChild)
}

object WinnowFpsRolling {
  /** Expression builder shared by register and [[graft.GraftExtensions]]. */
  val builder: Seq[Expression] => Expression =
    exprs => WinnowFpsRolling(exprs.head,
      exprs(1).eval().asInstanceOf[Int], exprs(2).eval().asInstanceOf[Int])

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("winnow_fps_rolling")))
      reg.createOrReplaceTempFunction("winnow_fps_rolling", builder, "built-in")
  }
}

/** Native strided window min-hash: md5-hex each k-char gram taken at
  * positions 1, 1+stride, 1+2·stride, … (clipped SQL-substr semantics, one
  * clipped gram when the string is shorter than k), return the
  * lexicographic minimum. Exactly `array_min(transform(sequence(1,
  * greatest(length(s)-k+1, 1), stride), i -> md5(substr(s, i, k))))` — the
  * interpreted-HOF form pays a boxed lambda call, a fresh digest, and an
  * array cell per position and was the last map-only bench hotspot
  * (x_fingerprint); this eval is one reused digest and one running min,
  * zero per-position allocation beyond the hex strings. Same parity
  * contract as [[WinnowFps]]: UTF8String.substringSQL + UTF-8-byte md5 =
  * bit-identical to the SQL form for any input. */
case class StridedMinHash(child: Expression, k: Int, stride: Int)
    extends UnaryExpression with CodegenFallback {
  require(k > 0 && stride > 0,
    s"k and stride must be positive, got k=$k stride=$stride")

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "strided_minhash"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val last = math.max(s.numChars() - (k - 1), 1)
    val md = java.security.MessageDigest.getInstance("MD5")
    var best: String = null
    var p = 1
    while (p <= last) {
      val h = HexMd5(md, s.substringSQL(p, k).getBytes)
      if (best == null || h.compareTo(best) < 0) best = h
      p += stride
    }
    UTF8String.fromString(best)
  }

  override protected def withNewChildInternal(newChild: Expression): StridedMinHash =
    copy(child = newChild)
}

object StridedMinHash {
  /** Expression builder shared by [[register]] and
    * [[graft.GraftExtensions]]. */
  val builder: Seq[Expression] => Expression =
    exprs => StridedMinHash(exprs.head,
      exprs(1).eval().asInstanceOf[Int], exprs(2).eval().asInstanceOf[Int])

  /** SQL registration: strided_minhash(text, k, stride), literal ints.
    * Idempotent like the other native registrations. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("strided_minhash")))
      reg.createOrReplaceTempFunction("strided_minhash", builder, "built-in")
  }
}

object WinnowFps {
  /** SQL registration: winnow_fps(text, k, w) with literal int k/w.
    * Idempotent — skips the re-register (and its WARN) when already
    * present; the definition never changes within a session. */
  /** Expression builder shared by [[register]] and
    * [[graft.GraftExtensions]]. */
  val builder: Seq[Expression] => Expression =
    exprs => WinnowFps(exprs.head,
      exprs(1).eval().asInstanceOf[Int], exprs(2).eval().asInstanceOf[Int])

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("winnow_fps")))
      reg.createOrReplaceTempFunction("winnow_fps", builder, "built-in")
  }
}
