package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One scored candidate inside the bounded top-k buffer. Public +
  * file-scoped: Dataset encoders reject private or test-nested classes. */
case class Scored(score: Double, id: Long)

/** Bounded top-k buffer — items kept sorted by (score desc, id asc) and
  * truncated at k, so its size never exceeds k regardless of input
  * cardinality. */
case class TopKBuf(items: Seq[Scored])

/** Size-k heap aggregate: `groupBy(q).agg(topK(score, id))` keeps only the
  * k best (score desc, ties → smaller id) candidates per group.
  *
  * This is the scale-safe replacement for the
  * `row_number().over(Window.partitionBy(q).orderBy(score desc))` top-k
  * idiom: a window sort shuffles EVERY scored candidate of a group into
  * one task and fully sorts them — a single-reducer bottleneck when one
  * query scores the whole corpus. Wrapped with `functions.udaf`, this
  * Aggregator runs as a Catalyst TypedImperativeAggregate under
  * ObjectHashAggregateExec with map-side partial aggregation: each input
  * partition reduces to at most k rows locally, and only those k-row
  * buffers shuffle and merge. Per-group state is O(k); shuffle volume is
  * O(partitions × k), independent of corpus size.
  */
class TopKAgg(k: Int) extends Aggregator[Scored, TopKBuf, TopKBuf] {
  require(k > 0, s"k must be positive, got $k")

  private def beats(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  override def zero: TopKBuf = TopKBuf(Vector.empty)

  override def reduce(b: TopKBuf, a: Scored): TopKBuf = {
    // NaN scores (e.g. cosine of a zero-norm vector) are unrankable —
    // `beats` is false both ways for NaN, so keeping them would make the
    // result depend on partition/merge order. Dropping them makes the
    // aggregate a total order regardless of input layout.
    if (a.score.isNaN) return b
    val items = b.items
    // common case at full buffer: candidate worse than the current k-th
    if (items.length >= k && !beats(a, items.last)) b
    else {
      val (better, rest) = items.span(beats(_, a))
      TopKBuf(((better :+ a) ++ rest).take(k))
    }
  }

  override def merge(x: TopKBuf, y: TopKBuf): TopKBuf = {
    // merge two ≤k sorted runs, keep the k best
    val out = Vector.newBuilder[Scored]
    var (a, b) = (x.items, y.items)
    var n = 0
    while (n < k && (a.nonEmpty || b.nonEmpty)) {
      if (b.isEmpty || (a.nonEmpty && beats(a.head, b.head))) {
        out += a.head; a = a.tail
      } else { out += b.head; b = b.tail }
      n += 1
    }
    TopKBuf(out.result())
  }

  override def finish(b: TopKBuf): TopKBuf = b
  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
}

/** Exact distinct count, memory-bounded by contract: the per-group set may
  * hold at most `cap` elements and the aggregate fails loudly beyond it.
  * The bounded replacement for `size(collect_set(x))` (whose state is
  * unbounded on a hot key — reference analog: the order-id Sets of
  * RT/app/dws/ProductStatsApp.java:203-242): within a 10s window a key's
  * distinct cardinality is business-bounded, and if that assumption ever
  * breaks we want an error, not an OOM'd executor. For genuinely unbounded
  * cardinality use approx_count_distinct (HLL++) — see x_approx_distinct_bounds.
  */
class BoundedDistinctAgg(cap: Int) extends Aggregator[String, Set[String], Int] {
  require(cap > 0, s"cap must be positive, got $cap")

  private def overflow(): Nothing = throw new IllegalStateException(
    s"bounded_distinct overflow: >$cap distinct values in one group — " +
      "raise the cap or switch to approx_count_distinct")

  override def zero: Set[String] = Set.empty
  override def reduce(b: Set[String], a: String): Set[String] =
    if (a == null || b.contains(a)) b
    else if (b.size >= cap) overflow()
    else b + a
  override def merge(x: Set[String], y: Set[String]): Set[String] = {
    val u = x union y
    if (u.size > cap) overflow() else u
  }
  override def finish(b: Set[String]): Int = b.size
  // buffer is an opaque in-memory set (never user-visible) → kryo;
  // ObjectHashAggregate keeps it as a raw object until spill/shuffle
  override def bufferEncoder: Encoder[Set[String]] = Encoders.kryo[Set[String]]
  override def outputEncoder: Encoder[Int] = Encoders.scalaInt
}

object TopK {

  /** Column function: topK(k)(scoreCol, idCol) → struct(items: array of
    * (score, id)), the k best by (score desc, id asc). */
  def topK(k: Int): (Column, Column) => Column = {
    val fn = udaf(new TopKAgg(k), Encoders.product[Scored])
    (score, id) => fn(score, id)
  }

  /** Column function: boundedDistinct(cap)(col) — exact distinct count of
    * non-null string values, failing loudly above `cap`. */
  def boundedDistinct(cap: Int): Column => Column = {
    val fn = udaf(new BoundedDistinctAgg(cap), Encoders.STRING)
    c => fn(c)
  }
}
