package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._

/** Distributed Bloom-filter build + probe over Spark's OWN runtime-filter
  * expression pair (`BloomFilterAggregate` / `BloomFilterMightContain`,
  * the machinery behind `spark.sql.optimizer.runtime.bloomFilter`) —
  * reused directly so the put and probe paths are the same sketch
  * implementation by construction (both sides hash the value through
  * `XxHash64` and put/probe the resulting long), and both sides run
  * inside whole-stage codegen.
  *
  * Why this exists: a semi-join against a SMALL set (benchmark
  * fingerprints, an exclusion list, a frozen dedup index) is an exact
  * equi-join — but at 100 TB the corpus side of that join shuffles
  * everything, hits included or not. A Bloom filter built over the small
  * side and evaluated as a map-only `Filter` on the corpus scan drops the
  * overwhelming non-matching majority BEFORE the exchange, so only
  * probable hits shuffle. False positives are fine — the exact join still
  * runs behind the filter and removes them — and false negatives are
  * impossible, so the composed result is bit-identical to the plain join.
  *
  * Scale shape: the build is a standard partial/final aggregation (each
  * task builds a filter over its partition, filters OR-merge), so the
  * small side is never collected raw; only the finished filter bytes
  * (~1.2 bytes per item at 1% fpp) come back to the driver and ship to
  * tasks as a literal. At a million benchmark fingerprints that is
  * ~1.2 MB per task binary — the same order as a broadcast dim table.
  */
object BloomProbe {

  /** Expression builders shared by [[register]] and
    * [[graft.GraftExtensions]]. */
  val aggBuilder: Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
      org.apache.spark.sql.catalyst.expressions.Expression =
    exprs => new BloomFilterAggregate(
      new XxHash64(Seq(exprs.head)), exprs(1), exprs(2))
  val probeBuilder: Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
      org.apache.spark.sql.catalyst.expressions.Expression =
    exprs => BloomFilterMightContain(exprs.head, new XxHash64(Seq(exprs(1))))

  /** Registers `graft_bloom_agg(value, nItems, nBits)` (aggregate →
    * filter bytes) and `graft_bloom_probe(bytes, value)` (might-contain
    * predicate). Idempotent like the other native registrations. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier("graft_bloom_agg")))
      reg.createOrReplaceTempFunction("graft_bloom_agg", aggBuilder, "built-in")
    if (!reg.functionExists(FunctionIdentifier("graft_bloom_probe")))
      reg.createOrReplaceTempFunction("graft_bloom_probe", probeBuilder,
        "built-in")
  }

  /** Optimal bit count for `n` items at false-positive rate `p`
    * (the textbook m = -n·ln p / (ln 2)²). */
  def optimalNumBits(n: Long, p: Double): Long = {
    require(n > 0 && p > 0.0 && p < 1.0, s"need n>0, 0<p<1; got n=$n p=$p")
    math.ceil(-n * math.log(p) / (math.log(2) * math.log(2))).toLong.max(64L)
  }

  /** Build a Bloom filter over `value` across all rows of `df`; returns
    * the serialized filter, or None when `df` is empty (callers should
    * then short-circuit the probe to `false` — an empty set contains
    * nothing). Distributed partial/final aggregation; only the finished
    * bytes reach the driver. */
  def buildFilterBytes(df: DataFrame, value: Column,
      expectedItems: Long, fpp: Double = 0.01): Option[Array[Byte]] = {
    register(df.sparkSession)
    val n = math.max(expectedItems, 1L)
    val row = df
      .agg(call_function("graft_bloom_agg", value,
        lit(n), lit(optimalNumBits(n, fpp))).as("f"))
      .head()
    if (row.isNullAt(0)) None else Some(row.getAs[Array[Byte]](0))
  }

  /** Map-only membership probe: true iff `value` MIGHT be in the filter
    * (no false negatives). Ships the filter bytes as a task literal. */
  def mightContain(spark: SparkSession, filterBytes: Array[Byte],
      value: Column): Column = {
    register(spark)
    call_function("graft_bloom_probe", lit(filterBytes), value)
  }
}
