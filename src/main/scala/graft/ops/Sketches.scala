package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan 2005) realized as a
  * DataFrame: the sketch IS a (row, bucket, cnt) counter table of at most
  * depth×width rows — bounded regardless of input size, mergeable by
  * summing counts per (row, bucket), and persistable as a tiny parquet
  * next to the corpus it summarizes.
  *
  * Why a frame and not a custom `TypedImperativeAggregate`: the insert
  * path is then a codegen'd map (`xxhash64` + `pmod`) feeding a
  * hash aggregation with map-side partial combine — each input partition
  * reduces to ≤ depth×width local counters before anything shuffles, which
  * is exactly the update-then-merge contract of the sketch, executed by
  * Tungsten instead of hand-written buffer code. Point queries are a
  * broadcast join against the counter table (the sketch side is ≤
  * depth×width rows by construction, so the broadcast can never blow up).
  *
  * Guarantees (depth d rows, width w buckets, N total increments):
  *  - estimate ≥ true count, ALWAYS (counters only over-count) — so a
  *    candidate scan by `estimate ≥ T` has perfect recall of true heavy
  *    hitters;
  *  - estimate ≤ true count + (e/w)·N with probability ≥ 1 − e^(−d) per
  *    key (ε = e/w from w = ⌈e/ε⌉).
  *
  * The 100 TB shape: one pass builds the sketch (O(d·w) state, no
  * key-cardinality shuffle), heavy-hitter candidates are proposed from the
  * sketch, and only the proposed candidates pay for an exact verify pass —
  * the sketch-proposes / exact-verifies discipline the dedup family uses
  * for pairs, applied to frequency. Reference analog: the keyword/product
  * hot-list apps (gmall-realtime KeywordStatsApp) count exact per-key state
  * that at warehouse scale becomes a vocabulary-sized shuffle per window;
  * the sketch bounds that state at d·w counters.
  */
object Sketches {

  /** One hash row's bucket for `key`: xxhash64 seeded by the row index
    * (the row index participates as a hashed column, giving d pairwise
    * independent functions from one primitive). Shared by insert and
    * query so the ≥-true guarantee holds by construction. */
  private def bucket(row: Column, key: Column, width: Int): Column =
    pmod(xxhash64(row, key), lit(width.toLong))

  /** Build the counter table: one row per (hash row, bucket) actually hit.
    * Missing (row, bucket) combinations mean count 0 — `cmsEstimates`
    * coalesces them — so sketch size is also bounded by the number of
    * DISTINCT keys × depth when that is smaller than d·w. */
  def cmsSketch(df: DataFrame, key: Column, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 2, s"bad CMS shape d=$depth w=$width")
    df.select(key.as("k"))
      .select(explode(array((0 until depth).map(i => lit(i)): _*)).as("r"),
        col("k"))
      .groupBy(col("r"), bucket(col("r"), col("k"), width).as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Per-cell counter PARTIALS — the persistable form of [[cmsSketch]]:
    * one (cell, r, bucket, cnt) row per cell × counter actually hit,
    * written next to the corpus at ingest. Merging cells back to one
    * sketch is [[cmsMerge]]'s plain (r, bucket) SUM; counter sums
    * commute, so the merged sketch is BIT-IDENTICAL to a one-shot
    * [[cmsSketch]] over the union of the cells' rows — proposal recall
    * stays perfect across the store round-trip (SketchesSpec pins the
    * equality). Shares [[bucket]] with the query path so the hash
    * functions can never drift apart. */
  def cmsSketchPartials(df: DataFrame, cell: Column, key: Column,
      depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 2, s"bad CMS shape d=$depth w=$width")
    df.select(cell.as("cell"), key.as("k"))
      .select(col("cell"),
        explode(array((0 until depth).map(i => lit(i)): _*)).as("r"),
        col("k"))
      .groupBy(col("cell"), col("r"), bucket(col("r"), col("k"), width).as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Re-merge persisted counter partials to one sketch frame (drops the
    * cell key; sums commute). */
  def cmsMerge(partials: DataFrame): DataFrame =
    partials.groupBy("r", "bucket").agg(sum("cnt").as("cnt"))

  /** Point-query the sketch for each row of `keys` (one column named `k`
    * or selected by `key`): estimate = min over the d rows' counters.
    * The sketch side is ≤ d·w rows → broadcast; the keys side streams. */
  def cmsEstimates(sketch: DataFrame, keys: DataFrame, key: Column,
      depth: Int, width: Int): DataFrame = {
    val probes = keys.select(key.as("k")).distinct()
      .select(col("k"),
        explode(array((0 until depth).map(i => lit(i)): _*)).as("r"))
      .withColumn("bucket", bucket(col("r"), col("k"), width))
    probes
      .join(broadcast(sketch), Seq("r", "bucket"), "left")
      .groupBy("k")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** Heavy hitters with guaranteed recall: keys whose TRUE count ≥
    * `threshold`, found by sketch-propose (estimate ≥ threshold — never
    * misses, estimates only over-count) then exact-verify (count only the
    * proposed keys' rows; false positives fall out here). Output is
    * exactly the true heavy-hitter set with exact counts, plus the CMS
    * error bound checked per key (`within_bound`). */
  def cmsHeavyHitters(df: DataFrame, key: Column, threshold: Long,
      depth: Int, width: Int): DataFrame =
    // staged, not cache(): the sketch is built once and read by both the
    // propose and verify branches, but cacheManager entries live until an
    // explicit unpersist — repeated invocations in a long session (bench
    // reruns) would accumulate pinned partitions. localCheckpoint blocks
    // are reclaimed by the ContextCleaner once the frame is unreferenced.
    cmsHeavyHittersFrom(
      graft.core.Materialize.stage(
        cmsSketch(df.select(key.as("k")), col("k"), depth, width)),
      df, key, threshold, depth, width)

  /** Same propose-then-verify, but over a PREBUILT sketch — the seam the
    * streaming path uses: the counter table accumulates incrementally
    * over micro-batches (counter sums are the merge), and the heavy-hitter
    * question is answered later from the sketch + an archived-log verify
    * pass, without the stream ever keeping per-key state. */
  def cmsHeavyHittersFrom(sketch: DataFrame, df: DataFrame, key: Column,
      threshold: Long, depth: Int, width: Int): DataFrame = {
    val keyed = df.select(key.as("k"))
    val candidates = cmsEstimates(sketch, keyed, col("k"), depth, width)
      .filter(col("est") >= threshold)
    // exact verify touches only candidate keys' rows (left-semi prune
    // BEFORE the count shuffle); epsN = ceil(e·N/w) is the CMS bound
    val n = keyed.agg(count(lit(1)).as("n_total"))
    keyed
      .join(broadcast(candidates), Seq("k"), "left_semi")
      .groupBy("k").agg(count(lit(1)).as("exact"))
      .filter(col("exact") >= threshold)
      .join(broadcast(candidates), Seq("k"))
      .crossJoin(broadcast(n))
      .select(col("k"), col("exact"),
        (col("est") >= col("exact") &&
          col("est") <= col("exact") +
            ceil(col("n_total") * scala.math.E / width).cast("long"))
          .as("within_bound"))
  }
}
