package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing for training pipelines: assign documents to
  * fixed-token-budget packs — the batching step between a curated corpus
  * and a pretraining run.
  *
  * Semantics are concat-and-chunk, the standard pretraining batch layout:
  * conceptually concatenate the corpus in id order and slice the token
  * stream into budget-sized chunks; a document belongs to the pack where
  * it STARTS. This is deterministic (pure function of ids and token
  * counts — no bin-packing heuristic whose result depends on visit
  * order), trivially parallel, and exactly expressible in SQL, so the
  * DuckDB oracle verifies every assignment. A greedy first-fit packer
  * would waste slightly less padding but is sequential by construction
  * and engine-divergent on ties.
  *
  * Scale shape: one distributed prefix sum over (id → token count)
  * ([[PrefixSum.runningTotal]] — range partition + local window + tiny
  * offset merge, never a single-task global window), then a per-row
  * integer division. No shuffle beyond the range partition. */
object Packing {

  /** (doc_id, n_tokens, start_offset, pack_id): `start_offset` is the
    * exclusive prefix sum of `tokenCol` in `idCol` order; `pack_id` =
    * start_offset div budget. Documents longer than the budget simply
    * span chunks (their tail tokens land in following packs at training
    * time), matching concat-and-chunk exactly.
    *
    * Precondition: `idCol` values are unique — the concatenation order
    * is `idCol`, so duplicate ids make the relative order of their rows
    * (and thus their offsets) undefined across runs. */
  def concatChunkPacks(docs: DataFrame, idCol: String, tokenCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val base = docs.select(col(idCol).as("doc_id"),
      col(tokenCol).cast("long").as("n_tokens"))
    PrefixSum.runningTotal(base, Nil, Seq("doc_id"), "n_tokens", "_cum")
      .withColumn("start_offset", col("_cum") - col("n_tokens"))
      .withColumn("pack_id", expr(s"start_offset div $budget"))
      .select("doc_id", "n_tokens", "start_offset", "pack_id")
  }

  /** Sliding-window chunking with overlap — the context-window splitter
    * for RAG indexing / long-doc eval: token windows of size `window`
    * advancing by `stride` (< window ⇒ overlap of window−stride tokens).
    * Windows stop once the document tail is covered:
    * n_chunks = 1 + ⌈max(n−window, 0) / stride⌉, so a doc shorter than
    * one window yields exactly one chunk and the last chunk of a longer
    * doc is the final stride step (its `len_tok` may be < window only
    * when n < window; interior chunks are always full).
    *
    * All-integer chunk math (no float rank), one `explode` over a
    * per-row `sequence` — map-only, zero shuffle, the cheapest possible
    * 100-TB shape: chunking parallelism is per-document and the output
    * inherits the input partitioning. Token counting is the standard
    * whitespace tokenizer ([[TextAnalysis.tokenCounts]] `ws_tokens`). */
  def slidingChunks(docs: DataFrame, textCol: String, idCol: String,
      window: Long, stride: Long): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    docs
      .select(col(idCol).as("doc_id"),
        size(filter(split(col(textCol), " "), w => length(w) > 0))
          .cast("long").as("n_tok"))
      .withColumn("_nc",
        lit(1L) + expr(s"(greatest(n_tok - $window, 0L) + $stride - 1) div $stride"))
      .select(col("doc_id"), col("n_tok"),
        explode(expr("sequence(0L, _nc - 1)")).as("chunk_id"))
      .withColumn("start_tok", col("chunk_id") * stride)
      .withColumn("len_tok",
        least(lit(window), col("n_tok") - col("start_tok")))
      .select("doc_id", "chunk_id", "start_tok", "len_tok")
  }

  /** Length-bucketed batching profile — the padding-efficiency planner
    * for dynamic-batching trainers/servers: documents grouped by the
    * smallest power-of-two bucket ≥ their token count (floored at
    * `minBucket`), with per-bucket doc/token mass and the padding waste
    * incurred by padding every member to the bucket size.
    *
    * The bucket is computed with INTEGER bit math — `2^bitlen(n−1)` via
    * the length of the binary string, never `ceil(log2)` (float log at
    * an exact power-of-two boundary is engine-divergent). Waste is one
    * IEEE division of two exact integers, floor-truncated to 4 dp.
    * Map-side partial aggregation onto ≤ ~40 distinct buckets: the
    * shuffle moves one row per (partition, bucket) regardless of corpus
    * size. */
  def lengthBuckets(docs: DataFrame, textCol: String,
      minBucket: Long = 16L): DataFrame = {
    require(minBucket >= 1 && (minBucket & (minBucket - 1)) == 0,
      s"minBucket must be a power of two, got $minBucket")
    docs
      .select(size(filter(split(col(textCol), " "), w => length(w) > 0))
        .cast("long").as("n_tok"))
      .withColumn("bucket",
        when(col("n_tok") <= minBucket, minBucket)
          .otherwise(expr("shiftleft(1L, length(bin(n_tok - 1)))")))
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tok").as("tokens"))
      .withColumn("padded", col("n_docs") * col("bucket"))
      .withColumn("waste_frac",
        floor((lit(1.0) - col("tokens").cast("double") / col("padded")) *
          10000.0) / 10000.0)
      .select("bucket", "n_docs", "tokens", "padded", "waste_frac")
  }

  /** Per-pack occupancy: documents starting in the pack and their total
    * token count (a spanning document attributes ALL its tokens to the
    * pack where it starts, so `tokens` can exceed `budget` — under
    * concat-and-chunk every pack is exactly full except the last; this is
    * a doc-distribution profile, not a padding metric). Tiny frame (one
    * row per pack). */
  def packStats(packs: DataFrame, budget: Long): DataFrame =
    packs.groupBy("pack_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("tokens"))
      .withColumn("budget", lit(budget))

  /** Length-bucketed SHELF packing — the padding-aware sibling of
    * [[concatChunkPacks]]: documents are grouped by their power-of-two
    * length bucket ([[lengthBuckets]]' integer bit math) and each bucket
    * is sliced into shelves of `budget div bucket` documents, every
    * member padded to the bucket size. This is the "length-grouped
    * batching" layout dynamic-padding trainers use (and the shelf/
    * harmonic family of bin-packing algorithms — per-bucket waste is
    * bounded by the bucket rounding, under 50 % worst-case and far less
    * on real length distributions), chosen over greedy first-fit
    * DELIBERATELY: first-fit is sequential by construction and
    * tie-divergent across engines, while the shelf assignment is a pure
    * function of (bucket, rank-within-bucket) — deterministic, fully
    * parallel, and exactly restatable in SQL for the oracle.
    *
    * A pack is the (bucket, shelf_id) pair. Documents longer than the
    * budget land in buckets with capacity floor(budget/bucket) = 0,
    * clamped to 1 — each gets a singleton pack (split/truncation is the
    * trainer's policy decision, not the packer's).
    *
    * Scale shape: the rank-within-bucket comes from the shared
    * distributed prefix sum ([[PrefixSum.runningTotal]] partitioned by
    * bucket — a `row_number() OVER (PARTITION BY bucket)` would funnel
    * each bucket (and a Zipf-headed corpus concentrates in ~6 buckets)
    * through one task); everything after the rank is per-row integer
    * math. Precondition: `idCol` unique, as in [[concatChunkPacks]]. */
  def shelfPacks(docs: DataFrame, textCol: String, idCol: String,
      budget: Long, minBucket: Long = 16L): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(minBucket >= 1 && (minBucket & (minBucket - 1)) == 0,
      s"minBucket must be a power of two, got $minBucket")
    val base = docs.select(col(idCol).as("doc_id"),
      size(filter(split(col(textCol), " "), w => length(w) > 0))
        .cast("long").as("n_tok"))
    val bucketed = base
      .withColumn("bucket",
        when(col("n_tok") <= minBucket, minBucket)
          .otherwise(expr("shiftleft(1L, length(bin(n_tok - 1)))")))
      .withColumn("_one", lit(1L))
    PrefixSum.runningTotal(bucketed, Seq("bucket"), Seq("doc_id"),
        "_one", "_rk")
      .withColumn("shelf_id",
        expr(s"(_rk - 1) div greatest(1L, $budget div bucket)"))
      .select("doc_id", "n_tok", "bucket", "shelf_id")
  }
}
