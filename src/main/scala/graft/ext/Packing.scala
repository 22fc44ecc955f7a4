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
}
