package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document chunking — the context-window prep every RAG index and
  * long-document pretraining pipeline runs before embedding/packing:
  * split each document's token stream into fixed-size windows advancing
  * by a stride (overlap = size − stride keeps boundary-spanning content
  * retrievable in at least one chunk).
  *
  * Scale shape: MAP-ONLY. The window starts are a `sequence` literal per
  * row, the windows are `slice`s of the one tokenized array, and the
  * explode multiplies rows without any shuffle — chunking 100 TB is one
  * codegen'd scan whose output feeds the embed/pack stages directly
  * (PlanSpec pins the no-exchange plan). Windowing is deterministic per
  * document, so chunk ids (`doc_id`, `chunk_idx`) are stable across runs
  * and re-chunking after an upstream edit touches only the edited
  * documents' rows.
  *
  * Emission rule (both engines state it identically): window starts are
  * 1, 1+stride, 1+2·stride, … ≤ max(n_tokens, 1) — every chunk carries at
  * least one token, a final shorter-than-size tail chunk is kept (its
  * content would otherwise be unreachable when stride = size), and an
  * empty document yields one empty chunk so corpus accounting stays
  * total (`Σ chunks ≥ docs`, n_tokens = 0 marks the degenerate row).
  */
object Chunking {

  /** (idCol, chunk_idx, chunk_start, n_tokens, chunk_text): fixed-size
    * token windows of `size` advancing by `stride` (1 ≤ stride ≤ size). */
  def chunk(docs: DataFrame, textCol: String, idCol: String,
      size: Int, stride: Int): DataFrame = {
    require(size >= 1, s"chunk size must be >= 1, got $size")
    require(stride >= 1 && stride <= size,
      s"stride must be in [1, size], got $stride (size $size)")
    docs
      .withColumn("_w", filter(split(col(textCol), " "), t => length(t) > 0))
      .select(col(idCol),
        posexplode(expr(
          s"""transform(sequence(1, greatest(size(_w), 1), $stride),
             |            s -> struct(s AS start, slice(_w, s, $size) AS toks))"""
            .stripMargin)).as(Seq("chunk_idx", "c")))
      .select(col(idCol),
        col("chunk_idx").cast("long").as("chunk_idx"),
        col("c.start").cast("long").as("chunk_start"),
        org.apache.spark.sql.functions.size(col("c.toks"))
          .cast("long").as("n_tokens"),
        array_join(col("c.toks"), " ").as("chunk_text"))
  }

  /** Chunk-level near-duplicate suppression: chunk the corpus, then keep
    * each distinct chunk text's first occurrence — the composition that
    * feeds a RAG index builder (duplicate boilerplate chunks would
    * otherwise dominate retrieval). First-wins by (doc, position), the
    * [[Dedup.lineDedup]] rule; one chunk-text-keyed shuffle with map-side
    * combinable min. */
  def chunkDedup(docs: DataFrame, textCol: String, idCol: String,
      size: Int, stride: Int): DataFrame = {
    val chunks = chunk(docs, textCol, idCol, size, stride)
    val canon = chunks
      .groupBy("chunk_text")
      .agg(min(struct(col(idCol), col("chunk_idx"))).as("first"))
    chunks.join(canon, Seq("chunk_text"))
      .withColumn("is_kept",
        struct(col(idCol), col("chunk_idx")) === col("first"))
      .select(col(idCol), col("chunk_idx"), col("n_tokens"),
        col("chunk_text"), col("is_kept"))
  }
}
