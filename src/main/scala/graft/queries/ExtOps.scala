package graft.queries

/** Extension operators for large-scale training-data pipelines (dedup,
  * similarity search, text analysis, multimodal) — filled in by
  * graft.ext.*. See task list; populated incrementally.
  */
object ExtOps {
  val all: Seq[OpQuery] = Seq.empty
}
