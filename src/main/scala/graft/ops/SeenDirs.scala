package graft.ops

import org.apache.spark.sql.SparkSession

/** LSM-style lifecycle for the durable per-batch survivor dirs the
  * incremental-dedup foreachBatch topologies keep under a `seenRoot`
  * (st_srp_dedup_stream, st_line_dedup_stream): each batch writes its
  * own `b<batchId>` dir with overwrite semantics (idempotent under
  * at-least-once replay), and batch N's effective prior state is every
  * strictly-earlier dir. Without compaction that read grows linearly
  * with batch count — the defect VERDICT r13 #4 named — so once the
  * effective set spans `compactEvery` dirs they fold into a
  * `base-<maxFoldedBatch>` dir and the folded sources are
  * garbage-collected.
  *
  * Crash safety by construction, no commit protocol needed:
  *   - readers pick the NEWEST base strictly older than their batch and
  *     only deltas newer than it, so a stale folded delta (GC crashed
  *     mid-way) is simply ignored;
  *   - a replay of the compacting batch re-reads base + remaining deltas
  *     — the same effective content either way;
  *   - bases named by a batch id ≥ the reader's are ignored (anomalous
  *     manual replays degrade to the uncompacted path, never to wrong
  *     state).
  */
object SeenDirs {

  /** The dirs batch `batchId` must read as its prior state, after any
    * due compaction. Folding happens HERE (read side) so every caller
    * gets it without extra wiring: when the effective set has at least
    * `compactEvery` dirs, their union parquet is rewritten to
    * `base-<maxFolded>` and the sources deleted. Returns absolute paths
    * (possibly empty). */
  def effectiveDirs(spark: SparkSession, seenRoot: String, batchId: Long,
      compactEvery: Int = 8): Seq[String] = {
    def ls(re: String): Seq[(Long, java.io.File)] =
      Option(new java.io.File(seenRoot).listFiles())
        .getOrElse(Array.empty[java.io.File]).toSeq
        .filter(_.getName.matches(re))
        .map(f => (f.getName.dropWhile(!_.isDigit).toLong, f))
    val base = ls("base-\\d+").filter(_._1 < batchId).sortBy(-_._1).headOption
    val upto = base.map(_._1).getOrElse(-1L)
    val deltas = ls("b\\d+")
      .filter { case (i, _) => i > upto && i < batchId }.sortBy(_._1)
    var effSrc = base.toSeq ++ deltas
    if (effSrc.size >= math.max(2, compactEvery) && deltas.nonEmpty) {
      val maxId = deltas.last._1
      val foldDir = s"$seenRoot/base-$maxId"
      spark.read.parquet(effSrc.map(_._2.getAbsolutePath): _*)
        .write.mode("overwrite").parquet(foldDir)
      // best-effort GC of the folded sources: crash-safe because readers
      // ignore deltas at or below the newest base's id
      effSrc.foreach { case (_, f) => graft.core.Scratch.deleteRecursively(f) }
      effSrc = Seq((maxId, new java.io.File(foldDir)))
    }
    effSrc.map(_._2.getAbsolutePath)
  }
}
