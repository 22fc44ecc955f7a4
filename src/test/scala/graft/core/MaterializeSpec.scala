package graft.core

import graft.SparkTestBase
import graft.ext.Dedup
import org.apache.spark.sql.functions._

/** The cluster-resilience switch the Materialize scaladoc promises: with
  * `reliable = true` + a checkpoint dir, every `.staged` call site runs
  * through reliable `checkpoint()` (blocks on the cluster FS, survives
  * executor loss) instead of `localCheckpoint()` — SAME results, proven
  * here on the staging-heaviest pipeline (dedupCorpus: shingle scan,
  * LSH, verify, iterative connected components). */
class MaterializeSpec extends SparkTestBase {
  import spark.implicits._

  private def nearDupCorpus() = {
    val rnd = new scala.util.Random(11)
    val vocab = Vector.tabulate(40)(i => s"w$i")
    val base = Vector.tabulate(30) { i =>
      (i.toLong, Vector.fill(12 + rnd.nextInt(8))(
        vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val dups = base.take(12).map { case (id, t) => (id + 100L, t) }
    (base ++ dups).toDF("doc_id", "text")
  }

  private def runPipeline() =
    Dedup.dedupCorpus(nearDupCorpus(), "text", "doc_id",
        k = 8, bands = 2, threshold = 0.5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSet

  test("reliable checkpointing yields bit-identical pipeline output") {
    val local = runPipeline()
    val ckDir = tmpDir()
    spark.sparkContext.setCheckpointDir(ckDir)
    Materialize.reliable = true
    try {
      assert(runPipeline() == local)
      // prove checkpoint() actually engaged: the reliable path writes
      // RDD block files under the configured dir, localCheckpoint never
      // touches it
      val written = new java.io.File(ckDir).listFiles()
      assert(written != null && written.nonEmpty,
        s"reliable run left $ckDir empty - checkpoint() never engaged")
    } finally Materialize.reliable = false
  }

  test("reliable without a checkpoint dir fails fast, not silently local") {
    // fresh session state: clear the dir set by the other test if any
    val noDirSpark = spark.newSession()
    val prev = spark.sparkContext.getCheckpointDir
    // SparkContext has no unset API; simulate the misconfigured cluster
    // only when nothing else set a dir in this shared-session JVM
    if (prev.isEmpty) {
      Materialize.reliable = true
      try {
        val ex = intercept[Exception] {
          Materialize.stage(noDirSpark.range(10).toDF())
        }
        assert(ex.getMessage != null)
      } finally Materialize.reliable = false
    } else {
      // a dir exists session-wide: the reliable path must simply work
      Materialize.reliable = true
      try assert(Materialize.stage(noDirSpark.range(10).toDF()).count() == 10L)
      finally Materialize.reliable = false
    }
  }
}
