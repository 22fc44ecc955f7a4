package graft.ext

import graft.SparkTestBase
import graft.streaming.Runner
import org.apache.spark.sql.DataFrame

/** Streaming incremental dedup (Dedup.incrementalDedupAgainst inside a
  * checkpointed foreachBatch topology — the st_dedup_incremental_stream
  * shape):
  *   - streamed flags over multiple micro-batches equal the one-shot
  *     batch run on the same rows (row-independence given the frozen
  *     index);
  *   - restarting from the checkpoint with no new input re-emits NOTHING;
  *   - a file arriving after a restart is flagged exactly once.
  */
class IncrementalDedupStreamSpec extends SparkTestBase {
  import spark.implicits._

  // same offline-verified band-colliding near-dup pair as ExtSpec
  private val ndBase = "the quick brown fox jumps over the lazy dog and " +
    "then runs far away into the deep dark forest tonight"
  private val ndVariant = "cat" + ndBase.drop(3)

  private def existing: DataFrame = Seq(
    (1L, ndBase), (2L, "an unrelated corpus document about joins"))
    .toDF("doc_id", "text")

  private def incomingA: DataFrame = Seq(
    (10L, ndBase),      // exact dup of 1
    (11L, ndVariant))   // near-dup of 1
    .toDF("doc_id", "text")

  private def incomingB: DataFrame = Seq(
    (12L, "completely novel content about catalyst optimizer rules"))
    .toDF("doc_id", "text")

  private def runStream(inDir: String, outDir: String, ck: String,
      index: Dedup.CorpusIndex): Unit = {
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING").parquet(s"$inDir/*")
    val q = Runner.toBatchSink(stream, ck) { (batch, _) =>
      Dedup.incrementalDedupAgainst(index, batch, "text", "doc_id")
        .write.mode("append").parquet(outDir)
    }
    try q.processAllAvailable() finally q.stop()
  }

  private def flags(dir: String): Map[Long, (Long, Long, Long)] =
    spark.read.parquet(dir)
      .select("doc_id", "dropped_exact", "dropped_near", "is_kept")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("streamed micro-batches equal the one-shot batch run") {
    val dir = tmpDir()
    incomingA.write.parquet(s"$dir/in/b0")
    incomingB.write.parquet(s"$dir/in/b1")
    val index = Dedup.buildCorpusIndex(existing, "text", "doc_id")
    runStream(s"$dir/in", s"$dir/out", s"$dir/ckpt", index)
    val streamed = flags(s"$dir/out")
    val batch = Dedup.incrementalDedup(existing,
        incomingA.unionByName(incomingB), "text", "doc_id")
      .select("doc_id", "dropped_exact", "dropped_near", "is_kept")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(streamed == batch)
    assert(streamed(10L) == ((1L, 1L, 0L))) // exact dup also jaccard-1.0 near
    assert(streamed(11L) == ((0L, 1L, 0L)))
    assert(streamed(12L) == ((0L, 0L, 1L)))
  }

  test("restart re-emits nothing; a late file is flagged exactly once") {
    val dir = tmpDir()
    incomingA.write.parquet(s"$dir/in/b0")
    val index = Dedup.buildCorpusIndex(existing, "text", "doc_id")
    runStream(s"$dir/in", s"$dir/out", s"$dir/ckpt", index)
    val afterFirst = flags(s"$dir/out")
    assert(afterFirst.keySet == Set(10L, 11L))

    // restart with no new input: the checkpoint must suppress re-emission
    runStream(s"$dir/in", s"$dir/out", s"$dir/ckpt", index)
    assert(spark.read.parquet(s"$dir/out").count() == 2)

    // a file landing after the restart is processed exactly once
    incomingB.write.parquet(s"$dir/in/b1")
    runStream(s"$dir/in", s"$dir/out", s"$dir/ckpt", index)
    val finalFlags = flags(s"$dir/out")
    assert(spark.read.parquet(s"$dir/out").count() == 3)
    assert(finalFlags(12L) == ((0L, 0L, 1L)))
  }

  // ---------- embedding-side gate (Similarity.srpDedupAgainst) ----------

  private def runSrpStream(inDir: String, outDir: String, ck: String,
      index: Similarity.SrpIndex): Unit = {
    val stream = spark.readStream
      .schema("vec_id LONG, embedding ARRAY<FLOAT>").parquet(s"$inDir/*")
    val q = Runner.toBatchSink(stream, ck) { (batch, _) =>
      Similarity.srpDedupAgainst(index, batch, "vec_id", "embedding")
        .write.mode("append").parquet(outDir)
    }
    try q.processAllAvailable() finally q.stop()
  }

  test("SRP gate: dup-of-index dropped across batches, restart re-emits nothing") {
    val dir = tmpDir()
    val e0 = Array(1.0f, 0.0f, 0.0f, 0.0f)
    val far = Array(0.0f, 1.0f, 0.0f, 0.0f)
    val index = Similarity.buildSrpIndex(
      Seq((0L, e0)).toDF("vec_id", "embedding"), "vec_id", "embedding",
      dim = 4, nBits = 8, bandBits = 4, threshold = 0.9)
    Seq((1L, e0), (3L, far)).toDF("vec_id", "embedding")
      .write.parquet(s"$dir/in/b0")
    runSrpStream(s"$dir/in", s"$dir/out", s"$dir/ckpt", index)
    val kept = spark.read.parquet(s"$dir/out")
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(3L)) // the index dup is gated, the novel vector kept

    // restart with no new input: nothing re-emitted
    runSrpStream(s"$dir/in", s"$dir/out", s"$dir/ckpt", index)
    assert(spark.read.parquet(s"$dir/out").count() == 1)

    // a late batch with another index dup is gated exactly once
    Seq((5L, Array(2.0f, 0.0f, 0.0f, 0.0f)), (7L, Array(0.0f, 0.0f, 3.0f, 0.0f)))
      .toDF("vec_id", "embedding").write.parquet(s"$dir/in/b1")
    runSrpStream(s"$dir/in", s"$dir/out", s"$dir/ckpt", index)
    val finalKept = spark.read.parquet(s"$dir/out")
      .select("vec_id").as[Long].collect().toSet
    assert(finalKept == Set(3L, 7L)) // 5 ∥ e0 (cosine 1.0) → gated
  }

  private def runSrpIncrStream(inDir: String, outDir: String, ck: String,
      seenRoot: String, index: Similarity.SrpIndex,
      compactEvery: Int = 8): Unit = {
    val stream = spark.readStream
      .option("maxFilesPerTrigger", "1")
      .schema("vec_id LONG, embedding ARRAY<FLOAT>").parquet(s"$inDir/*")
    val q = Runner.toBatchSink(stream, ck) { (batch, batchId) =>
      Similarity.srpDedupStep(index, seenRoot, outDir, batchId, batch,
        "vec_id", "embedding", compactEvery = compactEvery)
    }
    try q.processAllAvailable() finally q.stop()
  }

  private def srpOut(dir: String): Set[Long] =
    spark.read.option("recursiveFileLookup", "true").parquet(s"$dir/out")
      .select("vec_id").as[Long].collect().toSet

  private def srpOutCount(dir: String): Long =
    spark.read.option("recursiveFileLookup", "true").parquet(s"$dir/out")
      .count()

  test("SRP index refresh: a batch-2 near-dup of a batch-1 SURVIVOR is " +
      "gated, restart-safe (srpDedupStep durable state)") {
    val dir = tmpDir()
    val e0 = Array(1.0f, 0.0f, 0.0f, 0.0f)   // frozen corpus
    val b = Array(0.0f, 1.0f, 0.0f, 0.0f)    // batch-1 survivor
    val bDup = Array(0.0f, 2.0f, 0.0f, 0.0f) // ∥ b, ⊥ e0 — only the
                                             // EXTENDED index can gate it
    val novel = Array(0.0f, 0.0f, 0.0f, 4.0f)
    val index = Similarity.buildSrpIndex(
      Seq((0L, e0)).toDF("vec_id", "embedding"), "vec_id", "embedding",
      dim = 4, nBits = 8, bandBits = 4, threshold = 0.9)
    // staggered mtimes → maxFilesPerTrigger=1 replays b0 before b1
    Seq((1L, b)).toDF("vec_id", "embedding").write.parquet(s"$dir/in/b0")
    val t0 = System.currentTimeMillis() - 600000L
    new java.io.File(s"$dir/in/b0").listFiles().foreach(_.setLastModified(t0))
    Seq((3L, bDup), (5L, novel)).toDF("vec_id", "embedding")
      .write.parquet(s"$dir/in/b1")
    runSrpIncrStream(s"$dir/in", s"$dir/out", s"$dir/ckpt", s"$dir/seen", index)
    val kept = srpOut(dir)
    assert(kept == Set(1L, 5L),
      s"batch-2 near-dup of the batch-1 survivor must be gated, got $kept")

    // kill/restart: no re-emission, and a post-restart near-dup of the
    // PRE-RESTART survivor is still gated (the durable seen/ dirs are the
    // recovery source, not driver memory)
    runSrpIncrStream(s"$dir/in", s"$dir/out", s"$dir/ckpt", s"$dir/seen", index)
    assert(srpOutCount(dir) == 2)
    Seq((7L, Array(0.0f, 3.0f, 0.0f, 0.0f)), (9L, Array(0.0f, 0.0f, 5.0f, 0.0f)))
      .toDF("vec_id", "embedding").write.parquet(s"$dir/in/b2")
    runSrpIncrStream(s"$dir/in", s"$dir/out", s"$dir/ckpt", s"$dir/seen", index)
    val finalKept = srpOut(dir)
    assert(finalKept == Set(1L, 5L, 9L),
      s"post-restart near-dup of a pre-restart survivor must be gated, got $finalKept")
  }

  test("SRP compaction: folded base + GC'd deltas produce identical keeps, " +
      "restart-safe (srpDedupStep LSM treatment)") {
    val dir = tmpDir()
    val e0 = Array(1.0f, 0.0f, 0.0f, 0.0f)
    val index = Similarity.buildSrpIndex(
      Seq((0L, e0)).toDF("vec_id", "embedding"), "vec_id", "embedding",
      dim = 4, nBits = 8, bandBits = 4, threshold = 0.9)
    // six staggered single-file batches: b_i carries a novel axis vector
    // except b3 (near-dup of b1's survivor) and b5 (near-dup of b2's) —
    // gating b3/b5 requires survivors folded through the compacted base
    val axes = Seq(
      Array(0.0f, 1.0f, 0.0f, 0.0f),  // b0: survivor 1
      Array(0.0f, 0.0f, 1.0f, 0.0f),  // b1: survivor 3
      Array(0.0f, 0.0f, 0.0f, 1.0f),  // b2: survivor 5
      Array(0.0f, 0.0f, 2.0f, 0.0f),  // b3: ∥ b1's → gated
      Array(0.5f, 0.5f, 0.5f, 0.5f),  // b4: survivor 9
      Array(0.0f, 0.0f, 0.0f, 3.0f))  // b5: ∥ b2's → gated
    val t0 = System.currentTimeMillis() - 600000L
    axes.zipWithIndex.foreach { case (v, i) =>
      Seq((2L * i + 1L, v)).toDF("vec_id", "embedding")
        .write.parquet(s"$dir/in/b$i")
      new java.io.File(s"$dir/in/b$i").listFiles()
        .foreach(_.setLastModified(t0 + i * 60000L))
    }
    // compactEvery=2: folds fire repeatedly across the six batches
    runSrpIncrStream(s"$dir/in", s"$dir/out", s"$dir/ckpt", s"$dir/seen",
      index, compactEvery = 2)
    assert(srpOut(dir) == Set(1L, 3L, 5L, 9L),
      s"near-dups of folded survivors must still be gated, got ${srpOut(dir)}")
    // the LSM shape actually happened: a base dir exists and folded
    // deltas were GC'd (only post-fold deltas remain)
    val seenNames = new java.io.File(s"$dir/seen").listFiles()
      .map(_.getName).toSet
    assert(seenNames.exists(_.startsWith("base-")), s"no base dir: $seenNames")
    assert(seenNames.count(_.matches("b\\d+")) < axes.size,
      s"folded deltas were not GC'd: $seenNames")

    // kill/restart over the compacted state: no re-emission, and a new
    // batch near-dupping a long-folded survivor is still gated
    runSrpIncrStream(s"$dir/in", s"$dir/out", s"$dir/ckpt", s"$dir/seen",
      index, compactEvery = 2)
    assert(srpOutCount(dir) == 4)
    Seq((101L, Array(0.0f, 2.0f, 0.0f, 0.0f)),   // ∥ b0's survivor → gated
        (103L, Array(1.0f, -1.0f, 1.0f, -1.0f))) // novel
      .toDF("vec_id", "embedding").write.parquet(s"$dir/in/b6")
    runSrpIncrStream(s"$dir/in", s"$dir/out", s"$dir/ckpt", s"$dir/seen",
      index, compactEvery = 2)
    assert(srpOut(dir) == Set(1L, 3L, 5L, 9L, 103L),
      s"near-dup of a long-folded survivor must be gated, got ${srpOut(dir)}")
  }
}
