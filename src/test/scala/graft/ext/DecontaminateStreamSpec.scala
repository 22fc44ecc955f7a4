package graft.ext

import graft.SparkTestBase
import graft.streaming.Runner
import org.apache.spark.sql.DataFrame

/** Streaming decontamination (TextAnalysis.contaminationAgainst inside a
  * checkpointed foreachBatch topology — the st_decontaminate_stream
  * shape):
  *   - streamed flags over multiple micro-batches equal the one-shot
  *     two-frame batch run on the same rows (row-independence given the
  *     frozen benchmark index);
  *   - restarting from the checkpoint with no new input re-emits NOTHING;
  *   - a file arriving after a restart is flagged exactly once.
  */
class DecontaminateStreamSpec extends SparkTestBase {
  import spark.implicits._

  // ndBase/ndVariant share a ≥19-char run (the ExtSpec pair), so both
  // carry winnowing fingerprints of the benchmark doc
  private val ndBase = "the quick brown fox jumps over the lazy dog and " +
    "then runs far away into the deep dark forest tonight"
  private val ndVariant = "cat" + ndBase.drop(3)

  private def bench: DataFrame = Seq(
    (7L, ndBase)).toDF("doc_id", "text")

  private def incomingA: DataFrame = Seq(
    (10L, ndBase),                                        // exact copy
    (11L, "an unrelated corpus document about joins"))    // clean
    .toDF("doc_id", "text")

  private def incomingB: DataFrame = Seq(
    (12L, ndVariant))                                     // near copy
    .toDF("doc_id", "text")

  private def runStream(inDir: String, outDir: String, ck: String,
      index: TextAnalysis.BenchIndex): Unit = {
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING").parquet(s"$inDir/*")
    val q = Runner.toBatchSink(stream, ck) { (batch, _) =>
      TextAnalysis.contaminationAgainst(index, batch, "text", "doc_id")
        .write.mode("append").parquet(outDir)
    }
    try q.processAllAvailable() finally q.stop()
  }

  private def flagged(dir: String): Map[Long, Long] =
    spark.read.parquet(dir)
      .select("doc_id", "n_shared_fps")
      .as[(Long, Long)].collect().toMap

  test("streamed micro-batches equal the one-shot two-frame batch run") {
    val dir = tmpDir()
    incomingA.write.parquet(s"$dir/in/b0")
    incomingB.write.parquet(s"$dir/in/b1")
    val index = TextAnalysis.buildBenchIndex(bench, "text", "doc_id")
    runStream(s"$dir/in", s"$dir/out", s"$dir/ckpt", index)
    val streamed = flagged(s"$dir/out")
    val batch = TextAnalysis.contamination(
        incomingA.unionByName(incomingB), bench, "text", "doc_id")
      .as[(Long, Long)].collect().toMap
    assert(streamed == batch)
    assert(streamed.contains(10L) && streamed.contains(12L))
    assert(!streamed.contains(11L)) // the clean doc never appears
  }

  test("restart re-emits nothing; a late file is flagged exactly once") {
    val dir = tmpDir()
    incomingA.write.parquet(s"$dir/in/b0")
    val index = TextAnalysis.buildBenchIndex(bench, "text", "doc_id")
    runStream(s"$dir/in", s"$dir/out", s"$dir/ckpt", index)
    val afterFirst = flagged(s"$dir/out")
    assert(afterFirst.keySet == Set(10L))

    // restart with no new input: the checkpoint must suppress re-emission
    runStream(s"$dir/in", s"$dir/out", s"$dir/ckpt", index)
    assert(flagged(s"$dir/out") == afterFirst)

    // a file landing after the restart is processed exactly once
    incomingB.write.parquet(s"$dir/in/b1")
    runStream(s"$dir/in", s"$dir/out", s"$dir/ckpt", index)
    val afterLate = flagged(s"$dir/out")
    assert(afterLate.keySet == Set(10L, 12L))
    assert(afterLate(10L) == afterFirst(10L))
  }

  test("an empty benchmark index flags nothing") {
    val dir = tmpDir()
    incomingA.write.parquet(s"$dir/in/b0")
    val index = TextAnalysis.buildBenchIndex(
      bench.filter($"doc_id" < 0), "text", "doc_id")
    runStream(s"$dir/in", s"$dir/out", s"$dir/ckpt", index)
    assert(spark.read.parquet(s"$dir/out").isEmpty)
  }
}
