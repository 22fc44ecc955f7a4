package graft.ext

import graft.SparkTestBase
import graft.streaming.Runner
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The incremental curation gate (Curation.gate inside a checkpointed
  * foreachBatch topology — the st_curation_gate_stream shape):
  *   - streamed gate output equals the batch gate on the same slice;
  *   - restarting from the checkpoint with no new input re-emits NOTHING;
  *   - a file arriving after a restart is gated exactly once.
  */
class CurationGateStreamSpec extends SparkTestBase {

  private def fixtureDocs(ids: Range): DataFrame = {
    import spark.implicits._
    // long-enough texts that the quality gate keeps most, with one
    // PII-bearing doc and one repetitive (dup-2-gram) doc per slice
    ids.map { i =>
      // varied vocabulary so the dup-2-gram fraction stays low for normal
      // docs — the repetition gate must only catch the designated spam doc
      val body = (1 to 60).map(j => s"tok${(i * 53 + j * 17) % 211}").mkString(" ")
      val text =
        if (i % 5 == 0) s"$body mail me at a$i@example.com now"
        else if (i % 7 == 0) "spam spam " * 30
        else body
      (i.toLong, text, if (i % 2 == 0) "en" else "de", "web", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  private def runGateStream(inDir: String, outDir: String, ck: String,
      model: DataFrame): Unit = {
    val schema = "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
    val stream = spark.readStream.schema(schema).parquet(s"$inDir/*")
    val q = Runner.toBatchSink(stream, ck) { (batch, _) =>
      Curation.gate(batch, "text", "doc_id", "lang", "n_chars", model,
          qualityMin = 0.3, dupFracMax = 0.5, ceMax = 10.0)
        .write.mode("append").parquet(outDir)
    }
    try q.processAllAvailable() finally q.stop()
  }

  test("streamed gate output matches the batch gate on the same slice") {
    val dir = tmpDir()
    val docs = fixtureDocs(1 to 60)
    docs.write.parquet(s"$dir/in/batch0")
    val model = LmScore.unigramModel(
      docs.filter(col("doc_id") % 3 =!= 0), "text", "lang")
    runGateStream(s"$dir/in", s"$dir/out", s"$dir/ckpt", model)

    val streamed = spark.read.parquet(s"$dir/out")
      .select("doc_id", "domain", "quality", "cross_entropy", "scrubbed")
      .collect().map(_.toSeq).toSet
    val batch = Curation.gate(docs, "text", "doc_id", "lang", "n_chars",
        model, qualityMin = 0.3, dupFracMax = 0.5, ceMax = 10.0)
      .select("doc_id", "domain", "quality", "cross_entropy", "scrubbed")
      .collect().map(_.toSeq).toSet
    assert(streamed.nonEmpty, "gate must keep some fixture docs")
    assert(streamed == batch)
    // and the gate actually gated: the pure-repetition docs are dropped
    assert(!streamed.map(_.head).contains(7L))
    // and scrubbing actually scrubbed: no raw email survives
    assert(streamed.forall(!_.last.toString.contains("@example.com")))
  }

  test("restart from checkpoint re-emits nothing; late file gated exactly once") {
    val dir = tmpDir()
    val docs = fixtureDocs(1 to 30)
    docs.write.parquet(s"$dir/in/batch0")
    val model = LmScore.unigramModel(
      docs.filter(col("doc_id") % 3 =!= 0), "text", "lang")

    runGateStream(s"$dir/in", s"$dir/out", s"$dir/ckpt", model)
    val n1 = spark.read.parquet(s"$dir/out").count()
    assert(n1 > 0)

    // restart with NO new input: checkpoint replay must emit nothing new
    runGateStream(s"$dir/in", s"$dir/out", s"$dir/ckpt", model)
    assert(spark.read.parquet(s"$dir/out").count() == n1)

    // a late-arriving slice is gated exactly once, against the SAME model
    fixtureDocs(101 to 110).write.mode("append").parquet(s"$dir/in/batch1")
    runGateStream(s"$dir/in", s"$dir/out", s"$dir/ckpt", model)
    val out3 = spark.read.parquet(s"$dir/out")
    val expectedNew = Curation.gate(fixtureDocs(101 to 110), "text", "doc_id",
        "lang", "n_chars", model, qualityMin = 0.3, dupFracMax = 0.5,
        ceMax = 10.0).count()
    assert(out3.count() == n1 + expectedNew)
    assert(out3.filter(col("doc_id") >= 101).count() == expectedNew)
    // no duplicates anywhere — exactly-once end to end
    assert(out3.select("doc_id").distinct().count() == out3.count())
  }
}
