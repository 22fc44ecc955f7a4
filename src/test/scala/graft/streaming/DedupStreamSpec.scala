package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.streaming.Trigger

/** Multi-batch semantics of the streaming ingest dedup
  * (graft.streaming.IngestDedup): first-batch-wins admission, min-id
  * keeper within a batch, and checkpoint-restart exactly-once. */
class DedupStreamSpec extends SparkTestBase {
  import spark.implicits._

  private def runOnce(in: String, out: String, ck: String): Unit = {
    val docs = spark.readStream.schema("doc_id LONG, text STRING")
      .parquet(s"$in/*")
    val q = IngestDedup.firstWins(docs, "text", "doc_id")
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ck)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    try q.processAllAvailable() finally q.stop()
  }

  test("first-batch-wins across micro-batches; min-id keeper within a batch") {
    val dir = tmpDir()
    // batch 0: "aa" arrives as ids 7 and 3 → admitted with keeper 3
    Seq((7L, "aa"), (3L, "aa"), (5L, "bb"))
      .toDF("doc_id", "text").write.parquet(s"$dir/in/b0")
    runOnce(s"$dir/in", s"$dir/out", s"$dir/ck")
    // keys are md5 digests — assert on (keeper, count) pairs instead
    val r1 = spark.read.parquet(s"$dir/out")
      .as[(String, Long, Long)].collect().map(r => (r._2, r._3)).toSet
    assert(r1 == Set((3L, 2L), (5L, 1L)))

    // batch 1: "aa" again with a LOWER id (1) → NOT re-admitted (state
    // wins, arrival time beats id); new hash "cc" admitted
    Seq((1L, "aa"), (9L, "cc"))
      .toDF("doc_id", "text").write.mode("append").parquet(s"$dir/in/b1")
    runOnce(s"$dir/in", s"$dir/out", s"$dir/ck")
    val r2 = spark.read.parquet(s"$dir/out")
      .as[(String, Long, Long)].collect().map(r => r._2 -> r._3).toMap
    assert(r2 == Map(3L -> 2L, 5L -> 1L, 9L -> 1L))

    // restart with no new data: nothing re-emitted
    runOnce(s"$dir/in", s"$dir/out", s"$dir/ck")
    assert(spark.read.parquet(s"$dir/out").count() == 3)
  }
}
