package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Chunking invariants the oracle can't see in isolation: exact window
  * boundaries/overlap, total-coverage accounting, the empty-document
  * degenerate row, stride = size (disjoint) behavior, and first-wins
  * chunk dedup. */
class ChunkingSpec extends SparkTestBase {
  import spark.implicits._

  private val doc12 = (1 to 12).map(i => s"t$i").mkString(" ")

  test("windows advance by stride, overlap size-stride, keep the tail") {
    val got = Chunking.chunk(Seq((1L, doc12)).toDF("doc_id", "text"),
        "text", "doc_id", size = 5, stride = 3)
      .orderBy("chunk_idx")
      .as[(Long, Long, Long, Long, String)].collect()
    assert(got.map(_._3).toSeq == Seq(1L, 4L, 7L, 10L), "starts 1,4,7,10")
    assert(got.map(_._4).toSeq == Seq(5L, 5L, 5L, 3L), "tail chunk kept short")
    assert(got(0)._5 == "t1 t2 t3 t4 t5")
    assert(got(1)._5 == "t4 t5 t6 t7 t8", "overlap = size - stride = 2")
    assert(got(3)._5 == "t10 t11 t12")
    // every token position is covered by at least one chunk
    val covered = got.flatMap(c => c._3 until (c._3 + c._4)).toSet
    assert(covered == (1L to 12L).toSet)
  }

  test("stride = size chunks disjointly; empty doc yields one empty chunk") {
    val disjoint = Chunking.chunk(Seq((1L, doc12)).toDF("doc_id", "text"),
        "text", "doc_id", size = 5, stride = 5)
      .orderBy("chunk_idx").as[(Long, Long, Long, Long, String)].collect()
    assert(disjoint.map(_._4).toSeq == Seq(5L, 5L, 2L))
    assert(disjoint.flatMap(_._5.split(" ")).toSeq ==
      (1 to 12).map(i => s"t$i"), "disjoint chunks reconcatenate the doc")

    val empty = Chunking.chunk(Seq((7L, "  ")).toDF("doc_id", "text"),
        "text", "doc_id", size = 5, stride = 5)
      .as[(Long, Long, Long, Long, String)].collect()
    assert(empty.toSeq == Seq((7L, 0L, 1L, 0L, "")),
      "accounting stays total: one degenerate row, n_tokens 0")
  }

  test("chunkDedup keeps the first (doc, idx) occurrence of a chunk text") {
    val docs = Seq((1L, "a b c d"), (2L, "a b c d"), (3L, "x y"))
      .toDF("doc_id", "text")
    val got = Chunking.chunkDedup(docs, "text", "doc_id", size = 4, stride = 4)
      .select("doc_id", "is_kept").as[(Long, Boolean)].collect().toMap
    assert(got == Map(1L -> true, 2L -> false, 3L -> true))
  }

  test("chunking is map-only: no hash exchange in the plan") {
    val df = Chunking.chunk(Seq((1L, doc12)).toDF("doc_id", "text"),
      "text", "doc_id", size = 5, stride = 3)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("hashpartitioning"), p)
  }
}
