package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Correctness of the two profile/retrieval operators whose oracle data
  * can't exercise every path: the synthetic orders table has no NULLs
  * (columnProfile's null accounting) and the BM25 oracle checks parity,
  * not the weighting's qualitative behavior (tf saturation, idf rarity
  * preference, length normalization).
  */
class ProfileBm25Spec extends SparkTestBase {
  import spark.implicits._

  test("columnProfile counts nulls, excludes them from distinct/min/max") {
    val df = Seq(
      (Option("a"), Option(1L)),
      (Option("b"), Option.empty[Long]),
      (Option("a"), Option(2L)),
      (Option.empty[String], Option(2L))).toDF("s", "i")
    val prof = Profiling.columnProfile(df,
        Seq("s" -> col("s"), "i" -> col("i")))
      .orderBy("col_name")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5)))
    assert(prof.toSeq == Seq(
      ("i", 4L, 1L, 2L, "1", "2"),
      ("s", 4L, 1L, 2L, "a", "b")))
  }

  test("BM25: higher tf ranks higher at equal length; absent docs unranked") {
    val docs = Seq(
      (1L, "spark spark fast"),
      (2L, "spark slow"),
      (3L, "other words here")).toDF("doc_id", "text")
    val out = TextAnalysis.bm25TopK(docs, "doc_id", "text", Seq("spark"))
      .orderBy("rank").collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 2L))
    val scores = out.map(_.getAs[Double]("score"))
    assert(scores(0) > scores(1) && scores(1) > 0.0)
  }

  test("BM25: rarer term gets higher idf weight than a ubiquitous one") {
    // 'common' appears in all 4 docs, 'rare' in 1 — same tf=1 and equal
    // doc length where they appear, so the score difference is pure idf
    val docs = Seq(
      (1L, "common rare pad"),
      (2L, "common pad pad"),
      (3L, "common pad pad"),
      (4L, "common pad pad")).toDF("doc_id", "text")
    val out = TextAnalysis.bm25TopK(docs, "doc_id", "text",
        Seq("common", "rare"))
      .where(col("doc_id") === 1L)
      .collect().map(r => r.getAs[String]("word") -> r.getAs[Double]("score"))
      .toMap
    assert(out("rare") > out("common"),
      s"rare=${out("rare")} common=${out("common")}")
  }

  test("BM25: length normalization penalizes the longer doc at equal tf") {
    val docs = Seq(
      (1L, "term pad"),
      (2L, "term pad pad pad pad pad pad pad")).toDF("doc_id", "text")
    val out = TextAnalysis.bm25TopK(docs, "doc_id", "text", Seq("term"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score"))
      .toMap
    assert(out(1L) > out(2L))
  }
}
