package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.Dedup
import graft.core.Materialize.StageSyntax

/** The recall half of [[MinhashFastProbe]] alone, for the 100× (sfXL)
  * corpus where the full probe's timing sections have already been
  * captured and the remaining question is whether the §8a/§9a retrieval
  * laws hold a second decade: per-kernel minhash recall, and the 64-bit
  * simhash recall against the ≥0.8 truth slice, vs rare-shingle-blocked
  * exact-Jaccard ground truth.
  *
  * Args: corpus dirs (default target/rehearsal/sfXL).
  */
object XlRecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dirs = if (args.nonEmpty) args.toSeq else Seq("target/rehearsal/sfXL")
    for (dir <- dirs) {
      val docs = Tables.load(spark, dir, "documents")
      val m = Dedup.lshVerifiedPairs(docs, "text", "doc_id")
        .select("doc_a", "doc_b").staged
      val f = Dedup.lshVerifiedPairs(docs, "text", "doc_id", fast = true)
        .select("doc_a", "doc_b").staged
      val nm = m.count(); val nf = f.count()
      val ni = m.join(f, Seq("doc_a", "doc_b"), "left_semi").count()
      println(f"[xlprobe] $dir pairs md5=$nm fast=$nf inter=$ni " +
        f"agreement=${ni.toDouble / (nm + nf - ni)}%.4f")
      val tok2 = Dedup.shingleTokens(docs, "text", "doc_id", 3).staged
      val dfreq = tok2.groupBy("word").agg(count(lit(1)).as("_d"))
      val rare = tok2.join(dfreq.filter(col("_d") <= 10).select("word"),
        Seq("word"))
      val cand = rare.select(col("id").as("doc_a"), col("word"))
        .join(rare.select(col("id").as("doc_b"), col("word")), Seq("word"))
        .filter(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b").distinct()
      val gtAll = Dedup.jaccardOnTokens(tok2, cand, 0.5)
        .select("doc_a", "doc_b", "jaccard").staged
      val gt = gtAll.select("doc_a", "doc_b")
      val ngt = gt.count()
      val rm = gt.join(m, Seq("doc_a", "doc_b"), "left_semi").count()
      val rf = gt.join(f, Seq("doc_a", "doc_b"), "left_semi").count()
      println(f"[xlprobe] $dir gt=$ngt recall_md5=${rm.toDouble / ngt}%.4f " +
        f"recall_fast=${rf.toDouble / ngt}%.4f")
      val sm64 = Dedup.simhashNeardupPairs(docs, "text", "doc_id",
        bits = 64, maxHam = 3, fast = true)
        .select("doc_a", "doc_b").staged
      val n64 = sm64.count()
      val r64 = gt.join(sm64, Seq("doc_a", "doc_b"), "left_semi").count()
      val gtHi = gtAll.filter(col("jaccard") >= 0.8).select("doc_a", "doc_b")
        .staged
      val nHi = gtHi.count()
      val rHi = gtHi.join(sm64, Seq("doc_a", "doc_b"), "left_semi").count()
      println(f"[xlprobe] $dir simhash64 pairs=$n64 " +
        f"recall_gt05=${r64.toDouble / math.max(ngt, 1)}%.4f (n=$ngt) " +
        f"recall_gt08=${rHi.toDouble / math.max(nHi, 1)}%.4f (n=$nHi)")
    }
    spark.stop()
  }
}
