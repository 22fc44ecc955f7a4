package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.Dedup

/** Bound provenance + kernel measurement for x_dedup_pipeline_fast
  * (WinnowRollingProbe pattern): wall-clock for the signature stage and
  * the full LSH dedup pipeline on each minhash kernel (seeded md5 vs
  * xxhash64), plus the verified-pair-set agreement behind the query's
  * fast_ok gate — the measurement behind SCALING.md §8.
  */
object MinhashFastProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](n: String)(f: => T): T = {
      val t = System.nanoTime(); val r = f
      println(f"[mhprobe] $n%-32s ${(System.nanoTime() - t) / 1e9}%.2f s"); r
    }
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val docs = Tables.load(spark, dir, "documents")
      // isolate the signature stage: tokens staged once outside the clock
      val tok = Dedup.shingleTokens(docs, "text", "doc_id", 3)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      tok.count()
      for (i <- 1 to 2) {
        time(s"$dir sig md5 #$i") {
          Dedup.minhashFromTokens(tok, 8)
            .write.format("noop").mode("overwrite").save() }
        time(s"$dir sig fast #$i") {
          Dedup.minhashFromTokensFast(tok, 8)
            .write.format("noop").mode("overwrite").save() }
      }
      tok.unpersist()
      for (i <- 1 to 2) {
        time(s"$dir pipeline md5 #$i") {
          Dedup.dedupCorpus(docs, "text", "doc_id")
            .write.format("noop").mode("overwrite").save() }
        time(s"$dir pipeline fast #$i") {
          Dedup.dedupCorpus(docs, "text", "doc_id", fast = true)
            .write.format("noop").mode("overwrite").save() }
      }
      // the gate's provenance: verified-pair-set agreement across kernels
      val m = Dedup.lshVerifiedPairs(docs, "text", "doc_id")
        .select("doc_a", "doc_b")
      val f = Dedup.lshVerifiedPairs(docs, "text", "doc_id", fast = true)
        .select("doc_a", "doc_b")
      val nm = m.count(); val nf = f.count()
      val ni = m.join(f, Seq("doc_a", "doc_b"), "left_semi").count()
      val jac = ni.toDouble / (nm + nf - ni)
      println(f"[mhprobe] $dir pairs md5=$nm fast=$nf inter=$ni " +
        f"agreement=$jac%.4f")
    }
    spark.stop()
  }
}
