package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.Similarity

/** Cost breakdown behind the round-10 trainer redesign: times the PQ
  * codebook (iters 3 vs 1 — the difference is the Lloyd refinement
  * rounds), the full pqTopK query, and the brute-force exact pass, twice
  * (cold + warm). Pre-r10 the refinement rounds cost ~3 s of pure
  * per-job latency (broadcast join + corpus-keyed TopK groupBy + second
  * groupBy + two localCheckpoints per round) — the literal-book redesign
  * (one aggregation per round, map-only assignment) is measured here.
  */
object PqProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = Tables.load(spark, sfDir, "embeddings")
    val q = e.filter(col("vec_id") < 8)
    def time[T](n: String)(f: => T): T = {
      val t = System.nanoTime(); val r = f
      println(f"[pqprof] $n%-22s ${(System.nanoTime() - t) / 1e9}%.2f s"); r
    }
    for (i <- 1 to 2) {
      time(s"codebook iters=3 #$i") {
        Similarity.pqCodebook(e, "vec_id", "embedding", 16, 16, 3).count() }
      time(s"codebook iters=1 #$i") {
        Similarity.pqCodebook(e, "vec_id", "embedding", 16, 16, 1).count() }
      time(s"pqTopK full #$i") {
        Similarity.pqTopK(e, "vec_id", "embedding", q, 5, 16, 16, 3)
          .write.format("noop").mode("overwrite").save() }
      time(s"brute exact #$i") {
        Similarity.cosineTopK(e, "vec_id", "embedding", q, 5)
          .write.format("noop").mode("overwrite").save() }
    }
    spark.stop()
  }
}
