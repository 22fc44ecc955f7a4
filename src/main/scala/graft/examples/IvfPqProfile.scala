package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.Similarity

/** Stage cost breakdown for x_ann_ivfpq (VERDICT r13 #2: the round's one
  * perf flag — 2.41 s at r12 vs a reproducible ~4.4 s quiet-window
  * median since r13, definition unchanged). Times, cold + warm:
  * the PQ codebook train, the coarse probe (probeCells via the public
  * ivfTopK's plumbing is private — timed through the composed query
  * minus its parts), the composed ivfPqTopK, the full-scan pqTopK (its
  * non-IVF sibling, for the pruning-should-be-cheaper comparison), and
  * the exact brute pass both registry queries also pay for their recall
  * gates. */
object IvfPqProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = Tables.load(spark, sfDir, "embeddings")
    val q = e.filter(col("vec_id") < 8)
    val n = e.count()
    val nLabels = e.select("label").distinct().count()
    println(s"[ivfpqprof] corpus=$n labels=$nLabels")
    def time[T](name: String)(f: => T): T = {
      val t = System.nanoTime(); val r = f
      println(f"[ivfpqprof] $name%-26s ${(System.nanoTime() - t) / 1e9}%.2f s")
      r
    }
    for (i <- 1 to 2) {
      time(s"codebook 16x16 iters=3 #$i") {
        Similarity.pqCodebook(e, "vec_id", "embedding", 16, 16, 3).count() }
      time(s"ivfTopK probe=2 #$i") {
        Similarity.ivfTopK(e, "vec_id", "embedding", "label", q, 5, 2)
          .write.format("noop").mode("overwrite").save() }
      time(s"pqTopK full-scan #$i") {
        Similarity.pqTopK(e, "vec_id", "embedding", q, 5, 16, 16, 3)
          .write.format("noop").mode("overwrite").save() }
      time(s"ivfPqTopK probe=2 #$i") {
        Similarity.ivfPqTopK(e, "vec_id", "embedding", "label", q, 5, 2,
            16, 16, 3)
          .write.format("noop").mode("overwrite").save() }
      time(s"brute exact #$i") {
        Similarity.cosineTopK(e, "vec_id", "embedding", q, 5)
          .write.format("noop").mode("overwrite").save() }
    }
    spark.stop()
  }
}
