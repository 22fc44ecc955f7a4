package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.Similarity

/** Micro-benchmark: native VectorCosine expression vs the
  * zip_with+aggregate composition on the ANN brute-force scoring loop.
  * Uses 200 query vectors × full corpus so the scoring loop dominates. */
object VectorBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = Tables.load(spark, sfDir, "embeddings")
    val q = e.filter(col("vec_id") < 200)
    def time(label: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; val s = (System.nanoTime() - t0) / 1e9
      println(f"[vecbench] $label%-10s $s%.2f s"); s
    }
    // warmup both paths
    Similarity.cosineTopK(e, "vec_id", "embedding", q.limit(1), 5).count()
    Similarity.cosineTopKNative(e, "vec_id", "embedding", q.limit(1), 5).count()
    val composed = time("zip_with") {
      Similarity.cosineTopK(e, "vec_id", "embedding", q, 5)
        .write.format("noop").mode("overwrite").save()
    }
    val native = time("native") {
      Similarity.cosineTopKNative(e, "vec_id", "embedding", q, 5)
        .write.format("noop").mode("overwrite").save()
    }
    println(f"[vecbench] speedup ${composed / native}%.2fx")
    spark.stop()
  }
}
