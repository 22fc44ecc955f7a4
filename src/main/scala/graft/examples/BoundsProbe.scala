package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.Similarity

/** One-off measurement behind the round-10 bounds-gate thresholds: prints
  * the per-query hit count (|approx top-5 ∩ exact top-5|) for each ANN
  * family and the is_kept agreement fraction between the iters=3 and
  * 1-round SemDedup-over-k-means variants, per SF dir. The gated queries
  * (x_ann_pq / x_ann_ivfpq / x_ann_ivf_kmeans / x_semdedup_kmeans) assert
  * thresholds chosen strictly below the minima measured here.
  */
object BoundsProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    for (dir <- dirs) {
      val e = Tables.load(spark, dir, "embeddings")
      val q = e.filter(col("vec_id") < 8)
      val exact = Similarity.cosineTopK(e, "vec_id", "embedding", q, k = 5)

      def hitStats(name: String, approx: org.apache.spark.sql.DataFrame): Unit = {
        val g = Similarity.recallGate(exact, approx, minHits = 0)
          .groupBy("qid").agg(first("hits_at_k").as("h"))
          .agg(min("h"), avg("h")).collect()(0)
        println(f"[bounds] $dir $name%-14s minHits=${g.getLong(0)} avgHits=${g.getDouble(1)}%.2f")
      }

      hitStats("pq", Similarity.pqTopK(e, "vec_id", "embedding", q,
        k = 5, m = 16, ksub = 16, iters = 3))
      hitStats("ivfpq", Similarity.ivfPqTopK(e, "vec_id", "embedding", "label", q,
        k = 5, nProbe = 2, m = 16, ksub = 16))
      hitStats("ivfpq_rerank", Similarity.ivfPqRerankTopK(e, "vec_id",
        "embedding", "label", q, k = 5, nProbe = 2, m = 16, ksub = 16,
        coarseC = 20))
      val cells = Similarity.kmeansAssign(e, "vec_id", "embedding", k = 8, iters = 3)
        .withColumnRenamed("id", "vec_id")
      hitStats("ivf_kmeans", Similarity.ivfTopK(e.join(cells, Seq("vec_id")),
        "vec_id", "embedding", "cluster", q, k = 5, nProbe = 2))

      val d3 = Similarity.semanticDedup(e.join(cells, Seq("vec_id")),
          "vec_id", "embedding", "cluster", threshold = 0.35)
        .select(col("vec_id"), col("is_kept").as("k3"))
      val cells1 = Similarity.kmeansAssign(e, "vec_id", "embedding", k = 8, iters = 1)
        .withColumnRenamed("id", "vec_id")
      val d1 = Similarity.semanticDedup(e.join(cells1, Seq("vec_id")),
          "vec_id", "embedding", "cluster", threshold = 0.35)
        .select(col("vec_id"), col("is_kept").as("k1"))
      val agg = d3.join(d1, Seq("vec_id"))
        .agg(avg(when(col("k3") === col("k1"), 1.0).otherwise(0.0)).as("agree"),
          count(lit(1)).as("n")).collect()(0)
      println(f"[bounds] $dir semdedup k3-vs-k1 agree=${agg.getDouble(0)}%.4f n=${agg.getLong(1)}")
    }
    spark.stop()
  }
}
