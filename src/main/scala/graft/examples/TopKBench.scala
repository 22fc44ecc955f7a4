package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-benchmark: bounded-heap top-k aggregate (graft.functions.TopKAgg)
  * vs the `row_number().over(Window.partitionBy(q))` idiom it replaced.
  * Synthetic workload: few groups × many candidates.
  *
  * Honest accounting: Spark ≥3.5's InferWindowGroupLimit already rescues
  * the rank-filter window from the naive everything-into-one-task shuffle
  * by inserting a partial per-partition group limit (watch the printed
  * shuffle volume — small for BOTH paths). The heap aggregate still wins
  * (measured ~1.7× here) because the group-limit path SORTS every map
  * partition to find its k, while the heap streams each partition through
  * an O(n·log k) bounded buffer with no sort at all — and, unlike the
  * optimizer rule, it does not depend on the filter being written in the
  * exact `row_number() <= k` shape Catalyst recognizes. */
object TopKBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.expressions.Window

    val groups = 2            // "queries"
    val perGroup = 16000000L  // candidates per query
    val k = 5
    val scored = spark.range(groups * perGroup)
      .select((col("id") % groups).as("qid"),
        col("id").as("cid"),
        (hash(col("id")).cast("double") / Int.MaxValue).as("cosine"))

    // shuffle-volume is the number that matters at 100 TB: the window sort
    // shuffles EVERY candidate row; the heap shuffles ≤k rows per map
    // partition per group
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(
          sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })

    def time(label: String)(f: => Unit): Double = {
      shuffleBytes.set(0)
      val t0 = System.nanoTime(); f; val s = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // listener bus drains asynchronously
      println(f"[topkbench] $label%-12s $s%.2f s  " +
        f"shuffle ${shuffleBytes.get / 1024.0 / 1024.0}%.2f MiB"); s
    }

    val topk = graft.functions.TopK.topK(k)
    def heap() = scored.groupBy("qid")
      .agg(topk(col("cosine"), col("cid")).as("tk"))
      .select(col("qid"), posexplode(col("tk.items")).as(Seq("pos", "s")))
      .select(col("qid"), col("s.id").as("cid"), col("s.score").as("cosine"),
        (col("pos") + 1).as("rank"))
    def windowSort() = {
      val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("cid"))
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select("qid", "cid", "cosine", "rank")
    }

    // warmup + equivalence check on a slice — BOTH directions, so extra
    // or duplicate heap rows can't hide behind a one-sided except
    val small = scored.filter(col("cid") < 100000)
    val wH = Window.partitionBy("qid").orderBy(col("cosine").desc, col("cid"))
    val winTop = small.withColumn("rank", row_number().over(wH))
      .filter(col("rank") <= k).select("qid", "cid")
    val heapTop = small.groupBy("qid").agg(topk(col("cosine"), col("cid")).as("tk"))
      .select(col("qid"), posexplode(col("tk.items")).as(Seq("p", "s")))
      .select(col("qid"), col("s.id").as("cid"))
    assert(winTop.exceptAll(heapTop).isEmpty && heapTop.exceptAll(winTop).isEmpty,
      "heap and window top-k disagree")

    val tWin = time("window-sort") {
      windowSort().write.format("noop").mode("overwrite").save()
    }
    val tHeap = time("heap-agg") {
      heap().write.format("noop").mode("overwrite").save()
    }
    println(f"[topkbench] speedup ${tWin / tHeap}%.2fx " +
      s"($groups groups x $perGroup candidates, k=$k)")
    spark.stop()
  }
}
