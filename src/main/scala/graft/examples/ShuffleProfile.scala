package graft.examples

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Shuffle-volume accounting for the headline queries — the measured
  * complement to PlanSpec's shape assertions. A plan can have the right
  * operators and still move too many bytes; this profile runs each query
  * under a task-metrics listener and reports, per query:
  *
  *   - total shuffle WRITE bytes (the cross-network cost a 1000-executor
  *     cluster pays — the number that must track the family's measured
  *     scaling law, §2/§6b, for the 100 TB story),
  *   - total shuffle READ bytes (> write when AQE re-reads map output
  *     for skew splitting or a staged frame feeds two consumers),
  *   - the skew balance: largest single-task shuffle read over the mean
  *     across tasks that read any shuffle — a balanced exchange keeps
  *     this near 1-3; a hot key drags it toward the task count.
  *
  * Deliberately NOT reported: `inputMetrics.bytesRead` — on this Spark
  * version it conflates parquet scan bytes with staged-localCheckpoint
  * block re-reads (a staged-heavy query shows 100s of MB of "input" on a
  * 0.6 MB corpus), so any write/input amplification ratio computed from
  * it is fiction in both directions. Corpus-relative readings live in
  * SCALING.md §7g next to the candidate counts measured in §3/§7e.
  *
  * Query set via SPARK_GRAFT_SHUFFLE_QUERIES (comma-separated), default
  * the suite's most expensive family heads.
  */
object ShuffleProfile {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val shufW = new AtomicLong
    val shufR = new AtomicLong
    val peakTaskR = new AtomicLong
    val tasksR = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          val r = m.shuffleReadMetrics.totalBytesRead
          if (r > 0) {
            shufR.addAndGet(r)
            tasksR.incrementAndGet()
            peakTaskR.accumulateAndGet(r, (a, b) => math.max(a, b))
          }
        }
      }
    })

    val names = sys.env.get("SPARK_GRAFT_SHUFFLE_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq(
        "x_containment_neardup", "x_curation_e2e", "x_prefix_join",
        "x_clone_pairs", "x_winnow_fingerprints", "x_dedup_pipeline",
        "x_ann_ivfpq_rerank", "x_minhash_signature", "x_dedup_components",
        "x_er_fuzzy_match", "x_pack_shelf", "j3_dim_enrichment",
        "a2_product_stats", "x_bm25_topk"))
    val unknown = names.filterNot(graft.SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")

    def mb(l: Long): Double = l / 1e6
    println(f"${"query"}%-24s ${"wall_s"}%7s ${"shufw_mb"}%9s " +
      f"${"shufr_mb"}%9s ${"peak_task_r_mb"}%14s ${"skew_bal"}%8s")
    for (n <- names) {
      // settle the async listener bus from the previous query, then reset
      Thread.sleep(800)
      shufW.set(0); shufR.set(0); peakTaskR.set(0); tasksR.set(0)
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(800) // drain before reading the counters
      val bal = if (tasksR.get > 0 && shufR.get > 0)
        peakTaskR.get.toDouble / (shufR.get.toDouble / tasksR.get) else 0.0
      println(f"$n%-24s $wall%7.2f ${mb(shufW.get)}%9.1f " +
        f"${mb(shufR.get)}%9.1f ${mb(peakTaskR.get)}%14.2f $bal%8.1f")
    }
    spark.stop()
  }
}
