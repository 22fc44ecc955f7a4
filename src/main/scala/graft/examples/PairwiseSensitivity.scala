package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.{HostProbe, Tables}
import graft.ext.{Dedup, TextAnalysis}

/** df-cap / shingle-width sensitivity for the two heaviest pairwise
  * queries (VERDICT r8 #2): x_containment_neardup and x_clone_pairs
  * together are ~15% of the bench suite, and their cost model is
  * Σ df² over capped-rare fingerprints — so the cap IS the cost knob.
  * This main measures, on the real sf0.1 corpus under the same quiet
  * gating as [[graft.Bench]]:
  *   - containmentPairs at maxDf ∈ {5,10,20} (ngram 3) and
  *     ngram ∈ {4,5} (maxDf 10);
  *   - clonePairs at maxDf ∈ {5,10,20} (k=16, w=4, minShared=5);
  * recording median wall, result rows, and per-window foreign CPU.
  * Output: one JSON line, also written to `target/sensitivity.json`.
  */
object PairwiseSensitivity {

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val iters = math.max(1,
      sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt)
    val quietBudget =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_QUIET_WAIT", "600").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "2min")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id) s")
      .write.format("noop").mode("overwrite").save()
    val docs = Tables.load(spark, sfDir, "documents")

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "containment_df5_n3" -> (() =>
        Dedup.containmentPairs(docs, "text", "doc_id", 3, 5L, 0.5)),
      "containment_df10_n3" -> (() =>
        Dedup.containmentPairs(docs, "text", "doc_id", 3, 10L, 0.5)),
      "containment_df20_n3" -> (() =>
        Dedup.containmentPairs(docs, "text", "doc_id", 3, 20L, 0.5)),
      "containment_df10_n4" -> (() =>
        Dedup.containmentPairs(docs, "text", "doc_id", 4, 10L, 0.5)),
      "containment_df10_n5" -> (() =>
        Dedup.containmentPairs(docs, "text", "doc_id", 5, 10L, 0.5)),
      "clone_df5" -> (() =>
        TextAnalysis.clonePairs(docs, "text", "doc_id", 16, 4, 5L, 5L)),
      "clone_df10" -> (() =>
        TextAnalysis.clonePairs(docs, "text", "doc_id", 16, 4, 10L, 5L)),
      "clone_df20" -> (() =>
        TextAnalysis.clonePairs(docs, "text", "doc_id", 16, 4, 20L, 5L)))

    val out = new StringBuilder
    out.append(s"""{"sf":"$sfDir","iters":$iters""")
    for ((name, mk) <- variants) {
      HostProbe.waitForQuiet(quietBudget, s"sensitivity:$name")
      val pre = HostProbe.cpuSample()
      val t0 = System.nanoTime()
      val times = (1 to iters).map { _ =>
        System.gc()
        val t = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t) / 1e9
      }
      val wall = (System.nanoTime() - t0) / 1e9
      val others = HostProbe.otherCores(pre, HostProbe.cpuSample(), wall)
      // result-count AFTER the timed iterations: an untimed warm-up
      // execution before them was the one methodological difference from
      // Bench's cold-first median (r10 reconciliation, SCALING.md §3) —
      // both harnesses now share the measurement shape
      val rows = mk().count()
      out.append(f""","$name%s":{"median_sec":${median(times)}%.3f,"rows":$rows,"others_cores":$others%.2f}""")
      System.err.println(f"[sensitivity] $name: ${median(times)}%.3f s, $rows rows (foreign $others%.2f cores)")
    }
    out.append("}")
    println(out.toString)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("target/sensitivity.json"), out.toString + "\n")
    spark.stop()
  }
}
