package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Skewed-key memory rehearsal for the monitoring-family folds
  * (VERDICT r13 #3, backing the SCALING.md row): ONE user holds 50% of a
  * 16M-row corpus, and the previous-KEPT rate-limiter fold runs over it
  * in a deliberately starved child JVM (default 512 MiB, ExitOnOutOfMemory)
  * in two shapes:
  *
  *   - `old` — the condemned r13 shape: groupByKey + flatMapGroups +
  *     `rows.toSeq.sortBy`. The hot key's 2M rows materialize as boxed
  *     tuples in ONE task's heap (plus sortBy's key copies), which no
  *     spill can relieve — the expected outcome is OOM.
  *   - `new` — the shipped a22 shape (queries/AggOps.scala a22RateLimit):
  *     repartition → sortWithinPartitions → mapPartitions streaming fold.
  *     The sort runs through Spark's external sorter (execution memory,
  *     spills to disk) and the fold's live state is three scalars, so the
  *     same corpus completes in the same starved heap.
  *   - `stream` — the shipped STREAMING shape (VERDICT r14 #2's ask):
  *     the whole corpus lands as ONE micro-batch (the hot key alone is
  *     SKEW_FOLD_ROWS/2 rows in one batch — 4x the r14 breaker budget),
  *     folded through graft.streaming.WatermarkFold: rows buffer in
  *     RocksDB-backed MapState keyed by event-time (off-heap, spills),
  *     the fold fires on the event-time timer after a sentinel advances
  *     the watermark, and emission is lazy — so the same starved heap
  *     that OOMs the old shape completes, where the r14 twins' loud
  *     2M-row budget breaker would simply have refused to run.
  *
  * Both children run the IDENTICAL fold logic (the spec gates the shipped
  * registry query against a sequential reference; this probe isolates the
  * memory shape). Parent output: one JSON line + target/skew_fold.json
  * with per-shape outcome, kept-row count (must agree across shapes when
  * both complete), wall, and the child's tenured-pool peak. */
object SkewFoldProbe {

  private val GapUs = 60000000L

  private def buildCorpus(spark: SparkSession, dir: String, n: Long): Unit = {
    // even ids → user 1 (the 50% hot key); odd ids spread over 10k users.
    // Bursts of 3×20s then a 120s jump, so keep decisions vary.
    spark.range(1, n + 1)
      .select(col("id").as("event_id"),
        when(col("id") % 2 === 0, lit(1L))
          .otherwise(col("id") % 10000 + 2).as("user_id"),
        lit("click").as("event_type"),
        expr("(id div 4) * 120000000L + (id % 4) * 20000000L").as("us"))
      .write.mode("overwrite").parquet(dir)
  }

  /** Child entry: run one fold shape, print KEPT= and PEAK_MB=, exit. */
  private def child(mode: String, dir: String): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // the stream child appends a far-future watermark sentinel
    // (user_id = -1) into the shared corpus dir; old/new children forked
    // after it must not count that row (ADVICE r15) — the stream child
    // already excludes it in its own kept accumulator
    val e = spark.read.parquet(dir)
      .filter(col("user_id") >= 0L)
      .select(col("event_id"), col("user_id"), col("event_type"), col("us"))
    val kept = mode match {
      case "old" =>
        e.as[(Long, Long, String, Long)]
          .groupByKey { case (_, u, ty, _) => (u, ty) }
          .flatMapGroups { (_: (Long, String), rows) =>
            var lastKept = Long.MinValue
            rows.toSeq.sortBy(r => (r._4, r._1)).flatMap {
              case (id, u, ty, us) =>
                if (lastKept == Long.MinValue || us - lastKept >= GapUs) {
                  lastKept = us; Some((id, u, ty, us))
                } else None
            }.iterator
          }.count()
      case "stream" =>
        graft.streaming.Runner.useRocksDBStateStore(spark)
        val typed = spark.readStream
          .schema("event_id LONG, user_id LONG, event_type STRING, us LONG")
          .parquet(dir)
          .select(col("event_id"), col("user_id"),
            col("event_type").as("sub"), col("us"), lit(0L).as("c"),
            timestamp_micros(col("us")).as("ts"))
          .withWatermark("ts", "0 seconds")
          .as[graft.streaming.WatermarkFold.FoldEv]
        val out = graft.streaming.WatermarkFold(typed,
          graft.queries.StreamingOps.debounceStep(GapUs, keptOnly = true))
        val keptAcc = spark.sparkContext.longAccumulator("kept")
        val ck = java.nio.file.Files.createTempDirectory("skew_stream_ck")
        val q = out.writeStream
          .option("checkpointLocation", ck.toString)
          .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
            keptAcc.add(df.filter(col("user_id") >= 0L).count())
          }
          .start()
        try {
          q.processAllAvailable()
          val maxUs = spark.read.parquet(dir)
            .agg(max("us")).collect()(0).getLong(0)
          Seq((-1L, -1L, "click", maxUs + 600000000L))
            .toDF("event_id", "user_id", "event_type", "us")
            .coalesce(1).write.mode("append").parquet(dir)
          q.processAllAvailable() // sentinel batch + timer batches
        } finally q.stop()
        keptAcc.value: Long
      case "new" =>
        e.repartition(col("user_id"), col("event_type"))
          .sortWithinPartitions("user_id", "event_type", "us", "event_id")
          .as[(Long, Long, String, Long)]
          .mapPartitions { it =>
            var open = false
            var curU = 0L
            var curTy: String = null
            var lastKept = Long.MinValue
            it.flatMap { case (id, u, ty, us) =>
              if (!open || u != curU || ty != curTy) {
                open = true; curU = u; curTy = ty; lastKept = Long.MinValue
              }
              if (lastKept == Long.MinValue || us - lastKept >= GapUs) {
                lastKept = us; Some((id, u, ty, us))
              } else None
            }
          }.count()
    }
    import scala.jdk.CollectionConverters._
    val peakMb = java.lang.management.ManagementFactory.getMemoryPoolMXBeans
      .asScala
      .filter(_.getType == java.lang.management.MemoryType.HEAP)
      .map(p => Option(p.getPeakUsage).map(_.getUsed).getOrElse(0L))
      .sum / (1024 * 1024)
    println(s"KEPT=$kept")
    println(s"PEAK_MB=$peakMb")
    spark.stop()
  }

  private def fork(mode: String, dir: String, xmxMb: Int,
      timeoutMin: Long): (String, Long, Long, Double) = {
    import scala.jdk.CollectionConverters._
    val javaBin = java.nio.file.Paths
      .get(System.getProperty("java.home"), "bin", "java").toString
    val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.toSeq
      .filterNot(a => a.startsWith("-agentlib") || a.startsWith("-javaagent") ||
        a.startsWith("-Xmx"))
    val cmd = Seq(javaBin) ++ jvmArgs ++ Seq(
      s"-Xmx${xmxMb}m", "-XX:+ExitOnOutOfMemoryError",
      "-cp", System.getProperty("java.class.path"),
      "graft.examples.SkewFoldProbe", "child", mode, dir)
    val outF = java.nio.file.Files.createTempFile("skew_fold_", ".out")
    val pb = new ProcessBuilder(cmd.asJava)
    pb.redirectErrorStream(true)
    pb.redirectOutput(outF.toFile)
    val t0 = System.nanoTime()
    val p = pb.start()
    val done = p.waitFor(timeoutMin, java.util.concurrent.TimeUnit.MINUTES)
    val wall = (System.nanoTime() - t0) / 1e9
    if (!done) { p.destroyForcibly(); return ("timeout", -1L, -1L, wall) }
    val text = java.nio.file.Files.readString(outF)
    val kept = "KEPT=(\\d+)".r.findFirstMatchIn(text).map(_.group(1).toLong)
    val peak = "PEAK_MB=(\\d+)".r.findFirstMatchIn(text).map(_.group(1).toLong)
    val status =
      if (p.exitValue() == 0 && kept.isDefined) "ok"
      else if (text.contains("OutOfMemoryError") || p.exitValue() == 3) "oom"
      else s"exit_${p.exitValue()}"
    if (status != "ok" && status != "oom")
      System.err.println(s"[skew_fold child $mode] tail: " +
        text.takeRight(600).replace('\n', ' '))
    (status, kept.getOrElse(-1L), peak.getOrElse(-1L), wall)
  }

  def main(args: Array[String]): Unit = {
    if (args.length >= 3 && args(0) == "child") { child(args(1), args(2)); return }
    val n = sys.env.getOrElse("SKEW_FOLD_ROWS", "16000000").toLong
    val xmx = sys.env.getOrElse("SKEW_FOLD_XMX_MB", "512").toInt
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Files.createTempDirectory("skew_fold_corpus").toString
    buildCorpus(spark, dir, n)
    spark.stop()
    val results = Seq("new", "stream", "old").map { mode =>
      // the stream shape pays RocksDB write amplification per buffered
      // row — correct-but-slower by design; give it a wider wall budget
      val budget = if (mode == "stream") 25L else 10L
      val (status, kept, peak, wall) = fork(mode, dir, xmx, timeoutMin = budget)
      mode -> ((status, kept, peak, wall))
    }.toMap
    val (nS, nK, nP, nW) = results("new")
    val (sS, sK, sP, sW) = results("stream")
    val (oS, oK, oP, oW) = results("old")
    val agree = nS == "ok" && oS == "ok" && nK == oK
    val streamAgree = nS == "ok" && sS == "ok" && nK == sK
    val json =
      f"""{"rows":$n,"hot_share":0.5,"xmx_mb":$xmx,""" +
        f""""new":{"status":"$nS","kept":$nK,"peak_heap_mb":$nP,"wall_sec":$nW%.1f},""" +
        f""""stream":{"status":"$sS","kept":$sK,"peak_heap_mb":$sP,"wall_sec":$sW%.1f},""" +
        f""""old":{"status":"$oS","kept":$oK,"peak_heap_mb":$oP,"wall_sec":$oW%.1f},""" +
        f""""kept_agree_when_both_ok":$agree,"stream_agrees_with_batch":$streamAgree}"""
    println(json)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get("target"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("target", "skew_fold.json"), json + "\n")
  }
}
