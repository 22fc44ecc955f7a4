package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.HostProbe

/** VERDICT r16 #2: the streaming twins' walls at sf0.1 are dominated by
  * lifecycle floors (SCALING §12e), and the largest per-class floor is the
  * transformWithState+RocksDB shape. This probe measures that exact floor
  * (the StreamFixedCostProbe tws_rocksdb lifecycle, 4 sentinel waves)
  * under a matrix of STATE-STORE CONFIG variants that change no query
  * semantics — checkpoint format and store bookkeeping only:
  *
  *   - changelog=off: per-commit full-snapshot upload instead of
  *     changelog deltas. At toy state a snapshot is a handful of KB, so
  *     this trades the changelog writer's extra file per commit against
  *     re-zipping SSTs; at production state size changelog wins — this
  *     probe measures which way the SHORT-run floor goes.
  *   - track=off (trackTotalNumberOfRows): drops the read-before-write
  *     each put pays for the numRows metric.
  *   - maint=10min (maintenanceInterval): keeps the background snapshot/
  *     cleanup thread from waking mid-run on a sub-10 s query.
  *   - parts=8: the state-partition count the registry twins actually run
  *     (withStatePartitions(8)); the floor scales with store instances
  *     per micro-batch, so this anchors the matrix to the twins' shape.
  *
  * Output: one JSON line + target/stream_store_conf.json → SCALING §13.
  */
object StreamStoreConfProbe {

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
  }

  private def time[T](body: => T): Double = {
    val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
  }

  /** The StreamFixedCostProbe tws_rocksdb lifecycle, verbatim: 100-row
    * corpus, 0-second watermark, WatermarkFold count, memory-free parquet
    * sink, `waves` sentinel drains, stop. */
  private def floorRun(spark: SparkSession, corpus: String, waves: Int): Double = time {
    import spark.implicits._
    val scratch = java.nio.file.Files
      .createTempDirectory("stream_conf_").toString
    val src = spark.readStream
      .schema("event_id LONG, user_id LONG, us LONG")
      .parquet(corpus)
      .select(col("event_id"), col("user_id"), col("us"),
        timestamp_micros(col("us")).as("ts"))
      .withWatermark("ts", "0 seconds")
    val out = graft.streaming.WatermarkFold(
      src.select(col("event_id"), col("user_id"),
        lit("").as("sub"), col("us"), lit(0L).as("c"), col("ts"))
        .as[graft.streaming.WatermarkFold.FoldEv],
      (st, e) => (Array(st.map(_(0)).getOrElse(0L) + 1L),
        Some((e.c, 0L, 0L))))
    val q = out.writeStream
      .option("checkpointLocation", s"$scratch/ck")
      .outputMode("append")
      .foreachBatch { (b: DataFrame, _: Long) =>
        b.write.mode("append").parquet(s"$scratch/out")
      }.start()
    try {
      q.processAllAvailable()
      var us = 10000000L
      for (_ <- 1 until waves) {
        Seq((9999L, -1L, us)).toDF("event_id", "user_id", "us")
          .coalesce(1).write.mode("append").parquet(corpus)
        us += 10000000L
        q.processAllAvailable()
      }
    } finally q.stop()
  }

  def main(args: Array[String]): Unit = {
    val iters = math.max(1,
      sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt)
    val quietBudget =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_QUIET_WAIT", "300").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id) s")
      .write.format("noop").mode("overwrite").save()

    val ckKey = "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    val trKey = "spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows"
    val mtKey = "spark.sql.streaming.stateStore.maintenanceInterval"
    val spKey = "spark.sql.shuffle.partitions"
    // name -> conf overrides applied on top of the twins' production base
    // (RocksDB provider + changelog on, 32 shuffle partitions)
    val variants: Seq[(String, Map[String, String])] = Seq(
      "base" -> Map.empty,
      "changelog_off" -> Map(ckKey -> "false"),
      "track_off" -> Map(trKey -> "false"),
      "maint_10min" -> Map(mtKey -> "10min"),
      "all_off" -> Map(ckKey -> "false", trKey -> "false", mtKey -> "10min"),
      "parts8" -> Map(spKey -> "8"),
      "parts8_all_off" -> Map(spKey -> "8", ckKey -> "false",
        trKey -> "false", mtKey -> "10min"),
      "parts8_ck_off" -> Map(spKey -> "8", ckKey -> "false"),
      "parts4_ck_off" -> Map(spKey -> "4", ckKey -> "false"),
      "parts2_ck_off" -> Map(spKey -> "2", ckKey -> "false"))

    val out = new StringBuilder
    out.append(s"""{"iters":$iters,"waves":4,"variants":{""")
    var first = true
    for ((name, confs) <- variants) {
      HostProbe.waitForQuiet(quietBudget, s"store-conf:$name")
      graft.streaming.Runner.useRocksDBStateStore(spark)
      val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val times = try {
        (1 to iters).map { _ =>
          val corpus = java.nio.file.Files
            .createTempDirectory("stream_conf_corpus_").toString + "/d"
          spark.range(100)
            .select(col("id").as("event_id"), (col("id") % 10).as("user_id"),
              (col("id") * 1000000L).as("us"))
            .coalesce(1).write.parquet(corpus)
          floorRun(spark, corpus, waves = 4)
        }
      } finally prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
      if (!first) out.append(",")
      first = false
      out.append(f""""$name%s":${median(times)}%.2f""")
      System.err.println(
        f"[store-conf] $name%-16s median=${median(times)}%.2f s (${times.map(t => f"$t%.2f").mkString(", ")})")
    }
    out.append("}}")
    println(out.toString)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get("target"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("target/stream_store_conf.json"),
      out.toString + "\n")
    spark.stop()
  }
}
