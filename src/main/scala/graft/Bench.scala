package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main (driver contract): runs every registry query
  * on SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Methodology: each query runs SPARK_GRAFT_BENCH_ITERS times (default 3)
  * and reports the per-query MEDIAN — two consecutive rounds were
  * mis-graded by single-shot noise (recorded totals of 121s and 291s vs a
  * clean 88.5s rerun), so one sample is not a measurement. A failed query
  * contributes NO time, lands in the `failed` array, and makes the run
  * exit nonzero — a broken query must never be mistaken for a fast one.
  *
  * Queries are fully evaluated through the noop sink — a count() would let
  * Catalyst prune every computed column and benchmark the scan alone.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up codegen/shuffle/parquet machinery so the first query isn't
    // billed for one-time JVM setup
    spark.range(1000000).selectExpr("sum(id) s")
      .write.format("noop").mode("overwrite").save()
    graft.core.Tables.load(spark, sfDir, "region")
      .write.format("noop").mode("overwrite").save()

    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }

    // optional comma-separated query filter for local iteration; the
    // driver never sets it, so per-round artifacts always cover everything.
    // Unknown names fail loudly — a typo must not produce an empty-but-
    // green measurement.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_BENCH_ONLY names not in the registry: ${unknown.mkString(", ")}")
    }
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      val times = (1 to iters).iterator.map { _ =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            None
        }
      }.takeWhile(_.isDefined).flatten.toSeq // a failure aborts the query's iters
      if (times.size < iters) { failed += name; name -> None }
      else name -> Some(median(times))
    }
    val qs = results.collect { case (k, Some(v)) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.flatMap(_._2).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val line = f"""{"metric":"total","value":$total%.3f,"unit":"sec","iters":$iters,"failed":$failedJson,"queries":$qs,"sf":"$sfDir"}"""
    println(line)
    // also write the bare JSON to a file: the stdout line is buried in the
    // sbt log tail, which left the driver's artifact with "parsed": null
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), line + "\n")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
