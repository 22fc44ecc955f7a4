package graft.ext

import graft.SparkTestBase
import graft.streaming.Runner
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, ShuffleQueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

/** Line-level global dedup (Dedup.lineDedup / lineDedupAgainst /
  * extendLineIndex):
  *   - cross-batch first-wins through the extendLineIndex refresh cadence
  *     (the st_line_dedup_stream topology), over a REAL multi-batch file
  *     stream — a line kept in batch 1 must be cut in batch 2;
  *   - hot-line skew: one boilerplate line in 50% of documents must be
  *     reduced by the map-side partial min BEFORE the line-keyed shuffle
  *     (structural plan assert + measured per-task shuffle-read records —
  *     the deterministic proxy for "no single-task straggler"; task TIME
  *     at test scale is GC noise), with output still correct.
  */
class LineDedupSpec extends SparkTestBase {
  import spark.implicits._

  /** All shuffle exchanges in an (adaptive) executed plan, descending into
    * materialized query stages — AQE wraps each finished exchange in a
    * leaf ShuffleQueryStageExec the outer collect won't traverse. */
  private def shuffleExchanges(p: SparkPlan): Seq[ShuffleExchangeLike] =
    p match {
      case a: AdaptiveSparkPlanExec => shuffleExchanges(a.executedPlan)
      case _ =>
        p.collect {
          case s: ShuffleQueryStageExec => shuffleExchanges(s.plan)
          case e: ShuffleExchangeLike => Seq(e)
        }.flatten
    }

  private def runStream(inDir: String, outDir: String, ck: String,
      index0: DataFrame): Unit = {
    var index = index0
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$inDir/*")
    val q = Runner.toBatchSink(stream, ck) { (batch, _) =>
      Dedup.lineDedupAgainst(index, batch, "text", "doc_id")
        .write.mode("append").parquet(outDir)
      index = Dedup.extendLineIndex(index, batch, "text", "doc_id")
    }
    try q.processAllAvailable() finally q.stop()
  }

  test("cross-batch first-wins: a line kept in batch 1 is cut in batch 2") {
    val dir = tmpDir()
    val corpus = Seq((1L, "known footer")).toDF("doc_id", "text")
    // one part file per dir + strictly increasing mtimes: the file source
    // orders by modification time, so b0 is batch 1 and b1 is batch 2
    Seq((10L, "fresh intro\nknown footer"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(s"$dir/in/b0")
    Seq((20L, "fresh intro\nsecond thing"), (21L, "second thing"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(s"$dir/in/b1")
    val now = System.currentTimeMillis()
    for ((sub, t) <- Seq("b0" -> (now - 120000), "b1" -> now);
         f <- new java.io.File(s"$dir/in/$sub").listFiles())
      f.setLastModified(t)
    val index = Dedup.buildLineIndex(corpus, "text", "doc_id")
    runStream(s"$dir/in", s"$dir/out", s"$dir/ckpt", index)
    val got = spark.read.parquet(s"$dir/out")
      .select("doc_id", "text_kept", "n_kept", "n_dropped")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    // batch 1: "fresh intro" is new, "known footer" is in the corpus
    assert(got(0) == ((10L, "fresh intro", 1L, 1L)))
    // batch 2: "fresh intro" was KEPT in batch 1 → must now be cut;
    // "second thing" is new here and within-batch first-wins keeps doc 20's
    assert(got(1) == ((20L, "second thing", 1L, 1L)))
    assert(got(2) == ((21L, "", 0L, 1L)))
  }

  test("extendLineIndex makes every batch line known, kept or cut") {
    val index = Dedup.buildLineIndex(
      Seq((1L, "a")).toDF("doc_id", "text"), "text", "doc_id")
    val batch = Seq((2L, "a\nb\nb")).toDF("doc_id", "text")
    val extended = Dedup.extendLineIndex(index, batch, "text", "doc_id")
    assert(extended.as[String].collect().toSet == Set("a", "b"))
    // idempotent re-extension (a replayed batch) adds nothing
    val again = Dedup.extendLineIndex(extended, batch, "text", "doc_id")
    assert(again.count() == 2L)
  }

  test("hot boilerplate line: map-side partial combine bounds the shuffle") {
    val nDocs = 20000
    val hot = "ALL RIGHTS RESERVED BOILERPLATE"
    val docs = spark.range(nDocs.toLong).repartition(8)
      .select(col("id").as("doc_id"),
        when(col("id") % 2 === 0, concat(lit(s"$hot\nunique line "), col("id")))
          .otherwise(concat(lit("unique line "), col("id"))).as("text"))

    val result = Dedup.lineDedup(docs, "text", "doc_id")

    // structural scale property: the line-keyed canonical aggregation is
    // two-phase — partial_min BEFORE the exchange — so the hot line leaves
    // each map partition as ONE row, never 10k rows into one reducer
    val plan = result.queryExecution.executedPlan.toString
    assert(plan.contains("partial_min"),
      s"expected a partial (map-side) min before the line shuffle:\n$plan")

    val got = result.select("doc_id", "n_kept", "n_dropped")
      .as[(Long, Long, Long)].collect()

    // empirical: the line-keyed exchange must carry ~distinct-lines rows,
    // NOT the raw 30k exploded lines — 10000 occurrences of the hot line
    // collapse to ≤ nMapPartitions partial rows before anything moves.
    // Read the exchange's own shuffle-write metric (deterministic; task
    // TIMES at this scale are GC noise, and per-task READ counts conflate
    // AQE partition coalescing with skew).
    val lineShuffleRows = shuffleExchanges(result.queryExecution.executedPlan)
      .filter(_.outputPartitioning.toString.contains("line#"))
      .map(_.metrics.collectFirst {
        case (k, m) if k.toLowerCase.contains("recordswritten") => m.value
      }.getOrElse(0L))
    assert(lineShuffleRows.nonEmpty, "no line-keyed exchange found in plan")
    val totalLineRows = lineShuffleRows.sum
    assert(totalLineRows < 25000,
      s"line-keyed exchange carried $totalLineRows rows for 30000 exploded " +
        s"lines — the hot line was not combined map-side")

    // correctness: exactly one doc keeps the hot line (the min doc_id among
    // even docs = 0), every doc keeps its unique line
    val byId = got.map(r => r._1 -> ((r._2, r._3))).toMap
    assert(byId(0L) == ((2L, 0L)), "doc 0 keeps hot + unique")
    assert(byId(2L) == ((1L, 1L)), "later even docs lose the hot line")
    assert(byId(1L) == ((1L, 0L)), "odd docs keep their unique line")
    assert(got.map(_._2).sum == nDocs + 1L, "total kept = uniques + one hot")
    assert(got.map(_._3).sum == nDocs / 2 - 1L, "dropped = hot repeats")
  }
}
