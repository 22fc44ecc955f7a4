package graft.examples

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkEntry
import graft.core.{HostProbe, Tables}

/** 10× rehearsal for the round-14 selection/training additions —
  * x_kcenter_select, x_perceptron_train, st_perceptron_score_stream —
  * the same measured-law discipline as StreamScaleRehearsal (which
  * covers the events-table family, incl. a31/a32/st_scd2 via its query
  * env var).
  *
  * Corpus: documents tiled 10× with shifted doc_id (same text — the
  * vocabulary is the hashing trick's input and stays fixed in a
  * scale-up, so per-epoch cost should scale with ROWS while the weight
  * table stays dims-bounded); embeddings tiled 10× with shifted vec_id
  * AND a deterministic per-copy element perturbation (±5e-3, a pure
  * function of (vec_id, dim)) so the tiled corpus has no zero-distance
  * duplicates — k-center's argmax stays meaningfully contested while
  * the COST law is what's being measured.
  *
  * Expected laws: kcenter = k passes over n vectors → linear in n;
  * perceptron = E epochs × (explode + two keyed aggs) → linear in
  * token volume; serving twin = map-only projection → linear in bytes.
  * Any super-linear term is a bug this probe exists to surface.
  */
object SelectTrainScaleProbe {

  private val QueryNames = Seq("x_kcenter_select", "x_perceptron_train",
    "st_perceptron_score_stream")

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
  }

  /** Single-file write as `dir`/`name`.parquet (the streaming source
    * glob-filters on exact leaf names — the StreamScaleRehearsal shape). */
  private def writeSingle(df: DataFrame, dir: String, name: String): Unit = {
    val tmp = s"$dir/_tmp_$name"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    def listing[T](f: java.util.stream.Stream[java.nio.file.Path] => T): T = {
      val s = Files.list(Paths.get(tmp))
      try f(s) finally s.close()
    }
    val part = listing(_.filter(_.toString.endsWith(".parquet"))
      .findFirst().orElseThrow())
    Files.createDirectories(Paths.get(dir))
    Files.move(part, Paths.get(dir, s"$name.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    listing(_.forEach(p => Files.deleteIfExists(p): Unit))
    Files.deleteIfExists(Paths.get(tmp)): Unit
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val iters = sys.env.getOrElse("SPARK_GRAFT_REHEARSAL_ITERS", "2").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val d1 = "target/rehearsal/seltrain1x"
    val d10 = "target/rehearsal/seltrain10x"
    if (!Files.exists(Paths.get(d10, "documents.parquet"))) {
      val docs = Tables.load(spark, sfDir, "documents")
        .select("doc_id", "text", "lang", "source", "n_chars")
      val emb = Tables.load(spark, sfDir, "embeddings")
        .select("vec_id", "embedding", "label")
      val maxD = docs.agg(max("doc_id")).head().getLong(0) + 1
      val maxV = emb.agg(max("vec_id")).head().getLong(0) + 1
      // 1× rewritten through the same writer: same layout/compression
      writeSingle(docs, d1, "documents")
      writeSingle(emb, d1, "embeddings")
      writeSingle((0 until 10).map { k =>
        docs.select((col("doc_id") + lit(k * maxD)).as("doc_id"), col("text"),
          col("lang"), col("source"), col("n_chars"))
      }.reduce(_ unionByName _), d10, "documents")
      writeSingle((0 until 10).map { k =>
        // ±5e-3 perturbation, pure function of (SHIFTED id, dim) with a
        // per-tile offset term: vec_id below is the INPUT column (the
        // shifted alias in the same select is not visible to the lambda
        // — the r14 advice bug: without the k terms all 10 tiles got
        // byte-identical embeddings), and k*37 guarantees tiles j != k
        // differ in EVERY dimension ((k-j)*37 is never 0 mod the prime
        // 101 for |k-j| <= 9), so the tiled corpus has no zero-distance
        // duplicates and k-center's argmax stays meaningfully contested
        emb.select((col("vec_id") + lit(k * maxV)).as("vec_id"),
          expr(s"""transform(embedding, (x, d) ->
                 |  CAST(x + (CAST(((vec_id + ${k * maxV}L) * 31 + d
                 |    + ${k * 37}L) % 101 AS DOUBLE) - 50.0)
                 |    / 10000.0 AS FLOAT))""".stripMargin).as("embedding"),
          col("label"))
      }.reduce(_ unionByName _), d10, "embeddings")
    }

    val n1 = spark.read.parquet(s"$d1/documents.parquet").count()
    val n10 = spark.read.parquet(s"$d10/documents.parquet").count()
    val results = scala.collection.mutable.LinkedHashMap.empty[String, String]
    for ((label, dir) <- Seq(("x1", d1), ("x10", d10)); q <- QueryNames) {
      HostProbe.waitForQuiet(300, s"seltrain-rehearsal:$q")
      HostProbe.waitForIoFloor(25.0, 300, s"seltrain-rehearsal:$q")
      val times = (1 to iters).map { _ =>
        val pre = HostProbe.cpuSample()
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, dir).write.format("noop")
          .mode("overwrite").save()
        val w = (System.nanoTime() - t0) / 1e9
        val others = HostProbe.otherCores(pre, HostProbe.cpuSample(), w)
        (w, others)
      }
      val m = median(times.map(_._1))
      val foreign = times.map(_._2).max
      System.err.println(
        f"[seltrain-rehearsal] $label $q: $m%.3f s (foreign $foreign%.2f cores)")
      results(s"$label.$q") =
        f"""{"median_sec":$m%.3f,"others_cores":$foreign%.2f}"""
    }
    val json = f"""{"iters":$iters,"docs_x1":$n1,"docs_x10":$n10,""" +
      results.map { case (k, v) => s""""$k":$v""" }.mkString(",") + "}"
    println(json)
    Files.createDirectories(Paths.get("target/rehearsal"))
    Files.writeString(Paths.get("target/rehearsal/seltrain_scaling.json"),
      json + "\n")
    spark.stop()
  }
}
