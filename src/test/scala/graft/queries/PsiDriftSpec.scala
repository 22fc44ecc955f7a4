package graft.queries

import graft.SparkTestBase

/** Discriminating gate for a27_psi_drift / st_psi_drift_stream: the
  * driver fixtures are stationary (both time halves draw from one
  * process), so the DuckDB oracle proves the arithmetic but never
  * populates the is_drift=1 class. This spec drives the SHIPPED
  * registry queries over a corpus whose second half genuinely shifts
  * (low-cent readings → high-cent readings) and over a stationary twin,
  * asserting the alert fires exactly on the former — and that the
  * streaming twin agrees with the batch fold on the drifted corpus. */
class PsiDriftSpec extends SparkTestBase {
  import spark.implicits._

  /** Single-file events.parquet in the driver layout. First half at
    * t ∈ [0, n), second at [n, 2n); values per `vLo`/`vHi`. */
  private def corpusDir(n: Int, vLo: Double, vHi: Double): String = {
    val dir = tmpDir()
    val rows = (0 until 2 * n).map { i =>
      val v = if (i < n) vLo + (i % 10) else vHi + (i % 10)
      (i.toLong, new java.sql.Timestamp(i * 1000L), i.toLong % 7, "click",
        v, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$dir/_stage")
    val part = new java.io.File(s"$dir/_stage").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(dir, "events.parquet"))
    dir
  }

  test("a shifted second half trips the 0.2 alert; a stationary one does not") {
    val drifted = corpusDir(1000, vLo = 5.0, vHi = 95.0)
    val d = Registry.byName("a27_psi_drift").run(spark, drifted)
      .select("psi", "is_drift").as[(Double, Long)].collect()
    assert(d.forall(_._2 == 1L), s"drift alert must fire, psi=${d.head._1}")
    assert(d.head._1 >= 1.0, s"near-disjoint halves must score high, got ${d.head._1}")

    val flat = corpusDir(1000, vLo = 50.0, vHi = 50.0)
    val f = Registry.byName("a27_psi_drift").run(spark, flat)
      .select("psi", "is_drift").as[(Double, Long)].collect()
    assert(f.forall(_._2 == 0L), s"stationary corpus must not alert, psi=${f.head._1}")
    assert(f.head._1 < 0.1, s"stationary PSI must be stable-range, got ${f.head._1}")
  }

  test("streaming twin equals the batch query on the drifted corpus") {
    val drifted = corpusDir(500, vLo = 5.0, vHi = 95.0)
    val batch = Registry.byName("a27_psi_drift").run(spark, drifted)
      .collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|"))
    val stream = Registry.byName("st_psi_drift_stream").run(spark, drifted)
      .collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|"))
    assert(batch.toSeq == stream.toSeq)
  }
}
