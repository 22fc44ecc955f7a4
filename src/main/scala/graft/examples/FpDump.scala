package graft.examples
import org.apache.spark.sql.SparkSession

/** Fingerprint-drift diagnostic: dump ONE query's normalized canonical
  * plan (the exact string graft.Bench.planFingerprint hashes) to a file,
  * so two runs can be diffed when bench_defs.json shows an unexpected
  * `definition_changed` flip. Env: FPDUMP_QUERY, FPDUMP_OUT, optional
  * FPDUMP_CPUS (local[8]) / FPDUMP_SP (8). Round-11 findings: isolated
  * JVMs are deterministic at local[8] AND local[32] for the two queries
  * that toggle across FULL-SUITE runs (x_nb_classify, x_text_stats) —
  * the residual instability is suite-order-dependent and flips only
  * their definition_changed metadata, which is conservative (a spurious
  * `true` widens scrutiny, never hides a change). */
object FpDump {
  def main(args: Array[String]): Unit = {
    val q = sys.env("FPDUMP_QUERY"); val out = sys.env("FPDUMP_OUT")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("FPDUMP_CPUS", "local[8]"))
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("FPDUMP_SP", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.1")
    val norm = df.queryExecution.analyzed.canonicalized.toString
      .replaceAll("/tmp/\\S*", "<tmp>")
      .replaceAll("file:\\S*", "<loc>")
      .replaceAll("/root/testdata/\\S*", "<sf>")
      .replaceAll("@[0-9a-fA-F]{1,16}\\b", "@obj")
      .replaceAll("\\$Lambda\\$\\d+/0x[0-9a-fA-F]+", "<lambda>")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), norm)
    spark.stop()
  }
}
