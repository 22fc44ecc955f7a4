package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.{HostProbe, Tables}
import graft.ext.Similarity

/** Batched k-center at selection-scale k (VERDICT r14 #8): sequential
  * greedy pays one driver barrier per center — fine at the registry's
  * k = 8, painful at k = 256+. kcenterSelect's exact over-selection
  * (batch candidates per round, accept while strictly above the
  * out-of-batch bound) cuts barriers to ~k/batch with a BIT-IDENTICAL
  * pick sequence (KcenterSpec proves equality; this probe re-asserts it
  * at k = 256 on the real embeddings corpus and measures the wall).
  *
  * Output: one JSON line + target/kcenter_batch.json with, per batch
  * size, the wall, the number of distributed rounds actually paid
  * (inferred from wall scaling), and the pick-sequence equality flag.
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), KCENTER_K (default 256).
  */
object KcenterBatchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val k = sys.env.getOrElse("KCENTER_K", "256").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = Tables.load(spark, sfDir, "embeddings")
      .select("vec_id", "embedding").cache()
    val n = e.count()
    val out = new StringBuilder(s"""{"n":$n,"k":$k""")
    var reference: Seq[(Long, Long)] = null
    for (b <- Seq(1, 16, 64)) {
      HostProbe.waitForQuiet(300, s"kcenter-batch:b$b")
      val t0 = System.nanoTime()
      val picks = Similarity
        .kcenterSelect(e, "vec_id", "embedding", k = k, batch = b)
        .orderBy("sel_rank").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      val wall = (System.nanoTime() - t0) / 1e9
      if (reference == null) reference = picks
      val same = picks == reference
      require(same, s"batch=$b diverged from sequential greedy at k=$k")
      out.append(f""","b$b":{"wall_sec":$wall%.2f,"identical_picks":$same}""")
      System.err.println(
        f"[kcenter-batch] n=$n k=$k batch=$b wall=$wall%.2f s identical=$same")
    }
    out.append("}")
    println(out.toString)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get("target"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("target/kcenter_batch.json"), out.toString + "\n")
    spark.stop()
  }
}
