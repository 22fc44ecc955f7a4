package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Two-level coarse probe contract ([[Similarity.ivfTopKHier]],
  * VERDICT r15 #6): exhaustive super-probing reproduces the flat path
  * EXACTLY, and the √-staged probe still lands true neighbors. */
class HierProbeSpec extends SparkTestBase {

  private def e = graft.core.Tables
    .load(spark, "/root/testdata/sf0.001", "embeddings")

  test("superProbe covering all groups reproduces flat ivfTopK exactly") {
    val q = e.filter(col("vec_id") < 8)
    // label has ≤ 10 cells → ≤ ⌈√10⌉ = 4 groups; superProbe = 16 ≥ g
    val flat = Similarity.ivfTopK(e, "vec_id", "embedding", "label",
      q, k = 5, nProbe = 2)
    val hier = Similarity.ivfTopKHier(e, "vec_id", "embedding", "label",
      q, k = 5, nProbe = 2, superProbe = 16)
    assert(flat.exceptAll(hier).isEmpty && hier.exceptAll(flat).isEmpty,
      "exhaustive super-probe must equal the flat probe")
  }

  test("staged probe at small superProbe still returns ranked neighbors per query") {
    val q = e.filter(col("vec_id") < 8)
    val hier = Similarity.ivfTopKHier(e, "vec_id", "embedding", "label",
      q, k = 5, nProbe = 2, superProbe = 2)
    val perQ = hier.groupBy("qid").count().collect()
    assert(perQ.length == 8 && perQ.forall(_.getLong(1) == 5L),
      s"want 5 ranked rows for each of 8 queries, got ${perQ.toSeq}")
    // ranks are dense 1..5 with descending cosine
    val bad = hier.groupBy("qid")
      .agg(collect_list(struct(col("rank"), col("cosine"))).as("rs"))
      .select(expr(
        "exists(rs, r -> exists(rs, s -> s.rank = r.rank + 1 AND s.cosine > r.cosine))")
        .as("inverted"))
      .filter(col("inverted")).count()
    assert(bad == 0L, "cosine must be non-increasing in rank")
  }
}
