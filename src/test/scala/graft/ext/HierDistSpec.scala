package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Distributed two-level coarse probe contract (VERDICT r16 #3/#4 —
  * [[Similarity.ivfTopKDist]], the ≥ HierCellsThreshold arm of
  * [[Similarity.ivfTopK]]'s routed probe): with exhaustive super-probing
  * it reproduces the flat collect-and-broadcast path EXACTLY (same
  * scoring arithmetic, same _cidx tie-break, no centroid collect), and
  * at partial superProbe it still returns dense ranked neighbors. The
  * same contract HierProbeSpec pins for the staged driver-side API
  * variant, here for the distributed coarse stage. */
class HierDistSpec extends SparkTestBase {

  private def e = graft.core.Tables
    .load(spark, "/root/testdata/sf0.001", "embeddings")

  test("distributed probe at exhaustive superProbe reproduces flat ivfTopK exactly") {
    val q = e.filter(col("vec_id") < 8)
    // label has ≤ 10 cells → ≤ ⌈√10⌉ = 4 trained groups; superProbe = 16 ≥ g
    val flat = Similarity.ivfTopK(e, "vec_id", "embedding", "label",
      q, k = 5, nProbe = 2)
    val dist = Similarity.ivfTopKDist(e, "vec_id", "embedding", "label",
      q, k = 5, nProbe = 2, superProbe = 16)
    assert(flat.exceptAll(dist).isEmpty && dist.exceptAll(flat).isEmpty,
      "exhaustive distributed super-probe must equal the flat probe")
  }

  test("distributed probe at small superProbe still returns ranked neighbors per query") {
    val q = e.filter(col("vec_id") < 8)
    val dist = Similarity.ivfTopKDist(e, "vec_id", "embedding", "label",
      q, k = 5, nProbe = 2, superProbe = 2)
    val perQ = dist.groupBy("qid").count().collect()
    assert(perQ.length == 8 && perQ.forall(_.getLong(1) == 5L),
      s"want 5 ranked rows for each of 8 queries, got ${perQ.toSeq}")
  }
}
