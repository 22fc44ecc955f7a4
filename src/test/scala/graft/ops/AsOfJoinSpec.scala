package graft.ops

import graft.SparkTestBase
import java.sql.Timestamp

class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: Int) = new Timestamp(s * 1000L)

  test("asOf: greatest version <= event time, per key, ties match, no-match is null") {
    val fact = Seq(
      (1L, ts(0), "e0"), // before any version → null
      (1L, ts(1), "e1"), // exactly at v1 → v1 (the <= contract)
      (1L, ts(3), "e3"), // between v1 and v5 → v1
      (1L, ts(7), "e7"), // after v5 → v5
      (2L, ts(9), "x9")) // key 2 has its own versions
      .toDF("k", "ts", "ev")
    val dim = Seq(
      (1L, ts(1), "v1"), (1L, ts(5), "v5"),
      (2L, ts(2), "w2"))
      .toDF("k", "vts", "ver")
    val out = AsOfJoin.asOf(fact, dim, Seq("k"), "ts", "vts")
      .select("k", "ev", "ver").as[(Long, String, String)]
      .collect().toSet
    assert(out == Set(
      (1L, "e0", null), (1L, "e1", "v1"), (1L, "e3", "v1"),
      (1L, "e7", "v5"), (2L, "x9", "w2")))
    // every window is key-partitioned; the single keyed shuffle is the
    // whole data movement (no range cross-join, no per-row subquery)
    val plan = AsOfJoin.asOf(fact, dim, Seq("k"), "ts", "vts")
      .queryExecution.optimizedPlan
    val wins = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }
    assert(wins.nonEmpty && wins.forall(_.partitionSpec.nonEmpty))
    val joins = plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
    assert(joins.isEmpty, "as-of must not plan a join")
  }

  test("asOf: payload collision and empty-key guards") {
    val f = Seq((1L, ts(1), "p")).toDF("k", "ts", "v")
    val d = Seq((1L, ts(0), "q")).toDF("k", "vts", "v")
    intercept[IllegalArgumentException] {
      AsOfJoin.asOf(f, d, Seq("k"), "ts", "vts")
    }
    intercept[IllegalArgumentException] {
      AsOfJoin.asOf(f, d.withColumnRenamed("v", "w"), Nil, "ts", "vts")
    }
  }
}
