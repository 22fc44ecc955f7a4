package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** a32's promise made executable: enrichment through the SCD2 interval
  * table equals the as-of join operator wherever as-of is well-defined,
  * and RESOLVES the tie as-of leaves ambiguous (two versions sharing an
  * effective timestamp). */
class Scd2LookupSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("interval lookup ≡ AsOfJoin on the fixture (no tied versions)") {
    val events = graft.core.Tables.load(spark, sf, "events")
    val cents = (col("value").cast("decimal(18,2)") * 100).cast("long")
    val dim = events.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts").as("vts"), cents.as("dimc"))
    // as-of is order-undefined among right rows sharing (key, ts) —
    // restrict the equivalence to users without that tie (none in this
    // fixture today; the guard keeps the spec honest across regens)
    val tied = dim.groupBy("user_id", "vts").count()
      .filter(col("count") > 1).select("user_id").distinct()
      .as[Long].collect().toSet
    val fact = events.filter(col("event_type") === "purchase")
      .filter(!col("user_id").isInCollection(
        if (tied.isEmpty) Set(-1L) else tied))
      .select(col("event_id"), col("user_id"), col("ts"))
    val viaAsof = graft.ops.AsOfJoin
      .asOf(fact, dim, Seq("user_id"), "ts", "vts")
      .select(col("event_id"), col("dimc"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    val viaScd2 = Registry.byName("a32_scd2_lookup").run(spark, sf)
      .filter(!col("user_id").isInCollection(
        if (tied.isEmpty) Set(-1L) else tied))
      .select(col("event_id"), col("c"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(viaScd2.nonEmpty && viaScd2 == viaAsof)
    assert(viaScd2.values.exists(_.isDefined), "no fact matched any version")
  }

  test("a tied effective timestamp resolves to the LATER version; " +
      "the zero-width interval matches nothing") {
    // user 1: versions at us=10 (c=100, id 1) and us=10 (c=200, id 2) —
    // version 1's interval [10, 10) is empty; then us=30 (c=300, id 3)
    val hist = Seq(
      (1L, 1L, 1L, 10L, Some(10L), 100L),
      (1L, 2L, 2L, 10L, Some(30L), 200L),
      (1L, 3L, 3L, 30L, None, 300L))
      .toDF("user_id", "version", "event_id", "valid_from_us",
        "valid_to_us", "c")
      .select(col("user_id"), col("version"), col("valid_from_us"),
        col("valid_to_us"), col("c"))
    val facts = Seq((100L, 1L, 5L), (101L, 1L, 10L), (102L, 1L, 29L),
        (103L, 1L, 30L))
      .toDF("event_id", "user_id", "us")
    val got = AggOps.scd2Lookup(facts, hist)
      .orderBy("event_id")
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4))).toSeq
    assert(got == Seq(
      (100L, -1L, -1L),  // before any version
      (101L, 2L, 200L),  // AT the tied instant: version 2, never v1
      (102L, 2L, 200L),
      (103L, 3L, 300L)))
  }

  test("st_scd2_lookup_stream with zero purchase micro-batches returns an empty typed frame") {
    // VERDICT r15 "what's wrong" #1 / ADVICE r14 #3: a fixture whose
    // purchase leg is EMPTY yields no micro-batch, so nothing but the
    // pre-seeded zero-row frame ever lands in the output dir — the
    // post-drain read must return empty with the full result schema,
    // not throw on a missing path
    val dir = writeEventsParquet(Seq(
      (1L, new java.sql.Timestamp(86400000L), 1L, "signup", 10.0, "{}"),
      (2L, new java.sql.Timestamp(86460000L), 1L, "signup", 20.0, "{}"),
      (3L, new java.sql.Timestamp(86520000L), 1L, "view", 5.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val out = graft.SparkEntry.queries("st_scd2_lookup_stream")(spark, dir)
    assert(out.count() == 0L, "no purchases => empty result, not a throw")
    assert(out.columns.nonEmpty, "schema must survive the empty path")
  }
}
