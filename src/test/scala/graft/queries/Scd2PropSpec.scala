package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Randomized invariants for the SCD2 build + lookup, driven through the
  * REAL factored frames (seeded corpora — one Spark run per seed, the
  * Spark-backed analog of the pure BouncePropSpec discipline):
  *
  *  1. versions per key are 1..n contiguous in (event-time, id) order;
  *  2. intervals CHAIN: valid_to(v) = valid_from(v+1), last open — so
  *     per key the intervals tile [first change, ∞) with no gap and no
  *     overlap, and exactly one is_current;
  *  3. the lookup is a FUNCTION: every probe time matches ≤1 version,
  *     and equals the last version with valid_from ≤ t whose interval
  *     is non-empty (the tie rule Scd2LookupSpec pins by hand);
  *  4. no-op-change collapse: no two ADJACENT versions of a key carry
  *     an equal tracked value, and the kept versions are exactly the
  *     arrival sequence with consecutive equal values dropped (the
  *     corpus draws c from a 4-value domain, so ~25% of consecutive
  *     pairs are genuine CDC re-writes the build must collapse).
  */
class Scd2PropSpec extends SparkTestBase {
  import spark.implicits._

  private def corpus(seed: Long): Seq[(Long, Long, Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    val nUsers = 1 + rnd.nextInt(8)
    (1L to (20 + rnd.nextInt(60))).map { id =>
      // coarse timestamp grid → plenty of same-us ties across AND
      // within users, exercising the zero-width-interval rule
      (id, 1L + rnd.nextInt(nUsers),
        (1 + rnd.nextInt(12)) * 1000000L, rnd.nextInt(4).toLong)
    }
  }

  /** The arrival sequence with consecutive equal values dropped — the
    * no-op collapse restated independently of the build under test. */
  private def collapsed(rows: Seq[(Long, Long, Long, Long)], u: Long)
      : Seq[(Long, Long)] = {
    val arrival = rows.filter(_._2 == u).sortBy(t => (t._3, t._1))
    arrival.foldLeft(Vector.empty[(Long, Long)]) { case (acc, r) =>
      if (acc.nonEmpty && acc.last._2 == r._4) acc else acc :+ (r._1 -> r._4)
    }
  }

  for (seed <- Seq(1L, 7L, 42L, 1234L, 99999L))
    test(s"interval chain + lookup-function invariants (seed $seed)") {
      val rows = corpus(seed)
      val changes = rows.toDF("event_id", "user_id", "us", "c")
      val hist = AggOps.scd2FromChanges(changes)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getLong(5),
          r.getLong(6)))
        .toSeq

      // 1+2: per key, versions contiguous and intervals chain
      hist.groupBy(_._1).foreach { case (u, vs) =>
        val byVer = vs.sortBy(_._2)
        assert(byVer.map(_._2) == (1L to vs.size).toSeq, s"user $u versions")
        byVer.sliding(2).foreach {
          case Seq(a, b) =>
            assert(a._5.contains(b._4),
              s"user $u: v${a._2} valid_to ${a._5} != v${b._2} from ${b._4}")
          case _ =>
        }
        assert(byVer.last._5.isEmpty && byVer.init.forall(_._5.nonEmpty),
          s"user $u open-tail shape")
        assert(vs.count(_._7 == 1L) == 1, s"user $u is_current count")
        // 4: adjacent versions differ, and the kept versions are exactly
        // the arrival order with consecutive equal values collapsed
        byVer.sliding(2).foreach {
          case Seq(a, b) =>
            assert(a._6 != b._6,
              s"user $u: v${a._2} and v${b._2} carry equal c=${a._6} — " +
                "no-op change not collapsed")
          case _ =>
        }
        assert(byVer.map(t => (t._3, t._6)) == collapsed(rows, u),
          s"user $u kept-version sequence")
      }

      // 3: the lookup is a function equal to the literal
      //    "last non-empty interval with valid_from <= t" rule
      val histDf = changes.sparkSession.createDataFrame(
        changes.sparkSession.sparkContext.parallelize(hist.map(t =>
          org.apache.spark.sql.Row(t._1, t._2, t._4, t._5.map(Long.box).orNull,
            t._6))),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("user_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("version",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("valid_from_us",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("valid_to_us",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("c",
            org.apache.spark.sql.types.LongType))))
      val probes = (1L to 40L).map { i =>
        (1000L + i, 1L + (i % 8L), (i % 14L) * 1000000L + (i % 3L))
      }
      val facts = probes.toDF("event_id", "user_id", "us")
      val got = AggOps.scd2Lookup(facts, histDf).collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None
          else Some((r.getLong(3), r.getLong(4))))).toMap
      assert(got.size == probes.size, "lookup duplicated or dropped a fact")
      probes.foreach { case (eid, u, t) =>
        val expect = hist.filter(h => h._1 == u && h._4 <= t &&
            h._5.forall(_ > t))
          .sortBy(_._2).lastOption.map(h => (h._2, h._6))
        assert(got(eid) == expect, s"probe eid=$eid u=$u t=$t")
      }
    }
}
