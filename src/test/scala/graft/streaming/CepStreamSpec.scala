package graft.streaming

import graft.SparkTestBase
import graft.cep.{Matcher, Pattern, Run}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The streaming CEP shape behind st_cep_times_stream: the quantified
  * matcher's open runs ride flatMapGroupsWithState keyed state, so a
  * partial match started in one micro-batch completes in a later one —
  * the cross-batch behavior the registry query (single-batch at test
  * scale) cannot exercise. */
object CepStreamSpec {
  case class V(user: Long, us: Long, name: String)
  case class St(runs: Seq[Run[V]])
}

class CepStreamSpec extends SparkTestBase {
  import spark.implicits._
  import CepStreamSpec.{V, St}

  test("a times(3) partial match completes across micro-batches") {
    implicit val ctx = spark.sqlContext
    val pat = Pattern.begin[V]("v", _ => true).times(3).within(100L)
    val input = MemoryStream[V]
    def step(user: Long, rows: Iterator[V],
        state: GroupState[St]): Iterator[Seq[String]] = {
      val active0 = state.getOption.map(_.runs.toList).getOrElse(Nil)
      val sorted = rows.toSeq.sortBy(_.us)
      val res = Matcher.advance(pat, active0, sorted.iterator.map(e => (e.us, e)))
      state.update(St(res.active))
      res.matches.iterator.map(_.map(_.name))
    }
    val out = input.toDS().groupByKey(_.user)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(step)
      .toDF("names")
    val q = out.writeStream.format("memory").queryName("cep_xbatch")
      .outputMode("append").start()
    def matches(): Set[Seq[String]] =
      spark.table("cep_xbatch").as[Seq[String]].collect().toSet
    try {
      // batch 1: two views — runs open, nothing emits
      input.addData(V(1L, 10L, "v1"), V(1L, 20L, "v2"))
      q.processAllAvailable()
      assert(matches() == Set.empty)
      // batch 2: the third view completes the run STARTED in batch 1
      input.addData(V(1L, 30L, "v3"))
      q.processAllAvailable()
      assert(matches() == Set(Seq("v1", "v2", "v3")))
      // batch 3: v4 completes the v2- and v3-rooted runs (NO_SKIP), but
      // the v1-rooted window [10, 110) has NOT expired yet at us=40
      input.addData(V(1L, 40L, "v4"))
      q.processAllAvailable()
      assert(matches() == Set(Seq("v1", "v2", "v3"), Seq("v2", "v3", "v4")))
      // batch 4: at us=130 the v3-rooted run is out of window (expiry
      // inside the fold, no watermark needed) so v5 completes nothing:
      // only the v4-rooted run survives, now at two views
      input.addData(V(1L, 130L, "v5"))
      q.processAllAvailable()
      assert(matches() == Set(Seq("v1", "v2", "v3"), Seq("v2", "v3", "v4")))
    } finally q.stop()
  }
}
