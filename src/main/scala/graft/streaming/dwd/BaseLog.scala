package graft.streaming.dwd

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.streaming.Schemas

/** DWD log layer — the BaseLogApp chain (RT/app/dwd/BaseLogApp.java:19-130)
  * rebuilt Spark-first: one parsed stream, split by filters (no side-output
  * concept needed), is_new repaired with per-mid state.
  *
  * Every transform is DataFrame => DataFrame so the same code runs on a
  * MemoryStream, a Kafka source, or a batch fixture.
  */
object BaseLog {

  /** P1 — parse raw JSON lines with dirty-data routing
    * (BaseLogApp.java:35-48). Returns the parsed frame with a `_corrupt`
    * column; `clean`/`dirty` below are the two routes. */
  def parse(raw: DataFrame): DataFrame = {
    val schema = Schemas.pageLog.add("_corrupt", "string")
    raw.select(
      from_json(col("value"), schema,
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_corrupt"))
        .as("j"))
      .select("j.*")
  }

  def clean(parsed: DataFrame): DataFrame =
    parsed.filter(col("_corrupt").isNull).drop("_corrupt")

  /** The reference sends unparseable strings to a "Dirty" side output
    * (OutputTag) — here simply the complementary filter. */
  def dirty(parsed: DataFrame): DataFrame =
    parsed.filter(col("_corrupt").isNotNull).select(col("_corrupt").as("value"))

  case class MidEvent(mid: String, ts: Long, json: String)

  /** A6 — new-visitor flag repair (BaseLogApp.java:52-77): per-mid boolean
    * seen-state; a record claiming is_new=1 is rewritten to 0 if the mid
    * was seen before (state exists). flatMapGroupsWithState keeps Append
    * semantics so downstream splits stay streaming-composable.
    *
    * State: first-seen date string (the reference stores last visit date);
    * no TTL — the reference sets none here.
    */
  def repairIsNew(clean: DataFrame): DataFrame = {
    import clean.sparkSession.implicits._
    val withJson = clean
      .withColumn("_json", to_json(struct(clean.columns.map(col): _*)))
      .select(col("common.mid").as("mid"), col("ts"), col("_json").as("json"))
      .as[MidEvent]

    def fix(mid: String, rows: Iterator[MidEvent],
            state: GroupState[String]): Iterator[String] = {
      // micro-batch arrival order is not time order — sort like the
      // reference's single-partition in-order consumption
      val sorted = rows.toSeq.sortBy(_.ts)
      sorted.map { e =>
        val seen = state.getOption.isDefined
        if (!seen) state.update(java.time.Instant.ofEpochMilli(e.ts).toString)
        if (seen) e.json.replaceFirst(""""is_new":"1"""", """"is_new":"0"""")
        else e.json
      }.iterator
    }

    val repaired = withJson
      .groupByKey(_.mid)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fix)
    parse(repaired.toDF("value")).drop("_corrupt")
  }

  /** P5 — the 1→3 stream split (BaseLogApp.java:84-121). */
  def startLog(df: DataFrame): DataFrame = df.filter(col("start.entry").isNotNull)

  def pageLog(df: DataFrame): DataFrame = df.filter(col("start.entry").isNull)

  /** displays[] exploded one row per display, enriched with parent page_id
    * (BaseLogApp.java:101-113); the generator is Catalyst's explode. */
  def displayLog(df: DataFrame): DataFrame =
    pageLog(df)
      .filter(size(col("displays")) > 0)
      .select(col("ts"), col("common.mid").as("mid"),
        col("page.page_id").as("page_id"), explode(col("displays")).as("d"))
      .select(col("ts"), col("mid"), col("page_id"), col("d.*"))
}
