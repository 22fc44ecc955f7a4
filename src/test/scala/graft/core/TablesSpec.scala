package graft.core

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkTestBase

/** Pins the testdata loader contract across generator eras: the driver has
  * shipped events.ts as parquet TIMESTAMP(NANOS) in some rounds and
  * TIMESTAMP_NTZ(µs) in others (the round-7 silent regen), so the loader
  * must adapt per footer type — and fail LOUDLY, naming the drift, on
  * anything else. */
class TablesSpec extends SparkTestBase {
  import spark.implicits._

  // 2024-01-01T00:00:07.179575Z as µs since epoch
  private val usec = 1704067207179575L

  test("normalizeTs: legacy nanos-as-long era truncates div 1000 to micros") {
    val df = Seq(usec * 1000L + 999L).toDF("ts") // ns payload, sub-µs dropped
      .withColumn("ts", Tables.normalizeTs(LongType))
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.select(unix_micros(col("ts"))).as[Long].head() == usec)
  }

  test("normalizeTs: TIMESTAMP_NTZ(µs) era casts value-preserving under UTC") {
    val df = Seq(usec).toDF("us")
      .withColumn("ts", timestamp_micros(col("us")).cast(TimestampNTZType))
      .withColumn("ts", Tables.normalizeTs(TimestampNTZType))
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.select(unix_micros(col("ts"))).as[Long].head() == usec)
  }

  test("normalizeTs: TimestampType era passes through unchanged") {
    val df = Seq(usec).toDF("us")
      .withColumn("ts", timestamp_micros(col("us")))
      .withColumn("ts", Tables.normalizeTs(TimestampType))
    assert(df.select(unix_micros(col("ts"))).as[Long].head() == usec)
  }

  test("normalizeTs: an unknown ts type names the drift instead of limping") {
    val e = intercept[IllegalStateException](Tables.normalizeTs(StringType))
    assert(e.getMessage.contains("testdata contract drift"))
    assert(e.getMessage.contains("events.ts"))
  }

  test("both parquet eras load to identical micros through Tables.load") {
    // write the same instant in both physical encodings and read each
    // back through the real loader path (footer-typed parquet scan)
    val dir = tmpDir()
    val base = Seq((1L, usec, 7L, "view", 1.0, "{}"))
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
    // µs era: TIMESTAMP_NTZ micros, what the round-7 regen ships
    base.withColumn("ts", timestamp_micros(col("us")).cast(TimestampNTZType))
      .drop("us")
      .write.mode("overwrite").parquet(s"$dir/ntz/events.parquet")
    // ns era: INT64 ts read back as long under nanosAsLong — physically a
    // plain long column here, which exercises the same LongType branch
    base.withColumn("ts", col("us") * 1000L).drop("us")
      .write.mode("overwrite").parquet(s"$dir/ns/events.parquet")
    val ntz = Tables.load(spark, s"$dir/ntz", "events")
      .select(unix_micros(col("ts"))).as[Long].head()
    val ns = Tables.load(spark, s"$dir/ns", "events")
      .select(unix_micros(col("ts"))).as[Long].head()
    assert(ntz == usec && ns == usec)
  }

  test("a REAL parquet TIMESTAMP(NANOS) footer loads to micros via nanosAsLong") {
    // The ns-era test above writes a plain INT64 column; this one writes
    // an actual TIMESTAMP(NANOS) logical type with the low-level parquet
    // API, so the nanosAsLong read path is exercised against the same
    // footer metadata the round-1..6 generator produced — a regression
    // in that legacy branch fails HERE, not in some future round.
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.parquet.schema.MessageTypeParser
    val dir = tmpDir()
    val schema = MessageTypeParser.parseMessageType(
      """message events {
        |  required int64 event_id;
        |  required int64 ts (TIMESTAMP(NANOS,true));
        |  required int64 user_id;
        |  required binary event_type (STRING);
        |  required double value;
        |  required binary props (STRING);
        |}""".stripMargin)
    val file = new org.apache.hadoop.fs.Path(s"$dir/events.parquet/part-0.parquet")
    val writer = ExampleParquetWriter.builder(file).withType(schema).build()
    val g = new SimpleGroupFactory(schema).newGroup()
      .append("event_id", 1L)
      .append("ts", usec * 1000L + 999L) // ns payload, sub-µs dropped
      .append("user_id", 7L)
      .append("event_type", "view")
      .append("value", 1.0)
      .append("props", "{}")
    writer.write(g)
    writer.close()
    val got = Tables.load(spark, dir, "events")
    assert(got.schema("ts").dataType == TimestampType)
    assert(got.select(unix_micros(col("ts"))).as[Long].head() == usec)
  }

  test("Tables.load pins the session time zone to UTC for the NTZ cast") {
    // a non-UTC driver-supplied session must not shift events.ts — load
    // pins UTC itself (the NTZ→TIMESTAMP cast reads the session zone)
    val dir = tmpDir()
    Seq((1L, usec, 7L, "view", 1.0, "{}"))
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("us")).cast(TimestampNTZType))
      .drop("us")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "Asia/Shanghai")
      val got = Tables.load(spark, dir, "events")
        .select(unix_micros(col("ts"))).as[Long].head()
      assert(got == usec)
      assert(spark.conf.get("spark.sql.session.timeZone") == "UTC")
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("contractCheck passes on the real sf0.001 testdata") {
    Tables.contractCheck(spark, "/root/testdata/sf0.001")
  }

  test("contractCheck names a missing/renamed column in one line") {
    val dir = tmpDir()
    // clone sf0.001 footers cheaply: only events is rewritten, broken
    graft.core.Tables.names.foreach { n =>
      val src = s"/root/testdata/sf0.001/$n.parquet"
      if (n == "events")
        Tables.load(spark, "/root/testdata/sf0.001", "events")
          .withColumnRenamed("user_id", "uid")
          .write.mode("overwrite").parquet(s"$dir/$n.parquet")
      else
        spark.read.parquet(src).limit(1)
          .write.mode("overwrite").parquet(s"$dir/$n.parquet")
    }
    val e = intercept[IllegalStateException](Tables.contractCheck(spark, dir))
    assert(e.getMessage.contains("testdata contract drift"))
    assert(e.getMessage.contains("user_id"))
  }
}
