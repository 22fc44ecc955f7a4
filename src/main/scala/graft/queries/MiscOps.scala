package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.SparkSession
import graft.core.Tables
import graft.streaming.Schemas
import graft.streaming.dwd.DbRouting
import graft.functions.Tokenize

/** Remaining SURVEY §2 rows as verifiable queries: the CDC envelope
  * contract (S1/S2), map-typed column access (F5), and the tokenizer UDTF
  * applied as a query (F9) — a4 counts words via split; this one goes
  * through the registered split_words UDF + explode (LATERAL VIEW shape).
  */
object MiscOps {

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** S1/S2 — CDC envelope round-trip: synthesize the Debezium-style JSON
    * envelope (CustomerDeserialization output contract), then parse it
    * back through DbRouting.parseCdc, normalizing ops (lower, create →
    * insert) and dropping deletes (P3). The oracle computes the expected
    * result directly from the base table — equality proves the envelope
    * encode/parse/normalize path is lossless. */
  val s2CdcNormalize = OpQuery(
    "s2_cdc_normalize",
    "CDC envelope encode→parse→normalize round-trip (CustomerDeserialization/BaseDBApp)",
    (s, dir) => {
      // The envelope crosses a real WIRE between encode and parse, like
      // the reference's Kafka topic. Composing encode→parse in one plan
      // also mis-executes: predicate pushdown substitutes dropDeletes'
      // condition below the exchange, inlining the whole
      // to_json→from_json round-trip into a scan-side Filter — computed
      // per CASE branch, single-task (the synthetic parquet is one
      // unsplittable row group), then a third time for the projection.
      // The wire hop is a source boundary the optimizer cannot push
      // through: encode runs once (redistributed off the one-task scan),
      // parse runs once, in parallel across the wire files.
      val src = t(s, dir, "orders")
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
        .repartition(s.sessionState.conf.numShufflePartitions)
      val env = src.select(to_json(struct(
        lit("gmall").as("database"),
        lit("orders").as("tableName"),
        map().cast("map<string,string>").as("before"),
        map(lit("id"), col("o_orderkey").cast("string"),
          lit("total_amount"), col("o_totalprice").cast("string")).as("after"),
        when(col("o_orderstatus") === "O", "CREATE")
          .when(col("o_orderstatus") === "F", "Update")
          .otherwise("DELETE").as("type"))).as("value"))
      // fresh per-invocation dir, deleted on JVM exit (core.Scratch)
      val wire = graft.core.Scratch.tempDir("graft_cdc_wire_")
      env.write.mode("overwrite").parquet(wire)
      DbRouting.dropDeletes(DbRouting.parseCdc(s.read.parquet(wire)))
        .select(
          element_at(col("after"), "id").cast("long").as("id"),
          col("type").as("op"))
        .orderBy("id")
    },
    Some("""SELECT o_orderkey AS id,
            CASE WHEN o_orderstatus = 'O' THEN 'insert' ELSE 'update' END AS op
            FROM orders WHERE o_orderstatus IN ('O', 'F')
            ORDER BY id"""))

  /** F5 — Map<STRING,STRING> column access + null predicate
    * (KeywordStatsApp.java:45-52: page['item'] IS NOT NULL). props parsed
    * as a map type, element_at + cardinality. */
  val f5MapAccess = OpQuery(
    "f5_map_access",
    "map-typed column: element access + key cardinality (KeywordStatsApp page['item'])",
    (s, dir) =>
      t(s, dir, "events")
        .withColumn("m", from_json(col("props"), MapType(StringType, StringType)))
        .filter(element_at(col("m"), "k").isNotNull)
        .select(col("event_id"),
          element_at(col("m"), "k").as("k_val"),
          size(map_keys(col("m"))).cast("long").as("n_keys"))
        .orderBy("event_id"),
    Some("""SELECT event_id,
            json_extract_string(props, '$.k') AS k_val,
            CAST(len(json_keys(props)) AS BIGINT) AS n_keys
            FROM events
            WHERE json_extract_string(props, '$.k') IS NOT NULL
            ORDER BY event_id"""))

  /** F9 — split_words UDTF as a query: register the tokenizer, apply it
    * through explode (the LATERAL VIEW pattern of KeywordStatsApp:55-61).
    * On this corpus (space-separated lower alnum) the segmentation equals
    * string_split, which is what lets DuckDB oracle it; the CJK-bigram
    * branch is pinned by DwsAndRoutingSpec. */
  val f9TokenizerUdtf = OpQuery(
    "f9_tokenizer_udtf",
    "registered tokenizer UDTF + LATERAL-VIEW-style explode + count (SplitFunction)",
    (s, dir) => {
      Tokenize.register(s)
      t(s, dir, "documents").createOrReplaceTempView("docs_f9")
      s.sql("""SELECT word, CAST(count(*) AS BIGINT) AS ct
               FROM docs_f9 LATERAL VIEW explode(split_words(text)) t AS word
               GROUP BY word ORDER BY word""")
    },
    Some("""SELECT word, CAST(count(*) AS BIGINT) AS ct
            FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
            WHERE length(word) > 0
            GROUP BY word ORDER BY word"""))

  val all: Seq[OpQuery] = Seq(s2CdcNormalize, f5MapAccess, f9TokenizerUdtf)
}
