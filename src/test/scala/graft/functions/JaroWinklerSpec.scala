package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Score parity for the native Jaro-Winkler expression against DuckDB's
  * `jaro_winkler_similarity` — the ORACLE engine for x_er_fuzzy_match —
  * on a pinned battery computed directly from DuckDB (including its
  * non-textbook edges: 0.0 for two empty strings; boost only when
  * jaro > 0.7). Exact double equality, not tolerance: the oracle gate
  * floor-truncates to 4 dp, but the kernels must agree bit-for-bit on
  * the raw score for that truncation to be trustworthy. */
class JaroWinklerSpec extends SparkTestBase {
  import spark.implicits._

  // (a, b, duckdb jaro_winkler_similarity(a, b)) — values captured from
  // DuckDB; regenerate with:
  //   duckdb -c "select jaro_winkler_similarity('<a>','<b>')"
  private val pinned = Seq(
    ("martha", "marhta", 0.9611111111111111),
    ("DWAYNE", "DUANE", 0.8400000000000001),
    ("DIXON", "DICKSONX", 0.8133333333333332),
    ("apple", "aple", 0.9466666666666665),
    ("large ring", "blue ring", 0.7783068783068784),
    ("hot bolt", "hot belt", 0.95),
    ("old plate", "cold plate", 0.9666666666666667),
    ("abcdef", "fedcba", 0.38888888888888884),
    ("aaaaa", "aaaab", 0.92),
    ("prefix_common_tail_x", "prefix_common_tail_y", 0.98),
    ("ab", "ba", 0.0),
    ("zzzz", "zzzz", 1.0),
    ("a", "b", 0.0),
    ("a", "a", 1.0),
    ("xy", "yx", 0.0),
    ("jellyfish", "smellyfish", 0.8962962962962964),
    ("crate", "trace", 0.7333333333333334),
    // edges pinned from DuckDB: empties → 0; sub-threshold jaro with a
    // common prefix gets NO winkler boost (0.5 stays 0.5)
    ("", "", 0.0),
    ("", "abc", 0.0),
    ("abcdefgh", "abzzzzzz", 0.5))

  test("kernel matches DuckDB bit-for-bit on the pinned battery") {
    for ((a, b, want) <- pinned) {
      assert(JaroWinkler.score(a, b) == want, s"score('$a','$b')")
      // symmetry (DuckDB's is symmetric; ours must be too)
      assert(JaroWinkler.score(b, a) == want, s"score('$b','$a')")
    }
  }

  test("expression path (codegen) equals the kernel over a DataFrame") {
    val df = pinned.map { case (a, b, w) => (a, b, w) }.toDF("a", "b", "want")
    val rows = df.select(
        JaroWinkler.jaroWinkler(spark, col("a"), col("b")).as("got"),
        col("want"))
      .collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("range and identity properties on random strings") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 500) {
      val a = rnd.alphanumeric.take(1 + rnd.nextInt(12)).mkString
      val b = rnd.alphanumeric.take(1 + rnd.nextInt(12)).mkString
      val s = JaroWinkler.score(a, b)
      assert(s >= 0.0 && s <= 1.0, s"out of range: '$a' '$b' -> $s")
      assert(JaroWinkler.score(a, a) == 1.0)
      assert(s == JaroWinkler.score(b, a), "symmetry")
    }
  }
}
