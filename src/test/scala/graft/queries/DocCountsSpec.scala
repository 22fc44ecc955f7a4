package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Structural guard against doc-count drift (a three-round recurring nit):
  * the "N operator queries, M oracle-gated" claims in README.md and
  * ARCHITECTURE.md, and README's "K/K expected" check_oracle line, must
  * match the LIVE registry — not whatever round last edited the prose.
  * Pure text parsing, no SparkSession needed.
  */
class DocCountsSpec extends AnyFunSuite {

  private val nQueries = Registry.all.size
  private val nOracle = Registry.all.count(_.oracle.isDefined)

  private def read(name: String): String = {
    val p = java.nio.file.Paths.get(name)
    assert(java.nio.file.Files.exists(p), s"$name missing")
    new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
  }

  // "157 operator queries, 157 oracle-gated" (line breaks allowed between
  // the number and the phrase — markdown wraps)
  private val claim =
    """(\d+)\s+operator\s+queries,\s+(\d+)\s+oracle""".r

  for (doc <- Seq("README.md", "ARCHITECTURE.md"))
    test(s"$doc query/oracle counts match the registry") {
      val text = read(doc).replaceAll("\\s+", " ")
      val ms = claim.findAllMatchIn(text).toSeq
      assert(ms.nonEmpty, s"$doc no longer states the registry counts")
      for (m <- ms) {
        assert(m.group(1).toInt == nQueries,
          s"$doc claims ${m.group(1)} operator queries; registry has $nQueries")
        assert(m.group(2).toInt == nOracle,
          s"$doc claims ${m.group(2)} oracle-gated; registry has $nOracle")
      }
    }

  test("README check_oracle expectation matches the oracle count") {
    val exp = """(\d+)/(\d+) expected""".r
    val ms = exp.findAllMatchIn(read("README.md")).toSeq
    assert(ms.nonEmpty, "README no longer states the check_oracle expectation")
    for (m <- ms; g <- Seq(m.group(1), m.group(2)))
      assert(g.toInt == nOracle,
        s"README expects $g oracle matches; registry has $nOracle")
  }
}
