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

  // SCALING.md measurement provenance (VERDICT r10: a mid-round snapshot
  // quoted "160 queries, 226.3 s" against a shipped 165-query artifact).
  // The convention (SCALING.md §7): full-suite measurements carry
  // "registry size at time of run: N". Historical Ns are snapshots of
  // smaller registries; none may EXCEED the live registry, and the most
  // recent (largest) must describe a registry that actually existed —
  // i.e. be ≤ the live size. The convention marker must keep existing.
  test("SCALING.md registry-at-run markers are present and plausible") {
    val marker = """registry size at time of run:?\s+(\d+)""".r
    val ns = marker.findAllMatchIn(read("SCALING.md")).map(_.group(1).toInt).toSeq
    assert(ns.nonEmpty,
      "SCALING.md no longer carries any 'registry size at time of run' marker")
    for (n <- ns)
      assert(n <= nQueries,
        s"SCALING.md claims a registry of $n at some run; registry has only $nQueries")
  }
}
