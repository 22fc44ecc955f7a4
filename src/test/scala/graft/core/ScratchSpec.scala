package graft.core

import java.io.File
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Scratch-directory lifecycle: fresh dir per call, eager reclamation of
  * the previous same-prefix dir (bench/verify iterations must not
  * accumulate layout copies), independent prefixes coexist. */
class ScratchSpec extends AnyFunSuite {

  test("tempDir returns a fresh existing directory per call") {
    val a = Scratch.tempDir("graft_scratch_spec_a_")
    assert(Files.isDirectory(Paths.get(a)))
    val b = Scratch.tempDir("graft_scratch_spec_b_")
    assert(a != b && Files.isDirectory(Paths.get(b)))
  }

  test("same-prefix call reclaims the previous directory, content and all") {
    val first = Scratch.tempDir("graft_scratch_spec_reuse_")
    Files.write(Paths.get(first, "layout.bin"), Array[Byte](1, 2, 3))
    val second = Scratch.tempDir("graft_scratch_spec_reuse_")
    assert(second != first)
    assert(!new File(first).exists(), "previous same-prefix dir must be deleted")
    assert(Files.isDirectory(Paths.get(second)))
  }

  test("a different prefix does not reclaim another prefix's live dir") {
    val keep = Scratch.tempDir("graft_scratch_spec_keep_")
    Scratch.tempDir("graft_scratch_spec_other_")
    assert(new File(keep).exists())
  }

  test("cached: one build per key, same fully-built path for every caller") {
    var builds = 0
    def get() = Scratch.cached("scratch_spec_cache_a") { p =>
      builds += 1
      Files.writeString(Paths.get(p, "artifact"), "built")
    }
    val first = get(); val second = get()
    assert(first == second)
    assert(builds == 1, "the artifact must build exactly once per JVM")
    assert(Files.exists(Paths.get(first, "artifact")))
  }

  test("cached: distinct keys get distinct directories") {
    val a = Scratch.cached("scratch_spec_cache_b")(_ => ())
    val b = Scratch.cached("scratch_spec_cache_c")(_ => ())
    assert(a != b)
    // and tempDir's same-prefix reclamation must not touch cached dirs
    Scratch.tempDir("scratch_spec_cache_b")
    assert(new File(a).exists())
  }
}
