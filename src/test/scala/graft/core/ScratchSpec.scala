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
}
