package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** The ambient-load arithmetic the bench gate rests on (extracted to
  * [[HostProbe]] in round 9, shared by Bench and the scale rehearsal).
  * The probes themselves are exercised for shape only — their values are
  * host-dependent — but the jiffy subtraction must be exact: it decides
  * whether a measurement is trusted. */
class HostProbeSpec extends AnyFunSuite {

  test("otherCores subtracts self jiffies from total busy jiffies") {
    // 400 total busy jiffies, 300 of them ours, over 1 s → 1 foreign core
    assert(HostProbe.otherCores((1000L, 500L), (1400L, 800L), 1.0) === 1.0)
    // all busy jiffies ours → 0 foreign cores
    assert(HostProbe.otherCores((1000L, 500L), (1400L, 900L), 1.0) === 0.0)
    // 2 s window halves the rate
    assert(HostProbe.otherCores((1000L, 500L), (1400L, 800L), 2.0) === 0.5)
  }

  test("otherCores clamps garbage to zero, never negative") {
    // self advanced more than total (scheduler jitter) → clamp to 0
    assert(HostProbe.otherCores((1000L, 500L), (1100L, 700L), 1.0) === 0.0)
    // off-Linux sentinel samples and degenerate windows report 0
    assert(HostProbe.otherCores((-1L, -1L), (1400L, 800L), 1.0) === 0.0)
    assert(HostProbe.otherCores((1000L, 500L), (-1L, -1L), 1.0) === 0.0)
    assert(HostProbe.otherCores((1000L, 500L), (1400L, 800L), 0.0) === 0.0)
  }

  test("live probes return sane shapes on this host") {
    val (busy, self) = HostProbe.cpuSample()
    assert(busy > 0 && self >= 0)
    assert(HostProbe.loadAvg().split(" ").length === 3)
    val o = HostProbe.otherCoresNow(100)
    assert(o >= 0.0 && o < 1000.0)
  }
}
