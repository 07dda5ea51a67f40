package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Round-15 verdict task 6: the jittered create-race backoff
  * (`ManifestTable.raceBackoffMs`). Measured motivation in SCALING §18:
  * without it, 8 sustained committers re-collide in lockstep and blow
  * the 50-attempt claim bound; with it, 16 converge. The math contract:
  * free first two attempts, growing cap, real jitter, deterministic per
  * (seed, attempt).
  */
class CommitBackoffSpec extends AnyFunSuite {

  test("first two attempts are free — the common 2-3-writer case pays nothing") {
    (1 to 2).foreach(a => assert(ManifestTable.raceBackoffMs(a, 42L) == 0L))
  }

  test("waits are bounded by the growing cap and never negative") {
    val seeds = Seq(1L, 42L, -7L, Long.MaxValue, Long.MinValue)
    (3 to 12).foreach { a =>
      val cap = math.min(200L, 10L << math.min(a, 6))
      seeds.foreach { s =>
        val ms = ManifestTable.raceBackoffMs(a, s)
        assert(ms >= 0 && ms < cap, s"attempt $a seed $s: $ms not in [0, $cap)")
      }
    }
  }

  test("jitter is real: different seeds (threads) spread within one attempt") {
    val atAttempt5 = (1L to 32L).map(s => ManifestTable.raceBackoffMs(5, s)).distinct
    assert(atAttempt5.size > 16,
      s"32 threads landed on only ${atAttempt5.size} distinct waits — lockstep re-collision")
  }

  test("deterministic per (seed, attempt) — replayable, no wall-clock/global RNG dependence") {
    (3 to 8).foreach { a =>
      assert(ManifestTable.raceBackoffMs(a, 7L) == ManifestTable.raceBackoffMs(a, 7L))
    }
  }

  test("the sum of worst-case waits stays far under the liveness ceilings") {
    // 50 attempts of max backoff must not approach the 3x invalidGraceMs
    // (90 s default) contention ceiling — backoff must never convert a
    // losing-but-live committer into a spurious liveness failure
    val worst = (1 to 50).map(a => math.min(200L, 10L << math.min(a, 6)) - 1).sum
    assert(worst < 15000L, s"worst-case total backoff $worst ms too close to the ceilings")
  }
}
