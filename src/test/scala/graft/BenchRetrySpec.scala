package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit-gates Bench's outlier auto-retry decision. The r15 blind spot:
  * the old threshold was max(3×own-min, 2×floor) — an AND in effect —
  * so a SUSTAINED load burst that inflated all three reps uniformly
  * (median ≈ min, e.g. cluster_keep_longest shipping at 13× floor with
  * n_retried: 0) never fired. The detectors are independent failure
  * signatures and must be OR'd. */
class BenchRetrySpec extends AnyFunSuite {

  test("transient spike: median far above own min retries even with " +
      "no floor on record") {
    assert(Bench.shouldRetry(med = 3.0, minRep = 0.5, floor = None))
  }

  test("sustained burst: all reps uniformly slow (median ≈ min) still " +
      "retries when the floor says 2×+ (the r15 cluster_keep_longest " +
      "shape: 35 s median, ~12 s min, 2.7 s floor)") {
    assert(Bench.shouldRetry(med = 35.1, minRep = 12.0, floor = Some(2.694)))
    // the OLD max() semantics would have required med > 3*12 = 36 too
  }

  test("healthy query at floor does not retry") {
    assert(!Bench.shouldRetry(med = 1.0, minRep = 0.9, floor = Some(0.95)))
  }

  test("tight spread just under both detectors does not retry") {
    assert(!Bench.shouldRetry(med = 1.8, minRep = 1.0, floor = Some(1.0)))
  }

  test("sub-0.3 s medians are scheduler jitter: never retried, even at " +
      "10x floor") {
    assert(!Bench.shouldRetry(med = 0.25, minRep = 0.02, floor = Some(0.02)))
  }

  test("first-seen query (no floor) with tight spread does not retry") {
    assert(!Bench.shouldRetry(med = 5.0, minRep = 4.0, floor = None))
  }
}
