package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's outlier-retry fold (Bench.foldRetry / spreadOf) — the
  * path only executes when a timed pass was contended, so every clean
  * run ships it untested unless the decision core is pinned here.
  */
class BenchRetrySpec extends AnyFunSuite {

  test("replaces exactly the worst rep, and only when the retry beat it") {
    val (r1, rep1) = Bench.foldRetry(Vector(0.1, 0.9, 0.12), 0.11)
    assert(rep1 && r1 == Vector(0.1, 0.11, 0.12))
    // slower retry (still-contended box): data unchanged, recorded as
    // not-replaced
    val (r2, rep2) = Bench.foldRetry(Vector(0.1, 0.9, 0.12), 1.4)
    assert(!rep2 && r2 == Vector(0.1, 0.9, 0.12))
    // tie: not an improvement, keep the original
    val (r3, rep3) = Bench.foldRetry(Vector(0.1, 0.9), 0.9)
    assert(!rep3 && r3 == Vector(0.1, 0.9))
  }

  test("a successful retry can only shrink the published spread") {
    val reps = Vector(0.10, 0.11, 0.95)
    val before = Bench.spreadOf(reps)
    val (after, _) = Bench.foldRetry(reps, 0.13)
    assert(before > 5.0)
    assert(Bench.spreadOf(after) < before)
    assert(Bench.spreadOf(after) < 5.0)
  }

  test("spread uses the same median convention as the published stats") {
    // Bench.median = sorted(size/2) — upper median on even sizes
    assert(Bench.spreadOf(Seq(1.0, 2.0, 10.0)) == 5.0)
    // even size takes the UPPER middle (sorted(size/2)) — max/4.0 here
    assert(Bench.spreadOf(Seq(2.0, 4.0)) == 1.0)
  }

  test("repeated folds converge: the worst rep is always the target") {
    var reps = Vector(0.1, 3.0, 2.0)
    val (a, _) = Bench.foldRetry(reps, 0.12); reps = a
    assert(reps == Vector(0.1, 0.12, 2.0))
    val (b, _) = Bench.foldRetry(reps, 0.11); reps = b
    assert(reps == Vector(0.1, 0.12, 0.11))
    assert(Bench.spreadOf(reps) < 5.0)
  }
}
