package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Synthetic-contention exercise for the bench's per-query gate: the
  * round-14 driver capture carried 13×-inflated rows for two queries
  * under a battery-level "clean" verdict — these pins drive the same
  * decision logic the battery now runs, with synthetic load markers,
  * proving a mid-battery spike is flagged (and a clean battery is
  * not). The retime half of the gate reuses the regression machinery
  * already pinned by the committed BENCHDIAG retime trail. */
class BenchGateSpec extends AnyFunSuite with Matchers {

  // a clean battery on this box: per-query loadavg ~2.7-7.1 around a
  // ~4 median (BENCHDIAG_r14 load block)
  private val cleanLoads = Seq(2.7, 3.1, 3.8, 4.2, 4.4, 5.1, 5.9, 7.1)

  test("clean battery: threshold sits above every per-query mark, nothing flagged") {
    val thr = BenchGate.loadThreshold(cleanLoads)
    thr shouldBe 8.36 +- 0.01 // 1.9 × the 4.4 median, just over the 8.0 floor
    BenchGate.loadThreshold(Seq(2.0, 3.0, 4.0)) shouldBe 8.0 +- 1e-9 // floor wins
    cleanLoads.foreach { l =>
      BenchGate.contendedWindow(l, l, 2, 2, thr) shouldBe false
    }
    val rows = cleanLoads.zipWithIndex.map { case (l, i) =>
      (s"q$i", 2.0, l, l, 2, 2)
    }
    BenchGate.suspects(rows) shouldBe empty
  }

  test("mid-battery spike: the inflated rows are flagged under a clean battery verdict") {
    // the r14 shape: two queries time under loadavg ~14 while the rest
    // of the battery (and the battery-start sample) are quiet
    val rows = cleanLoads.zipWithIndex.map { case (l, i) =>
      (s"q$i", 2.0, l, l, 2, 2)
    } ++ Seq(
      ("manifest_nightly", 67.8, 13.9, 14.2, 2, 2),
      ("manifest_incremental", 112.4, 14.2, 12.7, 2, 2))
    BenchGate.suspects(rows) should contain theSameElementsAs
      Seq("manifest_nightly", "manifest_incremental")
    // after the retime, the committed record keeps min(first, retime):
    // a load spike does not reproduce, so the flagged-then-cleared row
    // lands at its quiet-box cost
    val retimed = math.min(67.8, 11.3)
    retimed shouldBe 11.3
  }

  test("foreign JVM at either marker flags regardless of loadavg") {
    val thr = BenchGate.loadThreshold(cleanLoads)
    BenchGate.contendedWindow(3.0, 3.0, 3, 2, thr) shouldBe true
    BenchGate.contendedWindow(3.0, 3.0, 2, 4, thr) shouldBe true
  }

  test("sub-second rows are never retime suspects (scheduling noise)") {
    val rows = Seq(("tiny", 0.3, 20.0, 20.0, 2, 2))
    BenchGate.suspects(rows) shouldBe empty
  }

  test("uniformly-contended battery scales its own threshold: per-query gate defers to the battery verdict") {
    // every row at loadavg ~12: the relative bar (1.9 × median) rises
    // past the marks, so nothing is retimed one-by-one — the
    // battery-level contended verdict carries the adjudication
    val rows = (0 until 8).map(i => (s"q$i", 2.0, 12.0, 12.3, 2, 2))
    BenchGate.loadThreshold(rows.map(_._4)) should be > 20.0
    BenchGate.suspects(rows) shouldBe empty
  }
}
