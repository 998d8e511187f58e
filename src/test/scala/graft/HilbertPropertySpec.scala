package graft

import org.scalatest.funsuite.AnyFunSuite

/** The two axioms q314's locality audit rests on, pinned directly on
  * [[operators.Layout.hilbertD]]:
  *
  *  - BIJECTIVITY: the curve visits every cell of the n×n grid exactly
  *    once (otherwise curve "rank" is ill-defined and the run counts
  *    are meaningless);
  *  - UNIT STEPS: consecutive curve indices are GRID-ADJACENT
  *    (|Δx|+|Δy| = 1) — the defining Hilbert property Z-order lacks,
  *    and the reason the audit expects fewer Hilbert runs per
  *    rectangle.
  *
  * Checked at n = 2, 4, 8, 16 (every power of two up to the shipped
  * grid), plus the shared 256-entry lookup's self-consistency.
  */
class HilbertPropertySpec extends AnyFunSuite {

  private def curve(n: Int): Map[Int, (Int, Int)] =
    (for (x <- 0 until n; y <- 0 until n)
      yield operators.Layout.hilbertD(n, x, y) -> (x, y)).toMap

  for (n <- Seq(2, 4, 8, 16)) {
    test(s"hilbertD($n): bijective onto 0..${n * n - 1}") {
      val ds = for (x <- 0 until n; y <- 0 until n)
        yield operators.Layout.hilbertD(n, x, y)
      assert(ds.sorted == (0 until n * n).toList,
        s"n=$n: indices are not a permutation of the grid")
    }

    test(s"hilbertD($n): consecutive indices are grid-adjacent") {
      val byD = curve(n)
      val bad = (0 until n * n - 1).filter { d =>
        val (x0, y0) = byD(d)
        val (x1, y1) = byD(d + 1)
        math.abs(x0 - x1) + math.abs(y0 - y1) != 1
      }
      assert(bad.isEmpty, s"n=$n: non-unit steps at indices $bad")
    }
  }

  test("hilbertLut16 is exactly the n=16 curve (one definition, two renderings)") {
    val lut = operators.Layout.hilbertLut16
    assert(lut.size == 256)
    assert(lut.forall { case (x, y, d) =>
      operators.Layout.hilbertD(16, x.toInt, y.toInt).toLong == d
    })
  }
}
