package graft

import org.scalatest.funsuite.AnyFunSuite

/** Property guard for the integer-mean centroid's shifted floor
  * division (operators.Similarity.meanCentroids): the component
  * `(sv + n·5120) div n − 5120` must equal floor(sv / n) for every
  * reachable (sv, n) — sv is a sum of n quantized coordinates each in
  * [−5120, 5120], so |sv| ≤ n·5120 and the shifted numerator is
  * non-negative, where Spark's truncating `div`, DuckDB's flooring
  * `//`, and Java's `/` all agree. If this identity broke, q75/q79
  * would diverge between engines only on clusters with negative
  * component sums — exactly the case a small fixture can miss.
  */
class CentroidFloorSpec extends AnyFunSuite {

  private def shifted(sv: Long, n: Long): Long = (sv + n * 5120L) / n - 5120L

  test("shifted truncating division equals floorDiv over the reachable domain") {
    val rnd = new scala.util.Random(20260812L)
    for (_ <- 1 to 200000) {
      val n = 1L + rnd.nextInt(1 << 20).toLong
      val sv = (rnd.nextLong() % (n * 5120L + 1L)) match { case s => s } // in [-n*5120, n*5120]
      assert(shifted(sv, n) == Math.floorDiv(sv, n), s"sv=$sv n=$n")
    }
  }

  test("boundary cases: extremes, exact multiples, and off-by-one") {
    for (n <- Seq(1L, 2L, 3L, 7L, 1000003L)) {
      for (sv <- Seq(-n * 5120L, -n * 5120L + 1, -1L, 0L, 1L, n * 5120L - 1, n * 5120L,
        -n, n, -n - 1, n + 1)) {
        assert(shifted(sv, n) == Math.floorDiv(sv, n), s"sv=$sv n=$n")
      }
    }
  }

  test("shifted numerator never overflows for clusters up to 9e14 members") {
    // |sv + n*5120| <= 2n*5120 < 2^63 requires n < ~9.0e14 — far above
    // any per-cluster cardinality at the 100 TB design point
    val n = 900000000000000L
    assert(n * 5120L * 2 > 0, "bound itself fits")
    assert(shifted(n * 5120L, n) == 5120L)
    assert(shifted(-n * 5120L, n) == -5120L)
  }
}
