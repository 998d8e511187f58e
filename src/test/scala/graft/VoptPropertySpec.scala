package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Layout

/** Property test for q305's V-optimal histogram DP
  * (`Layout.voptDp`) against exhaustive split enumeration.
  *
  * The production claim: the O(k·n²) dynamic program returns the
  * k-bucket partition minimizing total within-bucket SSE (in the milli
  * fixed-point cost the query and its DuckDB oracle both floor
  * identically), with the lexicographically-smallest split vector on
  * cost ties. Exhaustive enumeration over all C(n−1, k−1) split
  * choices is feasible at spec scale and checks both the optimum and
  * the tie-break, across random series, flat series (all-ties — the
  * hardest tie-break case), and step functions (where the optimal
  * boundaries are unambiguous).
  */
class VoptPropertySpec extends AnyFunSuite {

  private def prefixes(xs: Array[Long]): (Array[Long], Array[Long]) = {
    val n = xs.length
    val ps = new Array[Long](n + 1)
    val pq = new Array[Long](n + 1)
    for (i <- 1 to n) {
      ps(i) = ps(i - 1) + xs(i - 1)
      pq(i) = pq(i - 1) + xs(i - 1) * xs(i - 1)
    }
    (ps, pq)
  }

  private def cost(ps: Array[Long], pq: Array[Long], i: Int, j: Int): Long =
    (pq(j) - pq(i - 1)) * 1000L -
      (ps(j) - ps(i - 1)) * (ps(j) - ps(i - 1)) * 1000L / (j - i + 1)

  /** exhaustive optimum: (lexicographically smallest argmin splits,
    * min total cost) over all split vectors s₁ < … < s_{k−1}. */
  private def brute(ps: Array[Long], pq: Array[Long], n: Int,
                    k: Int): (List[Int], Long) = {
    def total(splits: List[Int]): Long = {
      val bounds = (0 :: splits) :+ n
      bounds.sliding(2).map { case List(lo, hi) =>
        cost(ps, pq, lo + 1, hi)
      }.sum
    }
    val all = (1 until n).toList.combinations(k - 1).map(_.sorted)
    // min by (cost, splits lexicographic) — the DP's declared order
    all.map(s => (s, total(s))).minBy { case (s, c) =>
      (c, s.map(_.toLong).foldLeft(0L)((acc, x) => acc * 64 + x))
    } match { case (s, c) => (s, c) }
  }

  private val rnd = new scala.util.Random(20260815L)

  test("DP optimum equals exhaustive enumeration on random series") {
    for (_ <- 1 to 40) {
      val n = 5 + rnd.nextInt(8) // 5..12
      val k = 2 + rnd.nextInt(2) // 2..3
      val xs = Array.fill(n)(rnd.nextInt(50).toLong)
      val (ps, pq) = prefixes(xs)
      val (dpSplits, dpCost) = Layout.voptDp(ps, pq, n, k)
      val (bSplits, bCost) = brute(ps, pq, n, k)
      assert(dpCost === bCost, s"cost mismatch on ${xs.toList} k=$k")
      assert(dpSplits.toList === bSplits,
        s"split tie-break mismatch on ${xs.toList} k=$k")
    }
  }

  test("flat series: all splits tie, the DP picks the smallest vector") {
    val xs = Array.fill(10)(7L)
    val (ps, pq) = prefixes(xs)
    val (dpSplits, dpCost) = Layout.voptDp(ps, pq, 10, 3)
    val (bSplits, bCost) = brute(ps, pq, 10, 3)
    assert(dpCost === bCost)
    assert(dpSplits.toList === bSplits)
    assert(dpSplits.toList === List(1, 2),
      "flat ties must resolve to the lexicographically smallest splits")
  }

  test("step function: boundaries land exactly on the level changes") {
    val xs = Array(1L, 1L, 1L, 100L, 100L, 100L, 5L, 5L, 5L)
    val (ps, pq) = prefixes(xs)
    val (dpSplits, dpCost) = Layout.voptDp(ps, pq, 9, 3)
    assert(dpSplits.toList === List(3, 6))
    assert(dpCost === 0L, "perfectly piecewise-constant series has zero SSE")
  }
}
