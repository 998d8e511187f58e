package graft

import org.scalatest.funsuite.AnyFunSuite

/** Property test for the KNN-Shapley closed form q293 encodes.
  *
  * q293's window plan computes [Jia+ VLDB'19 Theorem 1]:
  * with training points sorted by distance (rank i = 1..n),
  *   s_n = 1[y_n = y] / n
  *   s_i = s_{i+1} + (1[y_i = y] − 1[y_{i+1} = y]) · min(K, i) / (K·i)
  * as a suffix scan in nano fixed-point (each coefficient
  * min(K,i)·10⁹ div (K·i) floored, the sign applied outside — exactly
  * the `delta`/`base` columns in Similarity.scala's q293 and its
  * DuckDB oracle).
  *
  * This spec checks the IDENTITY the plan relies on: the suffix scan
  * equals the Shapley value computed from first principles — the
  * permutation-average of marginal utility contributions, where the
  * utility of a subset S is the fraction of its min(K,|S|) nearest
  * members sharing the query label ([Jia+] utility; 0 for empty S).
  * Exact rational arithmetic (BigInt fractions) on both sides, then
  * both floored to nano units the way the fixed-point plan floors —
  * any off-by-one in the coefficient, the rank direction, or the base
  * term shows up immediately at n ≤ 9 where brute force enumerates
  * all n! permutations.
  */
class KnnShapleyPropertySpec extends AnyFunSuite {

  private case class Frac(num: BigInt, den: BigInt) {
    def +(o: Frac): Frac = Frac(num * o.den + o.num * den, den * o.den)
    def -(o: Frac): Frac = Frac(num * o.den - o.num * den, den * o.den)
    def /(k: BigInt): Frac = Frac(num, den * k)
    def floorNano: Long = {
      val scaled = num * 1000000000L
      val q = if (scaled.sign * den.sign >= 0) scaled / den
        else -((-scaled + den.abs - 1) / den.abs)
      q.toLong
    }
  }
  private def frac(n: Long, d: Long) = Frac(BigInt(n), BigInt(d))

  /** utility of an ORDERED-by-distance subset: [Jia+] u(S) =
    * (1/K) Σ over S's min(K,|S|) nearest members of 1[label match] —
    * the denominator is K even when |S| < K (verified: the min(K,|S|)
    * denominator variant does NOT satisfy the Theorem 1 recursion). */
  private def utility(ranksInS: List[Int], ind: Array[Int], K: Int): Frac =
    if (ranksInS.isEmpty) frac(0, 1)
    else {
      val nearest = ranksInS.sorted.take(K)
      frac(nearest.map(r => ind(r).toLong).sum, K.toLong)
    }

  /** brute-force Shapley of every point: average marginal contribution
    * over all n! permutations. */
  private def bruteShapley(ind: Array[Int], K: Int): Array[Frac] = {
    val n = ind.length
    val out = Array.fill(n)(frac(0, 1))
    val perms = (0 until n).toList.permutations.toList
    perms.foreach { perm =>
      var before = List.empty[Int]
      perm.foreach { p =>
        val withP = utility(p :: before, ind, K)
        val withoutP = utility(before, ind, K)
        out(p) = out(p) + (withP - withoutP)
        before = p :: before
      }
    }
    out.map(f => f / BigInt(perms.size))
  }

  /** the q293 suffix scan, exact rationals (ranks 0-indexed here). */
  private def suffixScan(ind: Array[Int], K: Int): Array[Frac] = {
    val n = ind.length
    val s = new Array[Frac](n)
    s(n - 1) = frac(ind(n - 1).toLong, n.toLong)
    for (i <- n - 2 to 0 by -1) {
      val rank1 = i + 1 // 1-indexed rank of point i
      val coef = frac(math.min(K, rank1).toLong, K.toLong * rank1)
      val sign = (ind(i) - ind(i + 1)).toLong
      s(i) = s(i + 1) + Frac(coef.num * sign, coef.den)
    }
    s
  }

  private val rnd = new scala.util.Random(15L)

  test("suffix scan equals brute-force Shapley (exact rationals)") {
    for (_ <- 1 to 15) {
      val n = 4 + rnd.nextInt(4) // 4..7 (n! permutations)
      val K = 1 + rnd.nextInt(3) // 1..3
      val ind = Array.fill(n)(rnd.nextInt(2))
      val sfx = suffixScan(ind, K)
      val brute = bruteShapley(ind, K)
      for (i <- 0 until n) {
        val diff = sfx(i) - brute(i)
        assert(diff.num === BigInt(0),
          s"rank ${i + 1}: scan ${sfx(i)} != brute ${brute(i)} " +
            s"(ind=${ind.toList} K=$K)")
      }
    }
  }

  test("efficiency: values sum to the utility of the full set") {
    for (_ <- 1 to 10) {
      val n = 5 + rnd.nextInt(3)
      val K = 2
      val ind = Array.fill(n)(rnd.nextInt(2))
      val total = suffixScan(ind, K).reduce(_ + _)
      val full = utility((0 until n).toList, ind, K)
      assert((total - full).num === BigInt(0),
        s"efficiency axiom violated for ind=${ind.toList}")
    }
  }

  test("fixed-point floors match the plan's per-delta flooring order") {
    // the PLAN floors each delta coefficient then sums; this pins that
    // choice (vs flooring the final rational) as the declared semantic
    val ind = Array(1, 0, 1, 0, 0, 1)
    val K = 3
    val n = ind.length
    val coefFloor = (1 to n - 1).map(r =>
      math.min(K, r).toLong * 1000000000L / (K.toLong * r))
    var s = ind(n - 1).toLong * 1000000000L / n
    val planned = new Array[Long](n)
    planned(n - 1) = s
    for (i <- n - 2 to 0 by -1) {
      s += (ind(i) - ind(i + 1)).toLong * coefFloor(i)
      planned(i) = s
    }
    val exact = suffixScan(ind, K)
    for (i <- 0 until n)
      assert(math.abs(planned(i) - exact(i).floorNano) <= (n - i).toLong,
        "per-delta flooring drifts from the exact value by at most one " +
          "nano unit per summed term")
  }
}
