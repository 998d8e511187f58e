package graft

import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the exact-integer money layer's rounding model
  * (graft.functions.Exact): the integer-space rounding
  * `t = s + d/2; t - pmod(t, d)` must equal BigDecimal HALF_UP rounding
  * to the cent for all signs, and the SQL-side remainder expression must
  * agree with pmod for negative sums (ADVICE r1, Exact.scala:45).
  */
class ExactSpec extends AnyFunSuite {

  /** Scala model of Exact.unitsToMoney's integer-space rounding. */
  private def pmodRound(s: Long, unitsPerDollar: Long): Double = {
    val d = unitsPerDollar / 100
    val adj = if (d <= 1) s else {
      val t = s + d / 2
      t - java.lang.Math.floorMod(t, d)
    }
    adj.toDouble / unitsPerDollar.toDouble
  }

  /** Scala model of Exact.unitsToMoneySql's remainder expression. */
  private def sqlRound(s: Long, unitsPerDollar: Long): Double = {
    val d = unitsPerDollar / 100
    val adj = if (d <= 1) s else {
      val t = s + d / 2
      t - (((t % d) + d) % d)
    }
    adj.toDouble / unitsPerDollar.toDouble
  }

  private val unitChoices = Seq(100L, 10000L, 1000000L)
  // deterministic sampling; keep |s| < 2^52 so the double division is
  // exact-ish and overflow-free
  private def sampledSums(rnd: scala.util.Random): Iterator[Long] =
    Iterator.fill(20000)(rnd.nextLong() % 4000000000000000L)

  test("Spark-side and SQL-side rounding agree for all signs") {
    val rnd = new scala.util.Random(42)
    for (s <- sampledSums(rnd); u <- unitChoices)
      assert(pmodRound(s, u) == sqlRound(s, u), s"s=$s u=$u")
  }

  test("integer-space rounding equals BigDecimal HALF_UP to cents for non-negative sums") {
    val rnd = new scala.util.Random(7)
    for (s0 <- sampledSums(rnd); u <- unitChoices) {
      val s = math.abs(s0)
      val expected = (BigDecimal(s) / BigDecimal(u)).setScale(2, BigDecimal.RoundingMode.HALF_UP)
      assert(BigDecimal(pmodRound(s, u)).setScale(2, BigDecimal.RoundingMode.HALF_UP) == expected,
        s"s=$s u=$u")
    }
  }

  test("half-up boundary: exactly .5 cents rounds up (both models)") {
    // 12.345 dollars in 1e-4 units = 123450 -> rounds to 12.35
    assert(pmodRound(123450L, 10000L) == 12.35)
    assert(sqlRound(123450L, 10000L) == 12.35)
    // negative: pmod semantics round -12.345 toward -12.34 (floor of t)
    assert(pmodRound(-123450L, 10000L) == sqlRound(-123450L, 10000L))
  }
}
