package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact-integer money arithmetic for deterministic aggregation.
  *
  * Two portability hazards are addressed at once:
  *  1. double sums depend on accumulation order (Spark's partial-agg
  *     merge order is task-completion order; DuckDB's differs again) —
  *     so money is summed as integer "cents" (order-independent, exact);
  *  2. `round(double, n)` semantics differ across engines at `.5`
  *     boundaries (Spark rounds the shortest-decimal rendering HALF_UP,
  *     DuckDB rounds the binary value) — so rounding happens in integer
  *     space (`x + half - (x + half) % unit`) and the only floating
  *     operation is a final int→double division, which IEEE defines
  *     identically everywhere.
  *
  * This also makes results stable across partition counts — the same
  * query must hash-match at sf0.01 (verify) and behave at 100 TB
  * (1000 executors). Long overflow bound: 1e-6-unit charge sums
  * overflow int64 at ≈9.2e18 ≈ 10^12 max-price rows per group —
  * beyond 100 TB per-group cardinality; DuckDB sums in HUGEINT.
  */
object Exact {
  /** 2-decimal double → exact integer hundredths. */
  def cents(c: Column): Column = round(c * 100, 0).cast("long")
  def centsSql(e: String): String = s"CAST(round(($e)*100) AS BIGINT)"

  /** Integer sum in `unitsPerDollar`-ths of a dollar → dollars rounded
    * half-up to whole cents, via integer-space rounding. Null-safe
    * (null in → null out). */
  def unitsToMoney(s: Column, unitsPerDollar: Long): Column = {
    val d = unitsPerDollar / 100 // units per cent
    val adj =
      if (d <= 1) s
      else { val t = s + lit(d / 2); t - pmod(t, lit(d)) }
    adj.cast("double") / lit(unitsPerDollar.toDouble)
  }

  def unitsToMoneySql(e: String, unitsPerDollar: Long): String = {
    val d = unitsPerDollar / 100
    // pmod-equivalent (always-non-negative remainder) so negative sums
    // round identically to the Spark side's pmod.
    val adj =
      if (d <= 1) s"($e)"
      else s"(($e) + ${d / 2} - (((($e) + ${d / 2}) % $d) + $d) % $d)"
    s"(CAST($adj AS DOUBLE) / ${unitsPerDollar.toDouble})"
  }

  /** sum of a 2-decimal column, exact. */
  def sumMoney(c: Column): Column = unitsToMoney(sum(cents(c)), 100L)
  def sumMoneySql(e: String): String =
    unitsToMoneySql(s"sum(${centsSql(e)})", 100L)

  /** sum(price * (1 - discount)), exact in 1e-4 units. */
  def sumRevenue(price: Column, disc: Column): Column =
    unitsToMoney(sum(cents(price) * (lit(100L) - cents(disc))), 10000L)
  def sumRevenueSql(p: String, dc: String): String =
    unitsToMoneySql(s"sum(${centsSql(p)} * (100 - ${centsSql(dc)}))", 10000L)

  /** sum(price * (1 - discount) * (1 + tax)), exact in 1e-6 units. */
  def sumCharge(price: Column, disc: Column, tax: Column): Column =
    unitsToMoney(
      sum(cents(price) * (lit(100L) - cents(disc)) * (lit(100L) + cents(tax))),
      1000000L)
  def sumChargeSql(p: String, dc: String, t: String): String =
    unitsToMoneySql(
      s"sum(${centsSql(p)} * (100 - ${centsSql(dc)}) * (100 + ${centsSql(t)}))",
      1000000L)

  /** sum(price * discount), exact in 1e-4 units. */
  def sumPriceTimesDisc(price: Column, disc: Column): Column =
    unitsToMoney(sum(cents(price) * cents(disc)), 10000L)
  def sumPriceTimesDiscSql(p: String, dc: String): String =
    unitsToMoneySql(s"sum(${centsSql(p)} * ${centsSql(dc)})", 10000L)
}
