package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Error-bound + merge-invariance properties of the approximate
  * distinct sketch (Spark's HyperLogLog++ `approx_count_distinct`).
  *
  * HLL can't be DuckDB-hash-gated (engine sketches differ), so it is
  * covered here instead of as a declared query, on the two properties
  * that matter at 100 TB:
  *  - the estimate lands within a few relative standard deviations of
  *    the exact count (the published HLL++ guarantee);
  *  - the estimate is INVARIANT to partitioning: register-wise max is
  *    commutative/associative, so map-side partials merged in any
  *    order yield the same sketch — the property that makes the
  *    aggregation safe under AQE re-planning, speculative retries,
  *    and arbitrary cluster parallelism. (The exact-distinct KMV
  *    alternative is the declared q43.)
  */
class SketchBoundsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.01"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("sketch-bounds-spec")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("approx_count_distinct is within 4 rsd of exact on term cardinality") {
    val rsd = 0.02
    val terms = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("term"))
    val exact = terms.select(countDistinct(col("term"))).head().getLong(0)
    val approx = terms.select(approx_count_distinct(col("term"), rsd)).head().getLong(0)
    val tol = (4 * rsd * exact).ceil.toLong
    assert((approx - exact).abs <= tol,
      s"HLL estimate $approx vs exact $exact exceeds 4*rsd tolerance $tol")
  }

  test("the sketch merge is partition-invariant (same estimate under any layout)") {
    val terms = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("term"))
    val estimates = Seq(1, 3, 16).map { n =>
      terms.repartition(n)
        .select(approx_count_distinct(col("term"), 0.02)).head().getLong(0)
    }
    assert(estimates.distinct.size == 1,
      s"partition layout changed the HLL estimate: $estimates")
  }

  test("approx_percentile lands within its accuracy guarantee vs exact percentile") {
    // guarantee: rank error <= n / accuracy. Check p50/p95 of n_chars
    // against exact values computed at rank +- tolerance.
    val accuracy = 100
    val docs = Tables.documents(spark, dir).select(col("n_chars"))
    val n = docs.count()
    val sorted = docs.orderBy("n_chars").collect().map(_.getLong(0))
    val approx = docs.select(
      percentile_approx(col("n_chars"), lit(0.5), lit(accuracy)).as("p50"),
      percentile_approx(col("n_chars"), lit(0.95), lit(accuracy)).as("p95")).head()
    val tol = (n.toDouble / accuracy).ceil.toInt
    def rankBounds(p: Double, v: Long): Unit = {
      val target = (p * (n - 1)).round.toInt
      val lo = sorted(math.max(0, target - tol))
      val hi = sorted(math.min(n.toInt - 1, target + tol))
      assert(v >= lo && v <= hi,
        s"approx p$p=$v outside rank-tolerance [$lo, $hi] (n=$n, tol=$tol ranks)")
    }
    rankBounds(0.5, approx.getLong(0))
    rankBounds(0.95, approx.getLong(1))
  }

  test("per-group estimates hold the bound too (events.user_id by type)") {
    val rsd = 0.05
    val ev = Tables.events(spark, dir)
    val joined = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact"),
        approx_count_distinct(col("user_id"), rsd).as("approx"))
      .collect()
    joined.foreach { r =>
      val (exact, approx) = (r.getLong(1), r.getLong(2))
      val tol = (4 * rsd * exact).ceil.toLong
      assert((approx - exact).abs <= tol,
        s"${r.getString(0)}: HLL $approx vs exact $exact beyond $tol")
    }
  }
}
