package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** q177's load-bearing claim is the collapse: linking DISTINCT
  * (adjective, noun) keys and weighting each linked pair by
  * n_a · n_b must reproduce exactly the row-level linkage an
  * all-pairs join over the full table would produce. The DuckDB
  * oracle cannot check this — it runs the same collapsed algebra —
  * so this suite brute-forces the row-level pair count per
  * (noun, adj_a, adj_b) with an independent Scala Levenshtein and
  * compares against the declared query's pair_weight on the
  * sf0.001 fixture.
  */
class LinkageCollapseSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("linkage-collapse")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Textbook Wagner–Fischer, written independently of both engines. */
  private def lev(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = dp(0) // dp[i-1][j-1]
      dp(0) = j
      for (i <- 1 to a.length) {
        val cur = dp(i)
        dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(a.length)
  }

  test("collapsed weighted pairs == brute-force row-level linkage") {
    val rows = Tables.part(spark, dir)
      .select("p_name").collect().map(_.getString(0).split(" "))
      .map(t => (t(0), t(1)))

    // row-level all-pairs within noun blocks, counted per name pair
    val brute = collection.mutable.Map.empty[(String, String, String), Long]
    for {
      i <- rows.indices
      j <- rows.indices
      if rows(i)._2 == rows(j)._2 && rows(i)._1 < rows(j)._1 &&
        lev(rows(i)._1, rows(j)._1) <= 2
    } {
      val k = (rows(i)._2, rows(i)._1, rows(j)._1)
      brute(k) = brute.getOrElse(k, 0L) + 1L
    }

    val got = SparkEntry.queries("q177_record_linkage")(spark, dir)
      .select("noun", "adj_a", "adj_b", "pair_weight").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        r.getLong(3)).toMap

    assert(got.keySet == brute.keySet,
      s"pair sets differ: only-spark=${got.keySet -- brute.keySet} " +
        s"only-brute=${brute.keySet -- got.keySet}")
    for ((k, w) <- brute)
      assert(got(k) == w, s"$k: collapsed weight ${got(k)} != row-level $w")
  }
}
