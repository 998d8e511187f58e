package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Property test for the relational minimax isotonic fit
  * (`Relational.isotonicFitPpm`) against a direct sequential
  * pool-adjacent-violators reference on random binned rate data.
  *
  * The production claim is an algebraic identity — fitted_i =
  * max_{j≤i} min_{k≥i} avg(j..k) equals the PAVA solution, and floor
  * commutes with min/max — so the test compares FLOORED ppm values
  * exactly, across random weights, counts, and monotone/antitone/flat
  * shapes (antitone input collapses to one pooled block: the hardest
  * case for an off-by-one in the interval bounds).
  */
class IsotonicPropertySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("isotonic-property")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Sequential weighted PAVA over (n, x) bins; returns floored ppm. */
  private def pavaPpm(bins: Seq[(Long, Long, Long)]): Map[Long, Long] = {
    // blocks of (members, n, x); pool while a block's rate >= next's
    val blocks = scala.collection.mutable.ArrayBuffer[(List[Long], Long, Long)]()
    bins.sortBy(_._1).foreach { case (b, n, x) =>
      blocks += ((List(b), n, x))
      while (blocks.length > 1 && {
        val (_, n1, x1) = blocks(blocks.length - 2)
        val (_, n2, x2) = blocks(blocks.length - 1)
        // x1/n1 >= x2/n2 via cross-multiplication (exact)
        BigInt(x1) * n2 >= BigInt(x2) * n1
      }) {
        val (m2, n2, x2) = blocks.remove(blocks.length - 1)
        val (m1, n1, x1) = blocks.remove(blocks.length - 1)
        blocks += ((m1 ++ m2, n1 + n2, x1 + x2))
      }
    }
    blocks.flatMap { case (ms, n, x) =>
      val v = (BigInt(x) * 1000000 / n).toLong
      ms.map(_ -> v)
    }.toMap
  }

  private def viaSpark(bins: Seq[(Long, Long, Long)]): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    val df = bins.toDF("bin", "n", "x")
    operators.Relational.isotonicFitPpm(df)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("antitone input pools to a single block") {
    val bins = (1L to 8L).map(b => (b, 10L, 90L - 10L * b))
    val got = viaSpark(bins)
    val exp = pavaPpm(bins)
    assert(got == exp)
    assert(got.values.toSet.size == 1, s"expected one pooled value, got $got")
  }

  test("already-monotone input is returned unchanged (floored)") {
    val bins = (1L to 8L).map(b => (b, 7L, b))
    val got = viaSpark(bins)
    bins.foreach { case (b, n, x) =>
      assert(got(b) == x * 1000000L / n)
    }
  }

  test("random bins match sequential PAVA across seeds") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed * 101L)
      val nb = 5 + rnd.nextInt(12)
      val bins = (1L to nb.toLong).map { b =>
        val n = 1L + rnd.nextInt(50)
        val x = rnd.nextInt(n.toInt + 1).toLong
        (b, n, x)
      }
      val got = viaSpark(bins)
      val exp = pavaPpm(bins)
      assert(got == exp, s"seed $seed: got $got, expected $exp (bins $bins)")
      val sorted = bins.map(_._1).sorted.map(got)
      assert(sorted == sorted.sorted, s"seed $seed: fit not monotone: $sorted")
    }
  }
}
