package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Property test for the integer-exact Katz centrality core
  * (`Relational.katzPpm`) against a sequential reference.
  *
  * The oracle gate proves q235 on the co-occurrence fixture; this
  * spec proves the INTEGER ARITHMETIC — the measured-dmax attenuation
  * (convergence must be structural on ANY graph), the floor
  * recurrence, and the ±1 ppm successor-pick stop — on shapes the
  * fixture doesn't stress: stars (dmax = n−1 drives α to its
  * smallest value), paths (slow mixing), and random graphs.
  */
class KatzPropertySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("katz-property")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Sequential reference: identical recurrence, attenuation and
    * tolerance-successor stop as katzPpm/iterateToFixpointPpm. */
  private def reference(edges: Set[(Long, Long)],
      maxIters: Int = 16): Map[Long, Long] = {
    val nbrs = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2) }
    val deg = nbrs.map { case (v, ns) => v -> ns.size.toLong }
    val aPpm = 1000000L / (deg.values.max + 1)
    var p: Map[Long, Long] = deg.map { case (v, _) => v -> 1000000L }
    var it = 0
    var done = false
    while (!done && it < maxIters) {
      val next = nbrs.map { case (v, ns) =>
        v -> (1000000L + aPpm * ns.map(p).sum / 1000000L)
      }
      done = next.forall { case (v, x) => (x - p(v)).abs <= 1L }
      p = next
      it += 1
    }
    p
  }

  private def viaSpark(edges: Set[(Long, Long)]): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val e = edges.toSeq.sorted.toDF("a", "b")
    val dir = e.select($"a".as("u"), $"b".as("v"))
      .unionAll(e.select($"b".as("u"), $"a".as("v")))
    val deg = dir.groupBy($"u".as("v")).agg(count(lit(1)).as("deg"))
    operators.Relational.katzPpm(dir, deg)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def check(edges: Set[(Long, Long)], name: String): Unit = {
    val expected = reference(edges)
    val got = viaSpark(edges)
    assert(got == expected, s"$name: katz ppm differs from reference")
  }

  test("star graph: hub counts every leaf walk, leaves share one attenuated hop") {
    val edges = (1L to 9L).map(i => (0L, i)).toSet
    check(edges, "star-9")
    // structural sanity on the reference itself: the hub strictly
    // dominates any leaf
    val r = reference(edges)
    assert(r(0L) > r(1L), "hub must outrank leaves")
  }

  test("path graph converges under slow mixing") {
    check((0L until 7L).map(i => (i, i + 1)).toSet, "path-8")
  }

  test("random graphs match the reference across seeds") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val n = 12 + rnd.nextInt(18)
      val edges = (for {
        i <- 0L until n.toLong
        j <- (i + 1) until n.toLong
        if rnd.nextDouble() < 0.15
      } yield (i, j)).toSet
      if (edges.nonEmpty) check(edges, s"G(n=$n, seed=$seed)")
    }
  }
}
