package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Property test for q326's Gonzalez farthest-point greedy
  * (`Similarity.kcenterGreedy`) on arbitrary small instances.
  *
  *  - matches a sequential reference (same h60 seed rule, same
  *    integer d², same (dmin DESC, id ASC) tie-break);
  *  - the covering-radius trajectory is monotone non-increasing
  *    (each added center can only shrink the max-min distance);
  *  - the 2-approximation [Gonzalez '85]: greedy's k-center covering
  *    radius ≤ 2× the brute-force optimum in METRIC distance, i.e.
  *    ≤ 4× in the squared-distance integers the engine carries.
  */
class KcenterPropertySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("kcenter-property")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def d2(a: Seq[Long], b: Seq[Long]): Long =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

  /** h60 of each id via the same portable hash the engine uses. */
  private def h60Of(ids: Seq[Long]): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    graft.GraftExtensions.ensureRegistered(s)
    ids.toDF("vec_id")
      .select($"vec_id", graft.functions.PortableHash.h60($"vec_id").as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** Sequential Gonzalez with the engine's exact seed and tie-breaks. */
  private def brute(pts: Seq[(Long, Seq[Long])], k: Int): Vector[(Long, Long)] = {
    val h = h60Of(pts.map(_._1))
    val seed = pts.minBy { case (id, _) => (h(id), id) }
    var centers = Vector((seed, 0L))
    for (_ <- 2 to k) {
      val far = pts.map { case (id, v) =>
        ((id, v), centers.map { case ((_, cv), _) => d2(v, cv) }.min)
      }.reduce { (x, y) =>
        if (y._2 > x._2 || (y._2 == x._2 && y._1._1 < x._1._1)) y else x
      }
      centers :+= far
    }
    centers.map { case ((id, _), cov) => (id, cov) }
  }

  private def viaSpark(pts: Seq[(Long, Seq[Long])], k: Int): Vector[(Long, Long)] = {
    val s = spark
    import s.implicits._
    val emb = pts.toDF("vec_id", "q")
      .select($"vec_id", $"q",
        org.apache.spark.sql.functions.expr("int_dot(q, q)").as("n2"))
    Similarity.kcenterGreedy(emb, k)
  }

  private def randomPoints(seed: Long): Seq[(Long, Seq[Long])] = {
    val rnd = new scala.util.Random(seed)
    val n = 4 + rnd.nextInt(5)
    (0L until n.toLong).map { id =>
      (id, Seq.fill(3)((rnd.nextInt(21) - 10).toLong))
    }
  }

  test("matches the sequential reference and the radius is monotone") {
    for (seed <- 1L to 12L) {
      val pts = randomPoints(seed)
      val k = math.min(4, pts.size)
      val expected = brute(pts, k)
      val got = viaSpark(pts, k)
      assert(got == expected, s"seed=$seed: greedy trajectory differs")
      val radii = got.drop(1).map(_._2)
      assert(radii == radii.sortBy(-_),
        s"seed=$seed: covering radius not monotone: $radii")
    }
  }

  test("greedy is a 2-approximation of the brute-force optimum") {
    for (seed <- 13L to 24L) {
      val pts = randomPoints(seed)
      val byId = pts.toMap
      for (k <- Seq(2, 3) if k < pts.size) {
        val centers = viaSpark(pts, k).map(_._1)
        def radius(cs: Seq[Long]): Long =
          pts.map { case (_, v) => cs.map(c => d2(v, byId(c))).min }.max
        val greedyR = radius(centers)
        val optR = pts.map(_._1).combinations(k).map(radius).min
        // metric 2-approx => squared 4x
        assert(greedyR <= 4 * optR,
          s"seed=$seed k=$k: greedy d2 radius $greedyR > 4x optimum $optR")
      }
    }
  }
}
