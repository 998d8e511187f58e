package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Property test for the adjacency-intersection triangle core
  * (`Relational.triangleCounts`) against brute-force enumeration on
  * random and adversarial graphs.
  *
  * The oracle gate proves q138 on the two co-occurrence fixtures; this
  * spec proves the ALGORITHM on graph shapes those fixtures don't
  * contain — heavy degree ties (where the (deg, id) orientation
  * tie-break decides), hubs, complete subgraphs, triangle-free
  * structures — and that the result is invariant to which column an
  * undirected edge lands in.
  */
class TrianglePropertySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("triangle-property")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Brute-force per-vertex triangle counts over an undirected edge set. */
  private def brute(edges: Set[(Long, Long)]): Map[Long, Long] = {
    val vs = edges.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val has = (x: Long, y: Long) =>
      edges.contains((math.min(x, y), math.max(x, y)))
    val counts = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for {
      (i, ii) <- vs.zipWithIndex
      (j, jj) <- vs.zipWithIndex.drop(ii + 1) if has(i, j)
      k <- vs.drop(jj + 1) if has(i, k) && has(j, k)
    } {
      counts(i) += 1; counts(j) += 1; counts(k) += 1
    }
    vs.map(v => v -> counts(v)).toMap
  }

  /** Run triangleCounts over the edge set, randomizing which column
    * each undirected edge lands in, and return (v -> (deg, tri)). */
  private def viaSpark(edges: Set[(Long, Long)], flipSeed: Long): Map[Long, (Long, Long)] = {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(flipSeed)
    val rows = edges.toSeq.sorted.map { case (a, b) =>
      if (rnd.nextBoolean()) (a, b) else (b, a)
    }
    val e = rows.toDF("a", "b")
    val deg = e.select($"a".as("v")).unionAll(e.select($"b".as("v")))
      .groupBy($"v").agg(count(lit(1)).as("deg"))
    val out = operators.Relational.triangleCounts(e, deg)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    spark.catalog.clearCache()
    out
  }

  private def check(edges: Set[(Long, Long)], name: String, flipSeed: Long = 7): Unit = {
    val expected = brute(edges)
    val degExpected = edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (v, xs) => v -> xs.size.toLong }
    val got = viaSpark(edges, flipSeed)
    assert(got.keySet == expected.keySet, s"$name: vertex sets differ")
    got.foreach { case (v, (dg, tri)) =>
      assert(dg == degExpected(v), s"$name: deg($v) = $dg, expected ${degExpected(v)}")
      assert(tri == expected(v), s"$name: tri($v) = $tri, expected ${expected(v)}")
    }
  }

  test("complete graph K6: every vertex in C(5,2) = 10 triangles") {
    val vs = 0L until 6L
    check((for (i <- vs; j <- vs if i < j) yield (i, j)).toSet, "K6")
  }

  test("star and path: triangle-free graphs count zero everywhere") {
    check((1L to 8L).map(i => (0L, i)).toSet, "star")
    check((0L until 8L).map(i => (i, i + 1)).toSet, "path")
  }

  test("all-equal degrees: cycle + chords forces tie-break orientation") {
    // 6-cycle plus the three diameters: every vertex has degree 3, so
    // EVERY edge orients purely by the id tie-break
    val cyc = (0L until 6L).map(i => (i, (i + 1) % 6)).map {
      case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    check(cyc ++ Set((0L, 3L), (1L, 4L), (2L, 5L)), "6-cycle+diameters")
  }

  /** Brute-force per-EDGE triangle support (the k-truss quantity). */
  private def bruteSupport(edges: Set[(Long, Long)]): Map[(Long, Long), Long] = {
    val has = (x: Long, y: Long) =>
      edges.contains((math.min(x, y), math.max(x, y)))
    val vs = edges.flatMap(e => Seq(e._1, e._2))
    edges.map { case (a, b) =>
      (a, b) -> vs.count(z => z != a && z != b && has(a, z) && has(b, z)).toLong
    }.toMap
  }

  /** q263's per-round shape: fresh orientation over the current edge
    * set, oriented triangles, support via least/greatest normalization
    * back to id order. Must equal brute-force per-edge support. */
  private def supportViaSpark(edges: Set[(Long, Long)]): Map[(Long, Long), Long] = {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val e = edges.toSeq.sorted.toDF("a", "b")
    val dg = e.select($"a".as("x")).unionAll(e.select($"b".as("x")))
      .groupBy($"x").agg(count(lit(1)).as("dx"))
    val ed = operators.Relational.orientEdges(e, dg)
    val tri = operators.Relational.orientedTriangles(
      ed, operators.Relational.orientedAdjacency(ed))
    tri.select(explode(array(
        struct(least($"u", $"w").as("a"), greatest($"u", $"w").as("b")),
        struct(least($"u", $"z").as("a"), greatest($"u", $"z").as("b")),
        struct(least($"w", $"z").as("a"), greatest($"w", $"z").as("b"))))
        .as("ed"))
      .groupBy($"ed.a".as("a"), $"ed.b".as("b"))
      .agg(count(lit(1)).as("sup"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
  }

  test("per-edge triangle support matches brute force (k-truss round shape)") {
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(seed * 17L)
      val n = 10 + rnd.nextInt(8)
      val edges = (for {
        i <- 0L until n.toLong
        j <- (i + 1) until n.toLong
        if rnd.nextDouble() < 0.3
      } yield (i, j)).toSet
      if (edges.nonEmpty) {
        val expected = bruteSupport(edges).filter(_._2 > 0)
        val got = supportViaSpark(edges)
        assert(got == expected, s"support mismatch on seed $seed: " +
          s"got ${got.toSeq.sorted}, expected ${expected.toSeq.sorted}")
      }
    }
    // K5: every edge closes exactly 3 triangles
    val k5 = (for (i <- 0L until 5L; j <- (i + 1) until 5L) yield (i, j)).toSet
    assert(supportViaSpark(k5).values.toSet == Set(3L))
  }

  test("random graphs match brute force across seeds and flip patterns") {
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(seed)
      val n = 12 + rnd.nextInt(10)
      val p = 0.15 + rnd.nextDouble() * 0.35
      val edges = (for {
        i <- 0L until n.toLong
        j <- (i + 1) until n.toLong
        if rnd.nextDouble() < p
      } yield (i, j)).toSet
      if (edges.nonEmpty) check(edges, s"G(n=$n, p=$p, seed=$seed)", flipSeed = seed * 31L)
    }
  }
}
