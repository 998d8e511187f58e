package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Property test for the capped synchronous k-core peel
  * (`Relational.kCoreCapped`) against a sequential reference on random
  * and structured graphs.
  *
  * The oracle gate proves q191 on the co-occurrence fixtures; this
  * spec proves the ALGORITHM on shapes the fixtures don't contain —
  * peel cascades that empty the graph (stars, paths), nuclei that
  * survive (cliques behind a periphery), CAP-BOUND trajectories
  * (rounds smaller than the cascade depth — the engines must agree on
  * the truncated state too, the rule the DuckDB oracle's fixed
  * unrolling relies on), the data-derived midpoint k, and invariance
  * to which column an undirected edge lands in.
  */
class KCorePropertySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("kcore-property")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Sequential level-synchronous peel: each round removes EVERY
    * vertex below k simultaneously, capped at `rounds`. Returns the
    * surviving subgraph's per-vertex degrees. */
  private def brute(edges: Set[(Long, Long)], k: Long,
                    rounds: Int): Map[Long, Long] = {
    def degs(e: Set[(Long, Long)]): Map[Long, Long] =
      e.toSeq.flatMap(t => Seq(t._1, t._2)).groupBy(identity)
        .map { case (v, xs) => v -> xs.size.toLong }
    var e = edges
    var it = 0
    var done = false
    while (!done && it < rounds) {
      val keep = degs(e).filter(_._2 >= k).keySet
      val next = e.filter(t => keep(t._1) && keep(t._2))
      done = next == e
      e = next; it += 1
    }
    degs(e)
  }

  /** The q191 data-derived threshold: min + (mean − min) / 2, all
    * floored — must match the Scala-side rule in kCoreCapped. */
  private def midpointK(edges: Set[(Long, Long)]): Long = {
    val ds = edges.toSeq.flatMap(t => Seq(t._1, t._2)).groupBy(identity)
      .map(_._2.size.toLong).toSeq
    val mn = ds.min
    mn + (ds.sum / ds.size - mn) / 2
  }

  /** Run kCoreCapped, randomizing which column each undirected edge
    * lands in. */
  private def viaSpark(edges: Set[(Long, Long)], k: Int, rounds: Int,
                       flipSeed: Long): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(flipSeed)
    val rows = edges.toSeq.sorted.map { case (a, b) =>
      if (rnd.nextBoolean()) (a, b) else (b, a)
    }
    val out = operators.Relational.kCoreCapped(rows.toDF("a", "b"), k, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    spark.catalog.clearCache()
    out
  }

  private def check(edges: Set[(Long, Long)], k: Int, rounds: Int,
                    name: String, flipSeed: Long = 7): Unit = {
    val expected = brute(edges, k, rounds)
    val got = viaSpark(edges, k, rounds, flipSeed)
    assert(got == expected,
      s"$name (k=$k, rounds=$rounds): got $got, expected $expected")
  }

  test("clique survives intact: K6 at k=3 keeps every vertex at deg 5") {
    val vs = 0L until 6L
    val e = (for (i <- vs; j <- vs if i < j) yield (i, j)).toSet
    check(e, 3, 6, "K6")
  }

  test("star and path cascade to the empty core at k=2") {
    check((1L to 8L).map(i => (0L, i)).toSet, 2, 12, "star")
    check((0L until 8L).map(i => (i, i + 1)).toSet, 2, 12, "path")
  }

  test("clique + pendant periphery: nucleus survives, tail peels off") {
    val clique = (for (i <- 0L until 5L; j <- 0L until 5L if i < j)
      yield (i, j)).toSet
    // a 4-vertex chain hanging off vertex 0
    val tail = Set((0L, 10L), (10L, 11L), (11L, 12L), (12L, 13L))
    check(clique ++ tail, 3, 8, "K5+tail")
  }

  test("cap binds mid-cascade: truncated trajectories agree round by round") {
    // a long path peels 2 layers per round from the ends at k=2 —
    // cap it before the cascade completes, at several depths
    val path = (0L until 16L).map(i => (i, i + 1)).toSet
    for (r <- 1 to 4) check(path, 2, r, s"path-capped-r$r", flipSeed = r)
  }

  test("data-derived midpoint k matches the sequential rule") {
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(seed)
      val n = 14 + rnd.nextInt(8)
      val p = 0.2 + rnd.nextDouble() * 0.3
      val edges = (for {
        i <- 0L until n.toLong
        j <- (i + 1) until n.toLong
        if rnd.nextDouble() < p
      } yield (i, j)).toSet
      if (edges.nonEmpty) {
        val expected = brute(edges, midpointK(edges), 6)
        val got = viaSpark(edges, -1, 6, seed * 13L)
        assert(got == expected,
          s"midpoint-k seed=$seed: got $got, expected $expected")
      }
    }
  }

  test("random graphs match the sequential peel across seeds and k") {
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(seed * 101L)
      val n = 12 + rnd.nextInt(10)
      val p = 0.15 + rnd.nextDouble() * 0.35
      val edges = (for {
        i <- 0L until n.toLong
        j <- (i + 1) until n.toLong
        if rnd.nextDouble() < p
      } yield (i, j)).toSet
      for (k <- Seq(2, 3, 4) if edges.nonEmpty)
        check(edges, k, 10, s"G(n=$n, p=$p, seed=$seed)",
          flipSeed = seed * 31L + k)
    }
  }
}
