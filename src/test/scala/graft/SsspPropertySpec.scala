package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

/** Property test for q327's bounded Bellman–Ford relaxation
  * (`Relational.weightedSsspDistances`) against a sequential
  * synchronous-relaxation reference on random weighted graphs.
  *
  * The oracle gate proves q327 on the co-occurrence fixture (diameter
  * ~3, cap never binds); this spec proves the ALGORITHM where the
  * fixtures can't: path graphs longer than the round cap (capped
  * distances must equal the ≤-cap-edge shortest paths exactly),
  * heavy-short vs light-long path trades (the weighted case BFS gets
  * wrong), disconnected vertices (absent from the result, not ∞
  * rows), multi-seed label isolation, and the early-exit equivalence
  * (a converged run equals the full-cap run).
  */
class SsspPropertySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("sssp-property")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Sequential synchronous Bellman–Ford: dist after `rounds`
    * relaxation rounds = min-cost path using ≤ rounds edges. */
  private def brute(edges: Seq[(Long, Long, Long)], seeds: Seq[Long],
                    rounds: Int): Map[(Long, Long), Long] = {
    var dist: Map[(Long, Long), Long] =
      seeds.map(sd => (sd, sd) -> 0L).toMap
    for (_ <- 1 to rounds) {
      val cand = for {
        ((sd, u), du) <- dist.toSeq
        (eu, ev, w) <- edges if eu == u
      } yield ((sd, ev), du + w)
      dist = (dist.toSeq ++ cand).groupBy(_._1)
        .map { case (k, xs) => k -> xs.map(_._2).min }
    }
    dist
  }

  private def viaSpark(edges: Seq[(Long, Long, Long)], seeds: Seq[Long],
                       rounds: Int): Map[(Long, Long), Long] = {
    val s = spark
    import s.implicits._
    val ew = edges.toDF("u", "v", "w")
    val sd = seeds.toDF("sd")
    Relational.weightedSsspDistances(ew, sd, rounds).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
  }

  private def randomGraph(seed: Long): (Seq[(Long, Long, Long)], Seq[Long]) = {
    val rnd = new scala.util.Random(seed)
    val n = 4 + rnd.nextInt(9)
    val undirected = for {
      a <- 0L until n.toLong; b <- (a + 1) until n.toLong
      if rnd.nextDouble() < 0.35
    } yield (a, b, 1L + rnd.nextInt(10).toLong)
    val directed = undirected.flatMap { case (a, b, w) =>
      Seq((a, b, w), (b, a, w)) }
    val seeds = rnd.shuffle((0L until n.toLong).toList)
      .take(1 + rnd.nextInt(2))
    (directed, seeds)
  }

  test("matches sequential synchronous relaxation on random graphs") {
    for (seed <- 1L to 25L) {
      val (edges, seeds) = randomGraph(seed)
      if (edges.nonEmpty) {
        for (rounds <- Seq(2, 8)) {
          val expected = brute(edges, seeds, rounds)
          val got = viaSpark(edges, seeds, rounds)
          assert(got == expected,
            s"seed=$seed rounds=$rounds: distances differ from reference")
        }
      }
    }
  }

  test("the round cap binds exactly on a path graph") {
    // 0-1-2-...-9 with unit weights from seed 0: 3 rounds reach
    // vertices 0..3 at dist 0..3 and nothing further
    val path = (0L until 9L).flatMap(i =>
      Seq((i, i + 1, 1L), (i + 1, i, 1L)))
    val got = viaSpark(path, Seq(0L), 3)
    assert(got == Map((0L, 0L) -> 0L, (0L, 1L) -> 1L,
      (0L, 2L) -> 2L, (0L, 3L) -> 3L))
  }

  test("a light long path beats a heavy short edge (the weighted case)") {
    // 0-3 direct costs 10; 0-1-2-3 costs 3 — BFS would answer 1 hop,
    // weighted SSSP must answer 3
    val edges = Seq((0L, 3L, 10L), (0L, 1L, 1L), (1L, 2L, 1L), (2L, 3L, 1L))
      .flatMap { case (a, b, w) => Seq((a, b, w), (b, a, w)) }
    val got = viaSpark(edges, Seq(0L), 6)
    assert(got((0L, 3L)) == 3L)
  }

  test("disconnected vertices are absent, not infinite") {
    val edges = Seq((0L, 1L, 2L), (1L, 0L, 2L)) // vertex 5 exists only as a seed
    val got = viaSpark(edges, Seq(0L, 5L), 4)
    assert(got == Map((0L, 0L) -> 0L, (0L, 1L) -> 2L, (5L, 5L) -> 0L))
  }
}
