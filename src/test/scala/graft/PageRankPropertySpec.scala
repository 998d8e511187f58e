package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Property test for the integer-exact PageRank core
  * (`Relational.pageRankPpm`) against a sequential reference.
  *
  * The oracle gate proves q145 on the co-occurrence fixtures; this
  * spec proves the INTEGER ARITHMETIC on shapes the fixtures don't
  * stress: vanishing contributions (p div deg = 0 on low-mass
  * high-degree vertices), stars (extreme in-degree concentration),
  * and random graphs across seeds — every floor division must land
  * identically to the reference or ranks drift silently.
  */
class PageRankPropertySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("pagerank-property")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Sequential reference: identical floor-division recurrence. */
  private def reference(edges: Set[(Long, Long)], iters: Int): Map[Long, Long] = {
    val nbrs = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2) }
    val deg = nbrs.map { case (v, ns) => v -> ns.size.toLong }
    val n = deg.size.toLong
    var p: Map[Long, Long] = deg.map { case (v, _) => v -> 1000000L / n }
    for (_ <- 1 to iters) {
      val c = p.map { case (v, pv) => v -> pv / deg(v) }
      p = nbrs.map { case (v, ns) =>
        v -> (150000L / n + 850000L * ns.map(c).sum / 1000000L)
      }
    }
    p
  }

  private def viaSpark(edges: Set[(Long, Long)], iters: Int): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val e = edges.toSeq.sorted.toDF("a", "b")
    val deg = e.select($"a".as("v")).unionAll(e.select($"b".as("v")))
      .groupBy($"v").agg(count(lit(1)).as("deg"))
    operators.Relational.pageRankPpm(e, deg, iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def check(edges: Set[(Long, Long)], iters: Int, name: String): Unit = {
    val expected = reference(edges, iters)
    val got = viaSpark(edges, iters)
    assert(got == expected, s"$name (iters=$iters): ppm masses differ from reference")
  }

  test("star graph: hub concentrates mass, leaves' contributions floor to equal shares") {
    check((1L to 9L).map(i => (0L, i)).toSet, 3, "star-9")
  }

  test("two disconnected cliques keep independent mass") {
    val k4a = (for (i <- 0L until 4L; j <- (i + 1) until 4L) yield (i, j)).toSet
    val k4b = (for (i <- 10L until 14L; j <- (i + 1) until 14L) yield (i, j)).toSet
    check(k4a ++ k4b, 3, "2xK4")
  }

  test("random graphs match the reference across seeds and iteration counts") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val n = 15 + rnd.nextInt(15)
      val edges = (for {
        i <- 0L until n.toLong
        j <- (i + 1) until n.toLong
        if rnd.nextDouble() < 0.12
      } yield (i, j)).toSet
      if (edges.nonEmpty) check(edges, 1 + seed % 4, s"G(n=$n, seed=$seed)")
    }
  }

  /** Weighted variant reference: mass splits by w(u,v) over the
    * weighted degree, same floors as weightedPageRankPpm. */
  private def weightedReference(weights: Map[(Long, Long), Long],
                                iters: Int): Map[Long, Long] = {
    val wnbrs = weights.toSeq
      .flatMap { case ((a, b), w) => Seq(a -> (b, w), b -> (a, w)) }
      .groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2) }
    val wdeg = wnbrs.map { case (v, ns) => v -> ns.map(_._2).sum }
    val n = wdeg.size.toLong
    var p: Map[Long, Long] = wdeg.map { case (v, _) => v -> 1000000L / n }
    for (_ <- 1 to iters) {
      p = wnbrs.map { case (v, ns) =>
        // incoming: for each neighbor u with edge weight w, u sends
        // (p(u) * w) div wdeg(u) along that edge
        v -> (150000L / n +
          850000L * ns.map { case (u, w) => p(u) * w / wdeg(u) }.sum / 1000000L)
      }
    }
    p
  }

  /** Convergence-mode reference: same recurrence iterated to the
    * first repeated state, capped at maxIters — the exact stopping
    * rule of `iterateToFixpointPpm`. */
  private def referenceConverged(edges: Set[(Long, Long)],
                                 maxIters: Int = 32): Map[Long, Long] = {
    val nbrs = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2) }
    val deg = nbrs.map { case (v, ns) => v -> ns.size.toLong }
    val n = deg.size.toLong
    var p: Map[Long, Long] = deg.map { case (v, _) => v -> 1000000L / n }
    var it = 0
    var done = false
    while (!done && it < maxIters) {
      val c = p.map { case (v, pv) => v -> pv / deg(v) }
      val next = nbrs.map { case (v, ns) =>
        v -> (150000L / n + 850000L * ns.map(c).sum / 1000000L)
      }
      done = next == p
      p = next
      it += 1
    }
    p
  }

  test("convergence mode lands on the sequential fixpoint across random graphs") {
    for (seed <- 21 to 25) {
      val rnd = new scala.util.Random(seed)
      val n = 12 + rnd.nextInt(15)
      val edges = (for {
        i <- 0L until n.toLong
        j <- (i + 1) until n.toLong
        if rnd.nextDouble() < 0.15
      } yield (i, j)).toSet
      if (edges.nonEmpty) {
        val got = viaSpark(edges, -1)
        assert(got == referenceConverged(edges),
          s"G(n=$n, seed=$seed): converged ppm masses differ from reference")
        spark.catalog.clearCache()
      }
    }
  }

  test("personalized convergence mode matches a sequential seeded-teleport reference") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    for (seed <- 31 to 33) {
      val rnd = new scala.util.Random(seed)
      val n = 12 + rnd.nextInt(12)
      val edges = (for {
        i <- 0L until n.toLong
        j <- (i + 1) until n.toLong
        if rnd.nextDouble() < 0.18
      } yield (i, j)).toSet
      if (edges.nonEmpty) {
        val verts = edges.flatMap(e => Seq(e._1, e._2))
        val probes = verts.filter(_ % 3 == 0)
        if (probes.nonEmpty) {
          // sequential reference with seeded teleport + same stopping rule
          val nbrs = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
            .groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2) }
          val deg = nbrs.map { case (v, ns) => v -> ns.size.toLong }
          val nP = probes.size.toLong
          var p: Map[Long, Long] =
            deg.map { case (v, _) => v -> (if (probes(v)) 1000000L / nP else 0L) }
          var it = 0
          var done = false
          while (!done && it < 32) {
            val c = p.map { case (v, pv) => v -> pv / deg(v) }
            val next = nbrs.map { case (v, ns) =>
              v -> ((if (probes(v)) 150000L / nP else 0L) +
                850000L * ns.map(c).sum / 1000000L)
            }
            done = next == p
            p = next
            it += 1
          }
          val e = edges.toSeq.sorted.toDF("a", "b")
          val degDf = e.select($"a".as("v")).unionAll(e.select($"b".as("v")))
            .groupBy($"v").agg(count(lit(1)).as("deg"))
          val probeDf = probes.toSeq.sorted.toDF("v")
          val got = operators.Relational
            .personalizedPageRankPpm(e, degDf, probeDf)
            .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
          spark.catalog.clearCache()
          assert(got == p, s"G(n=$n, seed=$seed): personalized fixpoint differs")
        }
      }
    }
  }

  test("weighted convergence mode matches its sequential fixpoint") {
    val s = spark
    import s.implicits._
    for (seed <- 41 to 43) {
      val rnd = new scala.util.Random(seed)
      val n = 12 + rnd.nextInt(10)
      val weights = (for {
        i <- 0L until n.toLong
        j <- (i + 1) until n.toLong
        if rnd.nextDouble() < 0.18
      } yield (i, j) -> (1L + rnd.nextInt(500))).toMap
      if (weights.nonEmpty) {
        // sequential weighted reference with the convergence rule
        val wnbrs = weights.toSeq
          .flatMap { case ((a, b), w) => Seq(a -> (b, w), b -> (a, w)) }
          .groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2) }
        val wdeg = wnbrs.map { case (v, ns) => v -> ns.map(_._2).sum }
        val nV = wdeg.size.toLong
        var p: Map[Long, Long] = wdeg.map { case (v, _) => v -> 1000000L / nV }
        var it = 0
        var done = false
        while (!done && it < 32) {
          val next = wnbrs.map { case (v, ns) =>
            v -> (150000L / nV +
              850000L * ns.map { case (u, w) => p(u) * w / wdeg(u) }.sum / 1000000L)
          }
          done = next == p
          p = next
          it += 1
        }
        val cooc = weights.toSeq.sortBy(_._1)
          .map { case ((a, b), w) => (a, b, w) }.toDF("a", "b", "cooc")
        val got = operators.Relational.weightedPageRankPpm(cooc)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        spark.catalog.clearCache()
        assert(got == p, s"seed=$seed: weighted fixpoint differs")
      }
    }
  }

  test("weighted PageRank matches its reference on random weighted graphs") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    for (seed <- 11 to 14) {
      val rnd = new scala.util.Random(seed)
      val n = 15 + rnd.nextInt(10)
      val weights = (for {
        i <- 0L until n.toLong
        j <- (i + 1) until n.toLong
        if rnd.nextDouble() < 0.15
      } yield (i, j) -> (1L + rnd.nextInt(1000))).toMap
      if (weights.nonEmpty) {
        val iters = 1 + seed % 4
        val cooc = weights.toSeq.sortBy(_._1)
          .map { case ((a, b), w) => (a, b, w) }.toDF("a", "b", "cooc")
        val got = operators.Relational.weightedPageRankPpm(cooc, iters)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        spark.catalog.clearCache()
        assert(got == weightedReference(weights, iters),
          s"seed=$seed iters=$iters: weighted ppm masses differ")
      }
    }
  }
}
