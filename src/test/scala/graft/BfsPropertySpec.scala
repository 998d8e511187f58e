package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Property test for the level-synchronous multi-source BFS hop
  * profile (`Relational.bfsHopProfile`) against a sequential BFS on
  * random and structured graphs.
  *
  * The oracle gate proves q195 on the co-occurrence fixtures (which
  * saturate in 2 hops); this spec proves the ALGORITHM on shapes the
  * fixtures don't contain — long paths where the hop cap BINDS (capped
  * trajectories must agree with the oracle's fixed unrolling),
  * disconnected components (the hop −1 unreached row), multiple seeds
  * whose frontiers collide mid-expansion, and invariance to which
  * column an undirected edge lands in before symmetrization.
  */
class BfsPropertySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("bfs-property")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Sequential multi-source BFS: hop level per vertex, capped. Returns
    * the (hop -> count) profile with unreached as hop -1, zero counts
    * dropped — the bfsHopProfile contract. */
  private def brute(vs: Set[Long], edges: Set[(Long, Long)], seeds: Set[Long],
                    maxHops: Int): Map[Long, Long] = {
    val adj = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).toSet }
    var level = Map[Long, Long]() ++ seeds.map(_ -> 0L)
    var frontier = seeds
    for (h <- 1 to maxHops) {
      frontier = frontier.flatMap(v => adj.getOrElse(v, Set.empty))
        .diff(level.keySet)
      level = level ++ frontier.map(_ -> h.toLong)
    }
    val reached = level.values.groupBy(identity)
      .map { case (h, xs) => h -> xs.size.toLong }
    val unreached = (vs -- level.keySet).size.toLong
    (if (unreached > 0) reached + (-1L -> unreached) else reached)
      .filter(_._2 > 0)
  }

  private def viaSpark(vs: Set[Long], edges: Set[(Long, Long)],
                       seeds: Set[Long], maxHops: Int,
                       flipSeed: Long): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(flipSeed)
    val rows = edges.toSeq.sorted.map { case (a, b) =>
      if (rnd.nextBoolean()) (a, b) else (b, a)
    }
    val e = rows.toDF("a", "b")
    val dirE = e.select($"a".as("u"), $"b".as("v"))
      .unionAll(e.select($"b".as("u"), $"a".as("v")))
    val out = operators.Relational.bfsHopProfile(dirE,
        vs.toSeq.sorted.toDF("v"), seeds.toSeq.sorted.toDF("v"), maxHops)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    spark.catalog.clearCache()
    out
  }

  private def check(vs: Set[Long], edges: Set[(Long, Long)],
                    seeds: Set[Long], maxHops: Int, name: String,
                    flipSeed: Long = 7): Unit = {
    val expected = brute(vs, edges, seeds, maxHops)
    val got = viaSpark(vs, edges, seeds, maxHops, flipSeed)
    assert(got == expected,
      s"$name (maxHops=$maxHops): got $got, expected $expected")
  }

  private def vertsOf(edges: Set[(Long, Long)]): Set[Long] =
    edges.flatMap(e => Set(e._1, e._2))

  test("path from one end: the hop cap binds mid-walk at every depth") {
    val path = (0L until 12L).map(i => (i, i + 1)).toSet
    for (r <- 1 to 5)
      check(vertsOf(path), path, Set(0L), r, s"path-cap$r", flipSeed = r)
  }

  test("disconnected component reports as the hop −1 unreached row") {
    val e = Set((0L, 1L), (1L, 2L), (10L, 11L), (11L, 12L))
    check(vertsOf(e), e, Set(0L), 4, "two-components")
  }

  test("colliding frontiers: each vertex keeps its FIRST hop level") {
    // seeds at both ends of a path meet in the middle
    val path = (0L until 10L).map(i => (i, i + 1)).toSet
    check(vertsOf(path), path, Set(0L, 10L), 6, "meet-in-middle")
  }

  test("random graphs and random seed sets match sequential BFS") {
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(seed * 77L)
      val n = 14 + rnd.nextInt(10)
      val p = 0.08 + rnd.nextDouble() * 0.25
      val edges = (for {
        i <- 0L until n.toLong
        j <- (i + 1) until n.toLong
        if rnd.nextDouble() < p
      } yield (i, j)).toSet
      if (edges.nonEmpty) {
        val vs = vertsOf(edges)
        val seeds = vs.filter(_ => rnd.nextDouble() < 0.15) match {
          case s if s.isEmpty => Set(vs.min)
          case s => s
        }
        check(vs, edges, seeds, 3, s"G(n=$n, p=$p, seed=$seed)",
          flipSeed = seed * 31L)
      }
    }
  }

  /** Sequential PER-SEED BFS — the multiSeedDistances contract: each
    * (seed, v) pair carries that seed's OWN hop count (the shared-
    * visited profile above would conflate seeds). */
  private def bruteLabeled(edges: Set[(Long, Long)], seeds: Set[Long],
                           maxHops: Int): Set[(Long, Long, Long)] = {
    val adj = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).toSet }
    seeds.flatMap { sd =>
      var level = Map[Long, Long](sd -> 0L)
      var frontier = Set(sd)
      for (h <- 1 to maxHops) {
        frontier = frontier.flatMap(v => adj.getOrElse(v, Set.empty))
          .diff(level.keySet)
        level = level ++ frontier.map(_ -> h.toLong)
      }
      level.map { case (v, hop) => (sd, v, hop) }
    }
  }

  test("labeled multi-seed distances match per-seed sequential BFS") {
    val s = spark
    import s.implicits._
    for (seed <- 11 to 15) {
      val rnd = new scala.util.Random(seed * 13L)
      val n = 10 + rnd.nextInt(12)
      val edges = (for {
        i <- 0L until n.toLong
        j <- (i + 1) until n.toLong
        if rnd.nextDouble() < 0.18
      } yield (i, j)).toSet
      if (edges.nonEmpty) {
        val vs = vertsOf(edges)
        val seeds = Set(vs.min, vs.max) ++
          vs.filter(_ => rnd.nextDouble() < 0.1)
        val e = edges.toSeq.sorted.toDF("a", "b")
        val dirE = e.select($"a".as("u"), $"b".as("v"))
          .unionAll(e.select($"b".as("u"), $"a".as("v")))
        val got = operators.Relational
          .multiSeedDistances(dirE, seeds.toSeq.sorted.toDF("sd"), 3)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        spark.catalog.clearCache()
        val want = bruteLabeled(edges, seeds, 3)
        assert(got == want,
          s"seed=$seed: ${got.diff(want)} extra, ${want.diff(got)} missing")
      }
    }
  }

  /** Sequential Brandes forward sweep: per seed, BFS levels plus the
    * shortest-path COUNT σ of every reached vertex — the contract of
    * the fused `multiSeedSigmaLevels` (round 20 folded q313's level
    * discovery and σ aggregation into one sweep; this reference pins
    * that the fusion changed neither the level sets nor the counts). */
  private def bruteSigma(edges: Set[(Long, Long)], seeds: Set[Long],
      maxHops: Int): Map[Int, Set[(Long, Long, Long)]] = {
    val adj = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).toSet }
    val out = scala.collection.mutable.Map[Int, Set[(Long, Long, Long)]]()
      .withDefaultValue(Set.empty)
    for (sd <- seeds) {
      var level = Map[Long, Int](sd -> 0)
      var sigma = Map[Long, Long](sd -> 1L)
      out(0) = out(0) + ((sd, sd, 1L))
      var frontier = Set(sd)
      for (h <- 1 to maxHops) {
        val nextSig = scala.collection.mutable.Map[Long, Long]()
          .withDefaultValue(0L)
        for (u <- frontier; v <- adj.getOrElse(u, Set.empty)
             if !level.contains(v))
          nextSig(v) += sigma(u)
        frontier = nextSig.keySet.toSet
        level = level ++ frontier.map(_ -> h)
        sigma = sigma ++ nextSig
        out(h) = out(h) ++ frontier.map(v => (sd, v, nextSig(v)))
      }
    }
    out.toMap.withDefaultValue(Set.empty)
  }

  test("fused σ levels match the sequential Brandes forward sweep") {
    val s = spark
    import s.implicits._
    def run(edges: Set[(Long, Long)], seeds: Set[Long], cap: Int): Unit = {
      val e = edges.toSeq.sorted.toDF("a", "b")
      val dirE = e.select($"a".as("u"), $"b".as("v"))
        .unionAll(e.select($"b".as("u"), $"a".as("v")))
      val levels = operators.Relational
        .multiSeedSigmaLevels(dirE, seeds.toSeq.sorted.toDF("sd"), cap)
      val want = bruteSigma(edges, seeds, cap)
      assert(levels.size == cap + 1)
      for (h <- 0 to cap) {
        val got = levels(h).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        assert(got == want(h), s"level $h: ${got.diff(want(h))} extra, " +
          s"${want(h).diff(got)} missing")
      }
      spark.catalog.clearCache()
    }
    // diamond: 0–{1,2}–3 — two shortest paths to 3 (σ = 2), plus a
    // pendant beyond it (σ inherits multiplicity)
    run(Set((0L, 1L), (0L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)), Set(0L), 4)
    // path with the cap binding mid-walk, and exhaustion padding past
    // the far end (levels beyond the diameter must come back empty)
    run((0L until 6L).map(i => (i, i + 1)).toSet, Set(0L), 4)
    run(Set((0L, 1L)), Set(0L), 4)
    // random graphs, multiple seeds with colliding frontiers
    for (seed <- 31 to 35) {
      val rnd = new scala.util.Random(seed * 41L)
      val n = 12 + rnd.nextInt(10)
      val edges = (for {
        i <- 0L until n.toLong
        j <- (i + 1) until n.toLong
        if rnd.nextDouble() < 0.15
      } yield (i, j)).toSet
      if (edges.nonEmpty) {
        val vs = vertsOf(edges)
        val seeds = Set(vs.min, vs.max) ++
          vs.filter(_ => rnd.nextDouble() < 0.1)
        run(edges, seeds, 3)
      }
    }
  }

  /** VERDICT r18 #7: the hop cap must be a PURE TRUNCATION of the
    * unbounded per-seed BFS — capped(k) == unbounded ∩ {hop ≤ k} as
    * (sd, v, hop) TRIPLES, even when seed balls overlap inside the
    * cap (a vertex reached by one seed at hop ≤ k and another past it
    * keeps exactly the first labeling; the shared frontier machinery
    * must not let one seed's exhaustion or the early-exit path
    * perturb another's trajectory). Shapes where the cap BINDS: a
    * long path with two seeds 5 apart, and random sparse graphs with
    * clustered (overlapping-ball) seed sets. */
  test("hop cap is a pure truncation of the unbounded labeled BFS") {
    val s = spark
    import s.implicits._
    def run(edges: Set[(Long, Long)], seeds: Set[Long], cap: Int) = {
      val e = edges.toSeq.sorted.toDF("a", "b")
      val dirE = e.select($"a".as("u"), $"b".as("v"))
        .unionAll(e.select($"b".as("u"), $"a".as("v")))
      operators.Relational
        .multiSeedDistances(dirE, seeds.toSeq.sorted.toDF("sd"), cap)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    // path 0–15, seeds 0 and 5: their balls overlap from hop 3 on,
    // and every cap 1..4 binds (diameter 15)
    val path = (0L until 15L).map(i => (i, i + 1)).toSet
    val pathSeeds = Set(0L, 5L)
    val pathFull = bruteLabeled(path, pathSeeds, 16)
    for (cap <- 1 to 4) {
      val got = run(path, pathSeeds, cap)
      spark.catalog.clearCache()
      val want = pathFull.filter(_._3 <= cap)
      assert(got == want, s"path cap=$cap: ${got.diff(want)} extra, " +
        s"${want.diff(got)} missing")
    }
    // random sparse graphs, seed sets clustered around a hub so the
    // balls overlap well inside the cap
    for (seed <- 21 to 24) {
      val rnd = new scala.util.Random(seed * 101L)
      val n = 16 + rnd.nextInt(8)
      val edges = (for {
        i <- 0L until n.toLong
        j <- (i + 1) until n.toLong
        if rnd.nextDouble() < 0.10
      } yield (i, j)).toSet
      if (edges.nonEmpty) {
        val vs = vertsOf(edges)
        val hub = vs.min
        val near = edges.collect { case (a, b) if a == hub => b
                                   case (a, b) if b == hub => a }
        val seeds = Set(hub) ++ near.take(2)
        val full = bruteLabeled(edges, seeds, n + 1)
        for (cap <- Seq(2, 4)) {
          val got = run(edges, seeds, cap)
          spark.catalog.clearCache()
          val want = full.filter(_._3 <= cap)
          assert(got == want, s"G(seed=$seed) cap=$cap: " +
            s"${got.diff(want)} extra, ${want.diff(got)} missing")
        }
      }
    }
  }
}
