package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Property test for the integer-exact HITS authority core
  * (`Relational.hitsAuthPpm`) against a sequential reference.
  *
  * The oracle gate proves q212 on the purchase fixture; this spec
  * proves the auth-only two-hop recurrence (auth' ∝ AᵀA·auth with
  * per-step max normalization and floor division) on shapes the
  * fixture doesn't stress: uniform complete-bipartite graphs (every
  * score must stay exactly 1e6), popularity stars (one dominant
  * authority pins the normalizer), and random bipartite graphs across
  * seeds — including trajectories that hit the iteration cap, which
  * must stop at exactly the same state as the reference.
  */
class HitsPropertySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("hits-property")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Sequential reference: identical two-hop recurrence with the same
    * tolerance stopping rule as iterateToFixpointPpm(tolPpm = 1) —
    * stop at the successor of the first transition whose largest
    * per-vertex move is <= 1 ppm (the floor-rounding oscillation
    * cure), capped identically. */
  private def reference(edges: Set[(Long, Long)],
                        maxIters: Int = 16): Map[Long, Long] = {
    val byC = edges.groupBy(_._1).map { case (c, es) => c -> es.map(_._2) }
    val byP = edges.groupBy(_._2).map { case (p, es) => p -> es.map(_._1) }
    var auth: Map[Long, Long] = byP.keys.map(_ -> 1000000L).toMap
    var it = 0
    var done = false
    while (!done && it < maxIters) {
      val h = byC.map { case (c, ps) => c -> ps.toSeq.map(auth).sum }
      val s = byP.map { case (p, cs) => p -> cs.toSeq.map(h).sum }
      val mx = s.values.max
      val next = s.map { case (p, sp) => p -> sp * 1000000L / mx }
      done = next.forall { case (v, np) => (np - auth(v)).abs <= 1L }
      auth = next
      it += 1
    }
    auth
  }

  private def viaSpark(edges: Set[(Long, Long)],
                       maxIters: Int = 16): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    val be = edges.toSeq.sorted.toDF("c", "p")
    val got = operators.Relational.hitsAuthPpm(be, maxIters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    spark.catalog.clearCache()
    got
  }

  private def check(edges: Set[(Long, Long)], name: String,
                    maxIters: Int = 16): Unit =
    assert(viaSpark(edges, maxIters) == reference(edges, maxIters),
      s"$name: auth ppm scores differ from the sequential reference")

  test("complete bipartite graph keeps every authority at exactly 1e6") {
    val edges = (for (c <- 1L to 4L; p <- 101L to 105L) yield (c, p)).toSet
    val got = viaSpark(edges)
    assert(got.values.toSet == Set(1000000L), s"non-uniform scores: $got")
    assert(got == reference(edges))
  }

  test("popularity star: the part every customer buys pins the normalizer") {
    // part 100 bought by all five customers; each customer also buys
    // one private part — the private parts' scores must floor down
    // relative to the hub identically in both engines
    val edges = (1L to 5L).flatMap(c => Seq((c, 100L), (c, 100L + c))).toSet
    check(edges, "star")
  }

  test("random bipartite graphs match the reference across seeds") {
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(seed)
      val nc = 4 + rnd.nextInt(6)
      val np = 4 + rnd.nextInt(6)
      val edges = (for {
        c <- 1L to nc.toLong
        p <- 101L to (100L + np)
        if rnd.nextDouble() < 0.35
      } yield (c, p)).toSet
      if (edges.nonEmpty) check(edges, s"B(nc=$nc, np=$np, seed=$seed)")
    }
  }

  test("a tight iteration cap stops at exactly the reference's capped state") {
    val rnd = new scala.util.Random(99)
    val edges = (for {
      c <- 1L to 7L
      p <- 101L to 108L
      if rnd.nextDouble() < 0.3
    } yield (c, p)).toSet
    for (cap <- Seq(1, 2, 3))
      check(edges, s"capped-$cap", maxIters = cap)
  }
}
