package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Property test for the link-prediction core
  * (`Relational.linkPredCore`) against a brute-force
  * common-neighbor/Jaccard reference on random weighted graphs.
  *
  * The oracle gate proves q150/q160 on the co-occurrence fixtures;
  * this spec proves the PIPELINE — two-hop candidate generation, the
  * least/greatest non-edge anti-join, floor-division Jaccard, and the
  * (jaccard desc, cn desc, cand asc) tie-broken top-5 — on random
  * graphs with `probeMod = 1` (every vertex a probe), plus that the
  * capped form equals the exact form whenever the skew cap doesn't
  * bind (cap = max(64, ...) exceeds every degree at this test size).
  */
class LinkPredPropertySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("linkpred-property")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Brute force: per probe the top-5 non-adjacent two-hop candidates
    * ranked by (jaccard_ppm desc, cn desc, cand asc). Returns rows
    * (part, cand, cn, jaccard_ppm, rn). */
  private def brute(edges: Set[(Long, Long)]): Set[(Long, Long, Long, Long, Long)] = {
    val nbrs = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2).toSet }
    val deg = nbrs.map { case (v, ns) => v -> ns.size.toLong }
    val isEdge = (x: Long, y: Long) =>
      edges.contains((math.min(x, y), math.max(x, y)))
    nbrs.keySet.toSeq.flatMap { a =>
      val scored = nbrs.keySet.toSeq
        .filter(b => b != a && !isEdge(a, b))
        .map { b => (b, (nbrs(a) & nbrs(b)).size.toLong) }
        .filter(_._2 > 0)
        .map { case (b, cn) =>
          (b, cn, cn * 1000000L / (deg(a) + deg(b) - cn)) }
        .sortBy { case (b, cn, j) => (-j, -cn, b) }
        .take(5)
      scored.zipWithIndex.map { case ((b, cn, j), i) =>
        (a, b, cn, j, (i + 1).toLong) }
    }.toSet
  }

  private def viaSpark(edges: Set[(Long, Long)], weights: Map[(Long, Long), Long],
                       capped: Boolean): Set[(Long, Long, Long, Long, Long)] = {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val cooc = edges.toSeq.sorted.map { case (a, b) => (a, b, weights((a, b))) }
      .toDF("a", "b", "cooc")
    val deg = cooc.select($"a".as("u")).unionAll(cooc.select($"b".as("u")))
      .groupBy($"u").agg(count(lit(1)).as("deg"))
    val out = operators.Relational.linkPredCore(cooc, deg, capped, probeMod = 1)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    spark.catalog.clearCache()
    out
  }

  test("exact form matches brute force on random weighted graphs") {
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(seed)
      val n = 14 + rnd.nextInt(8)
      val edges = (for {
        i <- 0L until n.toLong
        j <- (i + 1) until n.toLong
        if rnd.nextDouble() < 0.2
      } yield (i, j)).toSet
      if (edges.nonEmpty) {
        val weights = edges.map(e => e -> (1L + rnd.nextInt(5))).toMap
        val expected = brute(edges)
        val got = viaSpark(edges, weights, capped = false)
        assert(got == expected, s"seed=$seed n=$n: rows differ from brute force")
      }
    }
  }

  test("capped form equals exact form when the cap does not bind") {
    // cap = max(64, 3|E|/|V|) >= 64 > any degree here, so the rank
    // filter keeps every edge and both arms must emit identical rows
    val rnd = new scala.util.Random(99)
    val edges = (for {
      i <- 0L until 20L
      j <- (i + 1) until 20L
      if rnd.nextDouble() < 0.25
    } yield (i, j)).toSet
    val weights = edges.map(e => e -> (1L + rnd.nextInt(5))).toMap
    assert(viaSpark(edges, weights, capped = true) ==
      viaSpark(edges, weights, capped = false))
  }
}
