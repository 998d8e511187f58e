package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Laws of the two round-18 late-widening operators that the
  * hash-match oracles replay but do not STATE.
  *
  * q356 Bradley–Terry ([[operators.Pipeline.btFit]], pure driver
  * fold): the Σs renormalization invariant, label-permutation
  * equivariance (strengths depend on the matrix, not the names), the
  * 2-item closed form s_a/s_b = n_ab/n_ba (the BT MLE for two items —
  * MM reaches it in one round, so the fixed-point answer must match
  * it to flooring), and rank agreement with a designed transitive
  * dominance order.
  *
  * q357 conductance: the identity the query computes cut through
  * (cut = vol − 2·m_in) checked against a DIRECT count of boundary
  * edges per community at sf0.001, and the Cheeger-quotient range law
  * 0 ≤ φ ≤ 1e6 (cut(C) ≤ vol(C) and cut(C) = cut(C̄) ≤ vol(G)−vol(C),
  * so the ppm quotient can never exceed one).
  */
class BtConductancePropertySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("bt-conductance-property-spec")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def fit(wins: Map[(String, String), Long]) =
    operators.Pipeline.btFit(wins)

  test("btFit: strengths renormalize to |types|*1e6 within flooring") {
    val wins = Map(("a", "b") -> 7L, ("b", "a") -> 3L,
      ("a", "c") -> 5L, ("c", "a") -> 5L, ("b", "c") -> 2L,
      ("c", "b") -> 8L)
    val st = fit(wins)
    val n = st.size
    val tot = st.map(_._4).sum
    assert(math.abs(tot - n * 1000000L) <= n,
      s"sum of strengths $tot vs ${n * 1000000L}")
  }

  test("btFit: label-permutation equivariance (exact)") {
    val wins = Map(("a", "b") -> 9L, ("b", "a") -> 4L,
      ("b", "c") -> 6L, ("c", "b") -> 1L, ("a", "c") -> 2L,
      ("c", "a") -> 7L)
    val ren = Map("a" -> "z", "b" -> "x", "c" -> "y")
    val winsR = wins.map { case ((p, q), v) => ((ren(p), ren(q)), v) }
    val byType = fit(wins).map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val byTypeR = fit(winsR).map(r => r._1 -> (r._2, r._3, r._4)).toMap
    for ((t, v) <- byType)
      assert(byTypeR(ren(t)) == v, s"$t -> ${ren(t)}: $v vs ${byTypeR(ren(t))}")
  }

  test("btFit: 2-item closed form s_a/s_b = n_ab/n_ba (to flooring)") {
    for ((na, nb) <- Seq((9L, 1L), (3L, 2L), (100L, 50L), (1L, 7L))) {
      val st = fit(Map(("a", "b") -> na, ("b", "a") -> nb))
        .map(r => r._1 -> r._4).toMap
      // closed form under Σ = 2e6: s_a = 2e6 * na / (na + nb)
      val want = 2000000L * na / (na + nb)
      assert(math.abs(st("a") - want) <= 2L,
        s"n=($na,$nb): got ${st("a")}, want ~$want")
      assert(math.abs(st("a") + st("b") - 2000000L) <= 2L)
    }
  }

  test("btFit: designed transitive dominance yields the designed ranks") {
    val wins = Map(
      ("top", "mid") -> 9L, ("mid", "top") -> 1L,
      ("top", "low") -> 9L, ("low", "top") -> 1L,
      ("mid", "low") -> 9L, ("low", "mid") -> 1L)
    val ranks = fit(wins).map(r => r._1 -> r._5).toMap
    assert(ranks("top") == 1L && ranks("mid") == 2L && ranks("low") == 3L,
      s"ranks: $ranks")
  }

  test("q357: cut_edges equals a direct boundary-edge count; phi in [0, 1e6]") {
    val out = SparkEntry.queries("q357_conductance_audit")(spark, dir)
      .select(col("community"), col("cut_edges"), col("phi_ppm")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // direct count: each cross edge contributes 1 to BOTH endpoint
    // communities' cuts — independently of the vol − 2·m_in identity
    // the query computes through
    val lab = SparkEntry.queries("q164_label_propagation")(spark, dir)
      .select(col("part"), col("community"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = li.groupBy(_._1).values.flatMap { rows =>
      val ps = rows.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        yield (ps(i), ps(j))
    }.toSet
    val direct = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    for ((a, b) <- edges; ca = lab(a); cb = lab(b); if ca != cb) {
      direct(ca) += 1; direct(cb) += 1
    }
    for ((c, cut, phi) <- out) {
      assert(cut == direct(c), s"community $c: cut $cut vs direct ${direct(c)}")
      assert(phi >= 0L && phi <= 1000000L, s"community $c: phi $phi")
    }
    assert(out.map(_._2).sum == direct.values.sum)
  }
}
