package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Unit test for the integer-ppk Newman modularity (`Relational
  * .modularityPpk`) on partitions with KNOWN hand-computable scores —
  * the declared q203 runs it on the fixture cooc graph, where sync LPA
  * honestly collapses to one community with Q = 0 (the trivial case),
  * so multi-community arithmetic, negative contributions, and the
  * signed shifted floor are proven here instead.
  */
class ModularitySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("modularity-spec")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Run modularityPpk over explicit edges and labels; return
    * community -> (n_vertices, m_in, d_tot, contrib_ppk). */
  private def run(edges: Seq[(Long, Long)], labels: Map[Long, Long])
      : Map[Long, (Long, Long, Long, Long)] = {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val e = edges.toDF("a", "b")
    val deg = e.select($"a".as("v")).unionAll(e.select($"b".as("v")))
      .groupBy($"v").agg(count(lit(1)).as("deg"))
    val lab = labels.toSeq.toDF("v", "community")
    operators.Relational.modularityPpk(e, deg, lab)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
  }

  /** floor via the same shifted rule the SQL uses. */
  private def contribPpk(m: Long, mIn: Long, dTot: Long): Long =
    ((4 * m * mIn - dTot * dTot) * 1000L + 1000L * 4 * m * m) /
      (4 * m * m) - 1000L

  test("two disjoint triangles split by clique: Q = 1/2 exactly") {
    // 6 edges total; each community: m_c = 3, D_c = 6
    // contrib = 3/6 - (6/12)^2 = 1/2 - 1/4 = 1/4 each -> 250 ppk
    val t1 = Seq((0L, 1L), (1L, 2L), (0L, 2L))
    val t2 = Seq((10L, 11L), (11L, 12L), (10L, 12L))
    val labels = Map(0L -> 0L, 1L -> 0L, 2L -> 0L,
      10L -> 1L, 11L -> 1L, 12L -> 1L)
    val got = run(t1 ++ t2, labels)
    assert(got == Map(
      0L -> (3L, 3L, 6L, 250L),
      1L -> (3L, 3L, 6L, 250L)))
  }

  test("anti-community split cuts every edge: negative contributions") {
    // 4-cycle 0-1-2-3-0 split across the diagonal pairs {0,2} vs
    // {1,3}: every edge crosses, m_in = 0, each community D_c = 4,
    // m = 4 -> contrib = 0 - (4/8)^2 = -1/4 -> floor -250 ppk each.
    // Exercises the SIGNED floor: truncating div would give -250 here
    // only via the shift (the raw truncated form rounds toward zero).
    val cyc = Seq((0L, 1L), (1L, 2L), (2L, 3L), (0L, 3L))
    val labels = Map(0L -> 0L, 2L -> 0L, 1L -> 1L, 3L -> 1L)
    val got = run(cyc, labels)
    assert(got == Map(
      0L -> (2L, 0L, 4L, -250L),
      1L -> (2L, 0L, 4L, -250L)))
  }

  test("uneven partition on a barbell matches the closed form") {
    // K3 -- bridge -- K3, labels = the two cliques (bridge endpoints
    // in their own cliques): m = 7, each community m_c = 3, D_c = 7
    val t1 = Seq((0L, 1L), (1L, 2L), (0L, 2L))
    val t2 = Seq((10L, 11L), (11L, 12L), (10L, 12L))
    val bridge = Seq((2L, 10L))
    val labels = Map(0L -> 0L, 1L -> 0L, 2L -> 0L,
      10L -> 1L, 11L -> 1L, 12L -> 1L)
    val got = run(t1 ++ t2 ++ bridge, labels)
    val expect = contribPpk(7, 3, 7)
    assert(got == Map(
      0L -> (3L, 3L, 7L, expect),
      1L -> (3L, 3L, 7L, expect)))
    // sanity: the closed form itself — 3/7 − (7/14)² = 0.17857… → 178
    assert(expect == 178L)
  }

  test("single community over any graph scores exactly zero") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (0L, 3L), (0L, 2L))
    val labels = Map(0L -> 7L, 1L -> 7L, 2L -> 7L, 3L -> 7L)
    val got = run(edges, labels)
    assert(got.size == 1 && got(7L)._4 == 0L)
  }
}
