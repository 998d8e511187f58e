package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Property test for the synchronous label-propagation core
  * (`Relational.labelPropagation`) against a sequential reference.
  *
  * The oracle gate proves q164 on the cooc fixture; this spec proves
  * the UPDATE RULE (most-frequent neighbor label, min tie-break) and
  * the fixpoint/cap stopping rule on shapes the fixture doesn't
  * stress: two cliques joined by a bridge (clean 2-community ground
  * truth), an even cycle (the classic sync-LPA 2-cycle that forces
  * the cap), and random graphs across seeds.
  */
class LabelPropPropertySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("labelprop-property")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Sequential reference: identical sync update + stopping rule. */
  private def reference(edges: Set[(Long, Long)],
                        maxIters: Int = 16): Map[Long, Long] = {
    val nbrs = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2) }
    var p: Map[Long, Long] = nbrs.map { case (v, _) => v -> v }
    var it = 0
    var done = false
    while (!done && it < maxIters) {
      val next = nbrs.map { case (v, ns) =>
        val counts = ns.groupBy(p).map { case (lab, xs) => lab -> xs.size }
        // most frequent, ties -> smallest label
        v -> counts.toSeq.minBy { case (lab, c) => (-c, lab) }._1
      }
      done = next == p
      p = next
      it += 1
    }
    p
  }

  private def viaSpark(edges: Set[(Long, Long)]): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val e = edges.toSeq.sorted.toDF("a", "b")
    val deg = e.select($"a".as("v")).unionAll(e.select($"b".as("v")))
      .groupBy($"v").agg(count(lit(1)).as("deg"))
    val got = operators.Relational.labelPropagation(e, deg)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    spark.catalog.clearCache()
    got
  }

  test("two cliques with one bridge resolve to two communities") {
    val k5a = (for (i <- 0L until 5L; j <- (i + 1) until 5L) yield (i, j)).toSet
    val k5b = (for (i <- 10L until 15L; j <- (i + 1) until 15L) yield (i, j)).toSet
    val edges = k5a ++ k5b + ((4L, 10L))
    val got = viaSpark(edges)
    assert(got == reference(edges))
    // the bridge must not merge the cliques: labels form exactly 2 groups
    assert(got.values.toSet.size == 2, s"expected 2 communities: $got")
    assert((0L until 5L).map(got).toSet.size == 1, "clique A split")
    assert((10L until 15L).map(got).toSet.size == 1, "clique B split")
  }

  test("even cycle 2-cycles and both engines cap identically") {
    val n = 6L
    val edges = (0L until n).map(i => (i, (i + 1) % n))
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    assert(viaSpark(edges) == reference(edges))
  }

  test("random graphs match the sequential reference across seeds") {
    for (seed <- 51 to 55) {
      val rnd = new scala.util.Random(seed)
      val n = 12 + rnd.nextInt(14)
      val edges = (for {
        i <- 0L until n.toLong
        j <- (i + 1) until n.toLong
        if rnd.nextDouble() < 0.15
      } yield (i, j)).toSet
      if (edges.nonEmpty)
        assert(viaSpark(edges) == reference(edges),
          s"G(n=$n, seed=$seed): labels differ from reference")
    }
  }
}
