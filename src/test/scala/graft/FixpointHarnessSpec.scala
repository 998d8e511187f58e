package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Pins `iterateToFixpointPpm`'s FIXED-VERTEX-SET contract (ADVICE
  * r19): the fused probe carries the state as `step(p) ⋈ p` (inner
  * join on v), so a step whose output vertex set grows or shrinks
  * relative to its input has the new/lost vertices DROPPED from the
  * carried state rather than kept. Every production caller derives
  * init and each step output from the same static substrate, so the
  * sets are equal by construction — this spec exists so a future
  * caller with a growing step fails loudly against a documented,
  * tested behavior instead of silently losing rows.
  */
class FixpointHarnessSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("fixpoint-harness")
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def rows(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("a growing step's new vertices are dropped, not carried") {
    val s = spark
    import s.implicits._
    val init = Seq((1L, 10L), (2L, 20L)).toDF("v", "p")
    def step(p: DataFrame): DataFrame =
      p.unionAll(Seq((3L, 30L)).toDF("v", "p"))
    val out = operators.Relational.iterateToFixpointPpm(init, 4)(step)
    // the step is the identity on {1, 2}, so the probe converges on
    // the first iteration — and vertex 3, emitted by the step but
    // absent from the carried state, never appears
    assert(rows(out) == Set((1L, 10L), (2L, 20L)))
  }

  test("a shrinking step loses the missing vertex from the state") {
    val s = spark
    import s.implicits._
    val init = Seq((1L, 10L), (2L, 20L)).toDF("v", "p")
    def step(p: DataFrame): DataFrame = p.filter($"v" =!= 2L)
    val out = operators.Relational.iterateToFixpointPpm(init, 4)(step)
    assert(rows(out) == Set((1L, 10L)))
  }

  test("a fixed-vertex-set step converges with every vertex intact") {
    val s = spark
    import s.implicits._
    val init = Seq((1L, 8L), (2L, 16L), (3L, 1L)).toDF("v", "p")
    // halving with floor reaches the all-zero fixpoint on every vertex
    def step(p: DataFrame): DataFrame =
      p.select($"v", ($"p" / 2).cast("long").as("p"))
    val out = operators.Relational.iterateToFixpointPpm(init, 16)(step)
    assert(rows(out) == Set((1L, 0L), (2L, 0L), (3L, 0L)))
  }
}
