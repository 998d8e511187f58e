package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Guards the fixed-point log2 idiom shared by q328 (PSI) and q334
  * (information gain): the 64-entry millibit mantissa LUT is a
  * hand-written literal rendered into BOTH engines' SQL, so a typo'd
  * entry would ship identical-but-wrong logs through the oracle gate
  * (both sides would agree). This spec re-derives every entry from
  * math.log at test time, pins the q334 MB1 constant (mb(10⁶) =
  * 19931), and drives the Spark-side expression over a wide value
  * sweep against the real log2 — accuracy within the documented
  * ±½-step bound and strict monotonicity.
  */
class MillibitLogSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("millibit-log")
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("every LUT entry equals round(log2(1 + i/64) * 1000)") {
    val lut = operators.Pipeline.psiLutSql.split(",").map(_.trim.toLong)
    assert(lut.length == 64)
    lut.zipWithIndex.foreach { case (v, i) =>
      val expect = math.round(math.log(1.0 + i / 64.0) / math.log(2.0) * 1000)
      assert(v == expect, s"LUT[$i] = $v, expected $expect")
    }
  }

  test("mb(10^6) = 19931 — q334's hardcoded MB1 constant") {
    val s = spark
    import s.implicits._
    val got = Seq(1000000L).toDF("x")
      .selectExpr("CAST(" + operators.Pipeline.mbLog2Spark("x") + " AS BIGINT) AS mb")
      .collect()(0).getLong(0)
    assert(got == 19931L)
  }

  test("the Spark expression tracks 1000*log2(x) within a step and is monotone") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val xs = (Seq(1L, 2L, 3L, 63L, 64L, 65L, 999999L, 1000000L, 1000001L) ++
      Seq.fill(200)(1L + math.abs(rnd.nextLong()) % (1L << 40))).distinct.sorted
    val got = xs.toDF("x")
      .selectExpr("x", "CAST(" + operators.Pipeline.mbLog2Spark("x") + " AS BIGINT) AS mb")
      .orderBy("x")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    got.foreach { case (x, mb) =>
      val exact = math.log(x.toDouble) / math.log(2.0) * 1000.0
      // the floor-indexed LUT's worst case is one full step: values
      // at a bin's right edge read the bin's left-edge log — the step
      // is log2(65/64)·1000 ≈ 22.5 mb at the octave bottom, ~11 at
      // the top (this spec CORRECTED the scaladoc's earlier ±8 claim)
      assert(math.abs(mb - exact) <= 23.0,
        s"mb($x) = $mb vs exact $exact%.1f")
    }
    got.sliding(2).foreach {
      case Array((x1, m1), (x2, m2)) =>
        assert(m2 >= m1, s"mb not monotone between $x1 and $x2")
      case _ =>
    }
  }
}
