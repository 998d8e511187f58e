package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Property test for the incremental substrate-maintenance claim
  * behind q168: because every co-occurrence edge lives inside ONE
  * order, merge(pairs(old), pairs(batch)) == pairs(all) for EVERY
  * partition of the orders into old/batch — not just the even/odd
  * split the declared query's oracle checks. Random synthetic
  * baskets + random split masks across seeds; also checks a
  * MULTI-batch chain (three appends merged successively), the shape
  * a real warehouse follows. */
class IncrementalMergeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("incremental-merge-property")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def randomBaskets(seed: Int): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    val nOrders = 20 + rnd.nextInt(30)
    for {
      o <- 0L until nOrders.toLong
      w = 1 + rnd.nextInt(5)
      p <- Seq.fill(w)(rnd.nextInt(12).toLong).distinct
    } yield (o, p)
  }

  private def pairsMap(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Long] =
    df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("merge of a random split reproduces the full build across seeds") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    for (seed <- 61 to 66) {
      val rows = randomBaskets(seed)
      val li = rows.toDF("o", "p")
      val full = pairsMap(operators.Relational.orderPairAgg(li))
      val rnd = new scala.util.Random(seed * 7)
      val batchOrders = rows.map(_._1).distinct.filter(_ => rnd.nextBoolean()).toSet
      val old = li.filter(!$"o".isin(batchOrders.toSeq: _*))
      val batch = li.filter($"o".isin(batchOrders.toSeq: _*))
      val merged = pairsMap(
        operators.Relational.orderPairAgg(old)
          .unionAll(operators.Relational.orderPairAgg(batch))
          .groupBy($"a", $"b").agg(sum($"cooc").as("cooc")))
      assert(merged == full, s"seed=$seed: incremental merge != full rebuild")
    }
  }

  test("a three-append chain converges to the full build") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val rows = randomBaskets(99)
    val li = rows.toDF("o", "p")
    val full = pairsMap(operators.Relational.orderPairAgg(li))
    val parts = (0 to 2).map(k => li.filter(pmod($"o", lit(3L)) === k.toLong))
    val chained = parts.map(operators.Relational.orderPairAgg)
      .reduce { (acc, nxt) =>
        acc.unionAll(nxt).groupBy($"a", $"b").agg(sum($"cooc").as("cooc"))
      }
    assert(pairsMap(chained) == full, "chained appends != full rebuild")
  }
}
