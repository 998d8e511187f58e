package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Pins the shared co-occurrence substrate's contract
  * (`Relational.coocPairs`): one plan per (session, dir) so its five
  * consumers (q138/q145/q146/q148/q150) reuse one partitioning and one
  * set of cached blocks, and the persist marker survives harness-level
  * `catalog.clearCache()` hygiene (which drops cache REGISTRATIONS,
  * not just blocks — without the re-mark, every later consumer would
  * silently recompute the edge build from the corpus).
  */
class SubstrateSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("substrate-spec")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("coocPairs is memoized: same plan instance per (session, dir)") {
    val a = operators.Relational.coocPairs(spark, dir)
    val b = operators.Relational.coocPairs(spark, dir)
    assert(a eq b, "memo must return the identical DataFrame instance")
  }

  test("coocPairs is persisted, and re-marks itself after clearCache") {
    val df = operators.Relational.coocPairs(spark, dir)
    assert(df.storageLevel != StorageLevel.NONE, "substrate not persisted")
    spark.catalog.clearCache()
    assert(df.storageLevel == StorageLevel.NONE,
      "test substrate assumption broken: clearCache no longer unregisters")
    val again = operators.Relational.coocPairs(spark, dir)
    assert(again.storageLevel != StorageLevel.NONE,
      "substrate did not re-mark persistence after clearCache")
  }

  test("the four graph consumers agree with a from-scratch edge build") {
    import org.apache.spark.sql.functions._
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val raw = li.toDF("o", "a").join(li.toDF("o", "b"), "o")
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("cooc"))
    val sub = operators.Relational.coocPairs(spark, dir)
    assert(sub.count() == raw.count())
    assert(sub.except(raw).isEmpty && raw.except(sub).isEmpty,
      "substrate rows differ from the direct edge build")
  }

  test("coocDeg agrees with a from-scratch degree count and is persisted") {
    import org.apache.spark.sql.functions._
    val e = operators.Relational.coocPairs(spark, dir).select(col("a"), col("b"))
    val raw = e.select(col("a").as("v")).unionAll(e.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))
    val deg = operators.Relational.coocDeg(spark, dir)
    assert(deg.except(raw).isEmpty && raw.except(deg).isEmpty,
      "degree substrate differs from the direct degree count")
    // memoized: same plan instance; self-healing persist like coocPairs
    assert(deg eq operators.Relational.coocDeg(spark, dir))
    spark.catalog.clearCache()
    assert(operators.Relational.coocDeg(spark, dir).storageLevel
      != org.apache.spark.storage.StorageLevel.NONE,
      "coocDeg did not re-mark its persist after clearCache")
  }
}
