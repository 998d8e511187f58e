package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Fixture precondition for the multimodal pack (ADVICE r3,
  * Multimodal.scala): q45/q64/q65 compute over UTF-8 BYTES on the
  * Spark side while their DuckDB oracles index CHARS — the two only
  * agree when `documents.text` is pure ASCII (1 byte == 1 char). DuckDB
  * has no byte-of-blob accessor, so the oracle cannot express the byte
  * semantics directly; this spec makes the ASCII precondition an
  * enforced invariant instead of a silent assumption. If a non-ASCII
  * corpus ever ships, this fails loudly before the hash gate diverges.
  */
class MultimodalFixtureSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("multimodal-fixture-spec")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val sfDirs = Seq("sf0.001", "sf0.01", "sf0.1")
    .map(sf => s"/root/testdata/$sf")
    .filter(d => new java.io.File(d, "documents.parquet").exists())

  test("at least one scale factor is present to check") {
    assert(sfDirs.nonEmpty)
  }

  for (dir <- sfDirs) {
    test(s"documents.text is pure ASCII at $dir (byte==char precondition for q45/q64/q65)") {
      // octet_length(UTF-8 bytes) == char length iff every char is ASCII
      val offenders = Tables.documents(spark, dir)
        .filter(octet_length(encode(col("text"), "UTF-8")) =!= length(col("text")))
        .select(col("doc_id"))
        .limit(5)
        .collect()
      assert(offenders.isEmpty,
        s"non-ASCII documents.text rows (doc_ids ${offenders.mkString(",")}) in $dir — " +
          "q45/q64/q65 byte-indexed results would diverge from their char-indexed oracles")
    }
  }
}
