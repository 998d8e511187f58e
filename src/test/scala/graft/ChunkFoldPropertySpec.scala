package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Structural properties of the round-4 additions that the
  * oracle hash-match cannot express:
  *  - q102 chunking: the overlapping windows must exactly tile the
  *    document — every char covered, stride/overlap arithmetic
  *    consistent, no truncated middle chunks;
  *  - q108 EWMA: the fold is a convex combination, so the result must
  *    stay inside the per-user [min, max] envelope — the invariant
  *    that survives any α and catches sign/overflow bugs at scales the
  *    fixture can't reach.
  */
class ChunkFoldPropertySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.01"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("chunk-fold-property-spec")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("q102: chunks tile every document exactly (coverage + stride arithmetic)") {
    val chunks = SparkEntry.queries("q102_rag_chunks")(spark, dir)
    val docs = Tables.documents(spark, dir)
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), length(col("text")).cast("long").as("text_len"))
    val per = chunks.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        max(col("chunk_start") + col("chunk_len") - 1).as("covered_to"),
        min(col("chunk_start")).as("first_start"),
        max(col("chunk_start")).as("last_start"))
      .join(docs, "doc_id")
    // every doc appears; first chunk starts at 1; the last chunk ends
    // exactly at text_len; starts are the 192-stride lattice, so
    // n_chunks == last_start/192 + 1
    assert(per.count() == docs.count(), "some non-empty doc has no chunks")
    val bad = per.filter(
      col("first_start") =!= 1 ||
      col("covered_to") =!= col("text_len") ||
      (col("last_start") - 1) % 192 =!= 0 ||
      col("n_chunks") =!= (col("last_start") - 1) / 192 + 1)
    assert(bad.count() == 0, s"tiling violated for: ${bad.select("doc_id").collect().mkString(",")}")
    // every chunk is exactly min(256, text_len - start + 1) long —
    // full-size until the doc tail intrudes (with stride 192 < size
    // 256 the PENULTIMATE chunk may already be short when the final
    // tail is under the 64-char overlap, so "only the last chunk is
    // short" would be a wrong invariant)
    val wrongLen = chunks.join(docs, "doc_id")
      .filter(col("chunk_len") =!=
        least(lit(256L), col("text_len") - col("chunk_start") + 1))
    assert(wrongLen.count() == 0, "chunk_len != min(256, text_len - start + 1)")
  }

  test("q108: EWMA stays inside the per-user [min, max] value envelope") {
    val ewma = SparkEntry.queries("q108_ewma_fold")(spark, dir)
    val env = Tables.events(spark, dir)
      .select(col("user_id"), expr("CAST(round(value * 100) AS BIGINT)").as("vq"))
      .groupBy(col("user_id"))
      .agg(min(col("vq")).as("lo"), max(col("vq")).as("hi"))
    val out = ewma.join(env, "user_id")
      // the fold floors at each step, so the lower edge can undershoot
      // min by at most 1 cent per step-chain — bound it by lo - 1
      .filter(col("ewma_vq") < col("lo") - 1 || col("ewma_vq") > col("hi"))
    assert(out.count() == 0, "EWMA escaped the min/max envelope")
  }
}
