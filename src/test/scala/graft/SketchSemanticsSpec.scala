package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Semantic guarantees of the probabilistic/semi-structured operators
  * that the DuckDB hash gate can't express (the gate proves both
  * engines agree; these prove the agreed answer has the promised
  * properties).
  */
class SketchSemanticsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("sketch-semantics")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("driver contract: every declared query has an oracle and vice versa") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(q == o, s"query/oracle mismatch: missing oracles=${q -- o}, orphan oracles=${o -- q}")
  }

  test("q112: count-min estimate is one-sided (est >= true, never under)") {
    val rows = SparkEntry.queries("q112_cms_heavyhitters")(spark, dir)
      .select("n", "cms_est").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= r.getLong(0),
        s"CMS underestimated: est=${r.getLong(1)} < true=${r.getLong(0)}")
    }
  }

  test("q119: Bloom filter has zero false negatives and bounded universe") {
    val rows = SparkEntry.queries("q119_bloom_prune")(spark, dir)
      .select("n_cust", "n_maybe", "n_true").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nCust, nMaybe, nTrue) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(nMaybe >= nTrue, s"false negative: maybe=$nMaybe < true=$nTrue")
      assert(nMaybe <= nCust, s"maybe=$nMaybe exceeds universe=$nCust")
    }
  }

  test("q111: variant extraction nulls missing paths instead of failing") {
    val row = SparkEntry.queries("q111_variant_props")(spark, dir)
      .agg(sum(col("n")).as("n"), sum(col("n_miss")).as("m")).collect()(0)
    assert(row.getLong(0) > 0, "no rows flowed through the variant path")
    assert(row.getLong(1) == 0, "try_variant_get on a missing path must be NULL")
  }

  test("q111: variant_get returns typed values matching from_json (q27)") {
    // both read props.k as an int — totals must agree exactly
    val v = SparkEntry.queries("q111_variant_props")(spark, dir)
      .agg(sum(col("sum_k"))).collect()(0).getLong(0)
    val j = SparkEntry.queries("q27_json_props")(spark, dir)
      .agg(sum(col("sum_k"))).collect()(0).getLong(0)
    assert(v == j, s"variant total $v != from_json total $j")
  }

  test("q114: sliding windows are 6h-aligned and replicate each event 4x") {
    val df = SparkEntry.queries("q114_sliding_dau")(spark, dir)
    val starts = df.select("start_s").collect().map(_.getLong(0))
    assert(starts.nonEmpty)
    assert(starts.forall(_ % 21600 == 0), "window start not 6h-aligned")
    val totalN = df.agg(sum(col("n"))).collect()(0).getLong(0)
    val nEvents = Tables.events(spark, dir).count()
    assert(totalN == 4 * nEvents,
      s"each event must appear in exactly 4 overlapping windows: $totalN != 4*$nEvents")
  }

  test("q110 == q34: bounded-heap top-k agrees with the window form") {
    val heap = SparkEntry.queries("q110_topk_heap")(spark, dir)
      .orderBy("lang", "rn").collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val win = SparkEntry.queries("q34_top_terms_per_lang")(spark, dir)
      .orderBy("lang", "rn").collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(heap.sameElements(win), "Aggregator top-k diverged from window top-k")
  }

  test("KmvSketchBuffer: merge is order/partitioning-invariant and equals one pass") {
    val k = 8
    val agg = new graft.functions.KmvSketchBuffer(k)
    // deterministic pseudo-values with duplicates, spread over int64
    val vs = (1 to 200).map(i => graft.functions.H60.hash(s"v${i % 120}".getBytes))
    val onePass = vs.foldLeft(agg.zero)(agg.reduce)
    assert(onePass.size == k && onePass == onePass.sorted &&
      onePass.distinct.size == k, "buffer must be k sorted distinct mins")
    // any split + any merge order must reproduce the one-pass buffer
    Seq(1, 3, 7, 50).foreach { chunks =>
      val parts = vs.grouped(math.max(1, vs.size / chunks)).toSeq
        .map(_.foldLeft(agg.zero)(agg.reduce))
      val merged = parts.reduce(agg.merge)
      val mergedRev = parts.reverse.reduce(agg.merge)
      assert(merged == onePass && mergedRev == onePass,
        s"merge with $chunks chunks diverged from the single pass")
    }
  }
}
