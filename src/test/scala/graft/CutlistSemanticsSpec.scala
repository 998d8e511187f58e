package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Semantic guarantees of the q339 substring-dedup cut list that the
  * hash-match oracle replays but does not STATE: the structural form
  * of the spans (1-based, in-bounds, ≥ L long, merged — sorted,
  * non-overlapping, non-adjacent) and the two Lee-et-al. dedup laws —
  * every cut span really is a duplicated region (its leading L-char
  * window occurs ≥ 2 times corpus-wide), and deleting the cut list
  * never loses content (for every such window at a cut-span start, at
  * least one occurrence in the corpus survives outside every cut
  * span — the keeper). Brute-forced on the driver at sf0.001, where
  * the corpus fits comfortably.
  */
class CutlistSemanticsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"
  private val L = 50

  private var texts: Map[Long, String] = _
  private var spans: Map[Long, Seq[(Long, Long)]] = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("cutlist-semantics-spec")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    texts = Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    spans = SparkEntry.queries("q339_dedup_cutlist")(spark, dir)
      .select("doc_id", "start_char", "end_char").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1).toSeq)
      .toMap
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("the fixture actually produces cut spans to check") {
    assert(spans.nonEmpty && spans.values.map(_.size).sum >= 5)
  }

  test("spans are 1-based, in-bounds, and at least L chars long") {
    for ((doc, ss) <- spans; (a, b) <- ss) {
      assert(a >= 1 && b <= texts(doc).length,
        s"doc $doc span [$a,$b] out of bounds (len ${texts(doc).length})")
      assert(b - a + 1 >= L, s"doc $doc span [$a,$b] shorter than L")
    }
  }

  test("per-doc spans are sorted, non-overlapping, and non-adjacent (merged)") {
    for ((doc, ss) <- spans; Seq((_, b1), (a2, _)) <- ss.sliding(2)) {
      // adjacency (a2 == b1 + 1) would mean the island merge missed one
      assert(a2 > b1 + 1, s"doc $doc spans [..,$b1] and [$a2,..] " +
        "overlap or are adjacent — islands not merged")
    }
  }

  // occurrences of an L-char window across the whole corpus
  private def occurrences(window: String): Seq[(Long, Int)] =
    texts.toSeq.flatMap { case (doc, t) =>
      Iterator.iterate(t.indexOf(window))(i => t.indexOf(window, i + 1))
        .takeWhile(_ >= 0).map(i => (doc, i + 1)).toSeq // 1-based
    }

  test("every cut span is a real duplicate: its leading L-char window occurs >= 2 times") {
    for ((doc, ss) <- spans; (a, _) <- ss) {
      val w = texts(doc).substring(a.toInt - 1, a.toInt - 1 + L)
      val occ = occurrences(w)
      assert(occ.size >= 2,
        s"doc $doc span at $a: window occurs only ${occ.size} time(s)")
    }
  }

  test("deletion never loses content: a keeper occurrence survives outside every cut span") {
    def covered(doc: Long, pos: Int): Boolean =
      spans.getOrElse(doc, Nil).exists { case (a, b) =>
        pos >= a && pos + L - 1 <= b }
    for ((doc, ss) <- spans; (a, _) <- ss) {
      val w = texts(doc).substring(a.toInt - 1, a.toInt - 1 + L)
      val survivors = occurrences(w).filterNot { case (d, p) =>
        covered(d, p) }
      assert(survivors.nonEmpty,
        s"doc $doc span at $a: every occurrence of the window was cut")
    }
  }
}
