package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TopKAgg

/** Pure-Scala properties of the bounded-heap top-k Aggregator: the
  * result must equal the full-sort reference and be invariant to how
  * rows are split into partial buffers and in what order partials are
  * merged — the property that makes it safe under Spark's arbitrary
  * partial-aggregation schedule.
  */
class TopKAggSpec extends AnyFunSuite {

  // deterministic pseudo-data: unique keys, colliding counts (ties)
  private val rows: Vector[(String, Long)] =
    (0 until 500).map(i => (f"t$i%03d", ((i * 2654435761L) % 97) / 3)).toVector

  private def reference(k: Int): Seq[(String, Long)] =
    rows.sortBy { case (t, n) => (-n, t) }.take(k)

  test("agrees with the full-sort reference") {
    val agg = new TopKAgg(7)
    val got = rows.foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(got) == reference(7))
  }

  test("invariant to partition split and merge order") {
    val agg = new TopKAgg(5)
    val expected = reference(5)
    for (nParts <- Seq(1, 2, 7, 33, 499)) {
      val partials = rows.grouped(math.max(1, rows.size / nParts)).toVector
        .map(chunk => chunk.foldLeft(agg.zero)(agg.reduce))
      // forward, reversed, and pairwise-rotated merge orders
      val merged = Seq(
        partials.foldLeft(agg.zero)(agg.merge),
        partials.reverse.foldLeft(agg.zero)(agg.merge),
        (partials.drop(1) :+ partials.head).foldLeft(agg.zero)(agg.merge))
      merged.foreach(m => assert(agg.finish(m) == expected,
        s"nParts=$nParts gave ${agg.finish(m)}"))
    }
  }

  test("k larger than the input returns everything, ranked") {
    val agg = new TopKAgg(10000)
    val got = agg.finish(rows.foldLeft(agg.zero)(agg.reduce))
    assert(got == rows.sortBy { case (t, n) => (-n, t) })
  }
}
