package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-buffer per-group top-k as a typed `Aggregator`.
  *
  * The window form of top-k (`row_number() OVER (PARTITION BY g ORDER
  * BY n DESC)` then `rn <= k`) shuffles EVERY row to its group's
  * partition and fully sorts there. This aggregator keeps an O(k)
  * sorted buffer per group instead: map-side partial aggregation means
  * at most k candidates per group per input partition ever reach the
  * shuffle, and merging two buffers is O(k) — the plan shape that
  * survives a 100 TB group-by where the window form moves the world.
  *
  * Ranking is (count DESC, key ASC) — totally ordered, so the result
  * is deterministic under any partial-aggregation/merge order (the
  * same order-independence argument as [[KmvSketch]]).
  */
class TopKAgg(k: Int)
    extends Aggregator[(String, Long), Seq[(String, Long)], Seq[(String, Long)]] {
  require(k >= 1, "k must be >= 1")

  /** "a ranks strictly before b". */
  private def before(a: (String, Long), b: (String, Long)): Boolean =
    a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)

  /** Insert keeping the buffer rank-sorted and capped at k; O(log k)
    * search + O(k) patch. Keys are unique per group (inputs are
    * post-aggregation rows), so no dedup is needed. */
  private def insert(buf: Seq[(String, Long)], x: (String, Long)): Seq[(String, Long)] = {
    if (buf.size == k && !before(x, buf.last)) return buf
    var lo = 0
    var hi = buf.size
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (before(buf(mid), x)) lo = mid + 1 else hi = mid
    }
    val patched = buf.patch(lo, Seq(x), 0)
    if (patched.size > k) patched.take(k) else patched
  }

  override def zero: Seq[(String, Long)] = Vector.empty
  override def reduce(b: Seq[(String, Long)], x: (String, Long)): Seq[(String, Long)] =
    insert(b, x)
  override def merge(a: Seq[(String, Long)], b: Seq[(String, Long)]): Seq[(String, Long)] =
    b.foldLeft(a)(insert)
  override def finish(b: Seq[(String, Long)]): Seq[(String, Long)] = b

  override def bufferEncoder: Encoder[Seq[(String, Long)]] =
    ExpressionEncoder[Seq[(String, Long)]]()
  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    ExpressionEncoder[Seq[(String, Long)]]()
}
