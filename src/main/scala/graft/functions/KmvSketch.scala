package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** K-minimum-values distinct-count sketch as a typed `Aggregator`
  * (the UDAF/sketch extension surface, SURVEY §7.3).
  *
  * Input is a 60-bit hash in [0, 2^60) (callers use the engine-portable
  * md5-hex parse so the DuckDB oracle reproduces it bit-for-bit). The
  * buffer keeps the k smallest DISTINCT hashes; the estimate is the
  * classic KMV unbiased form `(k-1) · M / h_(k)` with M = 2^60, or the
  * exact distinct count when fewer than k values were seen.
  *
  * Deterministic by construction: the k-smallest set is order-
  * independent, so partial aggregation/merge order (Spark) vs single
  * pass (DuckDB) cannot change the result — the same property the
  * Exact money layer relies on.
  *
  * Scale: the buffer is O(k) per group regardless of input size; merge
  * is O(k) — the right shape for a 100 TB groupBy where per-group
  * exact distinct would spill.
  */
class KmvSketch(k: Int) extends Aggregator[Long, Seq[Long], Double] {
  require(k >= 2, "k must be >= 2")

  private val domainMax = 1152921504606846976.0 // 2^60, exact in double

  override def zero: Seq[Long] = Vector.empty

  /** The buffer is always sorted ascending, so membership and the
    * insertion point come from one binary search — O(log k) compare +
    * O(k) vector patch, not O(k) contains + O(k log k) re-sort per row. */
  private def insert(buf: Seq[Long], h: Long): Seq[Long] = {
    val size = buf.size
    if (size == k && h >= buf.last) return buf // full and not smaller than the max
    var lo = 0
    var hi = size
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (buf(mid) < h) lo = mid + 1 else hi = mid
    }
    if (lo < size && buf(lo) == h) buf // already present
    else {
      val patched = buf.patch(lo, Seq(h), 0)
      if (patched.size > k) patched.take(k) else patched
    }
  }

  override def reduce(buf: Seq[Long], h: Long): Seq[Long] = insert(buf, h)
  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = b.foldLeft(a)(insert)

  override def finish(buf: Seq[Long]): Double =
    if (buf.size < k) buf.size.toDouble
    else (k - 1).toDouble * domainMax / buf.last.toDouble

  override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

/** Raw-buffer variant of [[KmvSketch]]: `finish` returns the sorted
  * k-min hash set itself instead of the point estimate, so downstream
  * plans can do sketch ALGEBRA — union two groups' sketches (k smallest
  * of the concatenation) or estimate an intersection (shared hashes
  * below the union's k-th min) — without touching the corpus again.
  * Same O(k) buffer and order-independent merge, so the result is
  * deterministic under any partial-aggregation schedule. */
class KmvSketchBuffer(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
  private val inner = new KmvSketch(k)
  override def zero: Seq[Long] = inner.zero
  override def reduce(buf: Seq[Long], h: Long): Seq[Long] = inner.reduce(buf, h)
  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = inner.merge(a, b)
  override def finish(buf: Seq[Long]): Seq[Long] = buf
  override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}
