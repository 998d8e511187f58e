package graft

import org.scalatest.funsuite.AnyFunSuite

/** Property guards for the float-free statistics predicates.
  *
  * q95 flags |z| > 3 via the exact integer inequality
  * (n·x − Σx)² > 9·(n·Σx² − (Σx)²): both sides are z² multiplied
  * through by n²·var, so the integer form must agree with the
  * double z-score wherever the variance is non-zero — and must stay
  * quietly false when the variance is zero (a constant series has no
  * outliers, while the double form would divide by zero).
  *
  * q87 interleaves two 8-bit range-scaled coordinates into a Z-value;
  * the interleave must be a bijection on [0,256)² (otherwise distinct
  * (x, y) cells could collide into one bucket and the per-bucket
  * rectangle stats would under-report the spread).
  */
class IntegerStatsSpec extends AnyFunSuite {

  private def zFlagInt(xs: Seq[Long], x: Long): Boolean = {
    val n = xs.size.toLong
    val sx = xs.sum
    val sx2 = xs.map(v => v * v).sum
    val lhs = (n * x - sx) * (n * x - sx)
    lhs > 9L * (n * sx2 - sx * sx)
  }

  private def zFlagDouble(xs: Seq[Long], x: Long): Option[Boolean] = {
    val n = xs.size.toDouble
    val mean = xs.sum / n
    val variance = xs.map(v => (v - mean) * (v - mean)).sum / n
    if (variance == 0.0) None
    else Some(math.abs((x - mean) / math.sqrt(variance)) > 3.0)
  }

  test("q95 integer inequality matches the double z-score off the boundary") {
    val rnd = new scala.util.Random(42L)
    var checked = 0
    for (_ <- 1 to 2000) {
      val n = 24 + rnd.nextInt(200)
      val xs = Seq.fill(n)(rnd.nextInt(10000).toLong)
      for (x <- xs) {
        zFlagDouble(xs, x).foreach { d =>
          // only compare where the double form is numerically decisive:
          // within 1e-9 of z = 3 the float path itself is ill-defined
          val nL = xs.size.toLong
          val lhs = (nL * x - xs.sum).toDouble * (nL * x - xs.sum).toDouble
          val rhs = 9.0 * (nL * xs.map(v => v * v).sum - xs.sum * xs.sum).toDouble
          if (math.abs(lhs - rhs) > 1e-6 * math.max(lhs, rhs)) {
            assert(zFlagInt(xs, x) == d, s"n=$n x=$x")
            checked += 1
          }
        }
      }
    }
    assert(checked > 100000, s"too few decisive samples: $checked")
  }

  test("q95 integer inequality is false for a zero-variance series") {
    val xs = Seq.fill(50)(7L)
    for (x <- xs) assert(!zFlagInt(xs, x))
  }

  private def interleave(sx: Long, sy: Long): Long =
    (0 until 8).map(i => ((sx >> i) & 1L) << (2 * i)).sum +
      (0 until 8).map(i => ((sy >> i) & 1L) << (2 * i + 1)).sum

  test("q87 bit-interleave is a bijection on [0,256) x [0,256)") {
    val seen = new java.util.BitSet(1 << 16)
    for (sx <- 0L until 256L; sy <- 0L until 256L) {
      val z = interleave(sx, sy)
      assert(z >= 0 && z < (1 << 16), s"z out of range: $z")
      assert(!seen.get(z.toInt), s"collision at ($sx, $sy) -> $z")
      seen.set(z.toInt)
    }
    assert(seen.cardinality() == (1 << 16))
  }

  test("q87 z-order locality: a z-bucket spans a bounded rectangle") {
    // 4096 consecutive z-values (one q87 bucket) decode to coordinates
    // spanning at most a 64x64 rectangle: buckets are spatial cells,
    // not arbitrary scatter — the property the per-bucket min/max
    // stats in the declared query verify end-to-end.
    def deinterleave(z: Long): (Long, Long) =
      ((0 until 8).map(i => ((z >> (2 * i)) & 1L) << i).sum,
        (0 until 8).map(i => ((z >> (2 * i + 1)) & 1L) << i).sum)
    for (bucket <- 0 until 16) {
      val pts = (0 until 4096).map(o => deinterleave(bucket * 4096L + o))
      val (xs, ys) = (pts.map(_._1), pts.map(_._2))
      assert(xs.max - xs.min <= 63, s"bucket $bucket x-span ${xs.max - xs.min}")
      assert(ys.max - ys.min <= 63, s"bucket $bucket y-span ${ys.max - ys.min}")
    }
  }
}
