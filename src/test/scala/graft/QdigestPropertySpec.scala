package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sketches

/** Property test for q332's q-digest folds (`Sketches.qdigestCompress`
  * / `qdigestPickHiLeaf`) over random histograms — shapes the orders
  * fixture doesn't contain (heavy single leaves, empty stretches,
  * all-mass-in-one-leaf, t larger than every family).
  *
  * Invariants:
  *  - mass conservation: Σ node counts == Σ leaf counts;
  *  - every node ABOVE leaf level carries < t (only sub-t families
  *    ever fold upward);
  *  - the walk's rank sandwich (the provable form of the accuracy
  *    claim): with hi = picked right-endpoint leaf and trueRank =
  *    Σ leaf counts at leaf ≤ hi,  r ≤ trueRank ≤ r − 1 + 8t + the
  *    picked node's own mass. The picked-node term is the
  *    value-granularity floor: a heavy LEAF cannot be split by any
  *    summary at this universe resolution, so it is irreducible —
  *    q332's 8t `bound` column is the smooth-data dial on top.
  *  - determinism: compression is a pure function of the histogram
  *    (same input → same state under shuffled input order).
  */
class QdigestPropertySpec extends AnyFunSuite {

  private def randomHistogram(seed: Long): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    val nLeaves = 1 + rnd.nextInt(256)
    val leaves = rnd.shuffle((0L until 256L).toList).take(nLeaves)
    leaves.map { l =>
      val c = rnd.nextInt(4) match {
        case 0 => 1L + rnd.nextInt(5)           // sparse
        case 1 => 1L + rnd.nextInt(100)         // mid
        case 2 => 500L + rnd.nextInt(2000)      // heavy
        case _ => 1L + rnd.nextInt(20)
      }
      (l, c)
    }
  }

  test("compression conserves mass and bounds internal-node counts") {
    for (seed <- 1L to 40L) {
      val hist = randomHistogram(seed)
      val n = hist.map(_._2).sum
      for (k <- Seq(8L, 32L, 256L)) {
        val t = math.max(1L, n / k)
        val state = Sketches.qdigestCompress(hist.sortBy(_._1), t)
        assert(state.values.sum == n,
          s"seed=$seed k=$k: mass not conserved")
        val overweight = state.collect {
          case ((lvl, idx), c) if lvl > 0 && c >= t => (lvl, idx, c)
        }
        assert(overweight.isEmpty,
          s"seed=$seed k=$k t=$t: internal nodes at/above threshold: $overweight")
      }
    }
  }

  test("the quantile walk satisfies the rank sandwich at every target") {
    for (seed <- 41L to 70L) {
      val hist = randomHistogram(seed).sortBy(_._1)
      val n = hist.map(_._2).sum
      val t = math.max(1L, n / 32L)
      val state = Sketches.qdigestCompress(hist, t)
      val prefix = hist.scanLeft((0L, 0L)) { case ((_, acc), (l, c)) =>
        (l, acc + c)
      }.tail
      for (qp <- Seq(1L, 10L, 25L, 50L, 75L, 90L, 99L, 100L)) {
        val r = (n * qp + 99L) / 100L
        val hi = Sketches.qdigestPickHiLeaf(state, r)
        val trueRank = prefix.filter(_._1 <= hi).map(_._2)
          .lastOption.getOrElse(0L)
        // the picked node's own mass (value-granularity term)
        val pickMass = state.collect {
          case ((lvl, idx), c) if (idx + 1) * (1L << lvl) - 1 == hi => c
        }.max
        assert(trueRank >= r,
          s"seed=$seed q=$qp: trueRank $trueRank < r $r")
        assert(trueRank <= r - 1 + 8 * t + pickMass,
          s"seed=$seed q=$qp: trueRank $trueRank exceeds r-1+8t+pick " +
            s"(${r - 1 + 8 * t + pickMass})")
      }
    }
  }

  test("shard-digest merge conserves mass and keeps the walk's lower bound") {
    for (seed <- 86L to 105L) {
      val rnd = new scala.util.Random(seed)
      val hist = randomHistogram(seed).sortBy(_._1)
      val n = hist.map(_._2).sum
      // split each leaf's mass across 4 shards at random
      val shards = Array.fill(4)(scala.collection.mutable.Map[Long, Long]())
      hist.foreach { case (l, c) =>
        (1L to c).foreach { _ =>
          val sh = shards(rnd.nextInt(4))
          sh(l) = sh.getOrElse(l, 0L) + 1L
        }
      }
      val unioned = shards.toSeq.filter(_.nonEmpty).map { m =>
        val h = m.toSeq.sortBy(_._1)
        val ns = h.map(_._2).sum
        Sketches.qdigestCompress(h, math.max(1L, ns / 32L))
      }.flatten.groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).sum }
      val t = math.max(1L, n / 32L)
      val merged = Sketches.qdigestCompressState(unioned, t)
      assert(merged.values.sum == n, s"seed=$seed: merge lost mass")
      val prefix = hist.scanLeft((0L, 0L)) { case ((_, acc), (l, c)) =>
        (l, acc + c)
      }.tail
      for (qp <- Seq(25L, 50L, 90L)) {
        val r = (n * qp + 99L) / 100L
        val hi = Sketches.qdigestPickHiLeaf(merged, r)
        val trueRank = prefix.filter(_._1 <= hi).map(_._2)
          .lastOption.getOrElse(0L)
        assert(trueRank >= r,
          s"seed=$seed q=$qp: merged digest broke the lower bound")
      }
    }
  }

  test("compression is invariant to leaf input order") {
    for (seed <- 71L to 85L) {
      val hist = randomHistogram(seed)
      val n = hist.map(_._2).sum
      val t = math.max(1L, n / 32L)
      val a = Sketches.qdigestCompress(hist.sortBy(_._1), t)
      val b = Sketches.qdigestCompress(
        new scala.util.Random(seed).shuffle(hist.toList), t)
      assert(a == b, s"seed=$seed: state depends on input order")
    }
  }
}
