package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the round-11 rank-statistic constructions
  * against brute-force references on random data.
  *
  * The oracle gate proves q217/q208 on the fixtures; these tests prove
  * the CONSTRUCTIONS — the cumulative-weight lower-median rule and the
  * doubled-average-rank band decomposition — on adversarial shapes the
  * fixtures don't stress: heavy ties, single-element groups, skewed
  * weights, and unbalanced arms.
  */
class RankStatsPropertySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("rankstats-property")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Lower weighted median by direct scan: smallest value whose
    * cumulative weight w(<= x) satisfies 2*cum >= W. */
  private def bruteWeightedMedian(pts: Seq[(Long, Long)]): Long = {
    val total = pts.map(_._2).sum
    val sorted = pts.sortBy(_._1)
    var cum = 0L
    for ((v, w) <- sorted) {
      cum += w
      if (2 * cum >= total) return v
    }
    sorted.last._1
  }

  test("cumulative-weight median matches brute force across random multisets") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(seed)
      val n = 1 + rnd.nextInt(40)
      // heavy ties: values drawn from a small domain, skewed weights
      val pts = (1 to n).map(i =>
        (rnd.nextInt(6).toLong, 1L + rnd.nextInt(20).toLong, i.toLong))
      val df = pts.toDF("v", "w", "id")
      val grp = df.groupBy($"v").agg(sum($"w").as("wv"))
      val wc = Window.orderBy($"v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val got = grp.withColumn("cumw", sum($"wv").over(wc))
        .withColumn("wt", sum($"wv").over(
          Window.partitionBy()))
        .filter($"cumw" * 2 >= $"wt")
        .agg(min($"v")).head.getLong(0)
      val want = bruteWeightedMedian(pts.map(p => (p._1, p._2)))
      assert(got == want, s"seed=$seed: weighted median $got != brute $want")
    }
  }

  /** Doubled average rank by direct computation: for x in the combined
    * multiset, 2*avgrank(x) = 2*|{y < x}| + |{y = x}| + 1. */
  test("band-decomposed doubled ranks reproduce brute-force U statistics") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    for (seed <- 11 to 16) {
      val rnd = new scala.util.Random(seed)
      val n = 2 + rnd.nextInt(60)
      // zero-inflated tied values, unbalanced arms
      val rows = (1 to n).map { i =>
        val v = if (rnd.nextBoolean()) 0L else rnd.nextInt(8).toLong
        val arm = if (rnd.nextInt(3) == 0) "control" else "treatment"
        (v, arm, i.toLong)
      }
      // brute force: per element, doubled average rank; per arm sums
      def r2(x: Long): Long =
        2L * rows.count(_._1 < x) + rows.count(_._1 == x) + 1L
      val brute = rows.groupBy(_._2).map { case (arm, rs) =>
        val nA = rs.size.toLong
        val r2sum = rs.map(r => r2(r._1)).sum
        arm -> (nA, r2sum, r2sum - nA * (nA + 1))
      }
      // the q208 construction over the value-band table
      val df = rows.toDF("rev_c", "arm", "id")
      val vals = df.groupBy($"rev_c")
        .agg(count(lit(1)).as("n"),
          sum(when($"arm" === "control", 1L).otherwise(0L)).as("n_ctl"))
      val wv = Window.orderBy($"rev_c")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val banded = vals.withColumn("cum_le", sum($"n").over(wv))
        .select($"rev_c", $"n", $"n_ctl", ($"n" - $"n_ctl").as("n_trt"),
          (lit(2L) * ($"cum_le" - $"n") + $"n" + lit(1L)).as("r2"))
      val got = banded.select(explode(array(
          struct(lit("control").as("arm"), $"n_ctl".as("na"), $"r2"),
          struct(lit("treatment").as("arm"), $"n_trt".as("na"), $"r2"))).as("x"))
        .select($"x.arm".as("arm"), $"x.na".as("na"), $"x.r2".as("r2"))
        .groupBy($"arm")
        .agg(sum($"na").cast("long").as("n_users"),
          sum($"na" * $"r2").cast("long").as("r2_sum"))
        .collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
          r.getLong(2) - r.getLong(1) * (r.getLong(1) + 1)))
        .toMap
      brute.foreach { case (arm, want) =>
        if (want._1 == 0L) assert(!got.contains(arm) || got(arm)._1 == 0L)
        else assert(got(arm) == want,
          s"seed=$seed arm=$arm: ${got.get(arm)} != brute $want")
      }
      // the rank-sum identity: u2_a + u2_b == 2 * n_a * n_b
      val arms = brute.values.toSeq
      if (arms.size == 2)
        assert(arms.map(_._3).sum == 2 * arms.head._1 * arms(1)._1,
          s"seed=$seed: U identity violated")
    }
  }

  /** Doubled median / quadrupled MAD by direct rank selection on the
    * sorted multiset — the reference for the round-12 shared helper. */
  private def bruteMedMad2(vs: Seq[Long]): (Long, Long, Long) = {
    def med2of(xs: Seq[Long]): Long = {
      val s = xs.sorted
      val n = s.size
      s((n + 1) / 2 - 1) + s((n + 2) / 2 - 1)
    }
    val m2 = med2of(vs)
    (vs.size.toLong, m2, med2of(vs.map(v => (2 * v - m2).abs)))
  }

  test("bandedMedMad2 matches brute-force median/MAD across random groups") {
    val s = spark
    import s.implicits._
    for (seed <- 21 to 26) {
      val rnd = new scala.util.Random(seed)
      // heavy ties (small domain), singleton groups, negative values
      val rows = (1 to 1 + rnd.nextInt(80)).map { i =>
        (s"g${rnd.nextInt(4)}", rnd.nextInt(9).toLong - 3L)
      } :+ ("solo", 7L)
      val got = operators.Relational
        .bandedMedMad2(rows.toDF("k", "v"), "k", "v")
        .collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap
      val want = rows.groupBy(_._1).map { case (k, rs) =>
        k -> bruteMedMad2(rs.map(_._2))
      }
      assert(got == want, s"seed=$seed: $got != brute $want")
    }
  }

  test("sampledBuckets matches brute-force boundary buckets on full samples") {
    val s = spark
    import s.implicits._
    // n << 8192 so the adaptive modulus is 1 and the "sample" is the
    // whole input: the helper's output must then EXACTLY equal the
    // brute rank-selected equi-depth assignment. Degenerate shapes the
    // fixtures never hit: n < nb (boundary rank (i·cnt) div nb floors
    // to 0 → boundary list shrinks), collapsed ranks (two i hitting
    // the same row), heavy ties (tied values share a bucket), and a
    // second value column with a different ordering.
    for (seed <- 31 to 38) {
      val rnd = new scala.util.Random(seed)
      val nb = 2 + rnd.nextInt(6)
      val n = 1 + rnd.nextInt(if (seed % 2 == 0) nb else 60)
      val rows = (1 to n).map(i =>
        (i.toLong, rnd.nextInt(5).toLong, rnd.nextInt(9).toLong - 4L))
      def bruteBuckets(vs: Seq[(Long, Long)]): Map[Long, Long] = {
        // vs = (id, v); 1-based ranks in (v, id) order; boundaries at
        // the DISTINCT target ranks >= 1; bucket = 1 + #{b : b < v}
        val sorted = vs.sortBy(p => (p._2, p._1))
        val cnt = sorted.size.toLong
        val ranks = (1 until nb).map(i => (i * cnt) / nb)
          .filter(_ >= 1).distinct
        val bounds = ranks.map(r => sorted(r.toInt - 1)._2)
        vs.map { case (id, v) =>
          id -> (1L + bounds.count(_ < v))
        }.toMap
      }
      val got = operators.Relational
        .sampledBuckets(rows.toDF("id", "a", "b"), "id", Seq("a", "b"), nb)
        .select($"id", $"a_q", $"b_q")
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
      val wantA = bruteBuckets(rows.map(r => (r._1, r._2)))
      val wantB = bruteBuckets(rows.map(r => (r._1, r._3)))
      rows.foreach { case (id, _, _) =>
        assert(got(id) == (wantA(id), wantB(id)),
          s"seed=$seed nb=$nb id=$id: ${got(id)} != (${wantA(id)}, ${wantB(id)})")
      }
      // global invariants: buckets in [1, nb], monotone in the value
      assert(got.values.forall(p =>
        p._1 >= 1 && p._1 <= nb && p._2 >= 1 && p._2 <= nb))
      val byA = rows.sortBy(r => (r._2, r._1)).map(r => got(r._1)._1)
      assert(byA.zip(byA.drop(1)).forall { case (x, y) => x <= y },
        s"seed=$seed: buckets not monotone in value order")
    }
  }

  test("Pettitt doubled-midrank identity matches the brute sgn double sum") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // U_t = sum_{i<=t} sum_{j>t} sgn(y_i - y_j) computed directly,
    // vs the q237 construction U_t = sum_{i<=t} r2_i - t*(n+1) with
    // r2 = doubled midrank from the value-band table. Heavy ties
    // (small domain), regime shifts, and tiny series.
    for (seed <- 41 to 46) {
      val rnd = new scala.util.Random(seed)
      val n = 2 + rnd.nextInt(40)
      val shift = rnd.nextInt(n)
      val ys = (0 until n).map(i =>
        (if (i < shift) rnd.nextInt(4) else 3 + rnd.nextInt(4)).toLong)
      def bruteU(t: Int): Long =
        (0 until t).map(i => (t until n).map { j =>
          java.lang.Long.signum(ys(i) - ys(j)).toLong
        }.sum).sum
      val df = ys.zipWithIndex.map { case (y, i) => (i.toLong, y) }
        .toDF("day", "y")
      val wv = Window.orderBy($"y")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val r2 = df.groupBy($"y").agg(count(lit(1)).as("nb"))
        .withColumn("cum_le", sum($"nb").over(wv))
        .select($"y",
          (lit(2L) * ($"cum_le" - $"nb") + $"nb" + lit(1L)).as("r2"))
      val wd = Window.orderBy($"day")
      val got = df.join(r2, "y")
        .withColumn("t", row_number().over(wd).cast("long"))
        .withColumn("s2", sum($"r2").over(
          wd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select($"t", ($"s2" - $"t" * lit(n + 1L)).as("u_t"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      (1 until n).foreach { t =>
        assert(got(t.toLong) == bruteU(t),
          s"seed=$seed t=$t: ${got(t.toLong)} != brute ${bruteU(t)}")
      }
    }
  }

  test("cramerBeta matches a BigInt Cramer reference and recovers planted coefficients") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    def bruteBeta(rows: Seq[(Long, Long, Long)]): Seq[Long] = {
      // exact Cramer over BigInt moments with the same sign-normalized
      // shifted floor the SQL expression applies
      val n = BigInt(rows.size)
      val s1 = rows.map(r => BigInt(r._1)).sum
      val s2 = rows.map(r => BigInt(r._2)).sum
      val sy = rows.map(r => BigInt(r._3)).sum
      val s11 = rows.map(r => BigInt(r._1) * r._1).sum
      val s22 = rows.map(r => BigInt(r._2) * r._2).sum
      val s12 = rows.map(r => BigInt(r._1) * r._2).sum
      val s1y = rows.map(r => BigInt(r._1) * r._3).sum
      val s2y = rows.map(r => BigInt(r._2) * r._3).sum
      def det(m: Seq[Seq[BigInt]]): BigInt =
        m(0)(0) * (m(1)(1) * m(2)(2) - m(1)(2) * m(2)(1)) -
          m(0)(1) * (m(1)(0) * m(2)(2) - m(1)(2) * m(2)(0)) +
          m(0)(2) * (m(1)(0) * m(2)(1) - m(1)(1) * m(2)(0))
      val dm = det(Seq(Seq(n, s1, s2), Seq(s1, s11, s12), Seq(s2, s12, s22)))
      val ds = Seq(
        det(Seq(Seq(sy, s1, s2), Seq(s1y, s11, s12), Seq(s2y, s12, s22))),
        det(Seq(Seq(n, sy, s2), Seq(s1, s1y, s12), Seq(s2, s2y, s22))),
        det(Seq(Seq(n, s1, sy), Seq(s1, s11, s1y), Seq(s2, s12, s2y))))
      val k = BigInt(1000000000L)
      ds.map { di =>
        if (dm == 0) 0L
        else {
          val (dmp, dip) = if (dm < 0) (-dm, -di) else (dm, di)
          ((dip * 1000000 + k * dmp) / dmp - k).toLong
        }
      }
    }
    for (seed <- 51 to 56) {
      val rnd = new scala.util.Random(seed)
      // planted y = b0 + b1*x1 + b2*x2 (+ noise on odd seeds); also a
      // degenerate collinear shape (x2 = 2*x1) on seed 54 → detM = 0
      val (b0, b1, b2) = (rnd.nextInt(20).toLong - 10L,
        rnd.nextInt(9).toLong - 4L, rnd.nextInt(9).toLong - 4L)
      val n = 3 + rnd.nextInt(60)
      val rows = (1 to n).map { _ =>
        val x1 = rnd.nextInt(50).toLong
        val x2 = if (seed == 54) 2 * x1 else rnd.nextInt(10).toLong
        val noise = if (seed % 2 == 1) rnd.nextInt(5).toLong - 2L else 0L
        (x1, x2, b0 + b1 * x1 + b2 * x2 + noise)
      }
      val g = rows.toDF("x1", "x2", "y").agg(
        count(lit(1)).as("n"),
        sum($"x1").as("s1"), sum($"x2").as("s2"), sum($"y").as("sy"),
        sum($"x1" * $"x1").as("s11"), sum($"x2" * $"x2").as("s22"),
        sum($"x1" * $"x2").as("s12"),
        sum($"x1" * $"y").as("s1y"), sum($"x2" * $"y").as("s2y"))
      val got = g.select(
        expr(operators.Relational.cramerBeta(0, "DECIMAL(38,0)", "div")),
        expr(operators.Relational.cramerBeta(1, "DECIMAL(38,0)", "div")),
        expr(operators.Relational.cramerBeta(2, "DECIMAL(38,0)", "div")))
        .head
      val want = bruteBeta(rows)
      assert((0 to 2).forall(i => got.getLong(i) == want(i)),
        s"seed=$seed: ${(0 to 2).map(got.getLong)} != $want")
      // exact-fit seeds recover the planted coefficients exactly
      if (seed % 2 == 0 && seed != 54 && want.exists(_ != 0L))
        assert(want == Seq(b0, b1, b2).map(_ * 1000000L),
          s"seed=$seed: planted ($b0,$b1,$b2) not recovered: $want")
    }
  }

  test("boundedCollect returns whole results within bound and throws past it") {
    val s = spark
    import s.implicits._
    val df = (1 to 10).map(i => (i.toLong, s"r$i")).toDF("id", "tag")
    // within bound: the complete result set, nothing truncated
    assert(Tables.boundedCollect(df, 10L, "test").length == 10)
    assert(Tables.boundedCollect(df, 11L, "test").length == 10)
    // past bound: throws instead of silently truncating (and fetches
    // at most bound + 1 rows on the way to the error)
    val e = intercept[IllegalArgumentException] {
      Tables.boundedCollect(df, 9L, "test")
    }
    assert(e.getMessage.contains("bounded-collect contract violated"))
  }
}
