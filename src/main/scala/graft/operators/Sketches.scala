package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{GraftExtensions, QueryPack, Tables => T}
import graft.functions.{Exact, KmvSketch}

/** Sketch aggregation (typed `Aggregator` UDAF), native-expression
  * fingerprinting (custom Catalyst `Expression` with codegen), and a
  * multi-format scan/sink round-trip — the remaining extension-surface
  * categories of SURVEY §2/§7.3.
  */
object Sketches extends QueryPack {

  /** engine-portable 60-bit hash: parse the first 15 md5 hex chars. */
  private def h60(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.PortableHash.h60(c)

  /** q311's acceptance report over per-size (mb, n_probe, n_neg, n_fp)
    * counts — factored so the batch query and the s47 streaming
    * monitor render the SAME fpr/chosen expressions (the
    * Events.haarReport rule, ADVICE r17). The counts are linear, so
    * the monitor feeds this the summed per-batch partials. The 1-row
    * chosen scalar crosses onto the 3-row size table (q311's PlanSpec
    * BNLJ cap). */
  private[operators] def bloomSizeReport(counts: DataFrame): DataFrame = {
    val s = counts.sparkSession
    import s.implicits._
    val scored = counts.select($"mb", $"n_probe", $"n_neg", $"n_fp",
      expr("n_fp * 1000000L div n_neg").as("fpr_ppm"))
    val chosen = scored.filter($"fpr_ppm" <= 100000L)
      .agg(coalesce(min($"mb"), lit(0L)).as("cm"))
    scored.crossJoin(broadcast(chosen))
      .select($"mb".as("m_bits"), $"n_probe", $"n_neg", $"n_fp",
        $"fpr_ppm",
        when($"fpr_ppm" <= 100000L, 1L).otherwise(0L).as("meets_target"),
        when($"mb" === $"cm", 1L).otherwise(0L).as("chosen"),
        when($"mb" === 1024L, 1L).otherwise(0L).as("shipped_in_s35"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- KMV distinct sketch per group ------------------------------
    "q43_kmv_distinct" -> ((s, d) => {
      import s.implicits._
      val kmv = udaf(new KmvSketch(64), Encoders.scalaLong)
      T.events(s, d)
        .select($"event_type", h60($"user_id").as("hv"))
        .groupBy($"event_type")
        .agg(round(kmv($"hv"), 4).as("est_distinct"),
          countDistinct($"hv").as("true_distinct"))
    }),

    // ---- count-min sketch heavy hitters -----------------------------
    // The mergeable frequency sketch: d=4 hash rows × w=256 counters.
    // The corpus is scanned once into exact word counts; probes then
    // explode 4 rows per DISTINCT word (never per occurrence — q101's
    // distinct-table trick), and the counter matrix is one hash agg
    // capped at d·w = 1024 rows however large the corpus. Estimates
    // (min over the word's d buckets) are reported next to true counts
    // for the global top-20, so the one-sided error (est ≥ true) is
    // visible in the result itself. At 100 TB the matrix build is a
    // map-side-partial agg to 1024 rows — the whole point of CMS.
    "q112_cms_heavyhitters" -> ((s, d) => {
      import s.implicits._
      val probeArr = (r: org.apache.spark.sql.Column) => array((0 until 4).map(i =>
        struct(lit(i).as("r"),
          pmod(h60(concat_ws("|", lit(i), r)), lit(256)).as("b"))): _*)
      // cached: both the matrix build and the top-20 read it, and the
      // distinct-word table is corpus-scale-independent-ish (q78/q101
      // convention) — without this the corpus is scanned twice
      val counts = T.documents(s, d)
        .select(explode(split($"text", " ")).as("w"))
        .groupBy($"w").agg(count(lit(1)).as("n"))
        .cache() // harness-released (per-query clearCache)
      val matrix = counts
        .select($"n", explode(probeArr($"w")).as("p"))
        .groupBy($"p.r".as("r"), $"p.b".as("b"))
        .agg(sum($"n").as("c"))
      val top = counts.orderBy($"n".desc, $"w".asc).limit(20)
      top.select($"w", $"n", explode(probeArr($"w")).as("p"))
        .select($"w", $"n", $"p.r".as("r"), $"p.b".as("b"))
        .join(broadcast(matrix), Seq("r", "b"))
        .groupBy($"w", $"n").agg(min($"c").cast("bigint").as("cms_est"))
    }),

    // ---- CountSketch estimates vs CMS's one-sided error -------------
    // The SIGNED frequency sketch [Charikar, Chen & Farach-Colton '02]:
    // d=4 hash rows × w=256 counters, but each word contributes
    // sgn_r(w)·n to its bucket, and the estimate is the MEDIAN over
    // rows of sgn_r(w)·C[r, b_r(w)] — colliding mass cancels in
    // expectation, so the error is two-sided and unbiased where CMS
    // (q112) only ever over-counts. Same scale shape as q112: one
    // corpus scan to exact distinct-word counts, probes explode 4 rows
    // per DISTINCT word, the matrix is one hash agg capped at 1024 rows
    // however large the corpus, top-20 probes join the broadcast
    // matrix. Median of 4 = floor-avg of the 2nd/3rd order statistics;
    // the sum may be negative — Spark's truncating div and DuckDB's
    // integer // both truncate toward zero, so the engines agree
    // (measured; the CentroidFloorSpec shift is not needed here
    // because both sides TRUNCATE, and trunc==trunc for any sign).
    // The result carries the exact count next to the estimate, so the
    // two-sided error (and q112's one-sided error on the same words)
    // is visible in the report itself.
    "q287_countsketch_audit" -> ((s, d) => {
      import s.implicits._
      val bOf = (i: Int) => pmod(h60(concat_ws("|", lit(i), $"w")), lit(256))
      val sgnOf = (i: Int) =>
        when(pmod(h60(concat_ws("|", lit(s"s#$i"), $"w")), lit(2)) === 0, 1L)
          .otherwise(-1L)
      val probeArr = array((0 until 4).map(i =>
        struct(lit(i).as("r"), bOf(i).as("b"), sgnOf(i).as("sgn"))): _*)
      val counts = T.documents(s, d)
        .select(explode(split($"text", " ")).as("w"))
        .groupBy($"w").agg(count(lit(1)).as("n"))
        .cache() // harness-released (per-query clearCache)
      val matrix = counts
        .select($"n", explode(probeArr).as("p"))
        .groupBy($"p.r".as("r"), $"p.b".as("b"))
        .agg(sum($"p.sgn" * $"n").cast("bigint").as("c"))
      val top = counts.orderBy($"n".desc, $"w".asc).limit(20)
      val w2 = org.apache.spark.sql.expressions.Window
        .partitionBy($"w").orderBy($"e".asc, $"r".asc)
      top.select($"w", $"n", explode(probeArr).as("p"))
        .select($"w", $"n", $"p.r".as("r"), $"p.b".as("b"), $"p.sgn".as("sgn"))
        .join(broadcast(matrix), Seq("r", "b"))
        .withColumn("e", $"sgn" * $"c")
        .withColumn("rk", row_number().over(w2))
        .filter($"rk" === 2 || $"rk" === 3)
        .groupBy($"w", $"n")
        .agg(expr("sum(e) div 2").as("cs_est"))
        .select($"w", $"n", $"cs_est",
          abs($"cs_est" - $"n").cast("bigint").as("abs_err"))
    }),

    // ---- Bloom size acceptance sweep (s35's tuning dial) --------------
    // The q163/q165 close-the-loop mechanism applied to s35's Bloom:
    // for m ∈ {256, 1024, 4096} bits (k = 3, the same md5 probe
    // convention), measure the ACTUAL false-positive rate of the
    // prefix-fingerprint filter on the streamed split — fp = passes
    // Bloom but is NOT an exact dup — and pick the smallest m meeting
    // fpr ≤ 10%. The report shows why s35 deliberately ships m = 1024
    // anyway (measured ~25% FPR keeps the verify path exercised at
    // fixture scale; the `shipped_in_s35` column makes the divergence
    // explicit instead of silent). One index scan builds all three
    // position sets; probes are 3 rows × 3 sizes per streamed doc.
    "q311_bloom_size_tune" -> ((s, d) => {
      import s.implicits._
      val hh = graft.functions.PortableHash.h60 _
      val isStrm = pmod(hh(col("doc_id")), lit(10)) === 0
      val fpOf = (t: org.apache.spark.sql.Column) =>
        hh(concat_ws(" ", slice(split(t, " "), 1, 3)))
      val ix = T.documents(s, d).filter(!isStrm)
        .select($"doc_id", fpOf($"text").as("fp")).cache() // harness-released (per-query clearCache)
      val strm = T.documents(s, d).filter(isStrm)
        .select($"doc_id", fpOf($"text").as("fp"))
      // the size dim is `mb`, not `m` — PlanSpec bans broadcast hints
      // on relations carrying the graph aliases u/v/m (the q203 rule)
      val ms = Seq(256L, 1024L, 4096L).toDF("mb")
      def probes(fp: org.apache.spark.sql.Column) =
        explode(array((0 until 3).map(i =>
          hh(concat_ws("|", lit(i), fp))): _*))
      val ipos = ix.crossJoin(broadcast(ms))
        .select($"mb", probes($"fp").as("ph"))
        .select($"mb", pmod($"ph", $"mb").as("pos"))
        .distinct().withColumn("hit", lit(1L))
      val maybe = strm.crossJoin(broadcast(ms))
        .select($"mb", $"doc_id", $"fp", probes($"fp").as("ph"))
        .select($"mb", $"doc_id", $"fp", pmod($"ph", $"mb").as("pos"))
        .join(ipos, Seq("mb", "pos"), "left")
        .groupBy($"mb", $"doc_id", $"fp")
        .agg((sum(coalesce($"hit", lit(0L))) === 3L).as("bm"))
      val truth = strm
        .join(ix.select($"fp").distinct().withColumn("dup", lit(1L)),
          Seq("fp"), "left")
        .select($"doc_id", coalesce($"dup", lit(0L)).as("is_dup"))
      bloomSizeReport(maybe.join(truth, Seq("doc_id"))
        .groupBy($"mb")
        .agg(count(lit(1)).as("n_probe"),
          sum(($"is_dup" === 0L).cast("long")).cast("bigint").as("n_neg"),
          sum(($"bm" && $"is_dup" === 0L).cast("long")).cast("bigint")
            .as("n_fp")))
    }),

    // ---- explicit Bloom filter build + probe ------------------------
    // The semi-join pruning structure AS DATA: a 4096-bit / k=3 Bloom
    // filter of 1995's active custkeys, built as 67 int64 words (62
    // used bits each — bit 63 would overflow DuckDB's shift) via
    // bit_or aggregation (mergeable, map-side partial, 64-row result
    // however many keys go in). The probe side ANDs each customer's 3
    // bit-probes against the broadcast words; customers failing any
    // probe are DEFINITELY inactive, the rest are "maybe" — compared
    // against the exact semi join so the false-positive count is
    // visible in the result. This is what Catalyst's runtime bloom
    // (PlanSpec) does internally; materialized, it ships across jobs —
    // build once on yesterday's 100 TB, prune today's scan with 512
    // bytes.
    "q119_bloom_prune" -> ((s, d) => {
      import s.implicits._
      def probes(key: org.apache.spark.sql.Column) =
        explode(array((0 until 3).map(i =>
          pmod(h60(concat_ws("|", lit(i), key)), lit(4096))): _*))
      val active = T.orders(s, d)
        .filter(year($"o_orderdate") === 1995)
        .select($"o_custkey").distinct()
      val bloom = active.select(probes($"o_custkey").as("idx"))
        .select(expr("CAST(idx div 62 AS INT)").as("word_i"),
          expr("shiftleft(CAST(1 AS BIGINT), CAST(idx % 62 AS INT))").as("m"))
        .groupBy($"word_i").agg(expr("bit_or(m)").as("bits"))
      val cust = T.customer(s, d).select($"c_custkey", $"c_mktsegment")
      val maybe = cust
        .select($"c_custkey", $"c_mktsegment", probes($"c_custkey").as("idx"))
        .select($"c_custkey", $"c_mktsegment", expr("CAST(idx div 62 AS INT)").as("word_i"),
          expr("shiftleft(CAST(1 AS BIGINT), CAST(idx % 62 AS INT))").as("m"))
        .join(broadcast(bloom), Seq("word_i"), "left")
        .groupBy($"c_custkey", $"c_mktsegment")
        .agg(sum(when(coalesce($"bits", lit(0L)).bitwiseAND($"m") =!= 0L, 1L)
          .otherwise(0L)).as("hits"))
        .select($"c_custkey", $"c_mktsegment", ($"hits" === 3L).as("maybe"))
      val truth = cust.join(active, $"c_custkey" === $"o_custkey", "left_semi")
        .select($"c_custkey").withColumn("istrue", lit(true))
      maybe.join(truth, Seq("c_custkey"), "left")
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n_cust"),
          sum(when($"maybe", 1L).otherwise(0L)).as("n_maybe"),
          sum(when(coalesce($"istrue", lit(false)), 1L).otherwise(0L)).as("n_true"))
    }),

    // ---- row-level replica diff (anti-entropy reconciliation) -------
    // q83 answers "are two copies identical?" in one row; this answers
    // "WHICH rows differ, and how?" — the repair-planning pass after a
    // checksum mismatch. Replica B is the source with a deterministic
    // fault injection (every 101st key dropped, every 97th price off
    // by a cent); both sides reduce to (key, row-fingerprint) and a
    // single full-outer join on the key classifies every row as
    // equal / changed / only_in_a. The join shuffles 16 bytes per row,
    // never row payloads — at 100 TB the fingerprint tables are the
    // only thing that moves, and bucketing both replicas on the key
    // makes even that shuffle-free.
    "q122_table_diff" -> ((s, d) => {
      import s.implicits._
      val base = T.orders(s, d).select($"o_orderkey".as("k"),
        $"o_orderstatus".as("st"), Exact.cents($"o_totalprice").as("pc"))
      val b = base.filter($"k" % 101L =!= 0L)
        .withColumn("pc", when($"k" % 97L === 0L, $"pc" + 1L).otherwise($"pc"))
      def fp(df: DataFrame) =
        df.select($"k", h60(concat_ws("|", $"k", $"st", $"pc")).as("fp"))
      fp(base).withColumnRenamed("fp", "fpa")
        .join(fp(b).withColumnRenamed("fp", "fpb").withColumnRenamed("k", "kb"),
          $"k" === $"kb", "full_outer")
        .select(when($"kb".isNull, "only_in_a")
          .when($"fpa" === $"fpb", "equal").otherwise("changed").as("diff_status"))
        .groupBy($"diff_status").agg(count(lit(1)).as("n"))
    }),

    // ---- native rolling-hash fingerprint ----------------------------
    "q44_rolling_fingerprint" -> ((s, d) => {
      import s.implicits._
      GraftExtensions.ensureRegistered(s)
      T.documents(s, d)
        .select($"doc_id", expr("rolling_hash(text)").as("fp"),
          expr("rolling_hash(lang)").as("lang_fp"))
    }),

    // ---- order-independent table fingerprints -----------------------
    // Replica / migration verification at 100 TB: XOR of a portable
    // 60-bit row hash is commutative and overflow-free, so the whole
    // fingerprint is a map-side partial agg + one-row merge per table —
    // comparing two 100 TB copies costs one scan each and moves three
    // rows. Doubles enter the canonical row string only as exact cents;
    // timestamps as epoch seconds (raw double/timestamp rendering
    // differs across engines).
    "q83_table_checksum" -> ((s, d) => {
      import s.implicits._
      def fp(df: DataFrame, name: String, row: org.apache.spark.sql.Column) =
        df.select(h60(row).as("h"))
          .agg(count(lit(1)).as("n_rows"), expr("bit_xor(h)").as("xor_fp"))
          .select(lit(name).as("table_name"), $"n_rows", $"xor_fp")
      fp(T.orders(s, d), "orders",
          concat_ws("|", $"o_orderkey", $"o_custkey",
            Exact.cents($"o_totalprice"), unix_timestamp($"o_orderdate")))
        .unionAll(fp(T.lineitem(s, d), "lineitem",
          concat_ws("|", $"l_orderkey", $"l_linenumber",
            $"l_quantity".cast("long"), Exact.cents($"l_extendedprice"))))
        .unionAll(fp(T.customer(s, d), "customer",
          concat_ws("|", $"c_custkey", $"c_name", Exact.cents($"c_acctbal"))))
    }),

    // ---- malformed-record handling (PERMISSIVE + corrupt column) ----
    // Real feeds deliver broken lines; a 100 TB ingest that dies on the
    // first one (FAILFAST) or silently drops them (DROPMALFORMED) is
    // wrong both ways. This builds a JSON-lines dataset where every
    // 10th record is truncated mid-object (deterministic by event_id),
    // reads it back in PERMISSIVE mode with columnNameOfCorruptRecord,
    // and accounts for both populations — valid rows parse typed,
    // corrupt lines land intact in the quarantine column for a
    // dead-letter side channel. Per-row compute only; no shuffle until
    // the final one-row agg.
    "q127_corrupt_records" -> ((s, d) => {
      import s.implicits._
      // applicationId suffix: concurrent runs (bench + verify) must
      // not overwrite each other's scratch mid-scan
      val dir = s"/tmp/graft_corrupt_${d.replaceAll("[^A-Za-z0-9]", "_")}" +
        s"_${s.sparkContext.applicationId.replaceAll("[^A-Za-z0-9]", "_")}"
      T.events(s, d)
        .select(when($"event_id" % 10 === 0,
            concat(lit("{\"event_id\": "), $"event_id", lit(", \"event_type\": \"")))
          .otherwise(to_json(struct($"event_id", $"event_type", $"user_id")))
          .as("value"))
        .write.mode("overwrite").text(dir)
      val schema = "event_id BIGINT, event_type STRING, user_id BIGINT, _corrupt_record STRING"
      s.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(dir)
        .agg(count(lit(1)).as("n_total"),
          sum(when($"_corrupt_record".isNotNull, 1L).otherwise(0L)).as("n_corrupt"),
          countDistinct(when($"_corrupt_record".isNull, $"event_type"))
            .as("n_types_valid"))
    }),

    // ---- multi-format scan/sink round-trip --------------------------
    // The engine's own sink writes CSV + JSON, then its scans read
    // them back — format parity is gated by comparing aggregates of
    // the round-tripped data against the original parquet in DuckDB.
    "q46_format_roundtrip" -> ((s, d) => {
      import s.implicits._
      val sample = T.orders(s, d).filter($"o_orderkey" < 1000)
        .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
      val tmp = s"/tmp/graft_fmt_${d.replaceAll("[^A-Za-z0-9]", "_")}" +
        s"_${s.sparkContext.applicationId.replaceAll("[^A-Za-z0-9]", "_")}"
      sample.write.mode("overwrite").option("header", "true").csv(s"$tmp/csv")
      sample.write.mode("overwrite").json(s"$tmp/json")
      sample.write.mode("overwrite").orc(s"$tmp/orc")
      val schema = "o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE"
      val c = s.read.option("header", "true").schema(schema).csv(s"$tmp/csv")
        .withColumn("fmt", lit("csv"))
      val j = s.read.schema(schema).json(s"$tmp/json")
        .withColumn("fmt", lit("json"))
      val o = s.read.schema(schema).orc(s"$tmp/orc")
        .withColumn("fmt", lit("orc"))
      c.unionAll(j).unionAll(o).groupBy($"fmt")
        .agg(count(lit(1)).as("n"), Exact.sumMoney($"o_totalprice").as("total"))
    }),

    // ---- KMV sketch ALGEBRA: pairwise audience overlap --------------
    // q43 estimates per-group distincts; the reason KMV (and not a
    // plain HLL register bank) earns its place in this engine is that
    // the k-min SET supports set algebra: union(A,B) = k smallest of
    // the concatenation, and the shared hashes below the union's k-th
    // min estimate the intersection [Beyer et al., SIGMOD'07]. Per
    // event-type audience (distinct users), every pairwise
    // union/overlap estimate is computed from the ≤|types| k-int
    // sketches ALONE — the corpus is scanned exactly once to build
    // them; the pair algebra runs on a table of |types|² rows of
    // 64-long arrays. At 100 TB that is the entire point: audience-
    // overlap matrices over N segments cost one scan + O(N²k) driver-
    // free arithmetic, not N² corpus joins.
    //
    // Determinism: k-min sets are order-independent (same property as
    // q43), and the estimate arithmetic is the same double formula
    // text in both engines over identical int inputs — IEEE ops are
    // correctly rounded, so the rounded outputs match exactly.
    "q153_kmv_set_ops" -> ((s, d) => {
      import s.implicits._
      GraftExtensions.ensureRegistered(s)
      val kmvBuf = udaf(new graft.functions.KmvSketchBuffer(64), Encoders.scalaLong)
      val sk = T.events(s, d)
        .select($"event_type", h60($"user_id").as("hv"))
        .groupBy($"event_type")
        .agg(kmvBuf($"hv").as("sk"))
      sk.toDF("ta", "ska").join(sk.toDF("tb", "skb"), $"ta" < $"tb")
        .withColumn("lu", array_sort(array_union($"ska", $"skb")))
        .withColumn("ulen", size($"lu").cast("bigint"))
        .withColumn("m", least($"ulen", lit(64L)))
        .withColumn("kth", element_at($"lu", $"m".cast("int")))
        .withColumn("est_union",
          when($"ulen" < 64, $"ulen".cast("double"))
            .otherwise(expr("63.0 * 1152921504606846976 / kth")))
        .withColumn("n_common",
          expr("CAST(size(filter(array_intersect(ska, skb), x -> x <= kth)) AS BIGINT)"))
        .select($"ta", $"tb", $"m", $"n_common",
          round($"est_union", 4).as("est_union"),
          round(expr("CAST(n_common AS DOUBLE) * est_union / CAST(m AS DOUBLE)"), 4)
            .as("est_inter"))
    }),

    // ---- KMV overlap audit: estimates vs exact ground truth ---------
    // The acceptance measurement for q153, same pattern as q142's ANN
    // recall audit: the sketch estimates are the product, the exact
    // pairwise overlap is the expensive baseline you run ONCE (per
    // rollout, per k choice) to decide whether k=64 is enough for the
    // decision at hand — and the per-pair union error in ppm is the
    // number that decision reads. Exact side: one distinct
    // (type, user) projection, self-joined on user — at 100 TB this is
    // the N² corpus join the sketches exist to avoid, which is exactly
    // why it is quarantined in an audit query instead of the product
    // path. Error formula is identical double text in both engines
    // over identical int inputs.
    "q157_kmv_overlap_audit" -> ((s, d) => {
      import s.implicits._
      GraftExtensions.ensureRegistered(s)
      val du = T.events(s, d).select($"event_type", $"user_id").distinct()
      val nA = du.groupBy($"event_type").agg(count(lit(1)).as("n"))
      val inter = du.toDF("ta", "u").join(du.toDF("tb", "u"), "u")
        .filter($"ta" < $"tb")
        .groupBy($"ta", $"tb").agg(count(lit(1)).as("xi"))
      val est = queries("q153_kmv_set_ops")(s, d)
        .select($"ta", $"tb", $"est_union", $"est_inter")
      // LEFT join FROM the estimate side: the exact side only has
      // pairs with >=1 shared user, but q153 emits an estimate for
      // EVERY type pair — zero-overlap pairs are precisely where a
      // nonzero est_inter is a pure false positive, so they must be
      // audited too. uni is rebuilt from na+nb-inter (>= max(na, nb)
      // >= 1), which is also the division guard for the ppm error.
      est.join(inter, Seq("ta", "tb"), "left")
        .join(nA.toDF("ta", "na"), "ta")
        .join(nA.toDF("tb", "nb"), "tb")
        .withColumn("inter", coalesce($"xi", lit(0L)))
        .withColumn("uni", $"na" + $"nb" - $"inter")
        .select($"ta", $"tb", $"inter", $"uni", $"est_union", $"est_inter",
          expr("round(abs(est_union - uni) * 1000000 / uni, 2)")
            .as("union_err_ppm"))
    }),

    // ---- HyperLogLog distinct estimation + mergeability + audit -----
    // [Flajolet et al., AofA'07] — the OTHER canonical distinct
    // sketch next to q43's KMV, here with the register bank built
    // RELATIONALLY: register j's value is max(rank) over items
    // hashing to j, i.e. one hash agg on (scope, j) — 32 rows per
    // scope however large the corpus, merge = max per register (the
    // union scope below is literally a re-agg of the per-type
    // register TABLE, never the raw data — the sketch-mergeability
    // demo). All arithmetic is engine-exact integers: the 60-bit
    // portable hash splits into a 5-bit register index and a 55-bit
    // suffix w whose rank = 55 − floor_log2(w) comes from bin()
    // length (bit arithmetic, no libm); the harmonic denominator
    // S = Σ 2^(56−reg) is an exact int64 (absent registers contribute
    // 2^56 each), and the estimate α·m²·2^56/S runs through one
    // DECIMAL(38)/HUGEINT floor division with α_32 = 0.697 fixed as
    // ppm. m = 32 keeps the raw-formula validity bound 2.5m = 80
    // well under the smallest fixture's distinct floor; the published
    // ±1.04/√m (±18%) error and the small-range bias are exactly what
    // the audit columns measure — est vs exact per scope, ppm error.
    // Scopes are distinct customers per order status + their union.
    // ---- trailing-7-day distinct users via HLL register merge -------
    // The SLIDING-WINDOW form of q214 and the reason sketches exist at
    // 100 TB: exact trailing-window NDV (WAU) re-touches every event 7
    // times, while pre-aggregated per-day HLL register banks merge by
    // a plain max OVER a 7-day RANGE frame — the window runs on the
    // (days × 32 registers) table, corpus-independent. Same 32-register
    // construction and integer estimate as q214. The exact trailing
    // NDV is computed alongside as the acceptance audit (map-side
    // 7-day explode + distinct — the expensive path the sketch
    // replaces; production drops it). Day anchor is q261's fixed
    // 2024-01-01: day feeds only grouping and the range frame (no
    // floor division), so negative values would still be exact.
    "q272_hll_sliding" -> ((s, d) => {
      import s.implicits._
      val du = T.events(s, d)
        .select(datediff(to_date($"ts"), to_date(lit("2024-01-01")))
          .cast("long").as("day"), $"user_id")
        .distinct().cache() // harness-released (per-query clearCache)
      val regs = du.select($"day", h60($"user_id").as("h"))
        .select($"day",
          expr("h div 36028797018963968").as("j"),
          expr("h % 36028797018963968").as("w"))
        .select($"day", $"j",
          expr("CASE WHEN w = 0 THEN 56 ELSE 55 - (length(bin(w)) - 1) END")
            .cast("long").as("rank"))
        .groupBy($"day", $"j").agg(max($"rank").as("reg"))
      // Densify to the full (observed days × 32 registers) grid so a
      // register set earlier in the trailing window but silent today
      // still carries through the RANGE-frame max (without this, the
      // merge under-counts on sparse days — each side would mirror the
      // defect, but the point is true per-day HLL bank merging). The
      // grid is days×32 rows: corpus-independent, broadcast-cheap.
      val days = du.select($"day").distinct().cache() // harness-released (per-query clearCache)
      val grid = days.crossJoin(
        s.range(0L, 32L).select(col("id").as("j")))
      val dense = grid.join(regs, Seq("day", "j"), "left")
      val wtr = org.apache.spark.sql.expressions.Window
        .partitionBy($"j").orderBy($"day").rangeBetween(-6, 0)
      val est = dense.withColumn("mreg", max($"reg").over(wtr))
        .groupBy($"day")
        .agg(count($"mreg").as("n_regs"),
          sum(expr("CASE WHEN mreg IS NULL THEN CAST(0 AS BIGINT) ELSE " +
            "shiftleft(CAST(1 AS BIGINT), CAST(56 - mreg AS INT)) END"))
            .as("s_present"))
        .select($"day",
          ($"s_present" +
            (lit(32L) - $"n_regs") * lit(72057594037927936L)).as("s"))
        .select($"day",
          expr("(CAST(697000 AS DECIMAL(38,0)) * 1024 * 72057594037927936)" +
            " div (CAST(s AS DECIMAL(38,0)) * 1000000)").cast("long")
            .as("est_hll"))
      val exact = du
        .select($"user_id", explode(sequence($"day", $"day" + 6L)).as("gday"))
        .join(days.select($"day".as("gday")), "gday")
        .groupBy($"gday").agg(countDistinct($"user_id").as("n_exact"))
      est.join(exact, est("day") === exact("gday"))
        .select($"day", $"n_exact", $"est_hll",
          expr("abs(est_hll - n_exact) * 1000000L div n_exact")
            .as("err_ppm"))
    }),

    "q214_hll_distinct" -> ((s, d) => {
      GraftExtensions.ensureRegistered(s)
      val ev = hllInput(s, d)
      hllReport(hllRegisters(ev), ev)
    }),

    // ---- q-digest SHARD-MERGE audit ----------------------------------
    // The mergeability law q332 claims, EXERCISED: 5 hash-shards each
    // build their own digest at their own t_s = ⌊n_s/32⌋ (the real
    // distributed setting — no shard knows the global n), the digests
    // merge by summing counts at matching (level, idx) keys and
    // recompressing at the global t (the canonical q-digest merge,
    // parent-inclusive fold), and the audit reports the merged
    // digest's quantile picks NEXT TO the single-pass global digest's
    // and both realized rank errors — the measurement that certifies
    // per-shard summarization before a 100 TB rollout (shard digests
    // are what executors would emit; only ≤3k-node summaries cross
    // the wire). One (shard × leaf) corpus agg; every fold after is a
    // bounded driver fold over ≤5·256 rows.
    "q335_qdigest_merge_audit" -> ((s, d) => {
      import s.implicits._
      graft.GraftExtensions.ensureRegistered(s)
      val leafW = 262144L
      val base = T.orders(s, d).select(
        expr(Exact.centsSql("o_totalprice")).as("c"),
        pmod(graft.functions.PortableHash.h60($"o_orderkey"), lit(5))
          .as("shard"))
      val rows = T.boundedCollect(
        base.select($"shard", least(expr("c div 262144"), lit(255L)).as("leaf"))
          .groupBy($"shard", $"leaf").agg(count(lit(1)).as("cnt")),
        5L * 256, "q335 shard histograms")
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val shardDigests = rows.groupBy(_._1).map { case (sh, rs) =>
        val hist = rs.map(r => (r._2, r._3)).sortBy(_._1)
        val ns = hist.map(_._2).sum
        sh -> qdigestCompress(hist, math.max(1L, ns / 32L))
      }
      val n = rows.map(_._3).sum
      val t = math.max(1L, n / 32L)
      val unioned = shardDigests.values.flatten
        .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).sum }
      val mergedDigest = qdigestCompressState(unioned, t)
      val globalDigest = qdigestCompress(
        rows.groupBy(_._2).map { case (l, xs) => (l, xs.map(_._3).sum) }
          .toSeq.sortBy(_._1), t)
      val picks = Seq(25L, 50L, 75L, 90L).map { qp =>
        val r = (n * qp + 99L) / 100L
        (qp, r,
          (qdigestPickHiLeaf(globalDigest, r) + 1) * leafW - 1,
          (qdigestPickHiLeaf(mergedDigest, r) + 1) * leafW - 1)
      }
      val cuts = picks.flatMap { case (_, _, eg, em) => Seq(eg, em) }
      val aggCols = cuts.zipWithIndex.map { case (cut, i) =>
        sum(($"c" <= cut).cast("long")).as(s"t$i") }
      val trRow = T.boundedCollect(
        base.agg(aggCols.head, aggCols.tail: _*), 1, "q335 ranks")(0)
      picks.zipWithIndex.map { case ((qp, r, eg, em), i) =>
        (qp, r, globalDigest.size.toLong, mergedDigest.size.toLong,
          eg, em, trRow.getLong(2 * i) - r, trRow.getLong(2 * i + 1) - r,
          if (eg == em) 1L else 0L)
      }.toDF("qpct", "r_target", "n_nodes_global", "n_nodes_merged",
        "est_global", "est_merged", "err_global", "err_merged",
        "same_pick")
    }),

    // ---- q-digest quantile synopsis + accuracy audit -----------------
    // [Shrivastava, Buragohain, Agrawal & Suri, SenSys'04] the
    // MERGEABLE quantile synopsis completing the sketch family (KMV
    // q43, CMS q112, Bloom q119, HLL q214, CountSketch q287): unlike
    // q80's fixed histogram, the q-digest ADAPTS — dense value regions
    // keep leaf resolution, sparse regions collapse upward, and the
    // rank error is bounded by levels·⌊n/k⌋ AT LEAF RESOLUTION (the
    // provable invariant, QdigestPropertySpec: r ≤ true_rank ≤
    // r − 1 + 8t + picked-node mass — a single heavy leaf's mass is
    // the irreducible value-granularity term; the report's bound
    // column is the smooth-data 8t dial, measured to hold here).
    // Universe: 256 leaves of 262,144 cents over
    // o_totalprice; compression (k = 32 — measured 191 → 48 nodes at
    // sf0.01 with realized errors 40× inside the bound): bottom-up over the 8
    // levels, a sibling family folds into its parent while the family
    // total stays under t = ⌊n/32⌋ — a deterministic function of the
    // leaf histogram, replayed identically by the oracle's 8
    // materialized rounds. Quantile query: walk nodes by (right
    // endpoint, level, idx), first prefix ≥ ⌈q·n⌉. The audit carries
    // est vs exact (banded rank select — row_number only inside the
    // ≤4 hit leaves, the bandedMedMad2 discipline), the realized
    // signed rank error, and the 8t theoretical bound as columns.
    // Scale: ONE corpus agg builds the 256-leaf histogram (map-side
    // combinable; the synopsis is the point — leaf counts are
    // linear-mergeable across shards/batches, which s43 exercises);
    // compression + walk fold over ≤511 bounded rows on the driver.
    "q332_qdigest_quantiles" -> ((s, d) => {
      import s.implicits._
      val cents = T.orders(s, d)
        .select(expr(Exact.centsSql("o_totalprice")).as("c"))
      qdigestReport(
        cents.select(least(expr("c div 262144"), lit(255L)).as("leaf"))
          .groupBy($"leaf").agg(count(lit(1)).as("cnt")),
        cents)
    }))

  /** q332's core: compress a (leaf, cnt) histogram into a q-digest,
    * answer the quantile grid from the digest, and audit against the
    * exact banded rank select over `cents` (a 1-column (c) frame).
    * Factored so s43 can feed the MERGED per-batch leaf histograms —
    * leaf counts are linear, so the streamed merge is exact and the
    * whole report reproduces. Compression and walk are driver folds
    * over ≤511 rows, bounded by the UNIVERSE (256 leaves), never the
    * corpus — the q305 boundedCollect discipline. */
  private[operators] def qdigestReport(leaves: DataFrame, cents: DataFrame): DataFrame = {
    val s = leaves.sparkSession
    import s.implicits._
    val leafW = 262144L
    val leafRows = T.boundedCollect(leaves, 256, "q332 leaf histogram")
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val n = leafRows.map(_._2).sum
    val t = math.max(1L, n / 32L)
    val state = qdigestCompress(leafRows, t)
    val nNodes = state.size.toLong
    val targets = Seq(25L, 50L, 75L, 90L)
    val picks = targets.map { qp =>
      val r = (n * qp + 99L) / 100L
      (qp, r, (qdigestPickHiLeaf(state, r) + 1) * leafW - 1L)
    }
    // exact rank select: the hit leaf comes from the driver prefix,
    // row_number runs only INSIDE hit leaves (bandedMedMad2's rule)
    val prefix = leafRows.scanLeft(0L)(_ + _._2).init.zip(leafRows)
    val hitFor = targets.map { qp =>
      val r = (n * qp + 99L) / 100L
      val (before, (leaf, _)) =
        prefix.find { case (b, (_, c)) => b + c >= r }.get
      (qp, leaf, r - before)
    }
    val hitLeaves = hitFor.map(_._2).distinct
    val exacts = T.boundedCollect(
      cents.withColumn("leaf", least(expr("c div 262144"), lit(255L)))
        .filter($"leaf".isin(hitLeaves: _*))
        .withColumn("rn", row_number().over(
          Window.partitionBy($"leaf").orderBy($"c")).cast("long"))
        .join(hitFor.toDF("qpct", "leaf", "rn"), Seq("leaf", "rn"))
        .select($"qpct", $"c"),
      4, "q332 exact quantiles")
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // realized rank of each estimate: one corpus agg, 4 literal cuts
    val trAgg = cents.agg(
      sum(($"c" <= picks.head._3).cast("long")).as("t0"),
      picks.tail.zipWithIndex.map { case ((_, _, est), i) =>
        sum(($"c" <= est).cast("long")).as(s"t${i + 1}") }: _*)
    val trRow = T.boundedCollect(trAgg, 1, "q332 realized ranks")(0)
    val trueRanks = picks.indices.map(i => trRow.getLong(i))
    picks.zipWithIndex.map { case ((qp, r, est), i) =>
      val tr = trueRanks(i)
      (qp, r, nNodes, est, exacts(qp), tr, tr - r, 8L * t,
        if (math.abs(tr - r) <= 8L * t) 1L else 0L)
    }.toDF("qpct", "r_target", "n_nodes", "est_cents", "exact_cents",
      "true_rank", "rank_err", "bound", "within_bound")
  }

  /** q332's pure compression fold — bottom-up over the 8 levels of a
    * 256-leaf universe: pass p folds level p−1 sibling families of
    * total mass < t into their level-p parent. A deterministic
    * function of the histogram alone; QdigestPropertySpec drives it
    * over random histograms (mass conservation, the levels·t rank
    * bound, merge = sum-then-compress). State key = (level, idx). */
  private[graft] def qdigestCompress(leafRows: Seq[(Long, Long)],
      t: Long): Map[(Int, Long), Long] =
    qdigestCompressState(
      leafRows.map { case (idx, c) => ((0, idx), c) }.toMap, t)

  /** [[qdigestCompress]] from an arbitrary node state — the MERGE
    * path (q335): a union of shard digests holds nodes at mixed
    * levels; pass p still only folds level p−1 families, so
    * higher-level nodes ride through until their own pass. Summing
    * counts at matching (level, idx) keys then recompressing is the
    * standard q-digest merge. */
  private[graft] def qdigestCompressState(init: Map[(Int, Long), Long],
      t: Long): Map[(Int, Long), Long] = {
    var state = init
    for (p <- 1 to 8) {
      val (lvlNodes, rest0) = state.partition(_._1._1 == p - 1)
      // family total INCLUDES a pre-existing parent (only possible on
      // the merge path) — the canonical q-digest condition; on the
      // leaf path parents never pre-exist, so qdigestCompress's
      // behavior is unchanged
      val merged = lvlNodes.groupBy(_._1._2 / 2)
        .map { case (pidx, m) =>
          pidx -> (m.values.sum + rest0.getOrElse((p, pidx), 0L)) }
        .filter(_._2 < t)
      val kept = lvlNodes.filterNot { case ((_, idx), _) =>
        merged.contains(idx / 2) }
      val rest = rest0 -- merged.keys.map(pidx => (p, pidx))
      state = rest ++ kept ++
        merged.map { case (pidx, fc) => ((p, pidx), fc) }
    }
    state
  }

  /** q332's pure quantile walk: nodes by (right endpoint, level,
    * idx), first cumulative mass ≥ r; returns the picked node's
    * right-endpoint LEAF index (the caller scales to a value). */
  private[graft] def qdigestPickHiLeaf(state: Map[(Int, Long), Long],
      r: Long): Long = {
    val nodes = state.toSeq
      .map { case ((lvl, idx), c) =>
        ((idx + 1) * (1L << lvl) - 1, lvl, idx, c) }
      .sortBy { case (hi, lvl, idx, _) => (hi, lvl.toLong, idx) }
    val cums = nodes.scanLeft(0L)(_ + _._4).tail.zip(nodes)
    cums.find(_._1 >= r).get._2._1
  }

  /** q214's sketched relation: (event_type, user_id) from orders. */
  private[operators] def hllInput(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    T.orders(s, d)
      .select($"o_orderstatus".as("event_type"),
        $"o_custkey".as("user_id"))
  }

  /** Per-(event_type, register-index) HLL register bank of `ev` —
    * q214's core, factored so s42 can build it PER MICRO-BATCH: the
    * register value is a MAX over member hashes, so the bank is
    * order-invariant, duplicate-invariant, and merges across batches
    * by plain register max — the canonical mergeable sketch. */
  private[operators] def hllRegisters(ev: DataFrame): DataFrame = {
    val s = ev.sparkSession
    import s.implicits._
    GraftExtensions.ensureRegistered(s)
    hllRegisterRows(
      ev.distinct().select($"event_type", h60($"user_id").as("h")),
      "event_type")
  }

  /** q214's estimate-vs-exact report from a register bank: the
    * ALL_UNION scope is register max across types (merge, don't
    * recount), the estimate is the integer-exact HLL formula, the
    * exact side recomputes from `ev`. */
  /** The integer-exact m = 32 HLL estimate per key from a (key, j,
    * reg) register bank — q214's formula, factored so the s48
    * profile monitor's HLL column class renders the SAME expressions
    * (the Events.haarReport rule). Output: (key, est_hll). */
  private[operators] def hllEstimate(regs: DataFrame, key: String): DataFrame = {
    val s = regs.sparkSession
    import s.implicits._
    regs.groupBy(col(key))
      .agg(count(lit(1)).as("n_regs"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(56 - reg AS INT))"))
          .as("s_present"))
      .select(col(key),
        ($"s_present" +
          (lit(32L) - $"n_regs") * lit(72057594037927936L)).as("s"))
      .select(col(key),
        expr("(CAST(697000 AS DECIMAL(38,0)) * 1024 * 72057594037927936)" +
          " div (CAST(s AS DECIMAL(38,0)) * 1000000)").cast("long")
          .as("est_hll"))
  }

  /** h60 → (j, rank) register rows for the m = 32 HLL bank, keyed by
    * `key` — the per-value map side of [[hllEstimate]], factored for
    * the same streaming-twin reason. Input: (key, h) hashed values. */
  private[operators] def hllRegisterRows(hashed: DataFrame, key: String): DataFrame = {
    val s = hashed.sparkSession
    import s.implicits._
    hashed
      .select(col(key),
        expr("h div 36028797018963968").as("j"),
        expr("h % 36028797018963968").as("w"))
      .select(col(key), $"j",
        expr("CASE WHEN w = 0 THEN 56 ELSE 55 - (length(bin(w)) - 1) END")
          .cast("long").as("rank"))
      .groupBy(col(key), $"j").agg(max($"rank").as("reg"))
  }

  private[operators] def hllReport(regs: DataFrame, ev: DataFrame): DataFrame = {
    val s = regs.sparkSession
    import s.implicits._
    val regsAll = regs.unionAll(
      regs.groupBy($"j").agg(max($"reg").as("reg"))
        .select(lit("ALL_UNION").as("event_type"), $"j", $"reg"))
    val est = hllEstimate(regsAll, "event_type")
    val exact = ev.groupBy($"event_type")
      .agg(countDistinct($"user_id").as("n_exact"))
      .unionAll(ev.agg(countDistinct($"user_id").as("n_exact"))
        .select(lit("ALL_UNION").as("event_type"), $"n_exact"))
    est.join(exact, "event_type")
      .select($"event_type".as("scope"), $"n_exact", $"est_hll",
        expr("(abs(est_hll - n_exact) * 1000000L) div n_exact")
          .as("err_ppm"))
  }

  def oracles: Map[String, String] = Map(
    // three materialized compression chains (per-shard with its own
    // t_s, the parent-inclusive merge recompress, the global
    // reference) + two walks — identical folds, ranks, and tie-breaks
    "q335_qdigest_merge_audit" -> {
      val shardPasses = (1 to 8).map { p =>
        s"""fS$p AS MATERIALIZED (
           |  SELECT shard, idx // 2 AS pidx, sum(cnt) AS fc
           |  FROM sS${p - 1} WHERE lvl = ${p - 1} GROUP BY 1, 2),
           |sS$p AS MATERIALIZED (
           |  SELECT shard, lvl, idx, cnt FROM sS${p - 1} WHERE lvl != ${p - 1}
           |  UNION ALL
           |  SELECT z.shard, z.lvl, z.idx, z.cnt FROM sS${p - 1} z
           |    JOIN fS$p f ON f.shard = z.shard AND z.idx // 2 = f.pidx
           |    JOIN tts ON tts.shard = z.shard
           |    WHERE z.lvl = ${p - 1} AND f.fc >= tts.t
           |  UNION ALL
           |  SELECT f.shard, $p AS lvl, f.pidx AS idx, CAST(f.fc AS BIGINT) AS cnt
           |  FROM fS$p f JOIN tts ON tts.shard = f.shard WHERE f.fc < tts.t)"""
          .stripMargin
      }.mkString(",\n")
      val mergePasses = (1 to 8).map { p =>
        s"""fM$p AS MATERIALIZED (
           |  SELECT c.pidx, c.sc + coalesce(pp.cnt, 0) AS fc
           |  FROM (SELECT idx // 2 AS pidx, sum(cnt) AS sc
           |        FROM m${p - 1} WHERE lvl = ${p - 1} GROUP BY 1) c
           |  LEFT JOIN m${p - 1} pp ON pp.lvl = $p AND pp.idx = c.pidx),
           |m$p AS MATERIALIZED (
           |  SELECT z.lvl, z.idx, z.cnt FROM m${p - 1} z CROSS JOIN tt
           |  WHERE z.lvl != ${p - 1} AND NOT (z.lvl = $p AND EXISTS (
           |    SELECT 1 FROM fM$p f WHERE f.pidx = z.idx AND f.fc < tt.t))
           |  UNION ALL
           |  SELECT z.lvl, z.idx, z.cnt FROM m${p - 1} z
           |    JOIN fM$p f ON z.idx // 2 = f.pidx CROSS JOIN tt
           |    WHERE z.lvl = ${p - 1} AND f.fc >= tt.t
           |  UNION ALL
           |  SELECT $p AS lvl, f.pidx AS idx, CAST(f.fc AS BIGINT) AS cnt
           |  FROM fM$p f CROSS JOIN tt WHERE f.fc < tt.t)""".stripMargin
      }.mkString(",\n")
      val globPasses = (1 to 8).map { p =>
        s"""fG$p AS MATERIALIZED (
           |  SELECT idx // 2 AS pidx, sum(cnt) AS fc
           |  FROM g${p - 1} WHERE lvl = ${p - 1} GROUP BY 1),
           |g$p AS MATERIALIZED (
           |  SELECT lvl, idx, cnt FROM g${p - 1} WHERE lvl != ${p - 1}
           |  UNION ALL
           |  SELECT z.lvl, z.idx, z.cnt FROM g${p - 1} z
           |    JOIN fG$p f ON z.idx // 2 = f.pidx CROSS JOIN tt
           |    WHERE z.lvl = ${p - 1} AND f.fc >= tt.t
           |  UNION ALL
           |  SELECT $p AS lvl, f.pidx AS idx, CAST(f.fc AS BIGINT) AS cnt
           |  FROM fG$p f CROSS JOIN tt WHERE f.fc < tt.t)""".stripMargin
      }.mkString(",\n")
      def walk(src: String, a: String) =
        s"""w$a AS (
           |  SELECT lvl, idx, cnt, (idx + 1) * (1 << lvl) - 1 AS hi_leaf,
           |    CAST(sum(cnt) OVER (ORDER BY (idx + 1) * (1 << lvl) - 1, lvl, idx
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           |      AS cum
           |  FROM $src),
           |p$a AS (
           |  SELECT qpct, r, est FROM (
           |    SELECT tr.qpct, tr.r,
           |      CAST((w.hi_leaf + 1) * 262144 - 1 AS BIGINT) AS est,
           |      row_number() OVER (PARTITION BY tr.qpct
           |        ORDER BY w.hi_leaf, w.lvl, w.idx) AS rn
           |    FROM tr JOIN w$a w ON w.cum >= tr.r) z WHERE rn = 1)"""
          .stripMargin
      s"""WITH cents AS MATERIALIZED (
         |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c,
         |    CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15)
         |      AS BIGINT) % 5 AS shard
         |  FROM orders),
         |sS0 AS MATERIALIZED (
         |  SELECT shard, 0 AS lvl, least(c // 262144, 255) AS idx,
         |    count(*) AS cnt
         |  FROM cents GROUP BY 1, 3),
         |tts AS MATERIALIZED (
         |  SELECT shard, greatest(1, sum(cnt) // 32) AS t FROM sS0 GROUP BY 1),
         |nn AS (SELECT count(*) AS n FROM cents),
         |tt AS MATERIALIZED (SELECT greatest(1, n // 32) AS t, n FROM nn),
         |$shardPasses,
         |m0 AS MATERIALIZED (
         |  SELECT lvl, idx, CAST(sum(cnt) AS BIGINT) AS cnt
         |  FROM sS8 GROUP BY 1, 2),
         |$mergePasses,
         |g0 AS MATERIALIZED (
         |  SELECT 0 AS lvl, least(c // 262144, 255) AS idx, count(*) AS cnt
         |  FROM cents GROUP BY 2),
         |$globPasses,
         |targets(qpct) AS (VALUES (25), (50), (75), (90)),
         |tr AS (SELECT CAST(qpct AS BIGINT) AS qpct,
         |  CAST((n * qpct + 99) // 100 AS BIGINT) AS r
         |  FROM targets CROSS JOIN tt),
         |ng AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes_global FROM g8),
         |nm AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes_merged FROM m8),
         |${walk("g8", "G")},
         |${walk("m8", "M")},
         |tg AS (SELECT p.qpct, CAST(count(*) AS BIGINT) AS rk
         |  FROM pG p JOIN cents ON cents.c <= p.est GROUP BY 1),
         |tm AS (SELECT p.qpct, CAST(count(*) AS BIGINT) AS rk
         |  FROM pM p JOIN cents ON cents.c <= p.est GROUP BY 1)
         |SELECT pG.qpct, pG.r AS r_target, ng.n_nodes_global,
         |  nm.n_nodes_merged, pG.est AS est_global, pM.est AS est_merged,
         |  tg.rk - pG.r AS err_global, tm.rk - pM.r AS err_merged,
         |  CAST(pG.est = pM.est AS BIGINT) AS same_pick
         |FROM pG JOIN pM USING (qpct) JOIN tg USING (qpct) JOIN tm USING (qpct)
         |CROSS JOIN ng CROSS JOIN nm""".stripMargin
    },

    // the 8 compression passes unrolled and materialized (the q195
    // CTE rule); identical fold rule, walk order, and rank selects
    "q332_qdigest_quantiles" -> {
      val passes = (1 to 8).map { p =>
        s"""f$p AS MATERIALIZED (
           |  SELECT idx // 2 AS pidx, sum(cnt) AS fc
           |  FROM s${p - 1} WHERE lvl = ${p - 1} GROUP BY 1),
           |s$p AS MATERIALIZED (
           |  SELECT lvl, idx, cnt FROM s${p - 1} WHERE lvl != ${p - 1}
           |  UNION ALL
           |  SELECT z.lvl, z.idx, z.cnt FROM s${p - 1} z
           |    JOIN f$p f ON z.idx // 2 = f.pidx
           |    CROSS JOIN tt WHERE z.lvl = ${p - 1} AND f.fc >= tt.t
           |  UNION ALL
           |  SELECT $p AS lvl, f.pidx AS idx, CAST(f.fc AS BIGINT) AS cnt
           |  FROM f$p f CROSS JOIN tt WHERE f.fc < tt.t)""".stripMargin
      }.mkString(",\n")
      s"""WITH cents AS MATERIALIZED (
         |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c FROM orders),
         |nn AS (SELECT count(*) AS n FROM cents),
         |tt AS MATERIALIZED (SELECT greatest(1, n // 32) AS t, n FROM nn),
         |s0 AS MATERIALIZED (
         |  SELECT 0 AS lvl, least(c // 262144, 255) AS idx, count(*) AS cnt
         |  FROM cents GROUP BY 2),
         |$passes,
         |nodes AS (
         |  SELECT lvl, idx, cnt, (idx + 1) * (1 << lvl) - 1 AS hi_leaf
         |  FROM s8),
         |w AS (SELECT lvl, idx, cnt, hi_leaf,
         |  CAST(sum(cnt) OVER (ORDER BY hi_leaf, lvl, idx
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |    AS cum
         |  FROM nodes),
         |nsz AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM s8),
         |targets(qpct) AS (VALUES (25), (50), (75), (90)),
         |tr AS (SELECT CAST(qpct AS BIGINT) AS qpct,
         |  CAST((n * qpct + 99) // 100 AS BIGINT) AS r
         |  FROM targets CROSS JOIN tt),
         |pick AS (
         |  SELECT qpct, r, est_cents FROM (
         |    SELECT tr.qpct, tr.r,
         |      CAST((w.hi_leaf + 1) * 262144 - 1 AS BIGINT) AS est_cents,
         |      row_number() OVER (PARTITION BY tr.qpct
         |        ORDER BY w.hi_leaf, w.lvl, w.idx) AS rn
         |    FROM tr JOIN w ON w.cum >= tr.r) z WHERE rn = 1),
         |truerk AS (
         |  SELECT p.qpct, CAST(count(*) AS BIGINT) AS true_rank
         |  FROM pick p JOIN cents ON cents.c <= p.est_cents GROUP BY 1),
         |exact AS (
         |  SELECT qpct, c AS exact_cents FROM (
         |    SELECT tr.qpct, s.c, tr.r,
         |      row_number() OVER (PARTITION BY tr.qpct ORDER BY s.c) AS rn
         |    FROM tr CROSS JOIN cents s) z WHERE rn = r)
         |SELECT p.qpct, p.r AS r_target, nsz.n_nodes, p.est_cents,
         |  e.exact_cents, k.true_rank, k.true_rank - p.r AS rank_err,
         |  CAST(8 * tt.t AS BIGINT) AS bound,
         |  CAST(abs(k.true_rank - p.r) <= 8 * tt.t AS BIGINT) AS within_bound
         |FROM pick p JOIN exact e USING (qpct) JOIN truerk k USING (qpct)
         |CROSS JOIN nsz CROSS JOIN tt""".stripMargin
    },

    // same k-min construction as q43's oracle, kept as raw lists for
    // the pair algebra; estimate formulas are the same double text as
    // the Spark side (IEEE-identical over identical int inputs)
    "q153_kmv_set_ops" ->
      """WITH h AS (
        |  SELECT DISTINCT event_type,
        |    CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS hv
        |  FROM events),
        |r AS (
        |  SELECT event_type, hv,
        |    row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
        |  FROM h),
        |sk AS (
        |  SELECT event_type, list(hv ORDER BY hv) AS sk
        |  FROM r WHERE rn <= 64 GROUP BY event_type),
        |p AS (
        |  SELECT a.event_type AS ta, a.sk AS ska, b.event_type AS tb, b.sk AS skb
        |  FROM sk a JOIN sk b ON a.event_type < b.event_type),
        |c1 AS (
        |  SELECT ta, tb, ska, skb,
        |    list_sort(list_distinct(list_concat(ska, skb))) AS lu
        |  FROM p),
        |c2 AS (
        |  SELECT ta, tb, ska, skb,
        |    CAST(len(lu) AS BIGINT) AS ulen,
        |    least(CAST(len(lu) AS BIGINT), 64) AS m,
        |    lu[CAST(least(len(lu), 64) AS INT)] AS kth
        |  FROM c1),
        |c3 AS (
        |  SELECT ta, tb, m, kth,
        |    CASE WHEN ulen < 64 THEN CAST(ulen AS DOUBLE)
        |         ELSE 63.0 * 1152921504606846976 / kth END AS est_union,
        |    CAST(len(list_filter(list_intersect(ska, skb), x -> x <= kth)) AS BIGINT)
        |      AS n_common
        |  FROM c2)
        |SELECT ta, tb, m, n_common,
        |  round(est_union, 4) AS est_union,
        |  round(CAST(n_common AS DOUBLE) * est_union / CAST(m AS DOUBLE), 4) AS est_inter
        |FROM c3""".stripMargin,

    // q153's sketch CTEs + the exact pairwise baseline; the audit's
    // error column uses the ROUNDED estimate, same as the Spark side
    "q157_kmv_overlap_audit" ->
      """WITH h AS (
        |  SELECT DISTINCT event_type,
        |    CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS hv
        |  FROM events),
        |r AS (
        |  SELECT event_type, hv,
        |    row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
        |  FROM h),
        |sk AS (
        |  SELECT event_type, list(hv ORDER BY hv) AS sk
        |  FROM r WHERE rn <= 64 GROUP BY event_type),
        |p AS (
        |  SELECT a.event_type AS ta, a.sk AS ska, b.event_type AS tb, b.sk AS skb
        |  FROM sk a JOIN sk b ON a.event_type < b.event_type),
        |c1 AS (
        |  SELECT ta, tb, ska, skb,
        |    list_sort(list_distinct(list_concat(ska, skb))) AS lu
        |  FROM p),
        |c2 AS (
        |  SELECT ta, tb, ska, skb,
        |    CAST(len(lu) AS BIGINT) AS ulen,
        |    least(CAST(len(lu) AS BIGINT), 64) AS m,
        |    lu[CAST(least(len(lu), 64) AS INT)] AS kth
        |  FROM c1),
        |c3 AS (
        |  SELECT ta, tb, m, kth,
        |    CASE WHEN ulen < 64 THEN CAST(ulen AS DOUBLE)
        |         ELSE 63.0 * 1152921504606846976 / kth END AS est_union,
        |    CAST(len(list_filter(list_intersect(ska, skb), x -> x <= kth)) AS BIGINT)
        |      AS n_common
        |  FROM c2),
        |esr AS (
        |  SELECT ta, tb, round(est_union, 4) AS est_union,
        |    round(CAST(n_common AS DOUBLE) * est_union / CAST(m AS DOUBLE), 4)
        |      AS est_inter
        |  FROM c3),
        |du AS (SELECT DISTINCT event_type, user_id FROM events),
        |na AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM du GROUP BY 1),
        |xi AS (
        |  SELECT a.event_type AS ta, b.event_type AS tb,
        |    CAST(count(*) AS BIGINT) AS inter
        |  FROM du a JOIN du b ON a.user_id = b.user_id
        |    AND a.event_type < b.event_type
        |  GROUP BY 1, 2),
        |ex AS (
        |  SELECT esr.ta, esr.tb, esr.est_union, esr.est_inter,
        |    coalesce(xi.inter, 0) AS inter,
        |    na1.n + na2.n - coalesce(xi.inter, 0) AS uni
        |  FROM esr LEFT JOIN xi ON xi.ta = esr.ta AND xi.tb = esr.tb
        |    JOIN na na1 ON na1.event_type = esr.ta
        |    JOIN na na2 ON na2.event_type = esr.tb)
        |SELECT ta, tb, inter, uni, est_union, est_inter,
        |  round(abs(est_union - uni) * 1000000 / uni, 2) AS union_err_ppm
        |FROM ex""".stripMargin,

    "q83_table_checksum" ->
      """SELECT 'orders' AS table_name, count(*) AS n_rows,
        |  bit_xor(CAST('0x' || substr(md5(
        |    CAST(o_orderkey AS VARCHAR) || '|' || CAST(o_custkey AS VARCHAR)
        |    || '|' || CAST(CAST(round(o_totalprice*100) AS BIGINT) AS VARCHAR)
        |    || '|' || CAST(CAST(epoch(o_orderdate) AS BIGINT) AS VARCHAR)
        |  ), 1, 15) AS BIGINT)) AS xor_fp
        |FROM orders
        |UNION ALL
        |SELECT 'lineitem', count(*),
        |  bit_xor(CAST('0x' || substr(md5(
        |    CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR)
        |    || '|' || CAST(CAST(l_quantity AS BIGINT) AS VARCHAR)
        |    || '|' || CAST(CAST(round(l_extendedprice*100) AS BIGINT) AS VARCHAR)
        |  ), 1, 15) AS BIGINT))
        |FROM lineitem
        |UNION ALL
        |SELECT 'customer', count(*),
        |  bit_xor(CAST('0x' || substr(md5(
        |    CAST(c_custkey AS VARCHAR) || '|' || c_name
        |    || '|' || CAST(CAST(round(c_acctbal*100) AS BIGINT) AS VARCHAR)
        |  ), 1, 15) AS BIGINT))
        |FROM customer""".stripMargin,

    "q43_kmv_distinct" ->
      """WITH h AS (
        |  SELECT DISTINCT event_type,
        |    CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS hv
        |  FROM events),
        |r AS (
        |  SELECT event_type, hv,
        |    row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS cnt
        |  FROM h)
        |SELECT event_type,
        |  round(CASE WHEN cnt < 64 THEN CAST(cnt AS DOUBLE)
        |             ELSE 63.0 * 1152921504606846976 / hv END, 4) AS est_distinct,
        |  cnt AS true_distinct
        |FROM r WHERE (cnt < 64 AND rn = cnt) OR (cnt >= 64 AND rn = 64)""".stripMargin,

    "q127_corrupt_records" ->
      """SELECT count(*) AS n_total,
        |  CAST(sum(CASE WHEN event_id % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_corrupt,
        |  count(DISTINCT CASE WHEN event_id % 10 != 0 THEN event_type END)
        |    AS n_types_valid
        |FROM events""".stripMargin,

    "q122_table_diff" ->
      s"""WITH base AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS st,
        |    ${Exact.centsSql("o_totalprice")} AS pc
        |  FROM orders),
        |b AS (
        |  SELECT k, st, CASE WHEN k % 97 = 0 THEN pc + 1 ELSE pc END AS pc
        |  FROM base WHERE k % 101 != 0),
        |fa AS (
        |  SELECT k, CAST('0x' || substr(md5(CAST(k AS VARCHAR) || '|' || st
        |    || '|' || CAST(pc AS VARCHAR)), 1, 15) AS BIGINT) AS fp
        |  FROM base),
        |fb AS (
        |  SELECT k, CAST('0x' || substr(md5(CAST(k AS VARCHAR) || '|' || st
        |    || '|' || CAST(pc AS VARCHAR)), 1, 15) AS BIGINT) AS fp
        |  FROM b)
        |SELECT CASE WHEN fb.k IS NULL THEN 'only_in_a'
        |            WHEN fa.fp = fb.fp THEN 'equal'
        |            ELSE 'changed' END AS diff_status, count(*) AS n
        |FROM fa FULL OUTER JOIN fb ON fa.k = fb.k
        |GROUP BY 1""".stripMargin,

    "q311_bloom_size_tune" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST('0x' || substr(md5(
        |      array_to_string(string_split(text, ' ')[1:3], ' ')), 1, 15)
        |      AS BIGINT) AS fp,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) % 10 = 0 AS is_strm
        |  FROM documents),
        |ix AS (SELECT doc_id, fp FROM d WHERE NOT is_strm),
        |strm AS (SELECT doc_id, fp FROM d WHERE is_strm),
        |ms AS (SELECT unnest([256, 1024, 4096]) AS m),
        |ipos AS (
        |  SELECT DISTINCT ms.m,
        |    CAST('0x' || substr(md5(CAST(k.i AS VARCHAR) || '|'
        |      || CAST(fp AS VARCHAR)), 1, 15) AS BIGINT) % ms.m AS pos
        |  FROM ix CROSS JOIN (VALUES (0), (1), (2)) AS k(i) CROSS JOIN ms),
        |sp AS (
        |  SELECT ms.m, doc_id, fp, k.i,
        |    CAST('0x' || substr(md5(CAST(k.i AS VARCHAR) || '|'
        |      || CAST(fp AS VARCHAR)), 1, 15) AS BIGINT) % ms.m AS pos
        |  FROM strm CROSS JOIN (VALUES (0), (1), (2)) AS k(i)
        |  CROSS JOIN ms),
        |maybe AS (
        |  SELECT sp.m, sp.doc_id, sp.fp,
        |    sum(CASE WHEN EXISTS (SELECT 1 FROM ipos
        |      WHERE ipos.m = sp.m AND ipos.pos = sp.pos)
        |      THEN 1 ELSE 0 END) = 3 AS bm
        |  FROM sp GROUP BY 1, 2, 3),
        |truth AS (
        |  SELECT s.doc_id,
        |    EXISTS (SELECT 1 FROM ix WHERE ix.fp = s.fp) AS is_dup
        |  FROM strm s),
        |scored AS (
        |  SELECT maybe.m, CAST(count(*) AS BIGINT) AS n_probe,
        |    CAST(sum(CASE WHEN NOT t.is_dup THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_neg,
        |    CAST(sum(CASE WHEN maybe.bm AND NOT t.is_dup THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_fp
        |  FROM maybe JOIN truth t ON maybe.doc_id = t.doc_id GROUP BY 1),
        |sc2 AS (
        |  SELECT m, n_probe, n_neg, n_fp,
        |    CAST(n_fp * 1000000 // n_neg AS BIGINT) AS fpr_ppm
        |  FROM scored),
        |chosen AS (
        |  SELECT CAST(COALESCE(min(m), 0) AS BIGINT) AS cm
        |  FROM sc2 WHERE fpr_ppm <= 100000)
        |SELECT CAST(s.m AS BIGINT) AS m_bits, s.n_probe, s.n_neg, s.n_fp,
        |  s.fpr_ppm,
        |  CAST(CASE WHEN s.fpr_ppm <= 100000 THEN 1 ELSE 0 END AS BIGINT)
        |    AS meets_target,
        |  CAST(CASE WHEN s.m = chosen.cm THEN 1 ELSE 0 END AS BIGINT)
        |    AS chosen,
        |  CAST(CASE WHEN s.m = 1024 THEN 1 ELSE 0 END AS BIGINT)
        |    AS shipped_in_s35
        |FROM sc2 s CROSS JOIN chosen""".stripMargin,

    "q119_bloom_prune" ->
      """WITH active AS (
        |  SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995),
        |ap AS (
        |  SELECT CAST('0x' || substr(md5(CAST(k.i AS VARCHAR) || '|'
        |      || CAST(o_custkey AS VARCHAR)), 1, 15) AS BIGINT) % 4096 AS idx
        |  FROM active CROSS JOIN (VALUES (0), (1), (2)) AS k(i)),
        |bloom AS (
        |  SELECT CAST(idx // 62 AS INT) AS word_i,
        |    bit_or(CAST(1 AS BIGINT) << CAST(idx % 62 AS INT)) AS bits
        |  FROM ap GROUP BY 1),
        |cp AS (
        |  SELECT c_custkey, c_mktsegment, CAST(idx // 62 AS INT) AS word_i,
        |    CAST(1 AS BIGINT) << CAST(idx % 62 AS INT) AS m
        |  FROM (
        |    SELECT c_custkey, c_mktsegment,
        |      CAST('0x' || substr(md5(CAST(k.i AS VARCHAR) || '|'
        |        || CAST(c_custkey AS VARCHAR)), 1, 15) AS BIGINT) % 4096 AS idx
        |    FROM customer CROSS JOIN (VALUES (0), (1), (2)) AS k(i)) t),
        |mb AS (
        |  SELECT c_custkey, c_mktsegment,
        |    sum(CASE WHEN (COALESCE(b.bits, 0) & m) != 0 THEN 1 ELSE 0 END) = 3 AS maybe
        |  FROM cp LEFT JOIN bloom b USING (word_i) GROUP BY 1, 2)
        |SELECT c_mktsegment, count(*) AS n_cust,
        |  CAST(sum(CASE WHEN maybe THEN 1 ELSE 0 END) AS BIGINT) AS n_maybe,
        |  CAST(sum(CASE WHEN c_custkey IN (SELECT o_custkey FROM active)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_true
        |FROM mb GROUP BY c_mktsegment""".stripMargin,

    "q112_cms_heavyhitters" ->
      """WITH words AS (
        |  SELECT unnest(string_split(text, ' ')) AS w FROM documents),
        |counts AS (SELECT w, count(*) AS n FROM words GROUP BY w),
        |probes AS (
        |  SELECT w, n, k.r AS r,
        |    CAST('0x' || substr(md5(CAST(k.r AS VARCHAR) || '|' || w), 1, 15)
        |      AS BIGINT) % 256 AS b
        |  FROM counts CROSS JOIN (VALUES (0), (1), (2), (3)) AS k(r)),
        |matrix AS (SELECT r, b, sum(n) AS c FROM probes GROUP BY r, b),
        |top AS (SELECT w, n FROM counts ORDER BY n DESC, w LIMIT 20)
        |SELECT t.w, t.n, CAST(min(m.c) AS BIGINT) AS cms_est
        |FROM top t JOIN probes p ON p.w = t.w
        |JOIN matrix m ON m.r = p.r AND m.b = p.b
        |GROUP BY t.w, t.n""".stripMargin,

    // same probe convention as q112 plus the sign hash; median of 4 =
    // floor-avg of the 2nd/3rd order statistics (both engines truncate
    // integer division toward zero, so negative sums agree)
    "q287_countsketch_audit" ->
      """WITH words AS (
        |  SELECT unnest(string_split(text, ' ')) AS w FROM documents),
        |counts AS (SELECT w, CAST(count(*) AS BIGINT) AS n
        |  FROM words GROUP BY w),
        |probes AS (
        |  SELECT w, n, k.r AS r,
        |    CAST('0x' || substr(md5(CAST(k.r AS VARCHAR) || '|' || w), 1, 15)
        |      AS BIGINT) % 256 AS b,
        |    CASE WHEN CAST('0x' || substr(md5('s#' || CAST(k.r AS VARCHAR)
        |      || '|' || w), 1, 15) AS BIGINT) % 2 = 0
        |      THEN 1 ELSE -1 END AS sgn
        |  FROM counts CROSS JOIN (VALUES (0), (1), (2), (3)) AS k(r)),
        |matrix AS (
        |  SELECT r, b, CAST(sum(sgn * n) AS BIGINT) AS c
        |  FROM probes GROUP BY r, b),
        |top AS (SELECT w, n FROM counts ORDER BY n DESC, w LIMIT 20),
        |est AS (
        |  SELECT t.w, t.n, p.sgn * m.c AS e,
        |    row_number() OVER (PARTITION BY t.w
        |      ORDER BY p.sgn * m.c, p.r) AS rk
        |  FROM top t JOIN probes p ON p.w = t.w
        |  JOIN matrix m ON m.r = p.r AND m.b = p.b)
        |SELECT w, n,
        |  CAST(sum(e) // 2 AS BIGINT) AS cs_est,
        |  CAST(abs(sum(e) // 2 - n) AS BIGINT) AS abs_err
        |FROM est WHERE rk IN (2, 3) GROUP BY w, n""".stripMargin,

    "q44_rolling_fingerprint" ->
      """SELECT doc_id,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, length(text) + 1),
        |    i -> ascii(substr(text, CAST(i AS INT), 1)))),
        |    (acc, x) -> (acc * 31 + x) % 1000000007) AS fp,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, length(lang) + 1),
        |    i -> ascii(substr(lang, CAST(i AS INT), 1)))),
        |    (acc, x) -> (acc * 31 + x) % 1000000007) AS lang_fp
        |FROM documents""".stripMargin,

    "q46_format_roundtrip" -> {
      val one = (fmt: String) =>
        s"""SELECT '$fmt' AS fmt, count(*) AS n, ${Exact.sumMoneySql("o_totalprice")} AS total
           |FROM orders WHERE o_orderkey < 1000""".stripMargin
      one("csv") + "\nUNION ALL\n" + one("json") + "\nUNION ALL\n" + one("orc")
    },

    // same register construction; the trailing merge replayed with a
    // RANGE frame and the exact audit via the 7-day explode
    "q272_hll_sliding" ->
      """WITH du AS (
        |  SELECT DISTINCT CAST(datediff('day', DATE '2024-01-01',
        |    CAST(ts AS DATE)) AS BIGINT) AS day, user_id
        |  FROM events),
        |h AS (
        |  SELECT day, CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)),
        |    1, 15) AS BIGINT) AS h
        |  FROM du),
        |regs AS (
        |  SELECT day, h // 36028797018963968 AS j,
        |    CAST(max(CASE WHEN h % 36028797018963968 = 0 THEN 56
        |      ELSE 55 - (length(bin(h % 36028797018963968)) - 1) END)
        |      AS BIGINT) AS reg
        |  FROM h GROUP BY 1, 2),
        |grid AS (
        |  SELECT d.day, r.j FROM (SELECT DISTINCT day FROM du) d
        |  CROSS JOIN (SELECT unnest(range(0, 32)) AS j) r),
        |dense AS (
        |  SELECT grid.day, grid.j, regs.reg FROM grid
        |  LEFT JOIN regs ON regs.day = grid.day AND regs.j = grid.j),
        |merged AS (
        |  SELECT day, j, CAST(max(reg) OVER (PARTITION BY j ORDER BY day
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS mreg
        |  FROM dense),
        |est AS (
        |  SELECT day, CAST(count(mreg) AS BIGINT) AS n_regs,
        |    CAST(coalesce(sum(CASE WHEN mreg IS NULL THEN NULL
        |      ELSE CAST(2 AS HUGEINT) ** CAST(56 - mreg AS INT) END), 0)
        |      AS HUGEINT) AS s_present
        |  FROM merged GROUP BY 1),
        |e2 AS (
        |  SELECT day, CAST((CAST(697000 AS HUGEINT) * 1024
        |      * 72057594037927936)
        |    // ((s_present + (32 - n_regs)
        |      * CAST(72057594037927936 AS HUGEINT)) * 1000000)
        |    AS BIGINT) AS est_hll
        |  FROM est),
        |ex AS (
        |  SELECT gday AS day, CAST(count(DISTINCT user_id) AS BIGINT)
        |    AS n_exact
        |  FROM (SELECT user_id, unnest(list_transform(range(0, 7),
        |      o -> day + o)) AS gday FROM du) x
        |  JOIN (SELECT DISTINCT day AS gd FROM du) g ON g.gd = x.gday
        |  GROUP BY 1)
        |SELECT e2.day, ex.n_exact, e2.est_hll,
        |  abs(e2.est_hll - ex.n_exact) * 1000000 // ex.n_exact AS err_ppm
        |FROM e2 JOIN ex ON ex.day = e2.day""".stripMargin,

    "q214_hll_distinct" ->
      """WITH du AS (
        |  SELECT DISTINCT o_orderstatus AS event_type, o_custkey AS user_id
        |  FROM orders),
        |hashed AS (
        |  SELECT event_type,
        |    CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) AS h
        |  FROM du),
        |ranked AS (
        |  SELECT event_type, h // 36028797018963968 AS j,
        |    CASE WHEN h % 36028797018963968 = 0 THEN 56
        |         ELSE 55 - (length(bin(h % 36028797018963968)) - 1)
        |    END AS rank
        |  FROM hashed),
        |regs AS (
        |  SELECT event_type, j, CAST(max(rank) AS BIGINT) AS reg
        |  FROM ranked GROUP BY 1, 2),
        |regs_all AS (
        |  SELECT * FROM regs
        |  UNION ALL
        |  SELECT 'ALL_UNION' AS event_type, j, CAST(max(reg) AS BIGINT) AS reg
        |  FROM regs GROUP BY j),
        |s AS (
        |  SELECT event_type,
        |    CAST(sum(CAST(1 AS BIGINT) << CAST(56 - reg AS INT)) AS BIGINT)
        |      + (32 - count(*)) * 72057594037927936 AS s
        |  FROM regs_all GROUP BY 1),
        |est AS (
        |  SELECT event_type,
        |    CAST((CAST(697000 AS HUGEINT) * 1024 * 72057594037927936)
        |      // (CAST(s AS HUGEINT) * 1000000) AS BIGINT) AS est_hll
        |  FROM s),
        |exact AS (
        |  SELECT o_orderstatus AS event_type,
        |    count(DISTINCT o_custkey) AS n_exact
        |  FROM orders GROUP BY 1
        |  UNION ALL
        |  SELECT 'ALL_UNION', count(DISTINCT o_custkey) FROM orders)
        |SELECT est.event_type AS scope, exact.n_exact, est.est_hll,
        |  CAST((abs(est.est_hll - exact.n_exact) * 1000000) // exact.n_exact
        |    AS BIGINT) AS err_ppm
        |FROM est JOIN exact ON est.event_type = exact.event_type""".stripMargin)
}
