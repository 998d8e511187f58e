package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables => T}

/** Deduplication operators — exact and near-duplicate — over `events`
  * and `documents` (the LLM-pipeline dedup surface, SURVEY §7.3).
  *
  * Near-dup is banded MinHash LSH end-to-end: shingle → k minhashes →
  * band buckets → candidate pairs ONLY within buckets → exact-Jaccard
  * verification of candidates. The plan never forms a cartesian
  * product: candidate generation is an equi-join on (band, minhash) and
  * verification is an equi-join of the candidate list back to the
  * shingle sets. The DuckDB oracle computes ground-truth all-pairs
  * Jaccard (affordable at verify scale only), so the gate also proves
  * the LSH recall: with k=32 independent bands a pair at the 0.5
  * threshold is missed with probability (1-j)^32 ≤ 2e-10.
  *
  * Scale notes (100 TB): exact dedup is one hash-groupBy shuffle;
  * minhash signatures shuffle on (doc, band) then candidates on
  * (band, hash) — bucket sizes are bounded by collision width, and a
  * skewed bucket (a boilerplate shingle) can be salted or dropped by a
  * document-frequency cap without changing the algorithm.
  */
object Dedup extends QueryPack {

  private[operators] val K = 32 // minhash functions = bands (r=1)

  /** Connected components by min-label propagation WITH pointer-
    * doubling shortcuts over an undirected edge list (columns `a`,
    * `b`), iterated to convergence.
    *
    * Each round does two monotone steps:
    *   1. propagate: lbl(v) ← min(lbl(v), min over neighbors' lbl) —
    *      one equi-join on the edge key + one min-agg;
    *   2. shortcut:  lbl(v) ← min(lbl(v), lbl(lbl(v))) — labels are
    *      vertex ids, so the label table self-joins as a pointer
    *      table (the path-halving step of the hash-to-min / pointer-
    *      doubling family, Rastogi et al., "Finding Connected
    *      Components in Map-Reduce in Logarithmic Rounds", ICDE'13).
    * Propagation alone needs diameter-many rounds — a 100 TB web-graph
    * chain of length 10^4 would mean 10^4 shuffles; the shortcut step
    * roughly halves every label path per round, so convergence is
    * O(log diameter) rounds for one extra bounded equi-join per round
    * (asserted on a deep chain in ExpressionSpec).
    *
    * Labels only ever decrease (lbl(v) ≤ v always, and both steps
    * take mins of existing labels), so an unchanged label SUM is a
    * fixed point; at a fixed point the PROPAGATION step changed
    * nothing, which is exactly the component-min condition — the
    * shortcut only accelerates, never alters, the answer. The
    * convergence probe is one scalar agg per round. Each round is
    * truncated with an eager localCheckpoint: the lineage doubles per
    * round and a lazy unrolled plan explodes exponentially in
    * Catalyst; checkpointing keeps every round one small job (the
    * GraphX-style iteration shape). `maxRounds` is a runaway guard,
    * not a tuning knob.
    *
    * Returns one row per vertex: (v, lbl) with lbl = min vertex id of
    * the component.
    */
  private[graft] def connectedComponents(pairs: DataFrame,
                                         maxRounds: Int = 64): DataFrame =
    connectedComponentsWithRounds(pairs, maxRounds)._1

  /** [[connectedComponents]] plus the number of rounds it took — the
    * log-diameter convergence claim is testable, not just asserted. */
  private[graft] def connectedComponentsWithRounds(
      pairs: DataFrame, maxRounds: Int = 64): (DataFrame, Int) = {
    val s = pairs.sparkSession
    import s.implicits._
    // checkpointed hash-partitioned + sorted on the join key: every
    // propagation round joins this table on `a`, and localCheckpoint
    // preserves the physical layout, so the per-round |2E|-row
    // exchange and sort vanish (the coocDir rule; partition count
    // follows spark.sql.shuffle.partitions — scale-adaptive)
    val edges = pairs.select($"a", $"b")
      .unionAll(pairs.select($"b".as("a"), $"a".as("b")))
      .repartition($"a").sortWithinPartitions($"a")
      .localCheckpoint(true)
    var labels = edges.select($"a".as("v")).distinct()
      .select($"v", $"v".as("lbl")).localCheckpoint(true)
    // decimal(38,0) probe: a Long sum of ~10^10 vertex ids overflows
    // (ANSI mode would throw; wrapping would unsound the fixed-point
    // test) — decimal keeps the monotone-sum argument valid at scale
    def probe(df: DataFrame): java.math.BigDecimal =
      df.agg(coalesce(sum($"lbl".cast("decimal(38,0)")),
        lit(0).cast("decimal(38,0)"))).head().getDecimal(0)
    var prevSum = probe(labels)
    var converged = false
    var rounds = 0
    while (!converged && rounds < maxRounds) {
      val prop = labels.join(edges, $"v" === $"a").select($"b".as("v"), $"lbl")
      // checkpointed: consumed by BOTH sides of the shortcut self-join.
      // Real-size-stats rebuild (FreshCheckpoint): |V|-scale, so its
      // true size lets the static planner broadcast the pointer side
      // of the shortcut self-join (the q235 finding).
      val merged = org.apache.spark.sql.graft.FreshCheckpoint
        .freshLocalCheckpoint(
          labels.unionAll(prop).groupBy($"v").agg(min($"lbl").as("lbl")))
      // pointer-doubling shortcut: chase one hop through the label
      // table itself. Left join: a label is always a vertex of the
      // same component so the match exists, but coalesce keeps the
      // step total rather than relying on that invariant.
      val ptr = merged.select($"v".as("p"), $"lbl".as("plbl"))
      // fresh-stats checkpoint (see FreshCheckpoint): this plan
      // references the checkpointed `merged` TWICE (probe + pointer
      // sides), so a plain localCheckpoint would carry a size estimate
      // that SQUARES per round — digits double, and the 64-round guard
      // could walk the optimizer into java.math's BigInteger ceiling
      // on a deep-diameter graph (q161's observed failure mode).
      labels = org.apache.spark.sql.graft.FreshCheckpoint
        .freshLocalCheckpoint(merged
          .join(ptr, merged("lbl") === ptr("p"), "left")
          .select(merged("v"),
            least(merged("lbl"), coalesce($"plbl", merged("lbl"))).as("lbl")))
      val s2 = probe(labels)
      converged = s2.compareTo(prevSum) == 0
      prevSum = s2
      rounds += 1
    }
    (labels, rounds)
  }

  /** Per-document `nbits`-bit SimHash over the distinct-token set:
    * token bit source is the portable 60-bit md5 hash (h60), each bit
    * position votes +1/−1 across the doc's tokens, and the sign of the
    * vote sum sets the output bit [Charikar, STOC'02]. One groupBy
    * shuffle on doc_id with `nbits` map-side-combinable sums. Returns
    * (doc_id, simhash). */
  /** Shared substrate for q339/q340/q354: the KEEPER-ATTRIBUTED cut
    * positions an exact duplicate-span dedup at L = 50 deletes.
    * Occurrence = every L-char window position; candidates group on a
    * 64-bit ROLLING window hash ([[graft.functions.WindowHashes]] —
    * 8-byte keys shuffle, never L-char strings, and the hash pass is
    * O(|text|) per doc instead of the O(|text|·L) per-position
    * substring+hash it replaced); colliding groups are verified by
    * EXACT substring equality (strings join back for candidates only),
    * so the hash function choice cannot change the result; keeper =
    * struct-min (doc_id, pos) per verified substring. Returns one row
    * per cut position: (doc_id, p, keeper_doc) — each position has
    * exactly one L-char substring, hence exactly one keeper.
    *
    * Memoized per (session, dataset) via [[T.memo]] (the q138/q159
    * graph-substrate lifecycle — VERDICT r17 #1): three queries consume
    * this, and the |chars|-row occurrence pass builds ONCE per session.
    * The result is pinned by an eager localCheckpoint (cut positions
    * only — the duplicate-region fraction of the corpus), and the two
    * char-grain intermediate checkpoints are explicitly RELEASED once
    * it is (ADVICE r17: RDD-level checkpoint storage is invisible to
    * `catalog.clearCache()`, so without the release only ContextCleaner
    * GC would reclaim them). At 100 TB the pinned intermediates become
    * reliable disk checkpoints; the build stays one hash agg + one
    * equi-join back — all-pairs never appears. */
  private def cutOccurrences(s: SparkSession, d: String): DataFrame =
    T.memoPinned(s, s"dedup:cutocc:$d") {
      import s.implicits._
      graft.GraftExtensions.ensureRegistered(s)
      val L = 50
      val docs = T.documents(s, d).select($"doc_id", $"text")
      // the char-grain occurrence pass is the dominant cost and has TWO
      // consumers (the key-frequency agg and the candidate join back) —
      // localCheckpoint so it runs ONCE (measured 9.4 → ~5 s at sf0.1)
      val occ = docs.filter(length($"text") >= L)
        .select($"doc_id", posexplode(expr(s"window_hashes(text, $L)")))
        .toDF("doc_id", "p0", "kh")
        .select($"doc_id", ($"p0" + 1L).cast("long").as("p"), $"kh")
        .localCheckpoint()
      val dupk = occ.groupBy($"kh").agg(count(lit(1)).as("nk"))
        .filter($"nk" >= 2).select($"kh")
      val cand = occ.join(dupk, "kh").select($"doc_id", $"p")
      // collision candidates only — small; two consumers again
      val vsub = cand.join(docs, "doc_id")
        .select($"doc_id", $"p",
          expr(s"substring(text, CAST(p AS INT), $L)").as("sub"))
        .localCheckpoint()
      val vdup = vsub.groupBy($"sub").agg(count(lit(1)).as("ns"))
        .filter($"ns" >= 2).select($"sub")
      val vocc = vsub.join(vdup, "sub")
      val keep = vocc.groupBy($"sub")
        .agg(min(struct($"doc_id", $"p")).as("kk"))
      val out = vocc.join(keep, "sub")
        .filter(!($"doc_id" === $"kk.doc_id" && $"p" === $"kk.p"))
        .select($"doc_id", $"p", $"kk.doc_id".as("keeper_doc"))
        .localCheckpoint()
      T.releaseLocalCheckpoint(occ)
      T.releaseLocalCheckpoint(vsub)
      out
    }

  /** The merged per-doc cut RANGES over [[cutOccurrences]]: non-keeper
    * positions cover [p, p+L−1]; islands merge per doc via the
    * gaps-and-islands cummax (q147's kernel at char grain). Returns
    * (doc_id, start_char, end_char), 1-based inclusive. Memoized (and
    * registered pinned so the bench's substrate drop removes this plan
    * together with the checkpointed RDD it references), but NOT
    * re-checkpointed: the lineage stops at the pinned cut-occurrence
    * RDD, so each consumer recomputes only a doc-partitioned window
    * over those ~|cut| rows — cheaper than another eager
    * materialization barrier. */
  private def cutSpans(s: SparkSession, d: String): DataFrame =
    T.memoPinned(s, s"dedup:cutspans:$d") {
      import s.implicits._
      val L = 50
      val cut = cutOccurrences(s, d).select($"doc_id", $"p").distinct()
      val wOrd = Window.partitionBy($"doc_id").orderBy($"p")
      cut
        .withColumn("prev_end", max($"p" + (L - 1))
          .over(wOrd.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("newi",
          when($"prev_end".isNull || $"p" > $"prev_end" + 1, 1L)
            .otherwise(0L))
        .withColumn("isl", sum($"newi").over(wOrd))
        .groupBy($"doc_id", $"isl")
        .agg(min($"p").cast("bigint").as("start_char"),
          (max($"p") + (L - 1)).cast("bigint").as("end_char"))
        .select($"doc_id", $"start_char", $"end_char")
    }

  private def simhashDocs(s: SparkSession, d: String, nbits: Int): DataFrame = {
    import s.implicits._
    val toks = T.documents(s, d)
      .select($"doc_id", explode(array_distinct(split($"text", " "))).as("tk"))
      .withColumn("h", graft.functions.PortableHash.h60($"tk"))
    val bitSums: Seq[Column] = (0 until nbits).map { j =>
      val mask = 1L << j
      sum(when((($"h".bitwiseAND(lit(mask))) > 0), 1).otherwise(-1)).as(s"b$j")
    }
    val perDoc = toks.groupBy($"doc_id").agg(bitSums.head, bitSums.tail: _*)
    val simhash = (0 until nbits).map { j =>
      when(col(s"b$j") >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    perDoc.select($"doc_id", simhash.as("simhash"))
  }

  /** word 3-gram shingle set (docs shorter than 3 tokens excluded —
    * equivalently, docs with zero grams). One compiled pass via the
    * native `word_ngrams` expression; the transform/concat_ws HOF form
    * paid an interpreted lambda per position and dominated this scan. */
  private[operators] def shingles(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    graft.GraftExtensions.ensureRegistered(s)
    T.documents(s, d)
      .select($"doc_id", array_distinct(expr("word_ngrams(text, 3)")).as("sh"))
      .filter(size($"sh") >= 1)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- exact row-dedup: duplicate detection on events -------------
    "q35_exact_dedup" -> ((s, d) => {
      import s.implicits._
      T.events(s, d)
        .groupBy($"user_id", $"event_type", $"value", $"props")
        .agg(count(lit(1)).as("n"), min($"event_id").as("keeper_event_id"))
        .filter($"n" > 1)
    }),

    // ---- banded MinHash LSH near-dup --------------------------------
    "q36_minhash_neardup" -> ((s, d) => {
      import s.implicits._
      graft.GraftExtensions.ensureRegistered(s)
      // cached: used by the signature build AND both verification
      // joins — uncached, the split+shingle projection would run three
      // times over the corpus (at 100 TB: persist to disk or
      // checkpoint instead of memory cache)
      val sh = shingles(s, d).cache() // harness-released (per-query clearCache)
      // signature array per doc via the native minhash_sig expression
      // (graft.functions.MinHashSig): 2 real hashes per shingle +
      // Kirsch–Mitzenmacher band derivation in one compiled loop — the
      // composed HOF form (transform ∘ array_min ∘ transform) costs
      // k·|sh| interpreted lambda evals per doc and dominated the
      // pipeline. Signature table is K longs per doc, cached for its
      // three uses.
      val sigArr = sh.select($"doc_id", expr(s"minhash_sig(sh, $K)").as("sig"))
        .cache() // harness-released (per-query clearCache)
      // candidates: docs colliding in ANY band (r=1) — equi-join on
      // (band, minhash), never all-pairs. Hot buckets (a globally
      // min-hashed common shingle) inflate this stage, so candidates
      // are pruned by the SIGNATURE similarity estimate before the
      // expensive exact verification: a true pair at the 0.5 Jaccard
      // threshold matches Binomial(32, 0.5) signature slots, so
      // requiring >= 5 misses it with P(X<=4) ~ 1.5e-6, while random
      // hot-bucket pairs (p ~ their true jaccard ~ 0.05, mean 1.6)
      // pass with only ~2% probability — a ~50x cut of the
      // verification set without a meaningful recall risk.
      val bands = sigArr.select($"doc_id", posexplode($"sig")).toDF("doc_id", "band", "mh")
      val cand = bands.toDF("a", "band", "mh")
        .join(bands.toDF("b", "band", "mh"), Seq("band", "mh"))
        .filter($"a" < $"b")
        .select($"a", $"b").distinct()
      val est = cand
        .join(sigArr.select($"doc_id".as("a"), $"sig".as("siga")), "a")
        .join(sigArr.select($"doc_id".as("b"), $"sig".as("sigb")), "b")
        .withColumn("matches",
          size(filter(zip_with($"siga", $"sigb", (x, y) => x === y), b => b)))
        .filter($"matches" >= 5)
        .select($"a", $"b")
      // exact-Jaccard verification of the pruned candidates only
      val shA = sh.select($"doc_id".as("a"), $"sh".as("sha"))
      val shB = sh.select($"doc_id".as("b"), $"sh".as("shb"))
      est.join(shA, "a").join(shB, "b")
        .select($"a", $"b",
          size(array_intersect($"sha", $"shb")).cast("double").as("inter"),
          size(array_union($"sha", $"shb")).cast("double").as("uni"))
        .select($"a", $"b", round($"inter" / $"uni", 6).as("jaccard"))
        .filter($"jaccard" >= 0.5)
    }),

    // ---- MinHash estimate-vs-exact Jaccard audit --------------------
    // The acceptance loop for the ESTIMATOR the whole LSH index rests
    // on (q142's recall-audit rule, applied to similarity VALUES): for
    // every declared near-dup pair, a k=16 MinHash signature-agreement
    // estimate of Jaccard next to the exact shingle Jaccard, with the
    // absolute error — the number that justifies (or indicts) using
    // signature agreement as a verification-stage prune. The
    // signature here is deliberately NOT minhash_sig's xxhash64 (no
    // DuckDB counterpart): it is the ORACLE-PORTABLE construction —
    // two md5-h60 hashes per gram truncated mod 2²⁸ (so the
    // Kirsch–Mitzenhacker h1 + 15·h2 stays far inside int64, where
    // DuckDB errors on overflow rather than wrapping), k=16 derived
    // bands, per-(doc, band) min via a relational explode — no
    // interpreted HOF lambda per hash. Scale shape: the gram table is
    // scanned once with a 16× band fan-out into one
    // map-side-combinable min agg; pairs are the q36 output
    // (checkpointed — no LSH re-derivation); the estimate join moves
    // 16 longs per pair side.
    "q257_minhash_jaccard_audit" -> ((s, d) => {
      import s.implicits._
      graft.GraftExtensions.ensureRegistered(s)
      val pairs = queries("q36_minhash_neardup")(s, d).select($"a", $"b")
        .localCheckpoint(true)
      val sh = shingles(s, d)
      val h = sh.select($"doc_id", explode($"sh").as("g"))
        .select($"doc_id",
          pmod(graft.functions.PortableHash.h60($"g"),
            lit(268435456L)).as("h1"),
          pmod(graft.functions.PortableHash.h60(concat(lit("k:"), $"g")),
            lit(268435456L)).as("h2"))
      val sig = h
        .select($"doc_id", $"h1", $"h2",
          explode(expr("sequence(0L, 15L)")).as("band"))
        .groupBy($"doc_id", $"band")
        .agg(min($"h1" + $"band" * $"h2").as("mh"))
      val est = pairs
        .join(sig.toDF("a", "band", "mha"), Seq("a"))
        .join(sig.toDF("b", "band", "mhb"), Seq("b", "band"))
        .groupBy($"a", $"b")
        .agg(sum(when($"mha" === $"mhb", 1L).otherwise(0L))
          .cast("bigint").as("matches"))
        .select($"a", $"b",
          expr("matches * 1000000L div 16").as("est_ppm"))
      val ex = pairs
        .join(sh.toDF("a", "sha"), "a")
        .join(sh.toDF("b", "shb"), "b")
        .select($"a", $"b",
          expr("CAST(size(array_intersect(sha, shb)) AS BIGINT) " +
            "* 1000000L div size(array_union(sha, shb))").as("exact_ppm"))
      est.join(ex, Seq("a", "b"))
        .select($"a", $"b", $"est_ppm", $"exact_ppm",
          abs($"est_ppm" - $"exact_ppm").as("abs_err_ppm"))
    }),

    // ---- near-dup clusters (connected components) -------------------
    // The step after pair detection in a real dedup pipeline: group
    // the q36 pair list into clusters and pick one keeper per cluster
    // via [[connectedComponents]] (convergence-driven min-label
    // propagation — see its doc for the iteration/checkpoint shape).
    // The pair list is checkpointed BEFORE fanning out so no branch
    // re-materializes the LSH sub-pipeline.
    "q56_dedup_clusters" -> ((s, d) => {
      import s.implicits._
      val pairs = queries("q36_minhash_neardup")(s, d).select($"a", $"b")
        .localCheckpoint(true)
      connectedComponents(pairs)
        .groupBy($"lbl".as("cluster_id"))
        .agg(count(lit(1)).as("n_docs"), min($"v").as("keeper_doc_id"))
    }),

    // ---- dedup keepers: the materialized deduplicated corpus --------
    // The END of the dedup pipeline: detection (q36) → clustering
    // (q56) → drop every cluster member except the min-id keeper, and
    // report what survives per language. The drop set scales with the
    // corpus DUP RATE (web corpora run 30–50% duplicates), so no
    // broadcast hint — it's a plain keyed anti-join and AQE broadcasts
    // only when the detected set actually fits; unique docs never
    // enter the pair/cluster machinery.
    "q67_dedup_keepers" -> ((s, d) => {
      import s.implicits._
      val pairs = queries("q36_minhash_neardup")(s, d).select($"a", $"b")
        .localCheckpoint(true)
      val dropped = connectedComponents(pairs)
        .filter($"v" =!= $"lbl").select($"v".as("doc_id"))
      T.documents(s, d).join(dropped, Seq("doc_id"), "left_anti")
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_kept"),
          sum($"n_chars").cast("bigint").as("kept_chars"),
          min($"doc_id").as("first_kept"))
    }),

    // ---- dedup savings report (the mixture-reweighting input) -------
    // The PLANNING number the q67 keeper pass feeds a curation loop:
    // per SOURCE, how much token mass does near-dup dedup reclaim?
    // A boilerplate-heavy source losing 40% of its tokens means its
    // q63 mixture weight was computed against phantom mass — this
    // report is what re-weights it. Same detection → clustering →
    // drop-set machinery as q67 (checkpointed pair list, min-label
    // CC); one left join + source-grain agg after.
    "q283_dedup_savings" -> ((s, d) => {
      import s.implicits._
      val pairs = queries("q36_minhash_neardup")(s, d).select($"a", $"b")
        .localCheckpoint(true)
      val dropped = connectedComponents(pairs)
        .filter($"v" =!= $"lbl")
        .select($"v".as("doc_id"), lit(1L).as("drp"))
      T.documents(s, d)
        .select($"doc_id", $"source",
          size(split($"text", " ")).cast("long").as("toks"))
        .join(dropped, Seq("doc_id"), "left")
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          sum(coalesce($"drp", lit(0L))).as("n_dropped"),
          sum($"toks").cast("bigint").as("tokens_total"),
          sum(when($"drp".isNotNull, $"toks").otherwise(0L))
            .cast("bigint").as("tokens_dropped"))
        .select($"source", $"n_docs", $"n_dropped",
          $"tokens_total", $"tokens_dropped",
          expr("tokens_dropped * 1000000L div tokens_total")
            .as("savings_ppm"))
    }),

    // ---- edit-distance verification of near-dup pairs ---------------
    // Character-level Levenshtein as the second verification signal on
    // the detected pairs ONLY (the scale-sane shape: edit distance is
    // O(len²) per pair, so it must never see all-pairs — here it runs
    // on the LSH-detected list, bounded by the near-dup rate).
    // levenshtein() has identical semantics in Spark and DuckDB.
    "q69_editdist_verify" -> ((s, d) => {
      import s.implicits._
      val pairs = queries("q36_minhash_neardup")(s, d).select($"a", $"b")
      val docs = T.documents(s, d).select($"doc_id", $"text")
      pairs
        .join(docs.select($"doc_id".as("a"), $"text".as("ta")), "a")
        .join(docs.select($"doc_id".as("b"), $"text".as("tb")), "b")
        .select($"a", $"b",
          levenshtein($"ta", $"tb").cast("bigint").as("edit_dist"),
          greatest(length($"ta"), length($"tb")).cast("bigint").as("max_len"))
    }),

    // ---- incremental-ingest dedup -----------------------------------
    // The steady-state shape of a production dedup pipeline: a NEW
    // batch arrives and is checked against the EXISTING corpus, not
    // the corpus against itself. Existing = even doc_ids, incoming =
    // odd (a deterministic stand-in for the batch boundary); an
    // incoming doc is dropped when its content fingerprint already
    // exists. One anti-join on the fingerprint — the existing side's
    // fingerprint index is the only thing scanned, never its text.
    "q74_incremental_dedup" -> ((s, d) => {
      import s.implicits._
      val docs = T.documents(s, d)
        .select($"doc_id", $"lang", md5($"text").as("fp"))
      val existing = docs.filter($"doc_id" % 2 === 0).select($"fp")
      val incoming = docs.filter($"doc_id" % 2 === 1)
      incoming.join(existing, Seq("fp"), "left_anti")
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_new"), min($"doc_id").as("first_new"))
    }),

    // ---- substring-level duplicate spans ----------------------------
    // Span-level dedup (the "repeated substring" pass of a curation
    // pipeline, complementary to q36's whole-document near-dup): every
    // word 5-gram OCCURRENCE is indexed by position, grams occurring
    // >= 2 times anywhere in the corpus (across docs or repeated
    // within one) mark their positions as duplicated span material.
    // Output: per-doc duplicated-span profile (how much of the doc is
    // corpus-duplicated text, where it starts, how widely shared).
    // Scale shape: explode -> one hash agg on the gram key -> equi-
    // join occurrences back on the gram key -> per-doc agg. Both
    // shuffles key on high-cardinality keys (gram text, doc_id); no
    // all-pairs anywhere. A boilerplate mega-gram concentrates its
    // bucket, but the join output stays one row per occurrence —
    // skew salting applies unchanged if one gram dominates.
    "q76_dup_spans" -> ((s, d) => {
      import s.implicits._
      graft.GraftExtensions.ensureRegistered(s)
      // the scan + gram explode is the dominant cost and has two
      // consumers (the dup aggregate and the join back) — cache it
      // so it runs once (the q58/q78 rule; gram table is corpus-
      // scaled, so at 100 TB persist to disk/checkpoint instead)
      val grams = T.documents(s, d)
        .select($"doc_id", posexplode(expr("word_ngrams(text, 5)")))
        .toDF("doc_id", "pos", "g")
        .cache() // harness-released (per-query clearCache)
      val dup = grams.groupBy($"g")
        .agg(count(lit(1)).as("n_occ"), countDistinct($"doc_id").as("n_docs"))
        .filter($"n_occ" >= 2)
      grams.join(dup, "g")
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_dup_positions"),
          countDistinct($"g").as("n_dup_grams"),
          min($"pos").cast("bigint").as("first_dup_pos"),
          max($"n_docs").as("max_gram_docs"))
    }),

    // ---- train/eval contamination check (n-gram overlap) -------------
    // [Brown+ NeurIPS'20 §4 "benchmark contamination"; Lee+ ACL'22]
    // the evaluation-integrity op every LLM pipeline runs before
    // trusting a held-out score: for each EVAL-split document, what
    // fraction of its word 8-grams also appears anywhere in the TRAIN
    // split? High overlap means the "held-out" doc leaked into
    // training and its eval numbers are fiction. Split = the portable
    // hash (h60(doc_id) mod 10 == 0 is eval — s35's stream split, so
    // the two audits see the same partition). Grams ride as h60 keys
    // (16 bytes shuffle, not 8-word strings — q285's rule; the train
    // side is a distinct-hash set, eval probes it with a semi-join
    // marked per gram). Flagged at ≥ 80% overlap — on this fixture
    // that catches 5 genuinely cross-split near-duplicated docs (some
    // at 100%), which is exactly the leak the op exists to find.
    // Docs with < 8 words carry no gram evidence and are excluded (no
    // denominator). Shape: one gram explode per side, one distinct
    // hash-agg (train), one broadcast-or-shuffle semi-join on the
    // 60-bit key, one per-doc agg — all corpus-linear, no pairs.
    "q317_contamination_check" -> ((s, d) => {
      import s.implicits._
      graft.GraftExtensions.ensureRegistered(s)
      val h60 = graft.functions.PortableHash.h60 _
      val split = T.documents(s, d)
        .select($"doc_id", $"text",
          (pmod(h60($"doc_id"), lit(10)) === 0).as("is_eval"))
      val grams = split
        .select($"doc_id", $"is_eval",
          explode(expr("word_ngrams(text, 8)")).as("g"))
        .select($"doc_id", $"is_eval", h60($"g").as("gh"))
      val train = grams.filter(!$"is_eval").select($"gh").distinct()
      val hits = grams.filter($"is_eval")
        .join(train.select($"gh".as("tgh")), $"gh" === $"tgh", "left")
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_grams"),
          sum(when($"tgh".isNotNull, 1L).otherwise(0L)).cast("bigint")
            .as("n_hit"))
      hits.select($"doc_id", $"n_grams", $"n_hit",
        expr("n_hit * 1000000 div n_grams").as("contam_ppm"),
        expr("CAST(n_hit * 1000000 div n_grams >= 800000 AS BIGINT)")
          .as("flagged"))
    }),

    // ---- exact longest repeated substring across documents ----------
    // The CHARACTER-level companion to q76's word-5-gram spans: the
    // longest contiguous character run shared by >= 2 distinct docs —
    // what a suffix-array pass over the concatenated corpus computes
    // (Lee et al.'s dedup substrate). Relationalized as a BINARY
    // SEARCH on the answer length: "a cross-doc repeat of length L
    // exists" is monotone decreasing in L (any prefix of a repeat is
    // a repeat), so ~log2(maxlen) distributed probes pin L* exactly —
    // each probe enumerates the length-mid windows as ROLLING hashes
    // (window_hashes: O(1)/position, no substring materialization) and
    // runs the TWO-PHASE hashed group the MinHash family uses: phase 1
    // shuffles only (doc_id, hash) — an 8-byte key, never the L-char
    // string — and keeps hashes hit by ≥ 2 distinct docs; phase 2
    // re-derives the substrings of those (rare) colliding groups
    // behind a broadcast semi-join and verifies them EXACTLY on the
    // real substring key, so a hash collision can add a candidate
    // group but never a false repeat. The verified result is bit-identical to a
    // direct group-by-substring, so the oracle replays the plain form.
    // The driver loop is mechanically bounded (<= 64 iterations for
    // any int64 length, ~10 here). Output: L*, how many distinct
    // repeats of that length exist, the lexicographically smallest
    // one, and how many docs share it. The oracle replays the
    // identical search as one recursive CTE carrying (lo, hi).
    "q285_suffix_lrs" -> ((s, d) => {
      import s.implicits._
      graft.GraftExtensions.ensureRegistered(s)
      // probed ~log2(maxlen) times — cache the 2-column projection
      val docs = T.documents(s, d).select($"doc_id", $"text").cache()
      // every length-midL window as (doc_id, 0-based position, 64-bit
      // ROLLING hash) — window_hashes pays O(1) per position instead
      // of the O(midL) substring-materialize-then-hash per position it
      // replaced (r19 ran xxhash64 over an exploded substring array:
      // |text|·midL bytes copied and hashed per probe; the rolling
      // pass is O(|text|) with zero string allocation, guide §1.2)
      def winOf(midL: Long): DataFrame = docs
        .filter(length($"text") >= midL)
        .select($"doc_id", posexplode(expr(s"window_hashes(text, $midL)")))
        .toDF("doc_id", "p0", "h")
      // phase 1: only an 8-byte hash crosses the wire — equal strings
      // always collide, and phase 2 verifies candidates on the exact
      // string, so the only effect of a 64-bit collision is one extra
      // candidate group (guide §2.3: narrower shuffle keys)
      def hotOf(midL: Long): DataFrame = winOf(midL)
        .groupBy($"h")
        .agg(countDistinct($"doc_id").cast("bigint").as("ndh"))
        .filter($"ndh" >= 2)
        .select($"h")
      // phase 2: exact verify of the colliding groups only — the
      // semi-join keeps the RARE colliding positions first, and only
      // those rows join text back and materialize their substring
      // (the r19 form exploded EVERY position's substring again and
      // semi-joined after; candidates are the only strings built now)
      def repsWithHot(midL: Long, hot: DataFrame): DataFrame = winOf(midL)
        .join(broadcast(hot), Seq("h"), "left_semi")
        .join(docs, "doc_id")
        .select($"doc_id",
          expr(s"substring(text, CAST(p0 AS INT) + 1, $midL)").as("sub"))
        .groupBy($"sub")
        .agg(countDistinct($"doc_id").cast("bigint").as("nd"))
        .filter($"nd" >= 2)
      def reps(midL: Long): DataFrame = repsWithHot(midL, hotOf(midL))
      // existence with an exact short-circuit: equal strings ALWAYS
      // collide on the rolling hash, so phase 1's hot set is a superset
      // of the true repeats — an empty phase 1 proves no repeat exists
      // and the verify pass is skipped entirely (every failed probe
      // pays one pass instead of two); a non-empty phase 1 is cached
      // (it is ≤ a handful of 8-byte hashes) so the verify pass reuses
      // it instead of recomputing the hash aggregation
      def existsRep(midL: Long): Boolean = {
        val hot = hotOf(midL).cache()
        try {
          if (hot.isEmpty) false
          else !repsWithHot(midL, hot).isEmpty
        } finally hot.unpersist()
      }
      val maxLen = T.boundedCollect(
        docs.agg(max(length($"text")).cast("bigint").as("m")),
        1, "q285 max doc length")(0).getLong(0)
      var lo = 0L
      var hi = maxLen
      var iters = 0
      while (lo < hi) {
        iters += 1
        require(iters <= 64, "q285: binary search exceeded the int64 bound")
        val mid = (lo + hi + 1) / 2 // non-negative: trunc == floor
        if (!existsRep(mid)) hi = mid - 1 else lo = mid
      }
      val out =
        if (lo == 0L)
          Seq((0L, 0L, "", 0L))
            .toDF("lrs_len", "n_repeats", "lrs", "n_docs")
        else
          reps(lo)
            .agg(count(lit(1)).as("n_repeats"),
              min(struct($"sub", $"nd")).as("m"))
            .select(lit(lo).as("lrs_len"), $"n_repeats",
              $"m.sub".as("lrs"), $"m.nd".as("n_docs"))
      // the cache served the ~log2(maxlen) probe loop above; the final
      // plan scans the 2-column projection once, so release it eagerly
      // (q295's discipline) instead of leaning on harness clearCache
      docs.unpersist()
      out
    }),

    // ---- duplicate-region union: the chars you'd actually cut ------
    // q76 detects duplicated 5-gram POSITIONS; this merges them into
    // maximal duplicated REGIONS per doc (a 5-gram at word position p
    // covers words [p, p+4]; overlapping/adjacent covers coalesce by
    // the gaps-and-islands cummax) and reports the per-doc union size
    // and duplicated fraction — the number an exact substring-dedup
    // pass (Lee et al. shape) would actually delete, not just a count
    // of overlapping hits. Windows are doc_id-partitioned (per-doc
    // position lists, never corpus-wide); the gram machinery is q76's
    // (one hash agg on the gram key + one equi-join back).
    "q147_dup_regions" -> ((s, d) => {
      import s.implicits._
      graft.GraftExtensions.ensureRegistered(s)
      // same two-consumer cache rule as q76 (disk-persist at 100 TB)
      val grams = T.documents(s, d)
        .select($"doc_id", posexplode(expr("word_ngrams(text, 5)")))
        .toDF("doc_id", "pos", "g")
        .cache() // harness-released (per-query clearCache)
      val dup = grams.groupBy($"g")
        .agg(count(lit(1)).as("n_occ"))
        .filter($"n_occ" >= 2)
      val pd = grams.join(dup, "g").select($"doc_id", $"pos")
      val wOrd = Window.partitionBy($"doc_id").orderBy($"pos")
      val regions = pd
        .withColumn("prev_end",
          max($"pos" + 4).over(wOrd.rowsBetween(Window.unboundedPreceding, -1)))
        // a cover starting at prev_end + 1 is exactly adjacent (no gap
        // word between them), so it extends the island; only a start
        // beyond prev_end + 1 leaves uncovered words and opens a new one
        .withColumn("new_isl",
          when($"prev_end".isNull || $"pos" > $"prev_end" + 1, 1L).otherwise(0L))
        .withColumn("isl", sum($"new_isl").over(wOrd))
        .groupBy($"doc_id", $"isl")
        .agg((max($"pos") - min($"pos") + 5).cast("bigint").as("rw"))
      val nw = T.documents(s, d)
        .select($"doc_id", size(split($"text", " ")).cast("bigint").as("n_words"))
      regions.groupBy($"doc_id")
        .agg(count(lit(1)).as("n_regions"), sum($"rw").cast("bigint").as("covered_words"))
        .join(nw, "doc_id")
        .withColumn("dup_ppm", expr("covered_words * 1000000L div n_words"))
    }),

    // ---- exact substring-dedup CUT LIST (the materialized artifact) --
    // [Lee+ ACL'22 ExactSubstr] the missing END of the q285/q76/q147
    // chain (VERDICT r16 #2): q285 finds the longest repeat, q76/q147
    // mark and measure word-gram dup coverage — this query EMITS the
    // actual cut list a production substring-dedup would apply: per
    // doc, the merged char ranges (ASCII corpus: char == byte, the
    // MultimodalFixtureSpec precondition) covered by non-keeper
    // occurrences of every ≥ L-char repeat (L = 50, the Lee+ default
    // scale; keeper = globally first occurrence by (doc_id, pos)
    // struct-min, so exactly one copy of each repeated span survives).
    // Discipline: occurrence keys are 8-byte rolling window hashes
    // (window_hashes — O(1)/position, never L-char strings; q285's
    // rule), with EXACT string verification joined back for
    // hash-colliding groups only (the hash choice cannot change the
    // result); islands merge via the doc-partitioned gaps-and-islands
    // cummax (q147's kernel, char grain). Scale: |chars| occurrence
    // rows — the honest ExactSubstr
    // cost class (Lee+ build a suffix array of the same size); one
    // hash agg + one equi-join back + doc-local windows, no pairs.
    "q339_dedup_cutlist" -> ((s, d) => {
      import s.implicits._
      cutSpans(s, d)
        .withColumn("span_id", row_number().over(
          Window.partitionBy($"doc_id").orderBy($"start_char")).cast("bigint"))
        .select($"doc_id", $"span_id", $"start_char", $"end_char",
          ($"end_char" - $"start_char" + 1).cast("bigint").as("cut_chars"))
    }),

    // ---- per-source reclaimed-token accounting of the cut ------------
    // The accounting row next to q283's doc-grain savings: per source,
    // how many docs the q339 cut touches, the reclaimed chars (exact),
    // the reclaimed TOKENS (whitespace words falling ENTIRELY inside a
    // cut span — exact containment via per-doc word offsets from one
    // running-sum window), and the reclaimed ppm of the source's
    // chars. Word-offset join is doc-keyed with a range residual
    // (spans per doc are few), never corpus-wide.
    "q340_dedup_reclaimed" -> ((s, d) => {
      import s.implicits._
      // spans is a cheap window over the PINNED cut-occurrence RDD —
      // both the token-containment join and the per-doc rollup
      // recompute it from those materialized blocks, never from the
      // corpus
      val spans = cutSpans(s, d)
      val wDoc = Window.partitionBy($"doc_id").orderBy($"wp")
      val woff = T.documents(s, d)
        .select($"doc_id", posexplode(split($"text", " ")))
        .toDF("doc_id", "wp", "wd")
        .withColumn("wlen", length($"wd").cast("bigint"))
        .withColumn("wend", (sum($"wlen" + 1).over(wDoc) - 1).cast("bigint"))
      val ctok = woff.join(spans, "doc_id")
        .filter($"wend" - $"wlen" + 1 >= $"start_char" &&
          $"wend" <= $"end_char")
        .groupBy($"doc_id").agg(count(lit(1)).as("cut_tokens"))
      val perdoc = spans.groupBy($"doc_id")
        .agg(count(lit(1)).as("n_spans"),
          sum($"end_char" - $"start_char" + 1).cast("bigint").as("cut_chars"))
      T.documents(s, d)
        .select($"doc_id", $"source", length($"text").cast("bigint").as("nc"))
        .join(perdoc, Seq("doc_id"), "left")
        .join(ctok, Seq("doc_id"), "left")
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when($"n_spans".isNotNull, 1L).otherwise(0L)).cast("bigint")
            .as("n_docs_cut"),
          sum(coalesce($"n_spans", lit(0L))).cast("bigint").as("n_spans"),
          sum(coalesce($"cut_chars", lit(0L))).cast("bigint")
            .as("reclaimed_chars"),
          sum(coalesce($"cut_tokens", lit(0L))).cast("bigint")
            .as("reclaimed_tokens"),
          sum($"nc").cast("bigint").as("total_chars"))
        .select($"source", $"n_docs", $"n_docs_cut", $"n_spans",
          $"reclaimed_chars", $"reclaimed_tokens", $"total_chars",
          expr("reclaimed_chars * 1000000 div total_chars")
            .as("reclaimed_ppm"))
    }),

    // ---- cross-source duplication attribution (who duplicates whom) --
    // The span-grain production question q143's doc-grain co-dup
    // matrix only approximates (VERDICT r17 #4): for every position
    // q339's cut deletes, WHICH source's keeper does it duplicate?
    // Each cut position carries exactly one keeper (its L-char
    // substring's struct-min first occurrence — self-duplication lands
    // on the diagonal), so the attribution is one doc-keyed join of
    // the memoized substrate to the (doc_id, source) map per side,
    // then a group to the ≤|sources|² matrix: positions cut, distinct
    // cut docs, distinct keeper docs, distinct (keeper, cut) doc pairs,
    // and each cell's ppm share of all cut positions. Scale: the
    // substrate is the cost (built once per session); this query adds
    // two broadcastable doc→source joins and one bounded agg.
    "q354_dedup_attribution" -> ((s, d) => {
      import s.implicits._
      val srcs = T.documents(s, d).select($"doc_id", $"source")
      val cells = cutOccurrences(s, d)
        .join(srcs, "doc_id")
        .withColumnRenamed("source", "cut_source")
        .join(srcs.toDF("keeper_doc", "keeper_source"), "keeper_doc")
        .groupBy($"keeper_source", $"cut_source")
        .agg(count(lit(1)).cast("bigint").as("n_positions"),
          countDistinct($"doc_id").cast("bigint").as("n_cut_docs"),
          countDistinct($"keeper_doc").cast("bigint").as("n_keeper_docs"),
          countDistinct($"keeper_doc", $"doc_id").cast("bigint")
            .as("n_doc_pairs"))
      val tot = cells.agg(sum($"n_positions").cast("bigint").as("t_pos"))
      cells.crossJoin(broadcast(tot))
        .select($"keeper_source", $"cut_source", $"n_positions",
          $"n_cut_docs", $"n_keeper_docs", $"n_doc_pairs",
          expr("n_positions * 1000000L div t_pos").as("share_ppm"))
    }),

    // ---- SimHash bucketing ------------------------------------------
    // 16-bit simhash over the distinct-token set; token bit source is
    // a 60-bit integer parsed from md5 hex — portable to the oracle.
    // Buckets with >1 doc are near-dup candidates (identical vocab
    // profile); output is the bucket summary.
    "q37_simhash_buckets" -> ((s, d) => {
      import s.implicits._
      simhashDocs(s, d, 16)
        .groupBy($"simhash")
        .agg(count(lit(1)).as("n_docs"), min($"doc_id").as("keeper_doc_id"))
        .filter($"n_docs" > 1)
    }),

    // ---- SimHash hamming-distance join (pigeonhole multi-index) -----
    // q37 finds only IDENTICAL simhashes; the useful near-dup relation
    // is hamming(simhash_a, simhash_b) <= k — and the scalable way to
    // find those pairs without all-pairs bit_count is the pigeonhole
    // multi-index [Manku, Jain, Das Sarma, "Detecting Near-Duplicates
    // for Web Crawling", WWW'07]: split the w-bit fingerprint into
    // k+1 disjoint blocks; any pair within distance k leaves at least
    // one block untouched, so an equi-join on (block_idx, block_bits)
    // loses NO qualifying pair, and bit_count verification runs on
    // candidates only. Here w=60, k=3 → 4 blocks of 15 bits; identical
    // 60-bit fingerprints (d=0) are excluded — note q37 buckets a
    // 16-bit simhash, so its collision set is a SUPERSET of the d=0
    // pairs dropped here (the two queries overlap at 16 bits; an exact
    // partition of the near-dup space only holds per fingerprint width).
    //
    // Scale: candidate buckets are keyed by 15-bit block values
    // (2^15 per block index); expected bucket size is N/2^15 per
    // index. At larger N, widen blocks (fewer bits of tolerance per
    // table, more tables over permuted fingerprints — Manku §3) to
    // keep buckets bounded; the join/verify shape is unchanged. The
    // verification is one codegen'd XOR+popcount per candidate.
    "q136_simhash_hamming" -> ((s, d) => {
      import s.implicits._
      val sh = simhashDocs(s, d, 60)
      val blocks = sh.select($"doc_id", $"simhash",
        explode(array((0 until 4).map(j =>
          struct(lit(j).as("bi"),
            expr(s"shiftright(simhash, ${15 * j}) & 32767").as("bv"))): _*)).as("blk"))
        .select($"doc_id", $"simhash", $"blk.bi", $"blk.bv")
      blocks.select($"bi", $"bv", $"doc_id".as("a"), $"simhash".as("sha"))
        .join(blocks.select($"bi", $"bv", $"doc_id".as("b"), $"simhash".as("shb")),
          Seq("bi", "bv"))
        .filter($"a" < $"b")
        .select($"a", $"b",
          expr("bit_count(sha ^ shb)").cast("long").as("hamming"))
        .distinct()
        .filter($"hamming".between(1, 3))
    }),

    // ---- near-dup provenance: cross-source overlap matrix -----------
    // Re-keys q134's exact similarity join (4-gram Jaccard >= 1/2) to
    // the (source, source) level: how many near-dup pairs each pair of
    // sources shares — the diagnostic that tells a crawl which feeds
    // mirror each other (exact cross-source dups are zero on this
    // corpus; the NEAR-dup relation is where mirror structure shows).
    // Cost over q134: one broadcast-able join to recover sources plus
    // a bounded agg (source pairs ≤ |sources|²).
    "q143_source_overlap" -> ((s, d) => {
      import s.implicits._
      val src = T.documents(s, d).select($"doc_id", $"source")
      queries("q134_ngram_jaccard")(s, d)
        .join(src.toDF("a", "src_a"), "a")
        .join(src.toDF("b", "src_b"), "b")
        .select(least($"src_a", $"src_b").as("sa"),
          greatest($"src_a", $"src_b").as("sb"))
        .groupBy($"sa", $"sb")
        .agg(count(lit(1)).as("n_pairs"))
    }),

    // ---- EXACT n-gram Jaccard similarity join (prefix filter) -------
    // The exact member of the near-dup family (vs q36's LSH estimate):
    // every pair with 4-gram-shingle Jaccard >= 1/2, found WITHOUT
    // all-pairs comparison via the AllPairs/PPJoin prefix filter
    // [Bayardo et al., WWW'07; Chaudhuri et al., ICDE'06].
    //
    // Under any global total order of grams, two sets with
    // J(A,B) >= τ share an element within each set's first
    // |x| − ⌈τ·|x|⌉ + 1 grams: the smallest shared gram t must sit in
    // both prefixes, else |A∩B| ≤ ⌈τ|x|⌉ − 1 < ⌈τ·max(|A|,|B|)⌉ ≤
    // |A∩B|. So a prefix-prefix equi-join on gram loses NO qualifying
    // pair — the result is exactly the all-pairs ground truth (the
    // oracle computes exactly that), at index cost ~half the grams.
    //
    // Ordering grams by ascending document frequency (ties by gram
    // text → total order) makes the join keys the RAREST grams:
    // stopword-like grams (huge df, huge buckets) land at the end of
    // every doc's order and almost never enter a prefix, so candidate
    // bucket sizes are bounded by rare-gram df — the scale property
    // that makes this exact algorithm viable at 100 TB (shuffles: one
    // groupBy(gram) for df, one per-doc window, one equi-join on
    // prefix grams, then candidate-only verification).
    //
    // τ = 1/2 is evaluated in pure integer algebra (prefix length
    // n/2 + 1, size filter 2·min ≥ max, accept 2·inter ≥ uni) so the
    // gate has no float-rounding edge.
    "q134_ngram_jaccard" -> ((s, d) => {
      import s.implicits._
      graft.GraftExtensions.ensureRegistered(s)
      // 4-gram shingle sets (distinct from q36's 3-grams). Width is a
      // precision lever, measured on this corpus at sf0.1: bigrams
      // give a 931-gram vocabulary (avg df 275) and the "rarest-gram"
      // prefix degenerates to 5.5M candidates for 256 true pairs;
      // 4-grams give 210k grams (avg df 1.2) and the SAME 256-pair
      // answer from exactly 256 candidates — 100% filter precision.
      // At 100 TB the same principle holds: pick the shingle width
      // that makes prefix grams rare relative to the corpus.
      val sets = T.documents(s, d)
        .select($"doc_id", array_distinct(expr("word_ngrams(text, 4)")).as("sh"))
        .filter(size($"sh") >= 1)
        .withColumn("n", size($"sh"))
      // two consumers (prefix build + verification) — same cache rule
      // as q36/q76: at 100 TB persist to disk/checkpoint instead
      val grams = sets.select($"doc_id", $"n", explode($"sh").as("g")).cache() // harness-released (per-query clearCache)
      val dfreq = grams.groupBy($"g").agg(count(lit(1)).as("df"))
      val ord = Window.partitionBy($"doc_id").orderBy($"df", $"g")
      // prefix = the (n − ⌈n/2⌉ + 1) = n/2 + 1 globally-rarest grams
      // cached: the candidate self-join consumes the prefix table on
      // BOTH sides — uncached, the df-join + window would run twice
      val prefix = grams.join(dfreq, "g")
        .withColumn("rn", row_number().over(ord))
        .filter($"rn" <= ($"n" / 2) + 1)
        .select($"g", $"doc_id", $"n")
        .cache() // harness-released (per-query clearCache)
      // candidates: prefix∩prefix non-empty + size-compatibility
      // (J >= 1/2 forces 2·min(|A|,|B|) >= max(|A|,|B|))
      val cand = prefix.toDF("g", "a", "na")
        .join(prefix.toDF("g", "b", "nb"), "g")
        .filter($"a" < $"b" && $"na" * 2 >= $"nb" && $"nb" * 2 >= $"na")
        .select($"a", $"b").distinct()
      // exact verification of candidates only
      val full = sets.select($"doc_id", $"sh")
      cand
        .join(full.toDF("a", "sha"), "a")
        .join(full.toDF("b", "shb"), "b")
        .select($"a", $"b",
          size(array_intersect($"sha", $"shb")).cast("long").as("inter"),
          size(array_union($"sha", $"shb")).cast("long").as("uni"))
        .filter($"inter" * 2 >= $"uni")
        .withColumn("jaccard", round($"inter".cast("double") / $"uni", 6))
    }),

    // ---- EXACT n-gram containment join (asymmetric near-dup) --------
    // Quote/excerpt detection: C(A→B) = |A∩B| / |A| >= 3/4 — the
    // small side mostly contained in the big side. q134's symmetric
    // Jaccard gate misses exactly these pairs when |B| >> |A| (the
    // union term drowns the overlap), yet they are what substring-level
    // training-data leaks look like. Same rarest-gram prefix-filter
    // family [Chaudhuri et al., ICDE'06]: if |A∩B| >= ceil(τ·|A|)
    // then A's (|A| − ceil(τ·|A|) + 1) rarest grams cannot all miss
    // B, so equi-joining ONLY A's prefix grams against B's full gram
    // index loses no qualifying pair, and exact verification runs on
    // candidates only. Containment has no size-compatibility filter —
    // that asymmetry is the point — so the probe side is
    // prefix-bounded while the indexed side is the full gram table;
    // at 100 TB the gram index is the bucketed layout (q55) behind a
    // Bloom pre-filter (q119) and candidate buckets stay bounded by
    // rare-gram df exactly as in q134. The gate is pure integers
    // (4·inter >= 3·|A|), so there is no float-rounding edge.
    "q152_containment_join" -> ((s, d) => {
      import s.implicits._
      graft.GraftExtensions.ensureRegistered(s)
      val sets = T.documents(s, d)
        .select($"doc_id", array_distinct(expr("word_ngrams(text, 4)")).as("sh"))
        .filter(size($"sh") >= 1)
        .withColumn("n", size($"sh"))
      // two consumers (prefix build + full-index probe) — q134's cache
      // rule: disk-persist/checkpoint at 100 TB
      val grams = sets.select($"doc_id", $"n", explode($"sh").as("g")).cache() // harness-released (per-query clearCache)
      val dfreq = grams.groupBy($"g").agg(count(lit(1)).as("df"))
      val ord = Window.partitionBy($"doc_id").orderBy($"df", $"g")
      // prefix length = n − ceil(3n/4) + 1 (integer form, n >= 1)
      val prefix = grams.join(dfreq, "g")
        .withColumn("rn", row_number().over(ord))
        .filter($"rn" <= $"n" - expr("(n * 3 + 3) div 4") + 1)
        .select($"g", $"doc_id", $"n")
      val cand = prefix.select($"g", $"doc_id".as("a"))
        .join(grams.select($"g", $"doc_id".as("b")), "g")
        .filter($"a" =!= $"b")
        .select($"a", $"b").distinct()
      val full = sets.select($"doc_id", $"sh")
      cand
        .join(full.toDF("a", "sha"), "a")
        .join(full.toDF("b", "shb"), "b")
        .select($"a", $"b",
          size(array_intersect($"sha", $"shb")).cast("long").as("inter"),
          size($"sha").cast("long").as("n_a"))
        .filter($"inter" * 4 >= $"n_a" * 3)
        .withColumn("containment_ppm", expr("inter * 1000000L div n_a"))
    }),

    // ---- incremental near-dup admission (batch vs existing index) ---
    // The ingest-time shape of q36: a freshly crawled BATCH (10%
    // hash-parity split — in production, the new crawl) is LSH-checked
    // against the banded signature index of the EXISTING corpus, and
    // every batch doc with an exact-verified near-dup (Jaccard >= 1/2)
    // is reported with its match count and best match — the quarantine
    // worklist; unreported batch docs are admitted. q74 is this
    // operator for EXACT dupes (fingerprint anti-join); this is the
    // near-dup tier of the same admission pipeline (s20 is the
    // streaming exact tier).
    //
    // Shape: candidates come ONLY from batch-bands ⋈ index-bands on
    // (band, minhash) — new×new pairs are not generated (dedup WITHIN
    // a batch is q36 run small), and the index side is write-once
    // (append new signatures after admission). Signature-estimate
    // pruning (>= 5/32 matching slots) cuts hot-bucket false
    // candidates before exact verification, same analysis as q36.
    // Best-match argmax is a max(struct) — deterministic, tie-broken
    // to the smallest matching doc_id.
    "q155_incremental_neardup" -> ((s, d) => {
      import s.implicits._
      graft.GraftExtensions.ensureRegistered(s)
      val sh = shingles(s, d).cache() // harness-released (per-query clearCache)
      val sig = sh.select($"doc_id", expr(s"minhash_sig(sh, $K)").as("sig"))
        .withColumn("is_b",
          pmod(graft.functions.PortableHash.h60($"doc_id"), lit(10)) === 0)
        .cache() // harness-released (per-query clearCache)
      val bnd = sig.select($"doc_id", $"is_b", posexplode($"sig"))
        .toDF("doc_id", "is_b", "band", "mh")
      val cand = bnd.filter($"is_b").select($"doc_id".as("a"), $"band", $"mh")
        .join(bnd.filter(!$"is_b").select($"doc_id".as("b"), $"band", $"mh"),
          Seq("band", "mh"))
        .select($"a", $"b").distinct()
      val est = cand
        .join(sig.select($"doc_id".as("a"), $"sig".as("siga")), "a")
        .join(sig.select($"doc_id".as("b"), $"sig".as("sigb")), "b")
        .withColumn("matches",
          size(filter(zip_with($"siga", $"sigb", (x, y) => x === y), b => b)))
        .filter($"matches" >= 5)
        .select($"a", $"b")
      val verified = est
        .join(sh.toDF("a", "sha"), "a")
        .join(sh.toDF("b", "shb"), "b")
        .select($"a", $"b",
          size(array_intersect($"sha", $"shb")).cast("long").as("inter"),
          size(array_union($"sha", $"shb")).cast("long").as("uni"))
        .filter($"inter" * 2 >= $"uni")
        .select($"a", $"b", expr("inter * 1000000L div uni").as("sim_ppm"))
      verified.groupBy($"a")
        .agg(count(lit(1)).as("n_matches"),
          max(struct($"sim_ppm", (-$"b").as("nb"))).as("m"))
        .select($"a".as("doc_id"), $"n_matches",
          (-$"m.nb").as("best_match"), $"m.sim_ppm".as("best_sim_ppm"))
    }),

    // ---- hard-pair mining: same vocabulary, different phrasing ------
    // The contrastive-training / dedup-stress worklist: pairs whose
    // unigram BAG distributions nearly coincide (cos² ≥ 0.7 on exact
    // word counts) while their 3-gram shingle Jaccard stays ≤ 0.1 —
    // "same topic words, different composition". These fool
    // bag-of-words retrieval (hard negatives) and are exactly the
    // pairs a shingle-based near-dup system must NOT merge, so they
    // double as its adversarial acceptance set (q36's planted
    // near-dups sit at the opposite corner: both high). Candidates
    // come from shingle blocking with a df ≤ 64 key cap (the q93
    // posting prefilter — a hot boilerplate gram can't explode the
    // pair space); bag cosine² is exact integers via the q209 DECIMAL
    // route; never all-pairs.
    "q275_hard_pairs" -> ((s, d) => {
      import s.implicits._
      graft.GraftExtensions.ensureRegistered(s)
      val shl = shingles(s, d).cache() // harness-released (per-query clearCache)
      val grams = shl.select($"doc_id", explode($"sh").as("g"))
      val keys = grams.groupBy($"g").agg(count(lit(1)).as("df"))
        .filter($"df" <= 64).select($"g")
      val gk = grams.join(keys, "g")
      val cp = gk.select($"doc_id".as("a"), $"g")
        .join(gk.select($"doc_id".as("b"), $"g"), "g")
        .filter($"a" < $"b").select($"a", $"b").distinct()
      val wc = T.documents(s, d)
        .select($"doc_id", explode(split($"text", " ")).as("w"))
        .groupBy($"doc_id", $"w").agg(count(lit(1)).as("c"))
        .cache() // harness-released (per-query clearCache)
      // the dot-product stage is the heavy one (measured r20: the
      // candidate set is ~1.1M pairs at sf0.1), and the r19 form paid
      // for it in JOIN MACHINERY: cp ⋈ wc exploded every pair into one
      // row per word of the left doc (|pairs|·|words/doc| ≈ 10⁸ rows),
      // equi-joined the right side on the word, and hash-aggregated
      // back to pair grain. Guide §1.2: fix the algorithm — compute
      // each pair's Σ c_a·c_b as ONE sorted sparse-vector merge
      // (native sparse_dot expression) over per-doc word-count vectors
      // built once. Words are re-keyed to a PROVABLY INJECTIVE id
      // (xxhash64 + rank among same-hash words — (h, r) ↔ w is a
      // bijection over the vocabulary), so merging on (h, r) is
      // merging on the word itself: the product multiset per pair is
      // identical to the word-string join's and long addition is
      // order-free, so the result is row-identical to the r19 form and
      // to the oracle's plain word-keyed replay.
      val dict = wc.select($"w").distinct()
        .withColumn("h", xxhash64($"w"))
        .withColumn("r", row_number().over(
          Window.partitionBy($"h").orderBy($"w")))
      val vecs = wc.join(dict, "w")
        .groupBy($"doc_id")
        .agg(sort_array(collect_list(struct($"h", $"r", $"c"))).as("vec"),
          sum($"c" * $"c").cast("bigint").as("n2"))
        .cache() // harness-released (per-query clearCache)
      val nrm = vecs.select($"doc_id", $"n2")
      val dots = cp.join(vecs.select($"doc_id".as("a"), $"vec".as("va")), "a")
        .join(vecs.select($"doc_id".as("b"), $"vec".as("vb")), "b")
        .select($"a", $"b", expr("sparse_dot(va, vb)").as("dot"))
      dots.join(nrm.toDF("a", "n2a"), "a")
        .join(nrm.toDF("b", "n2b"), "b")
        .select($"a", $"b",
          expr("CAST((CAST(dot AS DECIMAL(38,0)) * dot * 1000000) div " +
            "(CAST(n2a AS DECIMAL(38,0)) * n2b) AS BIGINT)").as("cos2_ppm"))
        .join(shl.toDF("a", "sha"), "a")
        .join(shl.toDF("b", "shb"), "b")
        .select($"a", $"b", $"cos2_ppm",
          expr("CAST(size(array_intersect(sha, shb)) AS BIGINT) * 1000000L" +
            " div CAST(size(array_union(sha, shb)) AS BIGINT)").as("jac_ppm"))
        .filter($"cos2_ppm" >= 700000L && $"jac_ppm" <= 100000L)
    }),

    // ---- fuzzy record linkage (collapse-then-link) ------------------
    // Entity resolution over part names — the blocking + edit-distance
    // pattern of classic record linkage, arranged so the quadratic
    // step never touches corpus-scale data: the corpus is first
    // COLLAPSED to distinct (adjective, noun) name keys with
    // multiplicities (one hash agg — the only full-table shuffle; the
    // distinct space is vocabulary-bounded and does not grow with
    // rows), then candidates are generated by blocking on the noun
    // token and verified by levenshtein(adj_a, adj_b) <= 2 inside each
    // block. Pair weight n_a * n_b recovers the row-level linked-pair
    // count without ever joining row-level data — at 100 TB the
    // pairwise stage still runs on a few hundred distinct keys.
    // Spark's levenshtein and DuckDB's agree (classic Wagner–Fischer),
    // so the oracle checks the distances bit-for-bit; the threshold is
    // discriminative on this vocabulary (links cold~old=1, new~red=2,
    // old~red=2; must NOT link hot~old=3).
    "q177_record_linkage" -> ((s, d) => {
      import s.implicits._
      val names = T.part(s, d)
        .select(split($"p_name", " ").as("t"), $"p_partkey")
        .select($"t".getItem(0).as("adj"), $"t".getItem(1).as("noun"),
          $"p_partkey")
        .groupBy($"adj", $"noun")
        .agg(count(lit(1)).as("c"), min($"p_partkey").as("canon"))
      val a = names.select($"noun", $"adj".as("adj_a"), $"c".as("n_a"),
        $"canon".as("canon_a"))
      val b = names.select($"noun", $"adj".as("adj_b"), $"c".as("n_b"),
        $"canon".as("canon_b"))
      a.join(b, Seq("noun"))
        .filter($"adj_a" < $"adj_b" && levenshtein($"adj_a", $"adj_b") <= 2)
        .select($"noun", $"adj_a", $"adj_b",
          ($"n_a" * $"n_b").cast("long").as("pair_weight"),
          least($"canon_a", $"canon_b").as("canon_key"))
    }),

    // ---- blocking-quality audit: reduction ratio vs completeness ----
    // The acceptance audit for q177's blocking choice [Christen, "Data
    // Matching", Springer'12 — the standard blocking metrics]: every
    // blocking scheme trades CANDIDATE REDUCTION (how many of the
    // K·(K−1)/2 key pairs it avoids scoring) against PAIR COMPLETENESS
    // (what fraction of true matches it still co-blocks). Ground truth
    // = q177's own match rule (same noun, levenshtein(adj) ≤ 2);
    // audited schemes: the shipped noun block (complete by
    // construction), adj-first-char, noun+first-char, and
    // noun+length-bucket — the last two are cheaper and measurably
    // LOSSY (cold~old co-blocks on noun but not on first char). All
    // arithmetic runs over the vocabulary-bounded distinct-key table
    // (the q177 collapse — a few hundred rows at ANY corpus scale), so
    // the audit costs nothing even at 100 TB.
    "q216_blocking_audit" -> ((s, d) => {
      import s.implicits._
      val keys = T.part(s, d)
        .select(split($"p_name", " ").as("t"))
        .select($"t".getItem(0).as("adj"), $"t".getItem(1).as("noun"))
        .distinct()
      val truth = keys.select($"noun", $"adj".as("adj_a"))
        .join(keys.select($"noun", $"adj".as("adj_b")), Seq("noun"))
        .filter($"adj_a" < $"adj_b" && levenshtein($"adj_a", $"adj_b") <= 2)
        .select($"noun", $"adj_a", $"adj_b")
      val nTruth = truth.agg(count(lit(1)).as("n_truth"))
      val allPairs = keys.agg(count(lit(1)).as("nk"))
        .select(expr("(nk * (nk - 1)) div 2").as("all_pairs"))
      def blockOf(scheme: String, adj: org.apache.spark.sql.Column,
                  noun: org.apache.spark.sql.Column) = scheme match {
        case "noun"        => noun
        case "first_char"  => substring(adj, 1, 1)
        case "noun_first"  => concat_ws("|", noun, substring(adj, 1, 1))
        case "noun_lenbin" => concat_ws("|", noun,
          expr("CAST(length(adj) div 3 AS STRING)"))
      }
      Seq("noun", "first_char", "noun_first", "noun_lenbin").map { sc =>
        val blocked = keys.withColumn("blk", blockOf(sc, $"adj", $"noun"))
        val cand = blocked.groupBy($"blk").agg(count(lit(1)).as("k"))
          .agg(sum(expr("(k * (k - 1)) div 2")).cast("long").as("n_candidates"),
            count(lit(1)).as("n_blocks"))
        val captured = truth
          .join(blocked.select($"adj".as("adj_a"), $"noun", $"blk".as("ba")),
            Seq("noun", "adj_a"))
          .join(blocked.select($"adj".as("adj_b"), $"noun", $"blk".as("bb")),
            Seq("noun", "adj_b"))
          .filter($"ba" === $"bb")
          .agg(count(lit(1)).as("n_captured"))
        cand.crossJoin(captured).crossJoin(broadcast(nTruth))
          .crossJoin(broadcast(allPairs))
          .select(lit(sc).as("scheme"), $"n_blocks", $"n_candidates",
            $"n_truth", $"n_captured",
            expr("((all_pairs - n_candidates) * 1000000L) div all_pairs")
              .as("reduction_ppm"),
            expr("(n_captured * 1000000L) div n_truth")
              .as("completeness_ppm"))
      }.reduce(_ unionAll _)
    }))

  /** Shared oracle CTE chain for q339/q340 — the cutSpans arithmetic
    * replayed (h60 = top 15 md5 hex chars, the portable construction),
    * ending with the `spans` CTE of (doc_id, start_char, end_char). */
  private val duckCutSpans: String =
    """occ AS (
      |  SELECT doc_id, p.i AS p,
      |    CAST('0x' || substr(md5(substr(text, CAST(p.i AS INT), 50)),
      |      1, 15) AS BIGINT) AS kh
      |  FROM documents,
      |    LATERAL (SELECT unnest(range(1, length(text) - 48)) AS i) p
      |  WHERE length(text) >= 50),
      |dk AS (SELECT kh FROM occ GROUP BY kh HAVING count(*) >= 2),
      |cand AS (SELECT o.doc_id, o.p FROM occ o JOIN dk USING (kh)),
      |vsub AS (
      |  SELECT c.doc_id, c.p, substr(d.text, CAST(c.p AS INT), 50) AS sub
      |  FROM cand c JOIN documents d USING (doc_id)),
      |vdup AS (SELECT sub FROM vsub GROUP BY sub HAVING count(*) >= 2),
      |vocc AS (SELECT v.doc_id, v.p, v.sub FROM vsub v JOIN vdup USING (sub)),
      |keep AS (SELECT sub, min({'doc_id': doc_id, 'p': p}) AS kk
      |  FROM vocc GROUP BY sub),
      |cuto AS (SELECT v.doc_id, v.p, kk.doc_id AS keeper_doc
      |  FROM vocc v JOIN keep USING (sub)
      |  WHERE NOT (v.doc_id = kk.doc_id AND v.p = kk.p)),
      |cut AS (SELECT DISTINCT doc_id, p FROM cuto),
      |isl AS (
      |  SELECT doc_id, p,
      |    CAST(sum(CASE WHEN prev_end IS NULL OR p > prev_end + 1
      |      THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY doc_id ORDER BY p) AS BIGINT) AS isl
      |  FROM (
      |    SELECT doc_id, p,
      |      max(p + 49) OVER (PARTITION BY doc_id ORDER BY p
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
      |    FROM cut) t),
      |spans AS (
      |  SELECT doc_id, isl, CAST(min(p) AS BIGINT) AS start_char,
      |    CAST(max(p) + 49 AS BIGINT) AS end_char
      |  FROM isl GROUP BY 1, 2)""".stripMargin

  def oracles: Map[String, String] = Map(
    // the identical h60-hashed 8-gram probe: word split on single
    // space (word_ngrams' rule, the q147 replay), per-OCCURRENCE
    // counting on the eval side, distinct hash set on the train side
    "q317_contamination_check" ->
      """WITH split AS (
        |  SELECT doc_id, string_split(text, ' ') AS words,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) % 10 = 0 AS is_eval
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id, is_eval,
        |    CAST('0x' || substr(md5(
        |      array_to_string(words[t.i:t.i+7], ' ')), 1, 15) AS BIGINT)
        |      AS gh
        |  FROM split, unnest(range(1, len(words) - 7 + 1)) AS t(i)),
        |tg AS (SELECT DISTINCT gh FROM grams WHERE NOT is_eval),
        |ev AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        |    CAST(count(*) FILTER (gh IN (SELECT gh FROM tg)) AS BIGINT)
        |      AS n_hit
        |  FROM grams WHERE is_eval GROUP BY 1)
        |SELECT doc_id, n_grams, n_hit,
        |  CAST(n_hit * 1000000 // n_grams AS BIGINT) AS contam_ppm,
        |  CAST(n_hit * 1000000 // n_grams >= 800000 AS BIGINT) AS flagged
        |FROM ev""".stripMargin,

    // shingle-blocked candidates (df <= 64 key cap), exact bag-cosine²
    // through HUGEINT, identical thresholds
    "q275_hard_pairs" ->
      """WITH wl AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |shl AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 1),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
        |  FROM wl WHERE len(w) >= 3),
        |sh AS (SELECT doc_id, unnest(sh) AS g FROM shl),
        |keys AS (SELECT g FROM (SELECT g, count(*) AS df FROM sh GROUP BY 1) k
        |  WHERE df <= 64),
        |gk AS (SELECT sh.doc_id, sh.g FROM sh JOIN keys USING (g)),
        |cp AS (
        |  SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
        |  FROM gk a JOIN gk b ON a.g = b.g AND a.doc_id < b.doc_id),
        |wc AS (
        |  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |    FROM documents) u
        |  GROUP BY 1, 2),
        |nrm AS (SELECT doc_id, CAST(sum(c * c) AS BIGINT) AS n2
        |  FROM wc GROUP BY 1),
        |dots AS (
        |  SELECT cp.a, cp.b, CAST(sum(wa.c * wb.c) AS BIGINT) AS dot
        |  FROM cp JOIN wc wa ON wa.doc_id = cp.a
        |  JOIN wc wb ON wb.doc_id = cp.b AND wb.w = wa.w
        |  GROUP BY 1, 2)
        |SELECT d.a, d.b,
        |  CAST((CAST(d.dot AS HUGEINT) * d.dot * 1000000)
        |    // (CAST(na.n2 AS HUGEINT) * nb.n2) AS BIGINT) AS cos2_ppm,
        |  CAST(len(list_intersect(sa.sh, sb.sh)) AS BIGINT) * 1000000
        |    // CAST(len(list_distinct(list_concat(sa.sh, sb.sh)))
        |      AS BIGINT) AS jac_ppm
        |FROM dots d JOIN nrm na ON na.doc_id = d.a
        |JOIN nrm nb ON nb.doc_id = d.b
        |JOIN shl sa ON sa.doc_id = d.a JOIN shl sb ON sb.doc_id = d.b
        |WHERE (CAST(d.dot AS HUGEINT) * d.dot * 1000000)
        |    // (CAST(na.n2 AS HUGEINT) * nb.n2) >= 700000
        |  AND CAST(len(list_intersect(sa.sh, sb.sh)) AS BIGINT) * 1000000
        |    // CAST(len(list_distinct(list_concat(sa.sh, sb.sh)))
        |      AS BIGINT) <= 100000""".stripMargin,

    "q177_record_linkage" ->
      """WITH n AS (
        |  SELECT split_part(p_name, ' ', 1) AS adj,
        |    split_part(p_name, ' ', 2) AS noun,
        |    count(*) AS c, min(p_partkey) AS canon
        |  FROM part GROUP BY 1, 2)
        |SELECT a.noun, a.adj AS adj_a, b.adj AS adj_b,
        |  CAST(a.c * b.c AS BIGINT) AS pair_weight,
        |  least(a.canon, b.canon) AS canon_key
        |FROM n a JOIN n b ON a.noun = b.noun AND a.adj < b.adj
        |WHERE levenshtein(a.adj, b.adj) <= 2""".stripMargin,

    "q216_blocking_audit" ->
      """WITH keys AS (
        |  SELECT DISTINCT split_part(p_name, ' ', 1) AS adj,
        |    split_part(p_name, ' ', 2) AS noun
        |  FROM part),
        |truth AS (
        |  SELECT a.noun, a.adj AS adj_a, b.adj AS adj_b
        |  FROM keys a JOIN keys b ON a.noun = b.noun AND a.adj < b.adj
        |  WHERE levenshtein(a.adj, b.adj) <= 2),
        |nt AS (SELECT count(*) AS n_truth FROM truth),
        |ap AS (
        |  SELECT (count(*) * (count(*) - 1)) // 2 AS all_pairs FROM keys),
        |blocked AS (
        |  SELECT adj, noun, s.scheme,
        |    CASE s.scheme
        |      WHEN 'noun' THEN noun
        |      WHEN 'first_char' THEN substr(adj, 1, 1)
        |      WHEN 'noun_first' THEN noun || '|' || substr(adj, 1, 1)
        |      WHEN 'noun_lenbin' THEN noun || '|' ||
        |        CAST(length(adj) // 3 AS VARCHAR)
        |    END AS blk
        |  FROM keys CROSS JOIN (VALUES ('noun'), ('first_char'),
        |    ('noun_first'), ('noun_lenbin')) s(scheme)),
        |cand AS (
        |  SELECT scheme,
        |    CAST(sum((k * (k - 1)) // 2) AS BIGINT) AS n_candidates,
        |    count(*) AS n_blocks
        |  FROM (SELECT scheme, blk, count(*) AS k
        |        FROM blocked GROUP BY 1, 2) g
        |  GROUP BY scheme),
        |cap AS (
        |  SELECT ba.scheme, count(*) AS n_captured
        |  FROM truth t
        |  JOIN blocked ba ON ba.noun = t.noun AND ba.adj = t.adj_a
        |  JOIN blocked bb ON bb.noun = t.noun AND bb.adj = t.adj_b
        |    AND bb.scheme = ba.scheme
        |  WHERE ba.blk = bb.blk
        |  GROUP BY ba.scheme)
        |SELECT cand.scheme, n_blocks, n_candidates, nt.n_truth,
        |  CAST(coalesce(cap.n_captured, 0) AS BIGINT) AS n_captured,
        |  CAST(((ap.all_pairs - n_candidates) * 1000000) // ap.all_pairs
        |    AS BIGINT) AS reduction_ppm,
        |  CAST((coalesce(cap.n_captured, 0) * 1000000) // nt.n_truth
        |    AS BIGINT) AS completeness_ppm
        |FROM cand LEFT JOIN cap ON cap.scheme = cand.scheme
        |CROSS JOIN nt CROSS JOIN ap""".stripMargin,

    // the identical binary search as ONE recursive CTE carrying
    // (lo, hi): each level's correlated EXISTS probes length mid =
    // (lo+hi+1)//2; monotonicity of "repeat of length L exists" makes
    // the search path deterministic, so both engines walk the same lo/hi
    "q285_suffix_lrs" ->
      """WITH RECURSIVE bs(lo, hi) AS (
        |  SELECT CAST(0 AS BIGINT),
        |    CAST((SELECT max(length(text)) FROM documents) AS BIGINT)
        |  UNION ALL
        |  SELECT CASE WHEN x.ex THEN x.mid ELSE x.lo END,
        |         CASE WHEN x.ex THEN x.hi ELSE x.mid - 1 END
        |  FROM (
        |    SELECT lo, hi, (lo + hi + 1) // 2 AS mid,
        |      EXISTS (
        |        SELECT 1 FROM (
        |          SELECT d.doc_id,
        |            substr(d.text, CAST(t.i AS INT),
        |              CAST((lo + hi + 1) // 2 AS INT)) AS sub
        |          FROM documents d,
        |            unnest(range(1, length(d.text) - (lo + hi + 1) // 2 + 2))
        |              AS t(i)
        |        ) s GROUP BY sub
        |        HAVING count(DISTINCT doc_id) >= 2 LIMIT 1) AS ex
        |    FROM bs WHERE lo < hi) x),
        |lstar AS (SELECT max(lo) AS l FROM bs WHERE lo = hi),
        |reps AS (
        |  SELECT sub, CAST(count(DISTINCT doc_id) AS BIGINT) AS nd
        |  FROM (
        |    SELECT d.doc_id, substr(d.text, CAST(t.i AS INT),
        |      CAST((SELECT l FROM lstar) AS INT)) AS sub
        |    FROM documents d,
        |      unnest(range(1, length(d.text) - (SELECT l FROM lstar) + 2))
        |        AS t(i)
        |    WHERE (SELECT l FROM lstar) >= 1) s
        |  GROUP BY sub HAVING count(DISTINCT doc_id) >= 2)
        |SELECT (SELECT l FROM lstar) AS lrs_len,
        |  CAST(coalesce(count(*), 0) AS BIGINT) AS n_repeats,
        |  coalesce((min({'sub': sub, 'nd': nd})).sub, '') AS lrs,
        |  CAST(coalesce((min({'sub': sub, 'nd': nd})).nd, 0) AS BIGINT)
        |    AS n_docs
        |FROM reps""".stripMargin,

    "q76_dup_spans" ->
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |  WHERE len(string_split(text, ' ')) >= 5),
        |g AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(1, len(w) - 3),
        |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4])) AS g,
        |    generate_subscripts(list_transform(range(1, len(w) - 3), i -> i), 1) - 1 AS pos
        |  FROM w),
        |dup AS (
        |  SELECT g, count(*) AS n_occ, count(DISTINCT doc_id) AS n_docs
        |  FROM g GROUP BY g HAVING count(*) >= 2)
        |SELECT g.doc_id, count(*) AS n_dup_positions,
        |  count(DISTINCT g.g) AS n_dup_grams,
        |  CAST(min(pos) AS BIGINT) AS first_dup_pos,
        |  max(n_docs) AS max_gram_docs
        |FROM g JOIN dup USING (g)
        |GROUP BY g.doc_id""".stripMargin,

    // same gram construction as q76; islands via prefix cummax
    "q147_dup_regions" ->
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |  WHERE len(string_split(text, ' ')) >= 5),
        |g AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(1, len(w) - 3),
        |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4])) AS g,
        |    generate_subscripts(list_transform(range(1, len(w) - 3), i -> i), 1) - 1 AS pos
        |  FROM w),
        |dup AS (SELECT g FROM g GROUP BY g HAVING count(*) >= 2),
        |pd AS (SELECT doc_id, pos FROM g JOIN dup USING (g)),
        |isl AS (
        |  SELECT doc_id, pos,
        |    CAST(sum(CASE WHEN prev_end IS NULL OR pos > prev_end + 1 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY doc_id ORDER BY pos) AS BIGINT) AS isl
        |  FROM (
        |    SELECT doc_id, pos,
        |      max(pos + 4) OVER (PARTITION BY doc_id ORDER BY pos
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
        |    FROM pd) t),
        |regions AS (
        |  SELECT doc_id, isl, CAST(max(pos) - min(pos) + 5 AS BIGINT) AS rw
        |  FROM isl GROUP BY doc_id, isl),
        |nw AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words
        |       FROM documents)
        |SELECT r.doc_id, count(*) AS n_regions,
        |  CAST(sum(r.rw) AS BIGINT) AS covered_words, nw.n_words,
        |  (CAST(sum(r.rw) AS BIGINT) * 1000000) // nw.n_words AS dup_ppm
        |FROM regions r JOIN nw ON nw.doc_id = r.doc_id
        |GROUP BY r.doc_id, nw.n_words""".stripMargin,

    // the cut-list arithmetic replayed: h60 candidate grouping, exact
    // substring verify, struct-min keeper, char-grain islands
    "q339_dedup_cutlist" ->
      s"""WITH $duckCutSpans
        |SELECT doc_id,
        |  CAST(row_number() OVER (PARTITION BY doc_id ORDER BY start_char)
        |    AS BIGINT) AS span_id,
        |  start_char, end_char, end_char - start_char + 1 AS cut_chars
        |FROM spans""".stripMargin,

    "q340_dedup_reclaimed" ->
      s"""WITH $duckCutSpans,
        |woff AS (
        |  SELECT doc_id, wp, CAST(length(wd) AS BIGINT) AS wlen,
        |    CAST(sum(length(wd) + 1) OVER (PARTITION BY doc_id ORDER BY wp)
        |      - 1 AS BIGINT) AS wend
        |  FROM (
        |    SELECT doc_id, w.i AS wp, ws[CAST(w.i AS INT)] AS wd
        |    FROM (SELECT doc_id, string_split(text, ' ') AS ws
        |          FROM documents) t,
        |      LATERAL (SELECT unnest(range(1, len(ws) + 1)) AS i) w) u),
        |ctok AS (
        |  SELECT w.doc_id, CAST(count(*) AS BIGINT) AS cut_tokens
        |  FROM woff w JOIN spans s ON s.doc_id = w.doc_id
        |    AND w.wend - w.wlen + 1 >= s.start_char AND w.wend <= s.end_char
        |  GROUP BY 1),
        |perdoc AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
        |    CAST(sum(end_char - start_char + 1) AS BIGINT) AS cut_chars
        |  FROM spans GROUP BY 1)
        |SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN p.n_spans IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_docs_cut,
        |  CAST(COALESCE(sum(p.n_spans), 0) AS BIGINT) AS n_spans,
        |  CAST(COALESCE(sum(p.cut_chars), 0) AS BIGINT) AS reclaimed_chars,
        |  CAST(COALESCE(sum(c.cut_tokens), 0) AS BIGINT) AS reclaimed_tokens,
        |  CAST(sum(length(d.text)) AS BIGINT) AS total_chars,
        |  CAST(COALESCE(sum(p.cut_chars), 0) AS BIGINT) * 1000000
        |    // CAST(sum(length(d.text)) AS BIGINT) AS reclaimed_ppm
        |FROM documents d
        |LEFT JOIN perdoc p USING (doc_id)
        |LEFT JOIN ctok c ON c.doc_id = d.doc_id
        |GROUP BY 1""".stripMargin,

    "q354_dedup_attribution" ->
      s"""WITH $duckCutSpans
        |SELECT ks.source AS keeper_source, cs.source AS cut_source,
        |  CAST(count(*) AS BIGINT) AS n_positions,
        |  CAST(count(DISTINCT c.doc_id) AS BIGINT) AS n_cut_docs,
        |  CAST(count(DISTINCT c.keeper_doc) AS BIGINT) AS n_keeper_docs,
        |  CAST(count(DISTINCT {'k': c.keeper_doc, 'c': c.doc_id})
        |    AS BIGINT) AS n_doc_pairs,
        |  CAST(CAST(count(*) AS BIGINT) * 1000000
        |    // (SELECT count(*) FROM cuto) AS BIGINT) AS share_ppm
        |FROM cuto c
        |JOIN documents cs ON cs.doc_id = c.doc_id
        |JOIN documents ks ON ks.doc_id = c.keeper_doc
        |GROUP BY 1, 2""".stripMargin,

    "q35_exact_dedup" ->
      """SELECT user_id, event_type, value, props, count(*) AS n,
        |  min(event_id) AS keeper_event_id
        |FROM events
        |GROUP BY user_id, event_type, value, props
        |HAVING count(*) > 1""".stripMargin,

    // ground truth: all-pairs exact Jaccard (verify-scale only)
    "q36_minhash_neardup" ->
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |d AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 1),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
        |  FROM w WHERE len(w) >= 3)
        |SELECT a, b, jaccard FROM (
        |  SELECT x.doc_id AS a, y.doc_id AS b,
        |    round(CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
        |          / len(list_distinct(list_concat(x.sh, y.sh))), 6) AS jaccard
        |  FROM d x JOIN d y ON x.doc_id < y.doc_id) p
        |WHERE jaccard >= 0.5""".stripMargin,

    // the portable KM signature recomputed verbatim (md5-h60 mod 2²⁸,
    // 16 bands) over the ground-truth pair set
    "q257_minhash_jaccard_audit" ->
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |d AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 1),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
        |  FROM w WHERE len(w) >= 3),
        |pairs AS (
        |  SELECT a, b, inter, uni FROM (
        |    SELECT x.doc_id AS a, y.doc_id AS b,
        |      CAST(len(list_intersect(x.sh, y.sh)) AS BIGINT) AS inter,
        |      CAST(len(list_distinct(list_concat(x.sh, y.sh))) AS BIGINT)
        |        AS uni
        |    FROM d x JOIN d y ON x.doc_id < y.doc_id) p
        |  WHERE round(CAST(inter AS DOUBLE) / uni, 6) >= 0.5),
        |h AS (
        |  SELECT doc_id,
        |    CAST('0x' || substr(md5(g), 1, 15) AS BIGINT) % 268435456 AS h1,
        |    CAST('0x' || substr(md5('k:' || g), 1, 15) AS BIGINT)
        |      % 268435456 AS h2
        |  FROM (SELECT doc_id, unnest(sh) AS g FROM d) u),
        |sig AS (
        |  SELECT doc_id, CAST(band AS BIGINT) AS band,
        |    CAST(min(h1 + band * h2) AS BIGINT) AS mh
        |  FROM h, unnest(range(0, 16)) t(band)
        |  GROUP BY 1, 2),
        |est AS (
        |  SELECT p.a, p.b,
        |    CAST(sum(CASE WHEN sa.mh = sb.mh THEN 1 ELSE 0 END) AS BIGINT)
        |      AS matches
        |  FROM pairs p
        |  JOIN sig sa ON sa.doc_id = p.a
        |  JOIN sig sb ON sb.doc_id = p.b AND sb.band = sa.band
        |  GROUP BY 1, 2)
        |SELECT p.a, p.b,
        |  matches * 1000000 // 16 AS est_ppm,
        |  inter * 1000000 // uni AS exact_ppm,
        |  abs(matches * 1000000 // 16 - inter * 1000000 // uni)
        |    AS abs_err_ppm
        |FROM pairs p JOIN est ON est.a = p.a AND est.b = p.b""".stripMargin,

    "q56_dedup_clusters" ->
      """WITH pairs AS (
        |  WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |  d AS (SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 1),
        |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
        |    FROM w WHERE len(w) >= 3)
        |  SELECT x.doc_id AS a, y.doc_id AS b
        |  FROM d x JOIN d y ON x.doc_id < y.doc_id
        |  WHERE CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
        |        / len(list_distinct(list_concat(x.sh, y.sh))) >= 0.5),
        |edges AS (SELECT a, b FROM pairs UNION ALL SELECT b, a FROM pairs),
        |verts AS (SELECT DISTINCT a AS v FROM edges),
        |cc AS (
        |  WITH RECURSIVE r(v, lbl) AS (
        |    SELECT v, v FROM verts
        |    UNION
        |    SELECT e.b, r.lbl FROM r JOIN edges e ON r.v = e.a)
        |  SELECT v, min(lbl) AS lbl FROM r GROUP BY v)
        |SELECT lbl AS cluster_id, count(*) AS n_docs, min(v) AS keeper_doc_id
        |FROM cc GROUP BY lbl""".stripMargin,

    "q74_incremental_dedup" ->
      """WITH docs AS (
        |  SELECT doc_id, lang, md5(text) AS fp FROM documents)
        |SELECT lang, count(*) AS n_new, min(doc_id) AS first_new
        |FROM docs i
        |WHERE doc_id % 2 = 1
        |  AND NOT EXISTS (SELECT 1 FROM docs e
        |                  WHERE e.doc_id % 2 = 0 AND e.fp = i.fp)
        |GROUP BY lang""".stripMargin,

    "q69_editdist_verify" ->
      """WITH pairs AS (
        |  WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |  d AS (SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 1),
        |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
        |    FROM w WHERE len(w) >= 3)
        |  SELECT x.doc_id AS a, y.doc_id AS b
        |  FROM d x JOIN d y ON x.doc_id < y.doc_id
        |  WHERE CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
        |        / len(list_distinct(list_concat(x.sh, y.sh))) >= 0.5)
        |SELECT p.a, p.b,
        |  CAST(levenshtein(da.text, db.text) AS BIGINT) AS edit_dist,
        |  CAST(greatest(length(da.text), length(db.text)) AS BIGINT) AS max_len
        |FROM pairs p
        |JOIN documents da ON p.a = da.doc_id
        |JOIN documents db ON p.b = db.doc_id""".stripMargin,

    // q67's CC drop set re-aggregated at source grain with token mass
    "q283_dedup_savings" ->
      """WITH pairs AS (
        |  WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |  d AS (SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 1),
        |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
        |    FROM w WHERE len(w) >= 3)
        |  SELECT x.doc_id AS a, y.doc_id AS b
        |  FROM d x JOIN d y ON x.doc_id < y.doc_id
        |  WHERE CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
        |        / len(list_distinct(list_concat(x.sh, y.sh))) >= 0.5),
        |edges AS (SELECT a, b FROM pairs UNION ALL SELECT b, a FROM pairs),
        |verts AS (SELECT DISTINCT a AS v FROM edges),
        |cc AS (
        |  WITH RECURSIVE r(v, lbl) AS (
        |    SELECT v, v FROM verts
        |    UNION
        |    SELECT e.b, r.lbl FROM r JOIN edges e ON r.v = e.a)
        |  SELECT v, min(lbl) AS lbl FROM r GROUP BY v),
        |dropped AS (SELECT v FROM cc WHERE v != lbl),
        |t AS (
        |  SELECT source, doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks,
        |    CASE WHEN doc_id IN (SELECT v FROM dropped) THEN 1 ELSE 0 END
        |      AS drp
        |  FROM documents)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(drp) AS BIGINT) AS n_dropped,
        |  CAST(sum(toks) AS BIGINT) AS tokens_total,
        |  CAST(sum(CASE WHEN drp = 1 THEN toks ELSE 0 END) AS BIGINT)
        |    AS tokens_dropped,
        |  CAST(sum(CASE WHEN drp = 1 THEN toks ELSE 0 END) * 1000000
        |    // sum(toks) AS BIGINT) AS savings_ppm
        |FROM t GROUP BY 1""".stripMargin,

    "q67_dedup_keepers" ->
      """WITH pairs AS (
        |  WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |  d AS (SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 1),
        |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
        |    FROM w WHERE len(w) >= 3)
        |  SELECT x.doc_id AS a, y.doc_id AS b
        |  FROM d x JOIN d y ON x.doc_id < y.doc_id
        |  WHERE CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
        |        / len(list_distinct(list_concat(x.sh, y.sh))) >= 0.5),
        |edges AS (SELECT a, b FROM pairs UNION ALL SELECT b, a FROM pairs),
        |verts AS (SELECT DISTINCT a AS v FROM edges),
        |cc AS (
        |  WITH RECURSIVE r(v, lbl) AS (
        |    SELECT v, v FROM verts
        |    UNION
        |    SELECT e.b, r.lbl FROM r JOIN edges e ON r.v = e.a)
        |  SELECT v, min(lbl) AS lbl FROM r GROUP BY v),
        |dropped AS (SELECT v FROM cc WHERE v != lbl)
        |SELECT lang, count(*) AS n_kept,
        |  CAST(sum(n_chars) AS BIGINT) AS kept_chars, min(doc_id) AS first_kept
        |FROM documents WHERE doc_id NOT IN (SELECT v FROM dropped)
        |GROUP BY lang""".stripMargin,

    // all-pairs near-dup relation aggregated to the source-pair matrix
    "q143_source_overlap" ->
      """WITH w AS (
        |  SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
        |d AS (
        |  SELECT doc_id, source, list_distinct(list_transform(range(1, len(w) - 2),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS sh
        |  FROM w WHERE len(w) >= 4)
        |SELECT least(x.source, y.source) AS sa,
        |  greatest(x.source, y.source) AS sb, count(*) AS n_pairs
        |FROM d x JOIN d y ON x.doc_id < y.doc_id
        |WHERE 2 * len(list_intersect(x.sh, y.sh))
        |      >= len(list_distinct(list_concat(x.sh, y.sh)))
        |GROUP BY 1, 2""".stripMargin,

    // ground truth the prefix filter must reproduce EXACTLY: all-pairs
    // 4-gram Jaccard at τ = 1/2 (integer acceptance: 2·inter >= uni)
    "q134_ngram_jaccard" ->
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |d AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 2),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS sh
        |  FROM w WHERE len(w) >= 4)
        |SELECT a, b, inter, uni,
        |  round(CAST(inter AS DOUBLE) / uni, 6) AS jaccard
        |FROM (
        |  SELECT x.doc_id AS a, y.doc_id AS b,
        |    CAST(len(list_intersect(x.sh, y.sh)) AS BIGINT) AS inter,
        |    CAST(len(list_distinct(list_concat(x.sh, y.sh))) AS BIGINT) AS uni
        |  FROM d x JOIN d y ON x.doc_id < y.doc_id) p
        |WHERE 2 * inter >= uni""".stripMargin,

    // ground truth: all-pairs directed containment (verify-scale only)
    "q152_containment_join" ->
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |d AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 2),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS sh
        |  FROM w WHERE len(w) >= 4)
        |SELECT a, b, inter, n_a, inter * 1000000 // n_a AS containment_ppm
        |FROM (
        |  SELECT x.doc_id AS a, y.doc_id AS b,
        |    CAST(len(list_intersect(x.sh, y.sh)) AS BIGINT) AS inter,
        |    CAST(len(x.sh) AS BIGINT) AS n_a
        |  FROM d x JOIN d y ON x.doc_id != y.doc_id) p
        |WHERE 4 * inter >= 3 * n_a""".stripMargin,

    // ground truth: all-pairs batch×index exact Jaccard (verify-scale
    // only); argmax replicated via the max-over-partition + min-id
    // tie-break (q144's deterministic-argmax pattern)
    "q155_incremental_neardup" ->
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |d AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 1),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
        |  FROM w WHERE len(w) >= 3),
        |b AS (SELECT * FROM d
        |  WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
        |    % 10 = 0),
        |ix AS (SELECT * FROM d
        |  WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
        |    % 10 != 0),
        |scored AS (
        |  SELECT a, bdoc, inter * 1000000 // uni AS sim_ppm FROM (
        |    SELECT b.doc_id AS a, ix.doc_id AS bdoc,
        |      CAST(len(list_intersect(b.sh, ix.sh)) AS BIGINT) AS inter,
        |      CAST(len(list_distinct(list_concat(b.sh, ix.sh))) AS BIGINT) AS uni
        |    FROM b, ix) p
        |  WHERE 2 * inter >= uni),
        |g AS (
        |  SELECT a, bdoc, sim_ppm,
        |    max(sim_ppm) OVER (PARTITION BY a) AS ms,
        |    CAST(count(*) OVER (PARTITION BY a) AS BIGINT) AS nm
        |  FROM scored)
        |SELECT a AS doc_id, nm AS n_matches, min(bdoc) AS best_match,
        |  CAST(ms AS BIGINT) AS best_sim_ppm
        |FROM g WHERE sim_ppm = ms
        |GROUP BY a, nm, ms""".stripMargin,

    "q37_simhash_buckets" -> {
      val bitSums = (0 until 16).map { j =>
        val mask = 1L << j
        s"sum(CASE WHEN (h & $mask) > 0 THEN 1 ELSE -1 END) AS b$j"
      }.mkString(", ")
      val assemble = (0 until 16).map { j =>
        s"CASE WHEN b$j >= 0 THEN ${1L << j} ELSE 0 END"
      }.mkString(" + ")
      s"""WITH toks AS (
        |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tk
        |  FROM documents),
        |hashed AS (
        |  SELECT doc_id, CAST('0x' || substr(md5(tk), 1, 15) AS BIGINT) AS h
        |  FROM toks),
        |bits AS (
        |  SELECT doc_id, $bitSums FROM hashed GROUP BY doc_id),
        |sh AS (
        |  SELECT doc_id, CAST($assemble AS BIGINT) AS simhash FROM bits)
        |SELECT simhash, count(*) AS n_docs, min(doc_id) AS keeper_doc_id
        |FROM sh GROUP BY simhash HAVING count(*) > 1""".stripMargin
    },

    // ground truth the pigeonhole index must reproduce EXACTLY:
    // all-pairs 60-bit simhash popcount at 1 <= d <= 3 (d=0 is q37's
    // relation, excluded here)
    "q136_simhash_hamming" -> {
      val bitSums = (0 until 60).map { j =>
        val mask = 1L << j
        s"sum(CASE WHEN (h & $mask) > 0 THEN 1 ELSE -1 END) AS b$j"
      }.mkString(", ")
      val assemble = (0 until 60).map { j =>
        s"CASE WHEN b$j >= 0 THEN ${1L << j} ELSE 0 END"
      }.mkString(" + ")
      s"""WITH toks AS (
        |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tk
        |  FROM documents),
        |hashed AS (
        |  SELECT doc_id, CAST('0x' || substr(md5(tk), 1, 15) AS BIGINT) AS h
        |  FROM toks),
        |bits AS (
        |  SELECT doc_id, $bitSums FROM hashed GROUP BY doc_id),
        |sh AS (
        |  SELECT doc_id, CAST($assemble AS BIGINT) AS simhash FROM bits)
        |SELECT x.doc_id AS a, y.doc_id AS b,
        |  CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT) AS hamming
        |FROM sh x JOIN sh y ON x.doc_id < y.doc_id
        |WHERE bit_count(xor(x.simhash, y.simhash)) BETWEEN 1 AND 3""".stripMargin
    })
}
