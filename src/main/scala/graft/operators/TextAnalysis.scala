package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables => T}

/** Text-analysis operators over `documents` — the LLM-pipeline text
  * surface (SURVEY §7.3): per-doc token/char statistics, per-language
  * quality scoring (stopword ratios), bag-of-words fingerprinting, and
  * top-terms ranking. All expressed with codegen'd built-ins (split /
  * higher-order array functions / md5) — no UDFs in the hot path.
  *
  * Scale notes (100 TB): every query is scan → narrow per-row compute →
  * one hash aggregation; token explosion (q34) shuffles on
  * (lang, term) — high cardinality, no skew hot-spot; nothing is
  * collected or cross-joined.
  */
object TextAnalysis extends QueryPack {

  /** q342's per-doc LIX counts from a (source, text) frame — factored
    * so the batch query and the s52 streaming monitor render the SAME
    * expressions (the Events.haarReport rule, ADVICE r17: an inlined
    * twin silently drifts until the oracle gate fails at verify time).
    * Sentences = terminator count (. ! ?) clamped ≥ 1 per doc; long
    * word = > 6 chars (the LIX convention). */
  private[operators] def lixCounts(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs.select($"source",
      size(split($"text", " ")).cast("long").as("nw"),
      greatest(lit(1L),
        (length($"text") - length(translate($"text", ".!?", "")))
          .cast("long")).as("ns"),
      expr("CAST(size(filter(split(text, ' '), w -> length(w) > 6)) " +
        "AS BIGINT)").as("nl"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"nw").cast("bigint").as("n_words"),
        sum($"ns").cast("bigint").as("n_sents"),
        sum($"nl").cast("bigint").as("n_long"))
  }

  /** q342's LIX/RIX report over pooled (source, n_docs, n_words,
    * n_sents, n_long) counts — the counts are linear, so the s52
    * monitor feeds this the summed per-batch partials. */
  private[operators] def lixReport(counts: DataFrame): DataFrame = {
    val s = counts.sparkSession
    import s.implicits._
    counts.select($"source", $"n_docs", $"n_words", $"n_sents", $"n_long",
      expr("n_words * 1000 div n_sents + n_long * 100000 div n_words")
        .as("lix_milli"),
      expr("n_long * 1000 div n_sents").as("rix_milli"))
  }

  /** q344's per-(source, char) histogram from a (source, text) frame —
    * factored for the s53 streaming monitor (same rule as
    * [[lixCounts]]). */
  private[operators] def charHist(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs
      .select($"source",
        explode(sequence(lit(1), length($"text"))).as("p"), $"text")
      .select($"source", expr("substring(text, p, 1)").as("ch"))
      .groupBy($"source", $"ch").agg(count(lit(1)).cast("long").as("nc"))
  }

  /** q344's millibit-LUT entropy fold over a (source, ch, nc)
    * histogram — the histogram is linear and alphabet-bounded, so the
    * s53 monitor feeds this the summed per-batch partials. */
  private[operators] def entropyReport(hist: DataFrame): DataFrame = {
    val s = hist.sparkSession
    import s.implicits._
    def mb(x: String) = Pipeline.mbLog2Spark(x)
    val tot = hist.groupBy($"source")
      .agg(sum($"nc").cast("bigint").as("nn"),
        count(lit(1)).as("n_sym"))
    hist.join(tot, "source")
      .groupBy($"source")
      .agg(max($"nn").as("n_chars"), max($"n_sym").as("n_symbols"),
        sum(expr(s"nc * (${mb("nn")} - ${mb("nc")})")).cast("bigint")
          .as("hsum"))
      .select($"source", $"n_chars", $"n_symbols",
        expr("hsum div n_chars").as("h_millibits"))
      .select($"source", $"n_chars", $"n_symbols", $"h_millibits",
        expr("n_chars * h_millibits div 8000").as("min_bytes"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = baseQueries ++ extraQueries

  private def baseQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- LIX/RIX readability profile --------------------------------
    // [Björnsson '68 LIX; Anderson '83 RIX] the READABILITY member of
    // the quality family (q32 counts length/punct/stopwords, q289
    // scores gibberish — neither says "how hard is this to read"):
    // per source, LIX = words/sentences + 100·longwords/words and
    // RIX = longwords/sentences, both in exact milli from SUMMED
    // per-source counts (declared: corpus-level LIX of the pooled
    // counts, not a mean of per-doc scores — the floor runs once per
    // source, engine-identical). Sentences = terminator count
    // (. ! ?) via length minus translate, clamped ≥ 1 per doc; long
    // word = > 6 chars (the LIX convention). One corpus scan → a
    // |sources|-row report; every count is map-side combinable, so
    // the 100 TB shape is one pass.
    "q342_readability_lix" -> ((s, d) => {
      lixReport(lixCounts(T.documents(s, d)))
    }),

    // ---- zeroth-order byte-entropy (the compression floor) -----------
    // [Shannon '48 source coding] the STORAGE-planning dial next to
    // the lexical-diversity family (q196 Simpson on tokens): per
    // source, the Shannon entropy of the CHARACTER distribution in
    // millibits/char via the shared millibit-log2 LUT (q328's idiom)
    // — H = Σ_c n_c·(mb(N) − mb(n_c)) div N, every term non-negative
    // (mb is monotone) so the floor is engine-identical. min_bytes =
    // N·H div 8000 is the zeroth-order compression floor — what a
    // memoryless coder could reach, the honest lower bound a
    // compression-codec decision starts from. One char explode → a
    // (source × alphabet)-bounded agg; everything after is tiny.
    "q344_byte_entropy" -> ((s, d) => {
      entropyReport(charHist(T.documents(s, d)))
    }),

    // ---- posting-list compression estimate (delta + Elias-γ) --------
    // [Elias IT'75; Zobel & Moffat CSUR'06 inverted-index compression]
    // the INDEX-storage companion to q344's corpus-entropy floor: what
    // would q93's inverted index cost on disk under the standard
    // delta-gap + Elias-γ coding vs raw 64-bit postings? Per kept gram
    // (q93's df ∈ [2,10] band), postings sort by doc_id, gap = doc −
    // lag(doc) (first posting = doc_id + 1 so ids start at 0 safely),
    // γ-cost = 2·bitlen(gap) − 1 bits — bitlen via length(bin(·)),
    // unpadded in both engines (q313's rule). Report per df: grams,
    // postings, raw vs γ bits, ratio in ppm — the size-model a 100 TB
    // index build consults before choosing a codec. Windows are
    // gram-partitioned only; the report is 9 rows.
    "q346_postings_compression" -> ((s, d) => {
      import s.implicits._
      graft.GraftExtensions.ensureRegistered(s)
      val grams = T.documents(s, d)
        .select($"doc_id", explode(expr("word_ngrams(text, 2)")).as("gram"))
        .distinct()
      val keep = grams.groupBy($"gram").agg(count(lit(1)).as("df"))
        .filter($"df".between(2, 10))
      val wg = Window.partitionBy($"gram").orderBy($"doc_id")
      grams.join(keep, Seq("gram"))
        .withColumn("gap",
          coalesce($"doc_id" - lag($"doc_id", 1).over(wg), $"doc_id" + 1))
        .select($"gram", $"df",
          (lit(2L) * length(expr("bin(gap)")) - 1L).cast("long")
            .as("gbits"))
        .groupBy($"df")
        .agg(countDistinct($"gram").as("n_grams"),
          count(lit(1)).cast("bigint").as("n_postings"),
          sum($"gbits").cast("bigint").as("gamma_bits"))
        .select($"df", $"n_grams", $"n_postings",
          ($"n_postings" * 64L).cast("bigint").as("raw_bits"),
          $"gamma_bits",
          expr("gamma_bits * 1000000 div (n_postings * 64)")
            .as("ratio_ppm"))
    }),

    // ---- per-doc token/char stats -----------------------------------
    "q31_text_stats" -> ((s, d) => {
      import s.implicits._
      T.documents(s, d)
        .select($"doc_id", split($"text", " ").as("w"), length($"text").as("n_chars_m"))
        .select($"doc_id",
          size($"w").cast("bigint").as("n_tokens"),
          $"n_chars_m".cast("bigint").as("n_chars_measured"),
          size(array_distinct($"w")).cast("bigint").as("n_unique_tokens"),
          round(($"n_chars_m" - size($"w") + 1).cast("double") / size($"w"), 4)
            .as("avg_token_len"))
    }),

    // ---- per-language quality profile -------------------------------
    "q32_lang_quality" -> ((s, d) => {
      import s.implicits._
      val perDoc = T.documents(s, d)
        .select($"lang", $"n_chars", split($"text", " ").as("w"))
        .select($"lang", $"n_chars",
          size($"w").cast("bigint").as("toks"),
          size(filter($"w", w => w.isin("the", "a"))).cast("bigint").as("stops"))
      perDoc.groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_chars").cast("bigint").as("total_chars"),
          sum($"toks").cast("bigint").as("total_tokens"),
          round(sum($"stops").cast("double") / sum($"toks"), 6).as("stopword_ratio"))
    }),

    // ---- bag-of-words fingerprint dedup -----------------------------
    // Docs sharing an identical vocabulary SET collide — exact dedup
    // over a normalized fingerprint (hash-groupBy, the canonical
    // shape: one shuffle on the fingerprint, no pairwise compare).
    "q33_bag_fingerprint" -> ((s, d) => {
      import s.implicits._
      T.documents(s, d)
        .select($"doc_id",
          md5(array_join(array_sort(array_distinct(split($"text", " "))), " "))
            .as("fingerprint"))
        .groupBy($"fingerprint")
        .agg(count(lit(1)).as("n_docs"), min($"doc_id").as("keeper_doc_id"))
    }),

    // ---- salted global heavy hitters --------------------------------
    // Two-phase aggregation with an explicit salt: the global term
    // count is a canonical skew case (a handful of stopwords dominate)
    // — phase 1 aggregates (term, salt) partials across 16 salt
    // buckets so no single reducer owns a hot term, phase 2 merges the
    // 16 partials per term. Identical result to a direct groupBy;
    // at 100 TB the salt bounds the largest reduce-side group.
    "q48_salted_heavy_hitters" -> ((s, d) => {
      import s.implicits._
      val partial = T.documents(s, d)
        .select(explode(split($"text", " ")).as("term"),
          pmod($"doc_id", lit(16)).as("salt"))
        .groupBy($"term", $"salt").agg(count(lit(1)).as("pn"))
      partial.groupBy($"term").agg(sum($"pn").cast("bigint").as("n"))
        .orderBy($"n".desc, $"term")
        .limit(20)
    }),

    // ---- top terms per language -------------------------------------
    // ---- inverted index (phrase posting lists) ----------------------
    // Search-index build: word-bigram phrase → sorted doc_id posting
    // list (bigrams, not unigrams: the 31-term synthetic vocabulary
    // makes every unigram a stop-word-grade heavy hitter). Two-pass
    // shape for 100 TB safety: pass 1 computes document frequency and
    // keeps only mid-frequency phrases (2 ≤ df ≤ 10), pass 2 collects
    // postings ONLY for survivors — heavy hitters never reach
    // collect_list, so no aggregation buffer scales with corpus size.
    // Both aggs and the semi-joining filter share the `gram` key, and
    // the exploded scan is cached across the two passes. Grams come
    // from the native word_ngrams expression (one compiled pass per
    // doc). Postings serialize as a comma-joined sorted string
    // (hash-comparable across engines).
    "q93_inverted_index" -> ((s, d) => {
      import s.implicits._
      graft.GraftExtensions.ensureRegistered(s)
      val grams = T.documents(s, d)
        .select($"doc_id", explode(expr("word_ngrams(text, 2)")).as("gram"))
        // corpus-scaled: at 100 TB persist to disk/checkpoint instead
        .distinct().cache() // harness-released (per-query clearCache)
      val keep = grams.groupBy($"gram").agg(count(lit(1)).as("df"))
        .filter($"df".between(2, 10))
      grams.join(keep, Seq("gram"))
        .groupBy($"gram", $"df")
        .agg(concat_ws(",",
          expr("transform(sort_array(collect_list(doc_id)), x -> CAST(x AS STRING))"))
          .as("postings"))
    }),

    // ---- top-k via bounded-heap Aggregator (the scale-correct form) -
    // Same answer as q34, different physical shape: q34's window sorts
    // every (lang, term, n) row inside its lang partition; this one
    // aggregates with graft.functions.TopKAgg, so map-side partials
    // cap the shuffle at k rows per lang per partition and no sort
    // ever sees the full term table — the top-k pushdown Spark lacks
    // natively.
    "q110_topk_heap" -> ((s, d) => {
      import s.implicits._
      val counts = T.documents(s, d)
        .select($"lang", explode(split($"text", " ")).as("term"))
        .groupBy($"lang", $"term").agg(count(lit(1)).as("n"))
      val topk = udaf(new graft.functions.TopKAgg(5),
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.STRING,
          org.apache.spark.sql.Encoders.scalaLong))
      counts.groupBy($"lang").agg(topk($"term", $"n").as("tk"))
        .select($"lang", posexplode($"tk"))
        .select($"lang", $"col._1".as("term"), $"col._2".as("n"),
          ($"pos" + 1).cast("bigint").as("rn"))
    }),

    "q34_top_terms_per_lang" -> ((s, d) => {
      import s.implicits._
      val counts = T.documents(s, d)
        .select($"lang", explode(split($"text", " ")).as("term"))
        .groupBy($"lang", $"term").agg(count(lit(1)).as("n"))
      val w = Window.partitionBy($"lang").orderBy($"n".desc, $"term")
      counts.withColumn("rn", row_number().over(w).cast("bigint"))
        .filter($"rn" <= 5)
        .select($"lang", $"term", $"n", $"rn")
    }))

  private val bpePattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  def extraQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- BPE merge-step statistics (tokenizer training shape) -------
    // The first merge step of byte-pair-encoding training: adjacent
    // character-pair frequencies, weighted by word frequency. The
    // scale trick IS the query shape: pair counting runs over the
    // DISTINCT-WORD table (vocabulary-sized, ≪ corpus — this is why
    // real BPE trainers pre-aggregate to word counts), so the corpus
    // is touched once by a word-count agg and the quadratic-ish pair
    // explosion only ever sees the vocabulary. Two shuffles total,
    // both map-side-combinable.
    "q101_bpe_pairs" -> ((s, d) => {
      import s.implicits._
      val words = T.documents(s, d)
        .select(explode(split($"text", " ")).as("w"))
        .filter(length($"w") >= 2)
        .groupBy($"w").agg(count(lit(1)).as("freq"))
      words
        .select($"w", $"freq",
          explode(expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
            .as("pair"))
        .groupBy($"pair")
        .agg(sum($"freq").cast("bigint").as("n_occ"),
          countDistinct($"w").as("n_word_types"))
    }),
    // ---- iterative BPE merge training (the full tokenizer loop) -----
    // [Sennrich+ ACL'16] — q101 is merge step 1's statistics; this is
    // the TRAINING LOOP (VERDICT r12 #5): k times, count adjacent
    // symbol pairs weighted by word frequency, merge the most frequent
    // pair (ties: lexicographic smallest (l, r)) into one symbol in
    // every word, repeat on the merged vocabulary. The declared result
    // is the merge TRAJECTORY — the ordered rule list a tokenizer
    // trainer actually emits. Merge semantics: leftmost-greedy
    // non-overlapping, implemented as a left fold (merge when
    // last(acc)=l ∧ x=r) — exact, because a merged symbol l||r is
    // strictly longer than l, so it can never re-match as the l of an
    // immediately following candidate; the oracle replays the same
    // semantics via candidate-run parity (adjacent candidates occur
    // only when l=r, where greedy takes alternate positions). Scale
    // shape: the corpus is touched ONCE (the word-count agg); each of
    // the k=8 iterations is one pair hash-agg over the VOCABULARY
    // table + a 1-row argmax (loop-control scalar, the q191 rule) + a
    // narrow per-row fold, with localCheckpoint truncating lineage
    // like iterateToFixpointPpm. This is why real BPE trainers
    // pre-aggregate to word counts — k corpus passes become k
    // vocab passes.
    "q248_bpe_merge_loop" -> ((s, d) => {
      import s.implicits._
      bpeTrain(s, d)._1.toDF("step", "left_sym", "right_sym", "merged", "n_occ")
    }),

    // ---- tokenizer fertility audit (apply the trained BPE) -----------
    // The measurement a tokenizer rollout is judged by [Rust+ ACL'21
    // "How Good is Your Tokenizer?" — fertility = tokens per word/
    // char]: q248 TRAINS the merges; this APPLIES the final merged
    // vocabulary back to the corpus and reports per-language
    // compression — tokens per word and chars per token. Short words
    // (< 2 chars, outside the training vocab) count 1 token, matching
    // the byte-fallback convention. Per-lang fertility is the dial
    // that catches a tokenizer under-serving a language before
    // training starts. Scale: training is vocabulary-grain (q248's
    // loop re-run, ~8 vocab-sized aggs); application is one
    // (word)-keyed join of the exploded corpus against the
    // vocab-sized token-count table — no new shuffle class.
    "q338_bpe_fertility" -> ((s, d) => {
      import s.implicits._
      val tokc = bpeTrainedTokenCounts(s, d)
      T.documents(s, d)
        .select($"lang", explode(split($"text", " ")).as("w"))
        .filter(length($"w") >= 1)
        .join(tokc, Seq("w"), "left")
        .select($"lang", coalesce($"toks", lit(1L)).as("toks"),
          length($"w").cast("bigint").as("chars"))
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_words"),
          sum($"toks").cast("bigint").as("n_tokens"),
          sum($"chars").cast("bigint").as("n_chars"))
        .select($"lang", $"n_words", $"n_tokens", $"n_chars",
          expr("n_tokens * 1000 div n_words").as("tokens_per_word_milli"),
          expr("n_chars * 1000 div n_tokens").as("chars_per_token_milli"))
    }),
    // ---- n-gram language-ID heuristic -------------------------------
    // Self-trained profile classifier: top-20 character trigrams per
    // labeled language -> classify each doc by profile overlap
    // (count of shared trigrams; ties broken by language name). On
    // this synthetic same-vocabulary corpus the profiles nearly
    // coincide, so predictions are degenerate — the operator SHAPE is
    // the point: per-lang profile build (one agg + window), then a
    // broadcast-able profile join + per-doc argmax. At 100 TB the
    // profile table stays tiny (langs × 20 rows) regardless of corpus
    // size.
    "q51_langid_ngram" -> ((s, d) => {
      import s.implicits._
      graft.GraftExtensions.ensureRegistered(s)
      // trigram extraction via the native char_ngrams expression (one
      // pass per doc; the substr-HOF form is O(len²) interpreted).
      // Computed once and cached for both the profile build and the
      // scoring pass. At 100 TB the profile build would run on a small
      // sample instead (language profiles converge fast); the scoring
      // pass stays a full scan either way. char_ngrams returns [] for
      // sub-3-char docs; the filter keeps parity with the oracle's
      // length guard (such docs score no overlap either way).
      val docs = T.documents(s, d)
        .filter(length($"text") >= 3)
        .select($"doc_id", $"lang",
          array_distinct(expr("char_ngrams(text, 3)")).as("tg"))
        // corpus-scaled: at 100 TB persist to disk/checkpoint instead
        .cache() // harness-released (per-query clearCache)
      val docTri = docs.select($"doc_id", $"tg")
      val langTri = docs.select($"lang", explode($"tg").as("t"))
        .groupBy($"lang", $"t").agg(count(lit(1)).as("df"))
      val w = Window.partitionBy($"lang").orderBy($"df".desc, $"t")
      // profile as ONE array row per language (langs × 20 trigrams) —
      // scoring is then a broadcast cross of 5 tiny rows against the
      // corpus with a per-row array_intersect, not a 300-trigram
      // explode + shuffle per document
      val profiles = langTri.withColumn("rn", row_number().over(w))
        .filter($"rn" <= 20)
        .groupBy($"lang".as("plang"))
        .agg(array_sort(collect_list($"t")).as("ptg"))
      val scored = docTri.crossJoin(broadcast(profiles))
        .select($"doc_id", $"plang",
          size(array_intersect($"tg", $"ptg")).cast("bigint").as("overlap"))
        .filter($"overlap" >= 1)
      val w2 = Window.partitionBy($"doc_id").orderBy($"overlap".desc, $"plang")
      scored.withColumn("rn", row_number().over(w2)).filter($"rn" === 1)
        .select($"doc_id", $"plang".as("predicted_lang"), $"overlap")
    }),

    // ---- BPE-ish regex tokenization ---------------------------------
    "q52_regex_tokens" -> ((s, d) => {
      import s.implicits._
      T.documents(s, d).select($"doc_id",
        size(split($"text", " ")).cast("bigint").as("ws_tokens"),
        size(expr(s"regexp_extract_all(text, '$bpePattern', 0)")).cast("bigint")
          .as("bpe_ish_tokens"))
    }),

    // ---- repetition detection (boilerplate/spam signal) -------------
    // Max occurrence count of any word trigram within each doc — the
    // classic "repeated n-gram" quality filter (template spam repeats
    // the same phrase). Explode → per-(doc, gram) count → per-doc max:
    // two hash aggs, keys are (doc × gram) then doc — high cardinality,
    // no skew, no window over the whole corpus.
    "q72_repetition" -> ((s, d) => {
      import s.implicits._
      graft.GraftExtensions.ensureRegistered(s)
      val grams = T.documents(s, d)
        .select($"doc_id", expr("word_ngrams(text, 3)").as("gs"))
        .filter(size($"gs") >= 1)
        .select($"doc_id", explode($"gs").as("g"))
      grams.groupBy($"doc_id", $"g").agg(count(lit(1)).as("c"))
        .groupBy($"doc_id")
        .agg(max($"c").as("max_trigram_count"),
          count(lit(1)).as("n_distinct_trigrams"),
          sum($"c").cast("bigint").as("n_trigrams"))
    }),

    // ---- ntile decile bucketing -------------------------------------
    // Stratification assignments: docs bucketed into per-lang length
    // deciles (ntile has identical tie semantics in Spark and DuckDB:
    // buckets differ by at most one row, earlier buckets get the
    // extra). The window partitions per lang, never globally.
    "q73_ntile_deciles" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"lang").orderBy($"n_chars", $"doc_id")
      T.documents(s, d)
        .withColumn("decile", ntile(10).over(w).cast("bigint"))
        .groupBy($"lang", $"decile")
        .agg(count(lit(1)).as("n_docs"),
          min($"n_chars").as("min_chars"), max($"n_chars").as("max_chars"))
    }),

    // ---- bigram LM statistics ---------------------------------------
    // The n-gram language-model table: corpus-wide bigram counts and
    // integer-ppm conditional probabilities p(w2|w1). Explode to
    // (w1, w2), one hash agg, then a window over w1 for the
    // denominator — the window partitions on the vocabulary, never
    // globally. p_ppm is integral div so the gate is engine-exact.
    "q70_bigram_lm" -> ((s, d) => {
      import s.implicits._
      val bi = T.documents(s, d)
        .select(split($"text", " ").as("w"))
        .filter(size($"w") >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(w) - 2)," +
            " i -> struct(element_at(w, i + 1) AS w1, element_at(w, i + 2) AS w2))")).as("b"))
        .select($"b.w1", $"b.w2")
      val counts = bi.groupBy($"w1", $"w2").agg(count(lit(1)).as("n"))
      counts.withColumn("n_w1", sum($"n").over(Window.partitionBy($"w1")))
        .select($"w1", $"w2", $"n", expr("(n * 1000000L) div n_w1").as("p_ppm"))
    }),

    // ---- LM-based document scoring (perplexity-filter shape) --------
    // The model-based quality filter: score every doc by how typical
    // its bigrams are under the corpus's own bigram LM (q70's table).
    // The score is the per-doc sum/avg/min of the integer-ppm
    // conditional probabilities — the integer analog of mean log-
    // likelihood ranking, engine-exact (a float log would not hash-
    // match across engines; the ppm ORDER is what a filter thresholds
    // on, and it is preserved). Low avg_ppm / min_ppm = improbable
    // word transitions = the doc a perplexity filter flags.
    // Scale shape: bigram explode is computed ONCE and cached for its
    // two consumers (LM build, doc scoring); the LM table and the
    // score join both shuffle on the high-cardinality (w1, w2) key;
    // the w1-denominator window partitions on the vocabulary, never
    // globally.
    "q78_lm_doc_score" -> ((s, d) => {
      import s.implicits._
      val bi = T.documents(s, d)
        .select($"doc_id", split($"text", " ").as("w"))
        .filter(size($"w") >= 2)
        .select($"doc_id", explode(expr(
          "transform(sequence(0, size(w) - 2)," +
            " i -> struct(element_at(w, i + 1) AS w1, element_at(w, i + 2) AS w2))")).as("b"))
        .select($"doc_id", $"b.w1", $"b.w2")
        // corpus-scaled: at 100 TB persist to disk/checkpoint instead
        .cache() // harness-released (per-query clearCache)
      val counts = bi.groupBy($"w1", $"w2").agg(count(lit(1)).as("n"))
      val lm = counts
        .withColumn("n_w1", sum($"n").over(Window.partitionBy($"w1")))
        .select($"w1", $"w2", expr("(n * 1000000L) div n_w1").as("p_ppm"))
      bi.join(lm, Seq("w1", "w2"))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          sum($"p_ppm").as("sum_ppm"),
          min($"p_ppm").as("min_ppm"))
        .select($"doc_id", $"n_bigrams", $"sum_ppm", $"min_ppm",
          expr("sum_ppm div n_bigrams").as("avg_ppm"))
    }),

    // ---- pattern redaction (PII-scrub shape) ------------------------
    // The scrubbing stage of a curation pipeline: replace every match
    // of a sensitive pattern, report hit counts, and fingerprint the
    // redacted text so the oracle proves the rewrite is byte-exact,
    // not just counted. Word-boundary regex behaves identically in
    // Java regex and RE2. Pure per-row compute — no shuffle at all.
    "q66_redact" -> ((s, d) => {
      import s.implicits._
      T.documents(s, d).select($"doc_id",
        size(expr("regexp_extract_all(text, '\\\\bcustomer\\\\b', 0)")).cast("bigint")
          .as("n_hits"),
        length(regexp_replace($"text", "\\bcustomer\\b", "[REDACTED]"))
          .cast("bigint").as("redacted_len"),
        md5(regexp_replace($"text", "\\bcustomer\\b", "[REDACTED]")).as("redacted_md5"))
    }),

    // ---- gazetteer mention extraction (dictionary NER) --------------
    // Entity tagging the way production pipelines actually start:
    // a DICTIONARY join, not a model — a curated gazetteer (term →
    // entity type, the external-catalog shape; here an inline 8-row
    // table) broadcasts against the exploded token stream, and
    // mentions aggregate per (lang, etype, term) with doc reach and a
    // per-language document-coverage ppm. The token explode is the
    // corpus-scale stage (narrow, no pre-join shuffle); the dictionary
    // and the per-lang totals are both bounded broadcasts. At 100 TB a
    // multi-word gazetteer swaps the token join for an n-gram join
    // (q77's shape) — same plan skeleton.
    "q189_gazetteer_mentions" -> ((s, d) => {
      import s.implicits._
      val dict = Seq(
        ("spark", "engine"), ("hash", "operator"), ("join", "operator"),
        ("sort", "operator"), ("window", "operator"), ("customer", "entity"),
        ("order", "entity"), ("part", "entity")).toDF("w", "etype")
      val langTotals = T.documents(s, d)
        .groupBy($"lang").agg(count(lit(1)).as("lang_docs"))
      T.documents(s, d)
        .select($"doc_id", $"lang", explode(split($"text", " ")).as("w"))
        .join(broadcast(dict), Seq("w"))
        .groupBy($"lang", $"etype", $"w")
        .agg(count(lit(1)).as("n_mentions"),
          countDistinct($"doc_id").as("n_docs"))
        .join(broadcast(langTotals), Seq("lang"))
        .select($"lang", $"etype", $"w".as("term"), $"n_mentions", $"n_docs",
          expr("n_docs * 1000000L div lang_docs").as("doc_cov_ppm"))
    }),

    // ---- vocabulary growth curve (Heaps-law audit) ------------------
    // The curation diagnostic behind "is more crawl still adding
    // vocabulary?": token volume and FIRST-SEEN new-term count per
    // 100-doc ingestion band, with running totals — the empirical
    // Heaps curve V(n). First-seen is a per-term min(doc_id) (one
    // vocab-keyed agg, never a scan-order dependency), so the result
    // is partition-invariant; the cumulative window runs over the
    // bounded BANDS table only (corpus/100 rows; band width is the
    // knob at 100 TB — q124's band rule).
    "q193_vocab_growth" -> ((s, d) => {
      import s.implicits._
      val toks = T.documents(s, d)
        .select($"doc_id", explode(split($"text", " ")).as("term"))
      val bandTok = toks.groupBy(expr("doc_id div 100").as("band"))
        .agg(count(lit(1)).as("n_tokens"))
      val bandNew = toks.groupBy($"term").agg(min($"doc_id").as("first_doc"))
        .groupBy(expr("first_doc div 100").as("band"))
        .agg(count(lit(1)).as("new_terms"))
      val w = Window.orderBy($"band")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      bandTok.join(bandNew, Seq("band"), "left")
        .na.fill(0L, Seq("new_terms"))
        .withColumn("cum_tokens", sum($"n_tokens").over(w))
        .withColumn("cum_vocab", sum($"new_terms").over(w))
    }),

    // ---- lexical diversity: Simpson index per document --------------
    // The curation quality signal entropy would give, made rational:
    // Simpson's diversity 1 − Σp² = (T² − Σc²)·1e6 div T² over a
    // doc's token counts — 0 for a one-word loop, →1e6 for all-unique
    // text — no libm (Shannon entropy's log is engine-divergent in the
    // last ulp; Simpson ranks repetitive docs the same way). Two
    // narrow aggs: (doc, term) counts then per-doc power sums — the
    // same one-shuffle shape as every per-doc quality gate, and at
    // 100 TB it composes into the q62 curation DAG as one more
    // mergeable signal.
    "q196_lexical_diversity" -> ((s, d) => {
      import s.implicits._
      val docs = T.documents(s, d).select($"doc_id", $"lang")
      T.documents(s, d)
        .select($"doc_id", explode(split($"text", " ")).as("term"))
        .groupBy($"doc_id", $"term").agg(count(lit(1)).as("c"))
        .groupBy($"doc_id")
        .agg(sum($"c").as("n_tokens"),
          countDistinct($"term").as("n_distinct"),
          sum($"c" * $"c").as("s2"))
        .join(docs, "doc_id")
        .select($"doc_id", $"lang", $"n_tokens", $"n_distinct",
          expr("(n_tokens * n_tokens - s2) * 1000000L div " +
            "(n_tokens * n_tokens)").as("simpson_ppm"))
    }),

    // ---- char-bigram surprise (gibberish / encoding-noise filter) ----
    // The character-level quality tier under q31's length/stopword
    // ratios (the C4/Gopher filter family): a SELF-TRAINED char-bigram
    // model scores every doc's mean surprise −log2 p̂(c2|c1) in integer
    // BITS (floor-log2 = length(bin(x))−1, the q210 bit-log — no
    // floats), and the top-20 most surprising docs are the
    // gibberish/mojibake quarantine worklist. Model = corpus bigram
    // counts (bounded by charset², broadcast); scoring = one pass over
    // the corpus bigrams + a doc-grain agg; top-20 compiles to
    // TakeOrderedAndProject (tie-broken by doc_id). At 100 TB the
    // model would train on a sample (char distributions converge
    // immediately); the scoring pass is the full scan either way.
    "q273_char_surprise" -> ((s, d) => {
      import s.implicits._
      graft.GraftExtensions.ensureRegistered(s)
      val bg = T.documents(s, d).filter(length($"text") >= 2)
        .select($"doc_id", $"source",
          explode(expr("char_ngrams(text, 2)")).as("p"))
        .cache() // harness-released (per-query clearCache)
      val m2 = bg.groupBy($"p").agg(count(lit(1)).as("c2"))
      val m1 = m2.groupBy(substring($"p", 1, 1).as("ch"))
        .agg(sum($"c2").cast("bigint").as("c1"))
      bg.join(broadcast(m2), "p")
        .join(broadcast(m1), substring($"p", 1, 1) === $"ch")
        .groupBy($"doc_id", $"source")
        .agg(count(lit(1)).as("n_pairs"),
          sum(expr("(length(bin(c1)) - 1) - (length(bin(c2)) - 1)"))
            .cast("bigint").as("bits"))
        .select($"doc_id", $"source", $"n_pairs",
          expr("bits * 1000000L div n_pairs").as("surprise_ppm"))
        .orderBy($"surprise_ppm".desc, $"doc_id").limit(20)
    }),

    // ---- Good–Turing unseen-mass estimate per source -----------------
    // [Good, Biometrika'53] — what q231's hapax share is FOR: the
    // Good–Turing estimate of the probability mass a source's sample
    // has NOT seen yet is p0 = N1/N (singleton tokens over tokens),
    // and the smoothed count for once-seen words is r1* = 2·N2/N1 —
    // the coverage planner's stopping signal (p0 high ⇒ keep crawling
    // this source; p0 → 0 ⇒ the vocabulary is saturated, more data
    // buys repetition). Same two hash aggs as q231 ((source, word)
    // counts → per-source tallies), nothing corpus-scale after; all
    // ratios are int64-safe (N1, N2 ≤ vocabulary size).
    "q271_good_turing" -> ((s, d) => {
      import s.implicits._
      T.documents(s, d)
        .select($"source", explode(split($"text", " ")).as("w"))
        .groupBy($"source", $"w").agg(count(lit(1)).as("c"))
        .groupBy($"source")
        .agg(sum($"c").cast("bigint").as("n_tokens"),
          count(lit(1)).as("n_types"),
          sum(($"c" === 1L).cast("long")).as("n1"),
          sum(($"c" === 2L).cast("long")).as("n2"))
        .select($"source", $"n_tokens", $"n_types", $"n1", $"n2",
          expr("n1 * 1000000L div n_tokens").as("unseen_ppm"),
          expr("CASE WHEN n1 > 0 THEN (2 * n2 * 1000000L) div n1 " +
            "ELSE 0L END").as("r1_star_ppm"))
    }),

    // ---- Chao1 species-richness estimate per source ------------------
    // [Chao, Scand.J.Stat'84] the nonparametric answer to "how many
    // bigram types does this source's POPULATION hold, given the
    // sample?" — the crawl-budget question q271's unseen-MASS estimate
    // doesn't answer (p0 says how much probability is unseen; Chao1
    // says how many TYPES are unseen). Bias-corrected form, exact in
    // int64: chao1 = S_obs + f1(f1−1)/(2(f2+1)) — singletons f1 and
    // doubletons f2 carry all the information, and the (f2+1)
    // correction makes f2 = 0 well-defined. Word BIGRAM types (unigram
    // vocab saturates instantly; bigrams keep growing, which is what
    // makes the estimator informative). Turing sample coverage
    // C = 1 − f1/N rides along. Scale: one bigram explode → (source,
    // bigram) hash agg → per-source tally — q271's exact shape, the
    // heavy shuffle keys on the high-cardinality bigram vocabulary.
    "q289_chao1_richness" -> ((s, d) => {
      import s.implicits._
      graft.GraftExtensions.ensureRegistered(s)
      T.documents(s, d)
        .select($"source", explode(expr("word_ngrams(text, 2)")).as("w"))
        .groupBy($"source", $"w").agg(count(lit(1)).as("c"))
        .groupBy($"source")
        .agg(sum($"c").cast("bigint").as("n_tokens"),
          count(lit(1)).as("n_types"),
          sum(($"c" === 1L).cast("long")).as("f1"),
          sum(($"c" === 2L).cast("long")).as("f2"))
        .select($"source", $"n_tokens", $"n_types", $"f1", $"f2",
          expr("n_types + (f1 * (f1 - 1)) div (2 * (f2 + 1))")
            .as("chao1_est"),
          expr("(n_tokens - f1) * 1000000L div n_tokens")
            .as("coverage_ppm"))
    }),

    // ---- Kneser–Ney smoothed bigram LM (exact fixed-point) -----------
    // [Kneser & Ney '95; Chen & Goodman '98] the LM-smoothing step q70's
    // MLE bigram model and q271's Good–Turing mass estimate both point
    // at: interpolated KN with absolute discount D = 3/4 — continuation
    // probability p_cont(w) = N1+(·w)/T (in how many CONTEXTS does w
    // appear, not how often — the "San Francisco" correction), backoff
    // weight D·N1+(v·)/c(v). Exact in int64 with ONE floor per cell:
    // multiply through by 4 (D = 3/4 stays integral) and put the whole
    // interpolation over the common denominator 4·c(v)·T —
    // pkn_ppm = (max(4c−3,0)·10⁶·T + 3·N1v·Ncw·10⁶) div (4·cv·T); the
    // report shows MLE vs KN side by side for the top-20 bigrams.
    // Scale: the corpus-scale work is ONE (v, w) hash agg; the three
    // marginals reduce the BOUNDED bigram-type table, and T is a 1-row
    // scalar — q271's exact shape plus two bounded joins.
    "q292_kneser_ney" -> ((s, d) => {
      import s.implicits._
      graft.GraftExtensions.ensureRegistered(s)
      val cvw = T.documents(s, d)
        .select(explode(expr("word_ngrams(text, 2)")).as("g"))
        .select(split($"g", " ").getItem(0).as("v"),
          split($"g", " ").getItem(1).as("nw"))
        .groupBy($"v", $"nw").agg(count(lit(1)).as("c")).cache() // harness-released (per-query clearCache)
      val cv = cvw.groupBy($"v")
        .agg(sum($"c").cast("bigint").as("cv"), count(lit(1)).as("n1v"))
      val cw = cvw.groupBy($"nw").agg(count(lit(1)).as("ncw"))
      val tt = cvw.agg(count(lit(1)).as("t_types"))
      cvw.join(cv, "v").join(cw, "nw").crossJoin(broadcast(tt))
        .select($"v", $"nw", $"c", $"cv", $"n1v", $"ncw",
          expr("c * 1000000L div cv").as("mle_ppm"),
          expr("(greatest(4 * c - 3, 0L) * 1000000L * t_types" +
            " + 3 * n1v * ncw * 1000000L) div (4 * cv * t_types)")
            .as("pkn_ppm"))
        .orderBy($"c".desc, $"v", $"nw").limit(20)
    }),

    // ---- span-corruption masking plan (T5-style) ---------------------
    // [Raffel+ '20 §3.1.4] the denoising-pretraining data op: choose
    // ~15% of each doc's tokens in contiguous spans (mean length 3),
    // each span to be replaced by one sentinel. The plan is a pure
    // function of the data via h60 — span STARTS where
    // h60(doc#pos) % 20 = 0 (5% of positions), span length
    // 1 + h60(doc#pos#len) % 5 (mean 3 ⇒ ~15% masked) — so a retried
    // 100 TB job regenerates the identical corruption, which is what
    // makes checkpoint-resume of a tokenization pipeline sound.
    // Overlapping spans merge (distinct positions, lag-based span
    // count), truncation at doc end falls out of the position join.
    // Scale: posexplode → per-row hash filter → bounded span explode
    // (≤5×) → (doc, pos) self equi-join → per-doc agg; everything
    // keys on (doc_id, pos), no corpus-scale byproduct. Positions are
    // 1-based in BOTH engines (the hash input must match exactly).
    "q290_span_corruption" -> ((s, d) => {
      import s.implicits._
      val h = graft.functions.PortableHash.h60 _
      val toks = T.documents(s, d)
        .select($"doc_id", size(split($"text", " ")).cast("long")
          .as("n_tokens"), posexplode(split($"text", " ")))
        .select($"doc_id", $"n_tokens", ($"pos" + 1L).as("pos"))
      val starts = toks
        .filter(pmod(h(concat($"doc_id".cast("string"), lit("#"),
          $"pos".cast("string"))), lit(20)) === 0L)
        .select($"doc_id".as("sdoc"),
          explode(sequence($"pos", $"pos" +
            pmod(h(concat($"doc_id".cast("string"), lit("#"),
              $"pos".cast("string"), lit("#len"))), lit(5)))).as("mpos"))
        .distinct()
      val wlag = Window.partitionBy($"doc_id").orderBy($"mpos")
      toks.join(starts, $"pos" === $"mpos" && $"doc_id" === $"sdoc")
        .select($"doc_id", $"n_tokens", $"mpos")
        .withColumn("prev", lag($"mpos", 1).over(wlag))
        .groupBy($"doc_id", $"n_tokens")
        .agg(count(lit(1)).as("n_masked"),
          sum(when($"prev".isNull || $"prev" < $"mpos" - 1L, 1L)
            .otherwise(0L)).cast("bigint").as("n_spans"))
        .select($"doc_id", $"n_tokens", $"n_masked", $"n_spans",
          expr("n_masked * 1000000L div n_tokens").as("mask_ppm"))
    }),

    // ---- hapax legomena rate per source -----------------------------
    // The vocabulary-richness signal next to q193's Heaps curve: the
    // share of a source's word TYPES that occur exactly once in that
    // source (hapax legomena). Template-heavy or boilerplate sources
    // score low (few one-off words); diverse prose scores high — a
    // quality dimension length ratios miss. Two hash aggs: (source,
    // word) counts then per-source type/hapax tallies — one corpus
    // shuffle keyed on the vocabulary, nothing corpus-scale after.
    "q231_hapax_rate" -> ((s, d) => {
      import s.implicits._
      T.documents(s, d)
        .select($"source", explode(split($"text", " ")).as("w"))
        .groupBy($"source", $"w").agg(count(lit(1)).as("c"))
        .groupBy($"source")
        .agg(sum($"c").cast("bigint").as("n_tokens"),
          count(lit(1)).as("n_types"),
          sum(when($"c" === 1L, 1L).otherwise(0L)).cast("bigint")
            .as("n_hapax"))
        .select($"source", $"n_tokens", $"n_types", $"n_hapax",
          expr("(n_hapax * 1000000L) div n_types").as("hapax_type_ppm"))
    }),

    // ---- cross-source vocabulary Jaccard overlap --------------------
    // How much do crawl sources share a vocabulary? Exact pairwise
    // Jaccard |V₁∩V₂| / |V₁∪V₂| between the word-TYPE sets of every
    // source pair — the source-grain companion to q143's cross-source
    // doc overlap (sources with near-identical vocabularies are
    // mixture-plan duplicates; disjoint ones cover different domains).
    // Corpus-scale work is ONE (source, word) distinct agg; the pair
    // table comes from the vocabulary-keyed self equi-join (per-word
    // fan-out ≤ |sources|², a constant — never a cartesian), set
    // sizes join back broadcast, and union = n1 + n2 − inter by
    // inclusion–exclusion. Pairs sharing no word drop out identically
    // in both engines.
    "q238_vocab_overlap" -> ((s, d) => {
      import s.implicits._
      val vocab = T.documents(s, d)
        .select($"source", explode(split($"text", " ")).as("w"))
        .distinct()
      val sizes = vocab.groupBy($"source").agg(count(lit(1)).as("nv"))
      vocab.toDF("s1", "w")
        .join(vocab.toDF("s2", "w2"), $"w" === $"w2" && $"s1" < $"s2")
        .groupBy($"s1", $"s2").agg(count(lit(1)).as("inter"))
        .join(broadcast(sizes.toDF("s1", "n1")), "s1")
        .join(broadcast(sizes.toDF("s2", "n2")), "s2")
        .select($"s1", $"s2", $"n1", $"n2", $"inter",
          expr("(inter * 1000000L) div (n1 + n2 - inter)")
            .as("jaccard_ppm"))
    }),

    // ---- trending-term burst detection ------------------------------
    // Which words suddenly spike against their own trailing baseline?
    // A Kleinberg-lite burst screen for corpus monitoring: per
    // (word, batch) counts against the word's trailing 7-batch sum,
    // burst = c·7e6/(trail + 7) (the +7 Laplace floor keeps brand-new
    // words finite and both engines integer-exact), global top-20 by
    // (burst, word, batch). The time axis is the INGESTION batch
    // (doc_id div 25) — documents carry no timestamp, and
    // ingestion-order batches are exactly what a crawl monitor has.
    // Scale shape: one (word, batch) corpus hash agg; the trailing
    // window partitions on the VOCABULARY key with a RANGE frame (no
    // low-cardinality partition, no global sort); the top-20 compiles
    // to TakeOrderedAndProject.
    "q259_term_burst" -> ((s, d) => {
      import s.implicits._
      val wd = T.documents(s, d)
        .select(expr("doc_id div 25").as("day"),
          explode(split($"text", " ")).as("w"))
        .groupBy($"w", $"day").agg(count(lit(1)).as("c"))
      val wt = Window.partitionBy($"w").orderBy($"day")
        .rangeBetween(-7, -1)
      wd.withColumn("trail", coalesce(sum($"c").over(wt), lit(0L)))
        .filter($"c" >= 5 && $"day" >= 1)
        .select($"w", $"day", $"c", $"trail",
          expr("(c * 7000000L) div (trail + 7)").as("burst_ppm"))
        .orderBy($"burst_ppm".desc, $"w", $"day")
        .limit(20)
    }),

    // ---- pairwise source unigram total-variation distance -----------
    // The FREQUENCY-level companion to q238's set-level vocabulary
    // Jaccard: TVD(P,Q) = ½·Σ_w |p_w − q_w| between every source
    // pair's unigram distributions — the mixture-drift number a data
    // curator reads before treating two crawl sources as
    // interchangeable (Jaccard says the vocabularies coincide; TVD
    // says whether the USAGE does). Divergences needing log (KL/JS)
    // are deliberately avoided — q196's rationale: TVD is rational,
    // so it is exact in integers. Exactness: p_w = c_w/T floors would
    // shed mass, so the sum assembles UNREDUCED as
    // Σ|c1·T2 − c2·T1| / (2·T1·T2) with products in DECIMAL(38)/
    // HUGEINT (the q209 rule — c·T ≤ 1e24 at 100 TB). Words outside
    // the intersection enter by inclusion–exclusion from the
    // intersection coverage: Σ_union = Σ_inter + (T1−S1)·T2 +
    // (T2−S2)·T1 — no outer join. Scale shape: ONE (source, word)
    // hash agg touches the corpus; the pair table is the q238
    // vocabulary-keyed self equi-join (per-word fan-out ≤ |sources|²,
    // a constant); totals join back broadcast.
    "q249_unigram_tvd" -> ((s, d) => {
      import s.implicits._
      val wc = T.documents(s, d)
        .select($"source", explode(split($"text", " ")).as("w"))
        .groupBy($"source", $"w").agg(count(lit(1)).as("c"))
      val tot = wc.groupBy($"source").agg(sum($"c").cast("bigint").as("t"))
      wc.toDF("s1", "w", "c1")
        .join(wc.toDF("s2", "w2", "c2"), $"w" === $"w2" && $"s1" < $"s2")
        .join(broadcast(tot.toDF("s1", "t1")), "s1")
        .join(broadcast(tot.toDF("s2", "t2")), "s2")
        .groupBy($"s1", $"s2")
        .agg(sum(expr("abs(CAST(c1 AS DECIMAL(38,0)) * t2 - " +
            "CAST(c2 AS DECIMAL(38,0)) * t1)")).as("d_inter"),
          sum($"c1").cast("bigint").as("cov1"),
          sum($"c2").cast("bigint").as("cov2"))
        .join(broadcast(tot.toDF("s1", "t1")), "s1")
        .join(broadcast(tot.toDF("s2", "t2")), "s2")
        .select($"s1", $"s2", $"t1".as("n_tokens_1"), $"t2".as("n_tokens_2"),
          expr("CAST((d_inter + CAST(t1 - cov1 AS DECIMAL(38,0)) * t2 + " +
            "CAST(t2 - cov2 AS DECIMAL(38,0)) * t1) * 1000000 div " +
            "(2 * CAST(t1 AS DECIMAL(38,0)) * t2) AS BIGINT)").as("tvd_ppm"))
    }),

    // ---- Goodman–Kruskal gamma: length band vs dup-rate band --------
    // The ORDINAL-CATEGORY association companion to q232's Spearman:
    // gamma = (C − D)/(C + D) over concordant/discordant pairs of
    // (floor-log2 length band, dup-rate decile band) — the statistic
    // for banded scales, where Spearman's total ranks would hide that
    // banding happened. Rational, so exact in integers; the signed
    // numerator floors through the +K shift (K = 1e6 ≥ |gamma|·1e6).
    // Scale shape: pair counting is O(n²) naively, but on a BOUNDED
    // cell grid (≤ ~40 length bands × 11 deciles) C and D are
    // Σ n_ij · (strict 2D dominance sums), computed by two window
    // passes over the DENSIFIED grid (q236's broadcast-densify; both
    // windows partition the ≤440-row grid, never corpus rows) —
    // validated cell-for-cell against a brute-force pair count. The
    // corpus contributes ONE hash agg to the cell table. Products
    // n·dom ≤ n² run in DECIMAL(38)/HUGEINT (q209 rule).
    "q254_goodman_kruskal_gamma" -> ((s, d) => {
      import s.implicits._
      val docs = T.documents(s, d)
        .filter(expr("size(split(text, ' ')) >= 1"))
        .select(expr("length(bin(n_chars)) - 1").as("xb"),
          expr("(((size(split(text, ' ')) - " +
            "size(array_distinct(split(text, ' ')))) * 1000000L) div " +
            "size(split(text, ' '))) div 100000L").as("yb"))
      val cells = docs.groupBy($"xb", $"yb").agg(count(lit(1)).as("n"))
      val xs = cells.select($"xb").distinct()
      val ys = cells.select($"yb").distinct()
      val dense = xs.crossJoin(broadcast(ys))
        .join(cells, Seq("xb", "yb"), "left")
        .select($"xb", $"yb", coalesce($"n", lit(0L)).as("n"))
      val wGtY = Window.partitionBy($"xb").orderBy($"yb")
        .rowsBetween(1, Window.unboundedFollowing)
      val wLtY = Window.partitionBy($"xb").orderBy($"yb")
        .rowsBetween(Window.unboundedPreceding, -1)
      val sufy = dense
        .withColumn("gt_y", coalesce(sum($"n").over(wGtY), lit(0L)))
        .withColumn("lt_y", coalesce(sum($"n").over(wLtY), lit(0L)))
      val wGtX = Window.partitionBy($"yb").orderBy($"xb")
        .rowsBetween(1, Window.unboundedFollowing)
      val dom = sufy
        .withColumn("n_gtgt", coalesce(sum($"gt_y").over(wGtX), lit(0L)))
        .withColumn("n_gtlt", coalesce(sum($"lt_y").over(wGtX), lit(0L)))
      dom.agg(
          sum(expr("CAST(n AS DECIMAL(38,0)) * n_gtgt")).as("cp"),
          sum(expr("CAST(n AS DECIMAL(38,0)) * n_gtlt")).as("dp"))
        .select(expr("CAST(cp AS BIGINT)").as("concordant"),
          expr("CAST(dp AS BIGINT)").as("discordant"),
          expr("CAST(CASE WHEN cp + dp > 0 THEN " +
            "((cp - dp) * 1000000 + 1000000 * (cp + dp)) div (cp + dp) " +
            "- 1000000 ELSE 0 END AS BIGINT)").as("gamma_ppm"))
    }),

    // ---- TF-IDF keyword extraction per source -----------------------
    // [Sparck Jones, J.Doc'72] — each source's 5 most CHARACTERISTIC
    // words: term count × an integer idf, idf_bits = floor(log2(N/df))
    // = length(bin(N div df)) − 1 (the q210 bit-arithmetic log — no
    // libm, bit-identical across engines). Words in every document get
    // idf 0 and vanish — the stopword suppression that makes raw
    // counts useless for this job (q231's hapax view is the opposite
    // tail). Corpus-scale work: one (source, word) tf agg + one
    // per-word distinct-doc df agg, joined on the vocabulary key; the
    // per-source top-5 (score desc, word tie-break) compiles to
    // WindowGroupLimit — no full sort of any vocabulary partition.
    "q243_tfidf_keywords" -> ((s, d) => {
      import s.implicits._
      val toks = T.documents(s, d)
        .select($"source", $"doc_id", explode(split($"text", " ")).as("w"))
      val dft = toks.groupBy($"w")
        .agg(countDistinct($"doc_id").as("df"))
      val nd = T.documents(s, d).agg(count(lit(1)).as("n_docs"))
      val sc = toks.groupBy($"source", $"w").agg(count(lit(1)).as("tf"))
        .join(dft, "w")
        .crossJoin(broadcast(nd))
        .select($"source", $"w", $"tf", $"df",
          expr("tf * (length(bin(n_docs div df)) - 1)").cast("long")
            .as("score"))
      val rk = Window.partitionBy($"source")
        .orderBy($"score".desc, $"w")
      sc.withColumn("rn", row_number().over(rk))
        .filter($"rn" <= 5)
        .select($"source", $"w", $"tf", $"df", $"score")
    }),

    // ---- intra-document repetition audit ----------------------------
    // The Gopher-rules repetition signal [Rae et al., arXiv'21 §A1.1]:
    // per document, the share of trigram OCCURRENCES claimed by its
    // single most-repeated word 3-gram — boilerplate and looping
    // generations score high, prose stays near 1/n_grams. Positional
    // grams (no array_distinct — multiplicity IS the signal, unlike
    // q36's shingle sets), docs under 8 grams excluded as trivially
    // concentrated. Reported per source: docs scored, mean and max
    // top-gram share in exact ppm. Shape: explode + two hash aggs
    // keyed (doc, gram) then doc — corpus-scale work is map-side
    // combinable counting, nothing wider than a doc's gram multiset
    // ever groups together, no windows at all.
    "q244_repetition_audit" -> ((s, d) => {
      import s.implicits._
      graft.GraftExtensions.ensureRegistered(s)
      val ds = T.documents(s, d)
        .select($"doc_id", $"source",
          explode(expr("word_ngrams(text, 3)")).as("g"))
        .groupBy($"doc_id", $"source", $"g").agg(count(lit(1)).as("c"))
        .groupBy($"doc_id", $"source")
        .agg(max($"c").as("top_n"), sum($"c").as("n_grams"))
        .filter($"n_grams" >= 8L)
        .select($"source",
          expr("(top_n * 1000000L) div n_grams").as("rep_ppm"))
      ds.groupBy($"source")
        .agg(count(lit(1)).as("n_docs_scored"),
          expr("sum(rep_ppm) div count(1)").as("mean_rep_ppm"),
          max($"rep_ppm").as("max_rep_ppm"))
    }),

    // ---- chi-squared independence audit: lang × source --------------
    // Is document language independent of crawl source? The corpus-
    // composition forensic behind mixture planning (a source that
    // over-supplies one language skews any lang-stratified sample
    // drawn per source). Per contingency cell the exact χ² contribution
    // (O − E)²/E = (O·N − R·C)²/(N·R·C), reported ×1e6 as an integer.
    // The numerator (O·N − R·C)²·1e6 exceeds int64 once N > ~50k docs,
    // so it promotes to DECIMAL(38,0)/HUGEINT before the floor
    // division (both engines floor non-negative values identically) —
    // the q203 wide-intermediate rule. One corpus hash agg produces
    // the |langs|·|sources|-bounded cell table; marginals and N are
    // tiny rollups of it, joined broadcast.
    "q209_chi2_independence" -> ((s, d) => {
      import s.implicits._
      val cells = T.documents(s, d)
        .groupBy($"lang", $"source").agg(count(lit(1)).as("o"))
      val rows = cells.groupBy($"lang").agg(sum($"o").as("r"))
      val cols = cells.groupBy($"source").agg(sum($"o").as("c"))
      val tot = cells.agg(sum($"o").as("n"))
      cells.join(broadcast(rows), "lang")
        .join(broadcast(cols), "source")
        .crossJoin(broadcast(tot))
        .select($"lang", $"source", $"o", $"r", $"c", $"n",
          expr("(CAST(o * n - r * c AS DECIMAL(38,0)) " +
            "* CAST(o * n - r * c AS DECIMAL(38,0)) * 1000000) " +
            "div (n * r * c)").cast("long").as("contrib_ppm"))
    }),

    // ---- Spearman rank correlation: length vs duplicate-word rate ---
    // Are longer documents more repetitive? The MONOTONE association
    // (Pearson/OLS live at q178/q210; rank correlation is the robust
    // complement) between n_chars and the per-doc duplicate-word rate
    // ((nw − distinct)·1e6 div nw — an in-row array_distinct, no
    // shuffle to derive), per source. Ranks are TOTAL (doc_id
    // tiebreak — the q206 custkey rule), so the classic exact form
    // ρ = 1 − 6Σd²/(n(n²−1)) applies with d = rx − ry, reported as
    // floor ppm through DECIMAL(38)/HUGEINT (Σd² ≤ n³ — the q209
    // wide-intermediate rule, valid to n ≈ 2.5e10 docs per source).
    // The numerator 6e6·Σd² is non-negative so div == // with no
    // shift. Rank computation is BAND-DECOMPOSED (the round-12 rule:
    // no corpus-grain window on a low-cardinality source key): global
    // rank = cum-before from the per-source value-band table + a
    // within-band row_number partitioned on (source, value) — the
    // q227 shape; no window is ever keyed on source alone.
    "q232_spearman_length_dup" -> ((s, d) => {
      import s.implicits._
      val docs = T.documents(s, d)
        .select($"source", $"doc_id", $"n_chars",
          expr("CAST(size(split(text, ' ')) AS BIGINT)").as("nw"),
          expr("CAST(size(array_distinct(split(text, ' '))) AS BIGINT)")
            .as("ndw"))
        .filter($"nw" >= 1)
        .select($"source", $"doc_id", $"n_chars".as("x"),
          expr("((nw - ndw) * 1000000L) div nw").as("y"))
      def cumBefore(vc: String, alias: String): DataFrame = {
        val wcum = Window.partitionBy($"source").orderBy(col(vc))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        docs.groupBy($"source", col(vc)).agg(count(lit(1)).as("c"))
          .withColumn("cum", sum($"c").over(wcum))
          .select($"source", col(vc), ($"cum" - $"c").as(alias))
      }
      val wInX = Window.partitionBy($"source", $"x").orderBy($"doc_id")
      val wInY = Window.partitionBy($"source", $"y").orderBy($"doc_id")
      docs.join(cumBefore("x", "cbx"), Seq("source", "x"))
        .join(cumBefore("y", "cby"), Seq("source", "y"))
        .withColumn("rx", $"cbx" + row_number().over(wInX).cast("long"))
        .withColumn("ry", $"cby" + row_number().over(wInY).cast("long"))
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          sum(expr("CAST(rx - ry AS DECIMAL(38,0)) * (rx - ry)"))
            .as("sum_d2"))
        .select($"source", $"n_docs",
          expr("CAST(CASE WHEN n_docs > 1 THEN 1000000 - " +
            "(sum_d2 * 6000000) div (CAST(n_docs AS DECIMAL(38,0)) * " +
            "(CAST(n_docs AS DECIMAL(38,0)) * n_docs - 1)) " +
            "ELSE 0 END AS BIGINT)").as("rho_ppm"))
    }),

    // ---- Zipf power-law slope via floor-log2 regression -------------
    // Does the corpus vocabulary follow a power law, and with what
    // exponent? freq ∝ rank^(−s) ⟺ log2(freq) linear in log2(rank),
    // fitted by the q178 OLS power sums over INTEGER floor-log2 points:
    // floor(log2(x)) = length(bin(x)) − 1 — pure bit arithmetic,
    // identical on both engines, no libm log whose last ulp could
    // diverge. Vocabulary ranks come from a window over the post-agg
    // term table (bounded by vocabulary size — q124 shows the band
    // decomposition when even that is too wide). slope = num/den left
    // unevaluated (exact-integer convention); s ≈ −num/den.
    // ---- TextRank keyphrase extraction --------------------------------
    // [Mihalcea & Tarau, EMNLP'04] keyword extraction by CENTRALITY
    // instead of frequency (q243's tf-idf axis): build the word
    // co-occurrence graph — content words (length ≥ 4, the stand-in
    // for the paper's POS filter) adjacent in the ORIGINAL token
    // sequence, undirected, edge weight = adjacency count — and rank
    // words by integer-exact weighted PageRank
    // ([[Relational.weightedPageRankPpm]], the q162 kernel on a text
    // substrate: same ppm floors, same fixpoint rule, so the oracle
    // is q162's recursive CTE re-pointed at the word graph). Top 15
    // by (score DESC, word ASC) — a global limit, no window. Scale:
    // the adjacency self-join is keyed on (doc, pos) — narrow,
    // corpus-linear; the PageRank state is VOCABULARY-sized, which
    // grows ~Heaps-sublinearly (q193 measures exactly that), so the
    // fixpoint loop is cheap relative to any corpus scan.
    "q331_textrank_keyphrases" -> ((s, d) => {
      import s.implicits._
      graft.GraftExtensions.ensureRegistered(s)
      val tok = T.documents(s, d)
        .select($"doc_id", posexplode(split($"text", " ")).as(Seq("pos", "w")))
      val pairs = tok.select($"doc_id", $"pos", $"w".as("w1"))
        .join(tok.select($"doc_id", ($"pos" - 1).as("pos"), $"w".as("w2")),
          Seq("doc_id", "pos"))
        .filter(length($"w1") >= 4 && length($"w2") >= 4 && $"w1" =!= $"w2")
        .select(least($"w1", $"w2").as("a"), greatest($"w1", $"w2").as("b"))
        .groupBy($"a", $"b").agg(count(lit(1)).as("cooc"))
        // materialize the VOCAB-sized edge list before the fixpoint:
        // without this every one of the ≤32 iterations re-derives the
        // corpus-scale adjacency self-join (measured 17.4 s → 2.7 s
        // standalone at sf0.1; the localCheckpoint is the q162
        // pre-substrate move for a derived graph)
        .localCheckpoint()
      // capped at 12 synchronous iterations (the q235 capped-fixpoint
      // discipline — production PageRank always runs a fixed budget;
      // the ppm fixpoint on this graph needs 31 rounds for the last
      // ±1 ppm to settle, and the ranking is stable long before);
      // the oracle replays the identical 12-round trajectory
      Relational.weightedPageRankPpm(pairs, maxIters = 12)
        .orderBy($"wpr_ppm".desc, $"v".asc).limit(15)
        .select($"v".as("word"), $"wpr_ppm")
    }),

    "q210_zipf_slope" -> ((s, d) => {
      import s.implicits._
      val counts = T.documents(s, d)
        .select(explode(split($"text", " ")).as("w"))
        .filter(length($"w") >= 1)
        .groupBy($"w").agg(count(lit(1)).as("f"))
      val wr = Window.orderBy($"f".desc, $"w")
      counts.withColumn("rk", row_number().over(wr).cast("long"))
        .select(expr("length(bin(rk)) - 1").cast("long").as("x"),
          expr("length(bin(f)) - 1").cast("long").as("y"))
        .agg(count(lit(1)).as("n_terms"),
          sum($"x").as("sum_x"), sum($"y").as("sum_y"),
          sum($"x" * $"y").as("sum_xy"), sum($"x" * $"x").as("sum_x2"))
        .select($"n_terms", $"sum_x", $"sum_y", $"sum_xy", $"sum_x2",
          ($"n_terms" * $"sum_xy" - $"sum_x" * $"sum_y").as("slope_num"),
          ($"n_terms" * $"sum_x2" - $"sum_x" * $"sum_x").as("slope_den"))
    }))

  /** q248's iterative BPE merge-training loop, factored so q338 can
    * read the FINAL merged-symbol state: `steps` rounds of
    * vocabulary-sized pair agg + (n_occ DESC, l, r) argmax + a greedy
    * left-fold merge applied relationally (the `aggregate` array
    * fold). Returns (trajectory rows, final (w, freq, syms) frame).
    * Each consumer re-trains (no cross-query memo: the loop is
    * driver-paced and cheap at the vocabulary grain — pair counts are
    * vocab-sized, not corpus-sized). */
  private def bpeTrain(s: SparkSession, d: String, steps: Int = 8)
      : (Seq[(Long, String, String, String, Long)], DataFrame) = {
    import s.implicits._
    var words = T.documents(s, d)
      .select(explode(split($"text", " ")).as("w"))
      .filter(length($"w") >= 2)
      .groupBy($"w").agg(count(lit(1)).as("freq"))
      .select($"w", $"freq", split($"w", "").as("syms"))
      .localCheckpoint()
    val traj = scala.collection.mutable.ArrayBuffer[(Long, String, String, String, Long)]()
    var step = 1
    var exhausted = false
    while (step <= steps && !exhausted) {
      val bestOpt = words
        .select($"freq", explode(expr(
          "transform(sequence(1, size(syms) - 1), i -> " +
            "struct(element_at(syms, i) AS l, element_at(syms, i + 1) AS r))"))
          .as("p"))
        .groupBy($"p.l".as("l"), $"p.r".as("r"))
        .agg(sum($"freq").cast("bigint").as("n_occ"))
        .orderBy($"n_occ".desc, $"l", $"r")
        .limit(1).collect().headOption // 1-row argmax: loop-control scalar
      if (bestOpt.isEmpty) {
        // vocabulary exhausted (no adjacent pairs remain — every
        // word fully merged) before the step cap: emit the shorter
        // trajectory, like the oracle's recursion which simply
        // produces no further levels
        exhausted = true
      } else {
        val best = bestOpt.get
        val (l, r) = (best.getString(0), best.getString(1))
        traj += ((step.toLong, l, r, l + r, best.getLong(2)))
        // lit(l)/lit(r), never string-interpolated SQL: symbols come
        // from corpus text and may contain quote characters
        words = words.select($"w", $"freq",
          aggregate($"syms", array().cast("array<string>"), (acc, x) =>
            when(size(acc) > 0 &&
                element_at(acc, -1) === lit(l) && x === lit(r),
              concat(slice(acc, lit(1), size(acc) - 1),
                array(concat(element_at(acc, -1), x))))
            .otherwise(concat(acc, array(x)))).as("syms"))
          .localCheckpoint()
        step += 1
      }
    }
    (traj.toSeq, words)
  }

  /** q248's BPE-training recursion (the candidate-run parity-window
    * merge replay), factored so q338 can read the final state: `st`
    * holds (iter, w, freq, syms) per level, capped at 8 iterations. */
  private lazy val duckBpeSt: String =
    """WITH RECURSIVE words AS (
      |  SELECT w, CAST(count(*) AS BIGINT) AS freq FROM (
      |    SELECT unnest(string_split(text, ' ')) AS w FROM documents) u
      |  WHERE length(w) >= 2 GROUP BY w),
      |st AS (
      |  SELECT 0 AS iter, w, freq, string_split_regex(w, '') AS syms FROM words
      |  UNION ALL
      |  SELECT iter + 1, w, freq,
      |    list(CASE WHEN picked THEN sym || nxt ELSE sym END ORDER BY i) AS syms
      |  FROM (
      |    SELECT *, lag(picked) OVER (PARTITION BY iter, w ORDER BY i) AS prev_picked
      |    FROM (
      |      SELECT *, cand AND
      |        (row_number() OVER (PARTITION BY iter, w, grp, cand ORDER BY i)) % 2 = 1 AS picked
      |      FROM (
      |        SELECT *, (sym = best_l AND nxt IS NOT NULL AND nxt = best_r) AS cand,
      |          i - (row_number() OVER (PARTITION BY iter, w,
      |                (sym = best_l AND nxt IS NOT NULL AND nxt = best_r) ORDER BY i)) AS grp
      |        FROM (
      |          SELECT *,
      |            first_value(sym) OVER (ORDER BY (nxt IS NULL), pair_n DESC, sym, nxt
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS best_l,
      |            first_value(nxt) OVER (ORDER BY (nxt IS NULL), pair_n DESC, sym, nxt
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS best_r
      |          FROM (
      |            SELECT *, sum(CASE WHEN nxt IS NULL THEN 0 ELSE freq END)
      |                OVER (PARTITION BY sym, nxt) AS pair_n
      |            FROM (
      |              SELECT iter, w, freq, i, syms[CAST(i AS INT)] AS sym,
      |                CASE WHEN i < len(syms) THEN syms[CAST(i AS INT)+1] END AS nxt
      |              FROM st, unnest(range(1, len(syms)+1)) t(i)
      |              WHERE iter < 8) e ) pn ) bb ) cc ) pk ) dd
      |  WHERE NOT coalesce(prev_picked, FALSE)
      |  GROUP BY iter, w, freq)""".stripMargin

  /** The trained vocabulary's per-word token counts — q338's fixed
    * small side, shared with s46's streaming monitor. */
  private[operators] def bpeTrainedTokenCounts(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    bpeTrain(s, d)._2.select($"w", size($"syms").cast("bigint").as("toks"))
  }

  def oracles: Map[String, String] = Map(
    // pooled per-source counts, the same two LIX floors
    "q342_readability_lix" ->
      """WITH per AS (
        |  SELECT source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS nw,
        |    CAST(greatest(1,
        |      length(text) - length(translate(text, '.!?', '')))
        |      AS BIGINT) AS ns,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      w -> length(w) > 6)) AS BIGINT) AS nl
        |  FROM documents)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(nw) AS BIGINT) AS n_words,
        |  CAST(sum(ns) AS BIGINT) AS n_sents,
        |  CAST(sum(nl) AS BIGINT) AS n_long,
        |  CAST(CAST(sum(nw) AS BIGINT) * 1000 // CAST(sum(ns) AS BIGINT)
        |    + CAST(sum(nl) AS BIGINT) * 100000 // CAST(sum(nw) AS BIGINT)
        |    AS BIGINT) AS lix_milli,
        |  CAST(CAST(sum(nl) AS BIGINT) * 1000 // CAST(sum(ns) AS BIGINT)
        |    AS BIGINT) AS rix_milli
        |FROM per GROUP BY 1""".stripMargin,

    // the same df band, gap windows, and 2·bitlen−1 γ-costs
    "q346_postings_compression" ->
      """WITH g AS (
        |  SELECT DISTINCT doc_id,
        |    unnest(list_transform(range(1, len(string_split(text, ' '))),
        |      i -> string_split(text, ' ')[i] || ' ' ||
        |           string_split(text, ' ')[i+1])) AS gram
        |  FROM documents WHERE len(string_split(text, ' ')) >= 2),
        |keep AS (SELECT gram, CAST(count(*) AS BIGINT) AS df
        |  FROM g GROUP BY gram HAVING count(*) BETWEEN 2 AND 10),
        |gaps AS (
        |  SELECT g.gram, k.df,
        |    COALESCE(g.doc_id - lag(g.doc_id) OVER
        |      (PARTITION BY g.gram ORDER BY g.doc_id), g.doc_id + 1)
        |      AS gap
        |  FROM g JOIN keep k USING (gram)),
        |costs AS (
        |  SELECT gram, df,
        |    CAST(2 * length(bin(gap)) - 1 AS BIGINT) AS gbits
        |  FROM gaps)
        |SELECT df, CAST(count(DISTINCT gram) AS BIGINT) AS n_grams,
        |  CAST(count(*) AS BIGINT) AS n_postings,
        |  CAST(count(*) * 64 AS BIGINT) AS raw_bits,
        |  CAST(sum(gbits) AS BIGINT) AS gamma_bits,
        |  CAST(sum(gbits) AS BIGINT) * 1000000
        |    // CAST(count(*) * 64 AS BIGINT) AS ratio_ppm
        |FROM costs GROUP BY 1""".stripMargin,

    // the char histogram + the shared millibit-log2 LUT entropy fold
    "q344_byte_entropy" ->
      s"""WITH hist AS (
        |  SELECT source, substr(text, CAST(p.i AS INT), 1) AS ch,
        |    CAST(count(*) AS BIGINT) AS nc
        |  FROM documents,
        |    LATERAL (SELECT unnest(range(1, length(text) + 1)) AS i) p
        |  GROUP BY 1, 2),
        |tot AS (SELECT source, CAST(sum(nc) AS BIGINT) AS nn,
        |    CAST(count(*) AS BIGINT) AS n_sym
        |  FROM hist GROUP BY 1),
        |hh AS (
        |  SELECT h.source, t.nn AS n_chars, t.n_sym AS n_symbols,
        |    CAST(sum(h.nc * (${Pipeline.mbLog2Duck("t.nn")}
        |      - ${Pipeline.mbLog2Duck("h.nc")})) AS BIGINT) AS hsum
        |  FROM hist h JOIN tot t USING (source) GROUP BY 1, 2, 3)
        |SELECT source, n_chars, n_symbols,
        |  hsum // n_chars AS h_millibits,
        |  n_chars * (hsum // n_chars) // 8000 AS min_bytes
        |FROM hh""".stripMargin,

    // q162's recursive-CTE weighted-PageRank replay re-pointed at the
    // word-adjacency graph; identical ppm floors and fixpoint rule
    "q331_textrank_keyphrases" ->
      s"""SELECT part AS word, wpr_ppm FROM (
        |WITH RECURSIVE tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
        |    generate_subscripts(string_split(text, ' '), 1) AS pos
        |  FROM documents),
        |cooc AS (
        |  SELECT least(x.w, y.w) AS a, greatest(x.w, y.w) AS b,
        |    count(*) AS cooc
        |  FROM tok x JOIN tok y ON x.doc_id = y.doc_id AND y.pos = x.pos + 1
        |  WHERE length(x.w) >= 4 AND length(y.w) >= 4 AND x.w != y.w
        |  GROUP BY 1, 2),
        |dirw AS (
        |  SELECT a AS u, b AS v, cooc FROM cooc
        |  UNION ALL SELECT b AS u, a AS v, cooc FROM cooc),
        |wdeg AS (SELECT u, CAST(sum(cooc) AS BIGINT) AS wdeg FROM dirw GROUP BY u),
        |nv AS (SELECT count(*) AS n_v FROM wdeg),
        |pr AS (
        |  SELECT 0 AS iter, u AS v, 1000000 // n_v AS p FROM wdeg CROSS JOIN nv
        |  UNION ALL
        |  SELECT s.iter + 1, s.v, 150000 // nv.n_v + (850000 * s.sc) // 1000000 AS p
        |  FROM (
        |    SELECT pr.iter, d.v,
        |      CAST(sum((pr.p * d.cooc) // w.wdeg) AS BIGINT) AS sc
        |    FROM dirw d JOIN pr ON pr.v = d.u JOIN wdeg w ON w.u = d.u
        |    WHERE pr.iter < 12
        |    GROUP BY pr.iter, d.v) s
        |  CROSS JOIN nv),
        |${Relational.prFixpointTail("wpr_ppm", 12)}
        |) t ORDER BY wpr_ppm DESC, word LIMIT 15""".stripMargin,

    "q189_gazetteer_mentions" ->
      """WITH dict(w, etype) AS (VALUES
        |  ('spark', 'engine'), ('hash', 'operator'), ('join', 'operator'),
        |  ('sort', 'operator'), ('window', 'operator'), ('customer', 'entity'),
        |  ('order', 'entity'), ('part', 'entity')),
        |lt AS (SELECT lang, count(*) AS lang_docs FROM documents GROUP BY 1),
        |tok AS (
        |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |g AS (
        |  SELECT t.lang, dict.etype, t.w, count(*) AS n_mentions,
        |    count(DISTINCT t.doc_id) AS n_docs
        |  FROM tok t JOIN dict ON t.w = dict.w
        |  GROUP BY 1, 2, 3)
        |SELECT g.lang, g.etype, g.w AS term, n_mentions, n_docs,
        |  n_docs * 1000000 // lang_docs AS doc_cov_ppm
        |FROM g JOIN lt ON g.lang = lt.lang""".stripMargin,

    "q193_vocab_growth" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |bt AS (
        |  SELECT doc_id // 100 AS band, count(*) AS n_tokens
        |  FROM toks GROUP BY 1),
        |fs AS (SELECT term, min(doc_id) AS first_doc FROM toks GROUP BY 1),
        |bn AS (
        |  SELECT first_doc // 100 AS band, count(*) AS new_terms
        |  FROM fs GROUP BY 1)
        |SELECT bt.band, bt.n_tokens,
        |  CAST(coalesce(bn.new_terms, 0) AS BIGINT) AS new_terms,
        |  CAST(sum(bt.n_tokens) OVER (ORDER BY bt.band
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_tokens,
        |  CAST(sum(coalesce(bn.new_terms, 0)) OVER (ORDER BY bt.band
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_vocab
        |FROM bt LEFT JOIN bn ON bn.band = bt.band""".stripMargin,

    "q196_lexical_diversity" ->
      """WITH tf AS (
        |  SELECT doc_id, term, count(*) AS c FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |    FROM documents)
        |  GROUP BY 1, 2),
        |g AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |    count(*) AS n_distinct,
        |    CAST(sum(c * c) AS BIGINT) AS s2
        |  FROM tf GROUP BY 1)
        |SELECT g.doc_id, d.lang, g.n_tokens, g.n_distinct,
        |  (g.n_tokens * g.n_tokens - g.s2) * 1000000 //
        |    (g.n_tokens * g.n_tokens) AS simpson_ppm
        |FROM g JOIN documents d ON d.doc_id = g.doc_id""".stripMargin,

    "q72_repetition" ->
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |  WHERE len(string_split(text, ' ')) >= 3),
        |grams AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(w) - 1),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
        |  FROM w),
        |c AS (SELECT doc_id, g, count(*) AS c FROM grams GROUP BY doc_id, g)
        |SELECT doc_id, max(c) AS max_trigram_count,
        |  count(*) AS n_distinct_trigrams,
        |  CAST(sum(c) AS BIGINT) AS n_trigrams
        |FROM c GROUP BY doc_id""".stripMargin,

    "q73_ntile_deciles" ->
      """SELECT lang, decile, count(*) AS n_docs,
        |  min(n_chars) AS min_chars, max(n_chars) AS max_chars
        |FROM (
        |  SELECT lang, n_chars,
        |    CAST(ntile(10) OVER (PARTITION BY lang
        |      ORDER BY n_chars, doc_id) AS BIGINT) AS decile
        |  FROM documents) t
        |GROUP BY lang, decile""".stripMargin,

    "q78_lm_doc_score" ->
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2),
        |bi AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(w)),
        |    i -> struct_pack(w1 := w[i], w2 := w[i + 1]))) AS b
        |  FROM w),
        |bb AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM bi),
        |c AS (SELECT w1, w2, count(*) AS n FROM bb GROUP BY w1, w2),
        |lm AS (
        |  SELECT w1, w2,
        |    CAST((n * 1000000) // (sum(n) OVER (PARTITION BY w1)) AS BIGINT) AS p_ppm
        |  FROM c)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  CAST(sum(p_ppm) AS BIGINT) AS sum_ppm,
        |  min(p_ppm) AS min_ppm,
        |  CAST(CAST(sum(p_ppm) AS BIGINT) // count(*) AS BIGINT) AS avg_ppm
        |FROM bb JOIN lm USING (w1, w2)
        |GROUP BY doc_id""".stripMargin,

    "q70_bigram_lm" ->
      """WITH w AS (
        |  SELECT string_split(text, ' ') AS w FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2),
        |bi AS (
        |  SELECT unnest(list_transform(range(1, len(w)),
        |    i -> struct_pack(w1 := w[i], w2 := w[i + 1]))) AS b
        |  FROM w),
        |c AS (SELECT b.w1 AS w1, b.w2 AS w2, count(*) AS n FROM bi GROUP BY 1, 2)
        |SELECT w1, w2, n,
        |  CAST((n * 1000000) // (sum(n) OVER (PARTITION BY w1)) AS BIGINT) AS p_ppm
        |FROM c""".stripMargin,

    "q66_redact" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '\bcustomer\b')) AS BIGINT) AS n_hits,
        |  CAST(length(regexp_replace(text, '\bcustomer\b', '[REDACTED]', 'g'))
        |    AS BIGINT) AS redacted_len,
        |  md5(regexp_replace(text, '\bcustomer\b', '[REDACTED]', 'g')) AS redacted_md5
        |FROM documents""".stripMargin,

    "q51_langid_ngram" ->
      """WITH doctri AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, length(text) - 1),
        |    i -> substr(text, CAST(i AS INT), 3))) AS tg
        |  FROM documents),
        |langtri AS (
        |  SELECT lang, t, count(*) AS df FROM (
        |    SELECT lang, unnest(list_distinct(list_transform(range(1, length(text) - 1),
        |      i -> substr(text, CAST(i AS INT), 3)))) AS t
        |    FROM documents WHERE length(text) >= 3) u
        |  GROUP BY lang, t),
        |profiles AS (
        |  SELECT lang AS plang, t FROM (
        |    SELECT lang, t, row_number() OVER (PARTITION BY lang ORDER BY df DESC, t) AS rn
        |    FROM langtri) r
        |  WHERE rn <= 20),
        |scored AS (
        |  SELECT d.doc_id, p.plang, count(*) AS overlap
        |  FROM (SELECT doc_id, unnest(tg) AS t FROM doctri) d
        |  JOIN profiles p ON d.t = p.t
        |  GROUP BY d.doc_id, p.plang)
        |SELECT doc_id, plang AS predicted_lang, overlap FROM (
        |  SELECT doc_id, plang, overlap,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY overlap DESC, plang) AS rn
        |  FROM scored) f
        |WHERE rn = 1""".stripMargin,

    "q52_regex_tokens" ->
      s"""SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '$bpePattern')) AS BIGINT) AS bpe_ish_tokens
        |FROM documents""".stripMargin,
    "q31_text_stats" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  CAST(length(text) AS BIGINT) AS n_chars_measured,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_unique_tokens,
        |  round(CAST(length(text) - len(string_split(text, ' ')) + 1 AS DOUBLE)
        |        / len(string_split(text, ' ')), 4) AS avg_token_len
        |FROM documents""".stripMargin,

    "q32_lang_quality" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
        |  round(CAST(sum(len(list_filter(string_split(text, ' '),
        |          w -> w IN ('the', 'a')))) AS DOUBLE)
        |        / sum(len(string_split(text, ' '))), 6) AS stopword_ratio
        |FROM documents GROUP BY lang""".stripMargin,

    "q33_bag_fingerprint" ->
      """SELECT md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
        |    AS fingerprint,
        |  count(*) AS n_docs, min(doc_id) AS keeper_doc_id
        |FROM documents GROUP BY 1""".stripMargin,

    "q48_salted_heavy_hitters" ->
      """SELECT term, count(*) AS n FROM (
        |  SELECT unnest(string_split(text, ' ')) AS term FROM documents) u
        |GROUP BY term ORDER BY n DESC, term LIMIT 20""".stripMargin,

    "q93_inverted_index" ->
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2),
        |u AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(w)),
        |    i -> w[i] || ' ' || w[i+1])) AS gram FROM w),
        |t AS (SELECT DISTINCT doc_id, gram FROM u),
        |keep AS (SELECT gram, count(*) AS df FROM t GROUP BY 1
        |         HAVING count(*) BETWEEN 2 AND 10)
        |SELECT t.gram, keep.df,
        |  string_agg(CAST(t.doc_id AS VARCHAR), ',' ORDER BY t.doc_id) AS postings
        |FROM t JOIN keep ON t.gram = keep.gram
        |GROUP BY t.gram, keep.df""".stripMargin,

    "q34_top_terms_per_lang" ->
      """SELECT lang, term, n, rn FROM (
        |  SELECT lang, term, n,
        |    CAST(row_number() OVER (PARTITION BY lang ORDER BY n DESC, term) AS BIGINT) AS rn
        |  FROM (
        |    SELECT lang, term, count(*) AS n FROM (
        |      SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents) u
        |    GROUP BY lang, term) c) t
        |WHERE rn <= 5""".stripMargin,

    "q110_topk_heap" ->
      """SELECT lang, term, n, rn FROM (
        |  SELECT lang, term, n,
        |    CAST(row_number() OVER (PARTITION BY lang ORDER BY n DESC, term) AS BIGINT) AS rn
        |  FROM (
        |    SELECT lang, term, count(*) AS n FROM (
        |      SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents) u
        |    GROUP BY lang, term) c) t
        |WHERE rn <= 5""".stripMargin,

    "q101_bpe_pairs" ->
      """WITH words AS (
        |  SELECT w, count(*) AS freq FROM (
        |    SELECT unnest(string_split(text, ' ')) AS w FROM documents) u
        |  WHERE length(w) >= 2 GROUP BY w),
        |p AS (
        |  SELECT w, freq,
        |    unnest(list_transform(range(1, length(w)),
        |      i -> substr(w, CAST(i AS INT), 2))) AS pair
        |  FROM words)
        |SELECT pair, CAST(sum(freq) AS BIGINT) AS n_occ,
        |  count(DISTINCT w) AS n_word_types
        |FROM p GROUP BY pair""".stripMargin,

    // the merge trajectory replayed by ONE recursive CTE: each level
    // explodes the word-symbol table, takes the global argmax pair via
    // unbounded first_value windows (NULL next-symbols — word ends —
    // ordered last), and rebuilds each word with candidate-run parity
    // (cand rows grouped by i − row_number; odd positions within a run
    // merge, the row after a merged one is consumed) — the window form
    // of the engine's left fold. The trajectory is then re-derived per
    // level by a plain argmax after the recursion.
    "q248_bpe_merge_loop" ->
      s"""$duckBpeSt,
        |pairs AS (
        |  SELECT iter, syms[CAST(i AS INT)] AS l, syms[CAST(i AS INT)+1] AS r,
        |    CAST(sum(freq) AS BIGINT) AS n_occ
        |  FROM st, unnest(range(1, len(syms))) t(i)
        |  GROUP BY 1, 2, 3),
        |ranked AS (
        |  SELECT iter, l, r, n_occ,
        |    row_number() OVER (PARTITION BY iter ORDER BY n_occ DESC, l, r) AS rn
        |  FROM pairs)
        |SELECT CAST(iter + 1 AS BIGINT) AS step, l AS left_sym, r AS right_sym,
        |  l || r AS merged, n_occ
        |FROM ranked WHERE rn = 1 AND iter < 8""".stripMargin,

    // the same trajectory's FINAL symbol state applied back to the
    // corpus; byte-fallback 1 token for out-of-vocab short words
    "q338_bpe_fertility" ->
      s"""$duckBpeSt,
        |fin AS (
        |  SELECT w, CAST(len(syms) AS BIGINT) AS toks FROM st
        |  WHERE iter = (SELECT max(iter) FROM st)),
        |dw AS (
        |  SELECT lang, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |j AS (
        |  SELECT dw.lang, coalesce(f.toks, 1) AS toks,
        |    CAST(length(dw.w) AS BIGINT) AS chars
        |  FROM dw LEFT JOIN fin f ON f.w = dw.w
        |  WHERE length(dw.w) >= 1)
        |SELECT lang, count(*) AS n_words,
        |  CAST(sum(toks) AS BIGINT) AS n_tokens,
        |  CAST(sum(chars) AS BIGINT) AS n_chars,
        |  CAST(sum(toks) * 1000 // count(*) AS BIGINT)
        |    AS tokens_per_word_milli,
        |  CAST(sum(chars) * 1000 // sum(toks) AS BIGINT)
        |    AS chars_per_token_milli
        |FROM j GROUP BY lang""".stripMargin,

    // the same self-trained model, bit-log floors, and (desc, doc_id)
    // tie-broken top-20
    "q273_char_surprise" ->
      """WITH bg AS (
        |  SELECT doc_id, source, unnest(list_transform(range(1, length(text)),
        |    i -> substr(text, CAST(i AS INT), 2))) AS p
        |  FROM documents WHERE length(text) >= 2),
        |m2 AS (SELECT p, CAST(count(*) AS BIGINT) AS c2 FROM bg GROUP BY 1),
        |m1 AS (SELECT substr(p, 1, 1) AS ch, CAST(sum(c2) AS BIGINT) AS c1
        |  FROM m2 GROUP BY 1),
        |sc AS (
        |  SELECT bg.doc_id, bg.source, CAST(count(*) AS BIGINT) AS n_pairs,
        |    CAST(sum((length(bin(m1.c1)) - 1) - (length(bin(m2.c2)) - 1))
        |      AS BIGINT) AS bits
        |  FROM bg JOIN m2 ON m2.p = bg.p
        |  JOIN m1 ON m1.ch = substr(bg.p, 1, 1)
        |  GROUP BY 1, 2)
        |SELECT doc_id, source, n_pairs,
        |  bits * 1000000 // n_pairs AS surprise_ppm
        |FROM sc ORDER BY surprise_ppm DESC, doc_id LIMIT 20""".stripMargin,

    // same (source, word) counts; N1/N and 2·N2/N1 floors replayed
    "q271_good_turing" ->
      """WITH wc AS (
        |  SELECT source, w, CAST(count(*) AS BIGINT) AS c FROM (
        |    SELECT source, unnest(string_split(text, ' ')) AS w
        |    FROM documents) u
        |  GROUP BY 1, 2)
        |SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
        |  CAST(count(*) AS BIGINT) AS n_types,
        |  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |  CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        |  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1000000
        |    // sum(c) AS BIGINT) AS unseen_ppm,
        |  CAST(CASE WHEN sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) > 0 THEN
        |    2 * sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) * 1000000
        |      // sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)
        |    ELSE 0 END AS BIGINT) AS r1_star_ppm
        |FROM wc GROUP BY 1""".stripMargin,

    "q292_kneser_ney" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w
        |  FROM documents),
        |bg AS (
        |  SELECT unnest(list_transform(range(1, len(w)), i -> w[i])) AS v,
        |    unnest(list_transform(range(1, len(w)), i -> w[i+1])) AS nw
        |  FROM w),
        |cvw AS (SELECT v, nw, CAST(count(*) AS BIGINT) AS c
        |  FROM bg GROUP BY 1, 2),
        |cv AS (SELECT v, CAST(sum(c) AS BIGINT) AS cv,
        |  CAST(count(*) AS BIGINT) AS n1v FROM cvw GROUP BY 1),
        |cw AS (SELECT nw, CAST(count(*) AS BIGINT) AS ncw
        |  FROM cvw GROUP BY 1),
        |tt AS (SELECT CAST(count(*) AS BIGINT) AS t FROM cvw)
        |SELECT cvw.v, cvw.nw, cvw.c, cv.cv, cv.n1v, cw.ncw,
        |  CAST(cvw.c * 1000000 // cv.cv AS BIGINT) AS mle_ppm,
        |  CAST((greatest(4 * cvw.c - 3, 0) * 1000000 * tt.t
        |    + 3 * cv.n1v * cw.ncw * 1000000) // (4 * cv.cv * tt.t)
        |    AS BIGINT) AS pkn_ppm
        |FROM cvw JOIN cv USING (v) JOIN cw USING (nw) CROSS JOIN tt
        |ORDER BY cvw.c DESC, cvw.v, cvw.nw LIMIT 20""".stripMargin,

    "q289_chao1_richness" ->
      """WITH w AS (
        |  SELECT source, string_split(text, ' ') AS w FROM documents),
        |bg AS (
        |  SELECT source,
        |    unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS g
        |  FROM w),
        |wc AS (SELECT source, g, CAST(count(*) AS BIGINT) AS c
        |  FROM bg GROUP BY 1, 2),
        |t AS (
        |  SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
        |    CAST(count(*) AS BIGINT) AS n_types,
        |    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
        |    CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
        |  FROM wc GROUP BY 1)
        |SELECT source, n_tokens, n_types, f1, f2,
        |  CAST(n_types + (f1 * (f1 - 1)) // (2 * (f2 + 1)) AS BIGINT)
        |    AS chao1_est,
        |  CAST((n_tokens - f1) * 1000000 // n_tokens AS BIGINT)
        |    AS coverage_ppm
        |FROM t""".stripMargin,

    "q290_span_corruption" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    generate_subscripts(string_split(text, ' '), 1) AS pos,
        |    len(string_split(text, ' ')) AS n_tokens
        |  FROM documents),
        |starts AS (
        |  SELECT doc_id, pos,
        |    1 + CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#'
        |      || CAST(pos AS VARCHAR) || '#len'), 1, 15) AS BIGINT) % 5 AS sl
        |  FROM toks
        |  WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#'
        |    || CAST(pos AS VARCHAR)), 1, 15) AS BIGINT) % 20 = 0),
        |masked AS (
        |  SELECT DISTINCT doc_id, unnest(range(pos, pos + sl)) AS mpos
        |  FROM starts),
        |mt AS (
        |  SELECT t.doc_id, t.n_tokens, m.mpos
        |  FROM toks t JOIN masked m
        |    ON t.doc_id = m.doc_id AND t.pos = m.mpos)
        |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        |  CAST(count(*) AS BIGINT) AS n_masked,
        |  CAST(sum(CASE WHEN prev IS NULL OR prev < mpos - 1
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_spans,
        |  CAST(count(*) * 1000000 // n_tokens AS BIGINT) AS mask_ppm
        |FROM (SELECT doc_id, n_tokens, mpos,
        |        lag(mpos) OVER (PARTITION BY doc_id ORDER BY mpos) AS prev
        |      FROM mt) g
        |GROUP BY doc_id, n_tokens""".stripMargin,

    "q231_hapax_rate" ->
      """WITH wc AS (
        |  SELECT source, w, count(*) AS c FROM (
        |    SELECT source, unnest(string_split(text, ' ')) AS w
        |    FROM documents) u
        |  GROUP BY 1, 2),
        |g AS (
        |  SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
        |    count(*) AS n_types,
        |    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
        |  FROM wc GROUP BY 1)
        |SELECT source, n_tokens, n_types, n_hapax,
        |  CAST((n_hapax * 1000000) // n_types AS BIGINT) AS hapax_type_ppm
        |FROM g""".stripMargin,

    // inclusion–exclusion Jaccard over the distinct (source, word)
    // sets, replayed on the same whitespace tokenization
    "q238_vocab_overlap" ->
      """WITH vocab AS (
        |  SELECT DISTINCT source, w FROM (
        |    SELECT source, unnest(string_split(text, ' ')) AS w
        |    FROM documents) u),
        |sizes AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS nv
        |  FROM vocab GROUP BY 1),
        |pairs AS (
        |  SELECT a.source AS s1, b.source AS s2,
        |    CAST(count(*) AS BIGINT) AS inter
        |  FROM vocab a JOIN vocab b
        |    ON a.w = b.w AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT s1, s2, z1.nv AS n1, z2.nv AS n2, inter,
        |  CAST((inter * 1000000) // (z1.nv + z2.nv - inter) AS BIGINT)
        |    AS jaccard_ppm
        |FROM pairs
        |JOIN sizes z1 ON z1.source = s1
        |JOIN sizes z2 ON z2.source = s2""".stripMargin,

    // the same integer tf·floor(log2(N/df)) scoring and top-5 pick
    "q243_tfidf_keywords" ->
      """WITH toks AS (
        |  SELECT source, doc_id, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |dft AS (
        |  SELECT w, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        |  FROM toks GROUP BY 1),
        |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
        |sc AS (
        |  SELECT source, t.w, tf, df,
        |    CAST(tf * (length(bin(n_docs // df)) - 1) AS BIGINT) AS score
        |  FROM (SELECT source, w, CAST(count(*) AS BIGINT) AS tf
        |        FROM toks GROUP BY 1, 2) t
        |  JOIN dft ON dft.w = t.w CROSS JOIN nd),
        |rk AS (
        |  SELECT *, row_number() OVER (PARTITION BY source
        |    ORDER BY score DESC, w) AS rn
        |  FROM sc)
        |SELECT source, w, tf, df, score FROM rk WHERE rn <= 5""".stripMargin,

    // positional trigrams via the q36 list_transform pattern (no
    // list_distinct — multiplicity is the signal)
    "q244_repetition_audit" ->
      """WITH w AS (
        |  SELECT doc_id, source, string_split(text, ' ') AS w
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, source,
        |    unnest(list_transform(range(1, len(w) - 1),
        |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
        |  FROM w WHERE len(w) >= 3),
        |c AS (
        |  SELECT doc_id, source, g, CAST(count(*) AS BIGINT) AS c
        |  FROM g GROUP BY 1, 2, 3),
        |ds AS (
        |  SELECT source,
        |    (max(c) * 1000000) // sum(c) AS rep_ppm
        |  FROM c GROUP BY doc_id, source
        |  HAVING sum(c) >= 8)
        |SELECT source, count(*) AS n_docs_scored,
        |  CAST(sum(rep_ppm) // count(*) AS BIGINT) AS mean_rep_ppm,
        |  CAST(max(rep_ppm) AS BIGINT) AS max_rep_ppm
        |FROM ds GROUP BY 1""".stripMargin,

    // the trailing-baseline burst replayed with the identical RANGE
    // frame and Laplace floor
    "q259_term_burst" ->
      """WITH wd AS (
        |  SELECT w, day, CAST(count(*) AS BIGINT) AS c FROM (
        |    SELECT doc_id // 25 AS day,
        |      unnest(string_split(text, ' ')) AS w
        |    FROM documents) u
        |  GROUP BY 1, 2),
        |tr AS (
        |  SELECT w, day, c,
        |    CAST(coalesce(sum(c) OVER (PARTITION BY w ORDER BY day
        |      RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS trail
        |  FROM wd)
        |SELECT w, day, c, trail,
        |  (c * 7000000) // (trail + 7) AS burst_ppm
        |FROM tr WHERE c >= 5 AND day >= 1
        |ORDER BY burst_ppm DESC, w, day LIMIT 20""".stripMargin,

    // the unreduced-fraction TVD replayed: |c1·T2 − c2·T1| in HUGEINT
    // over the intersection join, the missing mass restored by
    // inclusion–exclusion from the intersection coverage
    "q249_unigram_tvd" ->
      """WITH wc AS (
        |  SELECT source, w, CAST(count(*) AS BIGINT) AS c FROM (
        |    SELECT source, unnest(string_split(text, ' ')) AS w
        |    FROM documents) u
        |  GROUP BY 1, 2),
        |tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS t FROM wc GROUP BY 1),
        |inter AS (
        |  SELECT a.source AS s1, b.source AS s2,
        |    CAST(sum(abs(CAST(a.c AS HUGEINT) * tb.t
        |      - CAST(b.c AS HUGEINT) * ta.t)) AS HUGEINT) AS d_inter,
        |    CAST(sum(a.c) AS BIGINT) AS cov1,
        |    CAST(sum(b.c) AS BIGINT) AS cov2
        |  FROM wc a JOIN wc b ON a.w = b.w AND a.source < b.source
        |  JOIN tot ta ON ta.source = a.source
        |  JOIN tot tb ON tb.source = b.source
        |  GROUP BY 1, 2),
        |full_d AS (
        |  SELECT s1, s2, ta.t AS t1, tb.t AS t2,
        |    d_inter + CAST(ta.t - cov1 AS HUGEINT) * tb.t
        |            + CAST(tb.t - cov2 AS HUGEINT) * ta.t AS d_all
        |  FROM inter
        |  JOIN tot ta ON ta.source = s1
        |  JOIN tot tb ON tb.source = s2)
        |SELECT s1, s2, t1 AS n_tokens_1, t2 AS n_tokens_2,
        |  CAST((d_all * 1000000) // (2 * CAST(t1 AS HUGEINT) * t2)
        |    AS BIGINT) AS tvd_ppm
        |FROM full_d""".stripMargin,

    // the dominance-window gamma replayed on the same densified band
    // grid: per-band y-suffix/-prefix sums, then x-suffix sums of
    // those, Σ n·dom in HUGEINT, shifted signed floor
    "q254_goodman_kruskal_gamma" ->
      """WITH docs AS (
        |  SELECT length(bin(n_chars)) - 1 AS xb,
        |    ((CAST(len(string_split(text, ' ')) AS BIGINT)
        |      - len(list_distinct(string_split(text, ' ')))) * 1000000
        |      // len(string_split(text, ' '))) // 100000 AS yb
        |  FROM documents
        |  WHERE len(string_split(text, ' ')) >= 1),
        |cells AS (SELECT xb, yb, CAST(count(*) AS BIGINT) AS n
        |  FROM docs GROUP BY 1, 2),
        |xs AS (SELECT DISTINCT xb FROM cells),
        |ys AS (SELECT DISTINCT yb FROM cells),
        |dense AS (
        |  SELECT xs.xb, ys.yb, coalesce(c.n, 0) AS n
        |  FROM xs CROSS JOIN ys
        |  LEFT JOIN cells c ON c.xb = xs.xb AND c.yb = ys.yb),
        |sufy AS (
        |  SELECT xb, yb, n,
        |    CAST(coalesce(sum(n) OVER (PARTITION BY xb ORDER BY yb
        |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 0)
        |      AS BIGINT) AS gt_y,
        |    CAST(coalesce(sum(n) OVER (PARTITION BY xb ORDER BY yb
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS lt_y
        |  FROM dense),
        |dom AS (
        |  SELECT xb, yb, n,
        |    CAST(coalesce(sum(gt_y) OVER (PARTITION BY yb ORDER BY xb
        |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 0)
        |      AS BIGINT) AS n_gtgt,
        |    CAST(coalesce(sum(lt_y) OVER (PARTITION BY yb ORDER BY xb
        |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 0)
        |      AS BIGINT) AS n_gtlt
        |  FROM sufy),
        |cd AS (
        |  SELECT CAST(sum(CAST(n AS HUGEINT) * n_gtgt) AS HUGEINT) AS cp,
        |    CAST(sum(CAST(n AS HUGEINT) * n_gtlt) AS HUGEINT) AS dp
        |  FROM dom)
        |SELECT CAST(cp AS BIGINT) AS concordant,
        |  CAST(dp AS BIGINT) AS discordant,
        |  CAST(CASE WHEN cp + dp > 0 THEN
        |    ((cp - dp) * 1000000 + 1000000 * (cp + dp)) // (cp + dp)
        |    - 1000000 ELSE 0 END AS BIGINT) AS gamma_ppm
        |FROM cd""".stripMargin,

    // the band-decomposed total ranks replayed: cum-before per
    // (source, value) band + within-band row_number on doc_id, then
    // the exact no-ties Spearman form in HUGEINT
    "q232_spearman_length_dup" ->
      """WITH docs AS (
        |  SELECT source, doc_id, n_chars AS x,
        |    ((nw - ndw) * 1000000) // nw AS y
        |  FROM (
        |    SELECT source, doc_id, n_chars,
        |      CAST(len(string_split(text, ' ')) AS BIGINT) AS nw,
        |      CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
        |        AS ndw
        |    FROM documents) t
        |  WHERE nw >= 1),
        |xb AS (
        |  SELECT source, x, count(*) AS c,
        |    CAST(sum(count(*)) OVER (PARTITION BY source ORDER BY x
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      - count(*) AS BIGINT) AS cbx
        |  FROM docs GROUP BY source, x),
        |yb AS (
        |  SELECT source, y, count(*) AS c,
        |    CAST(sum(count(*)) OVER (PARTITION BY source ORDER BY y
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      - count(*) AS BIGINT) AS cby
        |  FROM docs GROUP BY source, y),
        |ranked AS (
        |  SELECT d.source,
        |    xb.cbx + row_number() OVER (PARTITION BY d.source, d.x
        |      ORDER BY d.doc_id) AS rx,
        |    yb.cby + row_number() OVER (PARTITION BY d.source, d.y
        |      ORDER BY d.doc_id) AS ry
        |  FROM docs d
        |  JOIN xb ON xb.source = d.source AND xb.x = d.x
        |  JOIN yb ON yb.source = d.source AND yb.y = d.y),
        |g AS (
        |  SELECT source, count(*) AS n_docs,
        |    sum(CAST(rx - ry AS HUGEINT) * (rx - ry)) AS sum_d2
        |  FROM ranked GROUP BY source)
        |SELECT source, n_docs,
        |  CAST(CASE WHEN n_docs > 1 THEN 1000000 -
        |    (sum_d2 * 6000000) // (CAST(n_docs AS HUGEINT) *
        |      (CAST(n_docs AS HUGEINT) * n_docs - 1))
        |    ELSE 0 END AS BIGINT) AS rho_ppm
        |FROM g""".stripMargin,

    "q209_chi2_independence" ->
      """WITH cells AS (
        |  SELECT lang, source, count(*) AS o
        |  FROM documents GROUP BY 1, 2),
        |rows_ AS (SELECT lang, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY 1),
        |cols_ AS (SELECT source, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY 1),
        |tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells)
        |SELECT lang, source, o, r, c, n,
        |  CAST((CAST(o * n - r * c AS HUGEINT)
        |    * CAST(o * n - r * c AS HUGEINT) * 1000000)
        |    // (CAST(n AS HUGEINT) * r * c) AS BIGINT) AS contrib_ppm
        |FROM cells
        |JOIN rows_ USING (lang)
        |JOIN cols_ USING (source)
        |CROSS JOIN tot""".stripMargin,

    "q210_zipf_slope" ->
      """WITH counts AS (
        |  SELECT w, count(*) AS f FROM (
        |    SELECT unnest(string_split(text, ' ')) AS w FROM documents) u
        |  WHERE length(w) >= 1 GROUP BY w),
        |pts AS (
        |  SELECT CAST(length(bin(row_number() OVER (ORDER BY f DESC, w))) - 1
        |      AS BIGINT) AS x,
        |    CAST(length(bin(f)) - 1 AS BIGINT) AS y
        |  FROM counts),
        |g AS (
        |  SELECT count(*) AS n_terms,
        |    CAST(sum(x) AS BIGINT) AS sum_x, CAST(sum(y) AS BIGINT) AS sum_y,
        |    CAST(sum(x * y) AS BIGINT) AS sum_xy,
        |    CAST(sum(x * x) AS BIGINT) AS sum_x2
        |  FROM pts)
        |SELECT n_terms, sum_x, sum_y, sum_xy, sum_x2,
        |  n_terms * sum_xy - sum_x * sum_y AS slope_num,
        |  n_terms * sum_x2 - sum_x * sum_x AS slope_den
        |FROM g""".stripMargin)
}
