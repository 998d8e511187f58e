package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every query pack into the single `queries`/`oracleSql`
  * surface the driver verifies against DuckDB at sf0.01 and benches at
  * sf0.1:
  *  - [[operators.Relational]] q01–q22: joins/aggs/windows/set ops/
  *    subqueries/scalar functions over the TPC-H-ish tables
  *  - [[operators.Streams]] s01–s03: the `shardstream` DSv2 source and
  *    ordered sink end-to-end (SURVEY §2 S1–S16)
  *  - [[operators.Events]] q23–q30: event-time windows, JSON props,
  *    SQL surface, as-of join, range join
  *  - [[operators.TextAnalysis]] q31–q34: token stats, lang quality,
  *    fingerprints, top terms
  *  - [[operators.Dedup]] q35–q37: exact dedup, banded MinHash LSH,
  *    SimHash buckets
  *  - [[operators.Similarity]] q40–q42: quantized-integer cosine
  *    top-k, IVF ANN, embedding near-dup
  *  - [[operators.Multimodal]] q45: binary payload + decode-stub
  *    feature extraction
  *  - [[operators.Sketches]] q43/q44/q46: KMV Aggregator, native
  *    rolling-hash Expression, multi-format round-trip
  *  - [[operators.Pipeline]] q57–q63: training-data curation —
  *    quantiles, TF-IDF ranking, deterministic hash/stratified
  *    sampling, quality gates, sequence packing, mixture planning
  */
object SparkEntry {

  private val packs: Seq[QueryPack] =
    Seq(Relational, Streams, Events, TextAnalysis, Dedup, Similarity, Multimodal, Sketches,
      Layout, Pipeline)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracles).toMap
}
