package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every query pack (relational, text analysis, dedup,
  * similarity, events/streaming-batch parity, multimodal) into the
  * single `queries`/`oracleSql` surface the driver verifies against
  * DuckDB at sf0.01 and benches at sf0.1.
  */
object SparkEntry {

  private val packs: Seq[QueryPack] =
    Seq(Relational, Streams, Events, TextAnalysis, Dedup, Similarity, Multimodal, Sketches)

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
