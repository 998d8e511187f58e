package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * Scale notes: each table is a plain parquet scan — at 100 TB these
  * become multi-file partitioned scans and everything below still holds
  * because all operators are expressed declaratively (Catalyst prunes
  * columns + pushes filters into the scan). Nothing here collects to
  * the driver.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Each spark.read.parquet builds a fresh InMemoryFileIndex (driver-side
  // file listing + footer read) — ~100ms/table here, and the dominant
  // metadata cost on an object store at 100 TB (real deployments put a
  // catalog table in front for exactly this reason). The testdata dirs
  // are immutable for a run, so memoize the loaded DataFrame per
  // (session, dir, table): the logical plan is immutable and lazily
  // executed, reuse just skips the re-listing.
  private val loaded =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  // Sessions come and go within one JVM (the determinism spec creates
  // and stops one per partition shape); without eviction their memo
  // entries — and the stopped sessions they key on — would accumulate
  // for the JVM lifetime. One listener per session clears its entries
  // when the underlying context ends.
  private val hooked =
    java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[SparkSession, java.lang.Boolean]())

  private def evictOnStop(spark: SparkSession): Unit =
    if (hooked.add(spark))
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
            e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit = {
          loaded.keySet.removeIf(_._1 == spark)
          derived.keySet.removeIf(_._1 == spark)
          pinnedKeys.removeIf(_._1 == spark)
          registeredDir.remove(spark)
          hooked.remove(spark)
        }
      })

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    evictOnStop(spark)
    loaded.computeIfAbsent((spark, dir, name),
      _ => spark.read.parquet(s"$dir/$name.parquet"))
  }

  // Derived intermediates shared across queries (e.g. the part
  // co-occurrence edge list feeding q138/q145/q146/q148) — memoized per
  // (session, key) with the same lifecycle as the table loads. The
  // builder decides whether to persist(); memoization only guarantees
  // every consumer in the session sees the SAME plan (and therefore the
  // same cached blocks) instead of re-deriving it.
  private val derived =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  // Memoized substrates whose results are PINNED by RDD-level
  // checkpoints (localCheckpoint) rather than catalog-managed persist:
  // catalog.clearCache() cannot see those blocks, so the bench's
  // per-query isolation hygiene calls [[dropPinnedSubstrates]] to keep
  // every per-query line charged with its full substrate cost
  // (round-over-round comparable — the same convention clearCache
  // already enforces on the persist-backed graph substrates). Real
  // sessions and Verify never drop them: there the whole point is one
  // build per (session, dataset).
  private val pinnedKeys =
    java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[(SparkSession, String),
        java.lang.Boolean]())

  // Serialized, unlike memo: pinned builders are EAGER and
  // side-effecting (localCheckpoint jobs), so memo's benign
  // lose-the-race duplicate build would here run the dominant
  // occurrence pass twice AND leak the loser's checkpoint blocks
  // (invisible to clearCache). Builds are rare and seconds-long; a
  // coarse lock is the correct trade.
  def memoPinned(spark: SparkSession, key: String)
      (build: => DataFrame): DataFrame = pinnedKeys.synchronized {
    val df = memo(spark, key)(build)
    pinnedKeys.add((spark, key))
    df
  }

  // Same lock as memoPinned: a drop interleaving between memo's
  // putIfAbsent and pinnedKeys.add would otherwise leave an untracked
  // cached substrate (checkpoint blocks leak, bench isolation breaks).
  def dropPinnedSubstrates(spark: SparkSession): Unit =
    pinnedKeys.synchronized {
      val it = pinnedKeys.iterator()
      while (it.hasNext) {
        val k = it.next()
        if (k._1 == spark) {
          val df = derived.remove(k)
          if (df != null) releaseLocalCheckpoint(df)
          it.remove()
        }
      }
    }

  def memo(spark: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    evictOnStop(spark)
    // get-then-putIfAbsent, NOT computeIfAbsent: substrate builders
    // nest (cooc_deg builds on cooc_pairs, the adjacency substrates on
    // both), and nested computeIfAbsent on one ConcurrentHashMap is
    // undefined — it throws IllegalStateException when the inner key
    // lands in the bin the outer call holds. The race this trades
    // away is benign: two threads may both run `build` (lazy plan
    // construction, no side effects), and putIfAbsent keeps exactly
    // one winner so the memo identity guarantee stands.
    val k = (spark, key)
    val cur = derived.get(k)
    if (cur != null) cur
    else {
      val built = build
      val prev = derived.putIfAbsent(k, built)
      if (prev != null) prev else built
    }
  }

  /** Release the block-manager storage behind a localCheckpoint'ed
    * DataFrame. `Dataset.localCheckpoint` persists its internal RDD at
    * the RDD level, OUTSIDE the SQL cache manager — so the bench
    * harness's per-query `catalog.clearCache()` hygiene never sees it
    * and only ContextCleaner GC would reclaim it (ADVICE r17).
    * Substrate builders call this on intermediate checkpoints as soon
    * as the downstream result is itself pinned; a no-op on anything
    * that isn't a checkpointed plan. */
  def releaseLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.logical.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** `events.ts` has varied physically across testdata generations:
    * parquet TIMESTAMP(NANOS) stored as int64 (Spark 4 refuses to read
    * it as a timestamp — [PARQUET_TYPE_ILLEGAL] — unless the legacy
    * conf exposes it as raw nanos) vs native timestamp[us] (read as
    * TIMESTAMP_NTZ under Spark 4's parquet NTZ inference). Dispatch on
    * the loaded dtype and normalize every form to TIMESTAMP: the
    * session tz is pinned UTC everywhere (Bench/Verify/build.sbt), so
    * the NTZ→TZ cast is numerically the identity and `unix_micros`
    * downstream keeps meaning epoch micros — agreeing with DuckDB's
    * `epoch_us(ts)` on both physical forms. The nanos branch converts
    * with integer division (a double division would lose precision
    * above 2^53 ns); values are µs-grained, so the truncation is
    * lossless. */
  def events(s: SparkSession, d: String): DataFrame = {
    // Probe-first: try the scan under the session's CURRENT conf. Only
    // a TIMESTAMP(NANOS) physical generation throws (schema inference
    // is eager), and only then is the legacy conf set — session-wide,
    // because ParquetFileFormat/ParquetScan re-read
    // legacyParquetNanosAsLong from the session conf at PHYSICAL
    // PLANNING time, so a scoped set-and-restore would pass inference
    // here and then fail every downstream action. On µs generations
    // (the current one) the conf is never touched, so any OTHER parquet
    // source with a genuine nanos column still fails loudly instead of
    // silently loading as LongType; on a nanos generation that masking
    // is the unavoidable price of reading the fixture at all.
    //
    // only the load (file listing) is worth memoizing; the dtype
    // normalization is a free plan node — and memoizing it here would
    // nest computeIfAbsent inside computeIfAbsent on the same map,
    // which ConcurrentHashMap rejects as a recursive update. A failed
    // probe memoizes nothing (computeIfAbsent drops the mapping on
    // exception), so the retry re-runs the scan under the new conf.
    val raw =
      try load(s, d, "events")
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage.contains("PARQUET_TYPE_ILLEGAL") ||
               e.getMessage.contains("Illegal Parquet type") =>
          s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          load(s, d, "events")
      }
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => raw
      case other => throw new IllegalStateException(
        s"events.ts: unsupported physical type $other in $d/events.parquet " +
        "(expected int64 nanos, timestamp_ntz, or timestamp)")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Bounded-domain (fixed-enumeration) attribute registry — owned
    * HERE, by the schema authority, not by the test that consumes it
    * (VERDICT r12 #2: PlanSpec's corpus-grain-window guard keyed off a
    * hardcoded column-name set, so a future bounded-domain column
    * would evade the detector exactly the way q230 evaded the
    * empty-partitionSpec test). A column belongs here iff its domain
    * is fixed by the SCHEMA — the value set does not grow with the
    * data (priorities, statuses, flags, the 25 nations / 5 regions
    * and the keys that reference them). A window partitioned ONLY on
    * such columns is the single-task global sort split a constant
    * number of ways — PlanSpec bans that shape unless a bounder sits
    * below (Aggregate / content-hash sample / WindowGroupLimit).
    * Data-derived strata (lang, event_type, source, label, kcell)
    * stay OUT: their cardinality is a per-query modeling claim, and
    * registering them would flag the endorsed stratified-pipeline
    * windows. FixtureSchemaSpec audits every entry against the data:
    * the column must exist in its table and its distinct count must
    * stay ≤ 32 at sf0.01 (keys scale with rows; enums saturate) —
    * so a typo, a rename, or a mis-registered scaling key is one red
    * test, and a NEW bounded-domain column added to a loader here is
    * guarded by construction. */
  val boundedEnumColumns: Map[String, Set[String]] = Map(
    "region"   -> Set("r_regionkey", "r_name"),
    "nation"   -> Set("n_nationkey", "n_name", "n_regionkey"),
    "customer" -> Set("c_nationkey", "c_mktsegment"),
    "supplier" -> Set("s_nationkey"),
    "part"     -> Set("p_brand", "p_type"),
    "orders"   -> Set("o_orderstatus", "o_orderpriority"),
    "lineitem" -> Set("l_returnflag", "l_linestatus"))

  /** Flat lowercase view of [[boundedEnumColumns]] for plan-attribute
    * matching (optimized plans carry attribute names, not tables). */
  val boundedEnumAttrs: Set[String] =
    boundedEnumColumns.values.flatten.map(_.toLowerCase).toSet

  /** Register every table as a temp view (for spark.sql-style access).
    * `events` goes through its loader (ts dtype normalization).
    * Temp views are session-level mutable state, so memoizing must track
    * WHICH dir a session's views currently point at — re-registering is
    * skipped only while the dir is unchanged. */
  private val registeredDir =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, String]()

  /** The MECHANICAL form of the bounded-collect rule (r11 verdict
    * item #6): the only `collect()`s allowed in query paths are
    * driver-side folds over tables whose row count is bounded BY
    * CONSTRUCTION (a dim² Gram matrix, a timespan×|types| daily
    * grid) — never by the corpus. This helper makes each site's
    * documented bound load-bearing instead of a comment: it fetches
    * at most `bound + 1` rows (so an unbounded input errors without
    * first OOMing the driver) and throws if the bound is exceeded.
    * Within the bound the fetch is the complete result set, so
    * callers' folds are unchanged. */
  def boundedCollect(df: DataFrame, bound: Long, what: String): Array[org.apache.spark.sql.Row] = {
    require(bound > 0 && bound < Int.MaxValue, s"$what: non-positive or overflowing bound $bound")
    val rows = df.limit(bound.toInt + 1).collect()
    require(rows.length <= bound,
      s"$what: bounded-collect contract violated — input exceeds the documented $bound-row bound")
    rows
  }

  def registerAll(spark: SparkSession, dir: String): Unit =
    // compute(): the view-creation loop runs under the map's bin lock
    // and the dir is recorded only AFTER all views exist — a put-first
    // form would mark the session registered before (or despite) a
    // mid-loop failure, making later spark.sql callers skip
    // registration and fail on missing views
    registeredDir.compute(spark, (_, prev) => {
      if (prev != dir)
        names.foreach {
          case "events" => events(spark, dir).createOrReplaceTempView("events")
          case n => load(spark, dir, n).createOrReplaceTempView(n)
        }
      dir
    })
}

/** A named query pack: Spark implementation + DuckDB oracle SQL. */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}
