package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Fail-fast canary for driver testdata regeneration (VERDICT r8 #3).
  *
  * Round 8 died silently when the driver regenerated `/root/testdata`
  * and `events.ts` changed physical type (int64 TIMESTAMP(NANOS) →
  * native timestamp[us]): 58 queries, 17 tests and the whole bench
  * failed on one loader line, with no test pointing at the actual
  * cause. This spec loads all 10 tables at sf0.001 through their
  * `Tables` loaders and asserts the exact LOGICAL (name, type) sets
  * the engine is written against — so the next fixture drift is one
  * red test printing a readable diff, not 17 cascading failures.
  *
  * These are the post-loader schemas (FIXTURES.md §B): `events.ts` is
  * asserted as TIMESTAMP because `Tables.events` normalizes every
  * physical generation (int64 nanos / timestamp_ntz / timestamp) to
  * that one logical type.
  */
class FixtureSchemaSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("fixture-schema-canary")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq(
      "r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq(
      "n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq(
      "c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq(
      "s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq(
      "p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq(
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq(
      "l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    "events" -> Seq(
      "event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq(
      "vec_id" -> LongType, "embedding" -> ArrayType(FloatType),
      "label" -> IntegerType),
  )

  test("all 10 driver tables load and match the expected logical schemas") {
    val diffs = Tables.names.flatMap { name =>
      val got =
        try Right(
          (if (name == "events") Tables.events(spark, dir)
           else Tables.load(spark, dir, name))
            .schema.fields.toSeq.map(f => f.name -> f.dataType))
        catch { case e: Throwable => Left(s"$name: LOAD FAILED: ${e.getMessage}") }
      got match {
        case Left(err) => Some(err)
        case Right(actual) =>
          val want = expected(name)
          if (actual == want) None
          else Some(
            s"""$name: schema drift
               |  expected: ${want.map { case (n, t) => s"$n:${t.simpleString}" }.mkString(", ")}
               |  actual:   ${actual.map { case (n, t) => s"$n:${t.simpleString}" }.mkString(", ")}
               |  missing:  ${(want.toSet -- actual.toSet).mkString(", ")}
               |  extra:    ${(actual.toSet -- want.toSet).mkString(", ")}""".stripMargin)
      }
    }
    assert(diffs.isEmpty,
      "driver testdata drifted from FIXTURES.md §B — fix Tables loaders " +
      "and FIXTURES.md together:\n" + diffs.mkString("\n"))
  }

  test("bounded-enum registry: every entry exists and is schema-fixed, not scaling") {
    // Tables.boundedEnumColumns feeds PlanSpec's corpus-grain-window
    // guard — a stale entry weakens nothing, but a TYPO (column never
    // matches any plan attribute) or a mis-registered SCALING key
    // (which would ban legitimate per-key windows... and worse, a
    // bounded column that someone forgot to register evades the guard)
    // must be one red test. Two checks per entry: the column exists in
    // its table's loaded schema, and its distinct count at sf0.01 is
    // ≤ 32 — fixed enumerations saturate (25 nations, 5 priorities)
    // while keys scale with rows (c_custkey is 1500 at sf0.01).
    val dir01 = "/root/testdata/sf0.01"
    val problems = Tables.boundedEnumColumns.toSeq.flatMap { case (table, cols) =>
      val df = if (table == "events") Tables.events(spark, dir01)
               else Tables.load(spark, dir01, table)
      val have = df.columns.map(_.toLowerCase).toSet
      cols.toSeq.flatMap { c =>
        if (!have(c.toLowerCase))
          Some(s"$table.$c: registered but absent from the fixture schema")
        else {
          val n = df.selectExpr(s"count(distinct `$c`)").head().getLong(0)
          if (n > 32)
            Some(s"$table.$c: $n distinct values at sf0.01 — scales with " +
              "the data, not a fixed enumeration; unregister it")
          else None
        }
      }
    }
    assert(problems.isEmpty,
      "bounded-enum registry drifted from the fixtures:\n" +
        problems.mkString("\n"))
  }

  test("events loader normalizes ts to TIMESTAMP on every physical generation") {
    // current generation: native timestamp[us] (NTZ in the raw scan).
    // The raw-dtype probe must itself survive a NANOS generation, where
    // an unconf'd read throws [PARQUET_TYPE_ILLEGAL] before any assert —
    // scope nanosAsLong around the probe (the schema inference is eager
    // and `raw` is never executed, so a scoped set-and-restore is safe
    // HERE, unlike in Tables.events where downstream actions re-read the
    // conf at planning time). This keeps the canary order-independent:
    // it must not rely on an earlier test having mutated the session.
    val nanosKey = "spark.sql.legacy.parquet.nanosAsLong"
    val prior = spark.conf.getOption(nanosKey)
    val rawTs =
      try {
        spark.conf.set(nanosKey, "true")
        spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType
      } finally prior match {
        case Some(v) => spark.conf.set(nanosKey, v)
        case None    => spark.conf.unset(nanosKey)
      }
    assert(rawTs == TimestampNTZType || rawTs == TimestampType || rawTs == LongType,
      s"unexpected raw ts dtype $rawTs")
    assert(Tables.events(spark, dir).schema("ts").dataType == TimestampType)
    // and the values mean epoch micros under the pinned UTC session tz:
    // min(ts) must land in the fixture's 2024 date range, not 1970
    val minYear = Tables.events(spark, dir)
      .selectExpr("min(year(ts))").head().getInt(0)
    assert(minYear >= 2000 && minYear <= 2100, s"ts values off-epoch: year=$minYear")
  }
}
