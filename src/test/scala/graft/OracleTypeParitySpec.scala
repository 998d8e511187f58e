package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import scala.sys.process._

/** Oracle TYPE parity — the guard the round-14 defect slipped past.
  *
  * The driver's correctness gate hashes both result sets through
  * pandas, so it is sensitive to column TYPES, not just values: a
  * DuckDB `sum(BIGINT)` silently promotes to HUGEINT (rendered
  * float64) and fails the hash against Spark's int64 even when every
  * value matches (q279/q283, round 14). The value-only local gate
  * could not see that class.
  *
  * This spec pins the invariant corpus-free: every batch oracle SQL is
  * bound (not executed) through DuckDB `DESCRIBE` and its column types
  * are compared against the Spark query's analyzed schema under the
  * pandas-equivalence mapping below. DuckDB binding reads no rows; on
  * the Spark side, obtaining each schema invokes the builder at
  * sf0.001, and builders with driver loops (q285's binary search,
  * q295's greedy rounds, q305/q308's boundedCollect) DO run real
  * Spark jobs over that smallest fixture during construction — the
  * spec is cheap, not literally execution-free. Streaming (s*)
  * queries execute full micro-batch work in their builders, so their
  * oracles are covered by the dtype check in tools/check_oracle.py
  * (run with data at sf0.01) instead.
  *
  * If this spec cancels (no python3/duckdb on the host), the same
  * parity is still enforced by tools/check_oracle.py's per-column
  * dtype comparison.
  */
class OracleTypeParitySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  private lazy val hasDuck: Boolean =
    scala.util.Try(Seq("python3", "-c", "import duckdb").! == 0)
      .getOrElse(false)

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("OracleTypeParitySpec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** DuckDB type strings that hash-match the given Spark type once
    * both sides land in pandas (the driver's comparison surface).
    * HUGEINT is deliberately in NO set — it renders float64 and is
    * exactly the defect class this spec exists to catch. */
  private def allowed(dt: DataType): Set[String] = dt match {
    case LongType      => Set("BIGINT")
    case IntegerType   => Set("INTEGER")
    case ShortType     => Set("SMALLINT")
    case ByteType      => Set("TINYINT")
    case DoubleType    => Set("DOUBLE")
    case FloatType     => Set("FLOAT")
    case StringType    => Set("VARCHAR")
    case BooleanType   => Set("BOOLEAN")
    case DateType      => Set("DATE")
    // Spark parquet timestamps read back tz-aware; oracle arithmetic
    // may come out naive — the driver (and check_oracle.py) normalize
    // the tz, so both render datetime64[ns].
    case TimestampType    => Set("TIMESTAMP", "TIMESTAMP WITH TIME ZONE")
    case TimestampNTZType => Set("TIMESTAMP", "TIMESTAMP WITH TIME ZONE")
    case d: DecimalType   => Set(s"DECIMAL(${d.precision},${d.scale})")
    case ArrayType(e, _)  => allowed(e).map(_ + "[]")
    case _ => Set.empty
  }

  test("every batch oracle binds in DuckDB with column types matching the Spark schema") {
    assume(hasDuck, "python3+duckdb not on this host; parity enforced by tools/check_oracle.py")

    val batch = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot(_._1.startsWith("s"))
    val oracles = SparkEntry.oracleSql
    val tmp = Files.createTempDirectory("oracle_types").toFile
    batch.foreach { case (n, _) =>
      oracles.get(n).foreach { sql =>
        Files.writeString(Paths.get(tmp.getPath, s"$n.sql"), sql)
      }
    }
    val py = Paths.get(tmp.getPath, "describe.py")
    Files.writeString(py,
      """import duckdb, glob, os, sys
        |sf, d = sys.argv[1], sys.argv[2]
        |con = duckdb.connect()
        |for t in ["region","nation","customer","supplier","part","orders",
        |          "lineitem","events","documents","embeddings"]:
        |    con.execute("CREATE VIEW %s AS SELECT * FROM '%s/%s.parquet'"
        |                % (t, sf, t))
        |for f in sorted(glob.glob(os.path.join(d, "*.sql"))):
        |    name = os.path.basename(f)[:-4]
        |    try:
        |        for r in con.execute("DESCRIBE " + open(f).read()).fetchall():
        |            print("%s\t%s\t%s" % (name, r[0], r[1]))
        |    except Exception as e:
        |        print("%s\t!ERROR\t%s: %s"
        |              % (name, type(e).__name__, str(e)[:160].replace("\n", " ")))
        |""".stripMargin)
    val out = Seq("python3", py.toString, dir, tmp.getPath).!!
    val duckTypes: Map[String, Map[String, String]] = out.linesIterator
      .map(_.split("\t", 3)).collect { case Array(n, c, t) => (n, c, t) }
      .toSeq.groupBy(_._1)
      .map { case (n, rows) =>
        n -> rows.map(r => r._2.toLowerCase -> r._3.trim).toMap }

    val problems = scala.collection.mutable.ArrayBuffer.empty[String]
    batch.foreach { case (n, fn) =>
      duckTypes.get(n) match {
        case None =>
          if (oracles.contains(n)) problems += s"$n: no DESCRIBE output"
        case Some(dm) if dm.contains("!error") =>
          problems += s"$n: oracle failed to bind: ${dm("!error")}"
        case Some(dm) =>
          val schema = fn(spark, dir).schema
          schema.fields.foreach { f =>
            dm.get(f.name.toLowerCase) match {
              case None =>
                problems += s"$n.${f.name}: missing from oracle output"
              case Some(dt) =>
                val ok = allowed(f.dataType)
                if (ok.isEmpty)
                  problems += s"$n.${f.name}: unmapped Spark type ${f.dataType.sql} (duck=$dt)"
                else if (!ok.contains(dt))
                  problems += s"$n.${f.name}: spark=${f.dataType.sql} duck=$dt (allowed: ${ok.mkString("/")})"
            }
          }
          val extra = dm.keySet -- schema.fields.map(_.name.toLowerCase).toSet
          if (extra.nonEmpty) problems += s"$n: oracle-only columns $extra"
      }
      spark.catalog.clearCache()
    }
    assert(problems.isEmpty,
      s"${problems.size} type-parity violations:\n  " + problems.mkString("\n  "))
  }
}
