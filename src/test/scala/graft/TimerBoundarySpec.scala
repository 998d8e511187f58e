package graft.operators

import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TimeMode, Trigger}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Pins the expired-timer boundary semantics of s27's production
  * processor (ADVICE r12): does a timer whose expiry equals the
  * eviction watermark EXACTLY fire, or only one strictly below it?
  * The s27 oracle closes a (user, hour) when hour_end_ms <= final
  * watermark; the sf fixtures never land a window end exactly on the
  * watermark, so a strict-vs-inclusive mismatch in Spark's
  * transformWithState would pass the gate today and surface only on
  * boundary-aligned data (likely under the 1-hour fallback delay,
  * which is a round multiple of the window size). This spec builds
  * that exact alignment: a watermark-driver event at hour1 + delay
  * makes the final watermark land on hour0's end to the millisecond.
  *
  * Pinned result (Spark 4.1, both sub-cases asserted below): the
  * timer DOES fire at equality — Spark's TimerStateImpl treats
  * expiryTimestampMs <= watermarkForEviction as expired, matching
  * the built-in window operator's closure rule and therefore the
  * oracle's `<=`.
  */
class TimerBoundarySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val nameCounter = new AtomicInteger(0)

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("timer-boundary-spec")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val baseEpoch = 1699999200L // hour-aligned (mod 3600 == 0)
  private def hours(h: Long): Long = h * 3600L

  /** Runs s27's HourWindowTimerProcessor over the given
    * (eventId, tsOffsetSeconds, userId) records with a 600 s
    * watermark delay; returns the emitted (user, hour_index, n). */
  private def runTimers(events: Seq[(Int, Long, Int)]): Set[(Long, Long, Long)] = {
    val name = s"timer_boundary_${nameCounter.incrementAndGet()}"
    val svc = graft.sources.shard.ShardServiceRegistry.create(name, 1)
    events.foreach { case (id, off, user) =>
      svc.putRecord(s"user-$user", s"$id,$off,$user".getBytes(UTF_8), None)
    }
    val raw = spark.readStream.format("shardstream")
      .option("stream", name)
      .option("startingPosition", "trim_horizon")
      .option("maxRecordsPerBatch", "100")
      .load()
    val sp = spark
    import sp.implicits._
    val ev = raw.select(split(col("data").cast("string"), ",").as("f"))
      .select(
        timestamp_seconds(element_at(col("f"), 2).cast("long") + baseEpoch).as("ts"),
        element_at(col("f"), 3).cast("long").as("user_id"),
        ((element_at(col("f"), 2).cast("long") + baseEpoch) * 1000000L).as("ts_us"))
      .withWatermark("ts", "600 seconds")
      .select(col("user_id"), col("ts_us"))
      .as[(Long, Long)]
    val counts = ev.groupByKey(t => (t._1, t._2 / 3600000000L))
      .transformWithState(new HourWindowTimerProcessor,
        TimeMode.EventTime(), OutputMode.Append(),
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
          Encoders.scalaLong))
      .toDF("user_id", "start_us", "n")
    // transformWithState needs multi-column-family state (same
    // provider the production s27 query sets)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val qn = s"timer_boundary_out_${nameCounter.incrementAndGet()}"
      val q = counts.writeStream.format("memory").queryName(qn)
        .outputMode(OutputMode.Append())
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.table(qn).collect()
        .map(r => (r.getLong(0),
          (r.getLong(1) / 3600000000L) - baseEpoch / 3600L, r.getLong(2)))
        .toSet
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("timer at EXACT watermark equality fires (inclusive closure, oracle's <=)") {
    // user 1: two events inside hour 0 -> timer at hour0 end.
    // user 2: one driver event at hour1 + 600 s -> final watermark =
    // (hour1 + 600 s) - 600 s delay = hour1 start = hour0 END, exactly,
    // to the millisecond (all inputs are whole seconds).
    val out = runTimers(Seq(
      (0, hours(0) + 60, 1), (1, hours(0) + 1800, 1),
      (2, hours(1) + 600, 2)))
    // (user 2, hour 1)'s own window stays open (its timer at hour2 end
    // is far past the watermark) — only the boundary window may emit.
    assert(out == Set((1L, 0L, 2L)),
      s"expected the hour-0 timer to fire at watermark == expiry; got $out")
  }

  test("timer one second PAST the watermark does not fire") {
    // driver event at hour1 + 599 s -> final watermark = hour0 end - 1 s:
    // the hour-0 timer is strictly above the watermark and must hold.
    val out = runTimers(Seq(
      (0, hours(0) + 60, 1), (1, hours(0) + 1800, 1),
      (2, hours(1) + 599, 2)))
    assert(out == Set.empty,
      s"expected no window to close with watermark 1 s short of expiry; got $out")
  }
}
