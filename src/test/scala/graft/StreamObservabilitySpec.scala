package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.shard.ShardServiceRegistry
import graft.streaming.{GraftStreamingObserver, StreamObservability}

/** The observability surface: a session-wide StreamingQueryListener
  * exporting rows/batch, state size, and watermark lag — the
  * ops-facing counterpart of the reference's SLF4J logging
  * (`ShardSubscription.java` logs each fetch/emit/complete). Listener
  * delivery is async (engine listener bus), so every assertion polls
  * to a deadline instead of assuming synchronous callbacks.
  */
class StreamObservabilitySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var observer: GraftStreamingObserver = _
  private val counter = new AtomicInteger(0)

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("observability-spec")
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    observer = StreamObservability.attach(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def freshName(p: String): String = s"${p}_obs_${counter.incrementAndGet()}"

  private def awaitMetrics(name: String)(
      pred: graft.streaming.QueryMetrics => Boolean): graft.streaming.QueryMetrics = {
    val deadline = System.currentTimeMillis() + 15000
    var m = observer.metricsFor(name)
    while ((m.isEmpty || !pred(m.get)) && System.currentTimeMillis() < deadline) {
      Thread.sleep(25)
      m = observer.metricsFor(name)
    }
    assert(m.isDefined, s"no metrics recorded for query $name")
    assert(pred(m.get), s"metrics never satisfied predicate: ${m.get}")
    m.get
  }

  test("attach is idempotent per session (one listener, not one per query)") {
    assert(StreamObservability.attach(spark) eq observer)
  }

  test("per-batch rows and termination are recorded with exact counts") {
    val stream = freshName("rows")
    val svc = ShardServiceRegistry.create(stream, 2)
    (0 until 20).foreach(i => svc.putRecord(s"k${i % 4}", s"p-$i".getBytes(UTF_8), None))
    val qn = freshName("sink")
    val q = spark.readStream.format("shardstream")
      .option("stream", stream).option("maxRecordsPerBatch", "7").load()
      .writeStream.format("memory").queryName(qn)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val m = awaitMetrics(qn)(m => m.terminated && m.inputRows == 20)
    assert(m.inputRows == 20, "total ingested rows must match the fixture exactly")
    assert(m.batches >= 3, s"7-row cap over 20 rows needs >=3 batches, saw ${m.batches}")
    assert(m.lastBatchRows <= 7)
    assert(m.error.isEmpty)
    // consumer lag drained to zero by the final batch
    assert(m.backlogRows.contains(0L), s"backlog must drain: ${m.backlogRows}")
    // the engine's own accounting agrees with the listener's
    assert(q.recentProgress.map(_.numInputRows).sum == m.inputRows)
  }

  test("backlog reports the unread rows while the source is behind") {
    val stream = freshName("lag")
    val svc = ShardServiceRegistry.create(stream, 1)
    (0 until 12).foreach(i => svc.putRecord("k", s"p-$i".getBytes(UTF_8), None))
    val qn = freshName("sink")
    // 4-row cap over 12 rows: the first batches run with the source
    // genuinely behind, so intermediate progress must show positive lag
    val q = spark.readStream.format("shardstream")
      .option("stream", stream).option("maxRecordsPerBatch", "4").load()
      .writeStream.format("memory").queryName(qn)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    awaitMetrics(qn)(m => m.terminated && m.backlogRows.contains(0L))
    // reconstruct per-batch lag from the engine's progress log and
    // check the listener's math against it: lag after batch k is
    // 12 - 4*(k+1), floored at 0
    val lags = q.recentProgress.toSeq.filter(_.numInputRows > 0).map { p =>
      val end = graft.sources.shard.ShardStreamOffset.fromJson(p.sources.head.endOffset)
        .indexes.values.sum
      math.max(0L, 12L - end)
    }
    assert(lags == Seq(8L, 4L, 0L), s"per-batch lag trajectory: $lags")
  }

  test("watermark and lag are exported for event-time queries") {
    val stream = freshName("wm")
    val svc = ShardServiceRegistry.create(stream, 1)
    // event times 0s..19s as micros in the payload
    (0 until 20).foreach(i => svc.putRecord("k", s"${i * 1000000L}".getBytes(UTF_8), None))
    val qn = freshName("sink")
    val q = spark.readStream.format("shardstream")
      .option("stream", stream).option("maxRecordsPerBatch", "5").load()
      .select(timestamp_micros(col("data").cast("string").cast("bigint")).as("ts"))
      .withWatermark("ts", "2 seconds")
      .groupBy(window(col("ts"), "10 seconds")).agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName(qn).outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val m = awaitMetrics(qn)(m => m.terminated && m.watermarkMs.isDefined)
    // watermark advanced to max event time (19s) - 2s delay = 17s
    assert(m.watermarkMs.get == 17000L, s"watermark ${m.watermarkMs}")
    assert(m.watermarkLagMs.exists(l => l >= 0L && l <= 19000L),
      s"lag must be within the event-time span: ${m.watermarkLagMs}")
    assert(m.stateRows > 0, "windowed agg must report state rows")
  }

  test("a failed run records the terminal error") {
    val stream = freshName("err")
    val svc = ShardServiceRegistry.create(stream, 1)
    svc.putRecord("k", "x".getBytes(UTF_8), None)
    ShardServiceRegistry.injectFailure(stream, "getRecords", "obs-boom")
    try {
      val qn = freshName("sink")
      val q = spark.readStream.format("shardstream").option("stream", stream).load()
        .writeStream.format("memory").queryName(qn)
        .trigger(Trigger.AvailableNow()).start()
      intercept[StreamingQueryException](q.awaitTermination())
      val m = awaitMetrics(qn)(m => m.terminated && m.error.isDefined)
      assert(m.error.get.contains("obs-boom"))
    } finally ShardServiceRegistry.clearFailure(stream, "getRecords")
  }

  test("two queries are tracked independently under one listener") {
    def run(n: Int): String = {
      val stream = freshName(s"multi$n")
      val svc = ShardServiceRegistry.create(stream, 1)
      (0 until n).foreach(i => svc.putRecord("k", s"$i".getBytes(UTF_8), None))
      val qn = freshName("sink")
      val q = spark.readStream.format("shardstream").option("stream", stream).load()
        .writeStream.format("memory").queryName(qn)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      qn
    }
    val (a, b) = (run(3), run(9))
    assert(awaitMetrics(a)(m => m.terminated && m.inputRows == 3).inputRows == 3)
    assert(awaitMetrics(b)(m => m.terminated && m.inputRows == 9).inputRows == 9)
  }
}
