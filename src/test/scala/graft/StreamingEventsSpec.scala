package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.sql.Timestamp
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.shard.ShardServiceRegistry

/** Structured-Streaming semantics over the `shardstream` source:
  * watermarks + event-time windows, late-data drop, streaming dedup,
  * and custom state via mapGroupsWithState (SURVEY §2's
  * no-reference-implementation streaming categories, exercised on the
  * engine's own source rather than the rate/memory test sources).
  *
  * Records are seeded in arrival order; `maxRecordsPerBatch` slices
  * them into deterministic micro-batches (admission control is index-
  * ordered), so watermark progression across batches is reproducible.
  */
class StreamingEventsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val nameCounter = new AtomicInteger(0)

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("streaming-events-spec")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def freshName(p: String): String = s"${p}_${nameCounter.incrementAndGet()}"

  private val baseEpoch = 1699999200L // fixed, hour-aligned (mod 3600 == 0)

  /** Seed records with payload "eventId,tsOffsetSeconds,userId"; event
    * time = baseEpoch + offset. Appended in the given arrival order. */
  private def seed(events: Seq[(Int, Long, Int)], shards: Int = 1): String = {
    val name = freshName("ev")
    val s = ShardServiceRegistry.create(name, shards)
    events.foreach { case (id, off, user) =>
      s.putRecord(s"user-$user", s"$id,$off,$user".getBytes(UTF_8), None)
    }
    name
  }

  /** Parsed event-time stream: (event_id INT, ts TIMESTAMP, user STRING). */
  private def eventStream(stream: String, maxPerBatch: Int): DataFrame = {
    val raw = spark.readStream.format("shardstream")
      .option("stream", stream)
      .option("maxRecordsPerBatch", maxPerBatch.toString)
      .load()
    raw.select(split(col("data").cast("string"), ",").as("f"))
      .select(
        element_at(col("f"), 1).cast("int").as("event_id"),
        timestamp_seconds(element_at(col("f"), 2).cast("long") + baseEpoch).as("ts"),
        element_at(col("f"), 3).as("user"))
  }

  private def runToMemory(df: DataFrame, mode: OutputMode): DataFrame = {
    val qn = freshName("out")
    val q = df.writeStream.format("memory").queryName(qn)
      .outputMode(mode).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(qn)
  }

  private def hours(h: Long): Long = h * 3600L

  test("watermark + tumbling window (append): only watermark-passed windows emit") {
    // batch 1: hours 0..2 (wm after batch = 2h58m - 10min);
    // batch 2: hour 3 -> closes windows [0,1) [1,2); window [3,4) stays open.
    val evs = Seq(
      (0, hours(0) + 60, 1), (1, hours(0) + 120, 2),
      (2, hours(1) + 60, 1),
      (3, hours(2) + 3480, 2), // 02:58
      (4, hours(3) + 60, 1), (5, hours(3) + 120, 2))
    val name = seed(evs)
    val agg = eventStream(name, maxPerBatch = 4)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("window.start")).as("start_s"), col("n"))
    val out = runToMemory(agg, OutputMode.Append())
      .collect().map(r => (r.getLong(0) - baseEpoch, r.getLong(1))).toMap
    // [0h,1h): 2 events and [1h,2h): 1 event are closed by the final
    // watermark (03:02 - 10min = 02:52); [2h,3h) (02:58) and [3h,4h)
    // are not.
    assert(out == Map(hours(0) -> 2L, hours(1) -> 1L))
  }

  test("late data beyond the watermark is dropped from the aggregation") {
    // Watermark propagation lags one batch, so the straggler arrives
    // TWO batches after the watermark passed its window: batch0 hours
    // 0-1, batch1/batch2 advance max event time to ~03:04 (wm 02:52+
    // in effect from batch2 on), batch3 carries the straggler (00:30).
    val evs = Seq(
      (0, hours(0) + 60, 1), (1, hours(1) + 60, 1), // batch 0
      (2, hours(3) + 60, 1), (3, hours(3) + 120, 1), // batch 1
      (4, hours(3) + 180, 1), (5, hours(3) + 240, 1), // batch 2
      (9, hours(0) + 1800, 1), (6, hours(3) + 300, 1)) // batch 3: straggler + fresh
    val name = seed(evs)
    val agg = eventStream(name, maxPerBatch = 2)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("window.start")).as("start_s"), col("n"))
    val rows = runToMemory(agg, OutputMode.Append())
      .collect().map(r => (r.getLong(0) - baseEpoch, r.getLong(1))).toSeq
    // window [0,1) must be emitted exactly once, with n=1: the
    // straggler was dropped, not merged and not re-emitted.
    assert(rows.count(_._1 == hours(0)) == 1)
    assert(rows.toMap.get(hours(0)).contains(1L))
    assert(rows.toMap.get(hours(1)).contains(1L))
  }

  test("streaming dropDuplicates dedups across micro-batches") {
    val evs = Seq(
      (1, hours(0) + 10, 1), (2, hours(0) + 20, 2), (1, hours(0) + 30, 1), // dup id 1 in batch 1
      (3, hours(0) + 40, 3), (2, hours(0) + 50, 2), (4, hours(0) + 60, 4)) // dup id 2 across batches
    val name = seed(evs)
    val dedup = eventStream(name, maxPerBatch = 3).dropDuplicates("event_id")
    val out = runToMemory(dedup, OutputMode.Append())
    assert(out.select("event_id").collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2, 3, 4))
  }

  test("dropDuplicatesWithinWatermark: state is bounded by the watermark") {
    // Unbounded dropDuplicates keeps every key forever — a 100 TB
    // non-starter. The within-watermark variant evicts state: a key
    // re-occurring with a FRESH event time after its state expired is
    // emitted again (id 1), while a duplicate within the watermark
    // window is suppressed (id 3). (A stale-event-time duplicate would
    // be dropped as late data before reaching the dedup state at all.)
    val evs = Seq(
      (1, hours(0), 1), (2, hours(0) + 10, 1),      // batch 1
      (3, hours(3), 1), (3, hours(3) + 5, 1),       // batch 2: in-window dup id 3
      (5, hours(3) + 20, 1), (6, hours(3) + 30, 1), // batch 3 keeps wm high
      (1, hours(3) + 40, 1), (7, hours(3) + 50, 1)) // batch 4: id 1 again, state evicted
    val name = seed(evs)
    val dedup = eventStream(name, maxPerBatch = 2)
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
    val ids = runToMemory(dedup, OutputMode.Append())
      .collect().map(_.getInt(0)).toSeq
    assert(ids.count(_ == 1) == 2, s"ids=$ids") // re-emitted after eviction
    assert(ids.count(_ == 3) == 1, s"ids=$ids") // in-window duplicate suppressed
    assert(ids.sorted == Seq(1, 1, 2, 3, 5, 6, 7))
  }

  test("session window (streaming): gap merge matches the batch-parity shape") {
    // user 1: events at 00:00, 00:10, 01:00 -> two sessions (gap 30 min)
    val evs = Seq(
      (0, hours(0), 1), (1, hours(0) + 600, 1), (2, hours(1), 1),
      (3, hours(4), 1)) // far future event pushes watermark past both sessions
    val name = seed(evs)
    val agg = eventStream(name, maxPerBatch = 3)
      .withWatermark("ts", "1 minute")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("session_window.start")).as("start_s"), col("n"))
    val out = runToMemory(agg, OutputMode.Append())
      .collect().map(r => (r.getLong(0) - baseEpoch, r.getLong(1))).toMap
    assert(out.get(hours(0)).contains(2L)) // 00:00 + 00:10 merged
    assert(out.get(hours(1)).contains(1L)) // 01:00 alone
  }

  test("stream-stream interval join with watermarks") {
    // clicks: user 1 at 00:00; purchases: 00:10 (joins) and 02:00
    // (outside the 1 h bound); far-future rows advance both watermarks
    // so the join state flushes under AvailableNow.
    val clicks = seed(Seq((1, hours(0), 1), (99, hours(6), 9)))
    val purchases = seed(Seq((2, hours(0) + 600, 1), (3, hours(2), 1), (98, hours(6) + 600, 9)))
    def side(stream: String, idCol: String, tsCol: String) =
      eventStream(stream, maxPerBatch = 10)
        .withColumnRenamed("event_id", idCol).withColumnRenamed("ts", tsCol)
        .withWatermark(tsCol, "1 minute")
    val joined = side(clicks, "click_id", "click_ts")
      .join(side(purchases, "purchase_id", "purchase_ts"), Seq("user"))
      .where(col("purchase_ts") > col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("user"), col("click_id"), col("purchase_id"))
    val out = runToMemory(joined, OutputMode.Append())
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    assert(out == Set(("1", 1, 2), ("9", 99, 98)))
  }

  test("streaming sink: foreachBatch + ShardSink round-trips ordered per key") {
    import graft.sources.shard.{ShardServiceRegistry, ShardSink}
    val src = seed(Seq((1, 10, 1), (2, 20, 2), (3, 30, 1), (4, 40, 2), (5, 50, 1)))
    val dst = freshName("dst")
    ShardServiceRegistry.create(dst, 2)
    val q = eventStream(src, maxPerBatch = 2)
      .select(col("user"), col("event_id"), col("event_id").cast("string").as("payload"))
      .writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        ShardSink.putOrdered(df, dst, keyCol = "user", payloadCol = "payload",
          orderCols = Seq("event_id"))
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val back = spark.read.format("shardstream").option("stream", dst).load()
      .select(col("partitionKey"), col("sequenceNumber"), col("data").cast("string").as("p"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(back.length == 5)
    back.groupBy(_._1).foreach { case (key, rs) =>
      val inOrder = rs.sortBy(_._2).map(_._3).toSeq
      assert(inOrder == inOrder.sorted, s"key $key out of order: $inOrder")
    }
    assert(back.count(_._1 == "1") == 3 && back.count(_._1 == "2") == 2)
  }

  test("stream-static join: stream enriched against a batch dimension") {
    val sp = spark
    import sp.implicits._
    val evs = Seq((1, 10L, 1), (2, 20L, 2), (3, 30L, 1), (4, 40L, 3))
    val name = seed(evs)
    val dim = Seq(("1", "gold"), ("2", "silver")).toDF("user", "tier") // user 3 unmatched
    val joined = eventStream(name, maxPerBatch = 2)
      .join(dim, Seq("user")) // inner: drops user 3
      .select(col("event_id"), col("tier"))
    val out = runToMemory(joined, OutputMode.Append())
      .collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(out == Set((1, "gold"), (3, "gold"), (2, "silver")))
  }

  test("stream-static LEFT ANTI join: a full history index admits nothing") {
    // s20's admission edge the oracle can't exercise: when the static
    // fingerprint index covers every streamed key, the anti-join must
    // emit ZERO rows (not nulls, not a degenerate aggregate) — the
    // "nothing new in this batch" steady state of an ingest pipeline.
    val sp = spark
    import sp.implicits._
    val evs = Seq((1, 10L, 1), (2, 20L, 2), (3, 30L, 3))
    val name = seed(evs)
    val history = Seq("1", "2", "3").toDF("user") // covers every key
    val admitted = eventStream(name, maxPerBatch = 2)
      .join(history, Seq("user"), "left_anti")
      .select(col("event_id"))
    assert(runToMemory(admitted, OutputMode.Append()).collect().isEmpty)
    // and with one key absent from history, exactly its events pass
    val name2 = seed(evs)
    val partial = Seq("1", "2").toDF("user")
    val admitted2 = eventStream(name2, maxPerBatch = 2)
      .join(partial, Seq("user"), "left_anti")
      .select(col("event_id"))
    assert(runToMemory(admitted2, OutputMode.Append())
      .collect().map(_.getInt(0)).toSet == Set(3))
  }

  test("transformWithState: ValueState running count per key (RocksDB store)") {
    import org.apache.spark.sql.{Encoders => E}
    import org.apache.spark.sql.streaming.{StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}
    val sp = spark
    import sp.implicits._
    val evs = Seq((0, 1L, 1), (1, 2L, 2), (2, 3L, 1), (3, 4L, 1), (4, 5L, 2))
    val name = seed(evs)
    class CountProcessor extends StatefulProcessor[String, (String, Int), (String, Long)] {
      @transient private var count: ValueState[Long] = _
      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
        count = getHandle.getValueState[Long]("count", E.scalaLong, TTLConfig.NONE)
      override def handleInputRows(key: String, rows: Iterator[(String, Int)],
                                   timerValues: TimerValues): Iterator[(String, Long)] = {
        val n = (if (count.exists()) count.get() else 0L) + rows.size
        count.update(n)
        Iterator.single((key, n))
      }
    }
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val counted = eventStream(name, maxPerBatch = 2)
        .select(col("user"), col("event_id"))
        .as[(String, Int)]
        .groupByKey(_._1)
        .transformWithState(new CountProcessor, TimeMode.None(), OutputMode.Update(),
          E.tuple(E.STRING, E.scalaLong))
        .toDF("user", "n")
      val out = runToMemory(counted, OutputMode.Update())
      val finalCounts = out.groupBy("user").agg(max("n").as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(finalCounts == Map("1" -> 3L, "2" -> 2L))
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("mapGroupsWithState: custom running state per key across batches") {
    import org.apache.spark.sql.{Encoders => E}
    val evs = Seq(
      (0, hours(0) + 1, 1), (1, hours(0) + 2, 2), (2, hours(0) + 3, 1),
      (3, hours(0) + 4, 1), (4, hours(0) + 5, 2))
    val name = seed(evs)
    val sp = spark
    import sp.implicits._
    val counted = eventStream(name, maxPerBatch = 2)
      .select(col("user"), col("event_id"))
      .as[(String, Int)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: String, rows: Iterator[(String, Int)], state: GroupState[Int]) =>
          val n = state.getOption.getOrElse(0) + rows.size
          state.update(n)
          (user, n)
      }(E.scalaInt, E.tuple(E.STRING, E.scalaInt))
      .toDF("user", "n")
    val out = runToMemory(counted, OutputMode.Update())
    // final state per user: user-1 -> 3, user-2 -> 2 (take max over
    // update-mode emissions)
    val finalCounts = out.groupBy("user").agg(max("n").as("n"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(finalCounts == Map("1" -> 3, "2" -> 2)) // payload user field, not partitionKey
  }
}
