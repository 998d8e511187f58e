package graft.streaming

import java.time.Instant
import java.util.UUID
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener.{
  QueryProgressEvent, QueryStartedEvent, QueryTerminatedEvent}

/** Rolling metrics for one streaming query run — the ops-facing
  * counterpart of the reference's per-event SLF4J logging
  * (`ShardSubscription.java` logs each fetch/emit/complete;
  * `ShardPublisher.java:47` logs subscribe). A micro-batch engine's
  * natural grain is the batch, so the exported surface is per-batch:
  * row counts, state-store size, and event-time watermark lag.
  *
  * @param name          query name (sink table / user-assigned)
  * @param batches       progress events observed (incl. zero-row batches)
  * @param inputRows     total rows ingested across batches
  * @param lastBatchRows rows in the most recent batch
  * @param stateRows     total rows across state operators (last batch)
  * @param watermarkMs   current event-time watermark, epoch millis
  *                      (None until the first watermarked batch)
  * @param watermarkLagMs max observed event time minus watermark — the
  *                      lateness window the state store is carrying
  * @param backlogRows   unread rows still in the source after the last
  *                      batch (admissible log end minus processed
  *                      offset, summed over shards) — consumer lag,
  *                      the first metric a Kinesis operator watches;
  *                      None for sources without shard-map offsets
  * @param terminated    query has ended (cleanly or not)
  * @param error         terminal exception message, if the run failed
  */
final case class QueryMetrics(
    name: String,
    batches: Long,
    inputRows: Long,
    lastBatchRows: Long,
    stateRows: Long,
    watermarkMs: Option[Long],
    watermarkLagMs: Option[Long],
    backlogRows: Option[Long],
    terminated: Boolean,
    error: Option[String])

/** Session-wide [[StreamingQueryListener]] collecting [[QueryMetrics]]
  * per query. Listener callbacks arrive on the engine's listener bus
  * (async — callers poll [[snapshot]] rather than assuming delivery
  * order), so state lives in concurrent maps: active runs keyed by
  * run-scoped query id, folded into a by-name map on termination so
  * the id-keyed side stays bounded by in-flight queries and the
  * name-keyed side by distinct query names.
  *
  * Scale: one listener per session observes every query on that
  * session; metrics are O(1) per batch (no row data retained), so the
  * overhead at 100 TB is the same as at test scale — one map update
  * and one log line per micro-batch.
  */
final class GraftStreamingObserver extends StreamingQueryListener {
  private val log = org.slf4j.LoggerFactory.getLogger(classOf[GraftStreamingObserver])

  private val active = new ConcurrentHashMap[UUID, QueryMetrics]()
  // insertion-ordered with a hard cap: generated sink names are unique
  // per run, so name-keyed retention alone would grow with every run
  // in a long-lived session — keep the most recent MaxFinished only
  private val MaxFinished = 256
  private val finished = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[String, QueryMetrics](64, 0.75f, false) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, QueryMetrics]): Boolean =
        size() > MaxFinished
    })

  /** Latest metrics per query name (active runs shadow finished ones). */
  def snapshot: Map[String, QueryMetrics] = {
    val m = scala.collection.mutable.Map.empty[String, QueryMetrics]
    finished.forEach((n, q) => m(n) = q)
    active.forEach((_, q) => m(q.name) = q)
    m.toMap
  }

  def metricsFor(name: String): Option[QueryMetrics] = snapshot.get(name)

  /** Drop all recorded metrics (test isolation). */
  def reset(): Unit = { active.clear(); finished.clear() }

  override def onQueryStarted(event: QueryStartedEvent): Unit = {
    val name = Option(event.name).getOrElse(event.id.toString)
    active.put(event.runId,
      QueryMetrics(name, 0L, 0L, 0L, 0L, None, None, None, terminated = false, None))
    log.info("stream query started: name={} runId={}", name, event.runId: Any)
  }

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    val name = Option(p.name).getOrElse(p.id.toString)
    val stateRows = p.stateOperators.map(_.numRowsTotal).sum
    // eventTime carries ISO-8601 strings only for event-time queries;
    // Spark seeds the watermark at epoch 0 before the first advance
    def stamp(key: String): Option[Long] =
      Option(p.eventTime.get(key)).map(s => Instant.parse(s).toEpochMilli)
    val wm = stamp("watermark")
    val lag = for { w <- wm; m <- stamp("max") } yield m - w
    // consumer lag: admissible log end minus processed offset, summed
    // over shards — only computable for shard-map offsets (the
    // `shardstream` source); other sources report None
    def shardMap(json: String): Option[Map[String, Long]] =
      try Option(json).map(j => graft.sources.shard.ShardStreamOffset.fromJson(j).indexes)
      catch { case scala.util.control.NonFatal(_) => None }
    val backlog = p.sources.headOption.flatMap { sp =>
      for { end <- shardMap(sp.endOffset); latest <- shardMap(sp.latestOffset) }
        yield latest.map { case (id, l) => math.max(0L, l - end.getOrElse(id, 0L)) }.sum
    }
    active.compute(p.runId, (_, prev0) => {
      val prev = if (prev0 == null)
        QueryMetrics(name, 0L, 0L, 0L, 0L, None, None, None, terminated = false, None)
      else prev0
      prev.copy(
        batches = prev.batches + 1,
        inputRows = prev.inputRows + p.numInputRows,
        lastBatchRows = p.numInputRows,
        stateRows = stateRows,
        watermarkMs = wm.orElse(prev.watermarkMs),
        watermarkLagMs = lag.orElse(prev.watermarkLagMs),
        backlogRows = backlog.orElse(prev.backlogRows))
    })
    log.info("stream query progress: name={} batch={} rows={} stateRows={} watermarkLagMs={} backlogRows={}",
      name, p.batchId: Any, p.numInputRows: Any, stateRows: Any,
      lag.map(_.toString).getOrElse("-"): Any,
      backlog.map(_.toString).getOrElse("-"): Any)
  }

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = {
    val done = active.remove(event.runId) match {
      case null =>
        // terminated before any progress/start reached us (listener
        // registered mid-run): record the terminal fact under the id
        QueryMetrics(event.id.toString, 0L, 0L, 0L, 0L, None, None, None,
          terminated = true, event.exception)
      case m => m.copy(terminated = true, error = event.exception)
    }
    finished.put(done.name, done)
    if (done.error.isDefined)
      log.warn("stream query failed: name={} error={}", done.name, done.error.get: Any)
    else
      log.info("stream query terminated: name={} batches={} rows={}",
        done.name, done.batches: Any, done.inputRows: Any)
  }
}

/** One observer per session, registered on first use and evicted when
  * the session's context ends (sessions come and go within one JVM —
  * same lifetime rule as `Tables`' memo). */
object StreamObservability {
  private val observers = new ConcurrentHashMap[SparkSession, GraftStreamingObserver]()

  def attach(spark: SparkSession): GraftStreamingObserver =
    observers.computeIfAbsent(spark, s => {
      val o = new GraftStreamingObserver
      s.streams.addListener(o)
      s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
            e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit =
          observers.remove(s)
      })
      o
    })
}
