package graft.sources.shard

import java.util.concurrent.ConcurrentHashMap
import scala.collection.mutable.ArrayBuffer
import scala.util.hashing.MurmurHash3

/** One record in a shard — mirrors the reference's record envelope
  * (`/root/reference/src/main/scala/com/syntaxjockey/reactivestreams/kinesis/ShardSubscription.java:37`,
  * data/partitionKey/sequenceNumber usage at
  * `ShardPublisherVerification.scala:45-51`). `seq` is the per-stream
  * monotone position; rendered as a zero-padded string on the wire so
  * lexical order == numeric order (like Kinesis sequence numbers).
  */
final case class StoredRecord(seq: Long, partitionKey: String, data: Array[Byte])

/** Thrown by the service on injected failures — counterpart of the
  * reference's error path (`ShardSubscription.java:240-244,258-262`)
  * and its (dead) wrapper `AmazonKinesisException.java:3-7`. */
final class ShardServiceException(msg: String) extends RuntimeException(msg)

/** Starting-position types accepted by `getShardIterator` — the full
  * public enum the reference passes through verbatim
  * (`ShardSubscription.java:76-86`, SURVEY §1.1). */
object IteratorType {
  val TrimHorizon = "TRIM_HORIZON"
  val Latest = "LATEST"
  val AtSequenceNumber = "AT_SEQUENCE_NUMBER"
  val AfterSequenceNumber = "AFTER_SEQUENCE_NUMBER"
}

/** Deterministic in-memory shard service — the test substrate of
  * SURVEY §7.1. Implements exactly the API slice the reference
  * consumes: DescribeStream (`ShardPublisherVerification.scala:31-38`),
  * GetShardIterator + GetRecords (`ShardSubscription.java:79-84,144-147`)
  * and PutRecord with `sequenceNumberForOrdering` chaining
  * (`ShardPublisherVerification.scala:42-52`).
  *
  * Scale note: this is the LOCAL stand-in for a remote sharded log
  * service (zero-egress sandbox). The DSv2 source/sink talk to it
  * through [[ShardServiceRegistry]]; on a real cluster the registry
  * lookup would be replaced by a network client configured from the
  * same options — the partition/offset/ordering model is unchanged.
  * All mutation is synchronized per stream; readers take immutable
  * snapshots, so concurrent Spark tasks never observe torn state.
  */
final class ShardStream(val name: String, val numShards: Int) {
  require(numShards > 0, s"numShards must be positive: $numShards")

  private val shards: Array[ArrayBuffer[StoredRecord]] =
    Array.fill(numShards)(new ArrayBuffer[StoredRecord])
  private var nextSeq: Long = 0L
  // last sequence number assigned per partitionKey (ordering chain)
  private val lastSeqForKey = new java.util.HashMap[String, Long]()

  def shardIds: Seq[String] = (0 until numShards).map(shardIdOf)
  def shardIdOf(i: Int): String = f"shardId-$i%012d"
  private def indexOf(shardId: String): Int = {
    val i = shardIds.indexOf(shardId)
    if (i < 0) throw new ShardServiceException(s"unknown shard $shardId in stream $name")
    i
  }

  /** Deterministic shard routing by partition key (murmur3, stable
    * across JVMs) — the role Kinesis' md5-of-key hashing plays. */
  def shardFor(partitionKey: String): Int =
    math.floorMod(MurmurHash3.stringHash(partitionKey, 42), numShards)

  /** Append a record; returns its sequence number. When
    * `seqForOrdering` is given, enforces the chain invariant the
    * reference's harness relies on (`ShardPublisherVerification.scala:47-49`):
    * the new record must land after the cited sequence number for the
    * same key. */
  def putRecord(partitionKey: String, data: Array[Byte],
                seqForOrdering: Option[Long] = None): Long = synchronized {
    ShardServiceRegistry.maybeFail(name, "putRecord")
    seqForOrdering.foreach { prev =>
      val last = lastSeqForKey.getOrDefault(partitionKey, -1L)
      if (prev != last)
        throw new ShardServiceException(
          s"ordering violation for key $partitionKey: chained after $prev but last is $last")
    }
    val seq = nextSeq
    nextSeq += 1
    shards(shardFor(partitionKey)) += StoredRecord(seq, partitionKey, data)
    lastSeqForKey.put(partitionKey, seq)
    seq
  }

  /** Number of records currently in a shard (the shard's end index). */
  def size(shardId: String): Long = synchronized { shards(indexOf(shardId)).length.toLong }

  /** Index of the first record at/after a starting position — the
    * GetShardIterator resolution (`ShardSubscription.java:76-86`). */
  def resolveIndex(shardId: String, iteratorType: String, startSeq: Option[Long]): Long =
    synchronized {
      val buf = shards(indexOf(shardId))
      iteratorType match {
        case IteratorType.TrimHorizon => 0L
        case IteratorType.Latest => buf.length.toLong
        case IteratorType.AtSequenceNumber =>
          val s = startSeq.getOrElse(throw new ShardServiceException("AT_SEQUENCE_NUMBER needs a sequence number"))
          buf.indexWhere(_.seq >= s) match { case -1 => buf.length.toLong; case i => i.toLong }
        case IteratorType.AfterSequenceNumber =>
          val s = startSeq.getOrElse(throw new ShardServiceException("AFTER_SEQUENCE_NUMBER needs a sequence number"))
          buf.indexWhere(_.seq > s) match { case -1 => buf.length.toLong; case i => i.toLong }
        case other => throw new ShardServiceException(s"unknown iterator type $other")
      }
    }

  /** Bounded fetch — GetRecords with a computed limit
    * (`ShardSubscription.java:139-150`). Returns an immutable snapshot
    * of records [from, from+limit). */
  def getRecords(shardId: String, fromIndex: Long, limit: Int): Seq[StoredRecord] =
    synchronized {
      ShardServiceRegistry.maybeFail(name, "getRecords")
      val buf = shards(indexOf(shardId))
      val from = math.min(fromIndex, buf.length.toLong).toInt
      val until = math.min(from.toLong + math.max(limit, 0), buf.length.toLong).toInt
      buf.slice(from, until).toVector
    }
}

/** JVM-global registry binding stream names to in-memory shard
  * services. In `local[*]` the driver and executors share this JVM, so
  * DSv2 readers/writers resolve streams here; a cluster deployment
  * would swap this object for a client to the external service (same
  * interface, same semantics). */
object ShardServiceRegistry {
  private val streams = new ConcurrentHashMap[String, ShardStream]()
  // error-injection flags: (stream, op) → message
  private val failures = new ConcurrentHashMap[(String, String), String]()

  def create(name: String, numShards: Int): ShardStream = {
    val s = new ShardStream(name, numShards)
    streams.put(name, s)
    s
  }

  def get(name: String): ShardStream = {
    val s = streams.get(name)
    if (s == null) throw new ShardServiceException(s"unknown stream $name")
    ShardServiceRegistry.maybeFail(name, "describeStream")
    s
  }

  def exists(name: String): Boolean = streams.containsKey(name)

  def drop(name: String): Unit = {
    streams.remove(name)
    failures.keySet.removeIf(_._1 == name)
  }

  /** Make `op` on `stream` throw — the reference's error-injection
    * seam (`ShardSubscription.java:240-244,258-262`). */
  def injectFailure(stream: String, op: String, msg: String = "injected failure"): Unit =
    failures.put((stream, op), msg)

  def clearFailure(stream: String, op: String): Unit = failures.remove((stream, op))

  private[shard] def maybeFail(stream: String, op: String): Unit = {
    val msg = failures.get((stream, op))
    if (msg != null) throw new ShardServiceException(s"$op on $stream failed: $msg")
  }
}
