package graft.sources.shard

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DSv2 write path for `shardstream` — the reference's producer half
  * (`PutRecord` with `sequenceNumberForOrdering` chaining,
  * `ShardPublisherVerification.scala:44-51`) as a first-class Spark
  * sink: `df.write.format("shardstream")` and
  * `df.writeStream.format("shardstream")` both work.
  *
  * Ordering contract, expressed THROUGH the engine rather than by a
  * helper: the write declares `RequiresDistributionAndOrdering` —
  * clustered on the partition-key column and sorted by
  * (key, orderBy...) — so Spark plans the shuffle + sort that makes
  * each task see one key's rows contiguously and in order, and the
  * writer chains each key's sequence numbers. Per-key total order is
  * guaranteed; cross-key writes stay parallel (Kinesis semantics,
  * SURVEY §7.4).
  *
  * Options: `stream` (required), `keyCol` (default `partitionKey`),
  * `payloadCol` (default `data`), `orderBy` (comma-separated columns
  * ordering rows within a key — required for a deterministic replay
  * order, since a sort on the key alone is not stable).
  *
  * Delivery: appends are at-least-once under task retries (the test
  * substrate has no transactional commit) — same as the reference's
  * fire-and-forget `PutRecord`; the engine's checkpointing makes the
  * micro-batch boundaries exactly-once on the read side.
  */
final case class ShardSinkOptions(stream: String, keyCol: String,
                                  payloadCol: String, orderBy: Seq[String])

object ShardSinkOptions {
  def apply(options: CaseInsensitiveStringMap): ShardSinkOptions = ShardSinkOptions(
    Option(options.get("stream")).getOrElse(
      throw new IllegalArgumentException("shardstream sink: option 'stream' is required")),
    Option(options.get("keyCol")).getOrElse("partitionKey"),
    Option(options.get("payloadCol")).getOrElse("data"),
    Option(options.get("orderBy")).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty))
}

class ShardWriteBuilder(opts: ShardSinkOptions, schema: StructType) extends WriteBuilder {
  override def build(): Write = new ShardWrite(opts, schema)
}

class ShardWrite(opts: ShardSinkOptions, schema: StructType)
    extends Write with RequiresDistributionAndOrdering {

  // fail at planning, not mid-write after the shuffle already ran
  locally {
    import org.apache.spark.sql.types.{BinaryType, StringType}
    def fieldType(name: String) = schema.fields(schema.fieldIndex(name)).dataType
    require(fieldType(opts.keyCol).isInstanceOf[StringType],
      s"shardstream sink: keyCol '${opts.keyCol}' must be STRING, " +
        s"got ${fieldType(opts.keyCol).catalogString} (cast it before writing)")
    require(fieldType(opts.payloadCol) == BinaryType,
      s"shardstream sink: payloadCol '${opts.payloadCol}' must be BINARY, " +
        s"got ${fieldType(opts.payloadCol).catalogString} (cast it before writing)")
  }

  override def requiredDistribution(): Distribution =
    Distributions.clustered(Array(Expressions.identity(opts.keyCol)))

  override def requiredOrdering(): Array[SortOrder] =
    (opts.keyCol +: opts.orderBy).map { c =>
      Expressions.sort(Expressions.column(c), SortDirection.ASCENDING)
    }.toArray

  override def toBatch: BatchWrite = new BatchWrite {
    override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
      ShardWriterFactory(opts, schema)
    override def commit(messages: Array[WriterCommitMessage]): Unit = ()
    override def abort(messages: Array[WriterCommitMessage]): Unit = ()
  }

  override def toStreaming: StreamingWrite = new StreamingWrite {
    override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
      ShardWriterFactory(opts, schema)
    override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
    override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
  }
}

final case class ShardWriterFactory(opts: ShardSinkOptions, schema: StructType)
    extends DataWriterFactory with StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new ShardDataWriter(opts, schema)
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    new ShardDataWriter(opts, schema)
}

class ShardDataWriter(opts: ShardSinkOptions, schema: StructType)
    extends DataWriter[InternalRow] {
  private val keyIdx = schema.fieldIndex(opts.keyCol)
  private val payloadIdx = schema.fieldIndex(opts.payloadCol)
  private val lastSeq = scala.collection.mutable.Map.empty[String, Long]

  override def write(row: InternalRow): Unit = {
    val key = row.getUTF8String(keyIdx).toString
    val payload = row.getBinary(payloadIdx)
    val seq = ShardServiceRegistry.get(opts.stream).putRecord(key, payload, lastSeq.get(key))
    lastSeq(key) = seq
  }

  override def commit(): WriterCommitMessage = ShardWriteCommit(lastSeq.size)
  override def abort(): Unit = ()
  override def close(): Unit = ()
}

final case class ShardWriteCommit(keysWritten: Int) extends WriterCommitMessage
