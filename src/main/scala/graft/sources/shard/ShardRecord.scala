package graft.sources.shard

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}

/** Typed row of the `shardstream` source — the record envelope of
  * SURVEY §1.3 (`streamName, shardId, sequenceNumber, partitionKey,
  * data`), mirroring the fields of the reference's `Record` the
  * library actually touches (`ShardPublisherVerification.scala:45-51`).
  */
final case class ShardRecord(
    streamName: String,
    shardId: String,
    sequenceNumber: String,
    partitionKey: String,
    data: Array[Byte])

object ShardRecord {
  implicit val encoder: Encoder[ShardRecord] = Encoders.product[ShardRecord]

  /** Typed batch read of a stream — `Dataset[ShardRecord]` for
    * type-safe consumer dataflows (the reference's
    * `take(3).map(new String(r.getData.array))` demo, S14). */
  def dataset(spark: SparkSession, stream: String,
              options: Map[String, String] = Map.empty): Dataset[ShardRecord] = {
    var r = spark.read.format("shardstream").option("stream", stream)
    options.foreach { case (k, v) => r = r.option(k, v) }
    r.load().as[ShardRecord]
  }
}
