package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables => T}

/** Multimodal-column plumbing: opaque `binary` payloads + typed
  * metadata, with decode/feature-extraction as per-partition imperative
  * logic over a typed Dataset (the Scala analog of a `mapInPandas`
  * batch UDF — same shape: schema in, iterator-of-batches out).
  *
  * The container has no image/audio codecs, so the DECODE STEP IS A
  * DETERMINISTIC STUB (md5 fingerprint + byte stats + synthetic
  * width/height derived from payload length). Everything around it —
  * binary column construction, partitioning, the typed mapPartitions
  * signature, the feature schema — is the real plumbing a codec drops
  * into, and is under the oracle gate.
  *
  * Scale notes (100 TB): decode is embarrassingly parallel per
  * partition (no shuffle before feature extraction); the aggregate
  * after it shuffles only the small feature rows, never the payload
  * bytes.
  */
object Multimodal extends QueryPack {

  /** Extracted feature row — what a real image decoder would emit. */
  final case class MediaFeatures(doc_id: Long, byte_len: Long, fingerprint: String,
                                 width: Long, height: Long, first_byte: Long)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q45_media_features" -> ((s, d) => {
      import s.implicits._
      // binary payload stand-in: the document text's UTF-8 bytes
      val payloads = T.documents(s, d)
        .select($"doc_id", encode($"text", "UTF-8").as("payload"))
        .as[(Long, Array[Byte])]
      // per-partition "decode" (stub): one digest instance per
      // partition, iterator in -> iterator out, no driver round-trip
      val features = payloads.mapPartitions { rows =>
        val md = MessageDigest.getInstance("MD5")
        rows.map { case (id, bytes) =>
          md.reset()
          val hex = md.digest(bytes).map("%02x".format(_)).mkString
          // synthetic geometry a real codec would read from the header
          MediaFeatures(id, bytes.length.toLong, hex,
            width = bytes.length.toLong % 640L,
            height = bytes.length.toLong / 640L + 1L,
            first_byte = if (bytes.isEmpty) -1L else (bytes(0) & 0xff).toLong)
        }
      }(Encoders.product[MediaFeatures])
      features.toDF()
        .select($"doc_id", $"byte_len", $"fingerprint", $"width", $"height", $"first_byte")
    }))

  def oracles: Map[String, String] = Map(
    // ASCII corpus: byte length == char length; first byte == ascii of
    // first char; md5 over the same UTF-8 bytes.
    "q45_media_features" ->
      """SELECT doc_id,
        |  CAST(length(text) AS BIGINT) AS byte_len,
        |  md5(text) AS fingerprint,
        |  CAST(length(text) % 640 AS BIGINT) AS width,
        |  CAST(length(text) // 640 + 1 AS BIGINT) AS height,
        |  CAST(CASE WHEN length(text) = 0 THEN -1 ELSE ascii(substr(text, 1, 1)) END AS BIGINT) AS first_byte
        |FROM documents""".stripMargin)
}
