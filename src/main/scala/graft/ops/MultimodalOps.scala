package graft.ops

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing: opaque binary payloads + typed metadata,
  * processed by a partition-wise "decoder".
  *
  * The real image/audio decode step is STUBBED (this container has no media
  * libraries): `decodeStub` derives deterministic fake features (byte length,
  * fake frame count, md5 checksum, first byte) from the payload bytes. The
  * Spark-side plumbing is real and is the part under test: binary column +
  * metadata struct schema, `mapPartitions` batch shape (one decoder init per
  * partition, streamed iterator — the Scala analog of a Pandas-UDF
  * `mapInPandas` batch), and a partition count that scales with input splits
  * rather than row count.
  */
object MultimodalOps {
  type Q = (SparkSession, String) => DataFrame

  /** Deterministic fake "decode" — replace with a real media decoder. */
  private[ops] def decodeStub(payload: Array[Byte]): (Long, Long, String, Long) = {
    val md = MessageDigest.getInstance("MD5")
    val checksum = md.digest(payload).map("%02x".format(_)).mkString
    val byteLen = payload.length.toLong
    val nFrames = byteLen / 256 + 1 // fake frame-sampling: one frame per 256 bytes
    val head = if (payload.nonEmpty) (payload(0) & 0xff).toLong else -1L
    (byteLen, nFrames, checksum, head)
  }

  val queries: Map[String, Q] = Map(
    // Binary payload + metadata struct → per-partition decoded features.
    "mm1_binary_decode" -> { (s, d) =>
      import s.implicits._
      val blobs = Tables.documents(s, d).select(
        col("doc_id"),
        col("text").cast("binary").as("payload"),
        struct(col("lang"), col("source"), col("n_chars")).as("meta"))
      val decoded = blobs
        .select(col("doc_id"), col("payload"), col("meta.n_chars").as("n_chars"))
        .as[(Long, Array[Byte], Long)]
        .mapPartitions { it =>
          // one decoder context per partition (the expensive-init seam a
          // real decoder needs); rows stream through without buffering.
          it.map { case (id, payload, nChars) =>
            val (byteLen, nFrames, checksum, head) = decodeStub(payload)
            (id, byteLen, nFrames, checksum, head, nChars)
          }
        }
        .toDF("doc_id", "byte_len", "n_frames", "checksum", "head_byte", "n_chars")
      decoded.orderBy("doc_id")
    })

  val oracles: Map[String, String] = Map(
    // ASCII text: octet_length == n_chars, first byte == first code point,
    // md5(blob) == md5(text).
    "mm1_binary_decode" ->
      """SELECT doc_id,
                CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
                CAST(octet_length(encode(text)) // 256 + 1 AS BIGINT) AS n_frames,
                md5(text) AS checksum,
                CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS head_byte,
                n_chars
         FROM documents ORDER BY doc_id""")
}
