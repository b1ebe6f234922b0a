package graft.operators

import graft.core.Tables.t
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (driver north star): media payloads are
  * opaque `binary` columns with typed metadata alongside. Decode /
  * feature-extraction runs as typed `mapPartitions` over batches —
  * the Scala analog of `mapInPandas` — so one task owns a partition
  * of payloads and can amortize codec setup. The actual image/audio
  * codec is STUBBED (no media libs in this container) behind
  * [[StubDecoder]], a deterministic fake; the Spark-side schema,
  * partitioning, and batch shape are real and tested.
  */
object Multimodal {

  type Q = (SparkSession, String) => DataFrame

  final case class MediaRecord(doc_id: Long, payload: Array[Byte])
  final case class MediaMeta(doc_id: Long, n_bytes: Int, width: Int, height: Int)

  /** Deterministic fake decoder: real implementations would call the
    * codec here (??? in production until a codec dependency exists). */
  object StubDecoder {
    def decode(payload: Array[Byte]): (Int, Int) =
      (payload.length % 640, payload.length % 480)
  }

  /** Binary-column ingestion: text payloads encoded to bytes stand in
    * for image/audio blobs; metadata is computed without moving the
    * payload (length/md5 are per-row projections). */
  val multimodalBinary: Q = (s, dir) =>
    t(s, dir, "documents")
      .select(col("doc_id"),
        encode(col("text"), "UTF-8").as("payload"),
        md5(col("text")).as("content_hash"))
      .select(col("doc_id"), length(col("payload")).as("n_bytes"), col("content_hash"))
      .orderBy("doc_id")

  /** Typed decode pipeline: Dataset[MediaRecord] -> mapPartitions
    * (batch-shaped, codec amortized per partition) -> Dataset[MediaMeta].
    */
  def decodeBatch(records: Dataset[MediaRecord]): Dataset[MediaMeta] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      // per-partition codec init would happen here
      it.map { r =>
        val (w, h) = StubDecoder.decode(r.payload)
        MediaMeta(r.doc_id, r.payload.length, w, h)
      }
    }
  }

  val multimodalDecode: Q = (s, dir) => {
    import s.implicits._
    val records = t(s, dir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRecord]
    decodeBatch(records).toDF().orderBy("doc_id")
  }

  val queries: Map[String, Q] = Map(
    "x_multimodal_binary" -> multimodalBinary,
    "x_multimodal_decode" -> multimodalDecode)

  val oracles: Map[String, String] = Map(
    "x_multimodal_binary" ->
      "SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS n_bytes, md5(text) AS content_hash FROM documents ORDER BY doc_id",
    "x_multimodal_decode" ->
      ("SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS n_bytes, " +
        "CAST(octet_length(encode(text)) % 640 AS INT) AS width, " +
        "CAST(octet_length(encode(text)) % 480 AS INT) AS height FROM documents ORDER BY doc_id"))
}
