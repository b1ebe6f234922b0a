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

  /** Frame sampling plumbing: one row per sampled frame of a video
    * payload. Frame count comes from the (stubbed, deterministic)
    * container probe; the explode shape — payload stays on the row it
    * was read on, frames multiply rows AFTER metadata extraction so
    * the shuffle never carries duplicated payload bytes — is the real
    * production layout. */
  val multimodalFrames: Q = (s, dir) =>
    t(s, dir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .select(col("doc_id"), length(col("payload")).as("n_bytes"))
      .withColumn("n_frames", pmod(col("n_bytes"), lit(30)) + 1)
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1)).as("frame_id"))
      .orderBy("doc_id", "frame_id")

  /** Feature extraction: payload batch -> fixed-dim embedding. The
    * model call is stubbed (deterministic projection of byte stats);
    * the signature — mapPartitions over batches, Array[Float] output
    * column compatible with the Similarity operators — is real. */
  final case class MediaFeature(doc_id: Long, embedding: Array[Float])

  def featureExtract(records: Dataset[MediaRecord], dim: Int = 8): Dataset[MediaFeature] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      // per-partition model init would happen here
      it.map { r =>
        // one pass over the payload (the iterator/filter formulation
        // re-scanned it once per output dimension)
        val sums = new Array[Int](dim)
        var i = 0
        while (i < r.payload.length) { sums(i % dim) += r.payload(i).toInt; i += 1 }
        MediaFeature(r.doc_id,
          Array.tabulate(dim)(d => (sums(d) % 1000) / 1000.0f))
      }
    }
  }

  val multimodalFeatures: Q = (s, dir) => {
    import s.implicits._
    val records = t(s, dir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRecord]
    featureExtract(records).toDF()
      .select(col("doc_id"), size(col("embedding")).as("dim"))
      .orderBy("doc_id")
  }

  val queries: Map[String, Q] = Map(
    "x_multimodal_binary" -> multimodalBinary,
    "x_multimodal_decode" -> multimodalDecode,
    "x_multimodal_frames" -> multimodalFrames,
    "x_multimodal_features" -> multimodalFeatures)

  val oracles: Map[String, String] = Map(
    "x_multimodal_binary" ->
      "SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS n_bytes, md5(text) AS content_hash FROM documents ORDER BY doc_id",
    "x_multimodal_decode" ->
      ("SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS n_bytes, " +
        "CAST(octet_length(encode(text)) % 640 AS INT) AS width, " +
        "CAST(octet_length(encode(text)) % 480 AS INT) AS height FROM documents ORDER BY doc_id"),
    "x_multimodal_frames" ->
      ("WITH m AS (SELECT doc_id, octet_length(encode(text)) % 30 + 1 AS n_frames FROM documents) " +
        "SELECT doc_id, CAST(n_frames AS INT) AS n_frames, CAST(u.f AS INT) AS frame_id " +
        "FROM m, unnest(range(0, n_frames)) AS u(f) ORDER BY doc_id, frame_id"),
    "x_multimodal_features" ->
      "SELECT doc_id, 8 AS dim FROM documents ORDER BY doc_id")
}
