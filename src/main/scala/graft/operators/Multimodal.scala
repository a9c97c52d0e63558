package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.core.Hashing

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract /
  * frame-sample operators.
  *
  * The Spark-side machinery is REAL and tested — schemas, narrow
  * mapPartitions batch shape, deterministic partitioning — while the
  * actual codec step is a clearly-marked deterministic STUB
  * (`decodeStub`): this container has no image/audio libraries, so the
  * stub parses our own fake container format instead of JPEG/WAV. The
  * seam is one function; swapping in a real decoder (JNI codec or a
  * Python worker via a mapInArrow bridge) changes nothing upstream or
  * downstream of it.
  *
  * Fake container format (deterministic function of doc text):
  *   bytes[0..3]  magic "GRFT"
  *   bytes[4]     modality: 0=image, 1=audio, 2=video
  *   bytes[5..6]  width  (int16 BE)   [image/video]
  *   bytes[7..8]  height (int16 BE)   [image/video]
  *   bytes[9..10] n_frames (int16 BE) [video; 1 otherwise]
  *   bytes[11..]  payload: splitmix64 byte stream seeded by doc_id
  */
object Multimodal {

  final case class BlobRow(doc_id: Long, modality: String, payload: Array[Byte])
  final case class BlobMeta(doc_id: Long, modality: String, width: Int,
                            height: Int, n_frames: Int, n_bytes: Long)
  final case class BlobFeatures(doc_id: Long, modality: String, features: Array[Double])
  final case class FrameRow(doc_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  private val Magic = Array[Byte]('G', 'R', 'F', 'T')

  /** Deterministic blob synthesis — one opaque binary per document.
    * Modality, dimensions and payload all derive from doc_id only. */
  def synthesize(docs: DataFrame): Dataset[BlobRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      val m = (id % 3).toInt
      val w = 16 + (Hashing.splitmix64(id * 3 + 1) & 0x3f).toInt
      val h = 16 + (Hashing.splitmix64(id * 3 + 2) & 0x3f).toInt
      val frames = if (m == 2) 2 + (id % 6).toInt else 1
      val payloadLen = if (m == 1) 256 + (id % 128).toInt else w * h * frames
      val buf = java.nio.ByteBuffer.allocate(11 + payloadLen)
      buf.put(Magic).put(m.toByte)
        .putShort(w.toShort).putShort(h.toShort).putShort(frames.toShort)
      var i = 0
      var s = Hashing.splitmix64(id ^ 0xb10bL)
      while (i < payloadLen) {
        s = Hashing.splitmix64(s)
        buf.put((s & 0xff).toByte)
        i += 1
      }
      BlobRow(id, Seq("image", "audio", "video")(m), buf.array())
    }
  }

  /** ??? -- CODEC STUB. Real deployments replace this one function with
    * an actual decoder; everything else in this file stays as is. It
    * parses the fake header deterministically. */
  private def decodeStub(payload: Array[Byte]): (Int, Int, Int) = {
    require(payload.length >= 11 && payload.take(4).sameElements(Magic),
      "not a GRFT container")
    val bb = java.nio.ByteBuffer.wrap(payload, 5, 6)
    (bb.getShort.toInt, bb.getShort.toInt, bb.getShort.toInt)
  }

  /** Typed metadata extraction — narrow mapPartitions, batch shape
    * (iterator in / iterator out, zero per-row session state). */
  def meta(blobs: Dataset[BlobRow]): Dataset[BlobMeta] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.mapPartitions(_.map { b =>
      val (w, h, f) = decodeStub(b.payload)
      BlobMeta(b.doc_id, b.modality, w, h, f, b.payload.length.toLong)
    })
  }

  /** Feature extraction: 16-bin byte histogram over the payload,
    * L1-normalized — the deterministic stand-in for an embedding model.
    * Shape (fixed-width Array[Double]) matches what a real extractor
    * returns, so downstream ANN (graft.operators.Similarity) runs
    * unchanged on these features. */
  def features(blobs: Dataset[BlobRow]): Dataset[BlobFeatures] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.mapPartitions(_.map { b =>
      val hist = new Array[Double](16)
      var i = 11
      while (i < b.payload.length) {
        hist((b.payload(i) & 0xff) >> 4) += 1.0
        i += 1
      }
      val n = math.max(1.0, (b.payload.length - 11).toDouble)
      BlobFeatures(b.doc_id, b.modality, hist.map(_ / n))
    })
  }

  /** Video frame sampling: every `stride`-th frame as its own row
    * (flatMap — narrow; at scale the frame rows are where the bytes
    * explode, so this runs AFTER any doc-level filtering). */
  def sampleFrames(blobs: Dataset[BlobRow], stride: Int = 2): Dataset[FrameRow] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.filter(col("modality") === "video").flatMap { b =>
      val (w, h, frames) = decodeStub(b.payload)
      val frameSize = w * h
      (0 until frames by stride).iterator.map { fi =>
        val from = 11 + fi * frameSize
        FrameRow(b.doc_id, fi,
          java.util.Arrays.copyOfRange(b.payload, from,
            math.min(from + frameSize, b.payload.length)))
      }
    }
  }
}
