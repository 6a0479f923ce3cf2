package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque binary media + typed metadata,
  * with a pluggable per-partition decoder.
  *
  * Design for a real cluster: media bytes ride as a `binary` column next
  * to typed metadata (format/width/height/duration), so Parquet stores
  * them page-compressed and the planner can prune the heavy column when a
  * query touches only metadata. Decode/feature-extraction runs per
  * partition (one decoder instance per task, amortized init, batch-shaped
  * like mapInPandas) and partitions are sized by bytes not rows
  * (`spark.sql.files.maxPartitionBytes`) so a 100 TB media table yields
  * balanced tasks.
  *
  * STUB NOTE: no codec libraries ship in this container, so the default
  * decoder is a deterministic fake (byte statistics standing in for
  * pixels). The Spark-side plumbing — schema, encoders, partition
  * batching, feature signature — is real and tested; swap
  * `DeterministicFakeDecoder` for a JNI/FFmpeg/ImageIO-backed
  * implementation in production.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, media: Array[Byte], format: String, n_bytes: Long)
  case class MediaFeatures(doc_id: Long, format: String, n_bytes: Long,
                           byte_mean: Double, byte_max: Int, head_checksum: Long)

  /** A decoder turns raw bytes into features; one instance per partition. */
  trait MediaDecoder extends Serializable {
    def decode(docId: Long, format: String, bytes: Array[Byte]): MediaFeatures
  }

  /** Deterministic stand-in for a real image/audio decoder (see STUB NOTE). */
  object DeterministicFakeDecoder extends MediaDecoder {
    def decode(docId: Long, format: String, bytes: Array[Byte]): MediaFeatures = {
      var sum = 0L; var mx = 0; var i = 0
      while (i < bytes.length) {
        val b = bytes(i) & 0xff
        sum += b; if (b > mx) mx = b; i += 1
      }
      // 8-byte fold: max 255·(31^8−1)/30 ≈ 2.4e13 stays inside int64, so the
      // checksum is portable to engines without wrap-around multiply (the
      // DuckDB oracle recomputes it with list_reduce in BIGINT).
      val head = bytes.take(8).foldLeft(0L)((acc, b) => acc * 31 + (b & 0xff))
      MediaFeatures(docId, format, bytes.length.toLong,
        if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length, mx, head)
    }
  }

  /** Derive a media table from the documents corpus: text bytes stand in
    * for encoded media; metadata columns are first-class. */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      when(col("doc_id") % 3 === 0, "image/png")
        .when(col("doc_id") % 3 === 1, "audio/wav")
        .otherwise("video/mp4").as("format"),
      octet_length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"))

  /** Per-partition decode → features. Typed Dataset path: one decoder per
    * partition, streaming iterator (no row materialization of the whole
    * partition). */
  def extractFeatures(media: DataFrame, decoder: MediaDecoder = DeterministicFakeDecoder)
                     (implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("doc_id", "media", "format", "n_bytes").as[MediaRow]
      .mapPartitions { rows => rows.map(r => decoder.decode(r.doc_id, r.format, r.media)) }
  }

  /** Metadata-only projection — must prune the heavy binary column at the
    * scan (asserted in PlanSpec). */
  def metadataOnly(media: DataFrame): DataFrame =
    media.groupBy(col("format"))
      .agg(count(lit(1)).as("cnt"), sum(col("n_bytes")).as("total_bytes"))

  /** Frame sampling: treat the binary as a container of fixed-size frames
    * and emit every `everyNth` frame as its own row — the video/audio
    * "sample k frames per clip" primitive. Pure column algebra
    * (sequence + explode + binary substring): the media column is sliced
    * by the scan's own batch iteration, no UDF, no decoder needed for
    * container formats with fixed frame stride. Emits (doc_id, format,
    * frame_idx, frame) — downstream decode/feature-extraction then runs
    * per frame instead of per clip, so one huge video cannot skew a task. */
  def frameSample(media: DataFrame, frameBytes: Int, everyNth: Int): DataFrame = {
    require(frameBytes > 0 && everyNth > 0, s"frameBytes=$frameBytes everyNth=$everyNth")
    val nFrames = ceil(col("n_bytes") / lit(frameBytes.toDouble)).cast("int")
    media
      // sequence(0, -1) would generate a DESCENDING range for an empty
      // payload — guard to an empty array instead
      .withColumn("__idx", when(nFrames > 0, sequence(lit(0), nFrames - 1))
        .otherwise(array().cast("array<int>")))
      .select(col("doc_id"), col("format"), explode(col("__idx")).as("frame_idx"), col("media"))
      .filter(col("frame_idx") % everyNth === 0)
      .withColumn("frame", expr(s"substring(media, frame_idx * $frameBytes + 1, $frameBytes)"))
      .select(col("doc_id"), col("format"), col("frame_idx"),
        octet_length(col("frame")).as("frame_len"), col("frame"))
  }

  /** A byte-level media transform (resize/transcode); one instance per
    * partition, same plumbing contract as MediaDecoder. */
  trait MediaTransform extends Serializable {
    def transform(bytes: Array[Byte]): Array[Byte]
  }

  /** Deterministic stand-in for a real resizer (see STUB NOTE): keeps
    * every `stride`-th byte, the byte-domain analogue of nearest-neighbor
    * downsampling. Engine-portable, so the oracle can recompute the
    * resized payload bit-for-bit. */
  case class StrideResizer(stride: Int) extends MediaTransform {
    require(stride > 0)
    def transform(bytes: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte]((bytes.length + stride - 1) / stride)
      var i = 0
      while (i < out.length) { out(i) = bytes(i * stride); i += 1 }
      out
    }
  }

  /** Per-partition resize: the binary column is rewritten through the
    * transform, metadata re-derived. Typed Dataset path like
    * extractFeatures — streaming iterator, one transform instance per
    * partition, partitions sized by bytes. */
  def resize(media: DataFrame, transform: MediaTransform)
            (implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    media.select("doc_id", "media", "format", "n_bytes").as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val out = transform.transform(r.media)
          MediaRow(r.doc_id, out, r.format, out.length.toLong)
        }
      }
  }
}
