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
  * Decoders: `ImageIoDecoder` is a REAL image decoder over the in-JDK
  * javax.imageio codecs (PNG/JPEG/GIF/BMP) — see the mm_decode gate
  * query, which round-trips deterministic pixels through actual PNG
  * encode/decode under a cross-engine oracle. `DeterministicFakeDecoder`
  * remains for audio/video formats whose codecs don't ship in this
  * container (byte statistics standing in for samples) and for
  * determinism tests; swap it for an FFmpeg-backed MediaDecoder in
  * production — the plumbing contract (schema, encoders, partition
  * batching) is identical.
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

  // ---------------- real image decode (javax.imageio — in-JDK) ----------------

  case class ImageFeatures(doc_id: Long, width: Int, height: Int,
                           channels: Int, px_sum: Long)

  /** REAL image decoder over the in-JDK `javax.imageio` codecs (PNG,
    * JPEG, GIF, BMP — no external deps, offline-safe). Returns None for
    * bytes no installed reader accepts, so a mixed media column degrades
    * row-by-row instead of failing the task. px_sum is the sum of every
    * raster sample across all bands — for lossless formats (PNG) it is
    * bit-exact against the encoder's input, which is what lets the
    * mm_decode gate query carry a cross-engine oracle. */
  object ImageIoDecoder extends Serializable {
    def decode(bytes: Array[Byte]): Option[(Int, Int, Int, Long)] = {
      // ImageIO.read returns null for unrecognized bytes but THROWS for
      // recognized-but-corrupt ones (truncated IDAT etc.) — both must
      // degrade to None so one bad row never fails the task
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch { case _: java.io.IOException | _: RuntimeException => null }
      if (img == null) None
      else {
        val raster = img.getRaster
        val (w, h, ch) = (img.getWidth, img.getHeight, raster.getNumBands)
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            var b = 0
            while (b < ch) { sum += raster.getSample(x, y, b); b += 1 }
            x += 1
          }
          y += 1
        }
        Some((w, h, ch, sum))
      }
    }
  }

  /** Deterministic synthetic image per document, encoded as a REAL PNG:
    * width/height derive from doc_id, sample i (row-major, band-minor)
    * is (doc_id·31 + i) mod 256; even ids are 8-bit grayscale, odd ids
    * RGB. PNG is lossless, so decoding recovers exactly these samples —
    * the arithmetic an engine with no codec (DuckDB) can replay. One
    * encoder pass per partition, same batching contract as the decoders. */
  def syntheticPngTable(docs: DataFrame)(implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { ids =>
      // ImageIO defaults every read/write through a synchronized
      // TEMP-FILE cache — with 32 concurrent decode tasks that is one
      // temp file per image plus lock contention (measured: the r15
      // parallelized mm_decode burned 85 cpu-s in it vs 2.8 serial).
      // Memory-cached streams are contention-free and strictly faster
      // for these KB-sized payloads. JVM-global, idempotent, per-task.
      javax.imageio.ImageIO.setUseCache(false)
      ids.map { id =>
        val w = 8 + (id % 16).toInt
        val h = 8 + ((id * 7) % 16).toInt
        val gray = id % 2 == 0
        val img = new java.awt.image.BufferedImage(w, h,
          if (gray) java.awt.image.BufferedImage.TYPE_BYTE_GRAY
          else java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
        val raster = img.getRaster
        val ch = raster.getNumBands
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            var b = 0
            while (b < ch) {
              val i = (y.toLong * w + x) * ch + b
              raster.setSample(x, y, b, ((id * 31 + i) % 256).toInt)
              b += 1
            }
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        val bytes = bos.toByteArray
        MediaRow(id, bytes, "image/png", bytes.length.toLong)
      }
    }
  }

  /** Per-partition REAL decode of an image media column → dimensions,
    * channel count, and the exact sample sum. Undecodable rows are
    * dropped (logged upstream by count difference), mirroring how a
    * production pipeline quarantines corrupt media. */
  def decodeImageFeatures(media: DataFrame)(implicit spark: SparkSession): Dataset[ImageFeatures] = {
    import spark.implicits._
    media.select("doc_id", "media", "format", "n_bytes").as[MediaRow]
      .mapPartitions { rows =>
        // memory-cached ImageIO streams — see syntheticPngTable
        javax.imageio.ImageIO.setUseCache(false)
        rows.flatMap { r =>
          ImageIoDecoder.decode(r.media).map { case (w, h, ch, sum) =>
            ImageFeatures(r.doc_id, w, h, ch, sum)
          }
        }
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

  /** dHash-style perceptual fingerprint over the payload bytes
    * (difference hash, public algorithm): sample 33 evenly-spaced bytes
    * and pack each "next sampled byte > current" comparison into a
    * 32-bit fingerprint. Re-encodes that shift absolute byte values but
    * preserve their relative ordering (the brightness/gain analogy of
    * real perceptual hashing) collide onto the same fingerprint, so a
    * plain GROUP BY yields perceptual-dup clusters with NO pairwise
    * stage at all — ONE wide codegen'd projection (33 byte extracts + 32
    * compares, all integer arithmetic) and ONE hash aggregate. The
    * sampling grid normalizes payload length the way image dHash
    * normalizes resolution: same content at different sizes still lines
    * up its comparisons.
    *
    * Returns (idCol, dhash: long). Payloads shorter than 2 bytes
    * fingerprint to 0 (every comparison false). */
  def dhashFingerprint(media: DataFrame, idCol: String = "doc_id",
                       bytesCol: String = "media"): DataFrame = {
    val bits = 32
    val span = greatest(octet_length(col(bytesCol)) - 1, lit(0))
    // 1-based sample positions, then byte values: hex→int is binary-safe
    // (ascii() would mangle non-UTF8 payloads)
    val withPos = (0 to bits).foldLeft(media) { (df, i) =>
      df.withColumn(s"__pos_$i",
        (floor(lit(i) * span / lit(bits.toDouble)) + 1).cast("int"))
    }
    val withBytes = (0 to bits).foldLeft(withPos) { (df, i) =>
      df.withColumn(s"__b_$i",
        conv(hex(expr(s"substring($bytesCol, __pos_$i, 1)")), 16, 10).cast("long"))
    }
    val fp = (0 until bits).map(i =>
        when(col(s"__b_${i + 1}") > col(s"__b_$i"), lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)
    withBytes.select(col(idCol), fp.as("dhash"))
  }

  /** Perceptual NEAR-dup pairs: hamming(dhash_a, dhash_b) <= maxHamming
    * via pigeonhole banding (the simhashNearDupsExact argument, applied
    * to the perceptual fingerprint): split the 32-bit fingerprint into
    * `bands` equal bit slices — at most maxHamming flips touch at most
    * maxHamming bands, so whenever bands > maxHamming some band matches
    * EXACTLY and the band equi-join's candidate set is provably
    * complete, not probabilistically recalled. Candidates verify with
    * one codegen'd bit_count(xor). No cartesian anywhere.
    *
    * Expects (idCol, dhash) — [[dhashFingerprint]]'s output. Returns
    * (id_a, id_b, hamming) with id_a < id_b. */
  def dhashNearDups(fp: DataFrame, idCol: String = "doc_id",
                    maxHamming: Int = 6, bands: Int = 8): DataFrame = {
    require(bands > maxHamming, s"pigeonhole needs bands > maxHamming: $bands <= $maxHamming")
    require(32 % bands == 0, s"bands must divide 32: $bands")
    val w = 32 / bands
    val banded = fp.select(col(idCol), col("dhash"),
      posexplode(array((0 until bands).map(b =>
        shiftrightunsigned(col("dhash"), b * w).bitwiseAND(lit((1L << w) - 1))): _*))
        .as(Seq("band_id", "band_bits")))
    val a = banded.select(col("band_id"), col("band_bits"),
      col(idCol).as("id_a"), col("dhash").as("fp_a"))
    val b = banded.select(col("band_id"), col("band_bits"),
      col(idCol).as("id_b"), col("dhash").as("fp_b"))
    a.join(b, Seq("band_id", "band_bits"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("fp_a"), col("fp_b")).distinct()
      .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Integer-quantized 8×8 DCT-II basis (×1024): B(x,u) =
    * round(cos(π(2x+1)u/16)·1024). Quantizing the basis keeps every
    * pHash coefficient in EXACT int64 arithmetic — no cosine ulps, no
    * float summation order — so any engine replays the fingerprint
    * bit-for-bit. */
  private[graft] val dctBasis: Array[Array[Long]] =
    Array.tabulate(8, 8)((x, u) =>
      Math.round(Math.cos(Math.PI * (2 * x + 1) * u / 16.0) * 1024.0))

  /** pHash-style DCT perceptual fingerprint (public algorithm family,
    * same byte-domain adaptation as [[dhashFingerprint]]): sample 64
    * evenly-spaced bytes as an 8×8 matrix, take its 2-D DCT with the
    * integer-quantized basis, drop the DC term and pack "coefficient >
    * median" into 63 bits. Where dHash captures local ordering, pHash
    * captures the payload's low-frequency STRUCTURE: adding a constant
    * to every byte (the uniform-brightness re-encode) moves only the DC
    * coefficient, so shifted payloads collide (PipelineSpec proves it).
    * One wide codegen'd projection; dup clustering is a plain GROUP BY.
    * Returns (idCol, phash: long). */
  def phashFingerprint(media: DataFrame, idCol: String = "doc_id",
                       bytesCol: String = "media"): DataFrame = {
    val n = 8; val dim = n * n
    val span = greatest(octet_length(col(bytesCol)) - 1, lit(0))
    val withPos = (0 until dim).foldLeft(media) { (df, i) =>
      df.withColumn(s"__p_$i",
        (floor(lit(i) * span / lit((dim - 1).toDouble)) + 1).cast("int"))
    }
    val withBytes = (0 until dim).foldLeft(withPos) { (df, i) =>
      df.withColumn(s"__s_$i",
        conv(hex(expr(s"substring($bytesCol, __p_$i, 1)")), 16, 10).cast("long"))
    }
    // K(u,v) = Σ_{r,c} s(8r+c) · B(r,u)·B(c,v); the basis product folds
    // into one literal per term. |term| ≤ 255·1024² — int64-safe ×64.
    def coeff(u: Int, v: Int) =
      (0 until dim).map { k =>
        col(s"__s_$k") * lit(dctBasis(k / n)(u) * dctBasis(k % n)(v))
      }.reduce(_ + _)
    val coeffs = for { u <- 0 until n; v <- 0 until n; if (u, v) != ((0, 0)) }
      yield coeff(u, v)
    val withK = withBytes.withColumn("__k", array(coeffs: _*))
    val med = element_at(array_sort(col("__k")), 32)
    val fp = (0 until 63).map(j =>
        when(element_at(col("__k"), j + 1) > med, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    withK.select(col(idCol), fp.as("phash"))
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
