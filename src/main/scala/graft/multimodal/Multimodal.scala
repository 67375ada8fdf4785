package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support: image/audio/video payloads ride through
  * the engine as opaque `binary` columns next to a typed metadata
  * struct; per-modality kernels (decode, feature-extract, resize,
  * frame-sample) run as batched partition-local functions.
  *
  * The IMAGE and AUDIO paths are REAL end-to-end: image payloads are
  * genuine PNG files (encoded in-engine with `javax.imageio` — in the
  * JDK, no external jar) decoded with `ImageIO.read`; audio payloads
  * are genuine WAV files (encoded with `javax.sound.sampled` — also
  * in the JDK) decoded with `AudioSystem`. Both kernels emit exact
  * integer histograms of the DECODED content; because pixel/sample
  * content is a deterministic integer formula of (doc_id, index) and
  * PNG/PCM are lossless, DuckDB oracles recompute the decoded
  * histograms from the formulas alone — the whole
  * encode→shuffle→decode path is hash-verified for both modalities.
  * The VIDEO kernel remains an honest STUB (the JDK genuinely has no
  * video codec): a byte histogram of the payload stands in for a
  * frame decode, with the real plumbing (schema, partition batching,
  * kernel signature, bounded output) unchanged by a future codec
  * swap.
  *
  * At cluster scale the binary column stays columnar parquet (never
  * materialized on the driver), kernels are embarrassingly parallel
  * per partition — decode cost is linear in pixels with zero shuffle
  * — and `maxPartitionBytes` governs batch memory, exactly as with a
  * Pandas-UDF pipeline.
  */
object Multimodal {

  // ImageIO's default scratch-file cache would put a disk write in
  // the per-row decode path; in-memory streams only.
  ImageIO.setUseCache(false)

  /** Typed metadata carried beside every payload. */
  val metaSchema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false)))

  /** media table schema: (doc_id, kind, payload, meta). */
  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", metaSchema, nullable = false)))

  case class MediaMeta(format: String, width: Int, height: Int,
                       n_frames: Int)
  case class MediaRow(doc_id: Long, kind: String, payload: Array[Byte],
                      meta: MediaMeta)

  /** Deterministic gray-8 pixel value at flat index `i` (row-major)
    * of image `docId` — the shared fixture formula. Exact integer
    * arithmetic, so the DuckDB oracle reproduces it verbatim:
    * `(doc_id*31 + i*7 + (i*i) % 101) % 256`. */
  def pixelAt(docId: Long, i: Long): Int =
    ((docId * 31L + i * 7L + (i * i) % 101L) % 256L).toInt

  /** Image dims derive from `n_chars`; kept small (≤ 31×23) so the
    * per-round bench prices the kernel, not the fixture — the decode
    * cost is linear in pixels either way. */
  def imgWidth(nChars: Long): Int = (nChars % 28 + 4).toInt
  def imgHeight(nChars: Long): Int = (nChars % 20 + 4).toInt

  /** Deterministic signed 16-bit PCM sample at index `i` of audio
    * clip `docId` — the audio twin of [[pixelAt]]. Exact integer
    * arithmetic, reproduced verbatim by the DuckDB oracle:
    * `((doc_id*37 + i*11 + (i*i) % 251) % 65536) - 32768`. */
  def sampleAt(docId: Long, i: Long): Int =
    (((docId * 37L + i * 11L + (i * i) % 251L) % 65536L) - 32768L).toInt

  /** Audio clip length in samples, from `n_chars` (≤ 511 — the bench
    * prices the codec path, not the fixture). */
  def nSamples(nChars: Long): Int = (nChars % 480 + 32).toInt

  /** Canonical fixture format: 8 kHz mono PCM_SIGNED 16-bit
    * little-endian — the plain-WAV layout every decoder handles. */
  private val WavFormat =
    new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)

  /** Encode the formula clip for `docId` as a REAL WAV file via
    * `javax.sound.sampled` (in the JDK, no external jar — the same
    * "no audio libraries" premise-check that made the PNG path real).
    * PCM is lossless: decoded samples equal [[sampleAt]] exactly. */
  def encodeWav(docId: Long, n: Int): Array[Byte] = {
    val bytes = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = sampleAt(docId, i.toLong)
      bytes(2 * i) = (s & 0xFF).toByte
      bytes(2 * i + 1) = ((s >> 8) & 0xFF).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new ByteArrayInputStream(bytes), WavFormat, n.toLong)
    val bos = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Decode a WAV payload to its PCM samples. Fails LOUDLY on
    * corrupt/truncated/non-WAV bytes and on any format other than
    * 16-bit mono PCM — the [[decodePng]] contract for audio. */
  def decodeWav(docId: Long, payload: Array[Byte]): Array[Int] = {
    val ais =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(payload))
      catch { case e: Exception =>
        throw new IllegalArgumentException(
          s"undecodable audio payload for doc_id=$docId: ${e.getMessage}")
      }
    val fmt = ais.getFormat
    if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
        fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1)
      throw new IllegalArgumentException(
        s"unexpected audio format for doc_id=$docId: $fmt")
    val raw = ais.readAllBytes()
    val n = raw.length / 2
    val out = new Array[Int](n)
    val bigEndian = fmt.isBigEndian
    var i = 0
    while (i < n) {
      val b0 = raw(2 * i)
      val b1 = raw(2 * i + 1)
      out(i) =
        if (bigEndian) (b0.toInt << 8) | (b1 & 0xFF)
        else (b1.toInt << 8) | (b0 & 0xFF)
      i += 1
    }
    out
  }

  /** Encode the formula image for `docId` as a real PNG (gray-8,
    * lossless — decoded samples equal [[pixelAt]] exactly). */
  def encodePng(docId: Long, w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val data = img.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferByte].getData
    var i = 0
    while (i < w * h) { data(i) = pixelAt(docId, i.toLong).toByte; i += 1 }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Decode a PNG payload to (width, height, row-major gray samples).
    * Fails LOUDLY on an undecodable payload (corrupt bytes, truncated
    * file, wrong format) — a silent skip would undercount downstream
    * histograms. */
  def decodePng(docId: Long, payload: Array[Byte]): (Int, Int, Array[Int]) = {
    val img =
      try ImageIO.read(new ByteArrayInputStream(payload))
      catch { case e: Exception =>
        throw new IllegalArgumentException(
          s"undecodable image payload for doc_id=$docId: ${e.getMessage}")
      }
    if (img == null)
      throw new IllegalArgumentException(
        s"undecodable image payload for doc_id=$docId: not a known image format")
    val w = img.getWidth
    val h = img.getHeight
    (w, h, img.getRaster.getSamples(0, 0, w, h, 0, new Array[Int](w * h)))
  }

  /** Generator row: [[MediaRow]] plus the `n_chars` the payload
    * encoders key off. Public — Catalyst's generated encoder class
    * lives outside this package and must see the constructor. */
  case class MediaGen(doc_id: Long, kind: String,
                      payload: Array[Byte], meta: MediaMeta,
                      n_chars: Long)

  /** Deterministic synthetic media table derived from `documents`:
    * image rows (doc_id ≡ 0 mod 3) carry a REAL PNG payload encoded
    * from the pixel formula, audio rows (≡ 1) a REAL WAV encoded from
    * the sample formula; video rows carry a 96-byte sha2-chain
    * stand-in (the one genuinely codec-less kind in this container).
    * Metadata is truthful for images (PNG dims match
    * `meta.width/height`); audio length lives in-band in the WAV
    * header. */
  def mediaFromDocuments(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val base = docs.select(
      col("doc_id"),
      element_at(typedlit(Seq("image", "audio", "video")),
        (col("doc_id") % 3 + 1).cast(IntegerType)).as("kind"),
      // video payload: three chained sha2-256 digests (96 B).
      concat(
        unhex(sha2(col("text"), 256)),
        unhex(sha2(concat(col("text"), lit("1")), 256)),
        unhex(sha2(concat(col("text"), lit("2")), 256))).as("payload"),
      struct(
        element_at(typedlit(Seq("png", "wav", "mp4")),
          (col("doc_id") % 3 + 1).cast(IntegerType)).as("format"),
        (col("n_chars") % 28 + 4).cast(IntegerType).as("width"),
        (col("n_chars") % 20 + 4).cast(IntegerType).as("height"),
        (col("n_chars") % 24 + 1).cast(IntegerType).as("n_frames")).as("meta"),
      col("n_chars"))
    base.as[MediaGen].mapPartitions { it =>
      it.map { r =>
        val payload = r.kind match {
          case "image" => encodePng(r.doc_id, r.meta.width, r.meta.height)
          case "audio" => encodeWav(r.doc_id, nSamples(r.n_chars))
          case _       => r.payload
        }
        MediaRow(r.doc_id, r.kind, payload, r.meta)
      }
    }.toDF()
  }

  /** Feature row emitted by [[extractFeatures]]: `n_units` counted
    * units (pixels for images, payload bytes otherwise) and their
    * exact 16-bin integer histogram (Σbins = n_units). */
  case class MediaFeatures(doc_id: Long, kind: String, n_bytes: Int,
                           n_units: Long, bins: Array[Long])

  val FeatureDim = 16

  /** === STUB kernel (video only) ===
    * Stands in for a real frame decoder: a 16-bin histogram of the
    * payload bytes (bin = byte mod 16 = the low nibble). A real
    * implementation would decode frames here — same signature, same
    * plumbing. */
  def stubBins(payload: Array[Byte]): Array[Long] = {
    val bins = new Array[Long](FeatureDim)
    payload.foreach(b => bins((b & 0xFF) % FeatureDim) += 1L)
    bins
  }

  /** === REAL kernel (images) ===
    * `ImageIO.read` the PNG payload, histogram the decoded gray
    * samples into 16 value buckets (bin = sample ≫ 4). */
  def imageBins(docId: Long, payload: Array[Byte]): Array[Long] = {
    val (_, _, px) = decodePng(docId, payload)
    val bins = new Array[Long](FeatureDim)
    var i = 0
    while (i < px.length) { bins(px(i) >> 4) += 1L; i += 1 }
    bins
  }

  /** === REAL kernel (audio) ===
    * `AudioSystem` decodes the WAV payload; histogram of the decoded
    * signed 16-bit samples into 16 amplitude buckets
    * (bin = (sample + 32768) ≫ 12). */
  def audioBins(docId: Long, payload: Array[Byte]): Array[Long] = {
    val samples = decodeWav(docId, payload)
    val bins = new Array[Long](FeatureDim)
    var i = 0
    while (i < samples.length) { bins((samples(i) + 32768) >> 12) += 1L; i += 1 }
    bins
  }

  /** Batched per-partition feature extraction: the Scala analog of a
    * `mapInPandas` kernel — one iterator pass per partition, no
    * per-row lambda dispatch, constant memory. Images and audio take
    * the real decode paths; video the declared stub. */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.select("doc_id", "kind", "payload").as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, kind, payload) =>
          val bins = kind match {
            case "image" => imageBins(id, payload)
            case "audio" => audioBins(id, payload)
            case _       => stubBins(payload)
          }
          MediaFeatures(id, kind, payload.length, bins.sum, bins)
        }
      }
  }

  /** Frame sampling for `video` payloads: the payload is treated as
    * `n_frames` equal chunks; every `stride`-th chunk (anchored at
    * frame 0) is emitted as its own row. Explode happens executor-side
    * via flatMap — output rows ≈ |videos|·frames/stride, never
    * driver-materialized. */
  case class Frame(doc_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  def sampleFrames(media: DataFrame, stride: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(col("kind") === "video")
      .select(col("doc_id"), col("payload"), col("meta.n_frames"))
      .as[(Long, Array[Byte], Int)]
      .mapPartitions { it =>
        it.flatMap { case (id, payload, nFrames) =>
          val frameLen = math.max(payload.length / math.max(nFrames, 1), 1)
          (0 until nFrames by stride).iterator.map { f =>
            val from = f * frameLen
            Frame(id, f, payload.slice(from,
              math.min(from + frameLen, payload.length)))
          }
        }
      }
  }

  /** Resize: REAL nearest-neighbor pixel resample for images
    * (decode → sample map `src = dst·srcDim div dstDim` → re-encode
    * PNG), metadata-level scale for the stub kinds. The sample map is
    * exact integer arithmetic, so resized-pixel histograms stay
    * DuckDB-oracle-able via [[pixelAt]]. */
  def resize(media: DataFrame, maxDim: Int): DataFrame = {
    import media.sparkSession.implicits._
    val scale = least(
      lit(maxDim) / col("meta.width").cast(DoubleType),
      lit(maxDim) / col("meta.height").cast(DoubleType), lit(1.0))
    val scaled = media.withColumn("meta", struct(
      col("meta.format").as("format"),
      floor(col("meta.width") * scale).cast(IntegerType).as("width"),
      floor(col("meta.height") * scale).cast(IntegerType).as("height"),
      col("meta.n_frames").as("n_frames")))
    scaled.as[MediaRow].mapPartitions { it =>
      it.map { r =>
        if (r.kind == "image")
          r.copy(payload = resamplePng(r.doc_id, r.payload,
            r.meta.width, r.meta.height))
        else r
      }
    }.toDF()
  }

  /** Decode, nearest-neighbor-resample to (newW, newH), re-encode. */
  def resamplePng(docId: Long, payload: Array[Byte],
                  newW: Int, newH: Int): Array[Byte] = {
    // src dims are recovered from the image itself, not trusted metadata
    val (w, h, src) = decodePng(docId, payload)
    val out = new BufferedImage(newW, newH, BufferedImage.TYPE_BYTE_GRAY)
    val data = out.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferByte].getData
    var y = 0
    while (y < newH) {
      val sy = y * h / newH
      var x = 0
      while (x < newW) {
        data(y * newW + x) = src(sy * w + x * w / newW).toByte
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(out, "png", bos)
    bos.toByteArray
  }
}
