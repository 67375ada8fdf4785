package graft.queries

import graft.multimodal.Multimodal
import graft.tables.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column surface over the synthetic media table derived
  * from `documents` (see [[graft.multimodal.Multimodal]]). ALL THREE
  * kernels are REAL — image payloads are genuine PNGs, audio genuine
  * WAVs, video genuine `vpng` containers (length-prefixed per-frame
  * PNGs; the JDK has no mp4 codec, so the container is ours, but
  * every frame decode is real `ImageIO` work) — and because
  * pixel/sample content is a deterministic integer formula and
  * PNG/PCM are lossless, DuckDB oracles recompute the decoded
  * histograms from the formulas alone: every
  * encode→shuffle→decode→histogram path is hash-verified end-to-end.
  */
object MultimodalQueries {

  // documentsFan: the codec kernels behind mediaFromDocuments are the
  // heaviest per-row work in the repo and the fixture scan plans one
  // task (Fanout's doc has the measured trade; the light dedup
  // variants below keep the plain read on the same measurements).
  private def media(spark: SparkSession, dir: String): DataFrame =
    Multimodal.mediaFromDocuments(Tables.documentsFan(spark, dir))

  /** DuckDB fragment: the shared gray-8 pixel formula at flat index
    * `i` of image `doc_id` — must match [[Multimodal.pixelAt]]. */
  private def pxSql(id: String, i: String): String =
    s"(($id*31 + ($i)*7 + (($i)*($i)) % 101) % 256)"

  /** DuckDB fragment: the gray-8 pixel formula at flat index `i` of
    * FRAME `f` of video `doc_id` — must match
    * [[Multimodal.framePixelAt]]. */
  private def fpxSql(id: String, f: String, i: String): String =
    s"(($id*31 + ($f)*13 + ($i)*7 + (($i)*($i)) % 101) % 256)"

  /** Payload + typed metadata projection — proves the binary column
    * and its struct survive the scan/shuffle path. (`n_bytes` is no
    * longer emitted: image payloads are real DEFLATE-compressed PNGs
    * whose byte count no SQL oracle can recompute; the payload's
    * integrity is proven far more strongly by the decode queries.) */
  private def mediaMeta(spark: SparkSession, dir: String): DataFrame =
    media(spark, dir).select(
      col("doc_id"), col("kind"),
      col("meta.format").as("format"),
      col("meta.width").as("width"),
      col("meta.height").as("height"),
      col("meta.n_frames").as("n_frames"))
      .orderBy("doc_id")

  private val mediaMetaSql =
    """SELECT doc_id,
      |  ['image','audio','video'][CAST(doc_id % 3 + 1 AS INT)] AS kind,
      |  ['png','wav','vpng'][CAST(doc_id % 3 + 1 AS INT)] AS format,
      |  CAST(n_chars % 28 + 4 AS INT) AS width,
      |  CAST(n_chars % 20 + 4 AS INT) AS height,
      |  CAST(n_chars % 24 + 1 AS INT) AS n_frames
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Resize metadata contract (nearest-neighbor resample for images,
    * metadata-level for the stub kinds). */
  private def mediaResize(spark: SparkSession, dir: String): DataFrame =
    Multimodal.resize(media(spark, dir), maxDim = 16).select(
      col("doc_id"),
      col("meta.width").as("width"),
      col("meta.height").as("height"))
      .orderBy("doc_id")

  private val mediaResizeSql =
    """SELECT doc_id,
      |  CAST(floor((n_chars % 28 + 4) * LEAST(16.0 / (n_chars % 28 + 4), 16.0 / (n_chars % 20 + 4), 1.0)) AS INT) AS width,
      |  CAST(floor((n_chars % 20 + 4) * LEAST(16.0 / (n_chars % 28 + 4), 16.0 / (n_chars % 20 + 4), 1.0)) AS INT) AS height
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Per-video sampled-frame counts (stride 4, anchored at frame 0)
    * PLUS the pixel sum of every sampled frame DECODED — each emitted
    * frame is a real PNG, and the oracle recomputes the decoded sums
    * from the frame-pixel formula, so the hash pins that the sampler
    * emitted exactly the right frames with exactly the right
    * content. */
  private def frameSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Multimodal.sampleFrames(media(spark, dir), stride = 4)
      .mapPartitions(_.map { fr =>
        val (_, _, px) = Multimodal.decodePng(fr.doc_id, fr.frame_bytes)
        (fr.doc_id, px.foldLeft(0L)(_ + _))
      })
      .toDF("doc_id", "frame_px_sum")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_sampled"),
        sum("frame_px_sum").as("px_sum"))
      .orderBy("doc_id")
  }

  private val frameSampleSql =
    s"""WITH vb AS (
       |  SELECT doc_id, CAST(n_chars % 28 + 4 AS BIGINT) AS w,
       |         CAST(n_chars % 20 + 4 AS BIGINT) AS h,
       |         CAST(n_chars % 24 + 1 AS BIGINT) AS nf
       |  FROM documents WHERE doc_id % 3 = 2
       |), vf AS (
       |  SELECT doc_id, w, h, unnest(generate_series(0, nf - 1)) AS f
       |  FROM vb
       |), vpx AS (
       |  SELECT doc_id, f, unnest(generate_series(0, w * h - 1)) AS i
       |  FROM vf WHERE f % 4 = 0
       |)
       |SELECT doc_id,
       |  CAST(COUNT(DISTINCT f) AS BIGINT) AS n_sampled,
       |  CAST(SUM(${fpxSql("doc_id", "f", "i")}) AS BIGINT) AS px_sum
       |FROM vpx GROUP BY doc_id ORDER BY doc_id""".stripMargin

  private def binCols(src: Column): Seq[Column] =
    (0 until Multimodal.FeatureDim).map(k =>
      element_at(src, k + 1).as(s"b$k"))

  /** Batched partition-local feature extraction. ALL THREE kinds take
    * REAL codec paths — `ImageIO.read` decodes the PNG payload
    * (16-bucket histogram of decoded gray samples, bin = px≫4),
    * `AudioSystem` decodes the WAV payload (16-bucket histogram of
    * decoded signed 16-bit samples, bin = (s+32768)≫12), and video
    * rows split the `vpng` container and `ImageIO.read` EVERY frame
    * (bin = px≫4 across all frames' decoded samples); the oracles
    * recompute all three from the pixel/sample/frame-pixel formulas,
    * so a single wrong decoded unit anywhere breaks the hash. */
  private def mediaFeatures(spark: SparkSession, dir: String): DataFrame =
    Multimodal.extractFeatures(media(spark, dir)).toDF()
      .select(Seq(col("doc_id"), col("kind"), col("n_units")) ++
        binCols(col("bins")): _*)
      .orderBy("doc_id")

  /** DuckDB fragment: the signed 16-bit PCM sample formula at index
    * `i` of clip `doc_id` — must match [[Multimodal.sampleAt]]. */
  private def smpSql(id: String, i: String): String =
    s"((($id*37 + ($i)*11 + (($i)*($i)) % 251) % 65536) - 32768)"

  private val mediaFeaturesSql = {
    val imgBins = (0 until Multimodal.FeatureDim).map { k =>
      s"COUNT(*) FILTER (${pxSql("doc_id", "i")} // 16 = $k) AS b$k"
    }.mkString(",\n  ")
    val audBins = (0 until Multimodal.FeatureDim).map { k =>
      s"COUNT(*) FILTER ((${smpSql("doc_id", "i")} + 32768) // 4096 = $k) AS b$k"
    }.mkString(",\n  ")
    // video: histogram of DECODED frame pixels across all n_frames
    // frames — the frame-pixel formula replayed over (f, i).
    val vidBins = (0 until Multimodal.FeatureDim).map { k =>
      s"COUNT(*) FILTER (${fpxSql("doc_id", "f", "i")} // 16 = $k) AS b$k"
    }.mkString(",\n  ")
    s"""WITH ipx AS (
       |  SELECT doc_id, w * h AS n_units, unnest(generate_series(0, w * h - 1)) AS i
       |  FROM (SELECT doc_id, CAST(n_chars % 28 + 4 AS BIGINT) AS w,
       |               CAST(n_chars % 20 + 4 AS BIGINT) AS h
       |        FROM documents WHERE doc_id % 3 = 0)
       |), ihist AS (
       |  SELECT doc_id, 'image' AS kind, n_units,
       |  $imgBins
       |  FROM ipx GROUP BY doc_id, n_units
       |), apx AS (
       |  SELECT doc_id, n AS n_units, unnest(generate_series(0, n - 1)) AS i
       |  FROM (SELECT doc_id, CAST(n_chars % 480 + 32 AS BIGINT) AS n
       |        FROM documents WHERE doc_id % 3 = 1)
       |), ahist AS (
       |  SELECT doc_id, 'audio' AS kind, n_units,
       |  $audBins
       |  FROM apx GROUP BY doc_id, n_units
       |), vb AS (
       |  SELECT doc_id, CAST(n_chars % 28 + 4 AS BIGINT) AS w,
       |         CAST(n_chars % 20 + 4 AS BIGINT) AS h,
       |         CAST(n_chars % 24 + 1 AS BIGINT) AS nf
       |  FROM documents WHERE doc_id % 3 = 2
       |), vf AS (
       |  SELECT doc_id, w, h, nf, unnest(generate_series(0, nf - 1)) AS f
       |  FROM vb
       |), vpx AS (
       |  SELECT doc_id, nf * w * h AS n_units, f,
       |         unnest(generate_series(0, w * h - 1)) AS i
       |  FROM vf
       |), vhist AS (
       |  SELECT doc_id, 'video' AS kind, n_units,
       |  $vidBins
       |  FROM vpx GROUP BY doc_id, n_units
       |)
       |SELECT * FROM ihist UNION ALL SELECT * FROM ahist
       |UNION ALL SELECT * FROM vhist
       |ORDER BY doc_id""".stripMargin
  }

  /** The full image chain under one hash: encode PNG → decode →
    * nearest-neighbor resample to maxDim 16 → re-encode → decode →
    * histogram. The oracle replays the sample map `src = dst·srcDim
    * div dstDim` over the pixel formula in exact integer arithmetic —
    * any divergence in either decode, the resampler, or the second
    * encode breaks the hash. */
  private def resizePixels(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // single-kind generation: BOTH the payload encoders and the resize
    // kernel are typed-mapPartitions optimizer barriers, so the kind
    // restriction must enter at the generator (a post-hoc filter still
    // paid every video's per-frame PNG encode — and before round 11's
    // fix, its decode/resample/re-encode too: the round-10 4.1x
    // regression).
    Multimodal.resize(
        Multimodal.mediaFromDocuments(Tables.documents(spark, dir),
          kinds = Seq("image")),
        maxDim = 16)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        val (w, h, _) = Multimodal.decodePng(id, payload)
        (id, w.toLong * h, Multimodal.imageBins(id, payload))
      })
      .toDF("doc_id", "n_units", "bins")
      .select(Seq(col("doc_id"), col("n_units")) ++ binCols(col("bins")): _*)
      .orderBy("doc_id")
  }

  private val resizePixelsSql = {
    val bins = (0 until Multimodal.FeatureDim).map { k =>
      s"COUNT(*) FILTER (${pxSql("doc_id", "src")} // 16 = $k) AS b$k"
    }.mkString(",\n  ")
    s"""WITH img AS (
       |  SELECT doc_id, w, h,
       |    CAST(floor(w * LEAST(16.0 / w, 16.0 / h, 1.0)) AS BIGINT) AS nw,
       |    CAST(floor(h * LEAST(16.0 / w, 16.0 / h, 1.0)) AS BIGINT) AS nh
       |  FROM (SELECT doc_id, CAST(n_chars % 28 + 4 AS BIGINT) AS w,
       |               CAST(n_chars % 20 + 4 AS BIGINT) AS h
       |        FROM documents WHERE doc_id % 3 = 0)
       |), dpx AS (
       |  SELECT doc_id, nw * nh AS n_units,
       |    ((i // nw) * h // nh) * w + ((i % nw) * w // nw) AS src
       |  FROM (SELECT doc_id, w, h, nw, nh,
       |          unnest(generate_series(0, nw * nh - 1)) AS i
       |        FROM img)
       |)
       |SELECT doc_id, n_units,
       |  $bins
       |FROM dpx GROUP BY doc_id, n_units
       |ORDER BY doc_id""".stripMargin
  }

  /** Data-quality gate over the BINARY column — the media twin of
    * `q_dq_checks`: per kind, how many payloads carry the right
    * container magic (PNG signature / RIFF header, read from the
    * actual bytes) and how many metadata structs are in their
    * declared bounds. The oracle pins the counts at "all valid" from
    * the row formulas alone — so a single mis-encoded payload
    * anywhere (wrong magic — for video, the first frame's PNG
    * signature after the container's length prefix — a dim
    * outside its derivation range) drops a count and breaks the
    * hash. Scan-speed projection + |kinds|-row aggregate. */
  private def mediaDq(spark: SparkSession, dir: String): DataFrame = {
    // video magic: the first frame's PNG signature sits after the
    // 4-byte length prefix of the `vpng` container.
    val magicOk =
      when(col("kind") === "image", hex(substring(col("payload"), 1, 4)) === "89504E47")
        .when(col("kind") === "audio", hex(substring(col("payload"), 1, 4)) === "52494646")
        .otherwise(hex(substring(col("payload"), 5, 4)) === "89504E47")
    val metaOk = col("meta.width").between(4, 31) &&
      col("meta.height").between(4, 23) &&
      col("meta.n_frames").between(1, 24)
    media(spark, dir)
      .groupBy("kind")
      .agg(count(lit(1)).as("n_rows"),
        sum(magicOk.cast("long")).as("n_magic_ok"),
        sum(metaOk.cast("long")).as("n_meta_ok"))
      .orderBy("kind")
  }

  private val mediaDqSql =
    """SELECT ['image','audio','video'][CAST(doc_id % 3 + 1 AS INT)] AS kind,
      |  COUNT(*) AS n_rows, COUNT(*) AS n_magic_ok, COUNT(*) AS n_meta_ok
      |FROM documents GROUP BY 1 ORDER BY kind""".stripMargin

  /** PERCEPTUAL IMAGE DEDUP — near-duplicate image detection by
    * 64-bit average-hash ([[Multimodal.aHash]]: decode → 8×8
    * nearest-neighbor sample → mean-threshold bits), candidate pairs
    * by the 4×16-bit pigeonhole block join (the `q_dedup_simhash`
    * machinery pointed at a PERCEPTUAL hash — lossless for hamming
    * ≤ 3 by pigeonhole), exact hamming verify. The image-side
    * member of the dedup family a multimodal training pipeline needs:
    * byte-exact dedup misses re-encoded/re-touched images; aHash is
    * brightness-invariant by construction, which the PLANTED twins
    * certify — every image with doc_id ≡ 0 (mod 30) also arrives as
    * a +3-brightness re-encode under doc_id + 10⁶, and all twins land
    * at hamming 0 (probed; tiny fixture images also produce a few
    * deterministic natural collisions, which the oracle reproduces).
    *
    * Oracle = BRUTE all-pairs hamming over the formula-derived bit
    * vectors (the `q_prefix_join` convention: the O(n²) recompute is
    * the machine-checked proof the bounded block join loses nothing).
    *
    * Scale shape: one decode+hash projection over the image scan
    * (payloads never shuffle — 8 bytes of hash per image do), a
    * bounded bucket join (cap 4096 — at larger corpora the cap must
    * scale with the degenerate-bucket profile, `CappedMinIds`
    * caveat), output-proportional verify joins. */
  private def mediaDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hashed = graft.ops.SideCache.persist(
      Multimodal.mediaFromDocuments(Tables.documents(spark, dir),
          kinds = Seq("image"))
        .select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
        .mapPartitions(_.flatMap { case (id, p) =>
          val base = (id, Multimodal.aHash(id, p))
          if (id % 30 == 0)
            Seq(base, (id + 1000000L,
              Multimodal.aHash(id + 1000000L,
                Multimodal.brightnessShift(id, p, 3))))
          else Seq(base)
        }).toDF("doc_id", "phash"))
    hashed.count() // multi-consumer: blocks + both verify joins
    val blocks = hashed.select(col("doc_id"), posexplode(
        array((0 until 4).map(b =>
          pmod(shiftright(col("phash"), b * 16), lit(65536L))): _*)))
      .toDF("doc_id", "block", "block_val")
    // OverCap.Star (not Drop): an overfull 16-bit block bucket —
    // a degenerate hash block shared by thousands of images — must
    // star-link through the bucket minimum rather than silently drop
    // candidates the brute-force oracle keeps (a Drop here would first
    // surface as an unexplained hash mismatch at a larger SF).
    val cand = graft.text.Dedup.bucketPairs(blocks,
        Seq("block", "block_val"), "doc_id", maxBucket = 4096,
        graft.text.Dedup.OverCap.Star)
      .distinct()
    cand
      .join(hashed.select(col("doc_id").as("id_a"), col("phash").as("ha")),
        "id_a")
      .join(hashed.select(col("doc_id").as("id_b"), col("phash").as("hb")),
        "id_b")
      .select(col("id_a"), col("id_b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long").as("hamming"))
      .filter(col("hamming") <= 3)
      .orderBy("id_a", "id_b")
  }

  private val mediaDedupSql = {
    // sampled pixel at 8x8 grid index i: src = (y*h div 8)*w + (x*w div 8)
    val src = "((((i // 8) * h) // 8) * w + (((i % 8) * w) // 8))"
    s"""WITH imgs AS (
       |  SELECT doc_id AS id, doc_id AS base, 0 AS shift,
       |    CAST(n_chars % 28 + 4 AS BIGINT) AS w,
       |    CAST(n_chars % 20 + 4 AS BIGINT) AS h
       |  FROM documents WHERE doc_id % 3 = 0
       |  UNION ALL
       |  SELECT doc_id + 1000000, doc_id, 3,
       |    CAST(n_chars % 28 + 4 AS BIGINT),
       |    CAST(n_chars % 20 + 4 AS BIGINT)
       |  FROM documents WHERE doc_id % 30 = 0),
       |samp AS (
       |  SELECT id, i,
       |    LEAST(${pxSql("base", src)} + shift, 255) AS px
       |  FROM (SELECT id, base, shift, w, h,
       |          unnest(generate_series(0, 63)) AS i
       |        FROM imgs)),
       |mean AS (SELECT id, SUM(px) // 64 AS m FROM samp GROUP BY id),
       |bits AS (
       |  SELECT s.id, s.i, CASE WHEN s.px > m.m THEN 1 ELSE 0 END AS b
       |  FROM samp s JOIN mean m USING (id)),
       |pairs AS (
       |  SELECT a.id AS id_a, b.id AS id_b
       |  FROM imgs a JOIN imgs b ON a.id < b.id),
       |ham AS (
       |  SELECT p.id_a, p.id_b,
       |    CAST(COUNT(*) FILTER (ba.b <> bb.b) AS BIGINT) AS hamming
       |  FROM pairs p
       |  JOIN bits ba ON ba.id = p.id_a
       |  JOIN bits bb ON bb.id = p.id_b AND bb.i = ba.i
       |  GROUP BY p.id_a, p.id_b)
       |SELECT id_a, id_b, hamming FROM ham
       |WHERE hamming <= 3 ORDER BY id_a, id_b""".stripMargin
  }

  /** PERCEPTUAL AUDIO DEDUP — the WAV tier of `q_media_dedup`:
    * near-duplicate clip detection by the 64-bit gain-invariant
    * band-profile hash ([[Multimodal.audioBandHash]]: genuine WAV
    * decode → 16 time-band peaks → loudest-band-normalized nibble
    * quantization), candidate pairs by the same 4×16-bit pigeonhole
    * block join (lossless for hamming ≤ 3), exact hamming verify.
    *
    * The clips are the PLANTED band-structured cohort
    * ([[Multimodal.encodeBandWav]]) rather than the natural
    * [[Multimodal.sampleAt]] sawtooth: the sawtooth's id term is a
    * constant offset under its mod, so any band-energy profile
    * collides for most clip pairs (probed: 10k of 17k pairs within
    * hamming 3 — a degenerate measurement); the planted cohort's
    * per-band amplitudes genuinely vary by id (the `q_lsh_curve`
    * planting convention). Every clip with doc_id ≡ 1 (mod 30) also
    * arrives as a HALF-GAIN re-encode under doc_id + 10⁶ — all twins
    * land at hamming 0 because uniform gain cancels exactly in the
    * nibble quantization (probed at every SF: the hamming-0 set is
    * exactly the twin set; a few near-pairs from quantization jitter
    * appear at sf0.1, which the oracle reproduces).
    *
    * Oracle = BRUTE all-pairs hamming over the formula-derived
    * profiles (the `q_media_dedup` convention: the O(n²) recompute is
    * the machine-checked proof the bounded block join loses nothing).
    *
    * Scale shape: one synth+decode+hash projection over the audio
    * scan (payloads never shuffle — 8 bytes of hash per clip do), a
    * bounded bucket join (OverCap.Star at 4096), output-proportional
    * verify joins. */
  private def audioDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hashed = graft.ops.SideCache.persist(
      Tables.documents(spark, dir)
        .filter(col("doc_id") % 3 === 1)
        .select(col("doc_id"), col("n_chars")).as[(Long, Long)]
        .mapPartitions(_.flatMap { case (id, nc) =>
          val n = Multimodal.nSamples(nc)
          def row(rid: Long, shift: Int) =
            (rid, Multimodal.audioBandHash(rid,
              Multimodal.encodeBandWav(id, n, shift)))
          val base = row(id, 0)
          if (id % 30 == 1) Seq(base, row(id + 1000000L, 1)) else Seq(base)
        }).toDF("doc_id", "phash"))
    hashed.count() // multi-consumer: blocks + both verify joins
    val blocks = hashed.select(col("doc_id"), posexplode(
        array((0 until 4).map(b =>
          pmod(shiftright(col("phash"), b * 16), lit(65536L))): _*)))
      .toDF("doc_id", "block", "block_val")
    val cand = graft.text.Dedup.bucketPairs(blocks,
        Seq("block", "block_val"), "doc_id", maxBucket = 4096,
        graft.text.Dedup.OverCap.Star)
      .distinct()
    cand
      .join(hashed.select(col("doc_id").as("id_a"), col("phash").as("ha")),
        "id_a")
      .join(hashed.select(col("doc_id").as("id_b"), col("phash").as("hb")),
        "id_b")
      .select(col("id_a"), col("id_b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long").as("hamming"))
      .filter(col("hamming") <= 3)
      .orderBy("id_a", "id_b")
  }

  private val audioDedupSql =
    """WITH auds AS (
      |  SELECT doc_id AS id, doc_id AS base FROM documents WHERE doc_id % 3 = 1
      |  UNION ALL
      |  SELECT doc_id + 1000000, doc_id FROM documents WHERE doc_id % 30 = 1),
      |prof AS (
      |  SELECT id, b,
      |    1 + ((base * (48271 + b) + b * b * 7919) % 100003) % 97 AS a
      |  FROM (SELECT id, base, unnest(generate_series(0, 15)) AS b FROM auds)),
      |quant AS (
      |  SELECT id, b, (a * 15) // MAX(a) OVER (PARTITION BY id) AS qv
      |  FROM prof),
      |hashes AS (
      |  SELECT id,
      |    CAST(SUM(CASE WHEN b < 8 THEN qv * (1::BIGINT << (b * 4))
      |      ELSE 0 END) AS BIGINT) AS lo,
      |    CAST(SUM(CASE WHEN b >= 8 THEN qv * (1::BIGINT << ((b - 8) * 4))
      |      ELSE 0 END) AS BIGINT) AS hi
      |  FROM quant GROUP BY id)
      |SELECT a.id AS id_a, b.id AS id_b,
      |  CAST(bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi))
      |    AS BIGINT) AS hamming
      |FROM hashes a JOIN hashes b ON a.id < b.id
      |WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= 3
      |ORDER BY id_a, id_b""".stripMargin

  /** PERCEPTUAL VIDEO DEDUP — completes the modality triad
    * (`q_media_dedup` images, `q_audio_dedup` WAV): a video's
    * fingerprint is the aHash of THREE deterministically sampled
    * frames (first / middle / last — the keyframe-sketch convention:
    * temporal structure without decoding every frame), compared by
    * SUMMED hamming over the 192 bits. Brightness-twin invariance is
    * inherited per frame from aHash; candidates come from the
    * pigeonhole block join over all 12 16-bit blocks (lossless for
    * total hamming ≤ 3: at most 3 of 12 blocks can differ), exact
    * hamming verify, brute all-pairs oracle re-deriving every frame
    * hash from the frame-pixel formula (with the clamp modeled).
    * Every video with doc_id ≡ 2 (mod 30) also arrives as a
    * +3-brightness re-encode of EVERY frame (genuine per-frame
    * decode → shift → PNG re-encode → container reassembly) under
    * doc_id + 10⁶.
    *
    * Scale shape: per video only the 3 sampled frames decode (the
    * stride discipline of `q_frame_sample`); payloads never shuffle —
    * 24 bytes of hashes do; bounded bucket join; output-proportional
    * verify. */
  private def videoDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hashed = graft.ops.SideCache.persist(
      Tables.documentsFan(spark, dir)
        .filter(col("doc_id") % 3 === 2)
        .select(col("doc_id"), col("n_chars")).as[(Long, Long)]
        .mapPartitions(_.flatMap { case (id, nc) =>
          val w = Multimodal.imgWidth(nc); val h = Multimodal.imgHeight(nc)
          val n = (nc % 24 + 1).toInt
          val frames = Multimodal.splitVideoFrames(id,
            Multimodal.encodeVideo(id, w, h, n))
          val picks = Seq(0, (n - 1) / 2, n - 1)
          def hashesOf(rid: Long, fs: Seq[Array[Byte]]) =
            picks.map(f => Multimodal.aHash(rid, fs(f)))
          val base = (id, hashesOf(id, frames.toSeq))
          if (id % 30 == 2) {
            val shifted = frames.toSeq.map(f =>
              Multimodal.brightnessShift(id, f, 3))
            Seq(base, (id + 1000000L, hashesOf(id + 1000000L, shifted)))
          } else Seq(base)
        }).map { case (id, hs) => (id, hs(0), hs(1), hs(2)) }
        .toDF("doc_id", "h0", "h1", "h2"))
    hashed.count()
    val blocks = hashed.select(col("doc_id"), posexplode(array(
        (for (s <- 0 until 3; b <- 0 until 4) yield
          pmod(shiftright(col(s"h$s"), b * 16), lit(65536L))): _*)))
      .toDF("doc_id", "block", "block_val")
    val cand = graft.text.Dedup.bucketPairs(blocks,
        Seq("block", "block_val"), "doc_id", maxBucket = 4096,
        graft.text.Dedup.OverCap.Star)
      .distinct()
    val ham = (0 until 3).map(s =>
        bit_count(col(s"a$s").bitwiseXOR(col(s"b$s"))).cast("long"))
      .reduce(_ + _)
    cand
      .join(hashed.select(col("doc_id").as("id_a"), col("h0").as("a0"),
        col("h1").as("a1"), col("h2").as("a2")), "id_a")
      .join(hashed.select(col("doc_id").as("id_b"), col("h0").as("b0"),
        col("h1").as("b1"), col("h2").as("b2")), "id_b")
      .select(col("id_a"), col("id_b"), ham.as("hamming"))
      .filter(col("hamming") <= 3)
      .orderBy("id_a", "id_b")
  }

  private val videoDedupSql = {
    // sampled pixel at 8x8 grid index i of frame f: the aHash sample
    // of the frame-pixel formula, with the +shift brightness twin
    // clamped at 255
    val src = "((((i // 8) * h) // 8) * w + (((i % 8) * w) // 8))"
    s"""WITH vids AS (
       |  SELECT doc_id AS id, doc_id AS base, 0 AS shift,
       |    CAST(n_chars % 28 + 4 AS BIGINT) AS w,
       |    CAST(n_chars % 20 + 4 AS BIGINT) AS h,
       |    CAST(n_chars % 24 + 1 AS BIGINT) AS nf
       |  FROM documents WHERE doc_id % 3 = 2
       |  UNION ALL
       |  SELECT doc_id + 1000000, doc_id, 3,
       |    CAST(n_chars % 28 + 4 AS BIGINT),
       |    CAST(n_chars % 20 + 4 AS BIGINT),
       |    CAST(n_chars % 24 + 1 AS BIGINT)
       |  FROM documents WHERE doc_id % 30 = 2),
       |samp AS (
       |  SELECT id, slot, i,
       |    LEAST(${fpxSql("base", "f", src)} + shift, 255) AS px
       |  FROM (SELECT id, base, shift, w, h,
       |          sl.slot,
       |          CASE sl.slot WHEN 0 THEN 0
       |            WHEN 1 THEN (nf - 1) // 2 ELSE nf - 1 END AS f,
       |          unnest(generate_series(0, 63)) AS i
       |        FROM vids
       |        CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS slot) sl)),
       |mean AS (
       |  SELECT id, slot, SUM(px) // 64 AS m FROM samp GROUP BY 1, 2),
       |bits AS (
       |  SELECT s.id, s.slot, s.i,
       |    CASE WHEN s.px > m.m THEN 1 ELSE 0 END AS b
       |  FROM samp s JOIN mean m ON m.id = s.id AND m.slot = s.slot),
       |hashes AS (
       |  SELECT id, slot,
       |    CAST(SUM(CASE WHEN i < 32 THEN b * (1::BIGINT << i)
       |      ELSE 0 END) AS BIGINT) AS lo,
       |    CAST(SUM(CASE WHEN i >= 32 THEN b * (1::BIGINT << (i - 32))
       |      ELSE 0 END) AS BIGINT) AS hi
       |  FROM bits GROUP BY 1, 2),
       |vhash AS (
       |  SELECT id,
       |    MAX(CASE WHEN slot = 0 THEN lo END) AS lo0,
       |    MAX(CASE WHEN slot = 0 THEN hi END) AS hi0,
       |    MAX(CASE WHEN slot = 1 THEN lo END) AS lo1,
       |    MAX(CASE WHEN slot = 1 THEN hi END) AS hi1,
       |    MAX(CASE WHEN slot = 2 THEN lo END) AS lo2,
       |    MAX(CASE WHEN slot = 2 THEN hi END) AS hi2
       |  FROM hashes GROUP BY id),
       |ham AS (
       |  SELECT a.id AS id_a, b.id AS id_b,
       |    CAST(bit_count(xor(a.lo0, b.lo0)) AS BIGINT)
       |      + CAST(bit_count(xor(a.hi0, b.hi0)) AS BIGINT)
       |      + CAST(bit_count(xor(a.lo1, b.lo1)) AS BIGINT)
       |      + CAST(bit_count(xor(a.hi1, b.hi1)) AS BIGINT)
       |      + CAST(bit_count(xor(a.lo2, b.lo2)) AS BIGINT)
       |      + CAST(bit_count(xor(a.hi2, b.hi2)) AS BIGINT) AS hamming
       |  FROM vhash a JOIN vhash b ON a.id < b.id)
       |SELECT id_a, id_b, hamming FROM ham
       |WHERE hamming <= 3 ORDER BY id_a, id_b""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("q_media_dedup", mediaDedup, Some(mediaDedupSql)),
    Q("q_audio_dedup", audioDedup, Some(audioDedupSql)),
    Q("q_video_dedup", videoDedup, Some(videoDedupSql)),
    Q("q_media_dq", mediaDq, Some(mediaDqSql)),
    Q("q_media_meta", mediaMeta, Some(mediaMetaSql)),
    Q("q_media_resize", mediaResize, Some(mediaResizeSql)),
    Q("q_frame_sample", frameSample, Some(frameSampleSql)),
    Q("q_media_features", mediaFeatures, Some(mediaFeaturesSql)),
    Q("q_resize_pixels", resizePixels, Some(resizePixelsSql)),
  )
}
