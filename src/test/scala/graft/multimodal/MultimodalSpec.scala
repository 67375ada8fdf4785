package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private def media = Multimodal.mediaFromDocuments(
    spark.read.parquet(s"$sf0001/documents.parquet"))

  test("media table has the contract schema; payloads are real PNGs/WAVs/vpng containers") {
    // catalogString ignores nullability, which column expressions
    // legitimately widen relative to the declared contract
    assert(media.schema.catalogString == Multimodal.mediaSchema.catalogString)
    val rows = media.select(col("kind"), col("payload")).collect()
    val pngMagic = Array(0x89, 0x50, 0x4E, 0x47).map(_.toByte)
    val riffMagic = "RIFF".getBytes
    rows.foreach { r =>
      val payload = r.getAs[Array[Byte]](1)
      r.getString(0) match {
        case "image" =>
          assert(payload.take(4).sameElements(pngMagic), "not a PNG payload")
        case "audio" =>
          assert(payload.take(4).sameElements(riffMagic), "not a WAV payload")
        case _ =>
          // vpng container: 4-byte length prefix, then the first
          // frame's PNG signature
          assert(payload.length > 8 &&
            payload.slice(4, 8).sameElements(pngMagic), "not a vpng payload")
      }
    }
    assert(rows.exists(_.getString(0) == "image"))
    assert(rows.exists(_.getString(0) == "audio"))
    assert(rows.exists(_.getString(0) == "video"))
  }

  test("PNG encode→decode round-trips the pixel formula exactly") {
    val (docId, w, h) = (42L, 19, 11)
    val (dw, dh, px) = Multimodal.decodePng(docId,
      Multimodal.encodePng(docId, w, h))
    assert((dw, dh) == (w, h))
    px.zipWithIndex.foreach { case (p, i) =>
      assert(p == Multimodal.pixelAt(docId, i.toLong), s"pixel $i")
    }
  }

  test("decodePng rejects corrupt payloads loudly, naming the doc") {
    val garbage = Array.tabulate[Byte](64)(i => (i * 3).toByte)
    val e1 = intercept[IllegalArgumentException](
      Multimodal.decodePng(7L, garbage))
    assert(e1.getMessage.contains("undecodable"))
    assert(e1.getMessage.contains("doc_id=7"))
    // a TRUNCATED png (valid magic, cut mid-stream) must also fail,
    // not decode to a partial image
    val truncated = Multimodal.encodePng(7L, 16, 16).take(40)
    intercept[IllegalArgumentException](Multimodal.decodePng(7L, truncated))
  }

  test("a corrupt image payload fails the Spark job, not silently") {
    import spark.implicits._
    val bad = Seq((1L, "image", Array.tabulate[Byte](32)(_.toByte)))
      .toDF("doc_id", "kind", "payload")
    val e = intercept[Exception] {
      Multimodal.extractFeatures(bad).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("undecodable")), e.toString)
  }

  test("extractFeatures: real decode for all three kinds") {
    val n = media.count()
    val metaByDoc = media.select(col("doc_id"), col("meta.width"),
        col("meta.height"), col("meta.n_frames")).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3)))).toMap
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length == n)
    feats.foreach { f =>
      assert(f.bins.length == Multimodal.FeatureDim)
      assert(f.bins.sum == f.n_units, s"doc ${f.doc_id}")
      f.kind match {
        case "image" =>
          // decoded-histogram must equal the formula histogram exactly
          val want = new Array[Long](Multimodal.FeatureDim)
          (0L until f.n_units).foreach(i =>
            want((Multimodal.pixelAt(f.doc_id, i) >> 4)) += 1L)
          assert(f.bins.toSeq == want.toSeq, s"doc ${f.doc_id}")
        case "audio" =>
          // decoded-sample histogram must equal the formula histogram
          val want = new Array[Long](Multimodal.FeatureDim)
          (0L until f.n_units).foreach(i =>
            want((Multimodal.sampleAt(f.doc_id, i) + 32768) >> 12) += 1L)
          assert(f.bins.toSeq == want.toSeq, s"doc ${f.doc_id}")
        case _ =>
          // decoded frame-pixel histogram across ALL frames must equal
          // the frame-formula histogram
          val (w, h, nf) = metaByDoc(f.doc_id)
          assert(f.n_units == nf.toLong * w * h, s"doc ${f.doc_id}")
          val want = new Array[Long](Multimodal.FeatureDim)
          for (fr <- 0 until nf; i <- 0 until w * h)
            want(Multimodal.framePixelAt(f.doc_id, fr.toLong, i.toLong) >> 4) += 1L
          assert(f.bins.toSeq == want.toSeq, s"doc ${f.doc_id}")
      }
    }
  }

  test("vpng encode→split→decode round-trips the frame-pixel formula exactly") {
    val (docId, w, h, nf) = (44L, 9, 7, 5)
    val frames = Multimodal.splitVideoFrames(docId,
      Multimodal.encodeVideo(docId, w, h, nf))
    assert(frames.length == nf)
    frames.zipWithIndex.foreach { case (png, f) =>
      val (dw, dh, px) = Multimodal.decodePng(docId, png)
      assert((dw, dh) == (w, h), s"frame $f dims")
      px.zipWithIndex.foreach { case (p, i) =>
        assert(p == Multimodal.framePixelAt(docId, f.toLong, i.toLong),
          s"frame $f pixel $i")
      }
    }
  }

  test("splitVideoFrames rejects corrupt containers loudly, naming the doc") {
    val good = Multimodal.encodeVideo(11L, 8, 8, 3)
    // truncated mid-frame: the length prefix promises more bytes than exist
    val e1 = intercept[IllegalArgumentException](
      Multimodal.splitVideoFrames(11L, good.take(good.length - 5)))
    assert(e1.getMessage.contains("undecodable video"))
    assert(e1.getMessage.contains("doc_id=11"))
    // truncated inside a length prefix
    intercept[IllegalArgumentException](
      Multimodal.splitVideoFrames(11L, good.take(2)))
    // a well-formed container around a corrupt frame PNG still fails —
    // in the frame decode, not the split
    val bad = good.clone()
    bad(10) = (bad(10) ^ 0x55).toByte
    intercept[IllegalArgumentException](Multimodal.videoBins(11L, bad))
  }

  test("WAV encode→decode round-trips the sample formula exactly") {
    val (docId, n) = (43L, 301)
    val samples = Multimodal.decodeWav(docId, Multimodal.encodeWav(docId, n))
    assert(samples.length == n)
    samples.zipWithIndex.foreach { case (s, i) =>
      assert(s == Multimodal.sampleAt(docId, i.toLong), s"sample $i")
    }
  }

  test("decodeWav rejects corrupt payloads loudly, naming the doc") {
    val garbage = Array.tabulate[Byte](64)(i => (i * 5).toByte)
    val e1 = intercept[IllegalArgumentException](
      Multimodal.decodeWav(9L, garbage))
    assert(e1.getMessage.contains("undecodable"))
    assert(e1.getMessage.contains("doc_id=9"))
    // truncated mid-header: valid RIFF magic, cut before the fmt
    // chunk completes — must fail, not decode partially
    val truncated = Multimodal.encodeWav(9L, 64).take(20)
    intercept[IllegalArgumentException](Multimodal.decodeWav(9L, truncated))
  }

  test("sampleFrames strides within n_frames, anchored at frame 0") {
    val frames = Multimodal.sampleFrames(media, stride = 4).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame_idx % 4 == 0))
    val metaByDoc = media.filter(col("kind") === "video")
      .select(col("doc_id"), col("meta.n_frames")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val byDoc = frames.groupBy(_.doc_id)
    assert(byDoc.keySet == metaByDoc.keySet)
    byDoc.foreach { case (id, fs) =>
      assert(fs.length == (metaByDoc(id) + 3) / 4)
    }
    // every sampled frame is a REAL decodable PNG whose pixels follow
    // the frame formula
    frames.take(20).foreach { fr =>
      val (_, _, px) = Multimodal.decodePng(fr.doc_id, fr.frame_bytes)
      px.zipWithIndex.foreach { case (p, i) =>
        assert(p == Multimodal.framePixelAt(fr.doc_id, fr.frame_idx.toLong, i.toLong),
          s"doc ${fr.doc_id} frame ${fr.frame_idx} pixel $i")
      }
    }
  }

  test("resize clamps the longer edge to maxDim and resamples image pixels") {
    val r = Multimodal.resize(media, 16)
    val dims = r.select(col("meta.width"), col("meta.height")).collect()
    assert(dims.forall(x => x.getInt(0) <= 16 && x.getInt(1) <= 16))
    assert(dims.forall(x => x.getInt(0) > 0 && x.getInt(1) > 0))
    // the resized PNG really is the nearest-neighbor resample: its
    // decoded samples follow src = dst·srcDim div dstDim over the
    // original formula image
    val imgs = r.filter(col("kind") === "image")
      .select(col("doc_id"), col("payload")).collect()
    assert(imgs.nonEmpty)
    imgs.take(10).foreach { row =>
      val id = row.getLong(0)
      val (nw, nh, px) = Multimodal.decodePng(id, row.getAs[Array[Byte]](1))
      val orig = media.filter(col("doc_id") === id)
        .select(col("meta.width"), col("meta.height")).head()
      val (w, h) = (orig.getInt(0), orig.getInt(1))
      for (y <- 0 until nh; x <- 0 until nw) {
        val src = (y * h / nh) * w + (x * w / nw)
        assert(px(y * nw + x) == Multimodal.pixelAt(id, src.toLong),
          s"doc $id dst ($x,$y)")
      }
    }
    // video: EVERY frame is resampled with the same map over the
    // frame-pixel formula
    val vids = r.filter(col("kind") === "video")
      .select(col("doc_id"), col("payload")).collect()
    assert(vids.nonEmpty)
    vids.take(3).foreach { row =>
      val id = row.getLong(0)
      val orig = media.filter(col("doc_id") === id)
        .select(col("meta.width"), col("meta.height")).head()
      val (w, h) = (orig.getInt(0), orig.getInt(1))
      Multimodal.splitVideoFrames(id, row.getAs[Array[Byte]](1))
        .zipWithIndex.foreach { case (png, f) =>
          val (nw, nh, px) = Multimodal.decodePng(id, png)
          for (y <- 0 until nh; x <- 0 until nw) {
            val src = (y * h / nh) * w + (x * w / nw)
            assert(px(y * nw + x) == Multimodal.framePixelAt(id, f.toLong, src.toLong),
              s"doc $id frame $f dst ($x,$y)")
          }
        }
    }
  }

  test("q_media_dedup: every planted brightness twin is found; aHash is brightness-invariant on real payloads") {
    import spark.implicits._
    val pairs = graft.SparkEntry.queries("q_media_dedup")(spark, sf0001)
      .as[(Long, Long, Long)].collect().toSeq
    graft.ops.SideCache.releaseAll()
    assert(pairs.nonEmpty)
    // every image with doc_id % 30 == 0 has its +3-brightness twin at
    // doc_id + 1e6, and aHash must place every one at hamming 0
    val imageIds = graft.tables.Tables.documents(spark, sf0001)
      .filter(col("doc_id") % 3 === 0).select("doc_id")
      .as[Long].collect().toSeq
    val planted = imageIds.filter(_ % 30 == 0)
    assert(planted.nonEmpty)
    val pairSet = pairs.map(p => (p._1, p._2) -> p._3).toMap
    planted.foreach { id =>
      assert(pairSet.get((id, id + 1000000L)).contains(0L),
        s"planted twin of $id missing or hamming != 0")
    }
    // kernel-level invariance on a REAL decoded payload: shift every
    // pixel of an image with headroom (no clamping) and the hash is
    // bit-identical; unrelated images stay far apart
    val someId = imageIds.head
    val w = 16; val h = 12
    val png = Multimodal.encodePng(someId, w, h)
    val (_, _, px) = Multimodal.decodePng(someId, png)
    if (px.forall(_ <= 250)) {
      assert(Multimodal.aHash(someId, png) ===
        Multimodal.aHash(someId, Multimodal.brightnessShift(someId, png, 5)))
    }
    val other = imageIds.find(_ != someId).get
    val h1 = Multimodal.aHash(someId, png)
    val h2 = Multimodal.aHash(other, Multimodal.encodePng(other, w, h))
    assert(java.lang.Long.bitCount(h1 ^ h2) > 3,
      "unrelated images should not collide at the dedup threshold")
  }

  test("q_video_dedup: every planted brightness twin found at hamming 0; block join lossless vs brute") {
    import spark.implicits._
    val pairs = graft.SparkEntry.queries("q_video_dedup")(spark, sf0001)
      .as[(Long, Long, Long)].collect().toSeq
    graft.ops.SideCache.releaseAll()
    val vids = graft.tables.Tables.documents(spark, sf0001)
      .filter(col("doc_id") % 3 === 2).select("doc_id", "n_chars")
      .as[(Long, Long)].collect().toSeq
    val planted = vids.filter(_._1 % 30 == 2)
    assert(planted.nonEmpty)
    val pairMap = pairs.map(p => (p._1, p._2) -> p._3).toMap
    planted.foreach { case (id, _) =>
      assert(pairMap.get((id, id + 1000000L)).contains(0L),
        s"planted video twin of $id missing or hamming != 0")
    }
    // brute all-pairs over the same frame hashes: block join lossless
    def hashes(id: Long, nc: Long, shift: Int): Seq[Long] = {
      val w = Multimodal.imgWidth(nc); val h = Multimodal.imgHeight(nc)
      val n = (nc % 24 + 1).toInt
      val fr = Multimodal.splitVideoFrames(id,
        Multimodal.encodeVideo(id, w, h, n))
      Seq(0, (n - 1) / 2, n - 1).map { f =>
        val png = if (shift == 0) fr(f)
          else Multimodal.brightnessShift(id, fr(f), shift)
        Multimodal.aHash(id, png)
      }
    }
    val all = vids.flatMap { case (id, nc) =>
      val base = (id, hashes(id, nc, 0))
      if (id % 30 == 2) Seq(base, (id + 1000000L, hashes(id, nc, 3)))
      else Seq(base)
    }
    val brute = (for {
      (a, ha) <- all; (b, hb) <- all if a < b
      d = ha.zip(hb).map { case (x, y) =>
        java.lang.Long.bitCount(x ^ y) }.sum if d <= 3
    } yield (a, b, d.toLong)).sorted
    assert(pairs.sorted === brute,
      "video blocked candidate join diverged from brute all-pairs")
  }

  test("q_audio_dedup: hamming-0 set IS the planted half-gain twin set; block join is lossless vs brute") {
    import spark.implicits._
    val pairs = graft.SparkEntry.queries("q_audio_dedup")(spark, sf0001)
      .as[(Long, Long, Long)].collect().toSeq
    graft.ops.SideCache.releaseAll()
    val audio = graft.tables.Tables.documents(spark, sf0001)
      .filter(col("doc_id") % 3 === 1).select("doc_id", "n_chars")
      .as[(Long, Long)].collect().toSeq
    val planted = audio.filter(_._1 % 30 == 1)
    assert(planted.nonEmpty)
    // the hamming-0 set is EXACTLY the twin set (the fingerprint is
    // non-degenerate on this cohort — the natural sampleAt sawtooth
    // would have collided 10k of 17k pairs here)
    val zero = pairs.filter(_._3 == 0L).map(p => (p._1, p._2)).toSet
    assert(zero === planted.map(p => (p._1, p._1 + 1000000L)).toSet,
      "hamming-0 pairs must be exactly the planted twins")
    // losslessness: brute all-pairs over the same hashes finds
    // nothing the blocked candidate join missed
    val hashes = audio.flatMap { case (id, nc) =>
      val n = Multimodal.nSamples(nc)
      val base = (id, Multimodal.audioBandHash(id,
        Multimodal.encodeBandWav(id, n, 0)))
      if (id % 30 == 1)
        Seq(base, (id + 1000000L, Multimodal.audioBandHash(id + 1000000L,
          Multimodal.encodeBandWav(id, n, 1))))
      else Seq(base)
    }
    val brute = (for {
      (a, ha) <- hashes; (b, hb) <- hashes if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (a, b, d.toLong)).sorted
    assert(pairs.sorted === brute,
      "blocked candidate join diverged from brute all-pairs")
    // kernel-level gain invariance on real decoded payloads: ANY
    // power-of-two gain drop hashes identically; unrelated clips far
    val (someId, nc) = audio.head
    val n = Multimodal.nSamples(nc)
    val full = Multimodal.audioBandHash(someId,
      Multimodal.encodeBandWav(someId, n, 0))
    for (shift <- 1 to 3)
      assert(full === Multimodal.audioBandHash(someId,
        Multimodal.encodeBandWav(someId, n, shift)),
        s"band hash not invariant under gain >> $shift")
    val (otherId, nc2) = audio.find(_._1 != someId).get
    val h2a = Multimodal.audioBandHash(otherId,
      Multimodal.encodeBandWav(otherId, Multimodal.nSamples(nc2), 0))
    assert(java.lang.Long.bitCount(full ^ h2a) > 3,
      "unrelated clips should not collide at the dedup threshold")
  }
}
