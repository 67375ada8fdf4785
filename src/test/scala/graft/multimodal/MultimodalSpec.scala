package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private def media = Multimodal.mediaFromDocuments(
    spark.read.parquet(s"$sf0001/documents.parquet"))

  test("media table has the contract schema; image/audio payloads are real PNGs/WAVs") {
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
        case _ => assert(payload.length == 96)
      }
    }
    assert(rows.exists(_.getString(0) == "image"))
    assert(rows.exists(_.getString(0) == "audio"))
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

  test("extractFeatures: real decode for images and audio, stub for video") {
    val n = media.count()
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
        case _ => assert(f.n_units == 96L)
      }
    }
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
  }
}
