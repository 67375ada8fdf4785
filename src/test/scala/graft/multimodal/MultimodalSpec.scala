package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private def media = Multimodal.mediaFromDocuments(
    spark.read.parquet(s"$sf0001/documents.parquet"))

  test("media table has the contract schema and 96-byte payloads") {
    // catalogString ignores nullability, which column expressions
    // legitimately widen relative to the declared contract
    assert(media.schema.catalogString == Multimodal.mediaSchema.catalogString)
    val lens = media.select(length(col("payload"))).distinct().collect()
    assert(lens.map(_.getInt(0)).toSeq == Seq(96))
  }

  test("decodeStub is a deterministic L1-normalized histogram") {
    val bytes = Array.tabulate(96)(i => (i * 7).toByte)
    val f1 = Multimodal.decodeStub(bytes)
    val f2 = Multimodal.decodeStub(bytes)
    assert(f1.toSeq == f2.toSeq)
    assert(math.abs(f1.sum - 1f) < 1e-5)
    assert(f1.length == Multimodal.FeatureDim)
  }

  test("extractFeatures emits one feature row per media row") {
    val n = media.count()
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length == n)
    assert(feats.forall(f => f.features.length == Multimodal.FeatureDim
      && math.abs(f.features.sum - 1f) < 1e-4 && f.n_bytes == 96))
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

  test("resize clamps the longer edge to maxDim and keeps aspect ratio") {
    val r = Multimodal.resize(media, 64)
      .select(col("meta.width"), col("meta.height")).collect()
    assert(r.forall(x => x.getInt(0) <= 64 && x.getInt(1) <= 64))
    assert(r.forall(x => x.getInt(0) > 0 && x.getInt(1) > 0))
  }
}
