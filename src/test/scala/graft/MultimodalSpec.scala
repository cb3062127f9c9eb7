package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.sources.Catalog

/** The multimodal path: binary payload plumbing is real (schema,
  * partition-level batch iteration, fixed-shape float output); only the
  * codec itself is a deterministic stub.
  */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("media table has the declared schema shape") {
    val media = Multimodal.mediaFromDocuments(Catalog.documents(spark, SparkTestSession.sfDir))
    assert(media.schema.fieldNames.toSeq == Seq("media_id", "kind", "bytes", "width", "height"))
    assert(media.schema("bytes").dataType.typeName == "binary")
    val kinds = media.select("kind").distinct().collect().map(_.getString(0)).toSet
    assert(kinds == Set("image", "audio", "video"))
  }

  test("decodeStub: fixed 16-dim shape, normalized, deterministic") {
    val b = "some fake media payload".getBytes("UTF-8")
    val f1 = Multimodal.decodeStub(b)
    val f2 = Multimodal.decodeStub(b)
    assert(f1.length == 16)
    assert(f1.toSeq == f2.toSeq)
    assert(math.abs(f1.sum - 1.0f) < 1e-5) // histogram normalized by length
    assert(Multimodal.decodeStub(Array.empty[Byte]).toSeq == Seq.fill(16)(0f))
  }

  test("extractFeatures preserves rows, drops bytes, emits array<float>[16]") {
    val media = Multimodal.mediaFromDocuments(Catalog.documents(spark, SparkTestSession.sfDir))
    val feats = Multimodal.extractFeatures(media)
    assert(feats.count() == media.count())
    assert(!feats.schema.fieldNames.contains("bytes"))
    val row = feats.select(size(col("features"))).head()
    assert(row.getInt(0) == 16)
    // deterministic across runs (stub codec → same features)
    val a = feats.select("media_id", "features").orderBy("media_id").collect()
    val b = Multimodal.extractFeatures(media).select("media_id", "features").orderBy("media_id").collect()
    assert(a.sameElements(b))
  }

  test("sampleFrames: every step-th index, count matches the frame formula") {
    val media = Multimodal.mediaFromDocuments(Catalog.documents(spark, SparkTestSession.sfDir))
    val frames = Multimodal.sampleFrames(media, frameBytes = 100, step = 2)
    val perDoc = frames.groupBy("media_id", "n_frames").agg(count(lit(1)).as("n")).collect()
    assert(perDoc.nonEmpty)
    perDoc.foreach { r =>
      val expected = (r.getLong(1) + 1) / 2 // ceil(n_frames/2) sampled at step 2
      assert(r.getLong(2) == expected, s"media ${r.getLong(0)}")
    }
    val idx = frames.filter(col("media_id") === perDoc.head.getLong(0))
      .select("frame_idx").collect().map(_.getLong(0)).sorted
    assert(idx.zipWithIndex.forall { case (v, i) => v == 2L * i })
  }
}
