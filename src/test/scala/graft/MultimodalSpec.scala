package graft

import org.apache.spark.sql.functions._
import graft.multimodal.{Media, StubMediaDecoder}

/** Multimodal plumbing (SURVEY D5): decode, feature-extract, resize,
  * frame-sample over binary payload columns.
  */
class MultimodalSpec extends SparkSpec {

  private lazy val media =
    Media.mediaFromDocuments(Tables(spark, sf(), "documents").limit(30))

  test("feature extraction: fixed dim, content-sensitive, deterministic") {
    val dec = StubMediaDecoder(8)
    val f1 = Media.extractFeatures(media, dec).cache()
    assert(f1.count() == 30)
    assert(f1.filter(size(col("features")) =!= 8).count() == 0)
    val f2 = Media.extractFeatures(media, dec)
    assert(f1.toDF().exceptAll(f2.toDF()).count() == 0)
    // different content → different features (at least mostly)
    assert(f1.select(col("features").cast("string")).distinct().count() > 25)
    f1.unpersist()
  }

  test("frame sampling: ordinal frames, content partition, empty edge") {
    val dec = StubMediaDecoder(8)
    val frames = Media.sampleFrames(media, dec, nFrames = 4).cache()
    // each doc ≥ 48 chars → always 4 frames
    assert(frames.groupBy("media_id").count()
      .filter(col("count") =!= 4).count() == 0)
    frames.toDF().groupBy("media_id")
      .agg(sort_array(collect_list(col("frame_index"))).as("idx"))
      .collect().foreach(r =>
        assert(r.getSeq[Int](1) == Seq(0, 1, 2, 3)))
    assert(dec.frameSample("video", Array.empty[Byte], 4) == Nil)
    frames.unpersist()
  }

  test("resize: fixed output dimension, index-preserving endpoints") {
    val dec = StubMediaDecoder(8)
    val f = Array(1f, 2f, 3f, 4f)
    assert(dec.resize(f, 8).length == 8)
    assert(dec.resize(f, 2).toSeq == Seq(1f, 3f))
    assert(dec.resize(f, 8).head == 1f)
    assert(dec.resize(Array.empty[Float], 4).toSeq == Seq(0f, 0f, 0f, 0f))
  }
}
