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

  test("frameSignatureGroups: identical payloads group, distinct don't") {
    import spark.implicits._
    import graft.multimodal.{MediaMeta, MediaRow}
    val meta = MediaMeta("stub", 0, 1)
    val rows = Seq(
      MediaRow(1L, "video", "the same payload bytes".getBytes("UTF-8"), meta),
      MediaRow(2L, "video", "the same payload bytes".getBytes("UTF-8"), meta),
      MediaRow(3L, "video", "a different payload!!!".getBytes("UTF-8"), meta),
      MediaRow(4L, "video", "the same payload bytes".getBytes("UTF-8"), meta)
    ).toDS()
    val g = Media.frameSignatureGroups(rows, StubMediaDecoder(8), nFrames = 4)
      .orderBy("media_id")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getBoolean(2), r.getLong(3)))
    assert(g.toSeq == Seq(
      (1L, 1L, false, 3L), (2L, 1L, true, 3L),
      (3L, 3L, false, 1L), (4L, 1L, true, 3L)))
    // same frames ⇒ same group even if the UNCOVERED tail differs:
    // 23 bytes → 4 frames of 5 bytes (20 covered), tail 3 bytes free
    val tail = Seq(
      MediaRow(10L, "video", "aaaaabbbbbcccccdddddXYZ".getBytes("UTF-8"), meta),
      MediaRow(11L, "video", "aaaaabbbbbcccccdddddPQR".getBytes("UTF-8"), meta)
    ).toDS()
    val t = Media.frameSignatureGroups(tail, StubMediaDecoder(8), nFrames = 4)
    assert(t.filter(col("root") === 10L).count() == 2)
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
