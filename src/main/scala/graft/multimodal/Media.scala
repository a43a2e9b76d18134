package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column support (SURVEY D5): media travels as opaque
  * BINARY content + typed metadata alongside text in one DataFrame;
  * decode / feature-extraction stages run per-partition behind a
  * pluggable trait (the same side-effecting-stage discipline as the
  * OCR and embedding boundaries, §2.5).
  *
  * The actual codecs (image/audio/video) are NOT present in this
  * container, so [[StubMediaDecoder]] is a clearly-marked
  * deterministic fake; the Spark-side plumbing — schema, batch shape,
  * partition-parallel decode — is real and tested.
  */
final case class MediaMeta(format: String, width: Int, height: Int)

final case class MediaRow(
    media_id: Long,
    kind: String,            // image | audio | video
    content: Array[Byte],
    meta: MediaMeta)

final case class MediaFeatures(
    media_id: Long,
    kind: String,
    n_bytes: Long,
    features: Array[Float])

trait MediaDecoder extends Serializable {
  def featureDim: Int
  /** Decode one media payload to a feature vector. Real
    * implementations call into a codec; must be total (never throw on
    * malformed bytes — return a zero vector).
    */
  def decode(kind: String, content: Array[Byte]): Array[Float]

  /** Sample up to `n` evenly-spaced frames from a (video/audio)
    * payload. The default slices the raw bytes — real codecs override
    * with keyframe extraction; the Spark-side shape (one row per
    * frame, ordinal-indexed) is what downstream operators rely on.
    */
  def frameSample(kind: String, content: Array[Byte], n: Int): Seq[Array[Byte]] = {
    if (content.isEmpty || n <= 0) Nil
    else {
      val frames = math.min(n, content.length)
      val size = math.max(1, content.length / frames)
      (0 until frames).map { i =>
        content.slice(i * size, math.min(content.length, (i + 1) * size))
      }
    }
  }

  /** Resize a feature vector to `dim` (interpolating repeat/fold) —
    * the plumbing analog of image resizing: downstream schemas demand
    * a fixed dimension regardless of source resolution.
    */
  def resize(features: Array[Float], dim: Int): Array[Float] = {
    val out = new Array[Float](math.max(1, dim))
    if (features.nonEmpty) {
      var i = 0
      while (i < out.length) {
        val src = i.toLong * features.length / out.length
        out(i) = features(src.toInt)
        i += 1
      }
    }
    out
  }
}

/** One sampled frame of a media payload. */
final case class FrameRow(
    media_id: Long,
    kind: String,
    frame_index: Int,
    frame: Array[Byte])

/** Deterministic stand-in for the codec stage: features are byte
  * histogram moments — stable, content-sensitive, codec-free.
  */
final case class StubMediaDecoder(featureDim: Int = 8) extends MediaDecoder {
  override def decode(kind: String, content: Array[Byte]): Array[Float] = {
    val f = new Array[Float](featureDim)
    if (content.nonEmpty) {
      var i = 0
      while (i < content.length) {
        f(i % featureDim) += (content(i) & 0xff) / 255.0f
        i += 1
      }
      val n = content.length.toFloat
      var j = 0
      while (j < featureDim) { f(j) = f(j) / n * featureDim; j += 1 }
    }
    f
  }
}

object Media {

  /** Partition-parallel decode/feature-extract stage (the Scala analog
    * of a mapInPandas batch UDF: one decoder instance per task,
    * batched row iteration, columnar-friendly output schema).
    */
  def extractFeatures(
      media: Dataset[MediaRow],
      decoder: MediaDecoder): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        MediaFeatures(m.media_id, m.kind, m.content.length.toLong,
          decoder.decode(m.kind, m.content))
      }
    }
  }

  /** Frame-sampling stage: explode each payload into up to `nFrames`
    * ordinal-indexed frame rows (partition-parallel; the per-frame
    * decode then proceeds like any other binary column).
    */
  def sampleFrames(
      media: Dataset[MediaRow],
      decoder: MediaDecoder,
      nFrames: Int): Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      decoder.frameSample(m.kind, m.content, nFrames).zipWithIndex.map {
        case (f, i) => FrameRow(m.media_id, m.kind, i, f)
      }
    }
  }

  /** D5c: media near-duplicate grouping by sampled-frame signature —
    * the video/audio analog of content-hash dedup: two payloads are
    * duplicates iff their sampled frames agree byte-for-byte (with a
    * real codec, keyframe sampling makes this invariant to container
    * metadata; with the stub it is exact byte dedup through the SAME
    * distributed plumbing). Output per media row:
    * `(media_id, root, is_dup, n_members)` with the min-id keeper
    * rule shared with the text dedup family (D1/D2e).
    *
    * Shape: one frame-sampling pass; each frame hashes to its MD5
    * per-row BEFORE the per-media aggregate, so the aggregation
    * buffer (and its exchange) carries (index, 32-char hash) pairs —
    * never the payload bytes; the ordinal-sorted frame hashes then
    * fold into one signature, and a window over `(media_id, sig)`
    * assigns groups at id+hash width.
    */
  def frameSignatureGroups(
      media: Dataset[MediaRow],
      decoder: MediaDecoder,
      nFrames: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sigs = sampleFrames(media, decoder, nFrames).toDF()
      .select(col("media_id"),
        struct(col("frame_index"), md5(hex(col("frame"))).as("fh")).as("ixh"))
      .groupBy("media_id")
      .agg(md5(concat_ws("",
        transform(array_sort(collect_list(col("ixh"))),
          f => f.getField("fh")))).as("sig"))
    val w = Window.partitionBy("sig")
    sigs.select(col("media_id"),
      min("media_id").over(w).as("root"),
      (col("media_id") =!= min("media_id").over(w)).as("is_dup"),
      count(lit(1)).over(w).as("n_members"))
  }

  /** Demo corpus: wrap the harness documents' text bytes as media
    * payloads (kind round-robins image/audio/video) — the plumbing
    * under test is schema + partitioning, not the codec.
    */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        element_at(typedlit(Seq("image", "audio", "video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        encode(col("text"), "UTF-8").as("content"),
        struct(lit("stub").as("format"),
          length(col("text")).as("width"),
          lit(1).as("height")).as("meta"))
      .as[MediaRow]
  }
}
