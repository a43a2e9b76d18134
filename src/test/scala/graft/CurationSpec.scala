package graft

import org.apache.spark.sql.functions._

import graft.ops.Curation

/** Curation pipeline semantics: drop-reason precedence, total
  * annotation, and curate == keep-filter.
  */
class CurationSpec extends SparkSpec {

  private val goodText =
    "the cat and the dog that is in the house of it for the " * 4

  test("drop reasons follow the fixed precedence; annotation is total") {
    import spark.implicits._
    val docs = Seq(
      (1L, goodText),                       // kept
      (2L, "zz"),                           // quality (too short)
      (3L, "el que los del se las y en la casa que los del se " * 8), // lang
      (4L, goodText),                       // duplicate of 1 (higher id)
      (5L, "x y " * 60)                     // quality beats lang (order)
    ).toDF("doc_id", "text")
    val ann = Curation.annotate(docs, "doc_id", "text",
        Curation.Config(minQuality = 0.3, lang = "en", sampleFraction = 1.0))
      .select("doc_id", "drop_reason")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(ann(1L) == "")
    assert(ann(2L) == "quality")
    assert(ann(3L) == "lang")
    assert(ann(4L) == "duplicate")
    assert(ann(5L) == "quality") // precedence: quality checked before lang
    assert(ann.size == 5)       // total: every row annotated
  }

  test("blocked sources drop first, ahead of every content reason (P7)") {
    import spark.implicits._
    val docs = Seq(
      (1L, goodText, "good-src"),   // kept
      (2L, "zz", "bad-src"),        // blocked wins over quality
      (3L, goodText, "bad-src"),    // blocked (would otherwise keep)
      (4L, "zz", "good-src")        // quality
    ).toDF("doc_id", "text", "source")
    val ann = Curation.annotate(docs, "doc_id", "text",
        Curation.Config(minQuality = 0.3, lang = "en", sampleFraction = 1.0),
        srcCol = Some("source"),
        blockedSources = Some(Seq("bad-src").toDF("s")))
      .select("doc_id", "drop_reason")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(ann(1L) == "")
    assert(ann(2L) == "blocked")
    assert(ann(3L) == "blocked")
    assert(ann(4L) == "quality")
    // the two P7 parameters must arrive together
    intercept[IllegalArgumentException] {
      Curation.annotate(docs, "doc_id", "text",
        srcCol = Some("source"), blockedSources = None)
    }
  }

  test("annotateNearDups flags non-root cluster members with their root (P4)") {
    import spark.implicits._
    val a = "the quick brown fox jumps over the lazy dog again and again ok"
    val docs = Seq(
      (1L, a),                    // cluster root
      (5L, a + " tail edit"),     // near-dup of 1
      (9L, a + " other tail"),    // near-dup of 1 (chains via shingles)
      (3L, "completely different words about ships and harbors at dawn"))
      .toDF("doc_id", "text")
    val ann = graft.ops.Curation
      .annotateNearDups(docs, "doc_id", "text", jaccardThreshold = 0.5)
      .select("doc_id", "is_near_duplicate", "near_dup_root")
      .collect()
      .map(r => (r.getLong(0), (r.getBoolean(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))).toMap
    assert(ann(1L) == (false, -1L)) // root: not flagged
    assert(ann(5L) == (true, 1L))
    assert(ann(9L) == (true, 1L))
    assert(ann(3L) == (false, -1L)) // unique doc untouched
  }

  test("blocklist composes as 'contaminated' after duplicate, before " +
      "sample (P5)") {
    import spark.implicits._
    val docs = Seq(
      (1L, goodText),               // blocklisted original → contaminated
      (2L, goodText),               // exact copy → duplicate wins the order
      (3L, goodText + "fresh ending never seen in any eval set at all " * 3),
      (4L, "for the good of it that is the one and the best we have " * 4))
      .toDF("doc_id", "text")
    val bl = Seq((99L, goodText)).toDF("doc_id", "text")
    val ann = Curation.annotate(docs, "doc_id", "text",
        Curation.Config(minQuality = 0.3, lang = "en"),
        blocklist = Some(bl))
      .select("doc_id", "drop_reason", "is_contaminated")
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getBoolean(2))))
      .toMap
    assert(ann(1L) == (("contaminated", true)))
    assert(ann(2L) == (("duplicate", true)))    // contaminated too, but dup first
    assert(ann(3L)._2, "8-gram overlap with the eval text must flag doc 3")
    assert(ann(4L)._1 == "" && !ann(4L)._2)
    // without a blocklist the column exists and is all-false (P3 shape)
    val plain = Curation.annotate(docs, "doc_id", "text")
      .select("is_contaminated").collect().map(_.getBoolean(0))
    assert(plain.forall(!_))
  }

  test("curate keeps exactly the keep rows and drops audit columns") {
    import spark.implicits._
    val docs = Seq((1L, goodText), (2L, goodText), (3L, "zz"))
      .toDF("doc_id", "text")
    val kept = Curation.curate(docs, "doc_id", "text",
      Curation.Config(minQuality = 0.3, lang = "en"))
    assert(kept.columns.toSeq == Seq("doc_id", "text"))
    assert(kept.select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("snapshotDiff classifies added/removed/changed/unchanged") {
    import spark.implicits._
    val v1 = Seq((1L, "same"), (2L, "old"), (3L, "gone"))
      .toDF("doc_id", "text")
    val v2 = Seq((1L, "same"), (2L, "new"), (4L, "fresh"))
      .toDF("doc_id", "text")
    val got = Curation.snapshotDiff(v1, v2, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
  }

  test("exportShards packs exactly the curated keepers within budget") {
    import spark.implicits._
    val docs = Tables(spark, sf(), "documents")
      .select(col("doc_id"), col("text"))
    val cfg = Curation.Config(minQuality = 0.3, lang = "en",
      sampleFraction = 0.5)
    val packed = Curation.exportShards(docs, "doc_id", "text", cfg,
      budget = 1500L, numGroups = 8).cache()

    // membership == curate's keepers, exactly
    val keepers = Curation.curate(docs, "doc_id", "text", cfg)
      .select("doc_id")
    assert(packed.select("doc_id").exceptAll(keepers).count() == 0)
    assert(keepers.exceptAll(packed.select("doc_id")).count() == 0)

    // greedy-fill contract: every shard's token sum < budget + max tc
    val maxTc = packed.agg(max("tc")).head().getLong(0)
    val over = packed.groupBy("grp", "shard")
      .agg(sum("tc").as("ts"))
      .filter(col("ts") >= lit(1500L) + maxTc)
    assert(over.count() == 0)
    packed.unpersist()
  }
}
