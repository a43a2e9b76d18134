package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.ops.{Dedup, Similarity, TextAnalysis}

/** Dev probe: measures the deterministic values behind the candidate
  * oracle gates for the rows-only queries (recall floors, planted-pair
  * recovery counts, chunk invariants) so the gate constants are chosen
  * from data, not hope. Not part of the conformance surface.
  */
object GateProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.getOrCreate("local[16]")
    import spark.implicits._

    val docs = Tables(spark, dir, "documents")
    val e = Tables(spark, dir, "embeddings")
    val nDocs = docs.count()
    println(s"== nDocs=$nDocs  nEmb=${e.count()} ==")

    // d2: planted tail-edit pairs recovered by MinHash LSH
    val edited = docs.select((col("doc_id") + 1000000L).as("doc_id"),
      concat(col("text"), lit(" tail edit")).as("text"))
    val d2pairs = Dedup.minhashLshPairs(
      docs.select(col("doc_id"), col("text")).unionAll(edited),
      "doc_id", "text", threshold = 0.5)
    val d2planted = d2pairs.filter(col("id2") === col("id1") + 1000000L).count()
    println(s"d2: total=${d2pairs.count()} planted=$d2planted / $nDocs")

    // d2b: simhash — planted " x" edits and exact copies (disjoint
    // offsets so pair-class filters can't double-count)
    val editedX = docs.select((col("doc_id") + 1000000L).as("doc_id"),
      concat(col("text"), lit(" x")).as("text"))
    val exactCopy = docs.select((col("doc_id") + 3000000L).as("doc_id"),
      col("text"))
    val d2b = Dedup.simhashPairs(
      docs.select(col("doc_id"), col("text"))
        .unionAll(editedX).unionAll(exactCopy),
      "doc_id", "text", maxHamming = 3)
    val d2bEdit = d2b.filter(col("id1") < 1000000L &&
      col("id2") === col("id1") + 1000000L).count()
    val d2bExact = d2b.filter(col("id1") < 1000000L &&
      col("id2") === col("id1") + 3000000L).count()
    println(s"d2b: total=${d2b.count()} editRecall=$d2bEdit/$nDocs " +
      s"exactRecall=$d2bExact/$nDocs")

    // d3b/d3c: recall@5 vs brute force for probes vec_id < 10
    val probes = e.filter(col("vec_id") < 10)
    val brute = Similarity.knnJoinBrute(e, probes, "vec_id", "embedding", 5)
      .select("probe_id", "nn_id")
    def recall(approx: org.apache.spark.sql.DataFrame, tag: String): Unit = {
      val hits = brute.join(approx.select("probe_id", "nn_id"),
        Seq("probe_id", "nn_id"), "left_semi").count()
      println(s"$tag: recall=$hits/${brute.count()}")
    }
    recall(Similarity.lshAnnJoin(e, probes, "vec_id", "embedding", 5, 64), "d3b")
    recall(Similarity.ivfAnnJoin(e, probes, "vec_id", "embedding", 5, 16, 4), "d3c")

    // d3b/d3c near-dup contract: perturbed copies must retrieve their
    // source as top-1
    val perturbed = e.filter(col("vec_id") < 50).select(
      (col("vec_id") + 1000000L).as("vec_id"),
      transform(col("embedding"),
        (x, i) => x + (i % 7 - lit(3)) * lit(0.002)).cast("array<float>")
        .as("embedding"))
    def srcTop1(approx: org.apache.spark.sql.DataFrame, tag: String): Unit = {
      import org.apache.spark.sql.expressions.Window
      val top1 = approx
        .withColumn("rn", row_number().over(
          Window.partitionBy("probe_id").orderBy(col("dist"), col("nn_id"))))
        .filter(col("rn") === 1)
      val ok = top1.filter(col("nn_id") === col("probe_id") - 1000000L).count()
      println(s"$tag perturbed-top1: $ok/50")
    }
    srcTop1(Similarity.lshAnnJoin(e, perturbed, "vec_id", "embedding", 5, 64),
      "d3b")
    srcTop1(Similarity.ivfAnnJoin(e, perturbed, "vec_id", "embedding", 5, 16, 4),
      "d3c")

    // d4c: planted-language sentences through both classifiers
    val planted = Seq(
      ("en", "the cat and the dog that is in the house of it for the win"),
      ("es", "el que los del se las y en la casa que los del se"),
      ("de", "der die und das ist ein zu den mit nicht der die und das"),
      ("fr", "les parents paient lentement leurs paiements pendant que les chanteurs parlent aux fleurs"),
      ("und", "zxq vbn plk mnb qwe rty")).toDF("expected", "t")
    planted.select(col("expected"),
      TextAnalysis.langId(col("t")).as("stopword"),
      TextAnalysis.langIdNgram(col("t")).as("trigram")).show(false)

    // d4g: composite docs pairing with both parents — parents filtered
    // to length >= 200 so both shared halves exceed the winnowing
    // guarantee threshold (k + w - 1 = 23 chars) with margin
    val d = docs.filter(col("doc_id") < 50 && length(col("text")) >= 200)
      .select("doc_id", "text")
    val halves = d.select(col("doc_id"),
      substring(col("text"), 1, 120).as("front"),
      substring(col("text"), 121, 100000).as("back"))
    val composites = halves.as("x")
      .join(halves.as("y"), col("x.doc_id") + 1 === col("y.doc_id"))
      .select((col("x.doc_id") + 1000000L).as("doc_id"),
        concat(col("x.front"), lit(" "), col("y.back")).as("text"))
    val d4g = Dedup.winnowOverlapPairs(d.unionByName(composites),
      "doc_id", "text", k = 16, w = 8, minShared = 3)
    val links = d4g.filter(col("id2") >= 1000000L &&
      (col("id1") === col("id2") - 1000000L ||
        col("id1") === col("id2") - 1000000L + 1L)).count()
    println(s"d4g(len>=200): total=${d4g.count()} parentLinks=$links / ${2 * composites.count()} nParents=${d.count()}")

    // d4c corpus sweep: do both classifiers call the synthetic corpus
    // English uniformly (candidate per-doc 'en' gate)?
    docs.select(TextAnalysis.langId(col("text")).as("stopword"),
        TextAnalysis.langIdNgram(col("text")).as("trigram"))
      .groupBy("stopword", "trigram").count().show(false)

    // doc text whitespace: is text already single-space-normalized
    // (oracle `text AS re` without normalization)?
    docs.agg(
      sum(when(col("text") ===
        regexp_replace(col("text"), "\\s+", " "), 0).otherwise(1))
        .as("nonNormalized"),
      sum(when(col("text") === trim(col("text")), 0).otherwise(1))
        .as("untrimmed")).show()

    // a8 fixed (markdown) invariants
    import graft.functions.GraftFunctions.{chunk_text, token_count}
    val a8 = docs.select(col("doc_id"),
      posexplode(chunk_text(col("text"), lit(60), lit(0), lit("markdown")))
        .as(Seq("chunk_id", "chunk")))
    a8.agg(max(token_count(col("chunk"))).as("maxTok"),
      max(length(col("chunk"))).as("maxLen"),
      min(length(col("chunk"))).as("minLen")).show()

    // a11 char-chunk invariants
    val files = docs
      .select(concat(lit("doc://"), col("doc_id"), lit(".pdf")).as("path"),
        encode(col("text"), "UTF-8").as("content"))
      .as[(String, Array[Byte])]
    val a11 = graft.pipeline.IngestPipeline.routeAndChunkChars(
      files, graft.extract.StubAnalyzeExtractor(linesPerPage = 1),
      chunkSize = 256).toDF()
    val perDoc = a11.groupBy("document_url")
      .agg(count(lit(1)).as("n"), max(col("chunk_id")).as("maxId"),
        min(col("chunk_id")).as("minId"))
    perDoc.agg(max(col("n")).as("maxChunks"),
      sum(when(col("maxId") === col("n") - 1 && col("minId") === 0, 0)
        .otherwise(1)).as("nonContig")).show()
    a11.select(max(length(col("chunk_text"))).as("maxLen"),
      min(length(col("chunk_text"))).as("minLen"),
      max(col("page_number")).as("maxPage"),
      sum(when(length(col("chunk_text")) -
        length(substring_index(col("chunk_text"), " ", -1)) <= lit(256), 0)
        .otherwise(1)).as("overruns")).show()

    // rejoin-equality: does space-joined chunk concat reproduce the
    // original text exactly (candidate `text AS re` oracle)?
    val a8re = a8.groupBy("doc_id")
      .agg(regexp_replace(array_join(
        transform(array_sort(collect_list(struct(col("chunk_id"), col("chunk")))),
          c => c.getField("chunk")), " "), "\\s+", " ").as("re"))
      .join(docs.select(col("doc_id"), col("text")), "doc_id")
    a8re.agg(sum(when(col("re") === col("text"), 0).otherwise(1))
      .as("a8_rejoin_mismatch")).show()
    val a11re = a11.groupBy("document_url")
      .agg(regexp_replace(array_join(
        transform(array_sort(collect_list(struct(col("chunk_id"), col("chunk_text")))),
          c => c.getField("chunk_text")), " "), "\\s+", " ").as("re"))
      .join(docs.select(concat(lit("doc://"), col("doc_id"), lit(".pdf"))
        .as("document_url"), col("text")), "document_url")
    a11re.agg(sum(when(col("re") === col("text"), 0).otherwise(1))
      .as("a11_rejoin_mismatch")).show()

    spark.stop()
  }
}
