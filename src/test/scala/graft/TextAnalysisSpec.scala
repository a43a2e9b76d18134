package graft

import org.apache.spark.sql.functions._
import graft.ops.TextAnalysis

/** Text-analysis operators (SURVEY D4) on real-language samples. */
class TextAnalysisSpec extends SparkSpec {

  test("langId tags real-language samples") {
    import spark.implicits._
    val samples = Seq(
      ("en", "the cat sat on the mat and it is a good day for all of us"),
      ("es", "el perro corre en la casa y los gatos de la ciudad"),
      ("de", "der hund ist ein gutes tier und die katze ist nicht da"),
      ("fr", "le chien est dans la maison et les chats sont une merveille"),
      ("und", "zzz qqq www rrr")).toDF("expected", "text")
    val got = samples
      .select(col("expected"), TextAnalysis.langId(col("text")).as("got"))
      .collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1),
      s"expected ${r.getString(0)} got ${r.getString(1)}"))
  }

  test("langIdNgram tags real-language samples from trigram evidence") {
    import spark.implicits._
    val samples = Seq(
      ("en", "the quick brown fox jumped over the lazy sleeping dog"),
      ("es", "la historia de los pueblos que hablaban la lengua"),
      ("de", "der hund und die katze spielen schnell im garten"),
      ("fr", "les enfants que nous avons vus dans le parc"),
      ("und", "zzz qqq www"),
      ("und", "ab"),
      ("und", "")).toDF("expected", "text")
    val got = samples
      .select(col("expected"), TextAnalysis.langIdNgram(col("text")).as("got"))
      .collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1),
      s"expected ${r.getString(0)} got ${r.getString(1)}"))
  }

  test("qualityScore is bounded and monotone in stopword density") {
    import spark.implicits._
    val df = Seq(
      "the of and to in is a that it for the of and to in", // stopword-rich
      "qqq www eee rrr ttt yyy uuu iii ooo ppp",            // stopword-free
      "").toDF("text")
    val scores = df.select(TextAnalysis.qualityScore(col("text")).as("q"))
      .collect().map(_.getDouble(0)).toSeq
    assert(scores.forall(s => s >= 0.0 && s <= 1.0))
    assert(scores(0) > scores(1))
  }

  test("fingerprint normalizes whitespace and case") {
    import spark.implicits._
    val fps = Seq("Hello  World", "hello world", "HELLO WORLD ")
      .toDF("text").select(TextAnalysis.fingerprint(col("text")).as("f"))
      .collect().map(_.getString(0)).toSeq
    assert(fps.distinct.length == 1)
  }

  test("redactPii scrubs emails, phones, and long digit runs") {
    import spark.implicits._
    val got = Seq(
      "mail me at jane.doe+spam@sub.example.co.uk today",
      "call +1 (555) 010-9988 now",
      "account 123456789 is fine but 123 stays",
      "no pii here at all").toDF("text")
      .select(TextAnalysis.redactPii(col("text")).as("r"))
      .collect().map(_.getString(0)).toSeq
    assert(got(0) == "mail me at [EMAIL] today")
    assert(got(1) == "call [PHONE] now")
    assert(got(2) == "account [NUMBER] is fine but 123 stays")
    assert(got(3) == "no pii here at all")
  }

  test("removeBoilerplate drops frequent lines, keeps order, keeps empty docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "unique one\nFOOTER\nmore text"),
      (2L, "FOOTER\nother content"),
      (3L, "FOOTER")).toDF("doc_id", "text")
    val got = TextAnalysis.removeBoilerplate(docs, "doc_id", "text", 0.5)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq(
      (1L, "unique one\nmore text"),
      (2L, "other content"),
      (3L, "")))
  }

  test("simhash64 expression: identical texts agree, edits stay close") {
    import spark.implicits._
    import graft.functions.GraftFunctions.simhash64
    val base = "spark structured streaming processes micro batches of data"
    val df = Seq(base, base, base + " quickly", "completely different words here now")
      .toDF("t").select(simhash64(col("t"), lit(2)).as("h"))
    val hs = df.collect().map(_.getLong(0)).toSeq
    assert(hs(0) == hs(1))
    assert(java.lang.Long.bitCount(hs(0) ^ hs(2)) <= 16)
    assert(java.lang.Long.bitCount(hs(0) ^ hs(3)) > 16)
  }

  test("unigramLogProb matches an in-memory reference model (D4k)") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the cat sat"),
      (2L, "the cat ran"),
      (3L, "xylophone"))
    // reference: counts over all 7 tokens
    val toks = corpus.flatMap(_._2.split(" "))
    val cnt = toks.groupBy(identity).view.mapValues(_.size.toDouble).toMap
    val tot = toks.size.toDouble
    def lp(text: String): Double = {
      val ws = text.split(" ")
      val m = ws.map(w => math.log(cnt(w) / tot)).sum / ws.length
      BigDecimal(m).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val out = TextAnalysis.unigramLogProb(
        corpus.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    corpus.foreach { case (id, text) =>
      assert(math.abs(out(id) - lp(text)) < 1e-6, s"doc $id")
    }
    // the common-word doc scores higher than the hapax doc
    assert(out(1L) > out(3L))
  }

  test("bigramBackoffLogProb: all three tiers fire; <2-token docs " +
      "score NULL but stay in the result (D4m)") {
    import spark.implicits._
    // model "a b a c": unigrams a:2 b:1 c:1 (N=4); bigrams ab:1 ba:1 ac:1
    val model = Seq((0L, "a b a c")).toDF("doc_id", "text")
    val score = Seq(
      (1L, "a b"),   // bigram hit:       ln(1/2)
      (2L, "b c"),   // backoff, c seen:  ln(0.4 * 1 / 4)
      (3L, "x y"),   // unseen-word floor: ln(0.4 / 4)
      (4L, "solo"),  // one token -> NULL
      (5L, "")       // blank -> NULL
    ).toDF("doc_id", "text")
    val got = TextAnalysis
      .bigramBackoffLogProb(score, model, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(got(1L) == Some(r6(math.log(1.0 / 2))))
    assert(got(2L) == Some(r6(math.log(0.4 * 1 / 4.0))))
    assert(got(3L) == Some(r6(math.log(0.4 / 4.0))))
    assert(got(4L).isEmpty && got(5L).isEmpty)
    assert(got.size == 5, "the op must be total over the scored set")
  }

  test("oovRate: membership against the induced top-V vocabulary") {
    import spark.implicits._
    // counts: the×5, cat×3, sat×2, mat×1, rug×1 → top-3 vocab is
    // (the, cat, sat); mat/rug are OOV
    val docs = Seq(
      (1L, "the cat sat"),            // 0/3 OOV
      (2L, "the cat sat the mat"),    // 1/5
      (3L, "the cat THE rug")         // 1/4 (case-folds into vocab)
    ).toDF("doc_id", "text")
    val got = graft.ops.TextAnalysis.oovRate(docs, "doc_id", "text", 3)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got == Seq((1L, 3L, 0L, 0.0), (2L, 5L, 1L, 0.2),
      (3L, 4L, 1L, 0.25)))
  }

  test("canonicalizeUrl: rule-by-rule edge cases") {
    import spark.implicits._
    val cases = Seq(
      // fragment, default port, www, utm, trailing slash all strip
      ("HTTPS://WWW.Example.COM:443/A/b/?utm_source=x&id=7#f",
       "https://example.com/A/b?id=7"),
      // non-default port survives; path case preserved
      ("http://Example.com:8080/Path/", "http://example.com:8080/Path"),
      // https :80 is NOT a default port — kept
      ("https://example.com:80/x", "https://example.com:80/x"),
      // non-utm params keep their original order
      ("http://a.com/p?b=2&utm_medium=m&a=1", "http://a.com/p?b=2&a=1"),
      // all params tracking → no '?' at all
      ("http://a.com/p?utm_a=1&utm_b=2", "http://a.com/p"),
      // bare host, root slash strips to the host
      ("http://www.a.com/", "http://a.com"),
      // www only strips as a leading label
      ("http://wwwx.a.com/q", "http://wwwx.a.com/q"))
    val got = cases.map(_._1).toDF("u")
      .select(graft.ops.TextAnalysis.canonicalizeUrl(col("u")))
      .collect().map(_.getString(0)).toSeq
    assert(got == cases.map(_._2))
  }
}
