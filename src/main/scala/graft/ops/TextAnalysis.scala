package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text analysis for corpus curation (SURVEY D4): language
  * identification (stopword-profile heuristic), quality scoring,
  * fingerprinting. All built-in column expressions — codegen'd,
  * no UDFs, embarrassingly parallel per row.
  */
object TextAnalysis {

  /** Tiny per-language stopword profiles for the heuristic
    * language-ID. Deliberately small: the operator shape (profile
    * match + argmax) is the point; production swaps in full profiles
    * or character-n-gram models via the same API.
    */
  val stopwordProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "a", "that", "it", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "del", "se", "las"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein", "zu", "den", "mit", "nicht"),
    "fr" -> Seq("le", "la", "de", "et", "est", "un", "les", "des", "une", "dans"))

  private def words(text: Column): Column =
    split(lower(text), "\\s+")

  /** Single-evaluation let-binding (the round-1 langId re-split every
    * row ~20× without it) — shared via [[graft.functions.GraftFunctions.bound]].
    */
  private def bound(c: Column)(body: Column => Column): Column =
    graft.functions.GraftFunctions.bound(c)(body)

  /** Count of words from `profile` appearing in the text. */
  def profileHits(text: Column, profile: Seq[String]): Column =
    size(filter(words(text), w => w.isInCollection(profile)))

  /** Tiny per-language character-trigram profiles (with spaces as
    * word-boundary signal) — the richer model the same argmax serves;
    * production swaps in corpus-derived tables via the same API.
    */
  val trigramProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "ing", "and", "ion", "ent", "he ", " th", "ed ", "er ", " of"),
    "es" -> Seq("que", " de", "de ", "os ", "la ", " la", "ión", "ado", "con", " es"),
    "de" -> Seq("der", "ein", "ich", "sch", "die", "und", "en ", "er ", "ch ", " ge"),
    "fr" -> Seq("les", " le", "ent", "de ", " de", "que", "ais", "eur", "ion", " pa"))

  /** Shared argmax over a per-profile score array: `array_max` over
    * (score, -index, lang) structs — struct ordering gives highest
    * score, then earliest profile on ties, "und" when nothing matches.
    * The scores come from the one-pass `profile_scores` kernel: the
    * previous nested-HOF formulation (`transform` over the profile
    * table with a `filter` per profile) is interpreted, not codegen'd,
    * and cost ~10 ms/row on trigram arrays — the kernel is ~100×
    * cheaper and scans the text once instead of once per profile.
    */
  private def argmaxScores(scores: Column, langs: Seq[String]): Column =
    bound(scores) { sc =>
      bound(array_max(array(langs.indices.map(i =>
        struct(element_at(sc, i + 1).as("score"),
          lit(-i).as("negIdx"), lit(langs(i)).as("lang"))): _*))) { best =>
        when(best.getField("score") > 0, best.getField("lang"))
          .otherwise(lit("und"))
      }
    }

  private def spec(profiles: Seq[(String, Seq[String])]): String =
    profiles.map(_._2.mkString(",")).mkString("|")

  /** Heuristic language tag: argmax of stopword-profile hits, "und"
    * (undetermined) when nothing matches; ties break by profile order.
    */
  def langId(text: Column): Column =
    argmaxScores(
      graft.functions.GraftFunctions.profile_scores(text,
        lit(spec(stopwordProfiles)), lit(0)),
      stopwordProfiles.map(_._1))

  /** Character-trigram language tag — same argmax, sub-word evidence:
    * robust on text where whole stopwords are rare (short strings,
    * agglutinated words, OCR noise). Texts under 3 chars have no
    * trigram and fall through to "und".
    */
  def langIdNgram(text: Column): Column =
    argmaxScores(
      graft.functions.GraftFunctions.profile_scores(text,
        lit(spec(trigramProfiles)), lit(1)),
      trigramProfiles.map(_._1))

  def wordCount(text: Column): Column = size(split(text, " "))

  /** Mean word length, derived arithmetically from char/word counts
    * for single-spaced text.
    */
  def avgWordLen(text: Column): Column =
    (length(text) - wordCount(text) + lit(1)) * lit(1.0) / wordCount(text)

  def stopwordRatio(text: Column): Column =
    profileHits(text, stopwordProfiles.head._2) * lit(1.0) / wordCount(text)

  /** Composite quality score in [0,1]: length saturation + stopword
    * density + word-shape plausibility. The exact formula is engine
    * spec (deterministic, SQL-expressible — the conformance oracle
    * recomputes it in DuckDB). `length`, word count and profile hits
    * are each computed once per row via `bound`.
    */
  def qualityScore(text: Column): Column =
    bound(length(text)) { len =>
      bound(wordCount(text)) { wc =>
        bound(profileHits(text, stopwordProfiles.head._2)) { hits =>
          round(
            least(len, lit(500)) * lit(1.0) / 500 * 0.4 +
              hits * lit(1.0) / wc * 0.4 +
              when(((len - wc + lit(1)) * lit(1.0) / wc).between(3.0, 8.0),
                lit(0.2)).otherwise(lit(0.0)),
            6)
        }
      }
    }

  /** Content fingerprint for exact-dup detection across stores:
    * md5 of whitespace-normalized lowercase text.
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(trim(lower(text)), "\\s+", " "))

  /** Boilerplate-line removal (the line-level dedup of CCNet-style
    * curation pipelines): a line occurring in more than
    * `maxDocShare` of documents is template chrome (headers, footers,
    * cookie banners) and is dropped from every document.
    *
    * Scale shape: one aggregation over distinct (line, doc) pairs
    * computes line document-frequency — the same inherent corpus-wide
    * aggregate as TF-IDF's df. The frequent-line set itself is tiny
    * at any sane threshold (lines in >1% of a corpus are few), so it
    * re-joins as a broadcast filter on the lines, and documents
    * reassemble in original line order.
    */
  def removeBoilerplate(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      maxDocShare: Double = 0.5): org.apache.spark.sql.DataFrame = {
    val nDocs = df.count() // dimension-scale scalar, like TF-IDF's n
    val lines = df.select(col(idCol).as("id"),
      posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
    val frequent = lines.select(col("id"), col("line")).distinct()
      .groupBy("line").agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDocShare * nDocs)
      .select("line")
    val cleaned = lines
      .join(broadcast(frequent), Seq("line"), "left_anti")
      .groupBy("id")
      .agg(array_join(array_sort(collect_list(struct(col("pos"), col("line"))))
        .getField("line"), "\n").as("clean"))
    // documents whose every line was boilerplate survive as empty text
    df.select(col(idCol))
      .join(cleaned.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .select(col(idCol), coalesce(col("clean"), lit("")).as("clean"))
  }

  /** Corpus-model fluency score (D4k): mean unigram log-probability
    * per document under the corpus's own unigram distribution — the
    * cheap stand-in for the perplexity filters production pipelines
    * run with a real LM. Low scores mark gibberish / rare-token spam;
    * anomalously high scores mark degenerate repetition of frequent
    * words (combine with the D4i repetition signals).
    *
    * Two-pass shape, both scale-safe: (1) the unigram table is a
    * vocabulary-bounded aggregate (map-side combined — same contract
    * as D4f's line-frequency table and B4b's df table) broadcast back
    * into the token stream; (2) the per-doc mean aggregates narrow
    * (id, partial-sum) rows. No OOV smoothing is needed: the model is
    * built from the scored corpus itself, so every token has count
    * ≥ 1. For a 100 TB corpus whose vocabulary outgrows a broadcast
    * (rare with word tokens; plausible with noisy byte-level ones),
    * drop the hint and the token-vocab join degrades to a shuffle on
    * the term — the per-doc result shape is unchanged.
    */
  def unigramLogProb(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val tok = df.select(col(idCol),
      explode(split(col(textCol), " ")).as("__w"))
    val vocab = tok.groupBy("__w").agg(count(lit(1)).as("__cnt"))
    val tot = vocab.agg(sum("__cnt").as("__tot"))
    tok.join(broadcast(vocab), Seq("__w"))
      .crossJoin(broadcast(tot))
      .groupBy(col(idCol))
      .agg(round(avg(log(col("__cnt") * lit(1.0) / col("__tot"))), 6)
        .as("logprob"))
  }

  /** D4m: bigram STUPID-BACKOFF fluency — the CCNet/Gopher-style
    * perplexity filter one rung up from [[unigramLogProb]]: a bigram
    * LM trains on a REFERENCE corpus (`model`) and scores arbitrary
    * documents, so unseen bigrams are real and the backoff path
    * (Brants et al. 2007: score `α·c(w2)/N` when `c(w1,w2)=0`,
    * flooring unseen words at `α/N`) actually fires — the
    * quality-filter shape where a clean reference (e.g. wiki) scores
    * a noisy crawl.
    *
    * Per-doc mean log-prob over the document's bigrams; documents
    * with fewer than two tokens score NULL (kept — the op is total
    * over the scored set). Scale shape: bigram pairs build per-row
    * in codegen (`zip_with` of two `slice`s — no window, no extra
    * exchange); the model tables broadcast back into the pair stream
    * (same contract as [[unigramLogProb]]: drop the hints if a
    * byte-level vocabulary outgrows a broadcast and the joins degrade
    * to key shuffles); the per-doc mean aggregates narrow rows.
    */
  def bigramBackoffLogProb(
      score: org.apache.spark.sql.DataFrame,
      model: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      alpha: Double = 0.4): org.apache.spark.sql.DataFrame = {
    def pairs(c: Column): Column = {
      val a = split(c, " ")
      val n = size(a) - 1
      explode(zip_with(slice(a, lit(1), greatest(n, lit(0))),
        slice(a, lit(2), greatest(n, lit(0))),
        (x, y) => struct(x.as("w1"), y.as("w2"))))
    }
    val uni = model.select(explode(split(col(textCol), " ")).as("__w"))
      .groupBy("__w").agg(count(lit(1)).as("__c"))
    val tot = uni.agg(sum("__c").as("__tot"))
    val bi = model.select(pairs(col(textCol)).as("__p"))
      .groupBy(col("__p.w1").as("__w1"), col("__p.w2").as("__w2"))
      .agg(count(lit(1)).as("__cb"))
    val sb = score.select(col(idCol), pairs(col(textCol)).as("__p"))
      .select(col(idCol), col("__p.w1").as("__w1"),
        col("__p.w2").as("__w2"))
    val scored = sb
      .join(broadcast(bi), Seq("__w1", "__w2"), "left")
      .join(broadcast(uni.select(col("__w").as("__w1"),
        col("__c").as("__c1"))), Seq("__w1"), "left")
      .join(broadcast(uni.select(col("__w").as("__w2"),
        col("__c").as("__c2"))), Seq("__w2"), "left")
      .crossJoin(broadcast(tot))
      .withColumn("__lp",
        when(col("__cb").isNotNull,
          log(col("__cb") * lit(1.0) / col("__c1")))
        .when(col("__c2").isNotNull,
          log(lit(alpha) * col("__c2") / col("__tot")))
        .otherwise(log(lit(alpha) / col("__tot"))))
      .groupBy(col(idCol))
      .agg(round(avg(col("__lp")), 6).as("logprob"))
    score.select(col(idCol)).distinct()
      .join(scored, Seq(idCol), "left")
  }

  /** PII scrubbing for training-data curation: emails, then long bare
    * digit runs (ids/SSNs), then phone-like sequences (digits with
    * separators), replaced with stable tags. Regexes stay in the
    * RE2-compatible subset so the conformance oracle applies the
    * identical patterns. Order matters: emails first (their local
    * part may contain digits), then bare runs (so they tag as
    * [NUMBER], not [PHONE]), then separator-style phone numbers.
    */
  def redactPii(text: Column): Column = {
    val email = regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]")
    val num = regexp_replace(email, "[0-9]{7,}", "[NUMBER]")
    regexp_replace(num, "\\+?[0-9][0-9() .-]{5,}[0-9]", "[PHONE]")
  }

  /** D4l: URL canonicalization — the normalization every web-corpus
    * pipeline runs before URL-level dedup (RefinedWeb/CCNet drop
    * re-crawls of the same page behind cosmetic URL variation).
    * Rules, in order: strip the fragment; lowercase scheme and
    * host; drop the scheme's default port (http:80 / https:443);
    * drop a leading `www.`; drop `utm_*` tracking parameters
    * (other parameters keep their original order); strip trailing
    * slashes from the path. Pure built-in expressions — per-row,
    * codegen, no UDF — so the same rules are expressible in any
    * engine (the d4l oracle replays them in SQL).
    */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostPort = lower(regexp_extract(noFrag, "^[^:/?#]+://([^/?#]*)", 1))
    val rest = regexp_extract(noFrag, "^[^:/?#]+://[^/?#]*(.*)$", 1)
    val noDefPort = when(scheme === "http",
        regexp_replace(hostPort, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
      .otherwise(hostPort)
    val host = regexp_replace(noDefPort, "^www\\.", "")
    val path = regexp_replace(
      regexp_extract(rest, "^([^?]*)", 1), "/+$", "")
    val query = array_join(
      filter(split(regexp_extract(rest, "\\?(.*)$", 1), "&"),
        p => !p.startsWith("utm_") && p =!= ""), "&")
    concat(scheme, lit("://"), host, path,
      when(length(query) > 0, concat(lit("?"), query)).otherwise(lit("")))
  }

  /** Word n-grams WITH multiplicity, in text order (unlike
    * `word_shingles`, which deduplicates — signatures want set
    * semantics, frequency statistics want the multiset). Tokenization
    * matches the shingle kernels: lowercase, split on whitespace,
    * empty tokens dropped. Texts shorter than `n` words yield an
    * empty array (no whole-text collapse — a frequency table must not
    * conflate "short text" with "n-gram"). Pure built-in higher-order
    * functions: per-row, codegen-adjacent, no shuffle, no UDF.
    */
  def wordNgrams(text: Column, n: Int): Column = {
    require(n >= 1, s"n=$n")
    bound(filter(split(lower(text), "\\s+"), w => w =!= lit(""))) { ts =>
      when(size(ts) >= n,
        transform(sequence(lit(1), size(ts) - lit(n - 1)),
          i => array_join(slice(ts, i, lit(n)), " ")))
        .otherwise(array().cast("array<string>"))
    }
  }

  /** D14: corpus vocabulary induction — the k most frequent word
    * n-grams with exact counts (the first step of tokenizer/vocab
    * construction and the exact companion of the sketch path below).
    *
    * Scale: one shuffle on the gram key with map-side partial counts
    * (vocabulary-bounded, like D4f's document-frequency aggregate);
    * the final top-k lowers to TakeOrderedAndProject over the
    * aggregated (vocabulary-sized, not corpus-sized) table.
    */
  def topNgrams(
      df: org.apache.spark.sql.DataFrame,
      textCol: String,
      n: Int,
      k: Int): org.apache.spark.sql.DataFrame =
    df.select(explode(wordNgrams(col(textCol), n)).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("gram"))
      .limit(k)

  /** D21: tokenizer/vocabulary coverage — per-document OOV rate
    * against the top-V corpus vocabulary (the D14 unigram induction):
    * the go/no-go metric before committing a tokenizer vocab to a
    * corpus, and the per-document quality signal "this text is not
    * made of this corpus's words".
    *
    * Scale: the vocabulary is top-V by contract (dimension-scale), so
    * it BROADCASTS into one tokenized corpus scan; the per-doc
    * aggregate exchanges (id, partial-count) pairs only. Tokenization
    * matches [[wordNgrams]] (lowercase, whitespace split, empties
    * dropped) so vocab and corpus sides can never disagree.
    */
  def oovRate(
      docs: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      vocabSize: Int): org.apache.spark.sql.DataFrame = {
    val vocab = topNgrams(docs, textCol, 1, vocabSize)
      .select(col("gram").as("__w"), lit(true).as("__in"))
    docs.select(col(idCol),
        explode(filter(split(lower(col(textCol)), "\\s+"),
          t => t =!= "")).as("__w"))
      .join(broadcast(vocab), Seq("__w"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__in").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate",
        round(col("n_oov") / col("n_tokens"), 6))
  }
}
