package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.{gram_hashes, minhash_signature, simhash64, winnow_fingerprints, word_shingles}

/** Deduplication operators for large-scale corpus curation
  * (SURVEY §2.4 D1/D2): exact content-hash dedup, MinHash+LSH
  * candidate generation with exact-Jaccard verification, SimHash
  * near-dup pairing, and an exact word-set Jaccard join.
  *
  * Scale design:
  *  - everything is expressed with built-in (codegen'd) higher-order
  *    functions over arrays — shingling, MinHash, banding are all
  *    per-row map work, no UDFs;
  *  - the only shuffles are the band-bucket self-join (keys are
  *    (band_idx, band_key), cardinality ≈ rows×bands, uniformly
  *    hash-distributed — skew-free by construction) and the final
  *    distinct;
  *  - candidate verification joins text back by id (shuffle on id) and
  *    evaluates exact Jaccard only on candidate pairs, which is the
  *    whole point of LSH: O(candidates) ≪ O(n²).
  */
object Dedup {

  /** Lowercased word `n`-shingles of a text column (distinct). Short
    * texts (< n words) collapse to a single whole-text shingle.
    * One-pass codegen'd expression — the equivalent
    * transform+slice higher-order formulation is O(words²) per row
    * and interprets poorly.
    */
  def shingles(text: Column, n: Int): Column =
    word_shingles(text, lit(n))

  /** MinHash signature: k min-hashes in a single pass over the text's
    * shingles (custom codegen'd expression — a nested higher-order
    * formulation re-hashes every shingle per hash function and is
    * orders of magnitude slower).
    */
  def minhashSignature(text: Column, numHashes: Int, shingleSize: Int): Column =
    minhash_signature(text, lit(numHashes), lit(shingleSize))

  /** LSH band keys: the signature folds into `bands` keys of
    * `numHashes / bands` rows each; two texts sharing any band key are
    * candidates.
    */
  def bandKeys(sig: Column, numHashes: Int, bands: Int): Column = {
    val rows = math.max(1, numHashes / bands)
    // xorshift-style fold: bit ops only, so ANSI overflow checking
    // never trips (multiplicative mixing would overflow LongType)
    transform(sequence(lit(0), lit(bands - 1)),
      b => aggregate(slice(sig, b * rows + lit(1), lit(rows)), lit(0L),
        (acc, x) => shiftleft(acc, 13)
          .bitwiseXOR(shiftrightunsigned(acc, 7))
          .bitwiseXOR(x)))
  }

  /** D1: exact dedup by content hash — keep the smallest id per
    * distinct content, count the duplicates.
    */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(sha2(col(textCol), 256).as("content_hash"))
      .agg(min(col(idCol)).as("keeper"), count(lit(1)).as("dups"))

  /** D2: MinHash+LSH near-dup pairs, verified with exact Jaccard over
    * the shingle sets. Returns (id1, id2, jaccard) for candidates with
    * jaccard ≥ threshold. LSH bounds false negatives probabilistically;
    * verification removes all false positives.
    */
  def minhashLshPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.5,
      numHashes: Int = 64,
      bands: Int = 16,
      shingleSize: Int = 3): DataFrame = {
    // Consumer-specific projections instead of one persisted frame:
    // the band self-join needs ONLY the minhash band keys (the
    // expensive signature computes exactly once), and each
    // verification join needs ONLY the shingles (cheap substring
    // extraction, computed per join side). No persist/checkpoint —
    // the operator is stateless, leaves nothing in the cache manager,
    // and costs three text-column scans instead of caching a
    // signature frame that may be a large multiple of memory at scale.
    val sh = df.select(col(idCol).as("id"),
      shingles(col(textCol), shingleSize).as("sh"))

    // explicit repartition on the join key: both sides of the
    // self-join then share ONE canonical exchange, and ReuseExchange
    // evaluates the minhash signature exactly once (without it, AQE
    // may broadcast one side and each side re-hashes every text)
    val buckets = df.select(col(idCol).as("id"),
      posexplode(bandKeys(minhashSignature(col(textCol), numHashes,
        shingleSize), numHashes, bands)).as(Seq("band", "key")))
      .repartition(col("band"), col("key"))
    val candidates = buckets.as("a")
      .join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
      .distinct()

    candidates
      .join(sh.select(col("id").as("id1"), col("sh").as("sh1")), "id1")
      .join(sh.select(col("id").as("id2"), col("sh").as("sh2")), "id2")
      .select(col("id1"), col("id2"),
        (size(array_intersect(col("sh1"), col("sh2"))).cast("double") /
          size(array_union(col("sh1"), col("sh2")))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** D2/D4 (rolling-hash flavor): PARTIAL-overlap candidate pairs via
    * winnowed rolling-hash fingerprints — two documents sharing a
    * substring of length ≥ w + k - 1 chars are guaranteed ≥ 1 common
    * fingerprint, so copied passages surface even when the documents
    * as wholes are dissimilar (which whole-document MinHash misses).
    *
    * Scale: fingerprints explode to (fp, id) and self-join on fp —
    * uniformly-hashed keys; fingerprints occurring in more than
    * `maxDocFreq` documents (boilerplate chrome) are dropped before
    * the join, which both removes noise and caps the per-key join
    * fan-out.
    */
  def winnowOverlapPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8,
      w: Int = 4,
      minShared: Int = 2,
      maxDocFreq: Int = 50): DataFrame = {
    val fps = df.select(col(idCol).as("id"),
      explode(winnow_fingerprints(col(textCol), lit(k), lit(w))).as("fp"))
      .distinct()
    val rare = fps.groupBy("fp").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDocFreq)
      .select("fp")
    val pruned = fps.join(rare, "fp")
    pruned.as("a")
      .join(pruned.as("b"),
        col("a.fp") === col("b.fp") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id1"), col("b.id").as("id2"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }

  /** D2 (SimHash flavor): near-dup pairs within a Hamming radius.
    * Band trick: a 64-bit signature splits into 4×16-bit bands —
    * Hamming distance ≤ 3 guarantees at least one identical band
    * (pigeonhole), so the self-join is on exact band equality and the
    * radius filter uses built-in bit_count on the XOR.
    */
  def simhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3,
      shingleSize: Int = 2): DataFrame = {
    require(maxHamming <= 3, "4-band trick covers Hamming radius ≤ 3")
    val sig = df.select(col(idCol).as("id"),
      simhash64(col(textCol), lit(shingleSize)).as("sig"))
    val banded = sig.select(col("id"), col("sig"),
      posexplode(array((0 to 3).map(b =>
        shiftrightunsigned(col("sig"), b * 16).bitwiseAND(lit(0xffffL))): _*))
        .as(Seq("band", "bval")))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bval") === col("b.bval") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Near-dup CLUSTERS from a pair graph: connected components by
    * iterative min-label propagation — every node adopts the minimum
    * id reachable through its edges, so each duplicate cluster
    * resolves to one root (its smallest member, the canonical
    * "keeper"). Converges in O(graph diameter) rounds; dedup graphs
    * are cliques/short chains, so a handful of iterations suffice and
    * `maxIter` bounds the worst case (throws on non-convergence
    * rather than returning partial clusters).
    *
    * Output covers exactly the nodes that appear in some pair —
    * edgeless documents have no duplicates and need no root; union
    * them back with `root = id` if a total mapping is required.
    *
    * Scale: each round is one join + one min-aggregate on uniformly
    * hashed ids (the pair plan itself is checkpointed once, so an
    * expensive upstream LSH join never re-executes per round);
    * `localCheckpoint` cuts the growing lineage each round (the
    * classic iterative-join planner blowup) and the previous round's
    * blocks are freed eagerly, so storage holds ~2 label-table copies,
    * not maxIter.
    */
  def connectedComponents(
      pairs: DataFrame,
      maxIter: Int = 10): DataFrame = {
    // checkpoint the (possibly expensive — LSH band join + verify)
    // pair plan ONCE: every round re-reads edges, and without this the
    // whole upstream join would re-execute per round
    val edges = pairs.select(col("id1"), col("id2"))
      .unionAll(pairs.select(col("id2").as("id1"), col("id1").as("id2")))
      .localCheckpoint(true)
    var labels = edges.select(col("id1").as("id")).distinct()
      .withColumn("root", col("id"))
      .localCheckpoint(true)
    val idType = edges.schema("id1").dataType
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // ONE join per round: the previous root rides through the
      // propagation aggregate (each id has exactly ONE labels row, so
      // min over the null-padded `own` column recovers it), and the
      // convergence check is a short-circuit scan of the materialized
      // result — not a second full join against the old labels
      val neighborRoots = edges
        .join(labels.select(col("id").as("id2"), col("root")), "id2")
        .select(col("id1").as("id"), col("root"),
          lit(null).cast(idType).as("own"))
      val prop = neighborRoots
        .unionAll(labels.select(col("id"), col("root"),
          col("root").as("own")))
        .groupBy("id").agg(min("root").as("root"), min("own").as("prev"))
        .localCheckpoint(true)
      converged = prop.filter(col("root") =!= col("prev"))
        .limit(1).count() == 0L
      // prop is materialized and independent of the old labels — free
      // the previous round's checkpoint blocks instead of holding up
      // to maxIter label-table copies in executor storage
      freeLocalCheckpoint(labels)
      labels = prop.select("id", "root")
      iter += 1
    }
    freeLocalCheckpoint(edges)
    require(converged,
      s"connectedComponents did not converge in $maxIter rounds — " +
        "the pair graph has a longer path than expected; raise maxIter")
    labels
  }

  /** Unpersist the block-manager storage behind a `localCheckpoint`ed
    * frame (Dataset.unpersist only covers CacheManager entries, not
    * RDD-level checkpoint persistence). Safe once nothing derives from
    * the frame lazily.
    */
  private[graft] def freeLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(false)
      case _ => ()
    }

  /** Exact word-set Jaccard similarity join (the n-gram Jaccard
    * operator at n=1; SQL-oracle-checkable). Quadratic in candidate
    * rows — callers bound the input (or use [[minhashLshPairs]] as the
    * scale path; this is its verification semantics standalone).
    */
  def wordJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double): DataFrame = {
    val words = df.select(col(idCol).as("id"),
        explode(array_distinct(split(col(textCol), " "))).as("w"))
    val counts = words.groupBy("id").agg(count(lit(1)).as("n"))
    val inter = words.as("a").join(words.as("b"),
        col("a.w") === col("b.w") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id1"), col("b.id").as("id2"))
      .agg(count(lit(1)).as("ix"))
    inter
      .join(counts.select(col("id").as("id1"), col("n").as("n1")), "id1")
      .join(counts.select(col("id").as("id2"), col("n").as("n2")), "id2")
      .select(col("id1"), col("id2"),
        round(col("ix") * lit(1.0) / (col("n1") + col("n2") - col("ix")), 6)
          .as("jac"))
      .filter(col("jac") >= threshold)
  }

  /** D10b: pairwise group-overlap matrix from group MinHash
    * signatures — estimated shingle-set Jaccard between every pair of
    * GROUPS (sources, sites, crawls, languages): the "how much does
    * source A duplicate source B" datasheet that sizes cross-source
    * dedup work before running it.
    *
    * Scale design: the per-group union signature comes from ONE narrow
    * aggregate ([[graft.functions.VectorAggregates.minhash_agg]] —
    * elementwise-min fold, exact by the MinHash construction, fixed
    * k-long buffers combined map-side), so the corpus is read once and
    * never shuffled; the pairwise stage is a self-join over GROUPS
    * (dimension-scale — broadcast). The estimate is the fraction of
    * agreeing signature positions; σ ≈ √(J(1−J)/k). Exact pairwise
    * Jaccard (a shingle-level self-join) is the verification
    * semantics, same standing as D2c — the d10b gate runs both and
    * bounds the gap.
    */
  def groupMinhashOverlap(
      docs: DataFrame,
      groupCol: String,
      textCol: String,
      numHashes: Int = 128,
      shingleSize: Int = 3): DataFrame = {
    val sigs = docs.groupBy(col(groupCol).as("g"))
      .agg(graft.functions.VectorAggregates.minhash_agg(
        minhash_signature(col(textCol), lit(numHashes), lit(shingleSize)))
        .as("sig"))
    sigs.as("a").join(broadcast(sigs.as("b")),
        col("a.g") <= col("b.g"))
      .select(col("a.g").as("g1"), col("b.g").as("g2"),
        (size(filter(zip_with(col("a.sig"), col("b.sig"),
          (x, y) => x === y), b => b)) / lit(numHashes.toDouble))
          .as("est_jaccard"))
  }

  /** D18: cross-document repeated n-gram SPAN detection — the
    * shuffle-friendly form of exact substring deduplication (Lee et
    * al. 2021, "Deduplicating Training Data Makes Language Models
    * Better", arXiv:2107.06499, which cuts ≥50-token substrings that
    * repeat across documents rather than dropping whole docs). Every
    * word n-gram occurring in ≥ `minDocs` DISTINCT documents is a hit;
    * per document, hits within `n` positions of each other merge into
    * one maximal span `(start_pos, end_pos)` — the unit a curation
    * pass would cut. Unlike [[minhashLshPairs]] (document-level
    * similarity) and winnowed overlap (sampled fingerprints), this
    * reports exact positions of every shared run ≥ n words.
    *
    * Scale design: gram hashing is the one-pass `gram_hashes` codegen
    * kernel (index = position, so posexplode carries positions for
    * free — no O(words²) HOF, no gram strings past the row boundary).
    * The exchanges carry (hash, id, pos) — 24 bytes/gram, never text.
    * Repeated-gram detection is a count-distinct aggregate on the
    * hash; hit lookup joins back on the same hash key (one canonical
    * exchange each side, AQE-reusable); span merge is a per-document
    * window (partition key = doc id, corpus-parallel). The suffix
    * array of the original paper is pointer-chasing-hostile at
    * cluster scale; the n-gram formulation trades "any length ≥ n"
    * for embarrassing parallelism and catches the same spans (a
    * repeated run of length L ≥ n is covered by its L−n+1 repeated
    * n-grams and merges back to one span). 64-bit hash equality
    * stands in for string equality (collision odds ≈ grams²/2⁶⁴ —
    * at 10¹² grams, ~3%·ε; the d18 gate hash-matches a string-equality
    * oracle, witnessing zero collisions at test scale).
    */
  def repeatedNgramSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8,
      minDocs: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grams = docs.select(col(idCol).as("id"),
        posexplode(gram_hashes(col(textCol), lit(n))).as(Seq("pos", "h")))
      .select(col("id"), col("pos").cast("long").as("pos"), col("h"))
    val repeated = grams.groupBy("h")
      .agg(count_distinct(col("id")).as("nd"))
      .filter(col("nd") >= minDocs)
      .select("h")
    val w = Window.partitionBy("id").orderBy("pos")
    grams.join(repeated, Seq("h"))
      .select("id", "pos")
      .withColumn("brk",
        when(col("pos") - lag("pos", 1).over(w) > n, 1).otherwise(0))
      .withColumn("span_id", sum("brk").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("id"), col("span_id"))
      .agg(min("pos").as("start_pos"),
        (max("pos") + n - 1).as("end_pos"),
        count(lit(1)).as("n_grams"))
      .select(col("id").as(idCol), col("span_id"), col("start_pos"),
        col("end_pos"), col("n_grams"))
  }

  /** D18b: apply the D18 spans — CUT the cross-document repeated word
    * runs out of each text (the action step of exact substring dedup,
    * Lee et al. 2021, arXiv:2107.06499: remove the shared run, keep
    * the document). Every word position covered by a repeated span is
    * dropped; survivors rejoin in order. Returns every input row as
    * `(idCol, cleaned_text, n_cut)`.
    *
    * Scale: D18's gram shapes plus one per-doc span list (spans are
    * few and bounded per doc) joined back onto the corpus; the cut
    * itself is a per-row positional-filter HOF — the text never
    * shuffles beyond the span join's own exchange.
    */
  def cutRepeatedSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8,
      minDocs: Int = 2): DataFrame = {
    val spans = repeatedNgramSpans(docs, idCol, textCol, n, minDocs)
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("start_pos").as("s"),
        col("end_pos").as("e"))).as("__spans"))
    val toks = split(col(textCol), " ")
    val spansOrEmpty = coalesce(col("__spans"),
      array().cast("array<struct<s:bigint,e:bigint>>"))
    val kept = filter(toks, (_, i) =>
      !exists(spansOrEmpty, sp =>
        i >= sp.getField("s") && i <= sp.getField("e")))
    docs.join(spans, Seq(idCol), "left")
      .select(col(idCol),
        array_join(kept, " ").as("cleaned_text"),
        (size(toks) - size(kept)).cast("long").as("n_cut"))
  }

  /** D23: corpus-level repeated-LINE removal — the line-dedup stage of
    * the RefinedWeb/Falcon and Gopher/MassiveText pipelines (Penedo et
    * al. 2023, arXiv:2306.01116 §3; Rae et al. 2021, arXiv:2112.11446
    * A.1.2): a line appearing verbatim in ≥ `minDocs` distinct
    * documents is template boilerplate (nav menus, cookie banners,
    * footers) and is cut from EVERY document; remaining lines rejoin
    * in order. Whitespace-only lines are never candidates and never
    * cut. Returns every input row as `(idCol, cleaned_text, n_cut)`.
    *
    * Scale shape (the line-granular sibling of [[cutRepeatedSpans]],
    * with D11's broadcast-blocklist structure): lines hash per-row
    * BEFORE the one exchange — the candidacy aggregate carries
    * (hash, id) pairs, never line text — and the surviving hashes
    * collapse into ONE broadcast set tested per line in a per-row
    * HOF, so the corpus text never crosses ANY exchange and there is
    * no join back onto the docs at all. The broadcast is bounded by
    * the number of DISTINCT template lines (nav/cookie/footer
    * boilerplate — the ≥ minDocs filter is exactly what keeps it
    * small; a corpus with 10⁷ distinct lines each repeated across
    * minDocs documents is not boilerplate removal and wants D1/D2
    * document dedup instead). Hash collisions (same trade as the D18
    * gram hashes) could cut an innocent line; at 64 bits that needs
    * ~2³² distinct corpus lines before birthday effects appear.
    */
  def cutCommonLines(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minDocs: Int): DataFrame = {
    val commonSet = docs.select(col(idCol).as("id"),
        explode(split(col(textCol), "\n")).as("line"))
      .filter(trim(col("line")) =!= "")
      .select(col("id"), xxhash64(col("line")).as("h"))
      .groupBy("h").agg(count_distinct(col("id")).as("nd"))
      .filter(col("nd") >= minDocs)
      .agg(coalesce(collect_set(col("h")),
        array().cast("array<bigint>")).as("__common"))
    val toks = split(col(textCol), "\n")
    val kept = filter(toks, x =>
      !(trim(x) =!= "" && array_contains(col("__common"), xxhash64(x))))
    docs.crossJoin(broadcast(commonSet))
      .select(col(idCol),
        array_join(kept, "\n").as("cleaned_text"),
        (size(toks) - size(kept)).cast("long").as("n_cut"))
  }

  /** D13: semantic (embedding-space) dedup — SemDeDup (Abbas et al.,
    * arXiv:2303.09540): partition vectors into k-means cells, compare
    * pairs only WITHIN a cell, flag every row that has a smaller-id
    * neighbor with cosine similarity ≥ `tau` (the min-id row of each
    * semantic group is the keeper, same keeper rule as
    * [[exactDedup]]/D2e).
    *
    * Scale design: the published SemDeDup tradeoff — cells bound the
    * quadratic. The self-join shuffles both sides once on `cell`
    * (pick nCells ≈ n/targetCellSize so cells stay small — the paper
    * runs ~50k cells over LAION), within-cell pair work is Σ|cell|²
    * instead of n², and the centroid model is KB-scale driver state
    * from the one-scan [[Similarity.ivfCentroids]] sampler. Skewed
    * cells split under AQE skew-join. Near-identical pairs land in
    * the same cell with probability → 1 as similarity → 1 (both
    * quantize to the same nearest centroid).
    */
  def semanticDedup(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      nCells: Int = 16,
      tau: Double = 0.99,
      seed: Long = 42L): DataFrame = {
    val cents = Similarity.ivfCentroids(emb, idCol, vecCol, nCells, seed)
    val assigned = emb.select(col(idCol).as("id"), col(vecCol).as("v"),
      Similarity.nearestCentroid(col(vecCol), cents).as("cell"))
    val pairs = assigned.as("x").join(assigned.as("y"),
        col("x.cell") === col("y.cell") && col("x.id") < col("y.id"))
      .filter(lit(1.0) - graft.functions.GraftFunctions
        .cosine_distance(col("x.v"), col("y.v")) >= tau)
    val dupOf = pairs.groupBy(col("y.id").as("id"))
      .agg(min(col("x.id")).as("dup_of"))
    assigned.select("id", "cell")
      .join(dupOf, Seq("id"), "left")
      .select(col("id").as(idCol), col("cell"),
        col("dup_of").isNotNull.as("is_dup"), col("dup_of"))
  }
}
