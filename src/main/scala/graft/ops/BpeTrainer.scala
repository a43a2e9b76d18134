package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.BpeOps

/** D26: BPE vocabulary induction — learn a byte-pair-encoding merge
  * table from a corpus (Sennrich et al., ACL 2016; the GPT-2/RoBERTa
  * tokenizer-training recipe). Complements d4h (which COUNTS GPT-2
  * pre-tokens with a fixed regex) with the trainer that produces the
  * merges, and `bpe_encode` (graft.functions) with the per-row encoder
  * that applies them.
  *
  * Two-phase shape, which is what makes it scale:
  *
  *  1. **Word-type counting (distributed).** BPE training never needs
  *     the corpus — only the WORD-TYPE frequency table (the standard
  *     algorithm operates on types × counts). One scan pre-tokenizes
  *     (the d4h GPT-2 regex, in-plan), one exchange carries
  *     map-side-combined (type, count) partials — bounded by
  *     vocabulary, not tokens (the D14 contract) — and
  *     `TakeOrderedAndProject` caps the driver at the `maxTypes` most
  *     frequent types. Rare-type truncation is the standard trainer
  *     trade (fastText/HF train on exactly this table, often from a
  *     corpus sample).
  *  2. **Merge loop (driver, bounded).** Classic pair-count-and-merge
  *     over the ≤ maxTypes table: O(numMerges × types × avgLen) on
  *     KB-to-MB-scale state. Deterministic: ties break by pair
  *     lexicographic order, so the same corpus always yields the same
  *     merge table on any cluster layout (the counting aggregate is
  *     exact integers — order-immune).
  *
  * Types containing the serialization separators (U+001E/U+001F —
  * control chars that are practically absent from text) are excluded
  * from TRAINING so the merge table round-trips unambiguously;
  * documents containing them still encode (their symbols just never
  * merge).
  */
object BpeTrainer {

  /** A trained merge table, earliest (highest-priority) first. */
  final case class BpeModel(merges: IndexedSeq[(String, String)]) {
    /** Wire form consumed by `bpe_encode` (and [[BpeModel.parse]]). */
    def serialized: String =
      merges.map { case (a, b) => a + BpeOps.pairSep + b }
        .mkString(BpeOps.mergeSep.toString)
    /** The learned subword vocabulary: every merge's joined symbol. */
    def vocabulary: Seq[String] = merges.map { case (a, b) => a + b }
  }

  object BpeModel {
    def parse(s: String): BpeModel =
      if (s.isEmpty) BpeModel(Vector.empty)
      else BpeModel(s.split(BpeOps.mergeSep.toString, -1).toVector.map { p =>
        val cut = p.indexOf(BpeOps.pairSep)
        require(cut >= 0, "malformed serialized BPE model")
        (p.substring(0, cut), p.substring(cut + 1))
      })
  }

  /** The GPT-2 pre-token pattern as an in-plan extractor (identical
    * to the kernel's, so counting and encoding agree).
    */
  private val preTokenPat =
    "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+"

  /** Phase 1: the word-type frequency table, capped at the `maxTypes`
    * most frequent types (count desc, type asc — deterministic).
    */
  def wordTypeCounts(
      df: DataFrame, textCol: String, maxTypes: Int): Array[(String, Long)] = {
    require(maxTypes >= 1, s"maxTypes must be >= 1, got $maxTypes")
    df.select(explode(
        regexp_extract_all(col(textCol), lit(preTokenPat), lit(0))).as("w"))
      .filter(length(col("w")) > 0)
      .filter(!col("w").contains(BpeOps.pairSep.toString) &&
        !col("w").contains(BpeOps.mergeSep.toString))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc)
      .limit(maxTypes)
      .collect().map(r => (r.getString(0), r.getLong(1)))
  }

  /** Phase 2: the Sennrich merge loop over the type table. Stops
    * early when no adjacent pair occurs at least `minPairCount`
    * times (weighted by type frequency).
    */
  def trainFromTypes(
      types: Array[(String, Long)],
      numMerges: Int,
      minPairCount: Long = 2L): BpeModel = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    var words: Array[(Array[String], Long)] = types.map { case (w, c) =>
      val syms = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        val n = Character.charCount(cp)
        syms += w.substring(i, i + n)
        i += n
      }
      (syms.toArray, c)
    }
    val merges = Vector.newBuilder[(String, String)]
    var made = 0
    var exhausted = false
    while (made < numMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val (best, bestCount) = counts.minBy { case ((a, b), c) =>
          (-c, a, b) // highest count; ties lexicographic — deterministic
        }
        if (bestCount < minPairCount) exhausted = true
        else {
          merges += best
          made += 1
          words = words.map { case (syms, c) =>
            if (syms.length < 2) (syms, c)
            else {
              val next = scala.collection.mutable.ArrayBuffer.empty[String]
              var i = 0
              while (i < syms.length) {
                if (i < syms.length - 1 &&
                    syms(i) == best._1 && syms(i + 1) == best._2) {
                  next += syms(i) + syms(i + 1); i += 2
                } else { next += syms(i); i += 1 }
              }
              (next.toArray, c)
            }
          }
        }
      }
    }
    BpeModel(merges.result())
  }

  /** End to end: count types (one scan + one vocab-bounded exchange),
    * then train on the driver.
    */
  def learn(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      maxTypes: Int = 1 << 16,
      minPairCount: Long = 2L): BpeModel =
    trainFromTypes(wordTypeCounts(df, textCol, maxTypes),
      numMerges, minPairCount)

  /** Encode a text column with a trained model — per-row codegen
    * kernel, model shipped as one plan literal.
    */
  def encode(text: Column, model: BpeModel): Column =
    graft.functions.GraftFunctions.bpe_encode(text, lit(model.serialized))
}
