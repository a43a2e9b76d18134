package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** D28: fuzzy string join — all pairs within a small edit distance,
  * with SOUND deletion-neighborhood blocking (FastSS, Bocek et al.
  * 2007): every string is keyed by itself and every variant reachable
  * by deleting up to `maxDist` characters; `levenshtein(s, t) ≤ k`
  * guarantees the two deletion neighborhoods of depth k intersect, so
  * an equi-join on the variant key finds every true pair and an exact
  * `levenshtein` verify (Spark's codegen built-in) discards the false
  * candidates. The entity-resolution / near-identical-key join (typo'd
  * urls, OCR'd titles, name linkage) that a naive formulation writes
  * as an O(n²) theta join.
  *
  * Scale shape: |s|+1 keys per string at k=1 (O(|s|²) at k=2 — keep
  * strings short or k=1), ONE exchange on the variant key, candidate
  * pairs bounded by neighborhood collisions, the verify in codegen.
  * No driver state; skewed keys (very common variants) are ordinary
  * AQE skew. The theorem needs depth-k deletions on BOTH sides —
  * halving it (index-side only) silently loses pairs.
  */
object FuzzyJoin {

  /** All strings reachable from `s` by at most `maxDist` deletions
    * (including `s` itself), as a distinct array — pure column HOFs,
    * no UDF. k is bounded to 1 or 2: beyond that the neighborhood
    * explodes combinatorially and q-gram schemes win.
    */
  private[ops] def deletionKeys(s: Column, maxDist: Int): Column = {
    val d1 = array_union(
      array(s),
      transform(sequence(lit(1), length(s)),
        i => concat(substring(s, lit(1), i - 1),
          s.substr(i + 1, length(s)))))
    maxDist match {
      case 1 => array_distinct(d1)
      case 2 => array_distinct(flatten(transform(d1, v =>
        array_union(
          array(v),
          transform(sequence(lit(1), length(v)),
            i => concat(substring(v, lit(1), i - 1),
              v.substr(i + 1, length(v))))))))
      case k => throw new IllegalArgumentException(
        s"maxDist must be 1 or 2, got $k (deletion neighborhoods " +
          "explode combinatorially; use q-gram blocking beyond 2)")
    }
  }

  /** All (left, right) pairs with `levenshtein ≤ maxDist`. Inputs are
    * (id, string) projections — ids must uniquely key their strings
    * (the entity-resolution contract; a duplicated id would duplicate
    * its pairs through the string rejoin). Output is
    * (id1, s1, id2, s2, dist), one row per matched pair.
    *
    * Exchange width: the variant-key join and the candidate dedup
    * carry ONLY ids — a string appears |s|+1 times (O(|s|²) at k=2)
    * under its deletion keys, so carrying the strings themselves
    * through that exchange would multiply corpus bytes by the
    * neighborhood size. Strings rejoin AFTER the (id1, id2) distinct,
    * on the candidate set (collision-bounded), for the codegen
    * `levenshtein` verify.
    */
  def joinWithin(
      left: DataFrame, leftId: String, leftStr: String,
      right: DataFrame, rightId: String, rightStr: String,
      maxDist: Int): DataFrame = {
    val lk = left.select(col(leftId).as("id1"),
        explode(deletionKeys(col(leftStr), maxDist)).as("__fk"))
    val rk = right.select(col(rightId).as("id2"),
        explode(deletionKeys(col(rightStr), maxDist)).as("__fk"))
    val candidates = lk.join(rk, "__fk")
      .select("id1", "id2").distinct()
    candidates
      .join(left.select(col(leftId).as("id1"), col(leftStr).as("s1")),
        Seq("id1"))
      .join(right.select(col(rightId).as("id2"), col(rightStr).as("s2")),
        Seq("id2"))
      .withColumn("dist", levenshtein(col("s1"), col("s2")))
      .filter(col("dist") <= maxDist)
      .select("id1", "s1", "id2", "s2", "dist")
  }

  /** Self-join: unordered pairs (id1 < id2) within `maxDist` — the
    * near-identical-key discovery shape (typo clusters).
    */
  def similarPairs(
      df: DataFrame, idCol: String, strCol: String,
      maxDist: Int): DataFrame =
    joinWithin(df, idCol, strCol, df, idCol, strCol, maxDist)
      .filter(col("id1") < col("id2"))
}
