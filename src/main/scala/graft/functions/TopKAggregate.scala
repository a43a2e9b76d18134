package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k-per-group UDAF (SURVEY §2.5's third `Aggregator`):
  * `topk_agg(k)(score, id)` keeps the k best (score DESC, id ASC)
  * pairs per group with a FIXED-SIZE buffer.
  *
  * The window formulation (`row_number() OVER (PARTITION BY g ORDER BY
  * s DESC) <= k`) shuffles and SORTS every row of every group; this
  * aggregate is the map-side-combine shape instead — each partition
  * reduces a group to ≤ k pairs before the exchange, so the shuffle
  * carries k × groups × partitions pairs regardless of row count, and
  * no per-group sort of the full data ever runs. At 100 TB "top 10
  * documents per domain by quality" is the difference between
  * exchanging ~everything and exchanging kilobytes per reducer.
  *
  * Semantics are EXACTLY the window form's (ties broken by id, then
  * the whole order made total) — OperatorPropertySpec pins the
  * equivalence; the conformance gate (d16) hash-matches the DuckDB
  * window oracle.
  */
object TopKAggregate {

  /** One scored row: the aggregate's input and output element. */
  final case class Scored(score: Double, id: Long)

  /** Mutable bounded buffer: parallel arrays + fill count. Kept flat
    * (no tuples) so the buffer encoder is two primitive arrays.
    */
  final case class TopKBuf(
      var scores: Array[Double],
      var ids: Array[Long],
      var n: Int)

  /** true iff (s1, i1) ranks strictly better than (s2, i2) under
    * (score DESC, id ASC).
    */
  @inline private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  private def aggregator(k: Int): Aggregator[Scored, TopKBuf, Seq[Scored]] =
    new Aggregator[Scored, TopKBuf, Seq[Scored]] {
      override def zero: TopKBuf =
        TopKBuf(new Array[Double](k), new Array[Long](k), 0)

      /** Index of the current worst entry — O(k) scan, k is small by
        * contract (an aggregate keeping millions of rows per group
        * should be a window instead).
        */
      private def worstIdx(b: TopKBuf): Int = {
        var w = 0
        var i = 1
        while (i < b.n) {
          if (better(b.scores(w), b.ids(w), b.scores(i), b.ids(i))) w = i
          i += 1
        }
        w
      }

      override def reduce(b: TopKBuf, v: Scored): TopKBuf = {
        if (v == null) return b // null rows are identity, like built-ins
        if (b.scores.length < k) { // fresh deserialized zero may be sized 0
          b.scores = java.util.Arrays.copyOf(b.scores, k)
          b.ids = java.util.Arrays.copyOf(b.ids, k)
        }
        if (b.n < k) {
          b.scores(b.n) = v.score; b.ids(b.n) = v.id; b.n += 1
        } else {
          val w = worstIdx(b)
          if (better(v.score, v.id, b.scores(w), b.ids(w))) {
            b.scores(w) = v.score; b.ids(w) = v.id
          }
        }
        b
      }

      override def merge(a: TopKBuf, b: TopKBuf): TopKBuf = {
        var i = 0
        while (i < b.n) {
          reduce(a, Scored(b.scores(i), b.ids(i)))
          i += 1
        }
        a
      }

      override def finish(b: TopKBuf): Seq[Scored] =
        (0 until b.n).map(i => Scored(b.scores(i), b.ids(i)))
          .sortWith((x, y) => better(x.score, x.id, y.score, y.id))

      override def bufferEncoder: Encoder[TopKBuf] = ExpressionEncoder()
      override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
    }

  private val cache =
    scala.collection.concurrent.TrieMap.empty[
      Int, org.apache.spark.sql.expressions.UserDefinedFunction]

  /** Column form: `topk_agg(k)(score, id)` in an `agg(...)` — returns
    * ARRAY<STRUCT<score: DOUBLE, id: BIGINT>> sorted best-first.
    */
  def topk_agg(k: Int)(score: Column, id: Column): Column = {
    require(k >= 1 && k <= 65536, s"k=$k (want 1..65536)")
    cache.getOrElseUpdate(k, udaf(aggregator(k)))(score, id)
  }
}
