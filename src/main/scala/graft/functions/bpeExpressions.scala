package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel for [[BpeEncode]] — called from generated code via
  * the forwarder-class pattern (see [[TextOps]]).
  *
  * The merge table arrives as ONE serialized string literal: pairs
  * joined by U+001F within and U+001E between (`ops.BpeTrainer`
  * guarantees no symbol contains either separator — it refuses to
  * merge word types that do). Compiled rank maps are memoized in a
  * small bounded cache keyed by the literal, so the per-row path
  * never re-parses even when several distinct models run
  * concurrently in one executor.
  */
object BpeOps {

  val pairSep: Char = 0x1f.toChar
  val mergeSep: Char = 0x1e.toChar

  /** GPT-2-shaped pre-tokenizer (the d4h gate's pattern): contraction
    * suffixes, space-prefixed letter/digit runs, punctuation runs.
    */
  private val preTokenPattern = java.util.regex.Pattern.compile(
    "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+")

  def preTokenize(text: String): java.util.ArrayList[String] = {
    val out = new java.util.ArrayList[String]()
    val m = preTokenPattern.matcher(text)
    while (m.find()) out.add(m.group())
    out
  }

  /** One compiled model: left-symbol → right-symbol → rank (lower =
    * earlier = applied first) — two-level so ("a","bc") and ("ab","c")
    * never collide, the exact pitfall a flat concatenation key has.
    */
  private final class Model(
      val ranks: java.util.HashMap[String, java.util.HashMap[String, Integer]]) {
    def rank(a: String, b: String): Integer = {
      val inner = ranks.get(a)
      if (inner == null) null else inner.get(b)
    }
  }

  /** Bounded model memo: a handful of DISTINCT merge tables can be
    * live at once (two encode calls in one stage, concurrent jobs) —
    * a single-entry cache would thrash into per-row re-parsing. Keyed
    * by the literal's string; cleared wholesale at the bound (models
    * are cheap to rebuild, the bound only guards a pathological
    * many-models job).
    */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Model]()
  private val maxCachedModels = 8

  private def modelFor(merges: UTF8String): Model = {
    val key = merges.toString
    val hit = cache.get(key)
    if (hit != null) return hit
    val ranks =
      new java.util.HashMap[String, java.util.HashMap[String, Integer]]()
    val s = key
    if (s.nonEmpty) {
      var rank = 0
      s.split(mergeSep.toString, -1).foreach { pair =>
        val cut = pair.indexOf(pairSep)
        require(cut >= 0, s"malformed BPE merge entry at rank $rank")
        val a = pair.substring(0, cut)
        val b = pair.substring(cut + 1)
        ranks.computeIfAbsent(a, _ => new java.util.HashMap[String, Integer]())
          .putIfAbsent(b, rank)
        rank += 1
      }
    }
    val m = new Model(ranks)
    if (cache.size >= maxCachedModels) cache.clear()
    cache.put(key, m)
    m
  }

  /** Greedy lowest-rank-first merge of one pre-token (the standard
    * BPE encode loop). Symbols start as Unicode code points.
    */
  private def encodeWord(
      word: String, m: Model, out: java.util.ArrayList[String]): Unit = {
    var syms = new java.util.ArrayList[String](word.length)
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      val n = Character.charCount(cp)
      syms.add(word.substring(i, i + n))
      i += n
    }
    var done = syms.size < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var j = 0
      while (j < syms.size - 1) {
        val r = m.rank(syms.get(j), syms.get(j + 1))
        if (r != null && r < bestRank) { bestRank = r; bestAt = j }
        j += 1
      }
      if (bestAt < 0) done = true
      else {
        // merge every occurrence of the best pair, left to right
        val a = syms.get(bestAt)
        val b = syms.get(bestAt + 1)
        val next = new java.util.ArrayList[String](syms.size)
        var k = 0
        while (k < syms.size) {
          if (k < syms.size - 1 && syms.get(k) == a && syms.get(k + 1) == b) {
            next.add(a + b); k += 2
          } else { next.add(syms.get(k)); k += 1 }
        }
        syms = next
        done = syms.size < 2
      }
    }
    var k = 0
    while (k < syms.size) { out.add(syms.get(k)); k += 1 }
  }

  def encode(text: UTF8String, merges: UTF8String): ArrayData = {
    val model = modelFor(merges)
    val words = preTokenize(text.toString)
    val out = new java.util.ArrayList[String](words.size * 2)
    var i = 0
    while (i < words.size) { encodeWord(words.get(i), model, out); i += 1 }
    val arr = new Array[Any](out.size)
    var j = 0
    while (j < out.size) { arr(j) = UTF8String.fromString(out.get(j)); j += 1 }
    new GenericArrayData(arr)
  }
}

/** `bpe_encode(text, merges)` → ARRAY<STRING> — apply a trained BPE
  * merge table (SURVEY D26, `ops.BpeTrainer`) to a document: GPT-2
  * pre-tokenization, then greedy lowest-rank pair merging per
  * pre-token. The merge table is a serialized literal (KB-scale
  * driver state shipped in the plan, the same envelope as D8's
  * codebooks), so encoding is a per-row codegen kernel — zero
  * exchanges, corpus never shuffles.
  */
case class BpeEncode(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def prettyName: String = "bpe_encode"
  override def inputTypes = Seq(StringType, StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(t: Any, m: Any): Any =
    BpeOps.encode(t.asInstanceOf[UTF8String], m.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ops = BpeOps.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev,
      (t, m) => s"${ev.value} = $ops.encode($t, $m);")
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression) = copy(left = l, right = r)
}
