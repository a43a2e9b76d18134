package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel for [[BowEmbed]] (forwarder-class pattern, see
  * [[TextOps]]).
  */
object BowOps {

  /** Vocabulary-bounded memo of word vectors: natural-language word
    * frequencies are Zipfian, so almost every lookup after warmup is
    * a hit and the MD5 + PRNG cost is paid once per word TYPE per
    * executor, not per occurrence. Keyed by (word, dim); cleared
    * wholesale at the bound (vectors are cheap to rebuild — the bound
    * guards an adversarial unbounded-vocabulary stream).
    */
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), Array[Double]]()
  private val maxMemo = 1 << 16

  /** One word's deterministic unit vector: MD5 of the lowercased word
    * seeds the JDK PRNG (LCG + nextGaussian are specified by the JDK
    * docs — cross-JVM stable, the [[graft.embed.DeterministicEmbedder]]
    * recipe applied per WORD).
    */
  private def wordVec(word: String, dim: Int): Array[Double] = {
    val key = (word, dim)
    val hit = memo.get(key)
    if (hit != null) return hit
    val v = computeWordVec(word, dim)
    if (memo.size >= maxMemo) memo.clear()
    memo.put(key, v)
    v
  }

  private def computeWordVec(word: String, dim: Int): Array[Double] = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(word.getBytes("UTF-8"))
    var h = 0L
    var i = 0
    while (i < 8) { h = h * 31 + (digest(i) & 0xffL); i += 1 }
    val rnd = new java.util.Random(h)
    val v = Array.fill(dim)(rnd.nextGaussian())
    var norm = 0.0
    v.foreach(x => norm += x * x)
    val inv = if (norm == 0.0) 1.0 else 1.0 / math.sqrt(norm)
    var j = 0
    while (j < dim) { v(j) *= inv; j += 1 }
    v
  }

  def encode(text: UTF8String, dim: Int): ArrayData = {
    val words = text.toString.toLowerCase.split("\\W+").filter(_.nonEmpty)
    val acc = new Array[Double](dim)
    words.foreach { w =>
      val v = wordVec(w, dim)
      var i = 0
      while (i < dim) { acc(i) += v(i); i += 1 }
    }
    var norm = 0.0
    acc.foreach(x => norm += x * x)
    val inv = if (norm == 0.0) 0.0 else 1.0 / math.sqrt(norm)
    val out = new Array[Any](dim)
    var i = 0
    while (i < dim) { out(i) = (acc(i) * inv).toFloat; i += 1 }
    new GenericArrayData(out)
  }
}

/** `bow_embed(text, dim)` → ARRAY<FLOAT> — a deterministic
  * bag-of-words text embedding by random indexing (Kanerva-style:
  * every word hashes to a fixed random unit vector; the text embeds
  * as the normalized mean), computed per row in codegen. Texts
  * sharing vocabulary land near each other in cosine space, which is
  * exactly the signal [[graft.chunk.SemanticChunker]] segments on —
  * and a zero-dependency stand-in wherever a real model embedding
  * column is not available (same role as the ingest pipeline's
  * deterministic embedder stub; swap in model vectors by passing a
  * different column). The all-stopword/empty text embeds as the zero
  * vector (norm 0), which every cosine kernel downstream treats as
  * maximally distant.
  */
case class BowEmbed(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def prettyName: String = "bow_embed"
  override def inputTypes = Seq(StringType, IntegerType)
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(t: Any, d: Any): Any =
    BowOps.encode(t.asInstanceOf[UTF8String], d.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ops = BowOps.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev,
      (t, d) => s"${ev.value} = $ops.encode($t, $d);")
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression) = copy(left = l, right = r)
}
