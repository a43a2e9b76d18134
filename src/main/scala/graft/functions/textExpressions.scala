package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, QuaternaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.chunk.{Chunkers, Tokens}

/** Static kernels for the text expressions — called directly from
  * generated code (same forwarder pattern as [[VectorOps]]).
  */
object TextOps {

  /** NFC canonical composition; quick-check fast path returns the
    * input object untouched when it is already normalized.
    */
  def nfcNormalize(text: UTF8String): UTF8String = {
    val s = text.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC))
      text
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  /** chunk_text kernel: split `text` into lines, pack into paragraphs
    * of ≤ maxTokens (heuristic) with optional overlap; mode "markdown"
    * selects the markdown separator preference (the reference routes
    * BOTH .txt and .md here — AzureCosmosDB/.../DocumentChunker.cs:63-81;
    * mode "plain" is the A8 fixed-size path).
    */
  def chunkText(
      text: UTF8String,
      maxTokens: Int,
      overlapTokens: Int,
      mode: UTF8String): ArrayData = {
    val markdown = mode.toString != "plain"
    val lines = text.toString.split("\n", -1).toSeq
    val paras = Chunkers.splitParagraphs(
      lines, math.max(1, maxTokens), overlapTokens, markdown)
    new GenericArrayData(paras.map(UTF8String.fromString).toArray[Any])
  }

  def tokenCount(text: UTF8String): Int = Tokens.count(text.toString)
}

/** `chunk_text(text, max_tokens, overlap, mode)` → ARRAY<STRING>
  * (SURVEY A8/A9 as a deterministic Catalyst expression; `posexplode`
  * over the result assigns chunk numbers, A12).
  */
case class ChunkText(
    first: Expression,
    second: Expression,
    third: Expression,
    fourth: Expression)
    extends QuaternaryExpression with ExpectsInputTypes {

  override def prettyName: String = "chunk_text"
  override def inputTypes =
    Seq(StringType, IntegerType, IntegerType, StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(t: Any, m: Any, o: Any, md: Any): Any =
    TextOps.chunkText(
      t.asInstanceOf[UTF8String],
      m.asInstanceOf[Int],
      o.asInstanceOf[Int],
      md.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ops = TextOps.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev,
      (t, m, o, md) => s"${ev.value} = $ops.chunkText($t, $m, $o, $md);")
  }

  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression, d: Expression) =
    copy(first = a, second = b, third = c, fourth = d)
}

/** `token_count(text)` → INT — the chunk-budget token estimator
  * (SURVEY D4; mirrors the heuristic behind A8's MaxTokensPerChunk).
  */
case class TokenCount(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "token_count"
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(t: Any): Any =
    TextOps.tokenCount(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ops = TextOps.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $ops.tokenCount($t);")
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `nfc_normalize(text)` → STRING — Unicode NFC canonical composition
  * (SURVEY D4 normalization): decomposed sequences (e + U+0301)
  * compose to their canonical form (é), so content hashes, dedup
  * shingles and fingerprints agree across sources that emit different
  * Unicode forms of the same text. Kernel = `java.text.Normalizer`
  * (the JDK's Unicode implementation — deterministic across JVMs);
  * the quick-check fast path skips allocation for already-NFC input
  * (virtually all of it).
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "nfc_normalize"
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(t: Any): Any =
    TextOps.nfcNormalize(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ops = TextOps.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $ops.nfcNormalize($t);")
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
