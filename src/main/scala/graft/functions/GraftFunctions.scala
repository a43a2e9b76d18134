package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.graftbridge.Bridge

/** Scala Column API + SQL registration for graft's custom expressions.
  *
  * `register(spark)` makes every function callable from `spark.sql`
  * (e.g. `SELECT cosine_distance(embedding, :q) ...`); the Column
  * wrappers below work regardless of registration.
  */
object GraftFunctions {

  /** Single-evaluation let-binding: evaluates `c` exactly once per row
    * and hands it to `body` as a lambda variable. Referencing a plain
    * Column n times duplicates its whole subtree n times in the plan;
    * a lambda variable is an attribute reference, so the subtree stays
    * single however often the body uses it.
    */
  def bound(c: Column)(body: Column => Column): Column = {
    import org.apache.spark.sql.functions.{array, element_at, transform}
    element_at(transform(array(c), body), 1)
  }

  def cosine_distance(a: Column, b: Column): Column =
    binary(a, b, CosineDistance)
  def cosine_similarity(a: Column, b: Column): Column =
    binary(a, b, CosineSimilarity)
  def cosine_distance_stored_norm(
      a: Column, b: Column, normA: Column, normB: Column): Column = {
    val s = activeSession
    Bridge.column(CosineDistanceStoredNorm(
      Bridge.expression(s, a), Bridge.expression(s, b),
      Bridge.expression(s, normA), Bridge.expression(s, normB)))
  }
  def dot_product(a: Column, b: Column): Column =
    binary(a, b, DotProduct)
  def l2_distance(a: Column, b: Column): Column =
    binary(a, b, L2Distance)
  def vector_norm(a: Column): Column = {
    val s = activeSession
    Bridge.column(VectorNorm(Bridge.expression(s, a)))
  }

  def chunk_text(text: Column, maxTokens: Column, overlap: Column,
      mode: Column): Column = {
    val s = activeSession
    Bridge.column(ChunkText(
      Bridge.expression(s, text), Bridge.expression(s, maxTokens),
      Bridge.expression(s, overlap), Bridge.expression(s, mode)))
  }

  def token_count(text: Column): Column = {
    val s = activeSession
    Bridge.column(TokenCount(Bridge.expression(s, text)))
  }

  def nfc_normalize(text: Column): Column = {
    val s = activeSession
    Bridge.column(NfcNormalize(Bridge.expression(s, text)))
  }

  def simhash64(text: Column, shingleSize: Column): Column =
    binary(text, shingleSize, SimHash64)

  def minhash_signature(text: Column, numHashes: Column,
      shingleSize: Column): Column = {
    val s = activeSession
    Bridge.column(MinHashSignature(
      Bridge.expression(s, text), Bridge.expression(s, numHashes),
      Bridge.expression(s, shingleSize)))
  }

  def word_shingles(text: Column, shingleSize: Column): Column =
    binary(text, shingleSize, WordShingles)

  def gram_hashes(text: Column, n: Column): Column =
    binary(text, n, GramHashes)

  def winnow_fingerprints(text: Column, k: Column, w: Column): Column = {
    val s = activeSession
    Bridge.column(WinnowFingerprints(
      Bridge.expression(s, text), Bridge.expression(s, k),
      Bridge.expression(s, w)))
  }

  def profile_scores(text: Column, spec: Column, mode: Column): Column = {
    val s = activeSession
    Bridge.column(ProfileScores(
      Bridge.expression(s, text), Bridge.expression(s, spec),
      Bridge.expression(s, mode)))
  }

  def int8_pack(codes: Column): Column = {
    val s = activeSession
    Bridge.column(Int8Pack(Bridge.expression(s, codes)))
  }

  def q8_cosine_distance(codes: Column, mn: Column, scale: Column,
      query: Column): Column = {
    val s = activeSession
    Bridge.column(Q8CosineDistance(
      Bridge.expression(s, codes), Bridge.expression(s, mn),
      Bridge.expression(s, scale), Bridge.expression(s, query)))
  }

  private def activeSession: SparkSession =
    SparkSession.getActiveSession.getOrElse(
      throw new IllegalStateException("no active SparkSession"))

  private def binary(
      a: Column,
      b: Column,
      f: (org.apache.spark.sql.catalyst.expressions.Expression,
          org.apache.spark.sql.catalyst.expressions.Expression) =>
        org.apache.spark.sql.catalyst.expressions.Expression): Column = {
    val s = activeSession
    Bridge.column(f(Bridge.expression(s, a), Bridge.expression(s, b)))
  }

  /** Every graft SQL function: name → expression builder. Single
    * source of truth for session-level registration ([[register]])
    * and the [[graft.GraftExtensions]] injection path.
    */
  val builders: Seq[(String,
      Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression)] = Seq(
    "cosine_distance" -> (es => CosineDistance(es(0), es(1))),
    "cosine_similarity" -> (es => CosineSimilarity(es(0), es(1))),
    "cosine_distance_stored_norm" ->
      (es => CosineDistanceStoredNorm(es(0), es(1), es(2), es(3))),
    "dot_product" -> (es => DotProduct(es(0), es(1))),
    "l2_distance" -> (es => L2Distance(es(0), es(1))),
    "vector_norm" -> (es => VectorNorm(es(0))),
    "chunk_text" -> (es => ChunkText(es(0), es(1), es(2), es(3))),
    "token_count" -> (es => TokenCount(es(0))),
    "nfc_normalize" -> (es => NfcNormalize(es(0))),
    "simhash64" -> (es => SimHash64(es(0), es(1))),
    "minhash_signature" -> (es => MinHashSignature(es(0), es(1), es(2))),
    "word_shingles" -> (es => WordShingles(es(0), es(1))),
    "gram_hashes" -> (es => GramHashes(es(0), es(1))),
    "int8_pack" -> (es => Int8Pack(es(0))),
    "winnow_fingerprints" -> (es => WinnowFingerprints(es(0), es(1), es(2))),
    "profile_scores" -> (es => ProfileScores(es(0), es(1), es(2))),
    "q8_cosine_distance" -> (es => Q8CosineDistance(es(0), es(1), es(2), es(3))))

  /** Register all graft SQL functions on the given session. Idempotent. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      Bridge.registerFunction(spark, name, b)
    }
}
