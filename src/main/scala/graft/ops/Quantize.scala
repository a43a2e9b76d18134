package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.{bound, cosine_distance, int8_pack, q8_cosine_distance}

/** Scalar (int8) vector quantization — the storage/bandwidth scheme
  * behind the reference's vector index (`VectorIndexType.QuantizedFlat`,
  * AzureCosmosDB/.../CosmosDBClientWrapper.cs:123): each vector's
  * range [min, max] maps linearly onto 0..255, cutting embedding bytes
  * 4× with reconstruction error bounded by scale/2 per element.
  *
  * Pure column expressions (codegen-compatible HOFs, no UDFs); `bound`
  * evaluates min/scale once per row. `floor(x + 0.5)` rather than
  * `round` because round's half-case tie-breaking differs across
  * engines and the codes must be bit-identical for the oracle.
  */
object Quantize {

  /** Per-element int8 codes (0..255) for a float vector. */
  def int8Codes(v: Column): Column =
    bound(array_min(v).cast("double")) { mn =>
      bound(quantScale(v)) { scale =>
        transform(v, x =>
          floor((x.cast("double") - mn) / scale + lit(0.5)).cast("int"))
      }
    }

  /** The per-vector quantization step; 1.0 for constant vectors (all
    * codes 0, zero error) to avoid a 0/0.
    */
  def quantScale(v: Column): Column =
    bound((array_max(v).cast("double") - array_min(v).cast("double")) / 255.0) {
      s => when(s === 0.0, lit(1.0)).otherwise(s)
    }

  /** Reconstructed vector from codes produced by [[int8Codes]]. */
  def dequantize(codes: Column, mn: Column, scale: Column): Column =
    transform(codes, c => (mn + c.cast("double") * scale))

  /** Max absolute round-trip error of quantizing `v` — by construction
    * ≤ scale/2.
    */
  def maxRoundTripError(v: Column): Column =
    bound(array_min(v).cast("double")) { mn =>
      bound(quantScale(v)) { scale =>
        array_max(transform(v, x =>
          abs(mn + floor((x.cast("double") - mn) / scale + lit(0.5)) * scale
            - x.cast("double"))))
      }
    }

  /** Materialize the quantized index columns for `vecCol`: packed
    * byte codes + per-row (mn, scale). The codes column is 1/4 the
    * vector's bytes — at 100 TB the coarse search stage scans 25 TB
    * instead of 100 (plus two doubles a row); typically written once
    * next to the embeddings.
    */
  def withIndexColumns(df: DataFrame, vecCol: String): DataFrame =
    df.withColumn("q8_mn", array_min(col(vecCol)).cast("double"))
      .withColumn("q8_scale", quantScale(col(vecCol)))
      .withColumn("q8_codes", int8_pack(int8Codes(col(vecCol))))

  /** Two-stage top-k: a coarse pass ranks the PACKED codes by
    * asymmetric quantized distance (TakeOrderedAndProject — bounded
    * per-partition heaps over the 4×-smaller column), then the
    * `rerank` survivors are scored exactly on the float vectors.
    * Recall loss is bounded by the scale/2 reconstruction error; a
    * `rerank` of a few × k recovers it in practice (QuantizeSpec).
    */
  def topKQuantized(
      indexed: DataFrame,
      queryVec: Seq[Float],
      k: Int,
      idCol: String,
      vecCol: String = "embedding",
      rerank: Int = 0): DataFrame = {
    val r = if (rerank > 0) rerank else math.max(4 * k, 32)
    val q = typedlit(queryVec)
    indexed
      // round-6 before the cut: cross-engine double parity is only
      // validated at that grain, so a raw-double boundary at rank r
      // could pick different survivors per engine; rounding + the id
      // tiebreak makes the candidate set deterministic everywhere
      .withColumn("q8_dist",
        round(q8_cosine_distance(
          col("q8_codes"), col("q8_mn"), col("q8_scale"), q), 6))
      .orderBy(col("q8_dist"), col(idCol))
      .limit(r)
      .withColumn("dist", round(cosine_distance(col(vecCol), q), 6) + lit(0.0))
      .orderBy(col("dist"), col(idCol))
      .limit(k)
      .drop("q8_dist")
  }
}
