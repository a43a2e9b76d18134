package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.bound

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
}
