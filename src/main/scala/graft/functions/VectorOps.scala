package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData

/** Tight-loop float-vector kernels over Catalyst [[ArrayData]].
  *
  * Static methods so generated code (whole-stage codegen) can call them
  * directly — the same pattern Spark's own higher-order functions use.
  * All accumulation is in Double for cross-engine determinism (the
  * DuckDB oracle also accumulates FLOAT[] math in double).
  *
  * Semantics mirror the reference's provisioned vector search: cosine
  * distance over float32 vectors (reference:
  * AzureCosmosDB/.../CosmosDBClientWrapper.cs:135-144 declares
  * float32/1536/cosine; we generalize to any dimension).
  */
object VectorOps extends Serializable {

  @inline private def checkDims(x: ArrayData, y: ArrayData): Int = {
    val n = x.numElements()
    if (n != y.numElements()) {
      throw new IllegalArgumentException(
        s"vector dimension mismatch: ${n} vs ${y.numElements()}")
    }
    n
  }

  def dot(x: ArrayData, y: ArrayData): Double = {
    val n = checkDims(x, y)
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getFloat(i).toDouble * y.getFloat(i); i += 1 }
    s
  }

  def norm(x: ArrayData): Double = {
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val v = x.getFloat(i).toDouble; s += v * v; i += 1 }
    math.sqrt(s)
  }

  /** 1 - cos(x, y); 1.0 when either vector has zero norm (degenerate). */
  def cosineDistance(x: ArrayData, y: ArrayData): Double = {
    val n = checkDims(x, y)
    var d = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val a = x.getFloat(i).toDouble
      val b = y.getFloat(i).toDouble
      d += a * b; nx += a * a; ny += b * b
      i += 1
    }
    val denom = math.sqrt(nx) * math.sqrt(ny)
    if (denom == 0.0) 1.0 else 1.0 - d / denom
  }

  def cosineSimilarity(x: ArrayData, y: ArrayData): Double =
    1.0 - cosineDistance(x, y)

  /** Cosine distance against a PRE-NORMALIZED double query vector
    * (|yn| = 1): accumulates only dot and |x| — one third fewer flops
    * per row than [[cosineDistance]]. Produced by the
    * [[graft.plans.PrenormalizeCosine]] optimizer rule for literal
    * probes; never constructed with an unnormalized right side.
    */
  def cosineDistancePrenorm(x: ArrayData, yn: ArrayData): Double = {
    val n = x.numElements()
    if (n != yn.numElements()) {
      throw new IllegalArgumentException(
        s"vector dimension mismatch: ${n} vs ${yn.numElements()}")
    }
    var d = 0.0; var nx = 0.0
    var i = 0
    while (i < n) {
      val a = x.getFloat(i).toDouble
      d += a * yn.getDouble(i); nx += a * a
      i += 1
    }
    val dn = math.sqrt(nx)
    if (dn == 0.0) 1.0 else 1.0 - d / dn
  }

  /** Pack int codes 0..255 (from Quantize.int8Codes) into bytes —
    * 4× less scan IO than the float vector for coarse search.
    */
  def packInt8(codes: ArrayData): Array[Byte] = {
    val n = codes.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) { out(i) = codes.getInt(i).toByte; i += 1 }
    out
  }

  /** Asymmetric quantized cosine distance: the stored side is int8
    * codes + (mn, scale), the query side stays float. One pass over
    * the byte array reconstructs each element as `mn + c*scale` in
    * double — algebraically identical to cosine over the dequantized
    * vector, without materializing it.
    */
  def q8CosineDistance(
      codes: Array[Byte], mn: Double, scale: Double, q: ArrayData): Double = {
    val n = codes.length
    if (n != q.numElements()) {
      throw new IllegalArgumentException(
        s"vector dimension mismatch: ${n} vs ${q.numElements()}")
    }
    var d = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val a = mn + (codes(i) & 0xff).toDouble * scale
      val b = q.getFloat(i).toDouble
      d += a * b; nx += a * a; ny += b * b
      i += 1
    }
    val denom = math.sqrt(nx) * math.sqrt(ny)
    if (denom == 0.0) 1.0 else 1.0 - d / denom
  }

  def l2Distance(x: ArrayData, y: ArrayData): Double = {
    val n = checkDims(x, y)
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = x.getFloat(i).toDouble - y.getFloat(i)
      s += d * d
      i += 1
    }
    math.sqrt(s)
  }
}
