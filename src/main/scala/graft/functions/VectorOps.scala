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

  /** Cosine distance with the query's norm precomputed at plan time
    * ([[graft.plans.PrenormalizeCosine]]): skips the per-row ny
    * accumulation — a third fewer flops — while staying BIT-IDENTICAL
    * to [[cosineDistance]]: d and nx accumulate in the same order over
    * the same values, and `sqrtNy` is `sqrt(Σ y²)` folded with that
    * exact accumulation (see [[norm]]), so `sqrt(nx) * sqrtNy` equals
    * the original `sqrt(nx) * sqrt(ny)` to the last ulp. Conformance
    * results therefore cannot drift when the rule fires.
    */
  def cosineDistanceKnownNorm(x: ArrayData, y: ArrayData, sqrtNy: Double): Double = {
    val n = checkDims(x, y)
    var d = 0.0; var nx = 0.0
    var i = 0
    while (i < n) {
      val a = x.getFloat(i).toDouble
      d += a * y.getFloat(i); nx += a * a
      i += 1
    }
    val denom = math.sqrt(nx) * sqrtNy
    if (denom == 0.0) 1.0 else 1.0 - d / denom
  }

  /** Cosine distance with BOTH norms precomputed — the stored-norm
    * read path (roadmap extension of [[cosineDistanceKnownNorm]]): the
    * table carries a materialized `vector_norm(embedding)` column
    * written at ingest, the probe's norm folds at plan time, and the
    * per-row work collapses to the dot product alone (the minimum any
    * cosine scan can do). BIT-IDENTICAL to [[cosineDistance]] when
    * `sqrtNx`/`sqrtNy` come from [[norm]]: d accumulates in the same
    * order over the same values, and `norm` folds `sqrt(Σ v²)` with
    * exactly the accumulation [[cosineDistance]] uses, so
    * `sqrtNx * sqrtNy` reproduces `sqrt(nx) * sqrt(ny)` to the last
    * ulp — conformance hashes cannot drift between the two paths.
    */
  def cosineDistanceStoredNorm(
      x: ArrayData, y: ArrayData, sqrtNx: Double, sqrtNy: Double): Double = {
    val n = checkDims(x, y)
    var d = 0.0
    var i = 0
    while (i < n) { d += x.getFloat(i).toDouble * y.getFloat(i); i += 1 }
    val denom = sqrtNx * sqrtNy
    if (denom == 0.0) 1.0 else 1.0 - d / denom
  }

  /** Driver-side flavor of [[cosineDistance]] over plain float arrays
    * (bounded samples: IVF centroid Lloyd pass). Same contracts as the
    * ArrayData overload: dimension mismatch throws, zero norm → 1.0.
    */
  def cosineDistance(x: Array[Float], y: Array[Float]): Double = {
    if (x.length != y.length) {
      throw new IllegalArgumentException(
        s"vector dimension mismatch: ${x.length} vs ${y.length}")
    }
    val n = x.length
    var d = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val a = x(i).toDouble; val b = y(i).toDouble
      d += a * b; nx += a * a; ny += b * b
      i += 1
    }
    val denom = math.sqrt(nx) * math.sqrt(ny)
    if (denom == 0.0) 1.0 else 1.0 - d / denom
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
