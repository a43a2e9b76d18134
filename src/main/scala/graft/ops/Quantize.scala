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

  /** D8e: the matryoshka prefix column — materialize the first
    * `prefixDim` components as their own column so the coarse stage's
    * scan reads `prefixDim/dim` of the vector bytes (column pruning
    * does the work; slicing at query time would still read the full
    * vector column). Matryoshka-trained embeddings (Kusupati et al.
    * 2022, arXiv:2205.13147) make the prefix a faithful coarse scorer
    * BY TRAINING; for arbitrary embeddings it is a lossy-but-cheap
    * first pass like int8/PQ/BQ, with recall recovered by the rerank
    * cut.
    */
  def withPrefixColumn(
      df: DataFrame,
      vecCol: String,
      prefixDim: Int): DataFrame = {
    require(prefixDim >= 1, s"prefixDim must be >= 1, got $prefixDim")
    df.withColumn("vec_prefix", slice(col(vecCol), 1, prefixDim))
  }

  /** D8e: truncated-prefix two-stage top-k — coarse rank by cosine
    * over the first `prefixDim` components (TakeOrderedAndProject over
    * the narrow prefix column), exact rerank of the `rerank`
    * survivors. Same two-stage determinism contract as
    * [[topKQuantized]]: round-6 + id tiebreak at the coarse boundary
    * so the candidate cut is engine-reproducible.
    */
  def topKPrefix(
      indexed: DataFrame,
      queryVec: Seq[Float],
      k: Int,
      idCol: String,
      vecCol: String = "embedding",
      prefixDim: Int = 16,
      rerank: Int = 0): DataFrame = {
    val r = if (rerank > 0) rerank else math.max(4 * k, 32)
    val qp = typedlit(queryVec.take(prefixDim))
    val q = typedlit(queryVec)
    indexed
      .withColumn("prefix_dist",
        round(cosine_distance(col("vec_prefix"), qp), 6))
      .orderBy(col("prefix_dist"), col(idCol))
      .limit(r)
      .withColumn("dist", round(cosine_distance(col(vecCol), q), 6) + lit(0.0))
      .orderBy(col("dist"), col(idCol))
      .limit(k)
      .drop("prefix_dist", "vec_prefix")
  }

  // ---------------------------------------------------------------
  // Product quantization (Jégou/Douze/Schmid, TPAMI'11): the vector
  // splits into m subvectors, each coded as its nearest of ks learned
  // subspace centroids — dim floats compress to m small codes
  // (m=8, ks=16 ⇒ 64 floats → 8 codes, 32× smaller than float32),
  // and query distance is approximated asymmetrically (ADC) by one
  // table lookup per subspace. Complements the scalar int8 scheme:
  // PQ adapts to the data distribution and compresses much harder,
  // at the cost of a trained codebook.
  // ---------------------------------------------------------------

  /** A trained PQ codebook: `codebook(sub)(centroid)` is a subDim-dim
    * centroid. Driver-side size m × ks × subDim floats (m=8 ks=16
    * subDim=8 ⇒ 4 KB) — broadcast as literals into the encode/query
    * expressions, never a shuffle.
    */
  final case class PqModel(
      m: Int,
      ks: Int,
      subDim: Int,
      codebook: Seq[Seq[Seq[Float]]])

  private def l2sq(a: Array[Float], b: Seq[Float]): Double = {
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** Train a PQ codebook from a deterministic hash-ordered sample of
    * the base (ONE TakeOrderedAndProject scan, same index-build shape
    * as the IVF centroids): per subspace, k-means with `lloydIters`
    * Lloyd passes over the sampled subvectors. Driver state = sample
    * (ks × 64 rows) + codebook; independent of base size.
    */
  /** Deterministic hash-ordered vector sample (ONE
    * TakeOrderedAndProject scan — the shared index-build shape).
    */
  private[ops] def hashSample(
      base: DataFrame,
      idCol: String,
      vecCol: String,
      n: Int,
      seed: Long): Array[Array[Float]] = base
    .select(col(idCol).as("id"), col(vecCol).as("v"))
    .orderBy(xxhash64(col("id"), lit(seed)), col("id"))
    .limit(n)
    .select("v").collect().map(_.getSeq[Float](0).toArray)

  /** Per-subspace k-means over an in-memory sample → PQ codebook. */
  private[ops] def kmeansCodebook(
      sample: Array[Array[Float]],
      m: Int,
      ks: Int,
      lloydIters: Int): PqModel = {
    require(sample.nonEmpty, "kmeansCodebook: empty sample")
    val dim = sample.head.length
    require(dim % m == 0, s"kmeansCodebook: dim $dim not divisible by m=$m")
    val subDim = dim / m
    val codebook = (0 until m).map { sub =>
      val vecs = sample.map(_.slice(sub * subDim, (sub + 1) * subDim))
      // dedupe by VALUE (Array equality is referential — a plain
      // .distinct would keep duplicates, seeding k-means with
      // coinciding centroids that never separate)
      var cents: Array[Array[Float]] =
        vecs.map(_.toSeq).distinct.take(ks).map(_.toArray)
          .padTo(ks, vecs.head.clone())
      var iter = 0
      while (iter < lloydIters) {
        val sums = Array.fill(ks)(new Array[Double](subDim))
        val counts = new Array[Long](ks)
        vecs.foreach { v =>
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < ks) {
            val d = l2sq(v, cents(c).toSeq)
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          counts(best) += 1
          var j = 0
          while (j < subDim) { sums(best)(j) += v(j); j += 1 }
        }
        cents = cents.zipWithIndex.map { case (old, c) =>
          if (counts(c) == 0) old
          else sums(c).map(x => (x / counts(c)).toFloat)
        }
        iter += 1
      }
      cents.map(_.toSeq).toSeq
    }
    PqModel(m, ks, subDim, codebook)
  }

  def trainPq(
      base: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int = 8,
      ks: Int = 16,
      seed: Long = 42L,
      lloydIters: Int = 5): PqModel =
    kmeansCodebook(hashSample(base, idCol, vecCol, ks * 64, seed),
      m, ks, lloydIters)

  /** Train a PQ codebook on RESIDUALS against a coarse-quantizer
    * centroid set (the IVF-PQ composition): each sampled vector is
    * assigned to its nearest coarse centroid driver-side and the
    * per-subspace k-means runs over `v - centroid`. Residuals carry
    * far less variance than raw vectors, so the same ks yields lower
    * quantization error inside each cell.
    */
  def trainPqResiduals(
      base: DataFrame,
      idCol: String,
      vecCol: String,
      coarseCentroids: Seq[Seq[Float]],
      m: Int = 8,
      ks: Int = 16,
      seed: Long = 42L,
      lloydIters: Int = 5): PqModel = {
    val sample = hashSample(base, idCol, vecCol, ks * 64, seed)
    trainPqResidualsFromSample(sample, coarseCentroids, m, ks, lloydIters)
  }

  /** [[trainPqResiduals]] over an already-collected hash sample (see
    * [[graft.ops.Similarity.ivfCentroidsFromSample]] — prefix-take of
    * a wider sample is bit-identical to sampling at this width).
    */
  private[ops] def trainPqResidualsFromSample(
      sampleIn: Array[Array[Float]],
      coarseCentroids: Seq[Seq[Float]],
      m: Int,
      ks: Int,
      lloydIters: Int): PqModel = {
    val sample = sampleIn.take(ks * 64)
    val residuals = sample.map { v =>
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < coarseCentroids.length) {
        val d = graft.functions.VectorOps.cosineDistance(
          v, coarseCentroids(c).toArray)
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      val cent = coarseCentroids(best)
      v.indices.map(i =>
        v(i) - (if (i < cent.length) cent(i) else 0f)).toArray
    }
    kmeansCodebook(residuals, m, ks, lloydIters)
  }

  /** Per-row PQ codes: for each subspace, the index of the nearest
    * codebook centroid — an `array_position(array_min)` argmin over a
    * ks-element distance array (never a CASE-WHEN fold), the subvector
    * bound once per row. Output: ARRAY<INT> of length m.
    */
  def pqCodes(vec: Column, model: PqModel): Column =
    array((0 until model.m).map { sub =>
      bound(slice(vec, sub * model.subDim + 1, model.subDim)) { sv =>
        bound(array(model.codebook(sub).map(c =>
          graft.functions.GraftFunctions.l2_distance(sv, typedlit(c))): _*)) {
          dists => (array_position(dists, array_min(dists)) - 1).cast("int")
        }
      }
    }: _*)

  /** Asymmetric (ADC) distance: the query precomputes one L2² lookup
    * table per subspace ON THE DRIVER (m × ks doubles); per row the
    * distance is m `element_at` lookups summed — no float vector is
    * read in the coarse stage.
    */
  def pqAdcDistance(codes: Column, model: PqModel, query: Seq[Float]): Column = {
    val q = query.toArray
    val tables: Seq[Seq[Double]] = (0 until model.m).map { sub =>
      val sv = q.slice(sub * model.subDim, (sub + 1) * model.subDim)
      model.codebook(sub).map(c => l2sq(sv, c))
    }
    (0 until model.m).map { sub =>
      element_at(typedlit(tables(sub)),
        element_at(codes, sub + 1) + lit(1))
    }.reduce(_ + _)
  }

  /** Materialize the PQ code column next to the vectors (written once,
    * scanned by every query's coarse stage — 32× fewer bytes than the
    * float column at m=8).
    */
  def withPqCodes(df: DataFrame, vecCol: String, model: PqModel): DataFrame =
    df.withColumn("pq_codes", pqCodes(col(vecCol), model))

  /** Reconstructed (decoded) vector from PQ codes: per subspace one
    * `element_at` into the codebook literal, flattened — no float
    * column read.
    */
  def pqReconstruct(codes: Column, model: PqModel): Column =
    flatten(array((0 until model.m).map(sub =>
      element_at(typedlit(model.codebook(sub)),
        element_at(codes, sub + 1) + lit(1))): _*))

  // ---------------------------------------------------------------
  // Binary (1-bit) quantization: each dimension collapses to its sign
  // against a per-dimension center (the sample mean), packed 64 bits
  // per long — 32× smaller than float32. Hamming distance (XOR +
  // popcount) then approximates angular order: mean-centered sign
  // bits are the axis-aligned cousin of Charikar's hyperplane bits
  // (SIGMOD'02), and the XOR/popcount coarse stage is pure integer
  // codegen — the cheapest possible first cut, rerank recovers
  // exactness. Model state: dim floats (256 B at dim=64).
  // ---------------------------------------------------------------

  /** Per-dimension centering vector for sign-bit codes. */
  final case class BqModel(center: Seq[Float]) {
    require(center.nonEmpty, "BqModel: empty center")
    def words: Int = (center.length + 63) / 64
  }

  /** Train = per-dimension mean over the deterministic hash-ordered
    * sample (ONE TakeOrderedAndProject scan, the shared index-build
    * shape; driver state = dim doubles).
    */
  def trainBq(
      base: DataFrame,
      idCol: String,
      vecCol: String,
      seed: Long = 42L,
      sampleN: Int = 1024): BqModel = {
    val sample = hashSample(base, idCol, vecCol, sampleN, seed)
    require(sample.nonEmpty, "trainBq: empty sample")
    val dim = sample.head.length
    val sums = new Array[Double](dim)
    sample.foreach { v =>
      require(v.length == dim, s"trainBq: mixed dims ${v.length} vs $dim")
      var i = 0
      while (i < dim) { sums(i) += v(i); i += 1 }
    }
    BqModel(sums.toSeq.map(s => (s / sample.length).toFloat))
  }

  /** Packed sign-bit codes: per 64-dim word, an MSB-first fold of
    * (x_i > center_i) — pure HOFs (slice + zip_with + aggregate), so
    * encoding is whole-stage codegen with the center as a literal.
    */
  def bqCodes(vec: Column, model: BqModel): Column =
    array((0 until model.words).map { w =>
      val lo = w * 64
      val n = math.min(64, model.center.length - lo)
      aggregate(
        zip_with(slice(vec, lo + 1, n),
          typedlit(model.center.slice(lo, lo + n)),
          (x, c) => (x > c).cast("long")),
        // shift+or, not acc*2+b: the multiply that sets the sign bit
        // is an ANSI long overflow; shifts carry no overflow check
        lit(0L), (acc, b) => shiftleft(acc, 1).bitwiseOR(b))
    }: _*)

  /** Driver-side twin of [[bqCodes]] for encoding the probe vector —
    * must fold in exactly the same MSB-first order (QuantizeSpec pins
    * bit-agreement between the two).
    */
  def bqEncode(v: Seq[Float], model: BqModel): Seq[Long] = {
    require(v.length == model.center.length,
      s"bqEncode: dim ${v.length} vs model ${model.center.length}")
    (0 until model.words).map { w =>
      var acc = 0L
      var i = w * 64
      val end = math.min(v.length, w * 64 + 64)
      while (i < end) {
        acc = (acc << 1) | (if (v(i) > model.center(i)) 1L else 0L)
        i += 1
      }
      acc
    }
  }

  /** Hamming distance between two packed code arrays: XOR + popcount
    * per word, summed — integer arithmetic end to end (no float ties,
    * no rounding concerns).
    */
  def hammingDistance(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y)).cast("long")),
      lit(0L), (acc, d) => acc + d)

  /** Materialize the packed binary code column (written once; the
    * coarse stage of every query reads 1/32 of the float bytes).
    */
  def withBqCodes(df: DataFrame, vecCol: String, model: BqModel): DataFrame =
    df.withColumn("bq_codes", bqCodes(col(vecCol), model))

  /** Two-stage binary top-k: Hamming-ranked coarse cut
    * (TakeOrderedAndProject over the packed longs), exact cosine
    * rerank of the survivors — [[topKQuantized]]'s shape at 1 bit per
    * dimension.
    */
  def topKBinary(
      indexed: DataFrame,
      model: BqModel,
      queryVec: Seq[Float],
      k: Int,
      idCol: String,
      vecCol: String = "embedding",
      rerank: Int = 0): DataFrame = {
    val r = if (rerank > 0) rerank else math.max(4 * k, 32)
    val q = typedlit(queryVec)
    indexed
      .withColumn("bq_dist",
        hammingDistance(col("bq_codes"), typedlit(bqEncode(queryVec, model))))
      .orderBy(col("bq_dist"), col(idCol))
      .limit(r)
      .withColumn("dist", round(cosine_distance(col(vecCol), q), 6) + lit(0.0))
      .orderBy(col("dist"), col(idCol))
      .limit(k)
      .drop("bq_dist")
  }

  /** Two-stage PQ top-k: ADC-ranked coarse cut (TakeOrderedAndProject
    * over the code column), exact cosine rerank of the survivors —
    * same shape as [[topKQuantized]] with a far smaller coarse scan.
    */
  def topKPq(
      indexed: DataFrame,
      model: PqModel,
      queryVec: Seq[Float],
      k: Int,
      idCol: String,
      vecCol: String = "embedding",
      rerank: Int = 0): DataFrame = {
    val r = if (rerank > 0) rerank else math.max(4 * k, 32)
    val q = typedlit(queryVec)
    indexed
      .withColumn("pq_dist",
        round(pqAdcDistance(col("pq_codes"), model, queryVec), 6))
      .orderBy(col("pq_dist"), col(idCol))
      .limit(r)
      .withColumn("dist", round(cosine_distance(col(vecCol), q), 6) + lit(0.0))
      .orderBy(col("dist"), col(idCol))
      .limit(k)
      .drop("pq_dist")
  }
}
