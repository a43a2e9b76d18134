package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.cosine_distance
import graft.functions.VectorAggregates.vector_avg
import graft.functions.VectorOps

/** D17: distributed k-means (Lloyd's algorithm, cosine geometry) over
  * an embedding column — the full-corpus clustering operator that
  * [[Similarity.ivfCentroids]] (one Lloyd pass over a bounded sample)
  * and [[Dedup.semanticDedup]] approximate. Use this when the cell
  * model should reflect the WHOLE corpus distribution: IVF index
  * builds at high `nlist`, SemDeDup cell models, per-cluster corpus
  * summaries.
  *
  * Scale design: each iteration is ONE scan of the input. The centroid
  * set travels to executors as broadcast literals, assignment is a
  * per-row argmin over one distance array (array_position(min) — no
  * CASE-WHEN fold, no explode), and the per-cell update is a
  * fixed-size aggregate ([[vector_avg]] buffers: k cells × dim doubles
  * with map-side partial combine), so the exchange carries at most
  * k × partitions buffers — never a vector row. Driver state is
  * k × dim floats per iteration. Nothing in the loop depends on corpus
  * size except the scan itself.
  *
  * Determinism: init is the hash-ordered sample (deterministic in
  * (seed, ids)); per-cell double sums depend on partition layout in
  * the last ulp, so downstream contracts should treat centroids as
  * tolerance-equal (1e-5 is generous), not bit-equal — the d17 gate
  * pins agreement against [[fitDriver]] at that tolerance.
  *
  * Reference grounding: the reference provisions a quantized vector
  * index over its store (`AzureCosmosDB/csharp/DocumentVectorPipelineFunctions/CosmosDBClientWrapper.cs:119-128`);
  * k-means cell models are the training step behind every such
  * quantized/IVF layout (Lloyd 1982; Jégou/Douze/Schmid 2011 for the
  * PQ/IVF use).
  */
object KMeans {

  /** Fitted model: final centroids, iterations actually run, the
    * assignment cost (sum of cosine distance to the winning centroid)
    * measured under the centroids entering each iteration, and whether
    * the centroid movement dropped below tolerance before `maxIter`.
    */
  final case class Model(
      centroids: Seq[Seq[Float]],
      iterations: Int,
      costs: Seq[Double],
      converged: Boolean)

  /** Deterministic init: greedy farthest-first traversal (Gonzalez
    * 1985) over the `k*8` value-distinct hash-smallest vectors —
    * value-distinct because coinciding seed centroids can never
    * separate (same rule as the PQ codebook trainer), farthest-first
    * because two seeds landing in one tight mode is the classic Lloyd
    * local optimum and a spread-out start avoids it deterministically
    * where random restarts would not be. One scan + O(k² · 8) driver
    * distance evaluations. May return fewer than k centroids when the
    * input holds fewer distinct vectors.
    */
  def initCentroids(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      seed: Long = 42L): Array[Array[Float]] = {
    val sample = Quantize.hashSample(df, idCol, vecCol, k * 8, seed)
      .map(_.toSeq).distinct.map(_.toArray)
    if (sample.isEmpty) return Array.empty
    val chosen = scala.collection.mutable.ArrayBuffer(sample.head)
    val minD = Array.fill(sample.length)(Double.MaxValue)
    var exhausted = false
    while (chosen.length < math.min(k, sample.length) && !exhausted) {
      var bi = -1; var bd = -1.0
      var i = 0
      while (i < sample.length) {
        val d = math.min(minD(i),
          VectorOps.cosineDistance(sample(i), chosen.last))
        minD(i) = d
        if (d > bd) { bd = d; bi = i }
        i += 1
      }
      if (bd <= 0.0) exhausted = true // only coinciding vectors remain
      else chosen += sample(bi)
    }
    chosen.toArray
  }

  /** Per-row cell assignment for a fitted centroid set (ties → lowest
    * index, same as [[Similarity.nearestCentroid]]).
    */
  def assign(vec: Column, centroids: Seq[Seq[Float]]): Column =
    Similarity.nearestCentroid(vec, centroids)

  /** Distributed Lloyd iterations until centroid movement (max cosine
    * distance between a cell's old and new centroid) ≤ `tol` or
    * `maxIter` scans. Empty cells keep their previous centroid.
    * Centroid = plain per-cell mean (cosine assignment is
    * magnitude-invariant, so the spherical renormalization is a no-op
    * for semantics and is skipped, matching [[Similarity.ivfCentroids]]).
    */
  def fit(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      maxIter: Int = 10,
      tol: Double = 1e-4,
      seed: Long = 42L,
      init: Option[Array[Array[Float]]] = None): Model = {
    require(k >= 1, s"kmeans: k must be >= 1, got $k")
    require(maxIter >= 1, s"kmeans: maxIter must be >= 1, got $maxIter")
    val start = init.getOrElse(initCentroids(df, idCol, vecCol, k, seed))
    require(start.nonEmpty, "kmeans: empty input (no init centroids)")
    var cents: Array[Array[Float]] = start
    var costs = List.empty[Double]
    var it = 0
    var converged = false
    while (it < maxIter && !converged) {
      val distsOf = array(cents.toSeq.map(c =>
        cosine_distance(col("__v"), typedlit(c.toSeq))): _*)
      val update = df.select(col(vecCol).as("__v"))
        .withColumn("__ds", distsOf)
        .select(col("__v"),
          (array_position(col("__ds"), array_min(col("__ds"))) - 1)
            .cast("int").as("__cell"),
          array_min(col("__ds")).as("__d"))
        .groupBy("__cell")
        .agg(vector_avg(col("__v")).as("__mean"), sum(col("__d")).as("__cost"))
        .collect()
      costs ::= update.map(_.getDouble(2)).sum
      val next = cents.map(_.clone())
      update.foreach { r =>
        val cell = r.getInt(0)
        val mean = r.getSeq[Double](1)
        if (mean.nonEmpty) next(cell) = mean.map(_.toFloat).toArray
      }
      val movement = cents.indices
        .map(i => VectorOps.cosineDistance(cents(i), next(i))).max
      cents = next
      converged = movement <= tol
      it += 1
    }
    Model(cents.map(_.toSeq).toSeq, it, costs.reverse, converged)
  }

  /** The same loop over an in-memory array (single-threaded, driver
    * math) — the cross-implementation witness the d17 gate compares
    * [[fit]] against, and a unit-test oracle. Identical update rule,
    * identical convergence rule; differs only in where the sums run.
    */
  def fitDriver(
      vectors: Array[Array[Float]],
      init: Array[Array[Float]],
      maxIter: Int = 10,
      tol: Double = 1e-4): Model = {
    require(vectors.nonEmpty && init.nonEmpty,
      "kmeans: empty input or init")
    val dim = vectors.head.length
    var cents = init.map(_.clone())
    var costs = List.empty[Double]
    var it = 0
    var converged = false
    while (it < maxIter && !converged) {
      val sums = Array.fill(cents.length)(new Array[Double](dim))
      val counts = new Array[Long](cents.length)
      var cost = 0.0
      vectors.foreach { v =>
        var bestI = 0; var bestD = Double.MaxValue
        var i = 0
        while (i < cents.length) {
          val d = VectorOps.cosineDistance(v, cents(i))
          if (d < bestD) { bestD = d; bestI = i }
          i += 1
        }
        cost += bestD
        counts(bestI) += 1
        var j = 0
        while (j < dim) { sums(bestI)(j) += v(j); j += 1 }
      }
      costs ::= cost
      val next = cents.indices.map { i =>
        if (counts(i) == 0) cents(i)
        else sums(i).map(x => (x / counts(i)).toFloat)
      }.toArray
      val movement = cents.indices
        .map(i => VectorOps.cosineDistance(cents(i), next(i))).max
      cents = next
      converged = movement <= tol
      it += 1
    }
    Model(cents.map(_.toSeq).toSeq, it, costs.reverse, converged)
  }
}
