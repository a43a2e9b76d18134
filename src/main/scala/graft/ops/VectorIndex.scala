package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.{cosine_distance, q8_cosine_distance}

/** Persistent vector-index lifecycle (SURVEY B2/D3's at-scale form).
  *
  * The reference provisions its vector index ONCE when the container
  * is created (`AzureCosmosDB/.../CosmosDBClientWrapper.cs:119-144`:
  * a `VectorIndexType.QuantizedFlat` index policy on the embedding
  * path) and every query thereafter reuses it. The transient operators
  * ([[Similarity.ivfPqAnnJoin]], [[Similarity.lshAnnJoin]],
  * [[Quantize.topKQuantized]]) retrain centroids/codebooks and
  * recompute per-row codes on every call — correct, but at 100 TB
  * retrain-per-query is the difference between an index and a scan.
  *
  * `build*` runs the one-scan training (IVF centroids + residual PQ
  * codebook; LSH is oblivious to the data, scalar int8 is model-free),
  * materializes the per-row index columns next to the float vectors as
  * ONE Parquet table, and stamps the trained model + parameters into a
  * `_graft_vector_index` sidecar (the same stamp-and-validate pattern
  * as the [[graft.pipeline.StreamingDedup]] signature store: probing
  * an index with the wrong parameters must fail loudly, not silently
  * return garbage). `query*` loads the stamp — KB-scale driver state,
  * no Spark job — and runs the SAME search shapes as the transient
  * operators, so a prebuilt index answers bit-identically to the
  * retrain path while touching none of the training inputs.
  *
  * Scale design per kind:
  *  - `ivfpq`: data partitioned BY CELL — a probe visits nprobe cells,
  *    so partition pruning (static via the broadcast cell list, or
  *    dynamic) skips the other nlist−nprobe directories entirely; the
  *    coarse stage column-prunes to (nn_id, cell, pq) (m bytes a row),
  *    floats are decoded only by the candidate-bounded rerank join.
  *  - `lsh`: the exploded band table partitioned by (tbl, bucket) —
  *    probes read only their (multi-probed) buckets.
  *  - `q8`: flat table; the coarse pass column-prunes to the packed
  *    codes (¼ of the float bytes) + two doubles, rerank joins floats
  *    back for the survivors.
  */
object VectorIndex {

  private val Version = "graft-vector-index v1"
  private val StampName = "_graft_vector_index"

  /** The stamp: everything a query needs to reuse the index without
    * touching the training inputs. Driver-side KBs (nlist×dim floats +
    * m×ks×subDim codebook).
    */
  final case class Meta(
      kind: String,
      idCol: String,
      vecCol: String,
      dim: Int,
      seed: Long,
      nlist: Int,
      numPlanes: Int,
      numTables: Int,
      centroids: Seq[Seq[Float]],
      pq: Option[Quantize.PqModel])

  private[ops] def dataPath(path: String) = s"$path/data"

  // ----------------------------------------------------------------
  // build
  // ----------------------------------------------------------------

  /** Train (one TakeOrderedAndProject sample scan) and materialize an
    * IVF-PQ index for `base` at `path`: per row (nn_id, cell, pq
    * codes, float vec), partitioned by cell; centroids + codebook in
    * the stamp. Overwrites any previous index at `path`.
    *
    * ks SIZING: training cost is paid ONCE here and amortized over
    * every query, so prefer 8-bit codes (ks=256) for a served corpus
    * — measured recall@10 at 20k×64d: 0.49 (ks=16, rerank=96) →
    * 0.94 (ks=256, rerank=256) at sub-second query latency
    * (BENCH_NOTES round 13). The ks=16 default mirrors the transient
    * [[Similarity.ivfPqAnnJoin]] for result parity in the d3e gate.
    */
  def buildIvfPq(
      base: DataFrame,
      path: String,
      idCol: String,
      vecCol: String,
      nlist: Int = 16,
      m: Int = 8,
      ks: Int = 16,
      seed: Long = 42L): Unit = {
    // ONE hash-sample scan serves both centroid and PQ training: the
    // sample order is the deterministic hash total order, so prefix
    // takes reproduce each trainer's own sample bit-identically (d3e
    // pins build ≡ transient-retrain on exactly this property)
    val sample = Quantize.hashSample(base, idCol, vecCol,
      math.max(nlist * 64, ks * 64), seed)
    val cents = Similarity.ivfCentroidsFromSample(sample, nlist)
    val model = Quantize.trainPqResidualsFromSample(sample, cents,
      m, ks, lloydIters = 5)
    val spark = base.sparkSession
    unstamp(spark, path)
    Similarity.ivfPqIndexFrame(base, idCol, vecCol, cents, model,
        keepVec = true)
      .write.mode(SaveMode.Overwrite).partitionBy("cell")
      .parquet(dataPath(path))
    stamp(spark, path, Meta("ivfpq", idCol, vecCol,
      cents.headOption.map(_.length).getOrElse(0), seed, nlist, 0, 0,
      cents, Some(model)))
  }

  /** Materialize a scalar int8 index (model-free: per-row min/scale +
    * packed codes next to the floats).
    */
  def buildQ8(
      base: DataFrame,
      path: String,
      idCol: String,
      vecCol: String): Unit = {
    val spark = base.sparkSession
    unstamp(spark, path)
    Quantize.withIndexColumns(
        base.select(col(idCol), col(vecCol)), vecCol)
      .write.mode(SaveMode.Overwrite).parquet(dataPath(path))
    stamp(spark, path, Meta("q8", idCol, vecCol, 0, 0L, 0, 0, 0,
      Seq.empty, None))
  }

  /** Materialize a hyperplane-LSH index: the exploded band table
    * (nn_id, vec, tbl, bucket) partitioned by (tbl, bucket) so probes
    * prune to their buckets. Plane geometry is deterministic in
    * (seed, dim, numPlanes) and lives in the stamp as parameters — no
    * trained state.
    */
  def buildLsh(
      base: DataFrame,
      path: String,
      idCol: String,
      vecCol: String,
      dim: Int,
      numPlanes: Int = 8,
      numTables: Int = 1,
      seed: Long = 42L): Unit = {
    require(numTables >= 1, s"numTables=$numTables")
    val spark = base.sparkSession
    unstamp(spark, path)
    base.select(col(idCol).as("nn_id"), col(vecCol).as("bv"),
        posexplode(Similarity.lshTableBuckets(col(vecCol), dim, numPlanes,
          seed, numTables)).as(Seq("tbl", "bucket")))
      .write.mode(SaveMode.Overwrite).partitionBy("tbl", "bucket")
      .parquet(dataPath(path))
    stamp(spark, path, Meta("lsh", idCol, vecCol, dim, seed, 0,
      numPlanes, numTables, Seq.empty, None))
  }

  /** Incrementally add rows to an existing index WITHOUT retraining:
    * the stamp's model (centroids + codebook / plane geometry / int8
    * scheme) encodes the new rows exactly as the build did, and the
    * encoded rows append to the data table in the same partition
    * layout. This is the ingest-time half of the provisioned-index
    * contract — the reference's store indexes each upserted document
    * as it arrives against the index policy fixed at provisioning
    * (`CosmosDBClientWrapper.cs:119-144`); it never retrains.
    *
    * Consequences, by design:
    *  - append is O(new rows) — the existing data and the training
    *    inputs are never read (IndexSpec proves it with both deleted);
    *  - append order and batching don't matter: any split of the same
    *    rows yields an identical index (same model, row-local codes);
    *  - the model drifts from the data as the corpus grows — quantize
    *    error can rise, but RESULTS stay exactly reproducible; rebuild
    *    on a maintenance cadence when recall degrades (the same
    *    rebuild-vs-probe trade the StreamingDedup store documents).
    *
    * Ids are the caller's contract (append-only, like A18): appending
    * an existing id yields two index rows for it.
    */
  def append(rows: DataFrame, path: String): Unit = {
    val spark = rows.sparkSession
    val meta = loadAny(spark, path)
    meta.kind match {
      case "ivfpq" =>
        Similarity.ivfPqIndexFrame(rows, meta.idCol, meta.vecCol,
            meta.centroids, meta.pq.get, keepVec = true)
          .write.mode(SaveMode.Append).partitionBy("cell")
          .parquet(dataPath(path))
      case "q8" =>
        Quantize.withIndexColumns(
            rows.select(col(meta.idCol), col(meta.vecCol)), meta.vecCol)
          .write.mode(SaveMode.Append).parquet(dataPath(path))
      case "lsh" =>
        rows.select(col(meta.idCol).as("nn_id"),
            col(meta.vecCol).as("bv"),
            posexplode(Similarity.lshTableBuckets(col(meta.vecCol),
              meta.dim, meta.numPlanes, meta.seed, meta.numTables))
              .as(Seq("tbl", "bucket")))
          .write.mode(SaveMode.Append).partitionBy("tbl", "bucket")
          .parquet(dataPath(path))
      case other =>
        throw new IllegalArgumentException(
          s"index at $path has unknown kind '$other'")
    }
  }

  // ----------------------------------------------------------------
  // delete — tombstones + query-time anti-join + physical compaction
  // ----------------------------------------------------------------

  private[ops] def tombPath(path: String) = s"$path/tombstones"

  /** The data table's id column name: the ivfpq/lsh layouts rename the
    * id to `nn_id` at build time; q8 keeps the caller's column.
    */
  private[ops] def dataIdCol(meta: Meta): String =
    if (meta.kind == "q8") meta.idCol else "nn_id"

  /** Mark ids as deleted: O(ids) — the id set appends to a
    * `tombstones/` sidecar and every query path anti-joins it before
    * scoring, so a deleted row stops serving results IMMEDIATELY.
    * This closes the read-path gap the reference's store never has
    * (its vector index lives ON the container, so a document delete
    * is index-consistent by construction —
    * `AzureCosmosDB/.../CosmosDBClientWrapper.cs:112-152`); an
    * append-only external index without tombstones would keep serving
    * a deleted document until a full rebuild.
    *
    * The index data itself is untouched until [[compact]] physically
    * drops the rows on a maintenance cadence — the same
    * tombstone-then-compact cycle every LSM/lakehouse delete uses.
    * Ids are cast to the data table's id type so the anti-join can
    * never silently type-mismatch. Deleting an absent id is a no-op;
    * deletes are idempotent.
    */
  def delete(ids: DataFrame, path: String): Unit = {
    val spark = ids.sparkSession
    val meta = loadAny(spark, path)
    val idName = dataIdCol(meta)
    val idType = spark.read.parquet(dataPath(path)).schema(idName).dataType
    ids.select(col(ids.columns.head).cast(idType).as(idName)).distinct()
      .write.mode(SaveMode.Append).parquet(tombPath(path))
  }

  /** Anti-join `df` against the tombstone set (no tombstones → `df`
    * unchanged). Broadcast by design: tombstones accumulate only
    * between maintenance compactions, so the set is
    * deletion-rate-bounded — KBs of ids, never corpus-scale.
    */
  private def notDeleted(spark: SparkSession, path: String,
      df: DataFrame, idName: String): DataFrame = {
    val p = new Path(tombPath(path))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p))
      df.join(
        broadcast(spark.read.parquet(tombPath(path)).toDF(idName).distinct()),
        Seq(idName), "left_anti")
    else df
  }

  /** Physically drop tombstoned rows: stage a filtered rewrite of the
    * data table in the SAME partition layout, swap directories, then
    * clear the tombstones. Queries are answer-identical before and
    * after (the anti-join already hid the rows); compaction reclaims
    * the bytes and shrinks the tombstone set back to zero. Staged-swap
    * failure contract as everywhere else: the live table is renamed
    * aside (never deleted) until the swap succeeds — a failure leaves
    * old or new, not a mix. Because row codes are row-local and the
    * model lives in the stamp, the compacted table is bit-identical to
    * encoding the surviving rows directly (IndexSpec pins it).
    */
  def compact(spark: SparkSession, path: String): Unit = {
    val meta = loadAny(spark, path)
    val tomb = new Path(tombPath(path))
    val fs = tomb.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(tomb)) return
    val idName = dataIdCol(meta)
    val live = new Path(dataPath(path))
    val tmp = new Path(
      dataPath(path) + ".compacting-" + java.util.UUID.randomUUID())
    val filtered = notDeleted(spark, path,
      spark.read.parquet(dataPath(path)), idName)
    val w = filtered.write.mode(SaveMode.Overwrite)
    meta.kind match {
      case "ivfpq" => w.partitionBy("cell").parquet(tmp.toString)
      case "lsh" => w.partitionBy("tbl", "bucket").parquet(tmp.toString)
      case _ => w.parquet(tmp.toString)
    }
    graft.sink.StagedSwap.swap(fs, live, tmp)
    fs.delete(tomb, true)
  }

  // ----------------------------------------------------------------
  // query — loads the stamp, never the training inputs
  // ----------------------------------------------------------------

  /** k-NN via a prebuilt IVF-PQ index — identical results to
    * [[Similarity.ivfPqAnnJoin]] with the build's parameters, zero
    * training work: the model comes from the stamp, the per-row codes
    * from the index table.
    */
  def queryIvfPq(
      spark: SparkSession,
      path: String,
      probes: DataFrame,
      k: Int,
      nprobe: Int = 4,
      rerankPerProbe: Int = 64): DataFrame = {
    val meta = load(spark, path, expectKind = "ivfpq")
    val t = spark.read.parquet(dataPath(path))
    // partition pruning, guaranteed statically: the probes' nprobe
    // cells (≤ nlist ints, one tiny probe-side job) become a literal
    // filter on the partition column, so the coarse scan lists only
    // those cell directories — no reliance on the dynamic-pruning
    // heuristics firing. Removes only rows the cell equi-join would
    // drop anyway, so results are unchanged.
    val cells = Similarity
      .ivfProbeCells(probes, meta.idCol, meta.vecCol, nprobe,
        meta.centroids)
      .select("cell").distinct().collect().map(_.getInt(0)).sorted
    Similarity.ivfPqSearch(
      notDeleted(spark, path,
        t.select("nn_id", "cell", "pq")
          .filter(col("cell").isin(cells.toIndexedSeq: _*)), "nn_id"),
      t.select(col("nn_id"), col("vec").as("bvx")),
      probes, meta.idCol, meta.vecCol, k, nprobe, rerankPerProbe,
      meta.centroids, meta.pq.get)
  }

  /** Single-query top-k via a prebuilt int8 index — same two-stage
    * shape as [[Quantize.topKQuantized]], but the coarse pass scans
    * the stored code columns and the floats join back only for the
    * `rerank` survivors. Returns (idCol, vecCol, dist).
    */
  def queryQ8(
      spark: SparkSession,
      path: String,
      queryVec: Seq[Float],
      k: Int,
      rerank: Int = 0): DataFrame = {
    val meta = load(spark, path, expectKind = "q8")
    val r = if (rerank > 0) rerank else math.max(4 * k, 32)
    val t = spark.read.parquet(dataPath(path))
    val id = col(meta.idCol)
    val q = typedlit(queryVec)
    notDeleted(spark, path,
        t.select(id, col("q8_codes"), col("q8_mn"), col("q8_scale")),
        meta.idCol)
      .withColumn("q8_dist",
        round(q8_cosine_distance(
          col("q8_codes"), col("q8_mn"), col("q8_scale"), q), 6))
      .orderBy(col("q8_dist"), id)
      .limit(r)
      .select(id)
      .join(t.select(id, col(meta.vecCol)), Seq(meta.idCol))
      .withColumn("dist",
        round(cosine_distance(col(meta.vecCol), q), 6) + lit(0.0))
      .orderBy(col("dist"), id)
      .limit(k)
  }

  /** ANN via a prebuilt LSH index — identical results to
    * [[Similarity.lshAnnJoin]] with the build's parameters; the base
    * side reads precomputed buckets (partition-pruned to the probed
    * ones) instead of re-projecting every vector.
    */
  def queryLsh(
      spark: SparkSession,
      path: String,
      probes: DataFrame,
      k: Int): DataFrame = {
    val meta = load(spark, path, expectKind = "lsh")
    Similarity.lshSearch(
      notDeleted(spark, path,
        spark.read.parquet(dataPath(path))
          .select(col("nn_id"), col("bv"), col("tbl").cast("int"),
            col("bucket").cast("int")), "nn_id"),
      probes, meta.idCol, meta.vecCol, k, meta.dim, meta.numPlanes,
      meta.seed, meta.numTables)
  }

  // ----------------------------------------------------------------
  // stamp serialization — a small line format with exact float
  // round-trips (Float.toString emits the shortest decimal that
  // uniquely identifies the value); no JSON library needed.
  // ----------------------------------------------------------------

  private def fmtVecs(vs: Seq[Seq[Float]]): String =
    vs.map(_.mkString(",")).mkString(";")

  private def parseVecs(s: String): Seq[Seq[Float]] =
    if (s.isEmpty) Seq.empty
    else s.split(";", -1).toSeq.map(
      _.split(",", -1).toSeq.map(java.lang.Float.parseFloat))

  private[graft] def render(meta: Meta): String = {
    val pqLine = meta.pq.map(p =>
      s"${p.m},${p.ks},${p.subDim}|" +
        p.codebook.map(fmtVecs).mkString("|")).getOrElse("")
    Seq(Version,
      s"kind=${meta.kind}",
      s"idCol=${meta.idCol}",
      s"vecCol=${meta.vecCol}",
      s"dim=${meta.dim}",
      s"seed=${meta.seed}",
      s"nlist=${meta.nlist}",
      s"numPlanes=${meta.numPlanes}",
      s"numTables=${meta.numTables}",
      s"centroids=${fmtVecs(meta.centroids)}",
      s"pq=$pqLine").mkString("\n")
  }

  private[graft] def parse(text: String, path: String): Meta = {
    val lines = text.split("\n", -1).toSeq
    require(lines.headOption.contains(Version),
      s"index at $path has stamp version '${lines.headOption.getOrElse("")}'" +
        s" — this build reads only '$Version'")
    val kv = lines.tail.map { l =>
      val i = l.indexOf('=')
      require(i > 0, s"malformed stamp line '$l' in index at $path")
      l.substring(0, i) -> l.substring(i + 1)
    }.toMap
    val pq = kv("pq") match {
      case "" => None
      case s =>
        val parts = s.split("\\|", -1).toSeq
        val Array(m, ks, subDim) = parts.head.split(",").map(_.toInt)
        require(parts.tail.length == m,
          s"index at $path: PQ codebook has ${parts.tail.length} " +
            s"subspaces, stamp says m=$m")
        Some(Quantize.PqModel(m, ks, subDim, parts.tail.map(parseVecs)))
    }
    Meta(kv("kind"), kv("idCol"), kv("vecCol"), kv("dim").toInt,
      kv("seed").toLong, kv("nlist").toInt, kv("numPlanes").toInt,
      kv("numTables").toInt, parseVecs(kv("centroids")), pq)
  }

  private def stampFile(spark: SparkSession, path: String) = {
    val p = new Path(path, StampName)
    (p, p.getFileSystem(spark.sparkContext.hadoopConfiguration))
  }

  /** Remove the stamp before a rebuild: readers treat a stampless
    * directory as "no index", so a crashed rebuild can never be
    * mistaken for a valid one. Tombstones go with it — they refer to
    * the OLD data generation and must not mask rows of the new one.
    */
  private def unstamp(spark: SparkSession, path: String): Unit = {
    val (p, fs) = stampFile(spark, path)
    if (fs.exists(p)) fs.delete(p, false)
    val t = new Path(tombPath(path))
    if (fs.exists(t)) fs.delete(t, true)
  }

  private def stamp(spark: SparkSession, path: String, meta: Meta): Unit = {
    val (p, fs) = stampFile(spark, path)
    val out = fs.create(p, true)
    try out.write(render(meta).getBytes("UTF-8")) finally out.close()
  }

  /** Load and validate the stamp — a driver-side file read, no Spark
    * job. Fails loudly on a missing/incompatible index.
    */
  def load(spark: SparkSession, path: String,
      expectKind: String): Meta = {
    val (p, fs) = stampFile(spark, path)
    require(fs.exists(p),
      s"no vector index at $path (missing $StampName stamp) — " +
        s"run VectorIndex.build first; a data directory without a " +
        "stamp is an incomplete build")
    val in = fs.open(p)
    val text = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    val meta = parse(text, path)
    require(meta.kind == expectKind,
      s"index at $path is kind '${meta.kind}' but was queried as " +
        s"'$expectKind' — kinds are not interchangeable")
    meta
  }

  /** Load whatever kind is stamped at `path` (for kind-dispatching
    * callers like [[append]]); same loud failure on a missing stamp.
    */
  private[ops] def loadAny(spark: SparkSession, path: String): Meta = {
    val (p, fs) = stampFile(spark, path)
    require(fs.exists(p),
      s"no vector index at $path (missing $StampName stamp) — " +
        "run VectorIndex.build first; append cannot create an index")
    val in = fs.open(p)
    val text = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    parse(text, path)
  }
}
