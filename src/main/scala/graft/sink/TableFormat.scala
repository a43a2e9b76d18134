package graft.sink

import org.apache.spark.sql.DataFrame

/** The MERGE-shaped storage contract behind [[ChunkStore]] — the seam
  * where a transactional table format drops in without touching any
  * caller (SURVEY A17's own mapping: the reference's store gives
  * per-item atomic upsert via Cosmos,
  * `AzureCosmosDB/.../CosmosDBClientWrapper.cs:36-72`; on a lake the
  * equivalent is Delta/Iceberg `MERGE INTO`).
  *
  * Three operations, keyed by `document_url`:
  *  - [[merge]] — replace every document present in `rows`, leave all
  *    others in place (idempotent whole-document upsert; the
  *    reference's only upsert scenario, since chunk ids are
  *    per-document ordinals);
  *  - [[delete]] — drop all rows of the given documents;
  *  - [[compact]] — same rows, fewer files (maintenance).
  *
  * The default implementation is the parquet MERGE emulation that
  * [[ChunkStore]] has always run (dynamic partition overwrite on the
  * per-document layout; writer-locked staged bucket rewrite on the
  * bucketed one). A Delta/Iceberg implementation maps the calls to
  * `MERGE INTO` / `DELETE FROM` / `OPTIMIZE`, gaining concurrent
  * writers, snapshot-isolated readers, and file-level conflict
  * detection — the capabilities a writer-lock file cannot provide and
  * the object-store-safe answer to directory-rename swaps
  * (SCALE.md §1). Wire one in via [[ChunkStore]]'s `format`
  * constructor argument; the sandbox has no Delta/Iceberg jars, so
  * the seam ships with the parquet implementation and a contract
  * spec any implementation must pass (TableFormatContractSpec).
  */
trait TableFormat {

  /** Replace exactly the documents present in `rows` (all five chunk
    * columns), leave everything else in place. Re-running the same
    * merge is a no-op on the final state.
    */
  def merge(rows: DataFrame): Unit

  /** Drop all chunks of the given documents; absent urls are no-ops.
    * The Seq form is for CALLER-BOUNDED url sets (churn-size lists);
    * a delete keyed by a table belongs on the [[delete(urls*]] frame
    * overload, which never materializes the url set on the driver.
    */
  def delete(documentUrls: Seq[String]): Unit

  /** Frame-native delete: drop all chunks of every document whose url
    * appears in `urls` (a frame with a `document_url` column). The
    * scalable twin of the Seq form — the url set flows end-to-end as
    * a Spark frame, so driver memory stays O(1) however large the
    * source. The default bridges to the Seq form in fixed-size
    * batches (O(batch) driver heap, one Seq-delete per batch) for
    * formats without a native frame path; formats with one override.
    */
  def delete(urls: DataFrame): Unit = {
    val it = urls.select("document_url").distinct().toLocalIterator()
    val buf = new scala.collection.mutable.ArrayBuffer[String](1 << 16)
    while (it.hasNext) {
      buf += it.next().getString(0)
      if (buf.length >= (1 << 16)) { delete(buf.toSeq); buf.clear() }
    }
    if (buf.nonEmpty) delete(buf.toSeq)
  }

  /** Row-level UPDATE: set each named column to its new value on every
    * row matching `condition` (`None` = all rows), leaving other rows
    * and columns byte-identical. Returns true when the format handled
    * it; false (the default) means the format has no transactional
    * rewrite path and the caller must refuse — the parquet emulations
    * stay whole-document-keyed (their unit of atomicity is the
    * partition/bucket, not the row), so SQL `UPDATE` is a
    * manifest-format capability, like SQL time travel.
    */
  def update(
      condition: Option[org.apache.spark.sql.Column],
      set: Seq[(String, org.apache.spark.sql.Column)]): Boolean = false

  /** Row-level DELETE by arbitrary predicate (the fallback when the
    * document-keyed [[delete]] can't express the WHERE). Same
    * returns-false-means-unsupported contract as [[update]].
    */
  def deleteWhere(
      condition: org.apache.spark.sql.Column): Boolean = false

  /** Collapse small files; rows and layout semantics unchanged. */
  def compact(): Unit

  /** Append rows without replacing anything (A18, the non-idempotent
    * insert path). Returns true when the format handled the append;
    * false (the default) routes to the store's native partitioned
    * append.
    */
  def append(rows: DataFrame): Boolean = false

  /** The live rows this format serves, when the format OWNS the live
    * set (a manifest/log-committing format like [[ManifestTableFormat]]
    * defines liveness in its commit log, not by directory listing).
    * `None` (the default, and the parquet emulation's answer) routes
    * reads through the store's native directory scan.
    */
  def read(): Option[DataFrame] = None

  /** A format-pruned multi-document read: `Some` when the format can
    * serve the probed documents from a file SUBSET using its own
    * metadata (the manifest format prunes on the per-file url sets
    * its add-actions record). `None` routes to the store's native
    * path (partition pruning / `_keybloom`).
    */
  def readDocuments(urls: Seq[String]): Option[DataFrame] = None
}
