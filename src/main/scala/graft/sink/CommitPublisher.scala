package graft.sink

import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.{FileSystem, Path}

/** The atomic-publish seam under the manifest log's commit protocol.
  *
  * A manifest commit stages its content at a temp path and then
  * PUBLISHES it at `_log/<version>` — and the publish is the entire
  * concurrency story: two writers racing the same version must get
  * exactly one winner, decided by the store itself, with no
  * check-then-act window. That primitive is store-specific:
  *
  *  - local filesystems: POSIX `link(2)` fails if the target exists —
  *    a kernel-arbitrated one-winner publish (rename(2) would silently
  *    OVERWRITE);
  *  - HDFS-class stores: `rename` fails onto an existing destination —
  *    a true check-and-commit, arbitrated by the NameNode;
  *  - S3-class stores: rename is copy+delete and does NOT fail onto an
  *    existing key, and `exists`-then-`rename` is a TOCTOU race — the
  *    only sound publish is a CONDITIONAL PUT (`If-None-Match: *`),
  *    which this library cannot ship without the store's SDK.
  *
  * So publishers are a REGISTRY keyed by URI scheme: `file` and the
  * HDFS family ship built in, and any other scheme REFUSES LOUDLY at
  * commit time until a deployment registers a publisher with
  * conditional-put semantics (the same contract Delta Lake names
  * `LogStore.write(overwrite=false)`: exactly-one-winner or throw).
  * A silent fallback here is a lost-commit race at 100 TB scale — the
  * refusal is the feature.
  */
trait CommitPublisher {

  /** Publish the file staged at `tmp` as `target`.
    *
    * Contract (Delta-LogStore `putIfAbsent` semantics): returns true
    * iff THIS call created `target`; returns false iff `target`
    * already existed (lost race) — and in either outcome `target`
    * afterwards holds exactly one committed writer's content, never a
    * torn or overwritten mix. The caller deletes `tmp` afterwards in
    * both outcomes.
    */
  def putFileIfAbsent(fs: FileSystem, tmp: Path, target: Path): Boolean

  /** Publish the DIRECTORY staged at `tmp` as `target`.
    *
    * Weaker contract than [[putFileIfAbsent]]: callers only publish
    * directories whose content is a deterministic function of an
    * already-committed version (parquet checkpoints), so a lost race
    * means an equivalent directory was already published and either
    * copy is sound. Returns true iff this call published; on false the
    * caller reclaims `tmp`. Torn publishes are tolerated downstream
    * (readers require the `_SUCCESS` marker).
    */
  def putDirIfAbsent(fs: FileSystem, tmp: Path, target: Path): Boolean =
    !fs.exists(target) && fs.rename(tmp, target)
}

object CommitPublisher {

  /** `link(2)`-if-absent: the kernel arbitrates exactly one winner. */
  object LocalLink extends CommitPublisher {
    override def putFileIfAbsent(
        fs: FileSystem, tmp: Path, target: Path): Boolean =
      try {
        java.nio.file.Files.createLink(
          java.nio.file.Paths.get(target.toUri.getPath),
          java.nio.file.Paths.get(tmp.toUri.getPath))
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
      }
  }

  /** Rename-if-absent for stores whose rename FAILS onto an existing
    * destination (the HDFS contract, arbitrated by the NameNode).
    * The `exists` pre-check is an optimization only; the rename itself
    * is the check-and-commit.
    */
  object RenameIfAbsent extends CommitPublisher {
    override def putFileIfAbsent(
        fs: FileSystem, tmp: Path, target: Path): Boolean =
      !fs.exists(target) && fs.rename(tmp, target)
  }

  /** A single-process conditional put — the S3 `If-None-Match: *`
    * shape, with the one-winner decision made by an in-memory
    * claims table instead of the store. For TESTS of the seam (race
    * the claim from many threads) and for single-writer embedded use;
    * NOT a multi-process publisher (the claims table does not span
    * JVMs), which is why it is not pre-registered for any scheme.
    */
  final class InMemoryConditionalPut extends CommitPublisher {
    private val claims = ConcurrentHashMap.newKeySet[String]()
    override def putFileIfAbsent(
        fs: FileSystem, tmp: Path, target: Path): Boolean = {
      if (!claims.add(target.toString)) return false
      if (fs.exists(target)) return false // pre-existing from before us
      // we own the key: copy tmp's bytes to target (PUT body)
      val in = fs.open(tmp)
      val out =
        try fs.create(target, false)
        catch { case e: Throwable => in.close(); throw e }
      try org.apache.hadoop.io.IOUtils.copyBytes(in, out, 65536, true)
      catch { case e: Throwable => in.close(); out.close(); throw e }
      true
    }
  }

  private val registry = new ConcurrentHashMap[String, CommitPublisher]()
  registry.put("file", LocalLink)
  // Stores with HDFS rename semantics (atomic, fails-onto-existing).
  Seq("hdfs", "viewfs", "webhdfs", "swebhdfs", "ofs", "o3fs")
    .foreach(registry.put(_, RenameIfAbsent))

  /** Register (or replace) the publisher for a URI scheme. Deployments
    * targeting object stores call this once at startup with an
    * SDK-backed conditional-put implementation.
    */
  def register(scheme: String, publisher: CommitPublisher): Unit =
    registry.put(scheme.toLowerCase(java.util.Locale.ROOT), publisher)

  /** Drop a registration (test hygiene). */
  def unregister(scheme: String): Unit =
    registry.remove(scheme.toLowerCase(java.util.Locale.ROOT))

  /** The publisher for `scheme`, or a LOUD refusal: committing through
    * a publish primitive without one-winner semantics is a silent
    * lost-commit race, strictly worse than failing.
    */
  def forScheme(scheme: String): CommitPublisher = {
    val p = registry.get(scheme.toLowerCase(java.util.Locale.ROOT))
    if (p == null) throw new IllegalStateException(
      s"No CommitPublisher registered for scheme '$scheme'. " +
        "Manifest commits require an atomic publish with exactly-one-" +
        "winner semantics; on S3-class stores that is a conditional " +
        "put (If-None-Match: *), which needs the store's SDK. Register " +
        "one via graft.sink.CommitPublisher.register(\"" + scheme +
        "\", publisher) before writing, instead of racing " +
        "exists+rename (rename on such stores is copy+delete and does " +
        "not fail onto an existing key).")
    p
  }
}
