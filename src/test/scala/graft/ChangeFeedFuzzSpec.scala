package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sink.{ChunkStore, ManifestTableFormat}

/** Seeded fuzz of the change feed's algebra: for ANY committed
  * version pair (i, j), applying `changesBetween(i, j)` to the state
  * at i reconstructs the state at j exactly (as a multiset) — across
  * random upserts (new + rewrite), whole-document deletes, compaction
  * rewrites (which must cancel out of the feed), and checkpoints
  * (which must not disturb version arithmetic).
  */
class ChangeFeedFuzzSpec extends SparkSpec {

  private def chunksOf(url: String, texts: String*): DataFrame = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) =>
      (i, t, Seq(i.toFloat, 1f), 1, url)
    }.toDF("chunk_id", "chunk_text", "embedding", "page_number",
      "document_url")
  }

  private type RowKey = (String, Int, String)

  private def rowsOf(df: DataFrame): Seq[RowKey] =
    df.select("document_url", "chunk_id", "chunk_text")
      .collect().toSeq
      .map(r => (r.getString(0), r.getInt(1), r.getString(2)))
      .sorted

  test("sync fuzz: a replica equals the transformed source after any op sequence") {
    import graft.pipeline.ChangeFeedSync
    val srcPath = Files.createTempDirectory("graft-sync-fuzz-src")
      .toString + "/t"
    val dstPath = Files.createTempDirectory("graft-sync-fuzz-dst")
      .toString + "/t"
    val ckpt = Files.createTempDirectory("graft-sync-fuzz-ck").toString
    val src = new ChunkStore(spark, srcPath,
      format = ManifestTableFormat.factory)
    val dst = new ChunkStore(spark, dstPath,
      format = ManifestTableFormat.factory)
    val upperText = (df: DataFrame) =>
      df.withColumn("chunk_text",
        org.apache.spark.sql.functions.upper(col("chunk_text")))
    val rnd = new scala.util.Random(7)
    val live = scala.collection.mutable.ArrayBuffer.empty[String]
    var gen = 0
    (0 until 18).foreach { step =>
      gen += 1
      rnd.nextInt(5) match {
        case 0 | 1 =>
          val url = s"doc://sf$gen"
          src.upsert(chunksOf(url, s"g$gen-a", s"g$gen-b"))
          live += url
        case 2 if live.nonEmpty =>
          src.upsert(chunksOf(live(rnd.nextInt(live.size)), s"g$gen-rw"))
        case 3 if live.nonEmpty =>
          src.delete(Seq(live.remove(rnd.nextInt(live.size))))
        case _ => src.compact()
      }
      // sync at random points (including twice in a row sometimes)
      if (rnd.nextInt(3) == 0)
        ChangeFeedSync.syncOnce(spark, srcPath, dst, ckpt, upperText)
    }
    ChangeFeedSync.syncOnce(spark, srcPath, dst, ckpt, upperText)
    val expected = rowsOf(upperText(src.read()))
    assert(rowsOf(dst.read()) == expected)
    // one more drain is a no-op
    ChangeFeedSync.syncOnce(spark, srcPath, dst, ckpt, upperText)
    assert(rowsOf(dst.read()) == expected)
  }

  test("delta between any two versions reconstructs the later state") {
    val path = Files.createTempDirectory("graft-cdf-fuzz").toString + "/t"
    val store = new ChunkStore(spark, path,
      format = ManifestTableFormat.factory)
    val mtf = new ManifestTableFormat(spark, path, store.schema)
    val rnd = new scala.util.Random(42)
    val live = scala.collection.mutable.ArrayBuffer.empty[String]
    var gen = 0

    // 22 random operations; record the committed version after each
    val versions = scala.collection.mutable.ArrayBuffer.empty[Long]
    (0 until 22).foreach { step =>
      gen += 1
      rnd.nextInt(6) match {
        case 0 | 1 => // new document, 1-3 chunks
          val url = s"doc://f$gen"
          store.upsert(chunksOf(url,
            (0 to rnd.nextInt(3)).map(i => s"g$gen-c$i"): _*))
          live += url
        case 2 if live.nonEmpty => // rewrite an existing document
          val url = live(rnd.nextInt(live.size))
          store.upsert(chunksOf(url, s"g$gen-rw0", s"g$gen-rw1"))
        case 3 if live.nonEmpty => // delete an existing document
          val url = live.remove(rnd.nextInt(live.size))
          store.delete(Seq(url))
        case 4 => // compaction rewrite: same rows, new files
          store.compact()
        case _ => // checkpoint + a small insert (checkpoint alone
          // commits no version; keep the step productive)
          mtf.checkpoint()
          val url = s"doc://f$gen"
          store.upsert(chunksOf(url, s"g$gen-c0"))
          live += url
      }
      versions += mtf.version
    }
    val head = mtf.version
    assert(head >= 0)

    def stateAt(v: Long): Seq[RowKey] = rowsOf(mtf.readVersion(v))

    // sampled version pairs (plus the full span and adjacent pairs)
    val distinct: IndexedSeq[Long] = versions.distinct.sorted.toIndexedSeq
    val pairs: Seq[(Long, Long)] =
      Seq((distinct.head, distinct.last)) ++
        distinct.sliding(2).collect { case Seq(a, b) => (a, b) }.toSeq ++
        Seq.fill(15)((distinct(rnd.nextInt(distinct.size)),
          distinct(rnd.nextInt(distinct.size))))
          .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
    pairs.distinct.foreach { case (i, j) =>
      val delta = mtf.changesBetween(i, j)
        .select("document_url", "chunk_id", "chunk_text", "_change_type")
        .collect().toSeq
        .map(r => ((r.getString(0), r.getInt(1), r.getString(2)),
          r.getString(3)))
      val inserts = delta.collect { case (k, "insert") => k }
      val deletes = delta.collect { case (k, "delete") => k }
      // multiset algebra: state(i) - deletes + inserts == state(j)
      val reconstructed =
        (stateAt(i).diff(deletes) ++ inserts).sorted
      assert(reconstructed == stateAt(j),
        s"delta ($i, $j] does not reconstruct: " +
          s"inserts=${inserts.size} deletes=${deletes.size}")
      // and deletes never remove something absent at i
      assert(deletes.diff(stateAt(i)).isEmpty,
        s"delta ($i, $j] deletes rows absent at $i")
    }
  }

  test("DDL fuzz: spans crossing random ADD/RENAME/DROP COLUMN still " +
      "reconstruct the later state on the stable columns") {
    import org.apache.spark.sql.types.StringType
    val path = Files.createTempDirectory("graft-cdf-ddlfuzz")
      .toString + "/t"
    val store = new ChunkStore(spark, path,
      format = ManifestTableFormat.factory)
    val mtf = new ManifestTableFormat(spark, path, store.schema)
    val rnd = new scala.util.Random(1313)
    val live = scala.collection.mutable.ArrayBuffer.empty[String]
    val aux = scala.collection.mutable.ArrayBuffer.empty[String]
    var gen = 0

    /** A write df matching the CURRENT evolved schema: base chunk
      * columns + every live aux column, in the table's column order.
      */
    def writeDf(url: String, texts: String*): DataFrame = {
      val base = chunksOf(url, texts: _*)
      val withAux = aux.foldLeft(base)((df, a) =>
        df.withColumn(a, lit(s"g$gen-$a")))
      withAux.select(
        mtf.currentSchema.fieldNames.toIndexedSeq.map(col): _*)
    }

    val versions = scala.collection.mutable.ArrayBuffer.empty[Long]
    (0 until 26).foreach { _ =>
      gen += 1
      rnd.nextInt(9) match {
        case 0 | 1 =>
          val url = s"doc://x$gen"
          store.upsert(writeDf(url, s"g$gen-a", s"g$gen-b"))
          live += url
        case 2 if live.nonEmpty =>
          store.upsert(writeDf(live(rnd.nextInt(live.size)), s"g$gen-rw"))
        case 3 if live.nonEmpty =>
          store.delete(Seq(live.remove(rnd.nextInt(live.size))))
        case 4 => store.compact()
        case 5 if aux.size < 2 =>
          val n = s"aux$gen"
          mtf.addColumn(n, StringType); aux += n
          // DDL alone commits a version with no file churn; keep the
          // step productive so every version is span-sampleable
          val url = s"doc://x$gen"
          store.upsert(writeDf(url, s"g$gen-post-add"))
          live += url
        case 6 if aux.nonEmpty =>
          val i = rnd.nextInt(aux.size)
          val n2 = s"aux${gen}r"
          mtf.renameColumn(aux(i), n2); aux(i) = n2
        case 7 if aux.nonEmpty =>
          mtf.dropColumn(aux.remove(rnd.nextInt(aux.size)))
        case _ =>
          mtf.checkpoint()
          val url = s"doc://x$gen"
          store.upsert(writeDf(url, s"g$gen-ck"))
          live += url
      }
      versions += mtf.version
    }
    assert(aux.nonEmpty || gen > 0) // exercised; keep compiler quiet

    def stateAt(v: Long): Seq[RowKey] =
      rowsOf(mtf.readVersion(v))

    val distinct: IndexedSeq[Long] = versions.distinct.sorted.toIndexedSeq
    val pairs: Seq[(Long, Long)] =
      Seq((distinct.head, distinct.last)) ++
        distinct.sliding(2).collect { case Seq(a, b) => (a, b) }.toSeq ++
        Seq.fill(15)((distinct(rnd.nextInt(distinct.size)),
          distinct(rnd.nextInt(distinct.size))))
          .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
    pairs.distinct.foreach { case (i, j) =>
      // the delta speaks the TO version's schema; the stable columns
      // exist at every version, so reconstruction checks on them
      val delta = mtf.changesBetween(i, j)
        .select("document_url", "chunk_id", "chunk_text", "_change_type")
        .collect().toSeq
        .map(r => ((r.getString(0), r.getInt(1), r.getString(2)),
          r.getString(3)))
      val inserts = delta.collect { case (k, "insert") => k }
      val deletes = delta.collect { case (k, "delete") => k }
      val reconstructed =
        (stateAt(i).diff(deletes) ++ inserts).sorted
      assert(reconstructed == stateAt(j),
        s"DDL-crossing delta ($i, $j] does not reconstruct " +
          s"(inserts=${inserts.size} deletes=${deletes.size})")
      assert(deletes.diff(stateAt(i)).isEmpty,
        s"DDL-crossing delta ($i, $j] deletes rows absent at $i")
    }
  }
}
