package graft

import java.net.URI
import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.hadoop.fs.{Path, RawLocalFileSystem}
import org.apache.spark.sql.DataFrame

import graft.sink.{ChunkStore, CommitPublisher, ManifestTableFormat}

/** A local filesystem masquerading as an object store: same bytes,
  * different URI scheme — so the publisher REGISTRY (keyed by scheme)
  * is what the tests exercise, not the storage.
  */
class MockS3FileSystem extends RawLocalFileSystem {
  override def getScheme: String = "mocks3"
  override def getUri: URI = URI.create("mocks3:///")
}

/** Same trick for a scheme with NO registered publisher. */
class NoPublisherFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "noreg"
  override def getUri: URI = URI.create("noreg:///")
}

/** The commit publish seam: exactly-one-winner per target across
  * racing writers, for every registered publisher — and a LOUD refusal
  * (not a silent exists+rename race) on schemes without one.
  */
class CommitPublisherSpec extends SparkSpec {

  private def hconf = spark.sparkContext.hadoopConfiguration

  override protected def beforeAll(): Unit = {
    super.beforeAll()
    hconf.set("fs.mocks3.impl", classOf[MockS3FileSystem].getName)
    hconf.set("fs.noreg.impl", classOf[NoPublisherFileSystem].getName)
  }

  private def chunksOf(url: String, texts: String*): DataFrame = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) =>
      (i, t, Seq(i.toFloat, 1f), 1, url)
    }.toDF("chunk_id", "chunk_text", "embedding", "page_number",
      "document_url")
  }

  /** Race `threads` writers at ONE target through `publisher`; each
    * stages a distinct payload. Contract: exactly one winner, and the
    * published bytes are exactly the winner's — never torn, never a
    * loser's overwrite.
    */
  private def raceOneTarget(
      name: String, publisher: CommitPublisher, threads: Int): Unit = {
    val dir = Files.createTempDirectory(s"graft-pub-$name").toString
    val fs = new Path(dir).getFileSystem(hconf)
    val target = new Path(dir, "00000000000042")
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(threads)
    val outcomes =
      try {
        val futures = (0 until threads).map { i =>
          pool.submit(new java.util.concurrent.Callable[(Int, Boolean)] {
            def call(): (Int, Boolean) = {
              val tmp = new Path(dir, s"tmp-$i")
              val out = fs.create(tmp, false)
              try out.write(s"payload-$i".getBytes("UTF-8"))
              finally out.close()
              start.await(10, TimeUnit.SECONDS)
              (i, publisher.putFileIfAbsent(fs, tmp, target))
            }
          })
        }
        start.countDown()
        futures.map(_.get(30, TimeUnit.SECONDS))
      } finally pool.shutdown()
    val winners = outcomes.filter(_._2)
    assert(winners.size == 1,
      s"$name: expected exactly one winner, got ${winners.map(_._1)}")
    val in = fs.open(target)
    val content =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    assert(content == s"payload-${winners.head._1}",
      s"$name: published content is not the winner's")
  }

  test("LocalLink publisher: one winner among 16 racing threads") {
    raceOneTarget("local-link", CommitPublisher.LocalLink, 16)
  }

  test("InMemoryConditionalPut publisher: one winner among 16 racing threads") {
    raceOneTarget("cond-put", new CommitPublisher.InMemoryConditionalPut, 16)
  }

  test("RenameIfAbsent publisher: sequential second writer loses") {
    // rename-if-absent's one-winner guarantee comes from the STORE
    // (HDFS fails rename onto an existing destination); on the local
    // fs used here only the sequential half of the contract is
    // checkable — the concurrent half is HDFS's, not ours.
    val dir = Files.createTempDirectory("graft-pub-rename").toString
    val fs = new Path(dir).getFileSystem(hconf)
    val target = new Path(dir, "00000000000007")
    def stage(i: Int): Path = {
      val tmp = new Path(dir, s"tmp-$i")
      val out = fs.create(tmp, false)
      try out.write(s"p$i".getBytes("UTF-8")) finally out.close()
      tmp
    }
    assert(CommitPublisher.RenameIfAbsent.putFileIfAbsent(fs, stage(1), target))
    assert(!CommitPublisher.RenameIfAbsent.putFileIfAbsent(fs, stage(2), target))
  }

  test("unregistered scheme: commit refuses loudly, nothing is published") {
    val local = Files.createTempDirectory("graft-noreg").toString
    val path = s"noreg:$local/t"
    val store = new ChunkStore(spark, path,
      format = ManifestTableFormat.factory)
    val e = intercept[Exception] {
      store.upsert(chunksOf("doc://a", "v1"))
    }
    // the refusal surfaces the registration hook, possibly wrapped by
    // Spark's job machinery — look through the cause chain
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .toSeq
    assert(msgs.exists(m => m.contains("CommitPublisher.register") &&
      m.contains("noreg")), s"refusal message missing: $msgs")
    // no commit entry may exist: a refusal must not half-publish
    val logDir = new Path(s"$path/_log")
    val fs = logDir.getFileSystem(hconf)
    val entries =
      if (!fs.exists(logDir)) Seq.empty
      else fs.listStatus(logDir).toSeq.map(_.getPath.getName)
        .filter(_.matches("\\d{12}\\.json"))
    assert(entries.isEmpty, s"refused commit left entries: $entries")
  }

  test("registered conditional-put scheme: concurrent writers all land " +
      "exactly once through the seam") {
    CommitPublisher.register("mocks3", new CommitPublisher.InMemoryConditionalPut)
    try {
      val local = Files.createTempDirectory("graft-mocks3").toString
      val path = s"mocks3:$local/t"
      val threads = 4
      val start = new CountDownLatch(1)
      val pool = Executors.newFixedThreadPool(threads)
      try {
        val futures = (0 until threads).map { i =>
          pool.submit(new Runnable {
            def run(): Unit = {
              val store = new ChunkStore(spark, path,
                format = ManifestTableFormat.factory)
              start.await(10, TimeUnit.SECONDS)
              // disjoint documents: every upsert must survive the
              // commit races (lost race → recommit under next version)
              store.upsert(chunksOf(s"doc://$i", s"t$i-0", s"t$i-1"))
            }
          })
        }
        start.countDown()
        futures.foreach(_.get(120, TimeUnit.SECONDS))
      } finally pool.shutdown()
      val store = new ChunkStore(spark, path,
        format = ManifestTableFormat.factory)
      val got = store.read()
        .select("document_url", "chunk_id", "chunk_text")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
        .toSet
      val want = (0 until threads).flatMap(i =>
        Seq((s"doc://$i", 0, s"t$i-0"), (s"doc://$i", 1, s"t$i-1"))).toSet
      assert(got == want)
      // and the log holds exactly `threads` committed versions, each
      // published exactly once (0-based contiguous)
      val fs = new Path(s"$path/_log").getFileSystem(hconf)
      val versions = fs.listStatus(new Path(s"$path/_log")).toSeq
        .map(_.getPath.getName).filter(_.matches("\\d{12}\\.json")).sorted
      assert(versions == (0 until threads).map(v => "%012d.json".format(v)))
    } finally CommitPublisher.unregister("mocks3")
  }
}
