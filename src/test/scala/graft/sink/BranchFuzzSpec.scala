package graft.sink

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Model-based fuzz for branches + write-audit-publish: seeded
  * random interleavings of branch appends/upserts/deletes (plus
  * branch checkpoints) against an in-memory model, with reads
  * checked on BOTH handles after every op — then either a publish
  * (main must equal the branch model, exactly once) or a forced
  * divergence (publish must refuse and main must be untouched).
  * Ends with a vacuum and a final read. Complements BranchSpec's
  * directed pins with breadth.
  */
class BranchFuzzSpec extends SparkSpec {

  private def freshPath(): String =
    java.nio.file.Files.createTempDirectory("graft-bfz").toString + "/t"

  private def df(rows: Seq[(String, String, Int)]) = {
    import spark.implicits._
    rows.map { case (url, text, page) =>
      (0, text, Seq(1f), page, url)
    }.toDF("chunk_id", "chunk_text", "embedding", "page_number",
      "document_url").coalesce(1)
  }

  private def state(store: ChunkStore): Map[String, (String, Int)] =
    store.read().select("document_url", "chunk_text", "page_number")
      .collect().map(r =>
        r.getString(0) -> ((r.getString(1), r.getInt(2)))).toMap

  test("seeded random branch interleavings: reads match the model " +
      "on both handles; publish lands the model or refuses cleanly") {
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(seed * 7919)
      val path = freshPath()
      val store = new ChunkStore(spark, path,
        format = ManifestTableFormat.factory)
      val mtf = new ManifestTableFormat(spark, path, store.schema)
      var mainModel = Map.empty[String, (String, Int)]

      // seed main
      val base = (0 until 20 + rnd.nextInt(20)).map(i =>
        (f"doc://$seed%02d-$i%04d", s"base-$i", rnd.nextInt(5)))
      store.append(df(base))
      mainModel = base.map(r => r._1 -> ((r._2, r._3))).toMap
      assert(state(store) == mainModel, s"seed $seed: main seed read")

      mtf.createBranch("fuzz")
      val bstore = new ChunkStore(spark, path,
        format = ManifestTableFormat.branchFactory("fuzz"))
      val bmtf = new ManifestTableFormat(spark, path, store.schema,
        branch = Some("fuzz"))
      var branchModel = mainModel
      var next = 10000

      val ops = 4 + rnd.nextInt(4)
      for (op <- 0 until ops) {
        rnd.nextInt(4) match {
          case 0 => // append fresh urls
            val rows = (0 until 1 + rnd.nextInt(5)).map { _ =>
              next += 1
              (f"doc://$seed%02d-$next%05d", s"new-$next", rnd.nextInt(5))
            }
            bstore.append(df(rows))
            branchModel ++= rows.map(r => r._1 -> ((r._2, r._3)))
          case 1 => // upsert (replace) a random subset of existing
            val keys = rnd.shuffle(branchModel.keys.toSeq)
              .take(1 + rnd.nextInt(5))
            val rows = keys.map(k => (k, s"upd-$op-$k", rnd.nextInt(5)))
            bstore.upsert(df(rows))
            branchModel ++= rows.map(r => r._1 -> ((r._2, r._3)))
          case 2 => // predicate delete on a random page value
            val p = rnd.nextInt(5)
            bstore.deleteWhere(col("page_number") === p)
            branchModel = branchModel.filter(_._2._2 != p)
          case 3 => // branch checkpoint (replay-bound machinery)
            bmtf.checkpoint()
        }
        assert(state(bstore) == branchModel,
          s"seed $seed op $op: branch read diverged from model")
        assert(state(store) == mainModel,
          s"seed $seed op $op: branch op leaked into main")
      }

      if (rnd.nextBoolean()) {
        // publish: main becomes the branch model, exactly
        mtf.fastForward("fuzz")
        mainModel = branchModel
        assert(state(store) == mainModel,
          s"seed $seed: post-publish main != branch model")
      } else {
        // force divergence: main write after the fork → refusal,
        // main untouched by the attempt
        val extra = Seq((f"doc://$seed%02d-main", "diverge", 9))
        store.append(df(extra))
        mainModel ++= extra.map(r => r._1 -> ((r._2, r._3)))
        intercept[IllegalStateException] { mtf.fastForward("fuzz") }
        assert(state(store) == mainModel,
          s"seed $seed: refused publish must not land")
      }
      mtf.dropBranch("fuzz")
      mtf.vacuum()
      assert(state(store) == mainModel,
        s"seed $seed: post-vacuum main read")
      // in-commit timestamps stayed monotone through the whole run
      val ts = mtf.history().filter(r => r._5 == "commit" || r._5 == "txn")
        .sortBy(_._1).map(_._2)
      assert(ts == ts.sorted, s"seed $seed: non-monotone commit stamps")
    }
  }
}
