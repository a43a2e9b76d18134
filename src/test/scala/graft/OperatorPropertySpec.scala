package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.ops.Dedup

/** Property tests for the round-3 kernels: the distributed
  * implementations must agree with independent in-memory reference
  * implementations on randomized inputs. Driven through ScalaCheck's
  * Test API directly (same harness as ChunkersPropertySpec; Spark jobs
  * per case → small minSuccessful counts).
  */
class OperatorPropertySpec extends SparkSpec {

  private def check(prop: Prop, n: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  /** Reference union-find for component roots (min-id root). */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    edges.flatMap(e => Seq(e._1, e._2)).distinct
      .map(x => x -> find(x)).toMap
  }

  test("connectedComponents agrees with union-find on random graphs") {
    import spark.implicits._
    val genEdges = for {
      n <- Gen.choose(2, 24)
      m <- Gen.choose(1, 30)
      edges <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n.toLong - 1)
        b <- Gen.choose(0L, n.toLong - 1)
      } yield (math.min(a, b), math.max(a, b)))
    } yield edges.filter(e => e._1 != e._2).distinct
    check(Prop.forAll(genEdges) { edges =>
      edges.isEmpty || {
        val got = Dedup.connectedComponents(
            edges.toDF("id1", "id2"), maxIter = 30)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        got == unionFind(edges)
      }
    }, n = 10)
  }

  test("profile_scores(words) agrees with a plain Scala count") {
    import spark.implicits._
    import graft.functions.GraftFunctions.profile_scores
    val profiles = graft.ops.TextAnalysis.stopwordProfiles
    val spec = profiles.map(_._2.mkString(",")).mkString("|")
    val genText = Gen.listOf(Gen.oneOf(
      profiles.flatMap(_._2) ++ Seq("zebra", "Quartz", "THE", "la")))
      .map(_.mkString(" "))
    check(Prop.forAll(genText) { text =>
      val got = Seq(text).toDF("t")
        .select(profile_scores(col("t"), lit(spec), lit(0)).as("s"))
        .head().getSeq[Int](0).toSeq
      val words = text.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      val want = profiles.map { case (_, ws) => words.count(ws.toSet) }
      got == want
    }, n = 25)
  }

  test("nfc_normalize is idempotent and matches the JDK Normalizer") {
    import spark.implicits._
    import graft.functions.GraftFunctions.nfc_normalize
    val genText = Gen.listOf(Gen.oneOf(
      Seq("a", "e", "́", "̈", "caf", "é", "x ")))
      .map(_.mkString)
    check(Prop.forAll(genText) { text =>
      val row = Seq(text).toDF("t")
        .select(nfc_normalize(col("t")).as("n1"))
        .select(col("n1"), nfc_normalize(col("n1")).as("n2"))
        .head()
      val (once, twice) = (row.getString(0), row.getString(1))
      once == twice && once == java.text.Normalizer.normalize(
        text, java.text.Normalizer.Form.NFC)
    }, n = 25)
  }

  test("minhash_agg is order- and partitioning-insensitive") {
    import graft.functions.GraftFunctions.minhash_signature
    import graft.functions.VectorAggregates.minhash_agg
    val texts = Tables(spark, sf(), "documents").limit(30)
      .select(col("doc_id"), col("text"))
    def sig(parts: Int, desc: Boolean): Map[Long, Seq[Long]] = {
      val base = if (desc) texts.orderBy(col("doc_id").desc) else texts
      base.repartition(parts)
        .select((col("doc_id") % 3).as("g"),
          minhash_signature(col("text"), lit(32), lit(2)).as("s"))
        .groupBy("g").agg(minhash_agg(col("s")).as("a"))
        .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toMap
    }
    assert(sig(1, desc = false) == sig(7, desc = true))
  }

  test("NSW beam search with ef = n equals brute force on random cells") {
    import graft.ops.GraphIndex
    val cellGen = for {
      n <- Gen.choose(2, 50)
      dim <- Gen.choose(2, 16)
      seed <- Gen.choose(0L, 10000L)
      m <- Gen.choose(2, 8)
    } yield (n, dim, seed, m)
    val prop = Prop.forAll(cellGen) { case (n, dim, seed, m) =>
      val rnd = new java.util.Random(seed)
      val nodes = (0 until n).map { i =>
        (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat))
      }
      val adj = GraphIndex.buildCellGraph(nodes, m, efC = math.max(8, 2 * m))
      val q = Array.fill(dim)(rnd.nextGaussian().toFloat)
      val got = GraphIndex.beamSearch(q, 0, n,
        nodes.map(_._1).toArray, nodes.map(_._2).toArray, adj(_))
        .map(_._2.toLong)
      def ranked(ids: Set[Long]): Seq[Long] = nodes
        .filter(x => ids(x._1))
        .map { case (id, v) =>
          (graft.functions.VectorOps.cosineDistance(q, v), id)
        }.sorted.map(_._2)
      // an exhaustive (ef = n) search over a CONNECTED graph must
      // reproduce brute force exactly, in order. Degree pruning can
      // in principle disconnect a component from the entry; then the
      // search must still rank everything it REACHED correctly and
      // reach at least the entry's own m+1 neighborhood
      (if (got.length == n) got == ranked(nodes.map(_._1).toSet)
       else got == ranked(got.toSet)) &&
        got.length >= math.min(n, m + 1)
    }
    check(prop, 30)
  }

  test("cutCommonLines agrees with an in-memory reference and is idempotent") {
    import spark.implicits._
    // random multi-line docs over a tiny line alphabet so lines repeat
    // across docs with high probability
    val lineGen = Gen.oneOf("alpha beta", "gamma", "delta eps zeta",
      "eta theta", "", "  ")
    val docGen = Gen.listOfN(5, lineGen).map(_.mkString("\n"))
    val corpusGen = Gen.listOfN(12, docGen)
    val prop = Prop.forAll(corpusGen, Gen.choose(2, 6)) { (texts, minDocs) =>
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = Dedup.cutCommonLines(docs, "doc_id", "text", minDocs)
        .collect().map(r => (r.getLong(0), (r.getString(1), r.getLong(2))))
        .toMap
      // reference: count distinct docs per non-blank line, cut lines
      // at or above the threshold, rejoin in order
      val byLine = texts.zipWithIndex
        .flatMap { case (t, i) =>
          t.split("\n", -1).filter(_.trim.nonEmpty).distinct.map((_, i))
        }
        .groupBy(_._1).map { case (l, xs) => (l, xs.map(_._2).distinct.size) }
      val want = texts.zipWithIndex.map { case (t, i) =>
        val lines = t.split("\n", -1)
        val kept = lines.filter(l =>
          l.trim.isEmpty || byLine.getOrElse(l, 0) < minDocs)
        (i.toLong, (kept.mkString("\n"), (lines.length - kept.length).toLong))
      }.toMap
      val twice = Dedup.cutCommonLines(
          got.toSeq.map { case (id, (t, _)) => (id, t) }.toDF("doc_id", "text"),
          "doc_id", "text", minDocs)
        .collect().map(r => (r.getLong(0), r.getString(1))).toMap
      got == want && twice == got.map { case (id, (t, _)) => (id, t) }
    }
    check(prop, 8)
  }
}
