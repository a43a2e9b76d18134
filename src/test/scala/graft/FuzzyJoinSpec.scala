package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.ops.FuzzyJoin

/** D28 fuzzy join: deletion-neighborhood blocking finds EXACTLY the
  * pairs within the edit bound — checked against a brute-force
  * Levenshtein reference on random inputs for k = 1 and k = 2.
  */
class FuzzyJoinSpec extends SparkSpec {

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def check(prop: Prop, n: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  test("typo pairs surface; distant strings do not") {
    import spark.implicits._
    val words = Seq("grafted", "grafter", "graft", "spark", "sparks",
      "shuffle", "exchange").zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("id", "w")
    val pairs = FuzzyJoin.similarPairs(words, "id", "w", maxDist = 1)
      .select("s1", "s2").collect()
      .map(r => Set(r.getString(0), r.getString(1))).toSet
    assert(pairs == Set(
      Set("grafted", "grafter"), Set("spark", "sparks")))
  }

  test("agrees with brute force for k = 1 and k = 2 on random strings") {
    import spark.implicits._
    val genStr = for {
      n <- Gen.choose(0, 7)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString
    val genCase = for {
      n <- Gen.choose(2, 14)
      ws <- Gen.listOfN(n, genStr)
      k <- Gen.oneOf(1, 2)
    } yield (ws.distinct, k)
    check(Prop.forAll(genCase) { case (ws, k) =>
      val df = ws.zipWithIndex.map { case (w, i) => (i.toLong, w) }
        .toDF("id", "w")
      val got = FuzzyJoin.similarPairs(df, "id", "w", k)
        .select("id1", "id2", "dist").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val want = (for {
        i <- ws.indices; j <- ws.indices if i < j
        d = lev(ws(i), ws(j)) if d <= k
      } yield (i.toLong, j.toLong, d)).toSet
      got == want
    }, 30)
  }

  test("k beyond 2 refuses loudly") {
    import spark.implicits._
    val df = Seq((1L, "x")).toDF("id", "w")
    val e = intercept[IllegalArgumentException] {
      FuzzyJoin.similarPairs(df, "id", "w", maxDist = 3).collect()
    }
    assert(e.getMessage.contains("maxDist"))
  }
}
