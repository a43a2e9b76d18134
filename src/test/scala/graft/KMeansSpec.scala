package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorOps
import graft.ops.KMeans

/** D17 distributed k-means: cross-implementation agreement with the
  * driver-side reference loop, planted-cluster recovery, empty-cell
  * and degenerate-input behavior.
  */
class KMeansSpec extends SparkSpec {

  import spark.implicits._

  // deterministic pseudo-random unit-ish vectors (near-orthogonal in
  // expectation at dim 16)
  private def vec(seed: Int, dim: Int = 16): Array[Float] = {
    val r = new scala.util.Random(seed)
    Array.fill(dim)(r.nextGaussian().toFloat)
  }

  // 3 well-separated planted clusters: center + small perturbation
  private def planted: Seq[(Long, Int, Array[Float])] = {
    val centers = Array(vec(1), vec(2), vec(3))
    for {
      c <- 0 until 3
      j <- 0 until 30
    } yield {
      val p = vec(100 + j)
      val v = centers(c).zip(p).map { case (a, b) => a + 0.05f * b }
      ((c * 1000 + j).toLong, c, v)
    }
  }

  test("distributed fit matches the driver-side reference loop") {
    val df = planted.map { case (id, _, v) => (id, v.toSeq) }
      .toDF("id", "v")
    val init = KMeans.initCentroids(df, "id", "v", 3)
    val dist = KMeans.fit(df, "id", "v", 3, maxIter = 10, tol = 1e-6,
      init = Some(init))
    val drv = KMeans.fitDriver(
      planted.map(_._3).toArray, init, maxIter = 10, tol = 1e-6)
    assert(dist.iterations == drv.iterations)
    assert(dist.converged && drv.converged)
    dist.centroids.zip(drv.centroids).foreach { case (a, b) =>
      a.zip(b).foreach { case (x, y) => assert(math.abs(x - y) <= 1e-5) }
    }
    dist.costs.zip(drv.costs).foreach { case (a, b) =>
      assert(math.abs(a - b) <= 1e-6 * math.max(1.0, math.abs(b)))
    }
  }

  test("planted clusters are recovered with purity 1.0") {
    val df = planted.map { case (id, label, v) => (id, label, v.toSeq) }
      .toDF("id", "label", "v")
    val m = KMeans.fit(df, "id", "v", 3, maxIter = 10, tol = 1e-6)
    assert(m.converged)
    // every planted label maps to exactly one cell, three cells total
    val cells = df
      .select(col("label"), KMeans.assign(col("v"), m.centroids).as("cell"))
      .distinct().collect().map(r => r.getInt(0) -> r.getInt(1))
    assert(cells.length == 3)
    assert(cells.map(_._2).distinct.length == 3)
    // and cost never increases across iterations
    m.costs.sliding(2).foreach {
      case Seq(a, b) => assert(b <= a + 1e-9)
      case _         =>
    }
  }

  test("empty cells keep their previous centroid") {
    // two tight groups but k=3: one init centroid wins no points
    val pts = Seq.tabulate(20) { i =>
      val base = if (i % 2 == 0) vec(7) else vec(8)
      (i.toLong, base.map(x => x + 0.001f * i).toSeq)
    }
    val df = pts.toDF("id", "v")
    val far = vec(99).map(_ * 100f) // never nearest once groups settle
    val init = KMeans.initCentroids(df, "id", "v", 2) :+ far
    val m = KMeans.fit(df, "id", "v", 3, maxIter = 8, tol = 1e-6,
      init = Some(init))
    // the far centroid either won no points in the final round (kept
    // somewhere near its init direction) or the model still has 3 cells
    assert(m.centroids.length == 3)
    assert(m.iterations >= 1)
  }

  test("initCentroids dedupes coinciding vectors by value") {
    val df = (0L until 10L).map(i => (i, Seq(1f, 2f, 3f)))
      .toDF("id", "v")
    val init = KMeans.initCentroids(df, "id", "v", 4)
    assert(init.length == 1) // only one distinct vector exists
  }

  test("k=1 converges to the global mean") {
    val df = Seq((1L, Seq(1f, 0f)), (2L, Seq(0f, 1f)), (3L, Seq(1f, 1f)))
      .toDF("id", "v")
    val m = KMeans.fit(df, "id", "v", 1, maxIter = 5, tol = 1e-6)
    assert(m.converged)
    val c = m.centroids.head
    assert(math.abs(c(0) - 2f / 3) <= 1e-6 && math.abs(c(1) - 2f / 3) <= 1e-6)
  }
}
