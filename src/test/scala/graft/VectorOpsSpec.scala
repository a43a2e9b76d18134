package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorOps

/** Kernel-level properties of the vector distance family (B1). */
class VectorOpsSpec extends AnyFunSuite {

  private def arr(xs: Seq[Float]) = new GenericArrayData(xs.toArray[Any])

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  private val vec: Gen[List[Float]] =
    Gen.chooseNum(1, 64).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-10f, 10f)))

  test("cosine distance: self ≈ 0, symmetric, in [0, 2]") {
    check(Prop.forAll(vec, vec) { (a, b0) =>
      val b = b0.take(a.length).padTo(a.length, 0.1f)
      val dab = VectorOps.cosineDistance(arr(a), arr(b))
      val dba = VectorOps.cosineDistance(arr(b), arr(a))
      val self = VectorOps.cosineDistance(arr(a), arr(a))
      math.abs(dab - dba) < 1e-12 &&
        dab >= -1e-12 && dab <= 2.0 + 1e-12 &&
        (self < 1e-9 || a.forall(_ == 0f))
    })
  }

  test("l2: self = 0, symmetric, triangle inequality") {
    check(Prop.forAll(vec, vec, vec) { (a, b0, c0) =>
      val n = a.length
      val b = b0.take(n).padTo(n, 0.5f)
      val c = c0.take(n).padTo(n, -0.5f)
      val ab = VectorOps.l2Distance(arr(a), arr(b))
      val bc = VectorOps.l2Distance(arr(b), arr(c))
      val ac = VectorOps.l2Distance(arr(a), arr(c))
      VectorOps.l2Distance(arr(a), arr(a)) == 0.0 &&
        math.abs(ab - VectorOps.l2Distance(arr(b), arr(a))) < 1e-12 &&
        ac <= ab + bc + 1e-9
    })
  }

  test("dot and norm: dot(x,x) = norm(x)^2") {
    check(Prop.forAll(vec) { a =>
      val d = VectorOps.dot(arr(a), arr(a))
      val n = VectorOps.norm(arr(a))
      math.abs(d - n * n) <= 1e-9 * math.max(1.0, d)
    })
  }

  test("dimension mismatch throws; zero vectors degrade to distance 1") {
    intercept[IllegalArgumentException] {
      VectorOps.dot(arr(Seq(1f, 2f)), arr(Seq(1f)))
    }
    assert(VectorOps.cosineDistance(arr(Seq(0f, 0f)), arr(Seq(1f, 2f))) == 1.0)
  }

  test("stored-norm cosine is BIT-identical to the recompute path") {
    // the b2b conformance contract: norms from VectorOps.norm make
    // cosineDistanceStoredNorm reproduce cosineDistance to the last
    // ulp (raw long bits equal, not just approximately)
    check(Prop.forAll(vec, vec) { (a, b0) =>
      val b = b0.take(a.length).padTo(a.length, 0.1f)
      val full = VectorOps.cosineDistance(arr(a), arr(b))
      val stored = VectorOps.cosineDistanceStoredNorm(
        arr(a), arr(b), VectorOps.norm(arr(a)), VectorOps.norm(arr(b)))
      java.lang.Double.doubleToRawLongBits(full) ==
        java.lang.Double.doubleToRawLongBits(stored)
    })
    // zero-norm degeneracy keeps the distance-1.0 contract
    assert(VectorOps.cosineDistanceStoredNorm(
      arr(Seq(0f, 0f)), arr(Seq(1f, 2f)), 0.0, VectorOps.norm(arr(Seq(1f, 2f)))) == 1.0)
  }
}
