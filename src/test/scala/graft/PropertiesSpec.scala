package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.streaming.Capacity
import graft.streaming.Capacity.Assignment

/** Property-based checks over the PURE kernels (no SparkSession):
  * placement-strategy invariants and the NNLS contract hold for ALL
  * generated inputs, not just the hand-picked spec cases. Raw
  * ScalaCheck (the offline cache carries no scalatestplus bridge): each
  * test runs a Prop through SCTest.check and asserts it passed, so a
  * falsifying case surfaces with its shrunk arguments in the message.
  */
class PropertiesSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def check(p: Prop, tests: Int = 200): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(tests), p)
    assert(res.passed, s"property falsified: ${res.status}")
  }

  private val capsGen: Gen[Map[String, Double]] = for {
    n <- Gen.choose(1, 12)
    vs <- Gen.listOfN(n, Gen.choose(0.0, 100.0))
  } yield vs.zipWithIndex.map { case (v, i) => s"n$i" -> v }.toMap

  test("every placement strategy's shares sum EXACTLY to totalItems and cover every node") {
    val strategies = Seq[Capacity.Strategy](Capacity.Proportional,
      Capacity.Greedy, Capacity.TwoChoice, Capacity.PowerOfTwo)
    // greedy/power-of-two materialize unit items — keep totals bounded
    check(Prop.forAll(capsGen, Gen.choose(0L, 5000L)) { (caps, total) =>
      strategies.forall { s =>
        val shares = Assignment.shares(s, caps, total)
        shares.values.sum == total && shares.keySet == caps.keySet &&
          shares.values.forall(_ >= 0)
      }
    }, tests = 100)
  }

  test("proportional shares track capacity ratios within rounding distance") {
    check(Prop.forAll(capsGen, Gen.choose(1L, 100000L)) { (caps, total) =>
      val shares = Assignment.proportional(caps, total)
      val capSum = caps.values.sum
      capSum <= 0 || shares.forall { case (k, s) =>
        math.abs(s - total * caps(k) / capSum) <= caps.size
      }
    })
  }

  test("classify partitions the node set into disjoint, exhaustive classes") {
    check(Prop.forAll(capsGen, Gen.choose(0.0, 0.9)) { (caps, tol) =>
      val c = Capacity.classify(caps, tol)
      (c.helpees ++ c.medians ++ c.helpers) == caps.keySet &&
        (c.helpees & c.medians).isEmpty && (c.helpees & c.helpers).isEmpty &&
        (c.medians & c.helpers).isEmpty
    })
  }

  test("NNLS satisfies KKT on arbitrary PSD systems and never leaves the cone") {
    val sysGen = for {
      d <- Gen.choose(1, 6)
      m <- Gen.listOfN(d * d, Gen.choose(-2.0, 2.0))
      b <- Gen.listOfN(d, Gen.choose(-5.0, 5.0))
    } yield (d, m, b)
    check(Prop.forAll(sysGen) { case (d, mFlat, bList) =>
      val m = Array.tabulate(d, d)((i, j) => mFlat(i * d + j))
      // A = MᵀM + 0.1·I: symmetric positive definite by construction
      val a = Array.tabulate(d, d)((i, j) =>
        (0 until d).map(k => m(k)(i) * m(k)(j)).sum + (if (i == j) 0.1 else 0.0))
      val b = bList.toArray
      val x = graft.ml.NNLS.solve(a.map(_.clone()), b.clone(), sweeps = 5000)
      val g = Array.tabulate(d)(j => (0 until d).map(k => a(j)(k) * x(k)).sum - b(j))
      (0 until d).forall { j =>
        x(j) >= 0.0 &&
          (if (x(j) > 1e-10) math.abs(g(j)) < 1e-6 else g(j) >= -1e-6)
      }
    }, tests = 100)
  }
}
