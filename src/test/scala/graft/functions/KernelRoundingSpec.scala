package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property sweep of the fixed-point rounding kernels (r15 verdict #6):
  * `halfUpLong`/`round6`'s fast paths must agree with
  * `BigDecimal.setScale(..., HALF_UP)` — the exact Spark `round()`
  * semantic and the kernels' own fallback arm — over the FULL input
  * range the trainer feeds them (|r·x·10⁶| ≤ 10⁶ for halfUpLong,
  * [0, 1] frequencies for round6), not just the trainer fixtures the
  * bit-identity test pins. The 1e-9/1e-8 ambiguity windows are a
  * heuristic; these properties are the proof obligation: any double for
  * which the floor-based fast path disagrees with the BigDecimal
  * reference falsifies them.
  */
class KernelRoundingSpec extends AnyFunSuite {

  private def refRound0(v: Double): Long =
    BigDecimal(v).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  private def refRound6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def check(p: Prop, tests: Int = 2000): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(tests), p)
    assert(res.passed, res.status.toString)
  }

  test("halfUpLong == BigDecimal HALF_UP over the kernel's |v| <= 1e6 range") {
    check(Prop.forAll(Gen.chooseNum(-1e6, 1e6)) { v =>
      LogisticGradKernel.halfUpLong(v) == refRound0(v)
    })
  }

  test("halfUpLong: adversarial .5 neighborhoods (exact halves, ±ulp, shortest-decimal halves)") {
    val g = for {
      k <- Gen.chooseNum(-1000000L, 1000000L)
      kind <- Gen.choose(0, 4)
    } yield kind match {
      case 0 => k + 0.5
      case 1 => Math.nextUp(k + 0.5)
      case 2 => Math.nextDown(k + 0.5)
      case 3 => k + 0.4999999999
      case _ => k + 0.5000000001
    }
    check(Prop.forAll(g) { v =>
      LogisticGradKernel.halfUpLong(v) == refRound0(v)
    }, tests = 5000)
  }

  test("halfUpLong on the kernel's actual product shape r*x*1e6, r in [-1,1], x in [0,1]") {
    val g = for {
      r <- Gen.chooseNum(-1.0, 1.0)
      x <- Gen.chooseNum(0.0, 1.0)
    } yield r * x * 1e6
    check(Prop.forAll(g) { v =>
      LogisticGradKernel.halfUpLong(v) == refRound0(v)
    }, tests = 5000)
  }

  test("round6 == BigDecimal HALF_UP at scale 6 over [0, 1] frequencies") {
    check(Prop.forAll(Gen.chooseNum(0.0, 1.0)) { v =>
      LogisticGradKernel.round6(v) == refRound6(v)
    })
    // the shape the trainer produces: c/total for small integer counts
    val ratios = for {
      total <- Gen.chooseNum(1L, 100000L)
      c <- Gen.chooseNum(0L, total)
    } yield c.toDouble / total
    check(Prop.forAll(ratios) { v =>
      LogisticGradKernel.round6(v) == refRound6(v)
    }, tests = 5000)
  }

  test("round6: adversarial half-microstep neighborhoods") {
    val g = for {
      k <- Gen.chooseNum(0L, 1000000L)
      kind <- Gen.choose(0, 2)
    } yield kind match {
      case 0 => (k + 0.5) / 1e6
      case 1 => Math.nextUp((k + 0.5) / 1e6)
      case _ => Math.nextDown((k + 0.5) / 1e6)
    }
    check(Prop.forAll(g) { v =>
      LogisticGradKernel.round6(v) == refRound6(v)
    }, tests = 5000)
  }
}
