package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Unit pins for the shared exact fixed-point GD loop — the stop rule
  * is exercised directly on synthetic integer loss schedules, without a
  * Spark session. */
class FixedPointGdSpec extends AnyFunSuite with Matchers {

  private def q(x: Double): BigInt =
    BigInt(math.rint(x * FixedPointGd.QScale).toLong)

  /** A step function that replays a scripted per-iteration loss sum and
    * a zero gradient (weights stay 0 — only the stop rule is under
    * test). */
  private def scripted(losses: Seq[Double]): (Array[Double] => Array[BigInt], () => Int) = {
    var i = -1
    val step = (_: Array[Double]) => {
      i += 1
      Array(q(losses(math.min(i, losses.size - 1))), BigInt(0))
    }
    (step, () => i + 1)
  }

  test("stops after StopPatience consecutive low-progress iterations") {
    // drop 1.0 → 0.5 in two big steps, then deltas of 1e-9 (≪ drop/1000)
    val sched = Seq(1.0, 0.5) ++ (1 to 20).map(k => 0.5 - k * 1e-9)
    val (step, calls) = scripted(sched)
    val (_, losses) = FixedPointGd.loop(
      n = 1L, dim = 1, iters = 100, lr = 0.0, stopInv = 1000L, step)
    // iteration 0 sets `first`; iterations 1..2 are big steps; the
    // low-progress run then needs StopPatience consecutive hits
    losses.length shouldBe calls()
    losses.length shouldBe 2 + FixedPointGd.StopPatience
  }

  test("stopInv = 0 disables the stop — the full budget runs") {
    val (step, _) = scripted(Seq.fill(50)(0.3))
    val (_, losses) = FixedPointGd.loop(1L, 1, 50, 0.0, 0L, step)
    losses.length shouldBe 50
  }

  test("a loss INCREASE counts as no-progress (diverging runs stop early, never hide)") {
    // strictly increasing after iteration 0: progress is negative, drop
    // is negative — (prev − cur)·inv ≤ first − cur holds immediately
    val sched = (0 to 50).map(k => 1.0 + 0.1 * k)
    val (step, _) = scripted(sched)
    val (_, losses) = FixedPointGd.loop(1L, 1, 50, 0.0, 1000L, step)
    losses.length shouldBe 1 + FixedPointGd.StopPatience
  }

  test("steady genuine progress never trips the rule") {
    // constant absolute drop per iteration: delta·1000 > total drop for
    // the first 999 iterations by construction
    val sched = (0 to 200).map(k => 100.0 - k * 0.1)
    val (step, _) = scripted(sched)
    val (_, losses) = FixedPointGd.loop(1L, 1, 200, 0.0, 1000L, step)
    losses.length shouldBe 200
  }

  test("weight update arithmetic matches the documented expression") {
    // one weight, constant gradient sum g: w -= lr/n · (g/QScale) per step
    val g = q(0.25)
    val step = (_: Array[Double]) => Array(q(1.0), g)
    val (w, losses) = FixedPointGd.loop(n = 5L, dim = 1, iters = 3, lr = 2.0,
      stopInv = 0L, step)
    w(0) shouldBe -3 * (2.0 / 5.0 * (g.toDouble / FixedPointGd.QScale)) +- 1e-15
    losses.foreach(_ shouldBe (1.0 / 5.0) +- 1e-15)
  }

  test("ExactAcc: lane flush never loses or double-counts near the flush boundary") {
    val acc = new FixedPointGd.ExactAcc(1)
    val big = (1L << 61)
    acc.add(0, big); acc.add(0, big); acc.add(0, big) // forces a flush
    acc.add(0, -1L)
    acc.sums(0) shouldBe BigInt(big) * 3 - 1
  }
}
