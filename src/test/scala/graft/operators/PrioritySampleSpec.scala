package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PrioritySampleSpec extends SparkSpec {
  import spark.implicits._

  test("n <= k returns every row with est_weight = its exact weight (tau = 0)") {
    val docs = (0L until 5L).map(i => (i, (i + 1) * 10L)).toDF("doc_id", "w")
    val out = PrioritySample.sample(docs, "doc_id", "w", k = 8).collect()
    out.length shouldBe 5
    out.foreach { r =>
      r.getDouble(3) shouldBe r.getLong(1).toDouble // est_weight == weight
    }
  }

  test("k of n selects the k highest priorities and tau is the runner-up") {
    val docs = (0L until 40L).map(i => (i, i % 9 + 1L)).toDF("doc_id", "w")
    val all = PrioritySample.sample(docs, "doc_id", "w", k = 40)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).sortBy(-_._2)
    val out = PrioritySample.sample(docs, "doc_id", "w", k = 10).collect()
    out.length shouldBe 10
    // The sample is exactly the 10 globally-highest priorities.
    out.map(_.getLong(0)).toSet shouldBe all.take(10).map(_._1).toSet
    // tau = 11th priority; every est_weight is max(w, tau) with that tau.
    val tau = all(10)._2
    out.foreach { r =>
      r.getDouble(3) shouldBe math.max(r.getLong(1).toDouble, tau)
    }
  }

  test("a heavy row is sampled with certainty and reports its exact weight") {
    // One doc carries ~99% of the mass: its priority w/u >= w > any
    // other row's priority ceiling (w_small * 2^33 / 1 can exceed it only
    // if u is astronomically small — not at this fixture), and since
    // w_heavy > tau its estimate is exact.
    val docs = ((0L until 30L).map(i => (i, 5L)) :+ (999L, 100000L))
      .toDF("doc_id", "w")
    val out = PrioritySample.sample(docs, "doc_id", "w", k = 5).collect()
    val heavy = out.find(_.getLong(0) == 999L)
    heavy should be(defined)
    heavy.get.getDouble(3) shouldBe 100000.0
  }

  test("estimator sums near the true total and is deterministic across runs") {
    val docs = (0L until 500L).map(i => (i, i % 50 + 1L)).toDF("doc_id", "w")
    val trueTotal = (0L until 500L).map(_ % 50 + 1L).sum.toDouble
    val run = () => PrioritySample.sample(docs, "doc_id", "w", k = 50)
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1).toSeq
    val a = run()
    a shouldBe run()
    // One deterministic draw, not an expectation — allow a wide band, but
    // the estimate must be the right order of magnitude (DLT variance at
    // k = 50 is a few percent of total^2 for this weight profile).
    val est = a.map(_._3).sum
    est should (be > trueTotal * 0.5 and be < trueTotal * 2.0)
  }
}
