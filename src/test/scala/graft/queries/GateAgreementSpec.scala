package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** m101: the κ matrix must reconcile with a direct recount of the three
  * gates it composes — the same differential discipline as the
  * calibration and precision-audit specs. */
class GateAgreementSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("pair marginals and kappa reconcile with a direct recount of the gates") {
    val report = CorpusQueries.gateAgreement(spark, dir).collect()
      .map(r => r.getAs[String]("pair") -> r).toMap
    report.keySet shouldBe Set("rule_vs_cls", "rule_vs_ppl", "cls_vs_ppl")

    // rebuild the three per-doc gates independently
    val docs = graft.Tables.documents(spark, dir)
    val model = graft.text.QualityClassifier.train(docs)
    val cls = graft.text.QualityClassifier.score(docs, model).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("label"), r.getAs[Long]("pred")))).toMap
    val ppl = CorpusQueries.pplBuckets(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (if (r.getAs[String]("bucket") != "tail") 1L else 0L)).toMap
    val gates = cls.keySet.intersect(ppl.keySet).toSeq.map { id =>
      (cls(id)._1, cls(id)._2, ppl(id))
    }
    gates should not be empty

    def expect(a: Seq[Long], b: Seq[Long]): (Long, Long, Long, Long) = {
      val n = a.length.toLong
      (n, a.sum, b.sum, a.zip(b).count { case (x, y) => x == y }.toLong)
    }
    val byPair = Map(
      "rule_vs_cls" -> expect(gates.map(_._1), gates.map(_._2)),
      "rule_vs_ppl" -> expect(gates.map(_._1), gates.map(_._3)),
      "cls_vs_ppl" -> expect(gates.map(_._2), gates.map(_._3)))

    report.foreach { case (pair, r) =>
      val (n, posA, posB, agree) = byPair(pair)
      r.getAs[Long]("n") shouldBe n
      r.getAs[Long]("pos_a") shouldBe posA
      r.getAs[Long]("pos_b") shouldBe posB
      r.getAs[Long]("n_agree") shouldBe agree
      val pO = agree.toDouble / n
      val pE = (posA.toDouble * posB + (n - posA).toDouble * (n - posB)) / (n.toDouble * n)
      r.getAs[Double]("p_o") shouldBe pO
      r.getAs[Double]("p_e") shouldBe pE
      if (pE < 1.0) {
        val kappa = r.getAs[Double]("kappa")
        kappa shouldBe (pO - pE) / (1.0 - pE)
        kappa should (be >= -1.0 and be <= 1.0)
      }
    }
  }

}
