package graft.dedup

import graft.SparkSpec
import graft.queries.CorpusQueries
import org.apache.spark.sql.functions._

class LshRecallAuditSpec extends SparkSpec {
  import spark.implicits._

  // Base sentences long enough to produce many shingles, plus mutated
  // copies at graded overlap levels so several jaccard bands populate.
  private lazy val corpus = {
    val words = (0 until 60).map(i => s"tok$i")
    def doc(drop: Int, salt: Int) =
      (words.drop(drop) ++ (0 until drop).map(i => s"alt$salt-$i")).mkString(" ")
    val rows = (0L until 30L).flatMap { i =>
      val base = (i * 3 + 1000, doc(0, 0) + s" uniq$i")
      val hi = (i * 3 + 1001, doc(2, i.toInt) + s" uniq$i") // high overlap twin
      val mid = (i * 3 + 1002, doc(12, i.toInt) + s" uniq$i") // mid overlap twin
      Seq(base, hi, mid)
    }
    rows.toDF("doc_id", "text")
  }

  test("report aggregates exactly the truth/detected pair tables") {
    val report = CorpusQueries.lshRecallAuditOver(corpus)
      .collect().map(r => r.getDouble(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // recompute both sides directly and band them in the spec
    val truth = NgramJaccard.invertedIndexPairs(corpus, threshold = 0.5, dfCap = 50)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val det = MinHashLSH.verifiedPairs(corpus, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    truth should not be empty
    val expected = truth.groupBy { case (_, j) => math.min(math.floor(j * 10.0) / 10.0, 0.9) }
      .map { case (band, ps) =>
        val hits = ps.keys.count(det.contains)
        band -> ((ps.size.toLong, hits.toLong, hits.toDouble / ps.size))
      }
    report shouldBe expected
    // every truth band is within [0.5, 0.9] and recall within [0, 1]
    report.foreach { case (band, (n, hit, rec)) =>
      band should (be >= 0.5 and be <= 0.9)
      hit should be <= n
      rec should (be >= 0.0 and be <= 1.0)
    }
  }

  test("identical-duplicate band has full recall") {
    val withExact = corpus.unionByName(
      Seq((9001L, (0 until 60).map(i => s"tok$i").mkString(" ") + " uniq0"))
        .toDF("doc_id", "text"))
    // doc 1000 and 9001 are identical → jaccard 1.0 → 0.9 band, and the
    // banding scheme can never miss an identical signature
    val r = CorpusQueries.lshRecallAuditOver(withExact)
      .filter(col("band") === 0.9).head()
    r.getLong(2) shouldBe r.getLong(1) // n_hit == n_truth... at least for this fixture
    r.getDouble(3) shouldBe 1.0
  }

  test("precision audit (m99) reconciles with a direct verify of every candidate") {
    val report = CorpusQueries.lshPrecisionAuditOver(corpus).collect()
      .map(r => r.getDouble(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4))))
      .toMap
    val jacc = MinHashLSH.verifiedPairsOver(corpus,
      MinHashLSH.candidatePairs(corpus), threshold = 0.0)
      .collect().map(_.getDouble(2))
    jacc should not be empty
    val total = jacc.length.toLong
    val byBand = jacc.groupBy(j => math.min(math.floor(j * 10.0) / 10.0, 0.9))
      .view.mapValues(_.length.toLong).toMap
    report.keySet shouldBe byBand.keySet
    // per-band counts and the cumulative ≥-band curve both reconcile
    report.foreach { case (band, (nCand, fracCand, nGe, prec)) =>
      nCand shouldBe byBand(band)
      fracCand shouldBe nCand.toDouble / total
      val expectGe = byBand.filter(_._1 >= band).values.sum
      nGe shouldBe expectGe
      prec shouldBe expectGe.toDouble / total
    }
    // the lowest band's cumulative count covers every candidate
    report(report.keySet.min)._3 shouldBe total
  }
}
