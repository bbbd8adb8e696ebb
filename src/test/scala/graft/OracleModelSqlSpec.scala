package graft

import graft.similarity.{Ivf, IvfPq, Pq}

/** Pins the trained-model oracle replay plumbing (OracleCapture +
  * OracleModelSql): the capture registry round-trips models under their
  * query keys, the SQL builders inline the exact model doubles as
  * literals, and a real query run deposits its model so oracleSql gains
  * the entry. The DuckDB side is exercised by the driver (and
  * tools/oracle_check.py locally) — here we pin the Scala-side contract
  * the replay depends on. */
class OracleModelSqlSpec extends SparkSpec {

  private val tinyIvf = Ivf.Model(Seq(Seq(1.0, 0.0), Seq(0.0, 0.5)))
  private val tinyPq = Pq.Model(Seq(
    Seq(Seq(0.25, -1.5), Seq(2.0, 3.0)), // subspace 0, ksub = 2, dsub = 2
    Seq(Seq(-0.125, 4.0), Seq(0.0, 1.0))))

  test("builders inline every model double as a round-trip literal") {
    val sql = OracleModelSql.ivfTopK(tinyIvf, k = 5, nprobe = 2)
    // shortest-round-trip printing: the exact component values appear
    sql should include("[1.0, 0.0]")
    sql should include("[0.0, 0.5]")
    // |c|² precomputed driver-side with the engine's summation order
    sql should include("1.0 - 2.0 * list_dot_product")
    sql should include("0.25 - 2.0 * list_dot_product")

    val pqSql = OracleModelSql.pqAdc(tinyPq, k = 5)
    pqSql should include("(0, 0, [0.25, -1.5])")
    pqSql should include("(1, 1, [0.0, 1.0])")
    // ADC totals must sum in subspace order, not SUM()-reassociated
    pqSql should include("list_sum(list(q.d ORDER BY q.s))")

    val ipqSql = OracleModelSql.ivfPqTopK(IvfPq.Model(tinyIvf, tinyPq), 5, 2)
    ipqSql should include("cells(cell, cv)")
    ipqSql should include("cb(s, c, cv2)")
  }

  test("capture registry round-trips models and drives captured entries") {
    OracleCapture.put("spec_probe", tinyIvf)
    OracleCapture.get[Ivf.Model]("spec_probe") shouldBe Some(tinyIvf)
    // unknown keys stay absent → no oracle entry is fabricated
    OracleCapture.get[Ivf.Model]("spec_never_put") shouldBe None
  }

  test("pca run deposits (mu, v7) and the final-pass replay inlines it") {
    graft.queries.CorpusQueries.pcaTopComponent(spark, sf("sf0.001")).count() should be > 0L
    val st = OracleCapture.get[graft.similarity.PcaPower.IterState]("m63_pca_top_component")
    st should not be empty
    st.get.mu.length shouldBe st.get.v.length
    val sql = OracleModelSql.captured("m63_pca_top_component")
    sql should include("FROM embeddings")
    // the captured iterate appears as a round-trip literal
    sql should include(st.get.v.head.toString)
    sql should include("AS eigenvalue")
    SparkEntry.oracleSql.keySet should contain("m63_pca_top_component")
  }

  test("running the query deposits its model and oracleSql gains the entry") {
    graft.queries.CorpusQueries.annIvf(spark, sf("sf0.001")).count() should be > 0L
    val entries = OracleModelSql.captured
    entries.keySet should contain("m12_ann_ivf")
    // the entry is live SQL over the embeddings table with 16 inlined cells
    entries("m12_ann_ivf") should include("FROM embeddings")
    entries("m12_ann_ivf") should include("range(0, 16)")
    SparkEntry.oracleSql.keySet should contain("m12_ann_ivf")
  }
}
