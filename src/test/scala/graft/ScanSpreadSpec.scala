package graft

import org.apache.spark.sql.DataFrame

/** Pins for the adaptive scan spread (Tables.spreadSmallScan, round-20
  * optimization): the gate arithmetic, the plan shape on both sides of
  * the gate, and result parity spread-on vs spread-off. The spec
  * session keeps the spread OFF (SparkSpec — PlanSpec pins the scale
  * shape, which is exactly the spread-off plan); this suite flips the
  * conf locally and restores it, relying on the forked test JVM running
  * suites sequentially. The spread is OPT-IN per call site
  * (Tables.documentsSpread / embeddingsSpread / spreadSmallScan) — the
  * blanket form measured a net loss on light-scan consumers
  * (OPTIMIZATION_r20.md). */
class ScanSpreadSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("gate fires on a small corpus: one REPARTITION_BY_NUM hash exchange on the key") {
    withConf("spark.graft.scanSpread.enabled" -> "true") {
      val p = plan(Tables.documentsSpread(spark, dir))
      p should include("REPARTITION_BY_NUM")
      p should include("hashpartitioning(doc_id")
    }
  }

  test("above maxRows the plan is identical to the unspread one (the 100 TB side)") {
    // expression ids differ between constructions; normalize them away
    def norm(p: String): String = p.replaceAll("#\\d+", "#")
    val off = norm(plan(Tables.documents(spark, dir)))
    val gated = withConf(
      "spark.graft.scanSpread.enabled" -> "true",
      "spark.graft.scanSpread.maxRows" -> "10") {
      norm(plan(Tables.documentsSpread(spark, dir)))
    }
    gated shouldBe off
    (gated should not).include("REPARTITION_BY_NUM")
  }

  test("below 2 x rowsPerTask the spread stays off — task overhead must never exceed the work") {
    val gated = withConf(
      "spark.graft.scanSpread.enabled" -> "true",
      "spark.graft.scanSpread.rowsPerTask" -> "1000000") {
      plan(Tables.documentsSpread(spark, dir))
    }
    (gated should not).include("REPARTITION_BY_NUM")
  }

  test("plain Tables.documents never spreads — the opt-in contract") {
    withConf("spark.graft.scanSpread.enabled" -> "true") {
      (plan(Tables.documents(spark, dir)) should not).include("REPARTITION_BY_NUM")
    }
  }

  test("pushdown and pruning survive the spread: filters and ReadSchema still reach the scan") {
    withConf("spark.graft.scanSpread.enabled" -> "true") {
      val p = plan(Tables.documentsSpread(spark, dir)
        .filter(org.apache.spark.sql.functions.col("text").isNotNull)
        .select("doc_id", "text"))
      p should include("PushedFilters: [IsNotNull(text)]")
      p should include("ReadSchema: struct<doc_id:bigint,text:string>")
    }
  }

  test("result parity: a sketch aggregate and a heavy-gram card are spread-invariant") {
    def rows(df: DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    val cmsOff = rows(graft.queries.CorpusQueries.cmsFrequencyCard(spark, dir))
    val hgOff = rows(graft.queries.CorpusQueries.heavyGrams(spark, dir))
    withConf("spark.graft.scanSpread.enabled" -> "true") {
      rows(graft.queries.CorpusQueries.cmsFrequencyCard(spark, dir)) shouldBe cmsOff
      rows(graft.queries.CorpusQueries.heavyGrams(spark, dir)) shouldBe hgOff
    }
  }
}
