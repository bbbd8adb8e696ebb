package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UnseenMassSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String, String)]) = {
    val tmp = s"/tmp/graft-unseen-${ProcessHandle.current().pid()}"
    docs.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars",
        org.apache.spark.sql.functions.length($"text").cast("long"))
      .select("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    CorpusQueries.unseenMass(spark, tmp)
      .collect().map(r => r.getString(0) -> r).toMap
  }

  test("hand-computed Good-Turing identity: hapax over token count") {
    // saturated: every token repeats (hapax 0); fresh: all singletons
    val out = run(Seq(
      (1L, "a a b b a b", "saturated"),
      (2L, "one two three four", "fresh")))
    val sat = out("saturated")
    sat.getLong(1) shouldBe 6L // N
    sat.getLong(2) shouldBe 2L // V
    sat.getLong(3) shouldBe 0L // hapax
    sat.getDouble(4) shouldBe 0.0 // saturated: no unseen mass
    val fr = out("fresh")
    fr.getLong(3) shouldBe 4L
    fr.getDouble(4) shouldBe 1.0 // every token novel: keep crawling
    fr.getDouble(5) shouldBe 1.0 // ttr = V/N
  }

  test("mixed source: unseen mass strictly between the extremes") {
    val out = run(Seq((1L, "x x y z", "mix")))("mix")
    out.getLong(1) shouldBe 4L
    out.getLong(3) shouldBe 2L // y, z
    out.getDouble(4) shouldBe 0.5
  }
}
