package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LangIdSpec extends SparkSpec {
  import spark.implicits._

  // a miniature labeled set in the planted-phrase languages (disjoint
  // word stocks), several docs per language with length variation
  private lazy val labeled = {
    val rows = for {
      (lang, phrase) <- LangId.PlantedPhrases
      r <- 1 to 6
    } yield (((lang.hashCode.toLong & 0xffff) * 10 + r), lang,
      ((phrase + " ") * (1 + r % 3)).trim)
    rows.toDF("doc_id", "lang", "text")
  }

  test("bucket hashing matches the oracle's ('0x' || hex12)::BIGINT % D arithmetic") {
    // 26933543002402 = DuckDB's ('0x' || substr(md5('ab'), 1, 12))::BIGINT,
    // computed independently in DuckDB — pins the cross-engine contract
    val md = java.security.MessageDigest.getInstance("MD5")
    LangId.bucketOf(md, "ab") shouldBe (26933543002402L % LangId.D).toInt
    LangId.bucketOf(md, "ab") shouldBe 290 % LangId.D
  }

  test("normalization: trim spaces only, lowercase, collapse space runs") {
    LangId.normalize("  Der  Die   und ") shouldBe "der die und"
    LangId.normalize("") shouldBe ""
    LangId.normalize("   ") shouldBe ""
  }

  test("unicode semantics match the oracle: simple per-codepoint lower, codepoint gram boundaries") {
    // DuckDB lower('İ') = 'i' (utf8proc SIMPLE case mapping); Java's
    // full-string toLowerCase would give 'i̇' (2 codepoints) and every
    // downstream gram would diverge — the normalization must use the
    // per-codepoint simple mapping (review r16).
    LangId.normalize("İ") shouldBe "i"
    LangId.normalize("STRASSE ẞ") shouldBe "strasse ß"
    // gram boundaries count CODEPOINTS (DuckDB substr/len), never UTF-16
    // units: an astral char is ONE gram position, not a split surrogate
    // pair. n_grams for cp codepoints = Σ_{len∈2..4} max(0, cp − len + 1).
    val model = LangId.train(labeled, iters = 20)
    val docs = Seq(
      (1L, "xx", "a😀b"), // a😀b → 3 codepoints → 2+1+0 = 3 grams
      (2L, "xx", "😀😁") // 😀😁 → 2 codepoints → 1 gram
    ).toDF("doc_id", "lang", "text")
    val out = LangId.score(docs, model).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_grams")).toMap
    out(1L) shouldBe 3L
    out(2L) shouldBe 1L
  }

  test("trains to perfect separation on the labeled set; margins are positive") {
    val model = LangId.train(labeled)
    model.classes.toSeq shouldBe LangId.PlantedPhrases.map(_._1)
    val scored = LangId.score(labeled, model).collect()
    scored.length shouldBe labeled.count()
    scored.foreach { r =>
      r.getAs[String]("pred_lang") shouldBe r.getAs[String]("lang")
      r.getAs[Double]("margin") should be > 0.0
      r.getAs[Long]("n_grams") should be > 0L
    }
  }

  test("early stop triggers and the loss certificate is monotone") {
    val m = LangId.train(labeled)
    m.losses.length should be < 500
    m.losses.zip(m.losses.tail).foreach { case (a, b) => b should be <= a + 1e-12 }
    m.losses.last should be < 0.1
  }

  test("training is bit-identical under repartitioning (exact fixed-point gradients)") {
    val base = LangId.train(labeled, iters = 40)
    val a = LangId.train(labeled.repartition(7), iters = 40)
    val b = LangId.train(labeled.coalesce(1), iters = 40)
    a.w.map(_.toSeq).toSeq shouldBe base.w.map(_.toSeq).toSeq
    b.w.map(_.toSeq).toSeq shouldBe base.w.map(_.toSeq).toSeq
    a.losses.toSeq shouldBe base.losses.toSeq
    a.classes.toSeq shouldBe base.classes.toSeq
  }

  test("scoring arithmetic: z, argmax and margin reproduce a driver-side integer recount") {
    val model = LangId.train(labeled, iters = 60)
    val wq = model.quantized
    val k = model.classes.length
    val scored = LangId.score(labeled, model).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("pred_lang"), r.getAs[Double]("margin"),
          r.getAs[Long]("n_grams")))).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    labeled.collect().foreach { row =>
      val t = LangId.normalize(row.getAs[String]("text"))
      val zq = new Array[Long](k)
      var n = 0L
      Seq(2, 3, 4).foreach { len =>
        (0 to t.length - len).foreach { i =>
          val idx = LangId.bucketOf(md, t.substring(i, i + len))
          (0 until k).foreach(c => zq(c) += wq(c)(idx))
          n += 1
        }
      }
      val best = zq.zipWithIndex.maxBy { case (z, c) => (z, -c.toLong) }._2
      val second = zq.zipWithIndex.filter(_._2 != best)
        .maxBy { case (z, c) => (z, -c.toLong) }._1
      val margin = ((zq(best) - second).toDouble / LangId.QScale32) / n.toDouble
      scored(row.getAs[Long]("doc_id")) shouldBe
        ((model.classes(best), margin, n))
    }
  }

  test("gram-less and null-text documents degrade per contract") {
    val model = LangId.train(labeled, iters = 30)
    val docs = Seq(
      (1L, "xx", "a"),     // 1 normalized char → no grams → unknown
      (2L, "xx", "   "),   // whitespace-only → no grams → unknown
      (3L, "xx", null.asInstanceOf[String]) // null → excluded entirely
    ).toDF("doc_id", "lang", "text")
    val out = LangId.score(docs, model).collect()
      .map(r => r.getLong(0) -> ((r.getString(2), r.getDouble(3), r.getLong(4)))).toMap
    out.keySet shouldBe Set(1L, 2L)
    out(1L) shouldBe (("unknown", 0.0, 0L))
    out(2L) shouldBe (("unknown", 0.0, 0L))
  }

  test("empty labeled set degrades to the empty model; scoring then reports unknown") {
    val none = Seq.empty[(Long, String, String)].toDF("doc_id", "lang", "text")
    val m = LangId.train(none)
    m.classes shouldBe empty
    m.nTrain shouldBe 0L
    val out = LangId.score(Seq((1L, "en", "some real text here")).toDF(
      "doc_id", "lang", "text"), m).collect()
    out.head.getString(2) shouldBe "unknown"
  }

  test("train discloses per-class support; counts sum to nTrain") {
    val m = LangId.train(labeled, iters = 10)
    m.classes.length shouldBe LangId.PlantedPhrases.size
    m.classCounts.toSeq shouldBe Seq.fill(m.classes.length)(6L)
    m.classCounts.sum shouldBe m.nTrain
  }

  test("scoreCalibrated: quantized confidence in [1/k, 1], argmax matches score, gramless docs absent") {
    val model = LangId.train(labeled, iters = 30)
    val docs = Seq(
      (1L, "en", "the of and to in a is that"),
      (2L, "de", "x")).toDF("doc_id", "lang", "text")
    val out = LangId.scoreCalibrated(docs, model).collect()
    out.length shouldBe 1 // the 1-char doc has no grams → no posterior
    val r = out(0)
    r.getLong(0) shouldBe 1L
    r.getString(2) shouldBe LangId.score(docs, model)
      .filter(col("doc_id") === 1L).head().getString(2)
    // conf = 1/Σexp(z_c − z_best) ∈ [1/k, 1]; quantized once to bigint
    val k = model.classes.length
    r.getLong(3) should be >= (1e9 / k).toLong
    r.getLong(3) should be <= 1000000000L
  }

  test("m137/m67 on an empty real corpus: exactly the planted block, all on the diagonal") {
    val dir = s"/tmp/graft-langid-empty-${ProcessHandle.current().pid()}"
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val scored = graft.queries.CorpusQueries.langIdScore(spark, dir)
    scored.count() shouldBe LangId.PlantedCount.toLong
    scored.filter(col("pred_lang") =!= col("lang")).count() shouldBe 0L
    val conf = graft.queries.CorpusQueries.langConfusion(spark, dir).collect()
    conf.length shouldBe LangId.PlantedPhrases.size // pure diagonal
    conf.foreach { r =>
      r.getAs[String]("pred_lang") shouldBe r.getAs[String]("lang")
      r.getAs[Double]("share") shouldBe 1.0
    }
  }
}
