package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  private def hs(vs: Long*) = vs.map(("g", _)).toDF("g", "h")
  private def sketchOf(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy("g").agg(KmvSketch.kMin(k)(col("h")).as("sk"))
      .select("sk").as[Array[Long]].head()

  test("hand-pinned: k smallest distinct values, sorted, duplicates invisible") {
    sketchOf(hs(10L, 3L, 7L, 3L, 99L, 1L, 7L), k = 4).toSeq shouldBe Seq(1L, 3L, 7L, 10L)
    sketchOf(hs(5L), k = 4).toSeq shouldBe Seq(5L) // sketch IS the set when small
  }

  test("over-k stream keeps exactly the k smallest; order of arrival invisible") {
    val vals = scala.util.Random.shuffle((1L to 100L).toList)
    sketchOf(hs(vals: _*), k = 8).toSeq shouldBe (1L to 8L).toSeq
  }

  test("sketch is invariant to partitioning (a pure function of the item set)") {
    val df = hs((1L to 500L).map(i => i * 37 % 1009): _*)
    val base = sketchOf(df, 16)
    sketchOf(df.repartition(13), 16).toSeq shouldBe base.toSeq
  }

  test("merge path: k smallest of (sketch(A) ∪ sketch(B)) equals the from-scratch union sketch") {
    val a = hs((1L to 300L).map(i => i * 7 % 997): _*)
    val b = hs((1L to 300L).map(i => i * 11 % 997): _*)
    val full = sketchOf(a.union(b), 32)
    // re-aggregate the two finished sketches — the k-bounded merge
    val merged = a.groupBy("g").agg(KmvSketch.kMin(32)(col("h")).as("sk"))
      .union(b.groupBy("g").agg(KmvSketch.kMin(32)(col("h")).as("sk")))
      .select(col("g"), explode(col("sk")).as("h"))
      .groupBy("g").agg(KmvSketch.kMin(32)(col("h")).as("sk"))
      .select("sk").as[Array[Long]].head()
    merged.toSeq shouldBe full.toSeq
  }

  test("k-way fold ≡ pairwise unionSketch chain in any association order ≡ from-scratch (m154 contract)") {
    // three overlapping sets with > k union, so the k-bound actually cuts
    val sets = Seq(
      (1L to 300L).map(i => i * 7 % 9973),
      (1L to 300L).map(i => i * 11 % 9973),
      (1L to 300L).map(i => i * 13 % 9973))
    val k = 64
    val dfs = sets.map(vs => hs(vs: _*))
    val full = sketchOf(dfs.reduce(_ union _), k) // from-scratch over all rows
    // the m154 k-way fold: every sketch's entries re-aggregated at once
    val kway = dfs.map(df => df.groupBy("g").agg(KmvSketch.kMin(k)(col("h")).as("sk")))
      .reduce(_ union _)
      .select(col("g"), explode(col("sk")).as("h"))
      .groupBy("g").agg(KmvSketch.kMin(k)(col("h")).as("sk"))
      .select("sk").as[Array[Long]].head()
    // pairwise unionSketch chains, both association orders
    val Seq(sa, sb, sc) = dfs.map(df => df.groupBy("g")
      .agg(KmvSketch.kMin(k)(col("h")).as("sk")).select("sk").as[Array[Long]].head())
    def lit3(a: Array[Long]) = typedLit(a.toSeq)
    def chain(x: org.apache.spark.sql.Column) =
      spark.range(1).select(x.as("sk")).select("sk").as[Seq[Long]].head()
    val leftAssoc = chain(KmvSketch.unionSketch(
      KmvSketch.unionSketch(lit3(sa), lit3(sb), k), lit3(sc), k))
    val rightAssoc = chain(KmvSketch.unionSketch(
      lit3(sa), KmvSketch.unionSketch(lit3(sb), lit3(sc), k), k))
    kway.toSeq shouldBe full.toSeq
    leftAssoc shouldBe full.toSeq
    rightAssoc shouldBe full.toSeq
  }

  test("distinctEstimate: exact below k; within 10% at 50k distinct with k=256") {
    val small = hs(1L, 2L, 3L).groupBy("g")
      .agg(KmvSketch.distinctEstimate(KmvSketch.kMin(256)(col("h"))).as("est"))
      .select("est").as[Double].head()
    small shouldBe 3.0
    // 50k distinct md5-style hashes: use the house hash48 over ids so
    // the uniformity assumption the estimator needs actually holds
    val big = spark.range(50000)
      .select(lit("g").as("g"), HyperLogLog.hash48(col("id").cast("string")).as("h"))
      .groupBy("g")
      .agg(KmvSketch.distinctEstimate(KmvSketch.kMin(256)(col("h"))).as("est"))
      .select("est").as[Double].head()
    big should be > 45000.0
    big should be < 55000.0
  }

  test("jaccardEstimate: exact (1.0 / 0.0 / true ratio) whenever both sets fit inside the sketches") {
    def j(a: Seq[Long], b: Seq[Long]) = {
      val sa = hs(a: _*).groupBy("g").agg(KmvSketch.kMin(256)(col("h")).as("ska"))
      val sb = hs(b: _*).groupBy("g").agg(KmvSketch.kMin(256)(col("h")).as("skb"))
      sa.crossJoin(sb)
        .select(KmvSketch.jaccardEstimate(col("ska"), col("skb")).as("j"))
        .as[Double].head()
    }
    j(Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)) shouldBe 1.0
    j(Seq(1L, 2L), Seq(3L, 4L)) shouldBe 0.0
    j(Seq(1L, 2L, 3L, 4L), Seq(3L, 4L, 5L, 6L)) shouldBe (2.0 / 6.0) // sets small → K is the full union, estimator exact
  }

  test("empty group never reaches the card (no rows, no sketch)") {
    hs().groupBy("g").agg(KmvSketch.kMin(8)(col("h"))).count() shouldBe 0
  }
}
