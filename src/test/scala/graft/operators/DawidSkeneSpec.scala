package graft.operators

import graft.SparkSpec

class DawidSkeneSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed one-EM-step posteriors (all arithmetic dyadic-exact)") {
    // n=4, majority split 2/2; gate confusions work out to quarters, so
    // every posterior is an exact IEEE value that can be asserted with ==
    val votes = Seq(
      (1L, 1L, 1L, 1L), // maj 1
      (2L, 1L, 1L, 0L), // maj 1
      (3L, 0L, 0L, 0L), // maj 0
      (4L, 0L, 1L, 0L)  // maj 0
    ).toDF("doc_id", "g_a", "g_b", "g_c")
    val out = DawidSkene.fuse(votes, Seq("g_a", "g_b", "g_c"))
      .collect().map(r => r.getLong(0) -> r).toMap
    // sens: a=3/4, b=3/4, c=1/2; spec: a=3/4, b=1/2, c=3/4; priors 1/2.
    // d2 (1,1,0): L1 = 1/2·3/4·3/4·1/2 = 9/64, L0 = 1/2·1/4·1/2·3/4 = 3/64
    out(2L).getDouble(5) shouldBe 0.75
    out(2L).getLong(6) shouldBe 1L
    // d4 (0,1,0): L1 = 1/2·1/4·3/4·1/2 = 3/64, L0 = 1/2·3/4·1/2·3/4 = 9/64
    out(4L).getDouble(5) shouldBe 0.25
    out(4L).getLong(6) shouldBe 0L
    // unanimous docs land beyond their split-vote neighbours
    out(1L).getDouble(5) should be > out(2L).getDouble(5)
    out(3L).getDouble(5) should be < out(4L).getDouble(5)
    out.values.map(_.getLong(4)).toSeq.sorted shouldBe Seq(0L, 0L, 1L, 1L)
  }

  test("unanimous corpus: empty minority class is smoothed, posterior is exactly 1") {
    val votes = Seq((1L, 1L, 1L, 1L), (2L, 1L, 1L, 1L))
      .toDF("doc_id", "g_a", "g_b", "g_c")
    val out = DawidSkene.fuse(votes, Seq("g_a", "g_b", "g_c")).collect()
    // pi0 = 0 kills L0; smoothing keeps the confusion ratios defined
    out.foreach(_.getDouble(5) shouldBe 1.0)
    out.foreach(_.getLong(6) shouldBe 1L)
  }

  test("WHO votes keep matters: the reliable gate's lone keep outranks a noisy gate's") {
    // gate a tracks the majority on docs 1–6; b and c are noisier.
    // d7 and d5 both have exactly one keep vote — d7's comes from the
    // reliable gate, so its posterior must rank strictly higher, and
    // both above the unanimous drop d6. (Bare majority can't see this.)
    val votes = Seq(
      (1L, 1L, 1L, 0L), (2L, 1L, 0L, 1L), (3L, 1L, 1L, 1L),
      (4L, 0L, 0L, 1L), (5L, 0L, 1L, 0L), (6L, 0L, 0L, 0L),
      (7L, 1L, 0L, 0L)
    ).toDF("doc_id", "g_a", "g_b", "g_c")
    val out = DawidSkene.fuse(votes, Seq("g_a", "g_b", "g_c"))
      .collect().map(r => r.getLong(0) -> r).toMap
    Seq(5L, 6L, 7L).foreach(out(_).getLong(4) shouldBe 0L) // all majority-drop
    out(7L).getDouble(5) should be > out(5L).getDouble(5)
    out(5L).getDouble(5) should be > out(6L).getDouble(5)
  }

  test("ties go to keep and the ds relabel can overrule the majority") {
    // two gates, one vote each way -> majority tie -> keep by contract
    val votes = Seq((1L, 1L, 0L), (2L, 0L, 1L), (3L, 1L, 1L))
      .toDF("doc_id", "g_a", "g_b")
    val out = DawidSkene.fuse(votes, Seq("g_a", "g_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    out(1L) shouldBe 1L
    out(2L) shouldBe 1L
  }
}
