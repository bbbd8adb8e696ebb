package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dawid–Skene label fusion — majority-vote initialization plus ONE EM
  * step (Dawid & Skene 1979's confusion-matrix model for pooling
  * unreliable annotators — public literature). The modern pipeline use:
  * several cheap quality gates (rule battery, learned classifier,
  * perplexity cut — or LLM judges) vote keep/drop per document, and
  * instead of a bare majority the fuser estimates each gate's
  * sensitivity/specificity against the majority and re-scores every
  * document by posterior odds — a unanimous verdict from three
  * error-prone gates and a split verdict led by the RELIABLE gate stop
  * being ties. m101 (Cohen's κ) reports whether the gates agree; this
  * operator decides what to do when they don't.
  *
  * One step, not iterated-to-convergence: the M-step (confusion
  * estimates from majority labels) and E-step (posterior re-score) run
  * once, so the output is a closed-form function of exact counts — no
  * float fixed-point whose iteration count could differ between
  * engines. Laplace smoothing ((a+1)/(n+2)) keeps every estimate in
  * (0,1) even when a class or a gate is constant.
  *
  * Determinism: every confusion/prior statistic derives from exact
  * LONG counts in one global aggregate; the per-doc posterior is a
  * fixed-operand-order product over the gate list (vote-column order),
  * so no double ever depends on partition merge order.
  *
  * Scale shape (100 TB): the votes frame streams through ONE global
  * aggregate (count/sum partials — a 1-row exchange) whose result
  * broadcasts back onto the votes for the posterior projection; with
  * `votes` pinned by the caller, the corpus is read once. State is
  * O(gates), rows out = rows in. Zero collects.
  */
object DawidSkene {

  /** Fuse binary vote columns into (input columns…, maj_label, p_keep,
    * ds_label). `maj_label` = majority with ties to keep; `p_keep` =
    * one-EM-step posterior P(keep | votes); `ds_label` = p_keep ≥ 0.5.
    * Vote columns must be 0/1 longs; `voteCols` order fixes the
    * posterior's operand order (the cross-engine replay contract). */
  def fuse(votes: DataFrame, voteCols: Seq[String]): DataFrame = {
    require(voteCols.nonEmpty, "need at least one vote column")
    val k = voteCols.size
    val maj = (voteCols.map(col).reduce(_ + _) * 2 >= k).cast("long")
    val v = votes.withColumn("maj_label", maj)
    // One global aggregate: class sizes + per-gate confusion counts.
    val statCols: Seq[Column] =
      Seq(count(lit(1)).as("n"), sum("maj_label").as("n1")) ++
        voteCols.flatMap { g =>
          Seq(
            sum(((col(g) === 1) && (col("maj_label") === 1)).cast("long"))
              .as(s"a_$g"),
            sum(((col(g) === 0) && (col("maj_label") === 0)).cast("long"))
              .as(s"b_$g"))
        }
    val stats = v.agg(statCols.head, statCols.tail: _*)
    val n0 = col("n") - col("n1")
    val pi1 = col("n1").cast("double") / col("n").cast("double")
    val pi0 = n0.cast("double") / col("n").cast("double")
    // Laplace-smoothed sensitivity / specificity per gate.
    def sens(g: String): Column =
      (col(s"a_$g") + lit(1L)).cast("double") / (col("n1") + lit(2L)).cast("double")
    def spec(g: String): Column =
      (col(s"b_$g") + lit(1L)).cast("double") / (n0 + lit(2L)).cast("double")
    // Posterior odds: fixed left-assoc product in voteCols order.
    val l1 = voteCols.foldLeft(pi1) { (acc, g) =>
      acc * when(col(g) === 1, sens(g)).otherwise(lit(1.0) - sens(g))
    }
    val l0 = voteCols.foldLeft(pi0) { (acc, g) =>
      acc * when(col(g) === 0, spec(g)).otherwise(lit(1.0) - spec(g))
    }
    val pKeep = l1 / (l1 + l0)
    v.crossJoin(broadcast(stats))
      .select((votes.columns.map(col).toSeq :+ col("maj_label") :+
        pKeep.as("p_keep") :+ (pKeep >= 0.5).cast("long").as("ds_label")): _*)
  }
}
