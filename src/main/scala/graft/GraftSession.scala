package graft

import org.apache.spark.sql.SparkSession

/** Opinionated session factory — the one place the engine's required
  * session configuration lives, so a user switching from the reference
  * cannot mis-assemble it:
  *
  *  - UTC session timezone (timestamp/date math parity, SURVEY §7.4.6);
  *  - AQE on (runtime coalescing + skew-join splitting, DESIGN §3);
  *  - graft native expressions registered via SparkSessionExtensions;
  *  - ANSI left at the Spark 4 default (on) — the operators are written
  *    to it (`try_element_at`, overflow-safe minhash arithmetic).
  *
  * The harness mains (Verify/Bench) build their own sessions to the
  * driver's contract; this factory is the library entry point.
  */
object GraftSession {

  def builder(master: String = "local[*]"): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")

  /** Build (or reuse) the session and make sure the extensions are live
    * even when an earlier session without them already exists. */
  def getOrCreate(master: String = "local[*]"): SparkSession = {
    val s = builder(master).getOrCreate()
    graft.functions.GraftFunctions.ensureRegistered(s)
    silenceBoundedWindowWarning()
    s
  }

  /** DOCUMENTED log4j suppression of WindowExec's "No Partition Defined"
    * warning (WARN → ERROR on that one logger).
    *
    * Every unpartitioned window in this engine runs over a frame that is
    * BOUNDED BY CONSTRUCTION — k+1 rows (PrioritySample), the top-V
    * vocabulary (SourceDivergence/Bm25/TfIdf), `buckets` rows
    * (NoveltyCurve), the (bands, rows) design grid (LshPlanner), the
    * token vocabulary (Bpe.tokenCoverage), or a per-source card — never
    * corpus-sized data (corpus-scale ranks go through
    * [[graft.operators.PrefixSum]], the house rule). Spark cannot see
    * that proof, so it warns on every run; the warning is the one
    * alarming line left in an otherwise clean bench tail, and each
    * occurrence has been audited (round-13 verdict). Partitioning by a
    * constant would silence it semantically, but Catalyst's
    * EliminateWindowPartitions folds constant partition keys right back
    * out. Suppressing the logger is honest ONLY because the boundedness
    * is enforced elsewhere: PlanSpec pins the bounded-frame plans, and
    * any new corpus-sized global window would fail the scale sweep's
    * max_task_shuffle_read stats long before a log line would be read. */
  def silenceBoundedWindowWarning(): Unit =
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
}
