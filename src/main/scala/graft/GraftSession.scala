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
    s
  }
}
