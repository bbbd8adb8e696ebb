package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // Optional 3rd+ args: query names to dump only those (dev triage —
    // the driver's 2-arg invocation still sweeps everything).
    val Array(sfDir, outDir) = args.take(2)
    val subset = args.drop(2).toSet
    // Fail loudly on a typo'd subset name (mirrors Bench's validation) —
    // a silently-ignored name reads as "query passed" during triage.
    val unknown = subset -- SparkEntry.queries.keySet
    require(unknown.isEmpty,
      s"unknown queries in subset: ${unknown.toSeq.sorted.mkString(", ")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // GraftSession.builder IS the session contract (UTC, the explicit
    // ANSI pin from round-15 ask #7, AQE, aggregate threshold,
    // extensions) — review r19d: the harness mains build on the shared
    // factory and add only their own knobs, so a future contract pin
    // cannot be missed in one of three hand-rolled copies.
    val spark = GraftSession.builder(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.silenceBoundedWindowWarning()
    GraftSession.silenceSnapshotFreeWarning()
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => subset.isEmpty || subset.contains(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // Queries share no state: drop any localCheckpoint snapshots the
      // query pinned (DedupClusters/CorpusPipeline/SimHash) so 61 queries
      // don't accumulate dead blocks in one session.
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
