package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Shared local session for all specs. One JVM-wide session (getOrCreate)
  * keeps the suite fast; tests must not mutate global catalog state they
  * don't own. */
trait SparkSpec extends AnyFunSuite with Matchers {
  lazy val spark: SparkSession = SparkSpec.session
  def sf(name: String): String = s"/root/testdata/$name"
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", s"/tmp/graft-test-warehouse-${ProcessHandle.current().pid()}")
      // Scan spread OFF for the spec session: PlanSpec pins the 100 TB
      // plan shape, and the size-gated spread (Tables.spreadSmallScan)
      // vanishes above its row gate by construction — so the spread-off
      // plan IS the scale plan the pins exist to protect. The spread's
      // own gate arithmetic, plan shape and result parity are pinned by
      // ScanSpreadSpec (which toggles this conf locally — suites run
      // sequentially in the forked test JVM); spread-ON correctness of
      // all 203 registered queries is gated by Verify + the DuckDB
      // oracle at sf0.001/sf0.01, which run with the production default.
      .config("spark.graft.scanSpread.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
