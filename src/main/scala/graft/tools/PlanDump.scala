package graft.tools

import org.apache.spark.sql.SparkSession

/** Developer tool: print the formatted physical plan for one or more
  * registered queries against a given sf dir — the ".explain and iterate"
  * loop from the build notes, runnable without a REPL.
  *
  * Usage: runMain graft.tools.PlanDump <sfDir> <queryName> [queryName...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <sfDir> <query> [query...]")
    val dir = args(0)
    val spark = SparkSession.builder()
      .appName("graft-plandump")
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[8]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      args.drop(1).foreach { name =>
        val q = graft.SparkEntry.queries.getOrElse(
          name, sys.error(s"unknown query: $name"))
        println(s"\n===== $name =====")
        q(spark, dir).explain("formatted")
      }
    } finally spark.stop()
  }
}
