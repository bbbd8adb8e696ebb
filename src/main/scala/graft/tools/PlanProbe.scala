package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratch: execute a query, then print the FINAL adaptive plan
  * (shows runtime stage reuse that the pre-execution explain hides). */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder()
      .appName("graft-planprobe").master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      args.drop(1).foreach { name =>
        val df = graft.SparkEntry.queries(name)(spark, dir)
        df.collect()
        println(s"\n===== $name (post-execution) =====")
        println(df.queryExecution.executedPlan.toString)
      }
    } finally spark.stop()
  }
}
