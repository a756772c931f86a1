package graft

import org.apache.spark.sql.SparkSession

/** Plan-shape audit: prints exchange/sort/window/codegen counts per driver
  * query (and the full formatted plan when a name is given), so "one
  * exchange per window chain" claims are checked against the actual
  * physical plan rather than asserted.
  *
  * Usage: runMain graft.PlanAudit [sfDir] [queryName]
  */
object PlanAudit {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val only = args.lift(1)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.codegen.maxFields", "1200")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val names = only.map(Seq(_)).getOrElse(SparkEntry.queries.keys.toSeq.sorted)
    for (name <- names) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.executedPlan.toString
      def count(pat: String) = pat.r.findAllIn(plan).length
      val exchanges = count("Exchange hashpartitioning") + count("Exchange rangepartitioning")
      val broadcasts = count("BroadcastExchange")
      val sorts = count("(?m)^\\s*[+:*-]*\\s*Sort ")
      val windows = count("Window ") + count("WindowExec")
      val wscg = count("\\*\\(\\d+\\)")
      val scans = count("FileScan|Scan parquet")
      println(f"$name%-32s exchanges=$exchanges%2d broadcast=$broadcasts%2d " +
        f"sorts=$sorts%2d windows=$windows%2d wscg=$wscg%2d scans=$scans%2d")
      if (only.isDefined) {
        println(df.queryExecution.executedPlan.treeString)
      }
    }
    spark.stop()
  }
}
