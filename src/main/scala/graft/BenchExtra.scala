package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-6 optimization harness (guide §1): times individual declared
  * queries through the same noop sink as the frozen driver bench, with
  * per-query repeat counts, job labels, and optional formatted-plan dumps —
  * so each optimization's before/after evidence can be captured without
  * touching the frozen `Bench.scala`.
  *
  * Usage:
  *   runMain graft.BenchExtra [name ...]         time the named queries
  *   runMain graft.BenchExtra all                time every declared query
  *   env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 4),
  *        BENCHX_ROUNDS (default 3, min-of-N like the driver bench),
  *        BENCHX_PLAN_DIR (when set: write <name>.txt explain("formatted")
  *        dumps there and skip timing).
  *
  * Special pseudo-query names (the headline pipeline's phases):
  *   valuation / valuation_packed — the frozen bench's two headline jobs.
  */
object BenchExtra {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val rounds = sys.env.get("BENCHX_ROUNDS").flatMap(_.toIntOption).getOrElse(3)
    val planDir = sys.env.get("BENCHX_PLAN_DIR")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.maxFields", "1200")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val names: Seq[String] =
      if (args.isEmpty || args.sameElements(Array("all"))) SparkEntry.queries.keys.toSeq.sorted
      else args.toSeq

    def build(name: String): DataFrame = SparkEntry.queries(name)(spark, sfDir)

    planDir match {
      case Some(pd) =>
        Files.createDirectories(Paths.get(pd))
        for (name <- names if SparkEntry.queries.contains(name)) {
          val df = build(name)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.write(Paths.get(pd, s"$name.txt"), txt.getBytes("UTF-8"))
          println(s"PLAN $name -> $pd/$name.txt")
        }
      case None =>
        // warmup at the smallest SF so JIT/codegen costs don't skew round 1
        try {
          Bench.valuationPipeline(spark, "/root/testdata/sf0.001")
        } catch { case _: Throwable => () }
        val best = scala.collection.mutable.Map[String, Double]()
        for (r <- 1 to rounds; name <- names) {
          spark.sparkContext.setJobDescription(s"benchx:$name#$r")
          val t0 = System.nanoTime()
          try {
            name match {
              case "valuation" => Bench.valuationPipeline(spark, sfDir)
              case "valuation_packed" =>
                Bench.valuationPipelinePacked(spark,
                  core.SynActions.fromEvents(core.Tables.events(spark, sfDir)))
              case _ =>
                build(name).write.mode("overwrite").format("noop").save()
            }
            val sec = (System.nanoTime() - t0) / 1e9
            best(name) = math.min(best.getOrElse(name, Double.MaxValue), sec)
            println(f"ROUND $r $name%-34s $sec%8.3f s")
          } catch {
            case e: Throwable => println(s"FAIL $name: $e")
          }
          spark.sparkContext.setJobDescription(null)
        }
        println("== min over " + rounds + " rounds ==")
        for (name <- names if best.contains(name))
          println(f"BENCHX ${best(name)}%10.3f  $name")
    }
    spark.stop()
  }
}
