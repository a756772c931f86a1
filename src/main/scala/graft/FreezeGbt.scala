package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.queries.MlQueries
import graft.vaep.{FrozenGbt, VaepModel}

/** One-shot generator for the frozen VAEP GBT resource
  * (`src/main/resources/graft/vaep_gbt_frozen.txt`): a seeded fit of the
  * scores/concedes GBT pair on the sf0.001 actions corpus over a compact
  * raw-column feature set, frozen to literal trees via [[FrozenGbt]].
  * Re-run only to regenerate the committed resource:
  *
  *   sbt "runMain graft.FreezeGbt [outPath]"
  */
object FreezeGbt {

  /** Raw-ish a0 features whose SQL mirror is a one-line expression each —
    * keeps the frozen-predict oracle compact while exercising the full
    * tree-walk chain. */
  val FeatureCols: Array[String] = Array(
    "start_x_a0", "start_y_a0", "end_x_a0", "end_y_a0", "dx_a0", "dy_a0",
    "time_seconds_a0", "start_dist_to_goal_a0", "type_id")

  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0)
      else "src/main/resources/graft/vaep_gbt_frozen.txt"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val data = MlQueries.assembled(spark, "/root/testdata/sf0.001").cache()
    val m = VaepModel.fit(data, FeatureCols, maxIter = 5, maxDepth = 3, seed = 42L)
    val text =
      "model scores\n" + FrozenGbt.serialize(FrozenGbt.fromMl(m.scores, FeatureCols)) +
      "model concedes\n" + FrozenGbt.serialize(FrozenGbt.fromMl(m.concedes, FeatureCols))
    Files.createDirectories(Paths.get(out).getParent)
    Files.write(Paths.get(out), text.getBytes(StandardCharsets.UTF_8))
    println(s"wrote $out (${text.length} bytes)")
    spark.stop()
  }
}
