package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.core.{SynActions, Tables}

/** Table-layout behavior the 100 TB design relies on (SURVEY §4.3):
  * partition pruning on a bucketed directory layout and predicate pushdown
  * into the parquet scan — asserted against the physical plan, not just
  * row counts. */
class StorageLayoutSpec extends SparkSpec {

  test("bucket(game_id) directory layout prunes partitions at scan time") {
    val dir = Files.createTempDirectory("graft_prune").toString
    val actions = SynActions.fromEvents(Tables.events(spark, "/root/testdata/sf0.001"))
      .withColumn("game_bucket", col("game_id") % 8)
    actions.write.partitionBy("game_bucket").mode("overwrite").parquet(dir)

    val all = spark.read.parquet(dir)
    val pruned = all.filter(col("game_bucket") === 3)
    val plan = pruned.queryExecution.executedPlan.toString
    // the bucket predicate becomes a PARTITION filter (evaluated against
    // directory names, before any file is opened), not a data filter
    val pf = "PartitionFilters: \\[[^\\]]*".r.findFirstIn(plan).getOrElse("")
    assert(pf.contains("game_bucket") && pf.contains("= 3"), plan.take(800))
    assert(pruned.count() ==
      actions.filter(col("game_id") % 8 === 3).count())
  }

  test("predicates and projections push into the parquet scan") {
    val dir = Files.createTempDirectory("graft_push").toString
    SynActions.fromEvents(Tables.events(spark, "/root/testdata/sf0.001"))
      .write.mode("overwrite").parquet(dir)
    val q = spark.read.parquet(dir)
      .filter(col("type_id") === 11 && col("result_id") === 1)
      .select("game_id", "action_id")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("IsNotNull(type_id)"), plan.take(800))
    // column pruning: the scan schema carries only the needed columns
    val readSchema = "ReadSchema: [^\\n]*".r.findFirstIn(plan).getOrElse("")
    assert(readSchema.contains("game_id") && readSchema.contains("type_id"))
    assert(!readSchema.contains("start_x") && !readSchema.contains("bodypart_id"),
      readSchema)
  }
}
