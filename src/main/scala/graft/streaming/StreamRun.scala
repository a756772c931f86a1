package graft.streaming

import java.nio.file.{Files, Path}

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.Trigger

/** Shared run-to-completion harness for the driver's streaming queries:
  * a file/memory stream is executed with `Trigger.AvailableNow` through a
  * checkpointed parquet foreachBatch sink and the sink is read back as the
  * query result. Sink + checkpoint live under one session-scoped temp root
  * that a JVM shutdown hook deletes recursively, so repeated invocations
  * (Verify, min-of-N bench rounds) don't accumulate orphan data. */
object StreamRun {

  private lazy val root: Path = {
    val p = Files.createTempDirectory("graft_stream_run")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRec(p.toFile)))
    p
  }

  private def deleteRec(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRec))
    f.delete(); ()
  }

  /** A temp directory under the session root (deleted at JVM exit) — for
    * streaming queries that need a custom sink instead of [[availableNow]]. */
  def tempDir(prefix: String): String =
    Files.createTempDirectory(root, prefix).toString

  /** Runs `df` (a streaming DataFrame) to completion and returns the
    * materialized result. `complete = true` uses complete output mode with
    * an overwrite-per-micro-batch snapshot sink (streaming aggregations);
    * default is append mode with an append sink. */
  def availableNow(df: DataFrame, complete: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    val out = Files.createTempDirectory(root, "out").toString
    val ckpt = Files.createTempDirectory(root, "ckpt").toString
    val q = df.writeStream
      .outputMode(if (complete) "complete" else "append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: Dataset[Row], _: Long) =>
        b.write.mode(if (complete) "overwrite" else "append").parquet(out)
      }
      .option("checkpointLocation", ckpt)
      .start()
    q.awaitTermination()
    spark.read.parquet(out)
  }
}
