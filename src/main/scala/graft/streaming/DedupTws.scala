package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode,
  TimerValues, ValueState}

/** Streaming exact-dedup on Spark 4's `transformWithState` with per-state
  * TTL — the arbitrary-state twin of `dropDuplicatesWithinWatermark`
  * (which bounds state by EVENT time): here state is bounded by
  * PROCESSING-time TTL on the RocksDB store, the right contract when the
  * stream has no trustworthy event-time column (bulk corpus backfills,
  * crawler output). A hash seen within the TTL is dropped; once its state
  * entry expires, the same content is a fresh arrival again — bounded
  * state at 10¹²-sequence scale, by construction.
  *
  * `ttlMs = 0` disables expiry (TTLConfig.NONE + TimeMode.None): exact
  * global dedup with state growing with distinct hashes — the semantics
  * of an unbounded `dropDuplicates`, kept for finite backfills.
  */
object DedupTws {

  class DedupProcessor(ttlMs: Long)
      extends StatefulProcessor[String, String, String] {
    @transient private var seen: ValueState[Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Boolean](
        "seen", Encoders.scalaBoolean,
        if (ttlMs > 0) TTLConfig(java.time.Duration.ofMillis(ttlMs)) else TTLConfig.NONE)

    override def handleInputRows(hash: String, rows: Iterator[String],
        timerValues: TimerValues): Iterator[String] =
      if (seen.exists()) Iterator.empty
      else { seen.update(true); Iterator.single(hash) }
  }

  /** First occurrence of each hash within its TTL window (column name
    * preserved as `content_hash` by the caller's select). */
  def distinctHashes(hashes: Dataset[String], ttlMs: Long = 0L): Dataset[String] = {
    val spark = hashes.sparkSession
    import spark.implicits._
    val timeMode = if (ttlMs > 0) TimeMode.ProcessingTime() else TimeMode.None()
    hashes.groupByKey(identity)
      .transformWithState(new DedupProcessor(ttlMs), timeMode, OutputMode.Append())
  }
}
