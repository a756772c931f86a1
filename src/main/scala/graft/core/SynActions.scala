package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic SPADL-shaped action stream derived from the driver's
  * `events` table.
  *
  * The socceraction-domain operators run over soccer action tuples; the
  * driver's oracle gate runs DuckDB SQL over the shared parquet tables. This
  * derivation bridges the two: a pure-arithmetic mapping events → actions
  * that Spark and DuckDB compute bit-identically (integer modular arithmetic
  * plus one IEEE-exact double division), so every downstream operator gets a
  * value-golden SQL oracle.
  *
  * All arithmetic stays within 2^53 so double results are exact; ordering is
  * made deterministic with the unique `seq` (= event_id) tiebreaker —
  * replacing the reference's reliance on pandas stable mergesort
  * (`socceraction/spadl/statsbomb.py:110`).
  */
object SynActions {
  val NumGames = 25L
  val EpochBaseMicros = 1704067200000000L // 2024-01-01T00:00:00Z

  /** Per-game ordering windows shared by all operators. */
  val W = Window.partitionBy("game_id", "period_id").orderBy("time_seconds", "seq")
  val Wg = Window.partitionBy("game_id").orderBy("period_id", "time_seconds", "seq")

  def fromEvents(events: DataFrame): DataFrame = fromEvents(events, NumGames)

  def fromEvents(events: DataFrame, numGames: Long): DataFrame =
    projectEvents(events, numGames)
      .withColumn("action_id", row_number().over(Wg).cast("long") - 1)

  /** The map-only part of the derivation (no dense `action_id`): every
    * column is per-row arithmetic, so this projection is valid on a
    * STREAMING DataFrame too (the windowed `action_id` is not). */
  def projectEvents(events: DataFrame, numGames: Long = NumGames): DataFrame = {
    val base = events.select(
      (col("event_id") % numGames).as("game_id"),
      (lit(1) + col("user_id") % 2).cast("int").as("period_id"),
      // parquet ts is TIMESTAMP_NTZ; cast interprets it in the session tz
      // (pinned UTC), matching DuckDB's epoch_us on the naive timestamp.
      ((unix_micros(col("ts").cast("timestamp")) - EpochBaseMicros) / lit(1000000000.0))
        .as("time_seconds"),
      (col("user_id") % 4).as("team_id"),
      col("user_id").as("player_id"),
      (col("event_id") * 7 % 1051 / lit(10.0)).as("start_x"),
      (col("event_id") * 11 % 681 / lit(10.0)).as("start_y"),
      (col("event_id") * 13 % 1051 / lit(10.0)).as("end_x"),
      (col("event_id") * 17 % 681 / lit(10.0)).as("end_y"),
      (col("event_id") % 23).cast("int").as("type_id"),
      (col("event_id") * 5 % 6).cast("int").as("result_id"),
      (col("event_id") * 7 % 6).cast("int").as("bodypart_id"),
      col("event_id").as("seq"))
    base
  }

  /** Synthetic home team per game (stand-in for the games dimension that the
    * reference passes as `home_team_id`, `socceraction/spadl/base.py:23`). */
  def homeTeamId: Column = col("game_id") % 4

  /** DuckDB CTE computing the identical derivation; prefix for oracle SQL. */
  val OracleCte: String =
    s"""WITH actions0 AS (
       |  SELECT event_id % $NumGames AS game_id,
       |         CAST(1 + user_id % 2 AS INT) AS period_id,
       |         (epoch_us(ts) - $EpochBaseMicros) / 1000000000.0 AS time_seconds,
       |         user_id % 4 AS team_id,
       |         user_id AS player_id,
       |         event_id * 7 % 1051 / 10.0 AS start_x,
       |         event_id * 11 % 681 / 10.0 AS start_y,
       |         event_id * 13 % 1051 / 10.0 AS end_x,
       |         event_id * 17 % 681 / 10.0 AS end_y,
       |         CAST(event_id % 23 AS INT) AS type_id,
       |         CAST(event_id * 5 % 6 AS INT) AS result_id,
       |         CAST(event_id * 7 % 6 AS INT) AS bodypart_id,
       |         event_id AS seq
       |  FROM events
       |), actions AS (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY game_id ORDER BY period_id, time_seconds, seq) AS BIGINT) - 1 AS action_id
       |  FROM actions0
       |)""".stripMargin
}
