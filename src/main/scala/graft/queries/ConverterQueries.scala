package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q
import graft.core.Tables
import graft.sources.Converters

/** Provider-converter scalar family (SURVEY.md §2.2): synthetic
  * StatsBomb/Opta/Wyscout-shaped events derived deterministically from the
  * `events` table, converted with the reference's exact formulas and
  * oracle-checked term by term. */
object ConverterQueries {

  val all: Seq[Q] = Seq(

    // P2 + P3 + P7: cell-grid coords (fidelity-inferred per game) and
    // HH:MM:SS.mmm timestamps.
    Q("convert_statsbomb",
      """WITH sb AS (
        |  SELECT event_id, event_id % 20 AS game_id,
        |    1.0::DOUBLE + event_id % 120 + (CASE WHEN event_id % 20 = 0 AND event_id % 3 = 0 THEN 0.5::DOUBLE ELSE 0.0::DOUBLE END) AS loc0,
        |    1.0::DOUBLE + event_id * 3 % 80 AS loc1,
        |    lpad((event_id % 2)::VARCHAR, 2, '0') || ':' ||
        |      lpad((event_id % 45)::VARCHAR, 2, '0') || ':' ||
        |      lpad((event_id % 60)::VARCHAR, 2, '0') || '.' ||
        |      lpad((event_id % 1000)::VARCHAR, 3, '0') AS timestamp
        |  FROM events
        |), fid AS (
        |  SELECT *,
        |    CASE WHEN max(CASE WHEN loc0 % 1 <> 0 OR loc1 % 1 <> 0 THEN 1 ELSE 0 END)
        |              OVER (PARTITION BY game_id) = 1
        |         THEN 0.1::DOUBLE ELSE 1.0::DOUBLE END AS cell_side
        |  FROM sb
        |)
        |SELECT event_id, game_id, cell_side,
        |  least(greatest((loc0 - cell_side / 2) / 120 * 105.0, 0.0), 105.0) AS start_x,
        |  least(greatest(68.0 - (loc1 - cell_side / 2) / 80 * 68.0, 0.0), 68.0) AS start_y,
        |  CAST(string_split(timestamp, ':')[1] AS DOUBLE) * 3600 +
        |    CAST(string_split(timestamp, ':')[2] AS DOUBLE) * 60 +
        |    CAST(string_split(timestamp, ':')[3] AS DOUBLE) AS time_seconds
        |FROM fid""".stripMargin) { (s, dir) =>
      val sb = Tables.events(s, dir).select(
        col("event_id"),
        (col("event_id") % 20).as("game_id"),
        (lit(1.0) + col("event_id") % 120 +
          when(col("event_id") % 20 === 0 && col("event_id") % 3 === 0, 0.5).otherwise(0.0))
          .as("loc0"),
        (lit(1.0) + col("event_id") * 3 % 80).as("loc1"),
        concat(
          lpad((col("event_id") % 2).cast("string"), 2, "0"), lit(":"),
          lpad((col("event_id") % 45).cast("string"), 2, "0"), lit(":"),
          lpad((col("event_id") % 60).cast("string"), 2, "0"), lit("."),
          lpad((col("event_id") % 1000).cast("string"), 3, "0")).as("timestamp"))
      val anyFrac = max(when(col("loc0") % 1 =!= 0 || col("loc1") % 1 =!= 0, 1).otherwise(0))
        .over(Window.partitionBy("game_id")) === 1
      sb.withColumn("cell_side", Converters.fidelityCellSide(anyFrac))
        .select(col("event_id"), col("game_id"), col("cell_side"),
          Converters.statsBombX(col("loc0"), col("cell_side")).as("start_x"),
          Converters.statsBombY(col("loc1"), col("cell_side")).as("start_y"),
          Converters.statsBombTimeSeconds(col("timestamp")).as("time_seconds"))
    },

    // P4 + P6: Opta percent coords (with out-of-range values exercising the
    // clip) and minute/second period offsets.
    Q("convert_opta",
      """SELECT event_id,
        |  least(greatest((event_id * 7 % 110)::DOUBLE - 3.0, 0.0), 100.0) / 100 * 105.0 AS start_x,
        |  least(greatest((event_id * 11 % 108)::DOUBLE - 4.0, 0.0), 100.0) / 100 * 68.0 AS start_y,
        |  (event_id % 100) * 60 + event_id % 60
        |    - (CASE WHEN 1 + event_id % 4 > 1 THEN 2700 ELSE 0 END)
        |    - (CASE WHEN 1 + event_id % 4 > 2 THEN 2700 ELSE 0 END)
        |    - (CASE WHEN 1 + event_id % 4 > 3 THEN 900 ELSE 0 END)
        |    - (CASE WHEN 1 + event_id % 4 > 4 THEN 900 ELSE 0 END) AS time_seconds
        |FROM events""".stripMargin) { (s, dir) =>
      Tables.events(s, dir).select(
        col("event_id"),
        Converters.optaX((col("event_id") * 7 % 110).cast("double") - 3.0).as("start_x"),
        Converters.optaY((col("event_id") * 11 % 108).cast("double") - 4.0).as("start_y"),
        Converters.optaTimeSeconds(col("event_id") % 100, col("event_id") % 60,
          lit(1) + col("event_id") % 4).as("time_seconds"))
    },

    // P5 + P12 + P13: Wyscout y-flip, positions-array split (1 vs 2
    // elements), and tag-array explosion to boolean flags.
    Q("convert_wyscout",
      """WITH wy AS (
        |  SELECT event_id,
        |    CASE WHEN event_id % 3 = 0
        |      THEN [struct_pack(x := (event_id * 7 % 101)::DOUBLE, y := (event_id * 11 % 101)::DOUBLE)]
        |      ELSE [struct_pack(x := (event_id * 7 % 101)::DOUBLE, y := (event_id * 11 % 101)::DOUBLE),
        |            struct_pack(x := (event_id * 13 % 101)::DOUBLE, y := (event_id * 17 % 101)::DOUBLE)]
        |    END AS positions,
        |    [CAST(event_id % 59 AS INT), CAST(event_id * 3 % 59 AS INT)] AS tags
        |  FROM events
        |), pos AS (
        |  SELECT event_id, tags,
        |    positions[1].x AS sx, positions[1].y AS sy,
        |    CASE WHEN len(positions) >= 2 THEN positions[2].x ELSE positions[1].x END AS ex,
        |    CASE WHEN len(positions) >= 2 THEN positions[2].y ELSE positions[1].y END AS ey
        |  FROM wy
        |)
        |SELECT event_id,
        |  least(greatest(sx * 105.0 / 100, 0.0), 105.0) AS start_x,
        |  least(greatest((100.0 - sy) * 68.0 / 100, 0.0), 68.0) AS start_y,
        |  least(greatest(ex * 105.0 / 100, 0.0), 105.0) AS end_x,
        |  least(greatest((100.0 - ey) * 68.0 / 100, 0.0), 68.0) AS end_y,
        |  list_contains(tags, 101) AS tag_goal,
        |  list_contains(tags, 102) AS tag_owngoal,
        |  list_contains(tags, 1401) AS tag_interception,
        |  list_contains(tags, 5) AS tag_5,
        |  list_contains(tags, 42) AS tag_42
        |FROM pos""".stripMargin) { (s, dir) =>
      val wy = Tables.events(s, dir).select(
        col("event_id"),
        when(col("event_id") % 3 === 0,
          array(struct(
            (col("event_id") * 7 % 101).cast("double").as("x"),
            (col("event_id") * 11 % 101).cast("double").as("y"))))
          .otherwise(array(
            struct(
              (col("event_id") * 7 % 101).cast("double").as("x"),
              (col("event_id") * 11 % 101).cast("double").as("y")),
            struct(
              (col("event_id") * 13 % 101).cast("double").as("x"),
              (col("event_id") * 17 % 101).cast("double").as("y")))).as("positions"),
        array((col("event_id") % 59).cast("int"), (col("event_id") * 3 % 59).cast("int")).as("tags"))
      wy.select(
        col("event_id"),
        Converters.wyscoutX(Converters.wyscoutStartX(col("positions"))).as("start_x"),
        Converters.wyscoutY(Converters.wyscoutStartY(col("positions"))).as("start_y"),
        Converters.wyscoutX(Converters.wyscoutEndX(col("positions"))).as("end_x"),
        Converters.wyscoutY(Converters.wyscoutEndY(col("positions"))).as("end_y"),
        Converters.hasTag(col("tags"), 101).as("tag_goal"),
        Converters.hasTag(col("tags"), 102).as("tag_owngoal"),
        Converters.hasTag(col("tags"), 1401).as("tag_interception"),
        Converters.hasTag(col("tags"), 5).as("tag_5"),
        Converters.hasTag(col("tags"), 42).as("tag_42"))
    },

    // S6/G7-style minutes-played: per user, active span capped at the first
    // failure event (conditional aggregation, one hash agg).
    Q("convert_minutes_played",
      """SELECT user_id,
        |  count(*) AS n_events,
        |  (coalesce(min(CASE WHEN event_type = 'error' THEN epoch_us(ts) END),
        |            max(epoch_us(ts))) - min(epoch_us(ts))) / 60000000.0 AS minutes_played
        |FROM events GROUP BY user_id""".stripMargin) { (s, dir) =>
      val us = unix_micros(col("ts").cast("timestamp"))
      Tables.events(s, dir)
        .groupBy("user_id")
        .agg(
          count(lit(1)).as("n_events"),
          ((coalesce(min(when(col("event_type") === "error", us)), max(us)) - min(us))
            / 60000000.0).as("minutes_played"))
    })
}
