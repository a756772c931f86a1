package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Q
import graft.core.{SynActions, Tables}
import graft.core.SynActions.OracleCte
import graft.operators.AtomicOps

/** Atomic-SPADL converter chain (SURVEY.md §2.2 P18-P19, §2.3 N16-N18),
  * with stage-by-stage and full-chain oracles. The SQL mirrors each
  * insertion stage: lead-window extras, UNION ALL with a fractional
  * interleave key, row_number resequence. */
object AtomicQueries {

  private def actions(s: SparkSession, dir: String): DataFrame =
    SynActions.fromEvents(Tables.events(s, dir))

  private val baseCols =
    "game_id, period_id, aid_frac, time_seconds, team_id, player_id, " +
      "start_x, start_y, end_x, end_y, type_id, result_id, bodypart_id, seq"

  /** SQL for one insert-extras stage: `in` CTE → named output CTE. */
  private def stageSql(in: String, out: String, leadCols: Seq[String],
                       extraSelect: String): String = {
    val leads = leadCols.map(c =>
      s"lead($c) OVER (PARTITION BY game_id ORDER BY period_id, action_id) AS nx_$c")
      .mkString(", ")
    s""", ${out}_s AS (
       |  SELECT *, $leads FROM $in
       |), ${out}_e AS (
       |  $extraSelect
       |), ${out}_u AS (
       |  SELECT game_id, period_id, CAST(action_id AS DOUBLE) AS aid_frac, time_seconds,
       |    team_id, player_id, start_x, start_y, end_x, end_y, type_id, result_id, bodypart_id, seq
       |  FROM $in
       |  UNION ALL
       |  SELECT $baseCols FROM ${out}_e
       |), $out AS (
       |  SELECT game_id,
       |    CAST(row_number() OVER (PARTITION BY game_id ORDER BY period_id, aid_frac) AS BIGINT) - 1 AS action_id,
       |    period_id, time_seconds, team_id, player_id, start_x, start_y, end_x, end_y,
       |    type_id, result_id, bodypart_id, seq
       |  FROM ${out}_u
       |)""".stripMargin
  }

  private def passesStage(in: String, out: String): String = stageSql(in, out,
    Seq("team_id", "player_id", "period_id", "time_seconds", "type_id"),
    s"""SELECT game_id, period_id,
       |    CAST(action_id AS DOUBLE) + 0.1 AS aid_frac,
       |    (time_seconds + nx_time_seconds) / 2 AS time_seconds,
       |    CASE WHEN ty = 10 THEN nx_team_id ELSE team_id END AS team_id,
       |    CASE WHEN ty IN (25, 26) THEN player_id ELSE nx_player_id END AS player_id,
       |    end_x AS start_x, end_y AS start_y, end_x AS end_x, end_y AS end_y,
       |    ty AS type_id, CAST(-1 AS INT) AS result_id, CAST(0 AS INT) AS bodypart_id, seq
       |  FROM (
       |    SELECT *, CASE WHEN result_id = 2 THEN CAST(26 AS INT)
       |      WHEN (nx_type_id = 22 AND NOT team_id = nx_team_id) OR nx_type_id = 2 THEN CAST(25 AS INT)
       |      WHEN team_id <> nx_team_id THEN CAST(10 AS INT)
       |      ELSE CAST(23 AS INT) END AS ty
       |    FROM ${out}_s
       |    WHERE type_id IN (0, 1, 2, 4, 3, 5, 6, 18, 22)
       |      AND period_id = nx_period_id
       |      AND nx_type_id NOT IN (10, 9, 16, 14, 15, 17)
       |  )""".stripMargin)

  private def dribblesStage(in: String, out: String): String = stageSql(in, out,
    Seq("team_id", "player_id", "period_id", "time_seconds", "start_x", "start_y",
      "type_id", "bodypart_id"),
    s"""SELECT game_id, CAST(nx_period_id AS INT) AS period_id,
       |    CAST(action_id AS DOUBLE) + 0.1 AS aid_frac,
       |    (time_seconds + nx_time_seconds) / 2 AS time_seconds,
       |    nx_team_id AS team_id, nx_player_id AS player_id,
       |    end_x AS start_x, end_y AS start_y, nx_start_x AS end_x, nx_start_y AS end_y,
       |    CAST(21 AS INT) AS type_id, CAST(1 AS INT) AS result_id, CAST(0 AS INT) AS bodypart_id, seq
       |  FROM ${out}_s
       |  WHERE team_id = nx_team_id AND nx_type_id <> 8
       |    AND nx_type_id <> 11 AND nx_bodypart_id <> 1
       |    AND (end_x - nx_start_x) * (end_x - nx_start_x) + (end_y - nx_start_y) * (end_y - nx_start_y) >= 9.0
       |    AND (end_x - nx_start_x) * (end_x - nx_start_x) + (end_y - nx_start_y) * (end_y - nx_start_y) <= 3600.0
       |    AND nx_time_seconds - time_seconds < 10.0
       |    AND period_id = nx_period_id""".stripMargin)

  private def shotsStage(in: String, out: String): String = stageSql(in, out,
    Seq("period_id", "type_id"),
    s"""SELECT game_id, period_id,
       |    CAST(action_id AS DOUBLE) + 0.1 AS aid_frac,
       |    time_seconds, team_id, player_id,
       |    end_x AS start_x, end_y AS start_y, end_x AS end_x, end_y AS end_y,
       |    CASE WHEN result_id = 3 THEN CAST(28 AS INT)
       |         WHEN type_id IN (11, 13, 12) AND result_id = 1 THEN CAST(27 AS INT)
       |         ELSE CAST(25 AS INT) END AS type_id,
       |    CAST(-1 AS INT) AS result_id, bodypart_id, seq
       |  FROM ${out}_s
       |  WHERE (type_id IN (11, 13, 12) AND result_id = 1)
       |     OR result_id = 3
       |     OR (type_id IN (11, 13, 12) AND nx_type_id IN (5, 6, 22) AND period_id = nx_period_id)""".stripMargin)

  private def foulsStage(in: String, out: String): String = stageSql(in, out,
    Seq("period_id"),
    s"""SELECT game_id, period_id,
       |    CAST(action_id AS DOUBLE) + 0.1 AS aid_frac,
       |    time_seconds, team_id, player_id,
       |    end_x AS start_x, end_y AS start_y, end_x AS end_x, end_y AS end_y,
       |    CASE WHEN result_id = 5 THEN CAST(30 AS INT) ELSE CAST(29 AS INT) END AS type_id,
       |    CAST(-1 AS INT) AS result_id, bodypart_id, seq
       |  FROM ${out}_s
       |  WHERE result_id IN (4, 5)""".stripMargin)

  /** Full SPADL→atomic chain as a CTE block ending in `atomic`. */
  private[queries] def fullChainCte: String =
    s"${passesStage("actions", "c1")} ${dribblesStage("c1", "c2")} ${shotsStage("c2", "c3")} ${foulsStage("c3", "c4")}, atomic AS (\n$atomicProject\nFROM c4)"

  private val atomicProject =
    """SELECT game_id, action_id, period_id, time_seconds, team_id, player_id,
      |  start_x AS x, start_y AS y,
      |  end_x - start_x AS dx, end_y - start_y AS dy,
      |  CASE WHEN type_id IN (5, 6) THEN CAST(31 AS INT)
      |       WHEN type_id IN (3, 4, 13) THEN CAST(32 AS INT)
      |       ELSE type_id END AS type_id,
      |  bodypart_id, seq""".stripMargin

  val all: Seq[Q] = Seq(

    Q("atomic_extra_passes",
      s"""$OracleCte ${passesStage("actions", "c1")}
         |SELECT * FROM c1""".stripMargin) { (s, dir) =>
      AtomicOps.extraFromPasses(actions(s, dir))
    },

    Q("atomic_extra_shots",
      s"""$OracleCte ${shotsStage("actions", "c1")}
         |SELECT * FROM c1""".stripMargin) { (s, dir) =>
      AtomicOps.extraFromShots(actions(s, dir))
    },

    Q("atomic_extra_fouls",
      s"""$OracleCte ${foulsStage("actions", "c1")}
         |SELECT * FROM c1""".stripMargin) { (s, dir) =>
      AtomicOps.extraFromFouls(actions(s, dir))
    },

    Q("atomic_convert_full",
      s"""$OracleCte ${passesStage("actions", "c1")} ${dribblesStage("c1", "c2")} ${shotsStage("c2", "c3")} ${foulsStage("c3", "c4")}
         |$atomicProject
         |FROM c4""".stripMargin) { (s, dir) =>
      AtomicOps.convertToAtomic(actions(s, dir))
    })
}
