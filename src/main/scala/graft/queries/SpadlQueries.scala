package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q
import graft.core.{Spadl, SynActions, Tables}
import graft.core.SynActions.{OracleCte, Wg}
import graft.operators.SpadlOps

/** SPADL normalizer operators (SURVEY.md §2.2–§2.5), each wired to the
  * deterministic synthetic action stream and a value-golden DuckDB oracle. */
object SpadlQueries {

  private val actionCols = Seq("game_id", "action_id", "period_id",
    "time_seconds", "team_id", "player_id", "start_x", "start_y", "end_x",
    "end_y", "type_id", "result_id", "bodypart_id", "seq")

  private def actions(s: SparkSession, dir: String): DataFrame =
    SynActions.fromEvents(Tables.events(s, dir))

  private val selectActions =
    "SELECT game_id, action_id, period_id, time_seconds, team_id, player_id, " +
      "start_x, start_y, end_x, end_y, type_id, result_id, bodypart_id, seq"

  private val wgDef =
    "WINDOW wg AS (PARTITION BY game_id ORDER BY period_id, time_seconds, seq)"

  private def dimValues(names: Seq[String]): String =
    names.zipWithIndex.map { case (n, i) => s"($i, '$n')" }.mkString(", ")

  val all: Seq[Q] = Seq(

    Q("spadl_actions_base",
      s"$OracleCte $selectActions FROM actions") { (s, dir) =>
      actions(s, dir).select(actionCols.map(col): _*)
    },

    Q("spadl_fix_clearances",
      s"""$OracleCte
         |SELECT game_id, action_id, period_id, time_seconds, team_id, player_id,
         |  start_x, start_y,
         |  CASE WHEN type_id = 18 THEN coalesce(lead(start_x) OVER wg, end_x) ELSE end_x END AS end_x,
         |  CASE WHEN type_id = 18 THEN coalesce(lead(start_y) OVER wg, end_y) ELSE end_y END AS end_y,
         |  type_id, result_id, bodypart_id, seq
         |FROM actions $wgDef""".stripMargin) { (s, dir) =>
      SpadlOps.fixClearances(actions(s, dir)).select(actionCols.map(col): _*)
    },

    Q("spadl_fix_direction",
      s"""$OracleCte
         |SELECT game_id, action_id, period_id, time_seconds, team_id, player_id,
         |  CASE WHEN team_id <> game_id % 4 THEN 105.0 - start_x ELSE start_x END AS start_x,
         |  CASE WHEN team_id <> game_id % 4 THEN 68.0 - start_y ELSE start_y END AS start_y,
         |  CASE WHEN team_id <> game_id % 4 THEN 105.0 - end_x ELSE end_x END AS end_x,
         |  CASE WHEN team_id <> game_id % 4 THEN 68.0 - end_y ELSE end_y END AS end_y,
         |  type_id, result_id, bodypart_id, seq
         |FROM actions""".stripMargin) { (s, dir) =>
      SpadlOps.fixDirectionOfPlay(actions(s, dir), SynActions.homeTeamId)
        .select(actionCols.map(col): _*)
    },

    Q("spadl_add_names",
      s"""$OracleCte
         |SELECT a.game_id, a.action_id, a.seq, a.type_id, a.result_id, a.bodypart_id,
         |  t.type_name, r.result_name, b.bodypart_name
         |FROM actions a
         |LEFT JOIN (VALUES ${dimValues(Spadl.actiontypes)}) t(type_id, type_name) ON a.type_id = t.type_id
         |LEFT JOIN (VALUES ${dimValues(Spadl.results)}) r(result_id, result_name) ON a.result_id = r.result_id
         |LEFT JOIN (VALUES ${dimValues(Spadl.bodyparts)}) b(bodypart_id, bodypart_name) ON a.bodypart_id = b.bodypart_id""".stripMargin) { (s, dir) =>
      SpadlOps.addNames(actions(s, dir)).select("game_id", "action_id", "seq",
        "type_id", "result_id", "bodypart_id", "type_name", "result_name",
        "bodypart_name")
    },

    Q("spadl_add_dribbles",
      s"""$OracleCte, nx AS (
         |  SELECT *,
         |    lead(team_id) OVER wg AS nx_team_id,
         |    lead(player_id) OVER wg AS nx_player_id,
         |    lead(period_id) OVER wg AS nx_period_id,
         |    lead(time_seconds) OVER wg AS nx_time_seconds,
         |    lead(start_x) OVER wg AS nx_start_x,
         |    lead(start_y) OVER wg AS nx_start_y,
         |    lead(type_id) OVER wg AS nx_type_id,
         |    lead(bodypart_id) OVER wg AS nx_bodypart_id
         |  FROM actions $wgDef
         |), dribbles AS (
         |  SELECT game_id, nx_period_id AS period_id,
         |    CAST(action_id AS DOUBLE) + 0.1 AS aid_frac,
         |    (time_seconds + nx_time_seconds) / 2 AS time_seconds,
         |    nx_team_id AS team_id, nx_player_id AS player_id,
         |    end_x AS start_x, end_y AS start_y,
         |    nx_start_x AS end_x, nx_start_y AS end_y,
         |    CAST(21 AS INT) AS type_id, CAST(1 AS INT) AS result_id,
         |    CAST(0 AS INT) AS bodypart_id, seq
         |  FROM nx
         |  WHERE team_id = nx_team_id AND nx_type_id <> 8
         |    AND nx_type_id <> 11 AND nx_bodypart_id <> 1
         |    AND (end_x - nx_start_x) * (end_x - nx_start_x) + (end_y - nx_start_y) * (end_y - nx_start_y) >= 9.0
         |    AND (end_x - nx_start_x) * (end_x - nx_start_x) + (end_y - nx_start_y) * (end_y - nx_start_y) <= 3600.0
         |    AND nx_time_seconds - time_seconds < 10.0
         |    AND period_id = nx_period_id
         |), unioned AS (
         |  SELECT game_id, period_id, CAST(action_id AS DOUBLE) AS aid_frac, time_seconds,
         |    team_id, player_id, start_x, start_y, end_x, end_y, type_id, result_id, bodypart_id, seq
         |  FROM actions
         |  UNION ALL
         |  SELECT game_id, period_id, aid_frac, time_seconds, team_id, player_id,
         |    start_x, start_y, end_x, end_y, type_id, result_id, bodypart_id, seq
         |  FROM dribbles
         |)
         |SELECT game_id,
         |  CAST(row_number() OVER (PARTITION BY game_id ORDER BY period_id, aid_frac) AS BIGINT) - 1 AS action_id,
         |  period_id, time_seconds, team_id, player_id, start_x, start_y, end_x, end_y,
         |  type_id, result_id, bodypart_id, seq
         |FROM unioned""".stripMargin) { (s, dir) =>
      SpadlOps.addDribbles(actions(s, dir)).select(actionCols.map(col): _*)
    },

    Q("spadl_fix_interceptions",
      s"""$OracleCte
         |SELECT game_id, action_id, seq, type_id,
         |  CASE WHEN type_id = 10 AND NOT (lead(team_id) OVER wg IS NOT DISTINCT FROM team_id)
         |       THEN CAST(0 AS INT) ELSE result_id END AS result_id
         |FROM actions $wgDef""".stripMargin) { (s, dir) =>
      SpadlOps.fixInterceptions(actions(s, dir))
        .select("game_id", "action_id", "seq", "type_id", "result_id")
    },

    Q("spadl_fix_unintentional_touches",
      s"""$OracleCte, nx AS (
         |  SELECT *,
         |    type_id = 0 AND lead(type_id) OVER wg = 19
         |      AND NOT (lead(team_id) OVER wg IS NOT DISTINCT FROM team_id)
         |      AND (lead(team_id, 2) OVER wg IS NOT DISTINCT FROM team_id) AS deflected,
         |    lead(start_x, 2) OVER wg AS nx2_x, lead(start_y, 2) OVER wg AS nx2_y
         |  FROM actions $wgDef
         |)
         |SELECT game_id, action_id, seq,
         |  CASE WHEN deflected THEN nx2_x ELSE end_x END AS end_x,
         |  CASE WHEN deflected THEN nx2_y ELSE end_y END AS end_y,
         |  CASE WHEN deflected THEN CAST(1 AS INT) ELSE result_id END AS result_id
         |FROM nx""".stripMargin) { (s, dir) =>
      SpadlOps.fixUnintentionalTouches(actions(s, dir))
        .select("game_id", "action_id", "seq", "end_x", "end_y", "result_id")
    },

    Q("spadl_next_real_action",
      s"""$OracleCte
         |SELECT game_id, action_id, seq,
         |  first_value(CASE WHEN type_id <> 20 THEN start_x END IGNORE NULLS)
         |    OVER (PARTITION BY game_id ORDER BY period_id, time_seconds, seq
         |          ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_real_x,
         |  first_value(CASE WHEN type_id <> 20 THEN start_y END IGNORE NULLS)
         |    OVER (PARTITION BY game_id ORDER BY period_id, time_seconds, seq
         |          ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_real_y
         |FROM actions""".stripMargin) { (s, dir) =>
      SpadlOps.nextRealActionStart(actions(s, dir))
        .select("game_id", "action_id", "seq", "next_real_x", "next_real_y")
    })
}
