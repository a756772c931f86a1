package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Q
import graft.core.{SynActions, Tables}
import graft.core.SynActions.OracleCte
import graft.operators.RepairOps

/** Neighbor-repair stencils N8–N14 (SURVEY.md §2.3) with value oracles. */
object RepairQueries {

  private def actions(s: SparkSession, dir: String): DataFrame =
    SynActions.fromEvents(Tables.events(s, dir))

  private val wg =
    "WINDOW wg AS (PARTITION BY game_id ORDER BY period_id, time_seconds, seq)"

  val all: Seq[Q] = Seq(

    Q("repair_owngoal_shots",
      s"""$OracleCte
         |SELECT game_id, action_id, seq,
         |  CASE WHEN type_id = 11 AND result_id = 3 THEN 105.0 - end_x ELSE end_x END AS end_x,
         |  CASE WHEN type_id = 11 AND result_id = 3 THEN 68.0 - end_y ELSE end_y END AS end_y,
         |  CASE WHEN type_id = 11 AND result_id = 3 THEN CAST(19 AS INT) ELSE type_id END AS type_id,
         |  result_id
         |FROM actions""".stripMargin) { (s, dir) =>
      RepairOps.fixOwngoals(actions(s, dir))
        .select("game_id", "action_id", "seq", "end_x", "end_y", "type_id", "result_id")
    },

    Q("repair_offside_attach",
      s"""$OracleCte, m AS (
         |  SELECT *, lead(type_id) OVER wg AS nx_type FROM actions $wg
         |)
         |SELECT game_id, action_id, seq, type_id,
         |  CASE WHEN type_id = 0 AND nx_type = 19 THEN CAST(2 AS INT) ELSE result_id END AS result_id
         |FROM m WHERE type_id <> 19""".stripMargin) { (s, dir) =>
      RepairOps.attachOffsides(actions(s, dir))
        .select("game_id", "action_id", "seq", "type_id", "result_id")
    },

    Q("repair_goalkicks",
      s"""$OracleCte, m AS (
         |  SELECT *, lead(team_id) OVER wg AS nx_team FROM actions $wg
         |)
         |SELECT game_id, action_id, seq,
         |  CASE WHEN type_id = 22 THEN 5.0 ELSE start_x END AS start_x,
         |  CASE WHEN type_id = 22 THEN 34.0 ELSE start_y END AS start_y,
         |  CASE WHEN type_id = 22 AND (nx_team IS NOT DISTINCT FROM team_id) THEN CAST(1 AS INT)
         |       WHEN type_id = 22 THEN CAST(0 AS INT)
         |       ELSE result_id END AS result_id
         |FROM m""".stripMargin) { (s, dir) =>
      RepairOps.fixGoalkicks(actions(s, dir))
        .select("game_id", "action_id", "seq", "start_x", "start_y", "result_id")
    },

    Q("repair_simulations",
      s"""$OracleCte, m AS (
         |  SELECT *,
         |    lag(type_id) OVER wg AS pv_type, lag(player_id) OVER wg AS pv_player,
         |    lead(type_id) OVER wg AS nx_type, lead(player_id) OVER wg AS nx_player
         |  FROM actions $wg
         |)
         |SELECT game_id, action_id, seq, type_id,
         |  CASE WHEN type_id = 7 AND nx_type = 8 AND (nx_player IS NOT DISTINCT FROM player_id)
         |       THEN CAST(0 AS INT) ELSE result_id END AS result_id
         |FROM m
         |WHERE NOT (type_id = 8 AND pv_type = 7 AND (pv_player IS NOT DISTINCT FROM player_id))""".stripMargin) { (s, dir) =>
      RepairOps.fixSimulations(actions(s, dir))
        .select("game_id", "action_id", "seq", "type_id", "result_id")
    },

    Q("repair_duels",
      s"""$OracleCte, m AS (
         |  SELECT *,
         |    lag(type_id) OVER wg AS pv1_type, lag(type_id, 2) OVER wg AS pv2_type,
         |    lead(type_id) OVER wg AS nx1_type, lead(type_id, 2) OVER wg AS nx2_type,
         |    lead(start_x, 2) OVER wg AS nx2_x, lead(start_y, 2) OVER wg AS nx2_y
         |  FROM actions $wg
         |)
         |SELECT game_id, action_id, seq,
         |  CASE WHEN type_id = 9 AND nx1_type = 9 AND nx2_type = 20 THEN nx2_x ELSE end_x END AS end_x,
         |  CASE WHEN type_id = 9 AND nx1_type = 9 AND nx2_type = 20 THEN nx2_y ELSE end_y END AS end_y,
         |  CASE WHEN type_id = 9 AND nx1_type = 9 AND nx2_type = 20 THEN CAST(0 AS INT) ELSE type_id END AS type_id
         |FROM m
         |WHERE NOT ((type_id = 9 AND pv1_type = 9 AND nx1_type = 20)
         |        OR (type_id = 20 AND pv1_type = 9 AND pv2_type = 9))""".stripMargin) { (s, dir) =>
      RepairOps.fixDuels(actions(s, dir))
        .select("game_id", "action_id", "seq", "end_x", "end_y", "type_id")
    })
}
