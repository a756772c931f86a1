package graft.queries

/** Shared DuckDB SQL fragments for the provider-converter oracles. */
object SqlFragments {

  /** Dribble-synthesis + final-resequence tail over a SPADL-shaped CTE
    * (the SQL mirror of SpadlOps.addDribbles; matches spadl_add_dribbles). */
  def dribbleTail(in: String): String =
    s""", nxf AS (
       |  SELECT *,
       |    lead(team_id) OVER wg AS nx_team_id,
       |    lead(player_id) OVER wg AS nx_player_id,
       |    lead(period_id) OVER wg AS nx_period_id,
       |    lead(time_seconds) OVER wg AS nx_time_seconds,
       |    lead(start_x) OVER wg AS nx_start_x,
       |    lead(start_y) OVER wg AS nx_start_y,
       |    lead(type_id) OVER wg AS nx_type_id,
       |    lead(bodypart_id) OVER wg AS nx_bodypart_id
       |  FROM $in
       |  WINDOW wg AS (PARTITION BY game_id ORDER BY period_id, time_seconds, seq)
       |), drbf AS (
       |  SELECT game_id, CAST(nx_period_id AS INT) AS period_id,
       |    CAST(action_id AS DOUBLE) + 0.1 AS aid_frac,
       |    (time_seconds + nx_time_seconds) / 2 AS time_seconds,
       |    nx_team_id AS team_id, nx_player_id AS player_id,
       |    end_x AS start_x, end_y AS start_y,
       |    nx_start_x AS end_x, nx_start_y AS end_y,
       |    CAST(21 AS INT) AS type_id, CAST(1 AS INT) AS result_id,
       |    CAST(0 AS INT) AS bodypart_id, seq
       |  FROM nxf
       |  WHERE team_id = nx_team_id AND nx_type_id <> 8
       |    AND nx_type_id <> 11 AND nx_bodypart_id <> 1
       |    AND (end_x - nx_start_x) * (end_x - nx_start_x) + (end_y - nx_start_y) * (end_y - nx_start_y) >= 9.0
       |    AND (end_x - nx_start_x) * (end_x - nx_start_x) + (end_y - nx_start_y) * (end_y - nx_start_y) <= 3600.0
       |    AND nx_time_seconds - time_seconds < 10.0
       |    AND period_id = nx_period_id
       |), unionedf AS (
       |  SELECT game_id, period_id, CAST(action_id AS DOUBLE) AS aid_frac, time_seconds,
       |    team_id, player_id, start_x, start_y, end_x, end_y, type_id, result_id, bodypart_id, seq
       |  FROM $in
       |  UNION ALL
       |  SELECT game_id, period_id, aid_frac, time_seconds, team_id, player_id,
       |    start_x, start_y, end_x, end_y, type_id, result_id, bodypart_id, seq
       |  FROM drbf
       |)
       |SELECT game_id,
       |  CAST(row_number() OVER (PARTITION BY game_id ORDER BY period_id, aid_frac) AS BIGINT) - 1 AS action_id,
       |  period_id, time_seconds, team_id, player_id, start_x, start_y, end_x, end_y,
       |  type_id, result_id, bodypart_id, seq
       |FROM unionedf""".stripMargin
}
