package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Q
import graft.core.{Spadl, SynActions, Tables}
import graft.core.SynActions.OracleCte
import graft.vaep.{Features, Formula, GameStates, Labels}

/** VAEP operator family (SURVEY.md §2.7, §2.9, §2.11) over the synthetic
  * action stream, with programmatically generated DuckDB oracles that mirror
  * each feature expression term by term. Trig outputs (atan) are rounded to
  * 9 decimals on BOTH sides — the only operators whose libm results may
  * differ in the last ulp between JVM and DuckDB. */
object VaepQueries {

  private def actions(s: SparkSession, dir: String): DataFrame =
    SynActions.fromEvents(Tables.events(s, dir))

  private val K = 3

  /** Formula tail over ANY CTE `p` exposing scores_p/concedes_p —
    * exposes CTE `v` with offensive_value/defensive_value. */
  private[queries] val FormulaFromP: String =
    """, pr AS (
      |  SELECT *,
      |    coalesce(lag(team_id) OVER wg, team_id) AS pv_team,
      |    coalesce(lag(time_seconds) OVER wg, time_seconds) AS pv_time,
      |    coalesce(lag(type_id) OVER wg, type_id) AS pv_type,
      |    coalesce(lag(result_id) OVER wg, result_id) AS pv_result,
      |    coalesce(lag(scores_p) OVER wg, scores_p) AS pv_ps,
      |    coalesce(lag(concedes_p) OVER wg, concedes_p) AS pv_pc
      |  FROM p
      |  WINDOW wg AS (PARTITION BY game_id ORDER BY period_id, time_seconds, seq)
      |), v AS (
      |  SELECT *,
      |    scores_p - (CASE
      |      WHEN type_id IN (5, 6) THEN 0.0465
      |      WHEN type_id = 12 THEN 0.792453
      |      WHEN pv_type IN (11, 12, 13) AND pv_result = 1 THEN 0.0
      |      WHEN abs(time_seconds - pv_time) > 10.0 THEN 0.0
      |      WHEN pv_team = team_id THEN pv_ps ELSE pv_pc END) AS offensive_value,
      |    -(concedes_p - (CASE
      |      WHEN pv_type IN (11, 12, 13) AND pv_result = 1 THEN 0.0
      |      WHEN abs(time_seconds - pv_time) > 10.0 THEN 0.0
      |      WHEN pv_team = team_id THEN pv_pc ELSE pv_ps END)) AS defensive_value
      |  FROM pr
      |)""".stripMargin

  /** Deterministic synthetic probabilities from seq (the stand-in for a
    * learned model's outputs in value-golden formula tests). */
  private val SyntheticPCte: String =
    """, p AS (
      |  SELECT *,
      |    (seq * 17 % 1000) / 1000.0 AS scores_p,
      |    (seq * 29 % 1000) / 1000.0 AS concedes_p
      |  FROM actions
      |)""".stripMargin

  private val FormulaCtes: String = SyntheticPCte + FormulaFromP

  /** Spark twin of [[FormulaCtes]]. */
  private def formulaValues(a: DataFrame): DataFrame =
    Formula.value(a
      .withColumn("scores_p", (col("seq") * 17 % 1000) / lit(1000.0))
      .withColumn("concedes_p", (col("seq") * 29 % 1000) / lit(1000.0)))

  // ---- shared SQL fragments -------------------------------------------------

  /** Lag-filled game-state CTE mirroring GameStates.withStates. */
  private val stateCte: String = {
    val fields = Seq("team_id", "player_id", "time_seconds", "start_x",
      "start_y", "end_x", "end_y", "type_id", "result_id", "bodypart_id", "period_id")
    val cols = for (i <- 1 until K; f <- fields) yield
      s"coalesce(lag($f, $i) OVER w, first_value($f) OVER w) AS ${f}__a$i"
    s""", stt AS (
       |  SELECT *, ${cols.mkString(",\n    ")}
       |  FROM actions
       |  WINDOW w AS (PARTITION BY game_id, period_id ORDER BY time_seconds, seq)
       |)""".stripMargin
  }

  private def sf(f: String, i: Int): String = if (i == 0) f else s"${f}__a$i"

  private def timeSql(i: Int): Seq[String] = Seq(
    s"${sf("period_id", i)} AS period_id_a$i",
    s"${sf("time_seconds", i)} AS time_seconds_a$i",
    s"(CASE ${sf("period_id", i)} WHEN 1 THEN 0 WHEN 2 THEN 2700 WHEN 3 THEN 5400 WHEN 4 THEN 6300 WHEN 5 THEN 7200 ELSE 0 END) + ${sf("time_seconds", i)} AS time_seconds_overall_a$i")

  private def polarSql(xf: String, yf: String, prefix: String, i: Int): Seq[String] = {
    val dx = s"abs(105.0 - ${sf(xf, i)})"
    val dy = s"abs(34.0 - ${sf(yf, i)})"
    Seq(
      s"sqrt($dx * $dx + $dy * $dy) AS ${prefix}_dist_to_goal_a$i",
      s"round(CASE WHEN $dx = 0 AND $dy = 0 THEN 0.0 WHEN $dx = 0 THEN pi() / 2 ELSE atan($dy / $dx) END, 9) AS ${prefix}_angle_to_goal_a$i")
  }

  private def movementSql(i: Int): Seq[String] = {
    val dx = s"(${sf("end_x", i)} - ${sf("start_x", i)})"
    val dy = s"(${sf("end_y", i)} - ${sf("start_y", i)})"
    Seq(s"$dx AS dx_a$i", s"$dy AS dy_a$i", s"sqrt($dx * $dx + $dy * $dy) AS movement_a$i")
  }

  private def onehotSql(i: Int): Seq[String] =
    Spadl.actiontypes.zipWithIndex.map { case (n, id) =>
      s"""${sf("type_id", i)} = $id AS "actiontype_${n}_a$i""""
    } ++ Spadl.results.zipWithIndex.map { case (n, id) =>
      s"""${sf("result_id", i)} = $id AS "result_${n}_a$i""""
    } ++ Seq(
      s"""${sf("bodypart_id", i)} IN (0, 4, 5) AS "bodypart_foot_a$i"""",
      s"""${sf("bodypart_id", i)} = 1 AS "bodypart_head_a$i"""",
      s"""${sf("bodypart_id", i)} = 2 AS "bodypart_other_a$i"""",
      s"""${sf("bodypart_id", i)} IN (1, 2, 3) AS "bodypart_head/other_a$i"""")

  private def stateSql(i: Int): Seq[String] = {
    val dx = s"(${sf("end_x", i)} - start_x)"
    val dy = s"(${sf("end_y", i)} - start_y)"
    val dt = s"(time_seconds - ${sf("time_seconds", i)})"
    val dts = s"(CASE WHEN $dt <= 0 THEN 0.000001 ELSE $dt END)"
    Seq(
      s"${sf("team_id", i)} = team_id AS team_$i",
      s"$dt AS time_delta_$i",
      s"$dx AS dx_a0$i", s"$dy AS dy_a0$i",
      s"sqrt($dx * $dx + $dy * $dy) AS mov_a0$i",
      s"abs($dx) / $dts AS speedx_a0$i",
      s"abs($dy) / $dts AS speedy_a0$i",
      s"sqrt($dx * $dx + $dy * $dy) / $dts AS speed_a0$i")
  }

  private val goalishSql = "type_id IN (11, 12, 13)"

  // ---- queries --------------------------------------------------------------

  val all: Seq[Q] = Seq(

    Q("vaep_gamestates",
      s"""$OracleCte $stateCte
         |SELECT game_id, action_id, seq,
         |  team_id__a1, time_seconds__a1, start_x__a1, end_x__a1, type_id__a1,
         |  team_id__a2, time_seconds__a2, start_x__a2, end_x__a2, type_id__a2
         |FROM stt""".stripMargin) { (s, dir) =>
      GameStates.withStates(actions(s, dir), K)
        .select("game_id", "action_id", "seq",
          "team_id__a1", "time_seconds__a1", "start_x__a1", "end_x__a1", "type_id__a1",
          "team_id__a2", "time_seconds__a2", "start_x__a2", "end_x__a2", "type_id__a2")
    },

    Q("vaep_play_left_to_right",
      s"""$OracleCte $stateCte
         |SELECT game_id, action_id, seq,
         |  CASE WHEN team_id <> game_id % 4 THEN 105.0 - start_x ELSE start_x END AS start_x,
         |  CASE WHEN team_id <> game_id % 4 THEN 68.0 - start_y ELSE start_y END AS start_y,
         |  CASE WHEN team_id <> game_id % 4 THEN 105.0 - start_x__a1 ELSE start_x__a1 END AS start_x__a1,
         |  CASE WHEN team_id <> game_id % 4 THEN 68.0 - end_y__a1 ELSE end_y__a1 END AS end_y__a1,
         |  CASE WHEN team_id <> game_id % 4 THEN 105.0 - end_x__a2 ELSE end_x__a2 END AS end_x__a2
         |FROM stt""".stripMargin) { (s, dir) =>
      val st = GameStates.withStates(actions(s, dir), K)
      GameStates.playLeftToRight(st, K, SynActions.homeTeamId)
        .select("game_id", "action_id", "seq", "start_x", "start_y",
          "start_x__a1", "end_y__a1", "end_x__a2")
    },

    Q("vaep_features_location",
      s"""$OracleCte $stateCte
         |SELECT game_id, action_id, seq,
         |  ${(0 until K).flatMap(i => timeSql(i) ++ Seq(
                s"${sf("start_x", i)} AS start_x_a$i",
                s"${sf("start_y", i)} AS start_y_a$i",
                s"${sf("end_x", i)} AS end_x_a$i",
                s"${sf("end_y", i)} AS end_y_a$i") ++
                polarSql("start_x", "start_y", "start", i) ++
                polarSql("end_x", "end_y", "end", i) ++
                movementSql(i)).mkString(",\n  ")}
         |FROM stt""".stripMargin) { (s, dir) =>
      val st = GameStates.withStates(actions(s, dir), K)
      val feats = (0 until K).flatMap { i =>
        Features.time(i) ++ Features.startlocation(i) ++ Features.endlocation(i) ++
          Features.startpolar(i).map(c => c) ++ Features.endpolar(i) ++ Features.movement(i)
      }
      val out = st.select(Seq(col("game_id"), col("action_id"), col("seq")) ++ feats: _*)
      // round only the trig outputs (libm last-ulp differences)
      val angles = out.columns.filter(_.contains("angle_to_goal"))
      angles.foldLeft(out)((d, c) => d.withColumn(c, round(col(c), 9)))
    },

    Q("vaep_features_onehot",
      s"""$OracleCte $stateCte
         |SELECT game_id, action_id, seq,
         |  ${(0 until K).flatMap(onehotSql).mkString(",\n  ")}
         |FROM stt""".stripMargin) { (s, dir) =>
      val st = GameStates.withStates(actions(s, dir), K)
      val feats = (0 until K).flatMap { i =>
        Features.actiontypeOnehot(i) ++ Features.resultOnehot(i) ++ Features.bodypartOnehot(i)
      }
      st.select(Seq(col("game_id"), col("action_id"), col("seq")) ++ feats: _*)
    },

    Q("vaep_features_state",
      s"""$OracleCte $stateCte
         |SELECT game_id, action_id, seq,
         |  ${(1 until K).flatMap(stateSql).mkString(",\n  ")}
         |FROM stt""".stripMargin) { (s, dir) =>
      val st = GameStates.withStates(actions(s, dir), K)
      val feats = (1 until K).flatMap { i =>
        Features.team(i) ++ Features.timeDelta(i) ++ Features.spaceDelta(i) ++ Features.speed(i)
      }
      st.select(Seq(col("game_id"), col("action_id"), col("seq")) ++ feats: _*)
    },

    Q("vaep_goalscore",
      s"""$OracleCte, g AS (
         |  SELECT *,
         |    CASE WHEN ($goalishSql AND result_id = 1 AND team_id = first_value(team_id) OVER wg)
         |           OR ($goalishSql AND result_id = 3 AND team_id <> first_value(team_id) OVER wg)
         |         THEN 1 ELSE 0 END AS goal_a,
         |    CASE WHEN ($goalishSql AND result_id = 1 AND team_id <> first_value(team_id) OVER wg)
         |           OR ($goalishSql AND result_id = 3 AND team_id = first_value(team_id) OVER wg)
         |         THEN 1 ELSE 0 END AS goal_b,
         |    team_id = first_value(team_id) OVER wg AS is_a
         |  FROM actions
         |  WINDOW wg AS (PARTITION BY game_id ORDER BY period_id, time_seconds, seq)
         |), cum AS (
         |  SELECT *,
         |    CAST(coalesce(sum(goal_a) OVER wp, 0) AS BIGINT) AS score_a,
         |    CAST(coalesce(sum(goal_b) OVER wp, 0) AS BIGINT) AS score_b
         |  FROM g
         |  WINDOW wp AS (PARTITION BY game_id ORDER BY period_id, time_seconds, seq
         |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |)
         |SELECT game_id, action_id, seq,
         |  CASE WHEN is_a THEN score_a ELSE score_b END AS goalscore_team,
         |  CASE WHEN is_a THEN score_b ELSE score_a END AS goalscore_opponent,
         |  (CASE WHEN is_a THEN score_a ELSE score_b END) - (CASE WHEN is_a THEN score_b ELSE score_a END) AS goalscore_diff
         |FROM cum""".stripMargin) { (s, dir) =>
      actions(s, dir).select(
        Seq(col("game_id"), col("action_id"), col("seq")) ++ Features.goalscore: _*)
    },

    Q("vaep_possession_time",
      s"""$OracleCte
         |SELECT game_id, action_id, seq,
         |  CASE WHEN lag(period_id) OVER wg = period_id
         |         AND lag(player_id) OVER wg = player_id
         |         AND lag(type_id) OVER wg = 21
         |       THEN time_seconds - lag(time_seconds) OVER wg ELSE 0.0
         |  END AS player_possession_time_a0
         |FROM actions
         |WINDOW wg AS (PARTITION BY game_id ORDER BY period_id, time_seconds, seq)""".stripMargin) { (s, dir) =>
      actions(s, dir).select(
        Seq(col("game_id"), col("action_id"), col("seq")) ++ Features.playerPossessionTime: _*)
    },

    Q("vaep_labels",
      s"""$OracleCte, f AS (
         |  SELECT *,
         |    CASE WHEN $goalishSql AND result_id = 1 THEN 1 ELSE 0 END AS goal_i,
         |    CASE WHEN $goalishSql AND result_id = 3 THEN 1 ELSE 0 END AS og_i
         |  FROM actions
         |)
         |SELECT game_id, action_id, seq,
         |  (max(goal_i) OVER wt > 0) OR (sum(og_i) OVER wg - sum(og_i) OVER wt > 0) AS scores,
         |  (max(og_i) OVER wt > 0) OR (sum(goal_i) OVER wg - sum(goal_i) OVER wt > 0) AS concedes,
         |  goal_i = 1 AS goal_from_shot
         |FROM f
         |WINDOW wt AS (PARTITION BY game_id, team_id ORDER BY action_id
         |              RANGE BETWEEN CURRENT ROW AND 9 FOLLOWING),
         |       wg AS (PARTITION BY game_id ORDER BY action_id
         |              RANGE BETWEEN CURRENT ROW AND 9 FOLLOWING)""".stripMargin) { (s, dir) =>
      val a = actions(s, dir)
      Labels.goalFromShot(Labels.concedes(Labels.scores(a)))
        .select("game_id", "action_id", "seq", "scores", "concedes", "goal_from_shot")
    },

    Q("vaep_formula",
      s"""$OracleCte$FormulaCtes
         |SELECT game_id, action_id, seq, offensive_value, defensive_value,
         |  offensive_value + defensive_value AS vaep_value
         |FROM v""".stripMargin) { (s, dir) =>
      formulaValues(actions(s, dir))
        .select("game_id", "action_id", "seq", "offensive_value",
          "defensive_value", "vaep_value")
    },

    // The reference's headline downstream use (public notebook 4): per-
    // player VAEP totals normalized per 90 minutes, minutes from the
    // synthetic lineup analogue (convert_minutes_played semantics, player
    // = user). Float determinism: per-action doubles are summed as
    // DECIMAL(38,18) (exact, order-independent), the sum requantized to 6
    // fractional digits before the one cast back to DOUBLE (the scaled
    // integer then fits in 2^53, so the decimal→double conversion is
    // correctly rounded — and identical — in both engines; at 18 digits
    // Spark and DuckDB convert 1 ulp apart); the per-90
    // division/multiplication runs in one fixed order both sides.
    Q("vaep_player_rating",
      s"""$OracleCte$FormulaCtes, pv AS (
         |  SELECT player_id, count(*) AS n_actions,
         |    -- round() not a bare rescale cast: DuckDB's decimal downscale
         |    -- cast TRUNCATES while Spark's rounds HALF_UP; round() is
         |    -- half-away-from-zero in both
         |    CAST(round(sum(CAST(offensive_value + defensive_value AS DECIMAL(38,18))), 6) AS DECIMAL(38,6)) AS vsum
         |  FROM v GROUP BY player_id
         |), mins AS (
         |  SELECT user_id AS player_id,
         |    (coalesce(min(CASE WHEN event_type = 'error' THEN epoch_us(ts) END),
         |              max(epoch_us(ts))) - min(epoch_us(ts))) / 60000000.0 AS minutes_played
         |  FROM events GROUP BY user_id
         |)
         |SELECT p.player_id, p.n_actions, CAST(p.vsum AS DOUBLE) AS vaep_total,
         |  m.minutes_played,
         |  CAST(p.vsum AS DOUBLE) / m.minutes_played * 90 AS vaep_per90
         |FROM pv p JOIN mins m USING (player_id)
         |WHERE m.minutes_played > 0""".stripMargin) { (s, dir) =>
      val perPlayer = formulaValues(actions(s, dir))
        .groupBy("player_id")
        .agg(count(lit(1)).as("n_actions"),
          sum((col("offensive_value") + col("defensive_value"))
            .cast("decimal(38,18)")).cast("decimal(38,6)").as("vsum"))
      val us = unix_micros(col("ts").cast("timestamp"))
      val mins = Tables.events(s, dir)
        .groupBy(col("user_id").as("player_id"))
        .agg(((coalesce(min(when(col("event_type") === "error", us)), max(us)) - min(us))
          / 60000000.0).as("minutes_played"))
      perPlayer.join(mins, "player_id")
        .filter(col("minutes_played") > 0)
        .select(col("player_id"), col("n_actions"),
          col("vsum").cast("double").as("vaep_total"),
          col("minutes_played"),
          (col("vsum").cast("double") / col("minutes_played") * 90).as("vaep_per90"))
    },

    // The model PREDICT path value-golden: fixed literal coefficients
    // through the logistic link (the shape VaepModel.estimateProbabilities
    // produces from a learned model), then the full formula. JVM/DuckDB
    // exp() differ in the last ulp → probabilities round to 9 decimals on
    // BOTH sides (the trig rule); everything downstream is arithmetic in
    // identical order. The learned-model queries stay rows-only — this
    // pins the scoring/rating chain itself.
    Q("vaep_rate_logistic",
      s"""$OracleCte, p AS (
         |  SELECT *,
         |    round(1.0 / (1.0 + exp(-(-3.0 + 0.05 * end_x - 0.02 * abs(end_y - 34.0)
         |      + (CASE WHEN type_id IN (11, 12, 13) THEN 0.9 ELSE 0.0 END)))), 9) AS scores_p,
         |    round(1.0 / (1.0 + exp(-(-4.0 + 0.03 * (105.0 - start_x)))), 9) AS concedes_p
         |  FROM actions
         |)$FormulaFromP
         |SELECT game_id, action_id, seq, scores_p, concedes_p,
         |  offensive_value, defensive_value,
         |  offensive_value + defensive_value AS vaep_value
         |FROM v""".stripMargin) { (s, dir) =>
      val zS = lit(-3.0) + lit(0.05) * col("end_x") - lit(0.02) * abs(col("end_y") - 34.0) +
        when(col("type_id").isin(11, 12, 13), 0.9).otherwise(0.0)
      val zC = lit(-4.0) + lit(0.03) * (lit(105.0) - col("start_x"))
      val withP = actions(s, dir)
        .withColumn("scores_p", round(lit(1.0) / (lit(1.0) + exp(-zS)), 9))
        .withColumn("concedes_p", round(lit(1.0) / (lit(1.0) + exp(-zC)), 9))
      Formula.value(withP)
        .select("game_id", "action_id", "seq", "scores_p", "concedes_p",
          "offensive_value", "defensive_value", "vaep_value")
    })
}
