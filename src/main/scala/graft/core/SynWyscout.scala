package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic raw-Wyscout-shaped event stream derived from the `events`
  * table, exercising the full tag-driven dispatch and repair chain of
  * `socceraction/spadl/wyscout.py`: every (type, subtype) pair the pipeline
  * consults, all 23 goal-mosaic position tags, duel pairs followed by
  * ball-out events, interception carriers, offside sequences, touches,
  * simulations, sided-foot/head tags, cards, and 0/1/2-element position
  * arrays.
  *
  * The Spark frame carries real `tags` (array<int>) and `positions`
  * (array<struct<x,y>>) columns — the converter re-derives its booleans by
  * `array_contains` — while the oracle computes the same booleans from the
  * index arithmetic.
  */
object SynWyscout {

  val NumGames = 23L // coprime with the 24-entry pair stream

  /** (Wyscout type_id, subtype_id) pairs covering the dispatch. */
  val pairs: Seq[(Int, Int)] = Seq(
    (8, 85), (8, 80), (1, 10), (1, 11), (1, 12), (1, 13), (2, 20), (2, 21),
    (2, 22), (2, 25), (3, 30), (3, 31), (3, 32), (3, 33), (3, 34), (3, 35),
    (3, 36), (10, 100), (9, 90), (6, 60), (5, 50), (7, 70), (7, 71), (7, 72))

  private def e = col("event_id")
  private def d = floor(e / pairs.length).cast("long")

  /** (tag id, SQL boolean over d) — shared definition; the Spark side
    * builds the same condition from the parsed pieces. */
  private val tagDefs: Seq[(Int, Column, String)] = {
    def c(k: Int, m: Int, r: Int): (Column, String) =
      (d * k % m === r, s"((event_id // ${pairs.length}) * $k % $m = $r)")
    Seq(
      (101, c(7, 13, 0)), (102, c(7, 13, 1)), // goal / own goal
      (401, c(7, 4, 1)), (402, c(7, 4, 2)), (403, c(7, 4, 3)), // feet / head-body
      (801, c(3, 4, 0)), // high
      (1401, c(3, 5, 0)), // interception
      (1501, c(5, 7, 0)), // clearance
      (1302, c(7, 9, 0)), // missed ball
      (503, c(3, 7, 1)), (504, c(3, 7, 2)), // take-ons
      (1601, c(5, 11, 0)), // sliding tackle
      (1702, c(5, 9, 1)), (1703, c(5, 9, 2)), (1701, c(5, 9, 3)), // cards
      (2101, c(11, 6, 0)), // blocked
      (1001, c(11, 31, 0)), // fairplay
      (1801, c(5, 3, 0)), (1802, c(5, 3, 1)) // accurate / not accurate
    ).map { case (id, (col_, sql)) => (id, col_, sql) }
  }

  /** Mosaic tag: 1200+m for m in 1..23 (all goal/out/post position tags). */
  private val mosaicIdx = d * 13 % 24
  val mosaicIdxSql = s"((event_id // ${pairs.length}) * 13 % 24)"

  def fromEvents(events: DataFrame): DataFrame = {
    val pairIdx = (e % pairs.length).cast("int")
    val typeId = element_at(array(pairs.map(p => lit(p._1)): _*), pairIdx + 1)
    val subtypeId = element_at(array(pairs.map(p => lit(p._2)): _*), pairIdx + 1)
    val tagArr = array_compact(array(
      tagDefs.map { case (id, cond, _) =>
        when(cond, lit(id)).otherwise(lit(null).cast("int"))
      } :+ when(mosaicIdx > 0, (lit(1200) + mosaicIdx).cast("int"))
        .otherwise(lit(null).cast("int")): _*))
    val sx = (e * 7 % 101).cast("double")
    val sy = (e * 11 % 101).cast("double")
    val ex = (e * 13 % 101).cast("double")
    val ey = (e * 17 % 101).cast("double")
    val positions =
      when(d % 29 === 0, array().cast("array<struct<x:double,y:double>>"))
        .when(d % 6 === 0, array(struct(sx.as("x"), sy.as("y"))))
        .otherwise(array(struct(sx.as("x"), sy.as("y")), struct(ex.as("x"), ey.as("y"))))
    events.select(
      (e % NumGames).as("game_id"),
      e.as("event_id"),
      (lit(1) + e % 2).cast("int").as("period_id"),
      (e * 131 % 2700000).as("milliseconds"),
      (col("user_id") % 4).as("team_id"),
      col("user_id").as("player_id"),
      typeId.as("type_id"),
      subtypeId.as("subtype_id"),
      tagArr.as("tags"),
      positions.as("positions"),
      e.as("seq"))
  }

  def homeTeamId: Column = col("game_id") % 4

  // ------------------------------------------------------------------
  // DuckDB mirror
  // ------------------------------------------------------------------

  private def tagSql(id: Int): String = tagDefs.find(_._1 == id).get._3

  /** Full pipeline mirror ending in CTE `sbactions`; callers append the
    * dribble tail. */
  def oracleCte: String = {
    val n = pairs.length
    val typeArms = pairs.zipWithIndex
      .map { case ((t, _), i) => s"WHEN $i THEN $t" }.mkString(" ")
    val subArms = pairs.zipWithIndex
      .map { case ((_, st), i) => s"WHEN $i THEN $st" }.mkString(" ")
    val tg = Map(
      "goal" -> 101, "own_goal" -> 102, "left_foot" -> 401, "right_foot" -> 402,
      "head_body" -> 403, "high" -> 801, "interception" -> 1401,
      "clearance_tag" -> 1501, "missed_ball" -> 1302, "take_on_left" -> 503,
      "take_on_right" -> 504, "sliding_tackle" -> 1601, "red_card" -> 1701,
      "yellow_card" -> 1702, "second_yellow_card" -> 1703, "blocked" -> 2101,
      "fairplay" -> 1001, "accurate" -> 1801, "not_accurate" -> 1802)
    val tagSelect = tg.toSeq.sortBy(_._2)
      .map { case (name, id) => s"${tagSql(id)} AS $name" }.mkString(",\n    ")

    s"""WITH wy0 AS (
       |  SELECT event_id % $NumGames AS game_id, event_id,
       |    CAST(1 + event_id % 2 AS INT) AS period_id,
       |    event_id * 131 % 2700000 AS milliseconds,
       |    user_id % 4 AS team_id, user_id AS player_id,
       |    (CASE event_id % $n $typeArms END) AS type_id,
       |    (CASE event_id % $n $subArms END) AS subtype_id,
       |    (CASE WHEN $mosaicIdxSql > 0 THEN 1200 + $mosaicIdxSql END) AS mosaic,
       |    $tagSelect,
       |    (CASE WHEN (event_id // $n) % 29 = 0 THEN 0
       |          WHEN (event_id // $n) % 6 = 0 THEN 1 ELSE 2 END) AS npos,
       |    (event_id * 7 % 101)::DOUBLE AS px, (event_id * 11 % 101)::DOUBLE AS py,
       |    (event_id * 13 % 101)::DOUBLE AS qx, (event_id * 17 % 101)::DOUBLE AS qy,
       |    event_id AS seq
       |  FROM events
       |), wy0b AS (
       |  SELECT *,
       |    CASE WHEN npos >= 1 THEN px END AS start_x,
       |    CASE WHEN npos >= 1 THEN py END AS start_y,
       |    CASE WHEN npos >= 2 THEN qx WHEN npos >= 1 THEN px END AS end_x0,
       |    CASE WHEN npos >= 2 THEN qy WHEN npos >= 1 THEN py END AS end_y0
       |  FROM wy0
       |), wy1 AS (
       |  SELECT * EXCLUDE (end_x0, end_y0),
       |    CASE WHEN (subtype_id IN (33, 100) OR type_id = 8) AND blocked THEN start_x
       |         WHEN subtype_id IN (33, 100) AND mosaic BETWEEN 1201 AND 1223 THEN 100.0
       |         ELSE end_x0 END AS end_x,
       |    CASE WHEN (subtype_id IN (33, 100) OR type_id = 8) AND blocked THEN start_y
       |         WHEN subtype_id IN (33, 100) AND mosaic IN (1201, 1203, 1207) THEN 50.0
       |         WHEN subtype_id IN (33, 100) AND mosaic IN (1202, 1206, 1209) THEN 55.0
       |         WHEN subtype_id IN (33, 100) AND mosaic IN (1204, 1205, 1208) THEN 45.0
       |         WHEN subtype_id IN (33, 100) AND mosaic IN (1214, 1221) THEN 50.0
       |         WHEN subtype_id IN (33, 100) AND mosaic IN (1210, 1213, 1216) THEN 60.0
       |         WHEN subtype_id IN (33, 100) AND mosaic IN (1211, 1212, 1215) THEN 40.0
       |         WHEN subtype_id IN (33, 100) AND mosaic IN (1218, 1219, 1222) THEN 55.38
       |         WHEN subtype_id IN (33, 100) AND mosaic IN (1217, 1220, 1223) THEN 44.62
       |         ELSE end_y0 END AS end_y
       |  FROM wy0b
       |), wy2n AS (
       |  SELECT *,
       |    coalesce(type_id = 1 AND lead(type_id) OVER wr = 1
       |      AND lead(subtype_id, 2) OVER wr = 50
       |      AND period_id = lead(period_id, 2) OVER wr, false) AS duel_out,
       |    lead(subtype_id) OVER wr AS nx1_sub,
       |    lead(team_id) OVER wr AS nx1_team,
       |    lead(team_id, 2) OVER wr AS nx2_team,
       |    lead(start_x, 2) OVER wr AS nx2_sx,
       |    lead(start_y, 2) OVER wr AS nx2_sy
       |  FROM wy1
       |  WINDOW wr AS (PARTITION BY game_id ORDER BY seq)
       |), wy2m AS (
       |  SELECT *,
       |    (duel_out AND NOT (team_id IS NOT DISTINCT FROM nx2_team))
       |      OR (duel_out AND NOT (nx1_team IS NOT DISTINCT FROM nx2_team)) AS won,
       |    (duel_out AND NOT (team_id IS NOT DISTINCT FROM nx2_team) AND subtype_id = 10)
       |      OR (duel_out AND NOT (nx1_team IS NOT DISTINCT FROM nx2_team) AND nx1_sub = 10) AS won_air
       |  FROM wy2n
       |), wy2 AS (
       |  SELECT * EXCLUDE (duel_out, nx1_sub, nx1_team, nx2_team, nx2_sx, nx2_sy, won, won_air)
       |    REPLACE (
       |      CASE WHEN sliding_tackle THEN 0
       |           WHEN (CASE WHEN won_air THEN 82 WHEN won THEN 85 ELSE subtype_id END) = 11
       |                AND (take_on_left OR take_on_right) THEN 0
       |           WHEN won THEN 8 ELSE type_id END AS type_id,
       |      CASE WHEN won_air THEN 82 WHEN won THEN 85 ELSE subtype_id END AS subtype_id,
       |      CASE WHEN won THEN false ELSE accurate END AS accurate,
       |      CASE WHEN won THEN true ELSE not_accurate END AS not_accurate,
       |      CASE WHEN won THEN 100.0 - nx2_sx ELSE end_x END AS end_x,
       |      CASE WHEN won THEN 100.0 - nx2_sy ELSE end_y END AS end_y)
       |  FROM wy2m
       |  WHERE (CASE WHEN sliding_tackle THEN 0
       |           WHEN (CASE WHEN won_air THEN 82 WHEN won THEN 85 ELSE subtype_id END) = 11
       |                AND (take_on_left OR take_on_right) THEN 0
       |           WHEN won THEN 8 ELSE type_id END) <> 1
       |), wy3 AS (
       |  SELECT * REPLACE (seq * 2 + 1 AS seq) FROM wy2
       |  UNION ALL
       |  SELECT * REPLACE (
       |    0 AS type_id, 0 AS subtype_id, start_x AS end_x, start_y AS end_y,
       |    seq * 2 AS seq,
       |    false AS goal, false AS own_goal, false AS left_foot, false AS right_foot,
       |    false AS head_body, false AS high, true AS interception,
       |    false AS clearance_tag, false AS missed_ball, false AS take_on_left,
       |    false AS take_on_right, false AS sliding_tackle, false AS red_card,
       |    false AS yellow_card, false AS second_yellow_card, false AS blocked,
       |    false AS fairplay, false AS accurate, false AS not_accurate)
       |  FROM wy2
       |  WHERE interception AND (type_id = 8 OR subtype_id IN (70, 71))
       |), wy4 AS (
       |  SELECT * FROM (
       |    SELECT *,
       |      CASE WHEN type_id = 8 AND lead(type_id) OVER wm = 6 THEN 1 ELSE 0 END AS offside
       |    FROM wy3
       |    WINDOW wm AS (PARTITION BY game_id ORDER BY period_id, milliseconds, seq)
       |  ) WHERE type_id <> 6
       |), wy5 AS (
       |  SELECT * EXCLUDE (nx1_player, nx1_team, nx1_sx, nx1_sy, tp)
       |    REPLACE (
       |      CASE WHEN tp THEN (team_id IS NOT DISTINCT FROM nx1_team) ELSE accurate END AS accurate,
       |      CASE WHEN tp THEN NOT (team_id IS NOT DISTINCT FROM nx1_team) ELSE not_accurate END AS not_accurate,
       |      CASE WHEN tp THEN 8 ELSE type_id END AS type_id,
       |      CASE WHEN tp THEN 85 ELSE subtype_id END AS subtype_id)
       |  FROM (
       |    SELECT *,
       |      subtype_id = 72 AND NOT interception AND NOT missed_ball
       |        AND NOT (player_id IS NOT DISTINCT FROM lead(player_id) OVER wm)
       |        AND coalesce(abs(end_x - lead(start_x) OVER wm) < 3.0
       |                     AND abs(end_y - lead(start_y) OVER wm) < 3.0, false) AS tp,
       |      lead(player_id) OVER wm AS nx1_player,
       |      lead(team_id) OVER wm AS nx1_team,
       |      lead(start_x) OVER wm AS nx1_sx,
       |      lead(start_y) OVER wm AS nx1_sy
       |    FROM wy4
       |    WINDOW wm AS (PARTITION BY game_id ORDER BY period_id, milliseconds, seq)
       |  )
       |), wy6 AS (
       |  SELECT * EXCLUDE (pfto, sim)
       |    REPLACE (
       |      CASE WHEN sim THEN 0 ELSE type_id END AS type_id,
       |      CASE WHEN sim THEN 0 ELSE subtype_id END AS subtype_id,
       |      CASE WHEN sim THEN false ELSE accurate END AS accurate,
       |      CASE WHEN sim THEN true ELSE not_accurate END AS not_accurate,
       |      CASE WHEN sim THEN true ELSE take_on_left END AS take_on_left)
       |  FROM (
       |    SELECT *,
       |      coalesce(lag(take_on_left) OVER wm
       |        OR (lag(take_on_right) OVER wm AND lag(not_accurate) OVER wm), false) AS pfto,
       |      subtype_id = 25 AS sim
       |    FROM wy5
       |    WINDOW wm AS (PARTITION BY game_id ORDER BY period_id, milliseconds, seq)
       |  )
       |  WHERE NOT (sim AND pfto)
       |), act0 AS (
       |  SELECT game_id, period_id, milliseconds / 1000.0 AS time_seconds,
       |    team_id, player_id, start_x, start_y, end_x, end_y, seq,
       |    CASE
       |      WHEN fairplay THEN 20
       |      WHEN own_goal THEN 19
       |      WHEN type_id = 8 THEN CASE WHEN subtype_id = 80 THEN 1 ELSE 0 END
       |      WHEN subtype_id = 36 THEN 2
       |      WHEN subtype_id = 30 THEN CASE WHEN high THEN 5 ELSE 6 END
       |      WHEN subtype_id = 32 THEN 3
       |      WHEN subtype_id = 31 THEN 4
       |      WHEN subtype_id = 34 THEN 22
       |      WHEN type_id = 2 AND subtype_id NOT IN (22, 23, 24, 26) THEN 8
       |      WHEN type_id = 10 THEN 11
       |      WHEN subtype_id = 35 THEN 12
       |      WHEN subtype_id = 33 THEN 13
       |      WHEN type_id = 9 THEN 14
       |      WHEN subtype_id = 71 THEN 18
       |      WHEN subtype_id = 72 AND not_accurate THEN 19
       |      WHEN subtype_id = 70 THEN 21
       |      WHEN take_on_left OR take_on_right THEN 7
       |      WHEN sliding_tackle THEN 9
       |      WHEN interception AND subtype_id IN (0, 10, 11, 12, 13, 72) THEN 10
       |      ELSE 20 END AS stype,
       |    CASE
       |      WHEN offside = 1 THEN 2
       |      WHEN type_id = 2 THEN
       |        CASE WHEN yellow_card THEN 4
       |             WHEN second_yellow_card OR red_card THEN 5 ELSE 0 END
       |      WHEN goal THEN 1
       |      WHEN own_goal THEN 3
       |      WHEN subtype_id IN (100, 33, 35) THEN 0
       |      WHEN accurate THEN 1
       |      WHEN not_accurate THEN 0
       |      WHEN interception OR clearance_tag OR subtype_id = 71 THEN 1
       |      WHEN type_id = 9 THEN 1
       |      ELSE 1 END AS sresult,
       |    CASE
       |      WHEN subtype_id IN (81, 36, 21, 90, 91) THEN 2
       |      WHEN subtype_id = 82 THEN 1
       |      WHEN type_id = 10 AND head_body THEN 3
       |      WHEN left_foot THEN 4
       |      WHEN right_foot THEN 5
       |      ELSE 0 END AS sbodypart
       |  FROM wy6
       |), act1 AS (
       |  SELECT game_id, period_id, time_seconds, team_id, player_id,
       |    least(greatest(start_x * 105.0 / 100, 0.0), 105.0) AS start_x,
       |    least(greatest((100.0 - start_y) * 68.0 / 100, 0.0), 68.0) AS start_y,
       |    least(greatest(end_x * 105.0 / 100, 0.0), 105.0) AS end_x,
       |    least(greatest((100.0 - end_y) * 68.0 / 100, 0.0), 68.0) AS end_y,
       |    stype AS type_id, sresult AS result_id, sbodypart AS bodypart_id, seq
       |  FROM act0 WHERE stype <> 20
       |), act2 AS (
       |  SELECT * REPLACE (
       |    CASE WHEN type_id = 22 THEN 5.0 ELSE start_x END AS start_x,
       |    CASE WHEN type_id = 22 THEN 34.0 ELSE start_y END AS start_y,
       |    CASE WHEN type_id = 22 THEN
       |      (CASE WHEN team_id IS NOT DISTINCT FROM lead(team_id) OVER wa
       |            THEN 1 ELSE 0 END)
       |      ELSE result_id END AS result_id,
       |    CASE WHEN type_id = 8 THEN start_x ELSE end_x END AS end_x,
       |    CASE WHEN type_id = 8 THEN start_y ELSE end_y END AS end_y)
       |  FROM act1
       |  WINDOW wa AS (PARTITION BY game_id ORDER BY period_id, time_seconds, seq)
       |), act3 AS (
       |  SELECT * REPLACE (
       |    CASE WHEN type_id = 14 THEN 105.0 - end_x ELSE start_x END AS start_x,
       |    CASE WHEN type_id = 14 THEN 68.0 - end_y ELSE start_y END AS start_y,
       |    CASE WHEN type_id = 14 THEN 105.0 - end_x ELSE end_x END AS end_x,
       |    CASE WHEN type_id = 14 THEN 68.0 - end_y ELSE end_y END AS end_y)
       |  FROM act2
       |), act4 AS (
       |  SELECT * FROM (
       |    SELECT *,
       |      type_id = 14
       |        AND lag(type_id) OVER wa IN (11, 12, 13)
       |        AND lag(result_id) OVER wa = 1
       |        AND lag(time_seconds) OVER wa + 10 > time_seconds AS drop_save
       |    FROM act3
       |    WINDOW wa AS (PARTITION BY game_id ORDER BY period_id, time_seconds, seq)
       |  ) WHERE NOT coalesce(drop_save, false)
       |), act5 AS (
       |  SELECT game_id, period_id, time_seconds, team_id, player_id,
       |    CASE WHEN team_id <> game_id % 4 THEN 105.0 - start_x ELSE start_x END AS start_x,
       |    CASE WHEN team_id <> game_id % 4 THEN 68.0 - start_y ELSE start_y END AS start_y,
       |    CASE WHEN team_id <> game_id % 4 THEN 105.0 - end_x ELSE end_x END AS end_x,
       |    CASE WHEN team_id <> game_id % 4 THEN 68.0 - end_y ELSE end_y END AS end_y,
       |    type_id, result_id, bodypart_id, seq
       |  FROM act4
       |), act6 AS (
       |  SELECT * REPLACE (
       |    CASE WHEN type_id = 18 THEN coalesce(lead(start_x) OVER wg, end_x) ELSE end_x END AS end_x,
       |    CASE WHEN type_id = 18 THEN coalesce(lead(start_y) OVER wg, end_y) ELSE end_y END AS end_y)
       |  FROM act5
       |  WINDOW wg AS (PARTITION BY game_id ORDER BY period_id, time_seconds, seq)
       |), sbactions AS (
       |  SELECT *,
       |    CAST(row_number() OVER (PARTITION BY game_id ORDER BY period_id, time_seconds, seq) AS BIGINT) - 1 AS action_id
       |  FROM act6
       |)""".stripMargin
  }
}
