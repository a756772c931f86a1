package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic raw-Opta-shaped event stream derived from the `events`
  * table, exercising the full qualifier dispatch of
  * `socceraction/spadl/opta.py:83-183` (every event type; cross/long-ball/
  * chipped/freekick/corner/throw-in/goalkick/penalty/shot-freekick/
  * fairplay/own-goal qualifiers; head/other/sided-foot body parts) plus the
  * repair-chain triggers (ball recoveries, positive-outcome ball touches,
  * own goals, interceptions).
  *
  * The Spark frame carries `qualifiers` as a real `array<int>` column the
  * converter probes with `array_contains`; the oracle derives the same
  * membership booleans from the index arithmetic.
  */
object SynOpta {

  // coprime with the 20-entry type stream so every game mixes all types
  val NumGames = 23L

  val typeNames = Seq("pass", "offside pass", "take on", "foul", "tackle",
    "interception", "blocked pass", "miss", "post", "attempt saved", "goal",
    "save", "claim", "punch", "keeper pick-up", "clearance", "ball touch",
    "ball recovery", "corner awarded", "deleted event")

  /** (qualifier id, multiplier, modulus): present iff d·k mod m == 0.
    * Moduli are chosen so qualifier combinations (freekick+cross,
    * corner+cross, penalty, …) all occur. */
  val qualifierStreams: Seq[(Int, Int, Int)] = Seq(
    (2, 3, 4), // cross
    (1, 5, 7), // long ball
    (155, 3, 11), // chipped
    (5, 5, 3), // freekick taken
    (6, 7, 5), // corner taken
    (107, 11, 9), // throw-in
    (124, 13, 8), // goal kick
    (9, 7, 6), // penalty
    (26, 11, 10), // free kick shot
    (94, 13, 5), // attempted tackle (save → non_action)
    (28, 5, 6), // own goal
    (238, 17, 19), // fairplay
    (15, 3, 7), // head
    (3, 5, 13), // head pass
    (168, 7, 17), // flick-on
    (21, 11, 12), // other body part
    (20, 13, 9), // right footed
    (72, 17, 11)) // left footed

  private def e = col("event_id")
  private def d = floor(e / typeNames.length).cast("long")

  def fromEvents(events: DataFrame): DataFrame = {
    val typeName = element_at(
      array(typeNames.map(lit): _*), (e % typeNames.length + 1).cast("int"))
    val quals = array_compact(array(qualifierStreams.map { case (id, k, m) =>
      when(d * k % m === 0, lit(id)).otherwise(lit(null).cast("int"))
    }: _*))
    events.select(
      (e % NumGames).as("game_id"),
      e.as("event_id"),
      (lit(1) + e % 4).cast("int").as("period_id"),
      (e % 100).as("minute"),
      (e % 60).as("second"),
      (col("user_id") % 4).as("team_id"),
      col("user_id").as("player_id"),
      ((e * 7 % 110).cast("double") - 3.0).as("start_x"),
      ((e * 11 % 108).cast("double") - 4.0).as("start_y"),
      ((e * 13 % 110).cast("double") - 3.0).as("end_x"),
      ((e * 17 % 108).cast("double") - 4.0).as("end_y"),
      typeName.as("type_name"),
      (e * 5 % 3 < 2).as("outcome"),
      quals.as("qualifiers"),
      e.as("seq"))
  }

  def homeTeamId: Column = col("game_id") % 4

  // ------------------------------------------------------------------
  // DuckDB mirror
  // ------------------------------------------------------------------

  /** SQL membership test for qualifier `id`. */
  private def qSql(id: Int): String = {
    val (_, k, m) = qualifierStreams.find(_._1 == id).get
    s"((event_id // ${typeNames.length}) * $k % $m = 0)"
  }

  /** CTE chain `oraw` → `oactions` (dispatched, repaired, non_action-
    * filtered, owngoal-flipped, direction-fixed, clearance-fixed,
    * interception-fixed, resequenced); callers append the dribble tail. */
  def oracleCte: String = {
    val tArms = typeNames.zipWithIndex
      .map { case (n, i) => s"WHEN $i THEN '$n'" }.mkString(" ")
    s"""WITH oraw AS (
       |  SELECT event_id % $NumGames AS game_id, event_id,
       |    CAST(1 + event_id % 4 AS INT) AS period_id,
       |    CAST(
       |      (event_id % 100) * 60 + event_id % 60
       |      - (CASE WHEN 1 + event_id % 4 > 1 THEN 2700 ELSE 0 END)
       |      - (CASE WHEN 1 + event_id % 4 > 2 THEN 2700 ELSE 0 END)
       |      - (CASE WHEN 1 + event_id % 4 > 3 THEN 900 ELSE 0 END)
       |      - (CASE WHEN 1 + event_id % 4 > 4 THEN 900 ELSE 0 END) AS DOUBLE) AS time_seconds,
       |    user_id % 4 AS team_id, user_id AS player_id,
       |    least(greatest((event_id * 7 % 110)::DOUBLE - 3.0, 0.0), 100.0) / 100 * 105.0 AS start_x,
       |    least(greatest((event_id * 11 % 108)::DOUBLE - 4.0, 0.0), 100.0) / 100 * 68.0 AS start_y,
       |    least(greatest((event_id * 13 % 110)::DOUBLE - 3.0, 0.0), 100.0) / 100 * 105.0 AS end_x,
       |    least(greatest((event_id * 17 % 108)::DOUBLE - 4.0, 0.0), 100.0) / 100 * 68.0 AS end_y,
       |    (CASE event_id % ${typeNames.length} $tArms END) AS type_name,
       |    (event_id * 5 % 3 < 2) AS outcome,
       |    event_id AS seq
       |  FROM events
       |), odisp AS (
       |  SELECT *,
       |    CASE
       |      WHEN ${qSql(238)} THEN 20
       |      WHEN type_name IN ('pass', 'offside pass') THEN
       |        CASE WHEN ${qSql(107)} THEN 2
       |          WHEN ${qSql(5)} AND (${qSql(2)} OR ${qSql(1)} OR ${qSql(155)}) THEN 3
       |          WHEN ${qSql(5)} THEN 4
       |          WHEN ${qSql(6)} AND ${qSql(2)} THEN 5
       |          WHEN ${qSql(6)} THEN 6
       |          WHEN ${qSql(2)} THEN 1
       |          WHEN ${qSql(124)} THEN 22
       |          ELSE 0 END
       |      WHEN type_name = 'take on' THEN 7
       |      WHEN type_name = 'foul' AND NOT outcome THEN 8
       |      WHEN type_name = 'tackle' THEN 9
       |      WHEN type_name IN ('interception', 'blocked pass') THEN 10
       |      WHEN type_name IN ('miss', 'post', 'attempt saved', 'goal') THEN
       |        CASE WHEN ${qSql(9)} THEN 12 WHEN ${qSql(26)} THEN 13 ELSE 11 END
       |      WHEN type_name = 'save' THEN CASE WHEN ${qSql(94)} THEN 20 ELSE 14 END
       |      WHEN type_name = 'claim' THEN 15
       |      WHEN type_name = 'punch' THEN 16
       |      WHEN type_name = 'keeper pick-up' THEN 17
       |      WHEN type_name = 'clearance' THEN 18
       |      WHEN type_name = 'ball touch' AND NOT outcome THEN 19
       |      ELSE 20 END AS type_id,
       |    CASE
       |      WHEN type_name = 'offside pass' THEN 2
       |      WHEN type_name = 'foul' THEN 0
       |      WHEN type_name IN ('attempt saved', 'miss', 'post') THEN 0
       |      WHEN type_name = 'goal' THEN CASE WHEN ${qSql(28)} THEN 3 ELSE 1 END
       |      WHEN type_name = 'ball touch' THEN 0
       |      WHEN outcome THEN 1
       |      ELSE 0 END AS result_id,
       |    CASE
       |      WHEN ${qSql(15)} OR ${qSql(3)} OR ${qSql(168)} THEN 1
       |      WHEN ${qSql(21)} THEN 2
       |      WHEN ${qSql(20)} THEN 5
       |      WHEN ${qSql(72)} THEN 4
       |      WHEN ${qSql(107)} THEN 2
       |      WHEN type_name IN ('save', 'claim', 'punch', 'keeper pick-up') THEN 2
       |      ELSE 0 END AS bodypart_id
       |  FROM oraw
       |), orec AS (
       |  SELECT * REPLACE (
       |    CASE WHEN type_name = 'ball recovery' AND NOT coalesce(
       |           abs(end_x - nrx) < 3.0 AND abs(end_y - nry) < 3.0, false) THEN 21
       |         WHEN type_name = 'ball recovery' THEN 20
       |         ELSE type_id END AS type_id,
       |    CASE WHEN type_name = 'ball recovery' THEN nrx ELSE end_x END AS end_x,
       |    CASE WHEN type_name = 'ball recovery' THEN nry ELSE end_y END AS end_y)
       |  FROM (
       |    SELECT *,
       |      first_value(CASE WHEN type_id <> 20 THEN start_x END IGNORE NULLS)
       |        OVER wf AS nrx,
       |      first_value(CASE WHEN type_id <> 20 THEN start_y END IGNORE NULLS)
       |        OVER wf AS nry
       |    FROM odisp
       |    WINDOW wf AS (PARTITION BY game_id ORDER BY seq
       |                  ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
       |  )
       |), otouch AS (
       |  SELECT * REPLACE (
       |    CASE WHEN type_id = 0 AND defl AND team_id IS NOT DISTINCT FROM nx2_team
       |         THEN 1 ELSE result_id END AS result_id,
       |    CASE WHEN defl THEN nx2_x ELSE end_x END AS end_x,
       |    CASE WHEN defl THEN nx2_y ELSE end_y END AS end_y)
       |  FROM (
       |    SELECT *,
       |      coalesce(lead(type_name) OVER wr = 'ball touch'
       |               AND lead(outcome) OVER wr, false) AS defl,
       |      lead(start_x, 2) OVER wr AS nx2_x,
       |      lead(start_y, 2) OVER wr AS nx2_y,
       |      lead(team_id, 2) OVER wr AS nx2_team
       |    FROM orec
       |    WINDOW wr AS (PARTITION BY game_id ORDER BY seq)
       |  )
       |), ofilt AS (
       |  SELECT * FROM otouch WHERE type_id <> 20
       |), oog AS (
       |  SELECT * REPLACE (
       |    CASE WHEN result_id = 3 AND type_id = 11 THEN 105.0 - end_x ELSE end_x END AS end_x,
       |    CASE WHEN result_id = 3 AND type_id = 11 THEN 68.0 - end_y ELSE end_y END AS end_y,
       |    CASE WHEN result_id = 3 AND type_id = 11 THEN 19 ELSE type_id END AS type_id)
       |  FROM ofilt
       |), odir AS (
       |  SELECT game_id, period_id, time_seconds, team_id, player_id,
       |    CASE WHEN team_id <> game_id % 4 THEN 105.0 - start_x ELSE start_x END AS start_x,
       |    CASE WHEN team_id <> game_id % 4 THEN 68.0 - start_y ELSE start_y END AS start_y,
       |    CASE WHEN team_id <> game_id % 4 THEN 105.0 - end_x ELSE end_x END AS end_x,
       |    CASE WHEN team_id <> game_id % 4 THEN 68.0 - end_y ELSE end_y END AS end_y,
       |    type_id, result_id, bodypart_id, seq
       |  FROM oog
       |), oclr AS (
       |  SELECT * REPLACE (
       |    CASE WHEN type_id = 18 THEN coalesce(lead(start_x) OVER wg, end_x) ELSE end_x END AS end_x,
       |    CASE WHEN type_id = 18 THEN coalesce(lead(start_y) OVER wg, end_y) ELSE end_y END AS end_y)
       |  FROM odir
       |  WINDOW wg AS (PARTITION BY game_id ORDER BY period_id, time_seconds, seq)
       |), oint AS (
       |  SELECT * REPLACE (
       |    CASE WHEN type_id = 10 AND NOT (lead(team_id) OVER wg IS NOT DISTINCT FROM team_id)
       |         THEN CAST(0 AS INT) ELSE result_id END AS result_id)
       |  FROM oclr
       |  WINDOW wg AS (PARTITION BY game_id ORDER BY period_id, time_seconds, seq)
       |), sbactions AS (
       |  SELECT game_id, period_id, time_seconds, team_id, player_id,
       |    start_x, start_y, end_x, end_y, type_id, result_id, bodypart_id, seq,
       |    CAST(row_number() OVER (PARTITION BY game_id ORDER BY period_id, time_seconds, seq) AS BIGINT) - 1 AS action_id
       |  FROM oint
       |)""".stripMargin
  }
}
