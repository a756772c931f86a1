package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic kloppy-normalized event stream derived from the `events`
  * table, exercising the full dispatch of `socceraction/spadl/kloppy.py`:
  * every event family, set-piece/pass-type/bodypart/card/duel/goalkeeper
  * qualifier, per-family result enums, and absent end coordinates. The
  * Spark frame carries `qualifiers` as a real array<string> of kloppy enum
  * names; the oracle derives the same membership booleans arithmetically. */
object SynKloppy {

  val NumGames = 19L // coprime with the 13-entry type stream

  val eventTypes = Seq("PASS", "SHOT", "TAKE_ON", "CARRY", "FOUL_COMMITTED",
    "DUEL", "CLEARANCE", "MISCONTROL", "GOALKEEPER", "INTERCEPTION",
    "GENERIC", "RECOVERY", "BALL_OUT")

  val setPieces = Seq(null, "FREE_KICK", "CORNER_KICK", "GOAL_KICK", "THROW_IN", "PENALTY")
  val passTypes = Seq(null, "CROSS", "CHIPPED_PASS", "HIGH_PASS", "LONG_BALL")
  val bodyParts = Seq(null, "HEAD", "RIGHT_FOOT", "LEFT_FOOT", "CHEST",
    "OTHER", "HEAD_OTHER", "KEEPER_ARM")
  val cards = Seq(null, "FIRST_YELLOW", "SECOND_YELLOW", "RED")
  val gkActions = Seq(null, "SAVE", "CLAIM", "SMOTHER", "PUNCH", "PICK_UP", "REFLEX")
  val passResults = Seq("COMPLETE", "INCOMPLETE", "OUT", "OFFSIDE", null)
  val shotResults = Seq("GOAL", "OWN_GOAL", "SAVED", "OFF_TARGET", "POST")
  val binResults = Seq("COMPLETE", "INCOMPLETE") // take-on
  val icptResults = Seq("SUCCESS", "LOST", "OUT")
  val duelResults = Seq("WON", "LOST", "NEUTRAL")

  private def e = col("event_id")
  private def d = floor(e / eventTypes.length).cast("long")

  private def pick(vocab: Seq[String], idx: Column): Column =
    element_at(array(vocab.map(v => lit(v).cast("string")): _*), (idx + 1).cast("int"))

  // index streams (multipliers coprime with each modulus)
  private val spIdx = d * 5 % setPieces.length
  private val ptIdx = d * 3 % passTypes.length
  private val bpIdx = d * 3 % bodyParts.length
  private val cardIdx = d * 5 % cards.length
  private val gkIdx = d * 3 % gkActions.length
  private val duelGround = d * 5 % 2 === 0
  private val duelLoose = d * 7 % 3 === 0
  private val presIdx = d * 7 % passResults.length
  private val sresIdx = d * 7 % shotResults.length
  private val bresIdx = d * 7 % binResults.length
  private val iresIdx = d * 7 % icptResults.length
  private val dresIdx = d * 11 % duelResults.length
  private val noEnd = d % 7 === 0

  def fromEvents(events: DataFrame): DataFrame = {
    val typeName = pick(eventTypes, e % eventTypes.length)
    val result =
      when(typeName === "PASS", pick(passResults, presIdx))
        .when(typeName === "SHOT", pick(shotResults, sresIdx))
        .when(typeName === "TAKE_ON", pick(binResults, bresIdx))
        .when(typeName === "INTERCEPTION", pick(icptResults, iresIdx))
        .when(typeName === "DUEL", pick(duelResults, dresIdx))
    val quals = array_compact(array(
      when(typeName.isin("PASS", "SHOT"), pick(setPieces, spIdx)).otherwise(lit(null)),
      when(typeName === "PASS", pick(passTypes, ptIdx)).otherwise(lit(null)),
      pick(bodyParts, bpIdx),
      when(typeName === "FOUL_COMMITTED", pick(cards, cardIdx)).otherwise(lit(null)),
      when(typeName === "DUEL" && duelGround, lit("GROUND")).otherwise(lit(null)),
      when(typeName === "DUEL" && duelLoose, lit("LOOSE_BALL")).otherwise(lit(null)),
      when(typeName === "GOALKEEPER", pick(gkActions, gkIdx)).otherwise(lit(null))))
    events.select(
      (e % NumGames).as("game_id"),
      e.as("event_id"),
      (lit(1) + e % 2).cast("int").as("period_id"),
      ((e * 97 % 27000).cast("double") / 10.0).as("time_seconds"),
      (col("user_id") % 4).as("team_id"),
      col("user_id").as("player_id"),
      typeName.as("event_type"),
      result.as("result"),
      quals.as("qualifiers"),
      (e * 7 % 1051 / lit(10.0)).as("start_x"),
      (e * 11 % 681 / lit(10.0)).as("start_y"),
      when(noEnd, lit(null).cast("double")).otherwise(e * 13 % 1051 / lit(10.0)).as("end_x"),
      when(noEnd, lit(null).cast("double")).otherwise(e * 17 % 681 / lit(10.0)).as("end_y"),
      e.as("seq"))
  }

  // ------------------------------------------------------------------
  // DuckDB mirror
  // ------------------------------------------------------------------

  private def sqlPick(vocab: Seq[String], idxSql: String): String = {
    val arms = vocab.zipWithIndex.collect {
      case (v, i) if v != null => s"WHEN $i THEN '$v'"
    }.mkString(" ")
    s"(CASE ($idxSql) $arms ELSE NULL END)"
  }

  def oracleCte: String = {
    val n = eventTypes.length
    val dv = s"(event_id // $n)"
    val et = sqlPick(eventTypes, s"event_id % $n")
    val sp = sqlPick(setPieces, s"$dv * 5 % ${setPieces.length}")
    val pt = sqlPick(passTypes, s"$dv * 3 % ${passTypes.length}")
    val bp = sqlPick(bodyParts, s"$dv * 3 % ${bodyParts.length}")
    val card = sqlPick(cards, s"$dv * 5 % ${cards.length}")
    val gk = sqlPick(gkActions, s"$dv * 3 % ${gkActions.length}")
    val pres = sqlPick(passResults, s"$dv * 7 % ${passResults.length}")
    val sres = sqlPick(shotResults, s"$dv * 7 % ${shotResults.length}")
    val bres = sqlPick(binResults, s"$dv * 7 % ${binResults.length}")
    val ires = sqlPick(icptResults, s"$dv * 7 % ${icptResults.length}")
    val dres = sqlPick(duelResults, s"$dv * 11 % ${duelResults.length}")

    val bpCase = (default: Int) =>
      s"""(CASE WHEN bp = 'HEAD' THEN 1
         |  WHEN bp = 'RIGHT_FOOT' THEN 5
         |  WHEN bp = 'LEFT_FOOT' THEN 4
         |  WHEN bp IN ('CHEST', 'OTHER') THEN 2
         |  WHEN bp = 'HEAD_OTHER' THEN 3
         |  ELSE $default END)""".stripMargin

    s"""WITH kraw AS (
       |  SELECT event_id % $NumGames AS game_id, event_id,
       |    CAST(1 + event_id % 2 AS INT) AS period_id,
       |    (event_id * 97 % 27000)::DOUBLE / 10.0 AS time_seconds,
       |    user_id % 4 AS team_id, user_id AS player_id,
       |    $et AS event_type,
       |    $sp AS sp, $pt AS pt, $bp AS bp, $card AS card, $gk AS gk,
       |    ($dv * 5 % 2 = 0) AS duel_ground, ($dv * 7 % 3 = 0) AS duel_loose,
       |    $pres AS pres, $sres AS sres, $bres AS bres, $ires AS ires, $dres AS dres,
       |    event_id * 7 % 1051 / 10.0 AS start_x,
       |    event_id * 11 % 681 / 10.0 AS start_y,
       |    CASE WHEN $dv % 7 = 0 THEN NULL ELSE event_id * 13 % 1051 / 10.0 END AS end_x0,
       |    CASE WHEN $dv % 7 = 0 THEN NULL ELSE event_id * 17 % 681 / 10.0 END AS end_y0,
       |    event_id AS seq
       |  FROM events
       |), kdisp AS (
       |  SELECT game_id, period_id, time_seconds, team_id, player_id,
       |    start_x, start_y,
       |    coalesce(end_x0, start_x) AS end_x,
       |    coalesce(end_y0, start_y) AS end_y,
       |    CASE event_type
       |      WHEN 'PASS' THEN
       |        CASE WHEN pres IS NULL OR pres NOT IN ('INCOMPLETE', 'OUT', 'OFFSIDE', 'COMPLETE') THEN 20
       |          WHEN sp = 'FREE_KICK' THEN
       |            CASE WHEN pt IN ('CHIPPED_PASS', 'CROSS', 'HIGH_PASS', 'LONG_BALL') THEN 3 ELSE 4 END
       |          WHEN sp = 'CORNER_KICK' THEN
       |            CASE WHEN pt IN ('CHIPPED_PASS', 'CROSS', 'HIGH_PASS', 'LONG_BALL') THEN 5 ELSE 6 END
       |          WHEN sp = 'GOAL_KICK' THEN 22
       |          WHEN sp = 'THROW_IN' THEN 2
       |          WHEN pt = 'CROSS' THEN 1
       |          ELSE 0 END
       |      WHEN 'SHOT' THEN
       |        CASE WHEN sres = 'OWN_GOAL' THEN 19
       |          WHEN sp = 'FREE_KICK' THEN 13
       |          WHEN sp = 'PENALTY' THEN 12
       |          ELSE 11 END
       |      WHEN 'TAKE_ON' THEN 7
       |      WHEN 'CARRY' THEN 21
       |      WHEN 'FOUL_COMMITTED' THEN 8
       |      WHEN 'DUEL' THEN CASE WHEN duel_ground AND NOT duel_loose THEN 9 ELSE 20 END
       |      WHEN 'CLEARANCE' THEN 18
       |      WHEN 'MISCONTROL' THEN 19
       |      WHEN 'GOALKEEPER' THEN
       |        CASE WHEN gk = 'PICK_UP' THEN 17
       |          WHEN gk = 'PUNCH' THEN 16
       |          WHEN gk IN ('SMOTHER', 'CLAIM') THEN 15
       |          WHEN gk = 'SAVE' THEN 14
       |          ELSE 20 END
       |      WHEN 'INTERCEPTION' THEN 10
       |      ELSE 20 END AS type_id,
       |    CASE event_type
       |      WHEN 'PASS' THEN
       |        CASE WHEN pres IS NULL OR pres NOT IN ('INCOMPLETE', 'OUT', 'OFFSIDE', 'COMPLETE') THEN 1
       |          WHEN pres IN ('INCOMPLETE', 'OUT') THEN 0
       |          WHEN pres = 'OFFSIDE' THEN 2
       |          ELSE 1 END
       |      WHEN 'SHOT' THEN
       |        CASE WHEN sres = 'GOAL' THEN 1 WHEN sres = 'OWN_GOAL' THEN 3 ELSE 0 END
       |      WHEN 'TAKE_ON' THEN CASE WHEN bres = 'COMPLETE' THEN 1 ELSE 0 END
       |      WHEN 'CARRY' THEN 1
       |      WHEN 'FOUL_COMMITTED' THEN
       |        CASE WHEN card = 'FIRST_YELLOW' THEN 4
       |          WHEN card IN ('SECOND_YELLOW', 'RED') THEN 5 ELSE 0 END
       |      WHEN 'DUEL' THEN CASE WHEN dres = 'LOST' THEN 0 ELSE 1 END
       |      WHEN 'MISCONTROL' THEN 0
       |      WHEN 'INTERCEPTION' THEN CASE WHEN ires IN ('LOST', 'OUT') THEN 0 ELSE 1 END
       |      ELSE 1 END AS result_id,
       |    CASE event_type
       |      WHEN 'PASS' THEN
       |        CASE WHEN bp = 'KEEPER_ARM' OR sp = 'THROW_IN' THEN 2 ELSE ${bpCase(0)} END
       |      WHEN 'SHOT' THEN ${bpCase(0)}
       |      WHEN 'CLEARANCE' THEN ${bpCase(0)}
       |      WHEN 'GOALKEEPER' THEN ${bpCase(2)}
       |      WHEN 'INTERCEPTION' THEN ${bpCase(0)}
       |      ELSE 0 END AS bodypart_id,
       |    seq
       |  FROM kraw
       |), kfilt AS (
       |  SELECT * FROM kdisp WHERE type_id <> 20
       |), kclr AS (
       |  SELECT * REPLACE (
       |    CASE WHEN type_id = 18 THEN coalesce(lead(start_x) OVER wg, end_x) ELSE end_x END AS end_x,
       |    CASE WHEN type_id = 18 THEN coalesce(lead(start_y) OVER wg, end_y) ELSE end_y END AS end_y)
       |  FROM kfilt
       |  WINDOW wg AS (PARTITION BY game_id ORDER BY period_id, time_seconds, seq)
       |), sbactions AS (
       |  SELECT *,
       |    CAST(row_number() OVER (PARTITION BY game_id ORDER BY period_id, time_seconds, seq) AS BIGINT) - 1 AS action_id
       |  FROM kclr
       |)""".stripMargin
  }
}
