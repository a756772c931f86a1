package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic raw-StatsBomb-shaped event stream derived from the driver's
  * `events` table, exercising the FULL dispatch vocabulary of
  * `socceraction/spadl/statsbomb.py:223-483`: every event type, pass type,
  * height, outcome, body part, duel/interception/goalkeeper outcome, foul
  * card and dribble outcome, plus interception-passes (pass.type =
  * "Interception" → the N3 split), fractional locations (fidelity v2 games)
  * and 3-element goal-frame shot end locations.
  *
  * The Spark frame carries `extra` as a REAL JSON string (assembled with
  * `to_json`, parsed back by the converter with `from_json` — the raw-ingest
  * path is exercised end to end); the DuckDB oracle derives the same
  * qualifier names directly from the index arithmetic, so converter output
  * is value-golden without requiring DuckDB JSON support.
  */
object SynStatsBomb {

  // coprime with the 14-entry type stream so every game mixes all types
  val NumGames = 23L

  // variant vocabularies (index 0 = absent/NULL)
  val typeNames = Seq("Pass", "Shot", "Carry", "Dribble", "Foul Committed",
    "Duel", "Interception", "Goal Keeper", "Clearance", "Miscontrol",
    "Own Goal Against", "Ball Recovery", "Pressure", "Starting XI")
  val passTypes = Seq(null, "Free Kick", "Corner", "Goal Kick", "Throw-in",
    "Interception", "Recovery")
  val passHeights = Seq(null, "High Pass", "Ground Pass")
  val passOutcomes = Seq(null, "Incomplete", "Out", "Pass Offside",
    "Injury Clearance", "Unknown")
  val bodyParts = Seq(null, "Head", "Left Foot", "Right Foot", "Drop Kick",
    "Keeper Arm", "Chest", "Other")
  val shotTypes = Seq(null, "Free Kick", "Penalty")
  val shotOutcomes = Seq("Goal", "Blocked", "Off T", "Post", "Saved", "Wayward", null)
  val duelTypes = Seq("Tackle", "Aerial Lost", "50/50")
  val duelOutcomes = Seq(null, "Lost In Play", "Lost Out", "Success in Play", "Won")
  val gkTypes = Seq(null, "Shot Saved", "Collected", "Keeper Sweeper", "Punch")
  val gkOutcomes = Seq(null, "Claim", "Clear", "Collected Twice", "In Play Safe",
    "Success", "Touched Out", "In Play Danger", "No Touch")
  val foulCards = Seq(null, "Yellow Card", "Second Yellow", "Red Card")
  val dribbleOutcomes = Seq(null, "Incomplete", "Complete")

  private def pick(vocab: Seq[String], idx: Column): Column =
    element_at(array(vocab.map(v => lit(v).cast("string")): _*), (idx + 1).cast("int"))

  private def e = col("event_id")

  // Qualifier streams derive from d = event_id div 14 — independent of the
  // type stream (event_id mod 14), so every type gets every qualifier
  // variant; multipliers are chosen coprime with each modulus so each
  // stream covers all residues.
  private val tIdx = e % typeNames.length
  private val d = floor(e / 14).cast("long")
  private val ptypeIdx = d * 3 % passTypes.length
  private val heightIdx = d * 5 % passHeights.length
  private val crossIdx = d * 7 % 3 // 0 → absent, 1 → true, 2 → false
  private val poutIdx = d * 11 % passOutcomes.length
  private val bpIdx = d * 13 % bodyParts.length
  private val stypeIdx = d * 7 % shotTypes.length
  private val soutIdx = d * 11 % shotOutcomes.length
  private val dtIdx = d * 5 % duelTypes.length
  private val doutIdx = d * 11 % duelOutcomes.length
  private val gtIdx = d * 7 % gkTypes.length
  private val goutIdx = d * 11 % gkOutcomes.length
  private val cardIdx = d * 5 % foulCards.length
  private val drIdx = d * 7 % dribbleOutcomes.length

  /** idName sub-object {id, name} or null when the name is null. */
  private def idName(nameCol: Column): Column =
    when(nameCol.isNotNull, struct(lit(1L).as("id"), nameCol.as("name")))

  /** Raw event frame: (game_id, event_id, period_id, timestamp, team_id,
    * player_id, type_name, location, extra, seq). */
  def fromEvents(events: DataFrame): DataFrame = {
    val typeName = pick(typeNames, tIdx)
    val loc0 = lit(1.0) + e % 120 + when(e % 21 === 0, 0.5).otherwise(0.0)
    val loc1 = lit(1.0) + e * 3 % 80
    val eloc0 = lit(1.0) + e * 13 % 120
    val eloc1 = lit(1.0) + e * 17 % 80
    val shot3d = typeName === "Shot" && e % 5 === 0

    val passStruct = when(typeName === "Pass", struct(
      idName(pick(passTypes, ptypeIdx)).as("type"),
      idName(pick(passHeights, heightIdx)).as("height"),
      when(crossIdx === 1, lit(true)).when(crossIdx === 2, lit(false)).as("cross"),
      idName(pick(passOutcomes, poutIdx)).as("outcome"),
      idName(pick(bodyParts, bpIdx)).as("body_part"),
      array(eloc0, eloc1).as("end_location")))
    val shotStruct = when(typeName === "Shot", struct(
      idName(pick(shotTypes, stypeIdx)).as("type"),
      idName(pick(shotOutcomes, soutIdx)).as("outcome"),
      idName(pick(bodyParts, bpIdx)).as("body_part"),
      when(shot3d, array(eloc0, eloc1 + 0.3, (e % 30).cast("double") / 10.0))
        .otherwise(array(eloc0, eloc1)).as("end_location")))
    val carryStruct = when(typeName === "Carry",
      struct(array(eloc0, eloc1).as("end_location")))
    val dribbleStruct = when(typeName === "Dribble",
      struct(idName(pick(dribbleOutcomes, drIdx)).as("outcome")))
    val foulStruct = when(typeName === "Foul Committed",
      struct(idName(pick(foulCards, cardIdx)).as("card")))
    val duelStruct = when(typeName === "Duel", struct(
      idName(pick(duelTypes, dtIdx)).as("type"),
      idName(pick(duelOutcomes, doutIdx)).as("outcome")))
    val interceptionStruct = when(typeName === "Interception",
      struct(idName(pick(duelOutcomes, doutIdx)).as("outcome")))
    val gkStruct = when(typeName === "Goal Keeper", struct(
      idName(pick(gkTypes, gtIdx)).as("type"),
      idName(pick(gkOutcomes, goutIdx)).as("outcome"),
      idName(pick(bodyParts, bpIdx)).as("body_part")))
    val clearanceStruct = when(typeName === "Clearance",
      struct(idName(pick(bodyParts, bpIdx)).as("body_part")))

    events.select(
      (e % NumGames).as("game_id"),
      e.as("event_id"),
      (lit(1) + e % 2).cast("int").as("period_id"),
      concat(
        lpad((e % 2).cast("string"), 2, "0"), lit(":"),
        lpad((e % 45).cast("string"), 2, "0"), lit(":"),
        lpad((e % 60).cast("string"), 2, "0"), lit("."),
        lpad((e % 1000).cast("string"), 3, "0")).as("timestamp"),
      (col("user_id") % 4).as("team_id"),
      col("user_id").as("player_id"),
      typeName.as("type_name"),
      array(loc0, loc1).as("location"),
      to_json(struct(
        passStruct.as("pass"),
        shotStruct.as("shot"),
        carryStruct.as("carry"),
        dribbleStruct.as("dribble"),
        foulStruct.as("foul_committed"),
        duelStruct.as("duel"),
        interceptionStruct.as("interception"),
        gkStruct.as("goalkeeper"),
        clearanceStruct.as("clearance"))).as("extra"),
      e.as("seq"))
  }

  /** Synthetic home team (mirrors SynActions convention). */
  def homeTeamId: Column = col("game_id") % 4

  // ---------------------------------------------------------------------
  // DuckDB mirror: derives qualifier names from the same index arithmetic
  // and dispatches with the same CASE logic, then runs the same pipeline.
  // ---------------------------------------------------------------------

  private def sqlPick(vocab: Seq[String], idxSql: String): String = {
    val arms = vocab.zipWithIndex.collect {
      case (v, i) if v != null => s"WHEN $i THEN '$v'"
    }.mkString(" ")
    s"(CASE ($idxSql) $arms ELSE NULL END)"
  }

  /** CTE chain `raw` → `split` → `sbactions` (parsed, non_action-filtered,
    * direction-fixed, clearance-fixed, resequenced — everything up to but
    * excluding dribble synthesis, which callers append). */
  def oracleCte: String = {
    val tName = sqlPick(typeNames, s"event_id % ${typeNames.length}")
    val dv = "(event_id // 14)"
    val ptype = sqlPick(passTypes, s"$dv * 3 % ${passTypes.length}")
    val height = sqlPick(passHeights, s"$dv * 5 % ${passHeights.length}")
    val crossSql = s"(CASE $dv * 7 % 3 WHEN 1 THEN true WHEN 2 THEN false ELSE NULL END)"
    val pout = sqlPick(passOutcomes, s"$dv * 11 % ${passOutcomes.length}")
    val bp = sqlPick(bodyParts, s"$dv * 13 % ${bodyParts.length}")
    val stype = sqlPick(shotTypes, s"$dv * 7 % ${shotTypes.length}")
    val sout = sqlPick(shotOutcomes, s"$dv * 11 % ${shotOutcomes.length}")
    val dtype = sqlPick(duelTypes, s"$dv * 5 % ${duelTypes.length}")
    val dout = sqlPick(duelOutcomes, s"$dv * 11 % ${duelOutcomes.length}")
    val gtype = sqlPick(gkTypes, s"$dv * 7 % ${gkTypes.length}")
    val gout = sqlPick(gkOutcomes, s"$dv * 11 % ${gkOutcomes.length}")
    val card = sqlPick(foulCards, s"$dv * 5 % ${foulCards.length}")
    val drout = sqlPick(dribbleOutcomes, s"$dv * 7 % ${dribbleOutcomes.length}")

    // shared bodypart mapping (dropKick flag varies per parser)
    def bpSql(default: Int, dropKick: Boolean): String = {
      val footish =
        if (dropKick) "bp_name LIKE '%Foot%' OR bp_name = 'Drop Kick'"
        else "bp_name LIKE '%Foot%'"
      s"""(CASE WHEN bp_name IS NULL THEN $default
         |  WHEN bp_name LIKE '%Head%' THEN 1
         |  WHEN bp_name = 'Left Foot' THEN 4
         |  WHEN bp_name = 'Right Foot' THEN 5
         |  WHEN $footish THEN 0
         |  ELSE 2 END)""".stripMargin
    }

    s"""WITH raw0 AS (
       |  SELECT *,
       |    lpad((event_id % 2)::VARCHAR, 2, '0') || ':' ||
       |      lpad((event_id % 45)::VARCHAR, 2, '0') || ':' ||
       |      lpad((event_id % 60)::VARCHAR, 2, '0') || '.' ||
       |      lpad((event_id % 1000)::VARCHAR, 3, '0') AS sbts
       |  FROM events
       |), raw AS (
       |  SELECT event_id % $NumGames AS game_id, event_id,
       |    CAST(1 + event_id % 2 AS INT) AS period_id,
       |    -- parse the SAME "HH:MM:SS.mmm" string Spark parses (bit-exact;
       |    -- recomputing seconds arithmetically can differ in the last ulp)
       |    CAST(string_split(sbts, ':')[1] AS DOUBLE) * 3600 +
       |      CAST(string_split(sbts, ':')[2] AS DOUBLE) * 60 +
       |      CAST(string_split(sbts, ':')[3] AS DOUBLE) AS time_seconds,
       |    user_id % 4 AS team_id, user_id AS player_id,
       |    $tName AS type_name,
       |    1.0::DOUBLE + event_id % 120
       |      + (CASE WHEN event_id % 21 = 0 THEN 0.5::DOUBLE ELSE 0.0::DOUBLE END) AS loc0,
       |    1.0::DOUBLE + event_id * 3 % 80 AS loc1,
       |    1.0::DOUBLE + event_id * 13 % 120 AS eloc0,
       |    1.0::DOUBLE + event_id * 17 % 80 AS eloc1,
       |    $ptype AS ptype, $height AS height, $crossSql AS pcross,
       |    $pout AS pout, $bp AS bp_name,
       |    $stype AS stype, $sout AS sout,
       |    $dtype AS dtype, $dout AS dout,
       |    $gtype AS gtype, $gout AS gout,
       |    $card AS card, $drout AS drout,
       |    event_id AS seq
       |  FROM raw0
       |), split AS (
       |  SELECT *, seq * 2 + 1 AS seq2, false AS is_derived FROM raw
       |  UNION ALL
       |  SELECT *, seq * 2 AS seq2, true AS is_derived FROM raw
       |  WHERE type_name = 'Pass' AND ptype = 'Interception'
       |), parsed0 AS (
       |  SELECT game_id, event_id, period_id, time_seconds, team_id, player_id,
       |    loc0, loc1, seq2 AS seq,
       |    -- end-location priority pass → shot → carry → fall back to start
       |    CASE WHEN NOT is_derived AND type_name IN ('Pass', 'Shot', 'Carry')
       |         THEN eloc0 ELSE loc0 END AS eloc0,
       |    CASE WHEN NOT is_derived AND type_name IN ('Pass', 'Shot', 'Carry')
       |         THEN eloc1 + (CASE WHEN type_name = 'Shot' AND event_id % 5 = 0
       |                            THEN 0.3::DOUBLE ELSE 0.0::DOUBLE END)
       |         ELSE loc1 END AS eloc1,
       |    (NOT is_derived AND type_name = 'Shot' AND event_id % 5 = 0) AS end3d,
       |    CASE
       |      WHEN is_derived THEN CAST(10 AS INT)
       |      WHEN type_name = 'Pass' THEN
       |        CASE WHEN pout IN ('Injury Clearance', 'Unknown') THEN 20
       |          WHEN ptype = 'Free Kick' THEN
       |            CASE WHEN coalesce(height = 'High Pass', false) OR coalesce(pcross, false) THEN 3 ELSE 4 END
       |          WHEN ptype = 'Corner' THEN
       |            CASE WHEN coalesce(height = 'High Pass', false) OR coalesce(pcross, false) THEN 5 ELSE 6 END
       |          WHEN ptype = 'Goal Kick' THEN 22
       |          WHEN ptype = 'Throw-in' THEN 2
       |          WHEN coalesce(pcross, false) THEN 1
       |          ELSE 0 END
       |      WHEN type_name = 'Dribble' THEN 7
       |      WHEN type_name = 'Carry' THEN 21
       |      WHEN type_name = 'Foul Committed' THEN 8
       |      WHEN type_name = 'Duel' THEN CASE WHEN dtype = 'Tackle' THEN 9 ELSE 20 END
       |      WHEN type_name = 'Interception' THEN 10
       |      WHEN type_name = 'Shot' THEN
       |        CASE WHEN stype = 'Free Kick' THEN 13 WHEN stype = 'Penalty' THEN 12 ELSE 11 END
       |      WHEN type_name = 'Own Goal Against' THEN 19
       |      WHEN type_name = 'Goal Keeper' THEN
       |        CASE WHEN gtype = 'Shot Saved' THEN 14
       |          WHEN gtype IN ('Collected', 'Keeper Sweeper') THEN 15
       |          WHEN gtype = 'Punch' THEN 16 ELSE 20 END
       |      WHEN type_name = 'Clearance' THEN 18
       |      WHEN type_name = 'Miscontrol' THEN 19
       |      ELSE 20 END AS type_id,
       |    CASE
       |      WHEN is_derived THEN CAST(1 AS INT)
       |      WHEN type_name = 'Pass' THEN
       |        CASE WHEN pout IN ('Injury Clearance', 'Unknown') THEN 1
       |          WHEN pout IN ('Incomplete', 'Out') THEN 0
       |          WHEN pout = 'Pass Offside' THEN 2 ELSE 1 END
       |      WHEN type_name = 'Dribble' THEN CASE WHEN drout = 'Incomplete' THEN 0 ELSE 1 END
       |      WHEN type_name = 'Carry' THEN 1
       |      WHEN type_name = 'Foul Committed' THEN
       |        CASE WHEN card LIKE '%Yellow%' THEN 4 WHEN card LIKE '%Red%' THEN 5 ELSE 0 END
       |      WHEN type_name = 'Duel' AND dtype = 'Tackle' THEN
       |        CASE WHEN dout IN ('Lost In Play', 'Lost Out') THEN 0 ELSE 1 END
       |      WHEN type_name = 'Interception' THEN
       |        CASE WHEN dout IN ('Lost In Play', 'Lost Out') THEN 0 ELSE 1 END
       |      WHEN type_name = 'Shot' THEN CASE WHEN sout = 'Goal' THEN 1 ELSE 0 END
       |      WHEN type_name = 'Own Goal Against' THEN 3
       |      WHEN type_name = 'Goal Keeper' THEN
       |        CASE WHEN gout IN ('In Play Danger', 'No Touch') THEN 0 ELSE 1 END
       |      WHEN type_name = 'Miscontrol' THEN 0
       |      ELSE 1 END AS result_id,
       |    CASE
       |      WHEN is_derived THEN CAST(0 AS INT)
       |      WHEN type_name = 'Pass' THEN
       |        CASE WHEN bp_name IS NULL THEN (CASE WHEN ptype = 'Throw-in' THEN 2 ELSE 0 END)
       |          ELSE ${bpSql(0, dropKick = true)} END
       |      WHEN type_name = 'Shot' THEN ${bpSql(0, dropKick = false)}
       |      WHEN type_name = 'Goal Keeper' THEN ${bpSql(2, dropKick = true)}
       |      WHEN type_name = 'Clearance' THEN ${bpSql(0, dropKick = false)}
       |      ELSE 0 END AS bodypart_id
       |  FROM split
       |), fid AS (
       |  SELECT *,
       |    CASE WHEN max(CASE WHEN loc0 % 1 <> 0 OR loc1 % 1 <> 0 THEN 1 ELSE 0 END)
       |              OVER (PARTITION BY game_id) = 1
       |         THEN 0.1::DOUBLE ELSE 1.0::DOUBLE END AS cell_side
       |  FROM parsed0
       |), located AS (
       |  SELECT game_id, period_id, time_seconds, team_id, player_id,
       |    least(greatest((loc0 - cell_side / 2) / 120 * 105.0, 0.0), 105.0) AS start_x,
       |    least(greatest(68.0 - (loc1 - cell_side / 2) / 80 * 68.0, 0.0), 68.0) AS start_y,
       |    least(greatest((eloc0 - cell_side / 2) / 120 * 105.0, 0.0), 105.0) AS end_x,
       |    CASE WHEN end3d
       |      THEN least(greatest(68.0 - (eloc1 - 0.05) / 80 * 68.0, 0.0), 68.0)
       |      ELSE least(greatest(68.0 - (eloc1 - cell_side / 2) / 80 * 68.0, 0.0), 68.0)
       |    END AS end_y,
       |    type_id, result_id, bodypart_id, seq
       |  FROM fid
       |  WHERE type_id <> 20
       |), directed AS (
       |  SELECT game_id, period_id, time_seconds, team_id, player_id,
       |    CASE WHEN team_id <> game_id % 4 THEN 105.0 - start_x ELSE start_x END AS start_x,
       |    CASE WHEN team_id <> game_id % 4 THEN 68.0 - start_y ELSE start_y END AS start_y,
       |    CASE WHEN team_id <> game_id % 4 THEN 105.0 - end_x ELSE end_x END AS end_x,
       |    CASE WHEN team_id <> game_id % 4 THEN 68.0 - end_y ELSE end_y END AS end_y,
       |    type_id, result_id, bodypart_id, seq
       |  FROM located
       |), clr AS (
       |  SELECT game_id, period_id, time_seconds, team_id, player_id, start_x, start_y,
       |    CASE WHEN type_id = 18 THEN coalesce(lead(start_x) OVER w, end_x) ELSE end_x END AS end_x,
       |    CASE WHEN type_id = 18 THEN coalesce(lead(start_y) OVER w, end_y) ELSE end_y END AS end_y,
       |    type_id, result_id, bodypart_id, seq
       |  FROM directed
       |  WINDOW w AS (PARTITION BY game_id ORDER BY period_id, time_seconds, seq)
       |), sbactions AS (
       |  SELECT *,
       |    CAST(row_number() OVER (PARTITION BY game_id ORDER BY period_id, time_seconds, seq) AS BIGINT) - 1 AS action_id
       |  FROM clr
       |)""".stripMargin
  }
}
