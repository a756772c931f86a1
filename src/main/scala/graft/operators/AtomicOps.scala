package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Spadl._

/** Atomic-SPADL converter (reference `socceraction/atomic/spadl/base.py`).
  *
  * Chain: `_extra_from_passes` → `_add_dribbles` → `_extra_from_shots` →
  * `_extra_from_fouls` → `_convert_columns` → `_simplify`. Each insertion
  * stage is ONE pass: a lead-window projection that emits the base row plus
  * a conditional synthesized row as a 1-or-2 element array, exploded and
  * resequenced with `row_number` over the fractional interleave key — the
  * declarative equivalent of pandas "append with action_id + 0.1, stable
  * sort, renumber". All windows share the game_id partitioning, so Catalyst
  * keeps ONE exchange for the whole chain and evaluates each stage's input
  * exactly once (the earlier base∪extras union formulation re-evaluated the
  * upstream chain per branch — 2⁴ = 16 scans over four stages).
  *
  * Reference quirk preserved: `ar.index("interception")` resolves to the
  * BASE interception id (10), not a new atomic id, because the atomic
  * vocabulary extends the base list (`atomic/spadl/base.py:96`,
  * `atomic/spadl/config.py:26-37`).
  */
object AtomicOps {

  // atomic action-type ids (base vocabulary + 10, `atomic/spadl/config.py:26-37`)
  val TypeReceival = 23
  val TypeOut = 25
  val TypeOffside = 26
  val TypeGoal = 27
  val TypeOwngoal = 28
  val TypeYellowCard = 29
  val TypeRedCard = 30
  val TypeCorner = 31
  val TypeFreekick = 32

  private val PasslikeIds = Seq(0, 1, 2, 4, 3, 5, 6, 18, 22)
  private val InterceptionlikeIds = Seq(10, 9, 16, 14, 15, 17)
  private val ShotlikeIds = Seq(TypeShot, TypeShotFreekick, TypeShotPenalty)

  private val Wa = Window.partitionBy("game_id").orderBy("period_id", "action_id")

  private val outCols = Seq("game_id", "period_id", "action_id", "time_seconds",
    "team_id", "player_id", "start_x", "start_y", "end_x", "end_y",
    "type_id", "result_id", "bodypart_id", "seq")

  /** The current row as an interleave struct (aid_frac = action_id). */
  private def baseStruct: Column = struct(
    col("period_id"),
    col("action_id").cast("double").as("aid_frac"),
    col("time_seconds"), col("team_id"), col("player_id"),
    col("start_x"), col("start_y"), col("end_x"), col("end_y"),
    col("type_id"), col("result_id"), col("bodypart_id"), col("seq"))

  /** One insertion stage: per row emit [base] or [base, extra], explode,
    * renumber per game in (period, aid_frac) order. The synthesized-row
    * multiset and the resequencing key are identical to the reference's
    * append-sort-renumber, so results match row for row. */
  private def explodeInterleave(withNx: DataFrame, cond: Column, extra: Column): DataFrame = {
    val exploded = withNx
      .select(col("game_id"),
        explode(when(cond, array(baseStruct, extra)).otherwise(array(baseStruct))).as("r"))
      .select(col("game_id"), col("r.*"))
    val w = Window.partitionBy("game_id").orderBy("period_id", "aid_frac")
    exploded
      .withColumn("action_id", row_number().over(w).cast("long") - 1)
      .select(outCols.map(col): _*)
  }

  /** N16 — synthesize receival / interception / out / offside rows after
    * pass-like actions (`atomic/spadl/base.py:39-113`). */
  def extraFromPasses(actions: DataFrame): DataFrame = {
    val nx = actions
      .withColumn("nx_team_id", lead("team_id", 1).over(Wa))
      .withColumn("nx_player_id", lead("player_id", 1).over(Wa))
      .withColumn("nx_period_id", lead("period_id", 1).over(Wa))
      .withColumn("nx_time_seconds", lead("time_seconds", 1).over(Wa))
      .withColumn("nx_type_id", lead("type_id", 1).over(Wa))
    val samePeriod = col("nx_period_id") === col("period_id") // lead null ⇒ false ≡ samegame&sameperiod
    val extraIdx = col("type_id").isin(PasslikeIds: _*) && samePeriod &&
      !col("nx_type_id").isin(InterceptionlikeIds: _*)
    val sameTeam = col("team_id") === col("nx_team_id")
    val offside = col("result_id") === ResultOffside
    val out = (col("nx_type_id") === TypeGoalkick && !sameTeam) ||
      col("nx_type_id") === lit(2) // throw_in
    // mask order (`base.py:98-104`): receival < interception < out < offside
    val typeId = when(offside, TypeOffside)
      .when(out, TypeOut)
      .when(!sameTeam, TypeInterception)
      .otherwise(TypeReceival)
    val extra = struct(
      col("period_id"),
      (col("action_id").cast("double") + 0.1).as("aid_frac"),
      ((col("time_seconds") + col("nx_time_seconds")) / 2).as("time_seconds"),
      when(typeId === TypeInterception, col("nx_team_id")).otherwise(col("team_id")).as("team_id"),
      when(out || offside, col("player_id")).otherwise(col("nx_player_id")).as("player_id"),
      col("end_x").as("start_x"), col("end_y").as("start_y"),
      col("end_x").as("end_x"), col("end_y").as("end_y"),
      typeId.as("type_id"),
      lit(-1).as("result_id"),
      lit(BodypartFoot).as("bodypart_id"),
      col("seq"))
    explodeInterleave(nx, extraIdx, extra)
  }

  /** N17 — goal / owngoal / out rows after shots (`atomic/spadl/base.py:116-166`). */
  def extraFromShots(actions: DataFrame): DataFrame = {
    val nx = actions
      .withColumn("nx_period_id", lead("period_id", 1).over(Wa))
      .withColumn("nx_type_id", lead("type_id", 1).over(Wa))
    val samePeriod = col("nx_period_id") === col("period_id")
    val shot = col("type_id").isin(ShotlikeIds: _*)
    val goal = shot && col("result_id") === ResultSuccess
    val owngoal = col("result_id") === ResultOwngoal
    val out = shot && col("nx_type_id").isin(TypeCornerCrossed, TypeCornerShort, TypeGoalkick) &&
      samePeriod
    // mask order (`base.py:157-161`): out < goal < owngoal
    val typeId = when(owngoal, TypeOwngoal).when(goal, TypeGoal).otherwise(TypeOut)
    val extra = struct(
      col("period_id"),
      (col("action_id").cast("double") + 0.1).as("aid_frac"),
      col("time_seconds"), col("team_id"), col("player_id"),
      col("end_x").as("start_x"), col("end_y").as("start_y"),
      col("end_x").as("end_x"), col("end_y").as("end_y"),
      typeId.as("type_id"),
      lit(-1).as("result_id"),
      col("bodypart_id"),
      col("seq"))
    explodeInterleave(nx, goal || owngoal || out, extra)
  }

  /** N18 — yellow/red-card rows (`atomic/spadl/base.py:169-197`). */
  def extraFromFouls(actions: DataFrame): DataFrame = {
    val yellow = col("result_id") === ResultYellow
    val red = col("result_id") === ResultRed
    val extra = struct(
      col("period_id"),
      (col("action_id").cast("double") + 0.1).as("aid_frac"),
      col("time_seconds"), col("team_id"), col("player_id"),
      col("end_x").as("start_x"), col("end_y").as("start_y"),
      col("end_x").as("end_x"), col("end_y").as("end_y"),
      when(red, TypeRedCard).otherwise(TypeYellowCard).as("type_id"),
      lit(-1).as("result_id"),
      col("bodypart_id"),
      col("seq"))
    explodeInterleave(actions, yellow || red, extra)
  }

  /** `_add_dribbles` re-run inside the atomic chain operates on the
    * action_id-resequenced frame, so the neighbor order is (period,
    * action_id) (`atomic/spadl/base.py:31`). */
  def addDribblesById(actions: DataFrame): DataFrame = {
    val nx = actions
      .withColumn("nx_team_id", lead("team_id", 1).over(Wa))
      .withColumn("nx_player_id", lead("player_id", 1).over(Wa))
      .withColumn("nx_period_id", lead("period_id", 1).over(Wa))
      .withColumn("nx_time_seconds", lead("time_seconds", 1).over(Wa))
      .withColumn("nx_start_x", lead("start_x", 1).over(Wa))
      .withColumn("nx_start_y", lead("start_y", 1).over(Wa))
      .withColumn("nx_type_id", lead("type_id", 1).over(Wa))
      .withColumn("nx_bodypart_id", lead("bodypart_id", 1).over(Wa))
    val dxc = col("end_x") - col("nx_start_x")
    val dyc = col("end_y") - col("nx_start_y")
    val d2 = dxc * dxc + dyc * dyc
    val cond = (col("team_id") === col("nx_team_id")) &&
      (col("nx_type_id") =!= TypeFoul) &&
      (col("nx_type_id") =!= TypeShot) && (col("nx_bodypart_id") =!= BodypartHead) &&
      (d2 >= SpadlOps.MinDribbleLength * SpadlOps.MinDribbleLength) &&
      (d2 <= SpadlOps.MaxDribbleLength * SpadlOps.MaxDribbleLength) &&
      (col("nx_time_seconds") - col("time_seconds") < SpadlOps.MaxDribbleDuration) &&
      (col("period_id") === col("nx_period_id"))
    val extra = struct(
      col("nx_period_id").cast("int").as("period_id"),
      (col("action_id").cast("double") + 0.1).as("aid_frac"),
      ((col("time_seconds") + col("nx_time_seconds")) / 2).as("time_seconds"),
      col("nx_team_id").as("team_id"),
      col("nx_player_id").as("player_id"),
      col("end_x").as("start_x"), col("end_y").as("start_y"),
      col("nx_start_x").as("end_x"), col("nx_start_y").as("end_y"),
      lit(TypeDribble).as("type_id"),
      lit(ResultSuccess).as("result_id"),
      lit(BodypartFoot).as("bodypart_id"),
      col("seq"))
    explodeInterleave(nx, cond, extra)
  }

  /** P19 + P18 — project to (x, y, dx, dy) and remap corner/freekick types
    * (`atomic/spadl/base.py:200-236`). */
  def convertColumns(actions: DataFrame): DataFrame = actions.select(
    col("game_id"), col("action_id"), col("period_id"), col("time_seconds"),
    col("team_id"), col("player_id"),
    col("start_x").as("x"), col("start_y").as("y"),
    (col("end_x") - col("start_x")).as("dx"),
    (col("end_y") - col("start_y")).as("dy"),
    when(col("type_id").isin(TypeCornerCrossed, TypeCornerShort), TypeCorner)
      .when(col("type_id").isin(3, 4, TypeShotFreekick), TypeFreekick)
      .otherwise(col("type_id")).as("type_id"),
    col("bodypart_id"), col("seq"))

  /** Full SPADL → Atomic-SPADL conversion (`atomic/spadl/base.py:16-36`). */
  def convertToAtomic(actions: DataFrame): DataFrame =
    convertColumns(
      extraFromFouls(extraFromShots(addDribblesById(extraFromPasses(actions)))))
}
