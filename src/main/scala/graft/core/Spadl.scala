package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SPADL ("Soccer Player Action Description Language") vocabulary and core
  * record types, re-expressed for Spark.
  *
  * Capability spec: reference `socceraction/spadl/config.py:20-56` (field
  * dimensions and the three closed vocabularies) and
  * `socceraction/spadl/schema.py:11-30` (the action tuple). The reference
  * validates schemas with pandera (strict+coerce); here the schema is carried
  * by a case class + `Encoder`, and dimension tables are tiny broadcastable
  * DataFrames.
  */
object Spadl {
  val FieldLength: Double = 105.0
  val FieldWidth: Double = 68.0

  val bodyparts: Vector[String] =
    Vector("foot", "head", "other", "head/other", "foot_left", "foot_right")

  val results: Vector[String] =
    Vector("fail", "success", "offside", "owngoal", "yellow_card", "red_card")

  val actiontypes: Vector[String] = Vector(
    "pass", "cross", "throw_in", "freekick_crossed", "freekick_short",
    "corner_crossed", "corner_short", "take_on", "foul", "tackle",
    "interception", "shot", "shot_penalty", "shot_freekick", "keeper_save",
    "keeper_claim", "keeper_punch", "keeper_pick_up", "clearance", "bad_touch",
    "non_action", "dribble", "goalkick")

  // Atomic-SPADL adds 10 reified-result action types
  // (reference `socceraction/atomic/spadl/config.py:26-37`).
  val atomicActiontypes: Vector[String] = actiontypes ++ Vector(
    "receival", "interception_atomic_dup", "out", "offside", "goal",
    "owngoal", "yellow_card", "red_card", "corner", "freekick")

  // Frequently used ids.
  val TypePass = 0
  val TypeCross = 1
  val TypeCornerCrossed = 5
  val TypeCornerShort = 6
  val TypeFoul = 8
  val TypeTackle = 9
  val TypeInterception = 10
  val TypeShot = 11
  val TypeShotPenalty = 12
  val TypeShotFreekick = 13
  val TypeClearance = 18
  val TypeBadTouch = 19
  val TypeNonAction = 20
  val TypeDribble = 21
  val TypeGoalkick = 22

  val ResultFail = 0
  val ResultSuccess = 1
  val ResultOffside = 2
  val ResultOwngoal = 3
  val ResultYellow = 4
  val ResultRed = 5

  val BodypartFoot = 0
  val BodypartHead = 1
  val BodypartOther = 2

  /** SPADL action tuple (reference `socceraction/spadl/schema.py:11-30`). */
  final case class Action(
      gameId: Long,
      actionId: Long,
      periodId: Int,
      timeSeconds: Double,
      teamId: Long,
      playerId: Long,
      startX: Double,
      startY: Double,
      endX: Double,
      endY: Double,
      typeId: Int,
      resultId: Int,
      bodypartId: Int,
      seq: Long)

  /** Atomic-SPADL action (reference `socceraction/atomic/spadl/schema.py:11-32`). */
  final case class AtomicAction(
      gameId: Long,
      actionId: Long,
      periodId: Int,
      timeSeconds: Double,
      teamId: Long,
      playerId: Long,
      x: Double,
      y: Double,
      dx: Double,
      dy: Double,
      typeId: Int,
      bodypartId: Int,
      seq: Long)

  /** Dimension tables, mirroring `config.actiontypes_df()` etc.
    * (reference `socceraction/spadl/config.py:59-100`). Tiny — always on the
    * broadcast side of a join.
    */
  def actiontypesDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    actiontypes.zipWithIndex.map { case (n, i) => (i, n) }.toDF("type_id", "type_name")
  }
  def resultsDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    results.zipWithIndex.map { case (n, i) => (i, n) }.toDF("result_id", "result_name")
  }
  def bodypartsDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    bodyparts.zipWithIndex.map { case (n, i) => (i, n) }.toDF("bodypart_id", "bodypart_name")
  }
}
