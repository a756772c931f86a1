package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Spadl._
import graft.core.SynActions.Wg

/** The remaining neighbor-repair stencils (SURVEY.md §2.3 N8–N14): each a
  * lag/lead window conditional + filter, the declarative form of the
  * reference's shift-and-mask passes. Applied to the synthetic SPADL stream
  * with the provider-specific trigger types mapped onto SPADL ids. */
object RepairOps {

  /** N8 (Opta `spadl/opta.py:188-199`) — an own-goal shot gets its end
    * coordinates mirrored and is retyped bad_touch. */
  def fixOwngoals(actions: DataFrame): DataFrame = {
    val owngoalShot = col("type_id") === TypeShot && col("result_id") === ResultOwngoal
    actions
      .withColumn("end_x", when(owngoalShot, lit(FieldLength) - col("end_x")).otherwise(col("end_x")))
      .withColumn("end_y", when(owngoalShot, lit(FieldWidth) - col("end_y")).otherwise(col("end_y")))
      .withColumn("type_id", when(owngoalShot, lit(TypeBadTouch)).otherwise(col("type_id")))
  }

  /** N10 (Wyscout `spadl/wyscout.py:421-455`) — an offside marker row
    * following a pass marks the pass offside and is dropped. Marker here:
    * bad_touch rows. */
  def attachOffsides(actions: DataFrame): DataFrame = {
    val nextIsMarker = lead("type_id", 1).over(Wg) === TypeBadTouch
    val isMarker = col("type_id") === TypeBadTouch
    actions
      .withColumn("result_id",
        when(col("type_id") === TypePass && nextIsMarker, lit(ResultOffside))
          .otherwise(col("result_id")))
      .filter(!isMarker)
  }

  /** N14 (Wyscout `spadl/wyscout.py:782-802,893-917`) — goalkicks start at
    * (5, 34); result = success iff the next action keeps possession. */
  def fixGoalkicks(actions: DataFrame): DataFrame = {
    val gk = col("type_id") === TypeGoalkick
    actions
      .withColumn("start_x", when(gk, lit(5.0)).otherwise(col("start_x")))
      .withColumn("start_y", when(gk, lit(34.0)).otherwise(col("start_y")))
      .withColumn("result_id",
        when(gk && (lead("team_id", 1).over(Wg) <=> col("team_id")), lit(ResultSuccess))
          .when(gk, lit(ResultFail))
          .otherwise(col("result_id")))
  }

  /** N11 (Wyscout `spadl/wyscout.py:458-502`) — a foul directly after the
    * same player's take-on is a simulation: the take-on fails and the foul
    * row is dropped (lag-driven, unlike the lead stencils). */
  def fixSimulations(actions: DataFrame): DataFrame = {
    val prevTakeOnSamePlayer = lag("type_id", 1).over(Wg) === TypeTakeOn &&
      (lag("player_id", 1).over(Wg) <=> col("player_id"))
    val nextFoulSamePlayer = lead("type_id", 1).over(Wg) === TypeFoul &&
      (lead("player_id", 1).over(Wg) <=> col("player_id"))
    actions
      .withColumn("result_id",
        when(col("type_id") === TypeTakeOn && nextFoulSamePlayer, lit(ResultFail))
          .otherwise(col("result_id")))
      .withColumn("drop_row", col("type_id") === TypeFoul && prevTakeOnSamePlayer)
      .filter(!col("drop_row"))
      .drop("drop_row")
  }

  /** N9 (Wyscout `spadl/wyscout.py:290-374`) — duel, duel, out-of-field
    * triple: the first duel becomes the winner's pass to the out location;
    * the second duel and the out row are dropped (lead×2 stencil). */
  def fixDuels(actions: DataFrame): DataFrame = {
    val duelTriple = col("type_id") === TypeTackle &&
      (lead("type_id", 1).over(Wg) === TypeTackle) &&
      (lead("type_id", 2).over(Wg) === TypeNonAction)
    val secondOfTriple = col("type_id") === TypeTackle &&
      (lag("type_id", 1).over(Wg) === TypeTackle) &&
      (lead("type_id", 1).over(Wg) === TypeNonAction)
    val outAfterDuels = col("type_id") === TypeNonAction &&
      (lag("type_id", 1).over(Wg) === TypeTackle) &&
      (lag("type_id", 2).over(Wg) === TypeTackle)
    actions
      .withColumn("end_x", when(duelTriple, lead("start_x", 2).over(Wg)).otherwise(col("end_x")))
      .withColumn("end_y", when(duelTriple, lead("start_y", 2).over(Wg)).otherwise(col("end_y")))
      .withColumn("type_id", when(duelTriple, lit(TypePass)).otherwise(col("type_id")))
      .withColumn("drop_row", secondOfTriple || outAfterDuels)
      .filter(!col("drop_row"))
      .drop("drop_row")
  }

  val TypeTakeOn = 7
}
