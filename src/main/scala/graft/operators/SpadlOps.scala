package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Spadl._
import graft.core.SynActions.{W, Wg}

/** Batch (window-function) formulation of the SPADL normalizer operators.
  *
  * The reference implements these as pandas `shift(±k)` + boolean-mask
  * assignment over one in-memory game (`socceraction/spadl/base.py`). Here
  * each is a declarative per-game window transform: Catalyst plans ONE
  * exchange on `game_id` (all window specs share the partitioning) and the
  * stencils run inside whole-stage codegen. The streaming engine
  * (graft.streaming.SessionEngine) reuses the same semantics in a single
  * ordered per-game pass.
  */
object SpadlOps {

  /** N1 — clearance end-coords := next action's start (last row keeps own).
    * Reference `socceraction/spadl/base.py:13-20`. */
  def fixClearances(actions: DataFrame): DataFrame = actions
    .withColumn("end_x",
      when(col("type_id") === TypeClearance,
        coalesce(lead("start_x", 1).over(Wg), col("end_x"))).otherwise(col("end_x")))
    .withColumn("end_y",
      when(col("type_id") === TypeClearance,
        coalesce(lead("start_y", 1).over(Wg), col("end_y"))).otherwise(col("end_y")))

  /** P15 — mirror coordinates for the away team so both teams attack
    * left-to-right. Reference `socceraction/spadl/base.py:23-30`. */
  def fixDirectionOfPlay(actions: DataFrame, homeTeamId: Column): DataFrame = {
    val away = col("team_id") =!= homeTeamId
    actions
      .withColumn("start_x", when(away, lit(FieldLength) - col("start_x")).otherwise(col("start_x")))
      .withColumn("end_x", when(away, lit(FieldLength) - col("end_x")).otherwise(col("end_x")))
      .withColumn("start_y", when(away, lit(FieldWidth) - col("start_y")).otherwise(col("start_y")))
      .withColumn("end_y", when(away, lit(FieldWidth) - col("end_y")).otherwise(col("end_y")))
  }

  /** P17/J1 — denormalize type/result/bodypart names via the three dimension
    * tables. Reference `socceraction/spadl/utils.py:11-32`. The dims are
    * ≤23 rows: force broadcast so the plan is three BroadcastHashJoins with
    * no shuffle of the fact side.
    */
  def addNames(actions: DataFrame): DataFrame = {
    val spark = actions.sparkSession
    actions
      .join(broadcast(actiontypesDf(spark)), Seq("type_id"), "left")
      .join(broadcast(resultsDf(spark)), Seq("result_id"), "left")
      .join(broadcast(bodypartsDf(spark)), Seq("bodypart_id"), "left")
  }

  val MinDribbleLength = 3.0
  val MaxDribbleLength = 60.0
  val MaxDribbleDuration = 10.0

  /** N2 — synthesize a `dribble` action between consecutive same-team
    * actions whose gap is 3–60 m, <10 s, same period, and where the next
    * action is not a foul, not a shot, and not headed (the reference's
    * `not_headed_shot` is a conjunction of two independent conditions:
    * `base.py:46-48`); then resort and resequence `action_id`.
    * Reference `socceraction/spadl/base.py:38-91`.
    *
    * Formulated as: project each row plus its lead-1 neighbor, emit the
    * conditional dribble rows, union with the base rows, and resequence with
    * `row_number` over (period_id, fractional action_id) — the explicit
    * tiebreaker replaces the reference's interleave-by-`action_id + 0.1`
    * sort. One window pass + one union; no extra shuffle (both sides keep
    * the game_id partitioning under AQE).
    */
  def addDribbles(actions: DataFrame): DataFrame = {
    // pandas shift(-1, fill_value=0) gives the last row an all-zero neighbor;
    // period_id 0 never matches a real period so the last row emits nothing —
    // a null lead here is equivalent (all conditions null-safe false).
    val nx = actions
      .withColumn("nx_team_id", lead("team_id", 1).over(Wg))
      .withColumn("nx_player_id", lead("player_id", 1).over(Wg))
      .withColumn("nx_period_id", lead("period_id", 1).over(Wg))
      .withColumn("nx_time_seconds", lead("time_seconds", 1).over(Wg))
      .withColumn("nx_start_x", lead("start_x", 1).over(Wg))
      .withColumn("nx_start_y", lead("start_y", 1).over(Wg))
      .withColumn("nx_type_id", lead("type_id", 1).over(Wg))
      .withColumn("nx_bodypart_id", lead("bodypart_id", 1).over(Wg))
    val dxc = col("end_x") - col("nx_start_x")
    val dyc = col("end_y") - col("nx_start_y")
    val d2 = dxc * dxc + dyc * dyc
    val cond = (col("team_id") === col("nx_team_id")) &&
      (col("nx_type_id") =!= TypeFoul) &&
      (col("nx_type_id") =!= TypeShot) && (col("nx_bodypart_id") =!= BodypartHead) &&
      (d2 >= MinDribbleLength * MinDribbleLength) &&
      (d2 <= MaxDribbleLength * MaxDribbleLength) &&
      (col("nx_time_seconds") - col("time_seconds") < MaxDribbleDuration) &&
      (col("period_id") === col("nx_period_id"))
    // PLAN SHAPE: emit base-plus-conditional-dribble as a 1-or-2 element
    // array and explode — ONE pass over one lineage. The union formulation
    // (base ∪ extras, both derived from `actions`) evaluates the upstream
    // chain TWICE per insertion stage; chained stages double per stage
    // (the atomic chain hit 16 scans). Values are identical: same row
    // multiset, and the (period_id, aid_frac) resequencing key is a total
    // order (unique action_id per game), so row_number assigns identically.
    val base = struct(
      col("period_id"),
      col("action_id").cast("double").as("aid_frac"),
      col("time_seconds"), col("team_id"), col("player_id"),
      col("start_x"), col("start_y"), col("end_x"), col("end_y"),
      col("type_id"), col("result_id"), col("bodypart_id"), col("seq"))
    val dribble = struct(
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
    val exploded = nx
      .select(col("game_id"),
        explode(when(cond, array(base, dribble)).otherwise(array(base))).as("r"))
      .select(col("game_id"), col("r.*"))
    val wReseq = Window.partitionBy("game_id").orderBy("period_id", "aid_frac")
    exploded
      .withColumn("action_id", row_number().over(wReseq).cast("long") - 1)
      .drop("aid_frac")
      .select("game_id", "action_id", "period_id", "time_seconds", "team_id",
        "player_id", "start_x", "start_y", "end_x", "end_y", "type_id",
        "result_id", "bodypart_id", "seq")
  }

  /** N6 (Opta) — an interception NOT followed by a same-team action is
    * retagged as failed. Reference `socceraction/spadl/opta.py:244-260`. */
  def fixInterceptions(actions: DataFrame): DataFrame = actions
    .withColumn("result_id",
      when(col("type_id") === TypeInterception &&
        !(lead("team_id", 1).over(Wg) <=> col("team_id")), lit(ResultFail))
        .otherwise(col("result_id")))

  /** N5 (Opta) — a ball-recovery (modeled: interception with success) whose
    * possession continues becomes a dribble to the next *real* action's
    * start; the scan for "next non-non_action" is a forward
    * first-ignoring-nulls window. Reference `socceraction/spadl/opta.py:202-241`.
    */
  def nextRealActionStart(actions: DataFrame): DataFrame = {
    // "First non-non_action AFTER current" in ascending order ≡ "nearest
    // non-null BEFORE current" in descending order. The descending
    // (unboundedPreceding, -1) frame is a growing frame WindowExec processes
    // incrementally — O(n) per game — whereas the ascending
    // (1, unboundedFollowing) form is a shrinking frame recomputed per row
    // (O(n²) on long no-real-action stretches; the round-1 bottleneck).
    val wDesc = Window.partitionBy("game_id")
      .orderBy(col("period_id").desc, col("time_seconds").desc, col("seq").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    actions
      .withColumn("next_real_x",
        last(when(col("type_id") =!= TypeNonAction, col("start_x")), ignoreNulls = true)
          .over(wDesc))
      .withColumn("next_real_y",
        last(when(col("type_id") =!= TypeNonAction, col("start_y")), ignoreNulls = true)
          .over(wDesc))
  }

  /** N7 (Opta) — pass deflected by an opponent touch then recovered by the
    * passing team: pass end := action(+2) start, result := success.
    * Reference `socceraction/spadl/opta.py:263-296`. */
  def fixUnintentionalTouches(actions: DataFrame): DataFrame = {
    val deflected = (col("type_id") === TypePass) &&
      (lead("type_id", 1).over(Wg) === TypeBadTouch) &&
      !(lead("team_id", 1).over(Wg) <=> col("team_id")) &&
      (lead("team_id", 2).over(Wg) <=> col("team_id"))
    actions
      .withColumn("end_x", when(deflected, lead("start_x", 2).over(Wg)).otherwise(col("end_x")))
      .withColumn("end_y", when(deflected, lead("start_y", 2).over(Wg)).otherwise(col("end_y")))
      .withColumn("result_id", when(deflected, lit(ResultSuccess)).otherwise(col("result_id")))
  }

  /** O1+O2 — canonical ordering + dense per-game action_id resequencing.
    * Reference `socceraction/spadl/statsbomb.py:110,116`. */
  def resequence(actions: DataFrame): DataFrame =
    actions.withColumn("action_id", row_number().over(Wg).cast("long") - 1)

  /** The batch normalizer+labeler: clearance repair → resequence → dribble
    * synthesis → k=10 lookahead labels, as ONE declarative window chain.
    * Semantically identical to the stateful scan
    * (graft.streaming.SessionEngine.processGame — cross-checked by the
    * stream_cep_batch oracle), but runs entirely in Tungsten rows and
    * whole-stage codegen: no per-row JVM objects, so it scales with memory
    * bandwidth instead of allocator throughput. All window specs share the
    * game_id partitioning — Catalyst plans one exchange. */
  def normalizeAndLabel(actions: DataFrame, nrActions: Int = 10): DataFrame = {
    import graft.vaep.Labels
    Labels.concedes(Labels.scores(
      addDribbles(resequence(fixClearances(actions))), nrActions), nrActions)
  }
}
