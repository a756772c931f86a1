package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-stride int32-lane codec between SPADL action tuples and the
  * engine's ingest surface — an Iceberg-style table of pre-tokenized
  * sequences `(doc_id: string, tokens: array<int32>, n_tok: int32,
  * source: string)` where each doc is one match.
  *
  * Lane layout (FIXTURES.md §1): per action, 12 int32 lanes
  * [action_id, period_id, time_ms, team_id, player_id, start_x_cm,
  * start_y_cm, end_x_cm, end_y_cm, type_id, result_id, bodypart_id].
  * Coordinates are quantized to centimeters and time to milliseconds, so
  * the per-row invariant vs any producer is equality of quantized int
  * lanes; codec law `decode(encode(x)) == quantize(x)` is property-tested.
  *
  * Encode is one `groupBy(game_id)` with an order-preserving
  * `array_agg`-style collect (sort_array over (action_id, lanes) structs —
  * deterministic, not collect-order dependent); decode is a pure
  * explode + projection, no shuffle.
  */
object TokenCodec {

  val Stride = 12

  /** actions (standard schema) → tokenized docs. */
  def encode(actions: DataFrame): DataFrame = {
    val lanes = array(
      col("action_id").cast("int"),
      col("period_id").cast("int"),
      round(col("time_seconds") * 1000).cast("int"),
      col("team_id").cast("int"),
      col("player_id").cast("int"),
      round(col("start_x") * 100).cast("int"),
      round(col("start_y") * 100).cast("int"),
      round(col("end_x") * 100).cast("int"),
      round(col("end_y") * 100).cast("int"),
      col("type_id").cast("int"),
      col("result_id").cast("int"),
      col("bodypart_id").cast("int"))
    actions
      .select(col("game_id"), struct(col("action_id"), lanes.as("lanes")).as("a"))
      .groupBy("game_id")
      .agg(sort_array(collect_list(col("a"))).as("acts"))
      .select(
        col("game_id").cast("string").as("doc_id"),
        flatten(col("acts.lanes")).as("tokens"),
        (size(col("acts")) * Stride).as("n_tok"),
        lit("spadl").as("source"))
  }

  /** tokenized docs → actions (quantized units restored to meters/seconds). */
  def decode(docs: DataFrame): DataFrame = {
    val nActions = (size(col("tokens")) / Stride).cast("int")
    val acts = transform(sequence(lit(0), nActions - 1),
      i => slice(col("tokens"), i * Stride + 1, lit(Stride)))
    docs
      .select(col("doc_id"), col("source"), explode(acts).as("l"))
      .select(
        col("doc_id").cast("long").as("game_id"),
        element_at(col("l"), 1).cast("long").as("action_id"),
        element_at(col("l"), 2).as("period_id"),
        (element_at(col("l"), 3).cast("double") / 1000.0).as("time_seconds"),
        element_at(col("l"), 4).cast("long").as("team_id"),
        element_at(col("l"), 5).cast("long").as("player_id"),
        (element_at(col("l"), 6).cast("double") / 100.0).as("start_x"),
        (element_at(col("l"), 7).cast("double") / 100.0).as("start_y"),
        (element_at(col("l"), 8).cast("double") / 100.0).as("end_x"),
        (element_at(col("l"), 9).cast("double") / 100.0).as("end_y"),
        element_at(col("l"), 10).as("type_id"),
        element_at(col("l"), 11).as("result_id"),
        element_at(col("l"), 12).as("bodypart_id"))
  }

  /** Quantize an action frame to codec resolution (the fixpoint domain of
    * encode∘decode): cm coords, ms times. */
  def quantize(actions: DataFrame): DataFrame = actions
    .withColumn("time_seconds", round(col("time_seconds") * 1000).cast("int").cast("double") / 1000.0)
    .withColumn("start_x", round(col("start_x") * 100).cast("int").cast("double") / 100.0)
    .withColumn("start_y", round(col("start_y") * 100).cast("int").cast("double") / 100.0)
    .withColumn("end_x", round(col("end_x") * 100).cast("int").cast("double") / 100.0)
    .withColumn("end_y", round(col("end_y") * 100).cast("int").cast("double") / 100.0)
}
