package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed backward as-of join: for each left row, attach the payload
  * of the most recent right row with the same key and `ts <= left.ts`
  * (inclusive — a right row at exactly the left timestamp matches).
  *
  * Physical shape — deliberately NOT a range join. Both sides are unioned
  * with a side marker and processed by ONE running window sorted on
  * (key, ts, side): the right payload (packed in a single non-null struct
  * so legitimately-null payload fields survive) is carried forward with
  * `last(_, ignoreNulls)` over UNBOUNDED PRECEDING..CURRENT ROW, then left
  * rows are filtered back out. One shuffle on key, one sort, zero join
  * nodes — so there is no candidate-pair blowup on hot keys: the plan is
  * linear in |L|+|R| at any key skew, where a naive `l.ts >= r.ts` range
  * join does O(|L_k|·|R_k|) work per key and dies on skewed keys at scale.
  * At equal ts the right row sorts first (side 0 < 1), giving the inclusive
  * bound without a second pass.
  *
  * Contract: right rows must be unique per (key, ts) — pre-aggregate if
  * not (ties would otherwise resolve by sort position, not a defined rule).
  * Skew note: one pathological key still serializes one partition; the
  * standard fix is range-bucketing ts within the hot key and carrying the
  * bucket-boundary payload forward in a second tiny pass (same stitching
  * the salted session engine does — streaming/SaltedSession.scala).
  */
object AsofJoin {

  /** Left columns + `payload` columns from the matched right row (null
    * struct fields when no right row precedes). `key` and `ts` must exist
    * on both sides; `payload` names must not collide with left columns. */
  def backward(left: DataFrame, right: DataFrame, key: String, ts: String,
      payload: Seq[String]): DataFrame = {
    val leftRest = left.columns.toSeq.filterNot(c => c == key || c == ts)
    val payloadType = org.apache.spark.sql.types.StructType(
      right.select(payload.map(col): _*).schema.fields)
    val l = left.select(
      Seq(col(key), col(ts), lit(1).as("__side")) ++ leftRest.map(col) :+
        lit(null).cast(payloadType).as("__payload"): _*)
    val r = right.select(
      Seq(col(key), col(ts), lit(0).as("__side")) ++
        leftRest.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(payload.map(col): _*).as("__payload"): _*)
    val w = Window.partitionBy(key).orderBy(col(ts), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__payload", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(Seq(col(key), col(ts)) ++ leftRest.map(col) ++
        payload.map(c => col("__payload").getField(c).as(c)): _*)
  }
}
