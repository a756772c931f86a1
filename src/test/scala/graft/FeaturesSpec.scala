package graft

import org.apache.spark.sql.functions._

import graft.vaep.{Features, GameStates}

/** Exact-value golden-fixture assertions mirroring the reference's
  * `tests/vaep/test_features.py` on the vendored 400-action game. */
class FeaturesSpec extends SparkSpec {

  // the reference tests index by positional row (pandas RangeIndex); the
  // fixture's action_ids are sparse, so attach an explicit position
  private lazy val states = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("game_id").orderBy("period_id", "time_seconds", "seq")
    GameStates.withStates(goldenSpadl, 3)
      .withColumn("pos", row_number().over(w) - 1).cache()
  }

  private def featRow(pos: Long, cols: org.apache.spark.sql.Column*) =
    states.filter(col("pos") === pos).select(cols: _*).head

  test("time features (test_features.py:94-103)") {
    val r0 = featRow(0, Features.time(0): _*)
    assert(r0.getLong(0) == 1L)
    assert(r0.getDouble(1) == 0.533)
    assert(r0.getDouble(2) == 0.533)
    val r200 = featRow(200, Features.time(0): _*)
    assert(r200.getLong(0) == 2L)
    assert(r200.getDouble(1) == 0.671)
    assert(r200.getDouble(2) == 0.671 + 45 * 60)
  }

  test("time_delta state features (test_features.py:116-132)") {
    val r1 = featRow(1, Features.timeDelta(1) ++ Features.timeDelta(2): _*)
    assert(math.abs(r1.getDouble(0) - 0.719) < 1e-9)
    assert(math.abs(r1.getDouble(1) - 0.719) < 1e-9) // clamped to first row
    val r2 = featRow(2, Features.timeDelta(1) ++ Features.timeDelta(2): _*)
    assert(math.abs(r2.getDouble(0) - 0.881) < 1e-9)
    assert(math.abs(r2.getDouble(1) - 1.6) < 1e-9)
    // first action of period 2: deltas reset to 0 by period clamping
    val r200 = featRow(200, Features.timeDelta(1) ++ Features.timeDelta(2): _*)
    assert(r200.getDouble(0) == 0.0)
    assert(r200.getDouble(1) == 0.0)
  }

  test("player_possession_time (test_features.py:106-113)") {
    val rows = goldenSpadl
      .select(Seq(col("action_id")) ++ Features.playerPossessionTime: _*)
      .orderBy("action_id").limit(3).collect()
    assert(rows(0).getDouble(1) == 0.0)
    assert(rows(1).getDouble(1) == 0.0)
    assert(math.abs(rows(2).getDouble(1) - 0.881) < 1e-9)
  }

  test("one-hot widths for k=3 (test_features.py:49-91)") {
    assert((0 until 3).flatMap(Features.actiontypeOnehot).size == 23 * 3)
    assert((0 until 3).flatMap(Features.resultOnehot).size == 6 * 3)
    assert((0 until 3).flatMap(Features.actiontypeResultOnehot).size == 138 * 3)
    assert((0 until 3).flatMap(Features.bodypartOnehot).size == 4 * 3)
    assert((0 until 3).flatMap(Features.bodypartDetailedOnehot).size == 6 * 3)
    assert(Features.defaultFeatures(3).size ==
      3 * (23 + 6 + 138 + 4 + 3 + 2 + 2 + 2 + 2 + 3) + 2 * (1 + 1 + 3) + 3)
  }

  test("feature names follow the reference convention") {
    val names = Features.defaultFeatures(3).map(_.toString)
    val flat = states.select(Features.defaultFeatures(3): _*).columns
    assert(flat.contains("actiontype_pass_a0"))
    assert(flat.contains("actiontype_corner_short_result_offside_a2"))
    assert(flat.contains("bodypart_head/other_a1"))
    assert(flat.contains("time_seconds_overall_a0"))
    assert(flat.contains("start_dist_to_goal_a0"))
    assert(flat.contains("time_delta_2"))
    assert(flat.contains("mov_a01"))
    assert(flat.contains("goalscore_diff"))
    assert(names.nonEmpty)
  }

  test("polar features: distance and angle math") {
    val r = goldenSpadl.filter(col("action_id") === 0)
      .select(Features.startpolar(0): _*).head
    // row 0 starts at (52.0625, 34.425): dx=52.9375, dy=0.425
    val dx = 105.0 - 52.0625
    val dy = math.abs(34.0 - 34.425)
    assert(r.getDouble(0) == math.sqrt(dx * dx + dy * dy))
    assert(r.getDouble(1) == math.atan(dy / dx))
  }

  test("goalscore starts 0-0 and counts strictly-before goals") {
    val rows = goldenSpadl
      .select(Seq(col("action_id")) ++ Features.goalscore: _*)
      .orderBy("action_id").collect()
    assert(rows(0).getLong(1) == 0L && rows(0).getLong(2) == 0L)
    rows.foreach { r =>
      assert(r.getLong(1) >= 0L && r.getLong(2) >= 0L)
      assert(r.getLong(3) == r.getLong(1) - r.getLong(2))
    }
  }

  test("packed one-hots unpack to the exact boolean columns") {
    import graft.core.{SynActions, Tables}
    val st = graft.vaep.GameStates.withStates(
      SynActions.fromEvents(Tables.events(spark, "/root/testdata/sf0.001")), 3)
    for (i <- 0 until 3) {
      val viaPacked = st
        .select(Seq(col("game_id"), col("seq")) ++ Features.actiontypeResultPacked(i): _*)
        .select(Seq(col("game_id"), col("seq")) ++ Features.unpackActiontypeResult(i): _*)
      val direct = st
        .select(Seq(col("game_id"), col("seq")) ++ Features.actiontypeResultOnehot(i): _*)
      assert(viaPacked.exceptAll(direct).count() == 0, s"state $i")
      assert(direct.exceptAll(viaPacked).count() == 0, s"state $i")
    }
    // exactly one atr bit set per row, and the categorical word carries
    // type/result/bodypart in its three lanes
    val packed = st.select(
      (Features.actiontypeResultPacked(0) ++ Features.categoricalPacked(0)) :+
        col(graft.vaep.GameStates.st("type_id", 0)).as("t"): _*)
    packed.collect().foreach { r =>
      val bits = (0 until 3).map(w => java.lang.Long.bitCount(r.getLong(w))).sum
      assert(bits == 1)
      val cat = r.getLong(3)
      assert(java.lang.Long.numberOfTrailingZeros(cat) == r.getInt(4)) // type lane
    }
  }
}
