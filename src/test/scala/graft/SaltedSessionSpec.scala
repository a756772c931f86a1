package graft

import org.apache.spark.sql.functions._

import graft.core.{Spadl, SynActions, Tables}
import graft.streaming.{SaltedSession, SessionEngine}

/** The salted (game, period)-sharded CEP pass must equal the per-game pass
  * row for row — including the boundary cases it exists for: clearances as
  * the last action of a period and label windows crossing the period
  * boundary. */
class SaltedSessionSpec extends SparkSpec {
  import spark.implicits._

  private def compare(actions: org.apache.spark.sql.DataFrame): Unit = {
    val cols = Seq("game_id", "action_id", "period_id", "time_seconds",
      "team_id", "player_id", "start_x", "start_y", "end_x", "end_y",
      "type_id", "result_id", "bodypart_id", "seq", "scores", "concedes")
    val a = SessionEngine.runBatch(actions).select(cols.map(col): _*)
    val b = SaltedSession.runBatch(actions).select(cols.map(col): _*)
    assert(a.count() == b.count())
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("salted == unsalted on the synthetic multi-period action stream") {
    compare(SynActions.fromEvents(Tables.events(spark, "/root/testdata/sf0.001")))
  }

  test("boundary cases: period-last clearance and labels crossing the boundary") {
    def a(seq: Long, period: Int, t: Double, team: Long, ty: Int, res: Int,
          sx: Double, sy: Double, ex: Double, ey: Double) =
      (1L, seq, period, t, team, team * 10, sx, sy, ex, ey, ty, res, 0, seq)
    val rows = Seq(
      // period 1: ends with a clearance whose end must snap to period 2's
      // first action
      a(0, 1, 0.0, 0, Spadl.TypePass, 1, 10, 10, 20, 20),
      a(1, 1, 5.0, 0, Spadl.TypePass, 1, 30, 20, 40, 20),
      a(2, 1, 9.0, 1, Spadl.TypeClearance, 1, 60, 40, 70, 40),
      // period 2 begins with a goal 2 actions in: period-1 tail rows'
      // k=10 label windows must see it
      a(3, 2, 0.0, 0, Spadl.TypePass, 1, 80, 30, 85, 30),
      a(4, 2, 3.0, 0, Spadl.TypeShot, Spadl.ResultSuccess, 90, 34, 105, 34),
      a(5, 2, 8.0, 1, Spadl.TypePass, 1, 50, 30, 55, 30))
      .toDF("game_id", "seq", "period_id", "time_seconds", "team_id",
        "player_id", "start_x", "start_y", "end_x", "end_y", "type_id",
        "result_id", "bodypart_id", "action_id")
      .withColumn("seq", col("seq"))
    compare(rows)

    // direct assertions on the interesting rows
    val out = SaltedSession.runBatch(rows).orderBy("action_id").collect()
    val clearance = out.find(_.getAs[Int]("type_id") == Spadl.TypeClearance).get
    assert(clearance.getAs[Double]("end_x") == 80.0) // next period's first start
    val p1Team0 = out.filter(r => r.getAs[Int]("period_id") == 1 &&
      r.getAs[Long]("team_id") == 0L)
    assert(p1Team0.nonEmpty && p1Team0.forall(_.getAs[Boolean]("scores")))
    val p1Team1 = out.filter(r => r.getAs[Int]("period_id") == 1 &&
      r.getAs[Long]("team_id") == 1L)
    assert(p1Team1.forall(_.getAs[Boolean]("concedes")))
  }

  test("skewed game: one long game sharded over periods still matches") {
    val rows = (0 until 400).map { i =>
      val period = 1 + i / 100 // 4 periods × 100 actions
      (7L, i.toLong, period, (i % 100).toDouble * 3, (i % 3).toLong, i.toLong % 11,
        (i % 7) * 15.0, (i % 5) * 13.0, (i % 11) * 9.0, (i % 6) * 11.0,
        i % 23, i % 6, i % 3, i.toLong)
    }.toDF("game_id", "seq", "period_id", "time_seconds", "team_id",
      "player_id", "start_x", "start_y", "end_x", "end_y", "type_id",
      "result_id", "bodypart_id", "action_id")
    compare(rows)
  }
}
