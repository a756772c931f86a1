package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Spadl
import graft.sources.Kloppy

/** Per-event-type cases for the kloppy dispatch (`spadl/kloppy.py:180-420`)
  * — the long tail the oracle query exercises only statistically:
  * goalkeeper-action variants with the reference's sequential-override
  * (last-match-wins) order, clearance bodypart, duel/loose-ball guard,
  * interrupted passes, card results, own goals, and the non-action types
  * (SUBSTITUTION / FORMATION_CHANGE / BALL_OUT / RECOVERY / CARD ...)
  * that must be dropped. */
class KloppySpec extends SparkSpec {
  import spark.implicits._

  private def frame(rows: (String, String, Seq[String])*): DataFrame =
    rows.zipWithIndex.map { case ((t, r, q), i) =>
      (1L, i.toLong, 1, 10.0 * (i + 1), 0L, 7L, t, Option(r).filter(_.nonEmpty),
        q, 50.0, 30.0, Some(60.0), Some(35.0), i.toLong)
    }.toDF("game_id", "event_id", "period_id", "time_seconds", "team_id",
      "player_id", "event_type", "result", "qualifiers",
      "start_x", "start_y", "end_x", "end_y", "seq")

  /** Parse one event in isolation (non_action rows vanish entirely). */
  private def one(t: String, r: String, q: Seq[String]): Option[(Int, Int, Int)] = {
    val out = frame((t, r, q)).select(
      Kloppy.parseEvent(col("event_type"), col("result")).as("arb"))
      .select("arb.type_id", "arb.result_id", "arb.bodypart_id").head()
    Some((out.getInt(0), out.getInt(1), out.getInt(2)))
      .filter(_._1 != Spadl.TypeNonAction)
  }

  test("goalkeeper variants: last matching action type wins, other default bodypart") {
    assert(one("GOALKEEPER", "", Seq("SAVE")) == Some((14, 1, Spadl.BodypartOther)))
    assert(one("GOALKEEPER", "", Seq("CLAIM")) == Some((15, 1, Spadl.BodypartOther)))
    assert(one("GOALKEEPER", "", Seq("SMOTHER")) == Some((15, 1, Spadl.BodypartOther)))
    assert(one("GOALKEEPER", "", Seq("PUNCH")) == Some((16, 1, Spadl.BodypartOther)))
    assert(one("GOALKEEPER", "", Seq("PICK_UP")) == Some((17, 1, Spadl.BodypartOther)))
    // sequential ifs in the reference: SAVE then PICK_UP ⇒ PICK_UP wins
    assert(one("GOALKEEPER", "", Seq("SAVE", "PICK_UP")).get._1 == 17)
    assert(one("GOALKEEPER", "", Seq("CLAIM", "PUNCH")).get._1 == 16)
    // REFLEX alone stays non_action (the reference's `pass`)
    assert(one("GOALKEEPER", "", Seq("REFLEX")).isEmpty)
    // explicit bodypart beats the "other" default
    assert(one("GOALKEEPER", "", Seq("SAVE", "HEAD")).get._3 == Spadl.BodypartHead)
  }

  test("clearance carries the parsed bodypart; miscontrol is a failed bad touch") {
    assert(one("CLEARANCE", "", Seq("HEAD")) ==
      Some((Spadl.TypeClearance, Spadl.ResultSuccess, Spadl.BodypartHead)))
    assert(one("CLEARANCE", "", Seq()).get._3 == Spadl.BodypartFoot)
    assert(one("MISCONTROL", "", Seq()) ==
      Some((Spadl.TypeBadTouch, Spadl.ResultFail, Spadl.BodypartFoot)))
  }

  test("duel: ground-and-not-loose-ball is a tackle, anything else non-action") {
    assert(one("DUEL", "WON", Seq("GROUND")).get._1 == Spadl.TypeTackle)
    assert(one("DUEL", "LOST", Seq("GROUND")).get._2 == Spadl.ResultFail)
    assert(one("DUEL", "WON", Seq("GROUND", "LOOSE_BALL")).isEmpty)
    assert(one("DUEL", "WON", Seq("AERIAL")).isEmpty)
  }

  test("passes: interrupted results discard, set-piece and cross variants") {
    assert(one("PASS", null, Seq()).isEmpty) // interrupted (null result)
    assert(one("PASS", "INTERRUPTED", Seq()).isEmpty)
    assert(one("PASS", "COMPLETE", Seq()).get._1 == Spadl.TypePass)
    assert(one("PASS", "OFFSIDE", Seq()).get._2 == Spadl.ResultOffside)
    assert(one("PASS", "COMPLETE", Seq("CORNER_KICK", "CROSS")).get._1 ==
      Spadl.TypeCornerCrossed)
    assert(one("PASS", "COMPLETE", Seq("CORNER_KICK")).get._1 == Spadl.TypeCornerShort)
    assert(one("PASS", "COMPLETE", Seq("FREE_KICK", "LONG_BALL")).get._1 == 3)
    assert(one("PASS", "COMPLETE", Seq("THROW_IN")) == Some((2, 1, Spadl.BodypartOther)))
    assert(one("PASS", "COMPLETE", Seq("KEEPER_ARM")).get._3 == Spadl.BodypartOther)
  }

  test("fouls and shots: cards, penalties, own goals") {
    assert(one("FOUL_COMMITTED", "", Seq("FIRST_YELLOW")).get._2 == Spadl.ResultYellow)
    assert(one("FOUL_COMMITTED", "", Seq("SECOND_YELLOW")).get._2 == Spadl.ResultRed)
    assert(one("FOUL_COMMITTED", "", Seq("RED")).get._2 == Spadl.ResultRed)
    assert(one("FOUL_COMMITTED", "", Seq()).get._2 == Spadl.ResultFail)
    assert(one("SHOT", "GOAL", Seq("PENALTY")) ==
      Some((Spadl.TypeShotPenalty, Spadl.ResultSuccess, Spadl.BodypartFoot)))
    assert(one("SHOT", "OWN_GOAL", Seq()) ==
      Some((Spadl.TypeBadTouch, Spadl.ResultOwngoal, Spadl.BodypartFoot)))
    assert(one("SHOT", "SAVED", Seq("FREE_KICK")).get._1 == Spadl.TypeShotFreekick)
  }

  test("long-tail non-action event types are dropped from the converted stream") {
    val longTail = Seq("GENERIC", "RECOVERY", "SUBSTITUTION", "CARD",
      "PLAYER_ON", "PLAYER_OFF", "BALL_OUT", "FORMATION_CHANGE")
    for (t <- longTail) assert(one(t, "COMPLETE", Seq()).isEmpty, t)
    // and end-to-end: a stream of only long-tail events converts to nothing
    val out = Kloppy.convertToActions(frame(longTail.map(t => (t, "COMPLETE", Seq.empty[String])): _*))
    assert(out.count() == 0)
  }

  test("end-to-end: interception keeps its bodypart and failure results") {
    assert(one("INTERCEPTION", "LOST", Seq("HEAD")) ==
      Some((Spadl.TypeInterception, Spadl.ResultFail, Spadl.BodypartHead)))
    assert(one("INTERCEPTION", "SUCCESS", Seq()).get._2 == Spadl.ResultSuccess)
  }
}
