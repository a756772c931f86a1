package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Q
import graft.core.{SynWyscout, Tables}
import graft.sources.Wyscout

/** Full Wyscout raw-event conversion (SURVEY.md §2.2 P10 + §2.3
  * N12/N13/N15): tag explosion, goal-mosaic shot coordinates, duel/touch/
  * simulation conversions, interception insertion, offside attach, goalkick/
  * foul/keeper-save fix-ups — value-golden against a DuckDB mirror of the
  * entire chain. */
object WyscoutQueries {

  private def raw(s: SparkSession, dir: String): DataFrame =
    SynWyscout.fromEvents(Tables.events(s, dir))

  val all: Seq[Q] = Seq(

    Q("convert_wyscout_full",
      s"${SynWyscout.oracleCte} ${SqlFragments.dribbleTail("sbactions")}") { (s, dir) =>
      Wyscout.convertToActions(raw(s, dir), SynWyscout.homeTeamId)
        .select("game_id", "action_id", "period_id", "time_seconds", "team_id",
          "player_id", "start_x", "start_y", "end_x", "end_y", "type_id",
          "result_id", "bodypart_id", "seq")
    })
}
