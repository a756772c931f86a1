package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Q
import graft.core.{SynOpta, Tables}
import graft.sources.Opta

/** Full Opta raw-event conversion (SURVEY.md §2.2 P9 + the Opta repair
  * chain): qualifier-array dispatch, recoveries→dribbles, unintentional
  * deflection fix, owngoal flip, interception result fix — value-golden
  * against a DuckDB mirror of the whole chain. */
object OptaQueries {

  private def raw(s: SparkSession, dir: String): DataFrame =
    SynOpta.fromEvents(Tables.events(s, dir))

  val all: Seq[Q] = Seq(

    Q("convert_opta_full",
      s"${SynOpta.oracleCte} ${SqlFragments.dribbleTail("sbactions")}") { (s, dir) =>
      Opta.convertToActions(raw(s, dir), SynOpta.homeTeamId)
        .select("game_id", "action_id", "period_id", "time_seconds", "team_id",
          "player_id", "start_x", "start_y", "end_x", "end_y", "type_id",
          "result_id", "bodypart_id", "seq")
    })
}
