package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Q
import graft.core.{SynStatsBomb, Tables}
import graft.sources.StatsBomb

/** Full StatsBomb raw-event conversion (SURVEY.md §2.2 P8 + §2.3 N3) over
  * the synthetic raw event stream: real JSON `extra` bags parsed with
  * `from_json`, the 11-parser dispatch, the interception-pass split, and the
  * complete normalizer pipeline — value-golden against a DuckDB mirror that
  * re-derives the same qualifiers arithmetically. */
object StatsBombQueries {

  private def raw(s: SparkSession, dir: String): DataFrame =
    SynStatsBomb.fromEvents(Tables.events(s, dir))

  val all: Seq[Q] = Seq(

    Q("convert_statsbomb_full",
      s"${SynStatsBomb.oracleCte} ${SqlFragments.dribbleTail("sbactions")}") { (s, dir) =>
      StatsBomb.convertToActions(raw(s, dir), SynStatsBomb.homeTeamId)
        .select("game_id", "action_id", "period_id", "time_seconds", "team_id",
          "player_id", "start_x", "start_y", "end_x", "end_y", "type_id",
          "result_id", "bodypart_id", "seq")
    })
}
