package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Q
import graft.core.{SynKloppy, Tables}
import graft.sources.Kloppy

/** Kloppy-normalized event conversion (SURVEY.md §2.2 P11): enum-qualifier
  * dispatch over the normalized event model (coordinates pre-transformed by
  * kloppy, so no direction fix) — value-golden end to end. */
object KloppyQueries {

  private def raw(s: SparkSession, dir: String): DataFrame =
    SynKloppy.fromEvents(Tables.events(s, dir))

  val all: Seq[Q] = Seq(

    Q("convert_kloppy_full",
      s"${SynKloppy.oracleCte} ${SqlFragments.dribbleTail("sbactions")}") { (s, dir) =>
      Kloppy.convertToActions(raw(s, dir))
        .select("game_id", "action_id", "period_id", "time_seconds", "team_id",
          "player_id", "start_x", "start_y", "end_x", "end_y", "type_id",
          "result_id", "bodypart_id", "seq")
    })
}
