package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S9 — the Wyscout API loader (local layout): `competitions.json`,
  * `seasons_{competition_id}.json`, `matches_{season_id}.json`,
  * `events_{game_id}.json` (the API payload with events/teams/players/match
  * sections). Reference `socceraction/data/wyscout/loader.py:330-660`
  * (feeds, accessors) and `:662-780` (the *_convert_* projections).
  *
  * `events(gameId)` emits exactly the frame `Wyscout.convertToActions`
  * consumes: wyscout type/subtype ids, `tags` as array<int>, `positions` as
  * array<struct<x,y>>, milliseconds from eventSec, period ids from the
  * 1H/2H/E1/E2/P vocabulary, and a deterministic per-game `seq`.
  */
final class WyscoutLoader(spark: SparkSession, root: String) {

  private def readJson(rel: String): DataFrame =
    spark.read.option("multiLine", true).json(s"$root/$rel")

  /** `_convert_competitions` (`loader.py:662-673`). */
  def competitions(): DataFrame =
    readJson("competitions.json").select(
      col("wyId").as("competition_id"),
      col("name").as("competition_name"),
      when(col("area.name") === "", "International").otherwise(col("area.name"))
        .as("country_name"),
      coalesce(col("gender"), lit("male")).as("competition_gender"))

  /** `_convert_seasons` (`loader.py:676-684`). */
  def seasons(competitionId: Long): DataFrame =
    readJson(s"seasons_$competitionId.json").select(
      col("wyId").as("season_id"),
      col("name").as("season_name"),
      col("competitionId").as("competition_id"))

  /** `_convert_games` (`loader.py:687-707`): teamsData is an object keyed by
    * team id — read with an explicit map schema (dynamic JSON keys must not
    * become inferred struct fields). */
  def games(competitionId: Long, seasonId: Long): DataFrame = {
    val teamsDataType = MapType(StringType,
      StructType(Seq(StructField("side", StringType), StructField("score", LongType))))
    val m = readJson(s"matches_$seasonId.json")
      .select(explode(col("matches")).as("m"))
      .withColumn("teamsData", from_json(to_json(col("m.teamsData")), teamsDataType))
    def sideTeam(side: String): Column =
      element_at(
        map_keys(map_filter(col("teamsData"), (_, v) => v.getField("side") === side)), 1)
        .cast("long")
    m.select(
      col("m.matchId").as("game_id"),
      col("m.competitionId").as("competition_id"),
      col("m.seasonId").as("season_id"),
      to_timestamp(col("m.dateutc")).as("game_date"),
      col("m.gameweek").as("game_day"),
      sideTeam("home").as("home_team_id"),
      sideTeam("away").as("away_team_id"))
      .filter(col("competition_id") === competitionId)
  }

  private def eventsPayload(gameId: Long): DataFrame = readJson(s"events_$gameId.json")

  /** `_convert_teams` (`loader.py:725-732`): the API payload's teams
    * section, an object keyed by team id. */
  def teams(gameId: Long): DataFrame = {
    val teamType = MapType(StringType, StructType(Seq(
      StructField("team", StructType(Seq(
        StructField("wyId", LongType),
        StructField("name", StringType),
        StructField("officialName", StringType)))))))
    eventsPayload(gameId)
      .select(explode(from_json(to_json(col("teams")), teamType)).as(Seq("tid", "t")))
      .select(
        col("t.team.wyId").as("team_id"),
        col("t.team.name").as("team_name_short"),
        col("t.team.officialName").as("team_name"))
  }

  /** `_convert_players` (`loader.py:710-722`). */
  def players(gameId: Long): DataFrame = {
    val playersType = MapType(StringType, ArrayType(StructType(Seq(
      StructField("player", StructType(Seq(
        StructField("wyId", LongType),
        StructField("shortName", StringType),
        StructField("firstName", StringType),
        StructField("lastName", StringType),
        StructField("birthDate", StringType))))))))
    eventsPayload(gameId)
      .select(explode(from_json(to_json(col("players")), playersType)).as(Seq("tid", "ps")))
      .select(col("tid").cast("long").as("team_id"), explode(col("ps")).as("p"))
      .select(
        col("team_id"),
        col("p.player.wyId").as("player_id"),
        col("p.player.shortName").as("nickname"),
        concat_ws(" ", col("p.player.firstName"), col("p.player.lastName"))
          .as("player_name"),
        to_date(col("p.player.birthDate")).as("birth_date"))
      .withColumn("game_id", lit(gameId))
  }

  /** `_convert_events` (`loader.py:735-780`): the raw event array →
    * converter-ready rows. Periods follow the 1H/2H/E1/E2/P map
    * (`wyscout_periods`); `seq` is a per-game (period, eventSec, id)
    * row number — the canonical event order. */
  def events(gameId: Long): DataFrame = {
    val periodId = when(col("e.matchPeriod") === "1H", 1)
      .when(col("e.matchPeriod") === "2H", 2)
      .when(col("e.matchPeriod") === "E1", 3)
      .when(col("e.matchPeriod") === "E2", 4)
      .when(col("e.matchPeriod") === "P", 5)
    val w = Window.partitionBy("game_id")
      .orderBy("period_id", "milliseconds", "event_id")
    eventsPayload(gameId)
      .select(explode(col("events")).as("e"))
      .select(
        col("e.matchId").as("game_id"),
        col("e.id").as("event_id"),
        periodId.cast("int").as("period_id"),
        (col("e.eventSec") * 1000).cast("long").as("milliseconds"),
        col("e.teamId").as("team_id"),
        col("e.playerId").as("player_id"),
        col("e.eventId").cast("int").as("type_id"),
        coalesce(col("e.subEventId").cast("int"), lit(0)).as("subtype_id"),
        col("e.eventName").as("type_name"),
        col("e.subEventName").as("subtype_name"),
        coalesce(transform(col("e.tags"), t => t.getField("id").cast("int")),
          array().cast("array<int>")).as("tags"),
        coalesce(transform(col("e.positions"),
          p => struct(p.getField("x").cast("double").as("x"),
            p.getField("y").cast("double").as("y"))),
          array().cast("array<struct<x:double,y:double>>")).as("positions"))
      .withColumn("seq", row_number().over(w).cast("long"))
  }
}

object WyscoutLoader {
  def apply(spark: SparkSession, root: String): WyscoutLoader =
    new WyscoutLoader(spark, root)
}
