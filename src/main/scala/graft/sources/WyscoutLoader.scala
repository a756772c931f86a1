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

/** S9 — the PUBLIC Wyscout research dataset layout (Pappalardo et al.,
  * Sci Data 6:236, 2019): one `matches_{Country}.json` / per-league
  * `events_{Country}.json` pair per competition, plus global
  * `competitions.json` / `teams.json` / `players.json`. Reference
  * `socceraction/data/wyscout/loader.py:167-378` (incl. the hardcoded
  * dataset index `loader.py:330-366` — constants of the published
  * dataset).
  *
  * The per-league events file holds every game of the season; `events`
  * filters on matchId (at scale the league files are columnarized once and
  * partition-pruned by game bucket — see StorageLayoutSpec). The
  * substitution-minutes algebra is implemented on the StatsBomb/MA3 paths;
  * `players` here returns the lineup+bench identity rows with sides. */
final class PublicWyscoutLoader(spark: SparkSession, root: String) {

  /** (competition_id, season_id, season_name, matches file, events file) —
    * the published dataset's fixed index. */
  val index: Seq[(Long, Long, String, String, String)] = Seq(
    (524L, 181248L, "2017/2018", "matches_Italy.json", "events_Italy.json"),
    (364L, 181150L, "2017/2018", "matches_England.json", "events_England.json"),
    (795L, 181144L, "2017/2018", "matches_Spain.json", "events_Spain.json"),
    (412L, 181189L, "2017/2018", "matches_France.json", "events_France.json"),
    (426L, 181137L, "2017/2018", "matches_Germany.json", "events_Germany.json"),
    (102L, 9291L, "2016", "matches_European_Championship.json", "events_European_Championship.json"),
    (28L, 10078L, "2018", "matches_World_Cup.json", "events_World_Cup.json"))

  private def readJson(rel: String): DataFrame =
    spark.read.option("multiLine", true).json(s"$root/$rel")

  private def filesFor(competitionId: Long): (String, String) = {
    val e = index.find(_._1 == competitionId)
      .getOrElse(throw new IllegalArgumentException(
        s"competition $competitionId is not part of the public dataset"))
    (e._4, e._5)
  }

  /** competitions.json ⋈ the dataset index (`loader.py:167-203`). */
  def competitions(): DataFrame = {
    import spark.implicits._
    val idx = index.map(e => (e._1, e._2, e._3))
      .toDF("competition_id", "season_id", "season_name")
    readJson("competitions.json").select(
      col("wyId").as("competition_id"),
      col("name").as("competition_name"),
      when(col("area.name") === "", "International").otherwise(col("area.name"))
        .as("country_name"),
      lit("male").as("competition_gender"))
      .join(idx, Seq("competition_id"), "left")
  }

  private val teamsDataType = MapType(StringType, StructType(Seq(
    StructField("side", StringType),
    StructField("teamId", LongType),
    StructField("score", LongType),
    StructField("formation", StructType(Seq(
      StructField("lineup", ArrayType(StructType(Seq(
        StructField("playerId", LongType))))),
      StructField("bench", ArrayType(StructType(Seq(
        StructField("playerId", LongType)))))))))))

  private def matchesOf(competitionId: Long): DataFrame =
    readJson(filesFor(competitionId)._1)
      .withColumn("teamsData", from_json(to_json(col("teamsData")), teamsDataType))

  /** Games of a season (`loader.py:205-223` + `_convert_games`). */
  def games(competitionId: Long, seasonId: Long): DataFrame = {
    def sideTeam(side: String): Column =
      element_at(
        map_keys(map_filter(col("teamsData"), (_, v) => v.getField("side") === side)), 1)
        .cast("long")
    matchesOf(competitionId)
      .filter(col("seasonId") === seasonId)
      .select(
        col("wyId").as("game_id"),
        col("competitionId").as("competition_id"),
        col("seasonId").as("season_id"),
        to_timestamp(col("dateutc")).as("game_date"),
        col("gameweek").as("game_day"),
        sideTeam("home").as("home_team_id"),
        sideTeam("away").as("away_team_id"))
  }

  /** Both teams of a game via the global teams.json (`loader.py:231-249`). */
  def teams(competitionId: Long, gameId: Long): DataFrame = {
    val lineup = matchesOf(competitionId)
      .filter(col("wyId") === gameId)
      .select(explode(col("teamsData")).as(Seq("tid", "td")))
      .select(col("td.teamId").as("team_id"))
    readJson("teams.json").select(
      col("wyId").as("team_id"),
      col("name").as("team_name_short"),
      col("officialName").as("team_name"))
      .join(lineup, "team_id")
  }

  /** Lineup + bench identity rows of a game, joined with players.json
    * (`loader.py:251-302`, identity subset; lineup members are starters). */
  def players(competitionId: Long, gameId: Long): DataFrame = {
    val base = matchesOf(competitionId)
      .filter(col("wyId") === gameId)
      .select(explode(col("teamsData")).as(Seq("tid", "td")))
    def roster(field: String, starter: Boolean): DataFrame = base
      .select(col("td.teamId").as("team_id"), col("td.side").as("side"),
        explode(coalesce(col(s"td.formation.$field"),
          array().cast("array<struct<playerId:bigint>>"))).as("p"))
      .select(col("team_id"), col("side"), col("p.playerId").as("player_id"),
        lit(starter).as("is_starter"))
    val identities = readJson("players.json").select(
      col("wyId").as("player_id"),
      col("shortName").as("nickname"),
      concat_ws(" ", col("firstName"), col("lastName")).as("player_name"),
      to_date(col("birthDate")).as("birth_date"))
    roster("lineup", starter = true).unionByName(roster("bench", starter = false))
      .join(identities, Seq("player_id"), "left")
      .withColumn("game_id", lit(gameId))
  }

  /** Event rows of a game from the per-league file (`loader.py:321-345` +
    * `_convert_events`) — same output contract as WyscoutLoader.events. */
  def events(competitionId: Long, gameId: Long): DataFrame = {
    val periodId = when(col("e.matchPeriod") === "1H", 1)
      .when(col("e.matchPeriod") === "2H", 2)
      .when(col("e.matchPeriod") === "E1", 3)
      .when(col("e.matchPeriod") === "E2", 4)
      .when(col("e.matchPeriod") === "P", 5)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("game_id")
      .orderBy("period_id", "milliseconds", "event_id")
    readJson(filesFor(competitionId)._2)
      .filter(col("matchId") === gameId)
      .select(struct(col("*")).as("e"))
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

object PublicWyscoutLoader {
  def apply(spark: SparkSession, root: String): PublicWyscoutLoader =
    new PublicWyscoutLoader(spark, root)
}
