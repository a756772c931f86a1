package graft

import org.apache.spark.sql.functions._

import graft.sources.{StatsBomb, StatsBombLoader}

/** StatsBomb open-data loader semantics (S4/S5/S6) against the hand-written
  * fixture in src/test/resources/statsbomb_root (open-data directory
  * layout). Minute expectations are hand-computed from the reference
  * algorithm (`data/statsbomb/loader.py:371-464`, `data/base.py:100-123`). */
class StatsBombLoaderSpec extends SparkSpec {

  private lazy val root = getClass.getResource("/statsbomb_root").toString
  private lazy val loader = StatsBombLoader(spark, root)

  test("competitions: schema and rows") {
    val c = loader.competitions().collect()
    assert(c.length == 2)
    val r = loader.competitions().filter(col("season_id") === 2).head()
    assert(r.getAs[String]("competition_name") == "Test League")
    assert(r.getAs[String]("country_name") == "Testland")
  }

  test("games: flattened nested objects, kick_off default, renames") {
    val g = loader.games(1, 2).orderBy("game_id").collect()
    assert(g.length == 2)
    val m100 = g(0)
    assert(m100.getAs[Long]("game_id") == 100L)
    assert(m100.getAs[Long]("home_team_id") == 10L)
    assert(m100.getAs[Long]("away_team_id") == 20L)
    assert(m100.getAs[String]("venue") == "Test Arena")
    assert(m100.getAs[String]("referee") == "R. Eferee")
    assert(m100.getAs[String]("competition_stage") == "Regular Season")
    assert(m100.getAs[java.sql.Timestamp]("game_date").toString.startsWith("2026-03-01 15:00:00"))
    // absent kick_off → 12:00:00.000; absent stadium/referee → null
    val m101 = g(1)
    assert(m101.getAs[java.sql.Timestamp]("game_date").toString.startsWith("2026-03-08 12:00:00"))
    assert(m101.getAs[String]("venue") == null)
  }

  test("teams and players: lineup flattening + minutes join") {
    assert(loader.teams(100).collect().map(_.getAs[String]("team_name")).toSet ==
      Set("Home FC", "Away United"))
    val p = loader.players(100).collect()
      .map(r => r.getAs[Long]("player_id") -> r).toMap
    assert(p.size == 7)
    // starters vs the substitute
    assert(p(1L).getAs[Boolean]("is_starter"))
    assert(!p(4L).getAs[Boolean]("is_starter"))
    assert(p(4L).getAs[String]("starting_position_name") == "Substitute")
    assert(p(4L).getAs[Long]("starting_position_id") == 0L)
    assert(p(1L).getAs[String]("starting_position_name") == "Center Forward")
    assert(p(2L).getAs[String]("nickname") == null)
    assert(p(1L).getAs[String]("nickname") == "Ali")
  }

  test("extract_player_games: XI / substitution / red-card minute algebra") {
    // periods: HalfEnd p1 @46' → dur1 = 46; p2 @93' → dur2 = 48; total 94
    // expand(m) = m + (m > 45 ? dur1 − 45 : 0) with 2 periods
    val pg = StatsBombLoader.extractPlayerGames(loader.events(100)).collect()
      .map(r => r.getAs[Long]("player_id") -> r.getAs[Long]("minutes_played")).toMap
    assert(pg(1L) == 94) // full game
    assert(pg(2L) == 61) // subbed off at 60' → expand(60) = 61
    assert(pg(3L) == 81) // second yellow at 80' → expand(80) = 81
    assert(pg(4L) == 33) // on at expand(60)=61 → 94 − 61
    assert(pg(5L) == 94 && pg(6L) == 94 && pg(7L) == 94)
  }

  test("events: _flatten_id fields, defaults, extra bag") {
    val e = loader.events(100)
    val pass = e.filter(col("event_id") === "e04").head()
    assert(pass.getAs[String]("type_name") == "Pass")
    assert(pass.getAs[Long]("type_id") == 30L)
    assert(pass.getAs[Long]("team_id") == 10L)
    assert(pass.getAs[String]("player_name") == "Alice Striker")
    assert(pass.getSeq[Double](pass.fieldIndex("location")) == Seq(61.0, 40.0))
    assert(!pass.getAs[Boolean]("under_pressure"))
    assert(pass.getAs[String]("extra").contains("\"end_location\""))
    val carry = e.filter(col("event_id") === "e05").head()
    assert(carry.getAs[Boolean]("under_pressure"))
  }

  test("events + 360 frames join (S5): left join on event_id") {
    val e = loader.events(100, load360 = true)
    assert(e.columns.contains("freeze_frame_360"))
    val withFrames = e.filter(col("freeze_frame_360").isNotNull)
      .select("event_id").collect().map(_.getString(0)).toSet
    assert(withFrames == Set("e04", "e06"))
    val ff = e.filter(col("event_id") === "e04")
      .select(explode(col("freeze_frame_360")).as("f")).select("f.teammate")
    assert(ff.count() == 3)
    // events without a frame survive the left join
    assert(e.count() == loader.events(100).count())
  }

  test("loader events feed the full converter end to end") {
    val raw = loader.events(100).select(
      col("game_id"), col("event_id"), col("period_id").cast("int").as("period_id"),
      col("timestamp"), col("team_id"), col("player_id"), col("type_name"),
      col("location"), col("extra"), col("index").as("seq"))
    val actions = StatsBomb.convertToActions(raw, lit(10L))
    val byType = actions.groupBy("type_id").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byType.contains(0)) // the pass
    assert(byType.contains(11)) // the shot
    assert(byType.contains(21)) // the carry
    assert(byType.contains(8)) // the foul
    // the goal-frame (3-element) shot end location used the 0.05 y-rule
    val shot = actions.filter(col("type_id") === 11).head()
    assert(math.abs(shot.getAs[Double]("end_y") - (68.0 - (39.3 - 0.05) / 80 * 68)) < 1e-12)
    assert(shot.getAs[Int]("result_id") == 1) // Goal
  }
}
