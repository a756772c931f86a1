package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Q
import graft.core.{Spadl, SynActions, Tables}
import graft.core.SynActions.OracleCte
import graft.vaep.{Features, GameStates, XgModel}

/** Expected-goals (xG) workflow — the reference's
  * `public-notebooks/EXTRA-build-expected-goals-model.ipynb`: select shot
  * gamestates (k=2, left-to-right oriented), build the notebook's feature
  * list (actiontype/bodypart one-hots, start locations, movement,
  * space_delta, startpolar, team — minus the a0 action-type indicators and
  * a0 movement, which leak the shot outcome), label with
  * `result_success_a0`, then (a) a value-golden fixed-coefficient logistic
  * rate, (b) per-player xG totals, (c) the class-prior naive baseline's
  * Brier / log-loss in closed form, and (d) a seeded GBT lane (rows-only,
  * metric-gated in XgSpec — the notebook never value-checks classifier
  * output either).
  *
  * Note on the a0 action-type exclusion: the notebook filters
  * `type_[a-z_]+_a0` against an older column-naming scheme; under the
  * current `actiontype_*_a0` names the regex matches nothing. We implement
  * the notebook's evident intent (drop the a0 type one-hots — every row is
  * a shot, so they only leak the penalty/freekick subtype the polar
  * features already encode).
  */
object XgQueries {

  private val K = 2
  private val ShotTypes = Seq(Spadl.TypeShot, Spadl.TypeShotPenalty, Spadl.TypeShotFreekick)
  private val TrainGames = SynActions.NumGames / 2 // games[:len//2] of 0..N-1

  private def actions(s: SparkSession, dir: String): DataFrame =
    SynActions.fromEvents(Tables.events(s, dir))

  /** Shot rows of the k=2 left-to-right gamestate frame (states computed
    * over ALL actions first, then shots selected — the notebook's
    * `Xi[shot_idx]`). */
  private def shotStates(s: SparkSession, dir: String): DataFrame = {
    val st = GameStates.withStates(actions(s, dir), K)
    GameStates.playLeftToRight(st, K, SynActions.homeTeamId)
      .filter(col("type_id").isin(ShotTypes: _*))
  }

  private def featureExprs: Seq[Column] =
    Features.actiontypeOnehot(1) ++
      (0 until K).flatMap(Features.bodypartOnehot) ++
      (0 until K).flatMap(Features.startlocation) ++
      Features.movement(1) ++ Features.spaceDelta(1) ++
      (0 until K).flatMap(Features.startpolar) ++ Features.team(1)

  /** The notebook's feature matrix + label for shots. */
  def shotsWithFeatures(s: SparkSession, dir: String): DataFrame = {
    val out = shotStates(s, dir).select(
      Seq(col("game_id"), col("action_id"), col("seq"), col("player_id")) ++
        featureExprs :+ (col("result_id") === Spadl.ResultSuccess).as("result_success_a0"): _*)
    out.columns.filter(_.contains("angle_to_goal"))
      .foldLeft(out)((d, c) => d.withColumn(c, round(col(c), 9)))
  }

  /** Numeric/boolean feature names for the model lanes (kept in lockstep
    * with [[featureExprs]]). */
  def featureNames: Array[String] =
    (Spadl.actiontypes.map(n => s"actiontype_${n}_a1") ++
      (0 until K).flatMap(i => Seq(s"bodypart_foot_a$i", s"bodypart_head_a$i",
        s"bodypart_other_a$i", s"bodypart_head/other_a$i")) ++
      (0 until K).flatMap(i => Seq(s"start_x_a$i", s"start_y_a$i")) ++
      Seq("dx_a1", "dy_a1", "movement_a1", "dx_a01", "dy_a01", "mov_a01") ++
      (0 until K).flatMap(i => Seq(s"start_dist_to_goal_a$i", s"start_angle_to_goal_a$i")) ++
      Seq("team_1")).toArray

  // ---- SQL mirrors ----------------------------------------------------------

  private def sf(f: String, i: Int): String = if (i == 0) f else s"${f}__a$i"

  /** k=2 lag-filled states + left-to-right flip (flip keyed on the a0
    * team for EVERY frame, `vaep/features.py:101-131`). */
  private val LtrCte: String = {
    val fields = Seq("team_id", "time_seconds", "start_x", "start_y",
      "end_x", "end_y", "type_id", "result_id", "bodypart_id")
    val lagCols = for (i <- 1 until K; f <- fields) yield
      s"coalesce(lag($f, $i) OVER w, first_value($f) OVER w) AS ${f}__a$i"
    val away = "team_id <> game_id % 4"
    val flips = for {
      i <- 0 until K
      (f, w) <- Seq("start_x" -> "105.0", "end_x" -> "105.0", "start_y" -> "68.0", "end_y" -> "68.0")
    } yield s"CASE WHEN $away THEN $w - ${sf(f, i)} ELSE ${sf(f, i)} END AS ${sf(f, i)}"
    s""", stt AS (
       |  SELECT *, ${lagCols.mkString(",\n    ")}
       |  FROM actions
       |  WINDOW w AS (PARTITION BY game_id, period_id ORDER BY time_seconds, seq)
       |), ltr AS (
       |  SELECT * REPLACE (${flips.mkString(",\n    ")})
       |  FROM stt
       |)""".stripMargin
  }

  private def polarSql(i: Int): Seq[String] = {
    val dx = s"abs(105.0 - ${sf("start_x", i)})"
    val dy = s"abs(34.0 - ${sf("start_y", i)})"
    Seq(
      s"sqrt($dx * $dx + $dy * $dy) AS start_dist_to_goal_a$i",
      s"round(CASE WHEN $dx = 0 AND $dy = 0 THEN 0.0 WHEN $dx = 0 THEN pi() / 2 ELSE atan($dy / $dx) END, 9) AS start_angle_to_goal_a$i")
  }

  private def featureSql: Seq[String] =
    Spadl.actiontypes.zipWithIndex.map { case (n, id) =>
      s"""${sf("type_id", 1)} = $id AS "actiontype_${n}_a1""""
    } ++ (0 until K).flatMap { i =>
      Seq(
        s"""${sf("bodypart_id", i)} IN (0, 4, 5) AS "bodypart_foot_a$i"""",
        s"""${sf("bodypart_id", i)} = 1 AS "bodypart_head_a$i"""",
        s"""${sf("bodypart_id", i)} = 2 AS "bodypart_other_a$i"""",
        s"""${sf("bodypart_id", i)} IN (1, 2, 3) AS "bodypart_head/other_a$i"""")
    } ++ (0 until K).flatMap { i =>
      Seq(s"${sf("start_x", i)} AS start_x_a$i", s"${sf("start_y", i)} AS start_y_a$i")
    } ++ {
      val dx = s"(${sf("end_x", 1)} - ${sf("start_x", 1)})"
      val dy = s"(${sf("end_y", 1)} - ${sf("start_y", 1)})"
      Seq(s"$dx AS dx_a1", s"$dy AS dy_a1", s"sqrt($dx * $dx + $dy * $dy) AS movement_a1")
    } ++ {
      val dx = s"(${sf("end_x", 1)} - start_x)"
      val dy = s"(${sf("end_y", 1)} - start_y)"
      Seq(s"$dx AS dx_a01", s"$dy AS dy_a01", s"sqrt($dx * $dx + $dy * $dy) AS mov_a01")
    } ++ (0 until K).flatMap(polarSql) ++
      Seq(s"${sf("team_id", 1)} = team_id AS team_1")

  private val ShotsWhere = s"type_id IN (${ShotTypes.mkString(", ")})"

  /** Fixed logistic coefficients — the frozen notebook-style model whose
    * PREDICT path is value-golden (the `vaep_rate_logistic` pattern). Kept
    * identical, term for term, between the Column and SQL forms. */
  private def logitSqlAndCols: (String, DataFrame => DataFrame) = {
    val distS = "sqrt(abs(105.0 - start_x) * abs(105.0 - start_x) + abs(34.0 - start_y) * abs(34.0 - start_y))"
    val angS = "round(CASE WHEN abs(105.0 - start_x) = 0 AND abs(34.0 - start_y) = 0 THEN 0.0 WHEN abs(105.0 - start_x) = 0 THEN pi() / 2 ELSE atan(abs(34.0 - start_y) / abs(105.0 - start_x)) END, 9)"
    val zS = s"-1.2 - 0.09 * $distS + 0.95 * $angS" +
      " + (CASE WHEN bodypart_id = 1 THEN -0.3 WHEN bodypart_id = 2 THEN -0.15 ELSE 0.0 END)" +
      " + (CASE WHEN type_id = 12 THEN 2.1 WHEN type_id = 13 THEN 0.15 ELSE 0.0 END)"
    val sql = s"round(1.0 / (1.0 + exp(-($zS))), 9)"

    val addCols = (df: DataFrame) => {
      val dxc = abs(lit(105.0) - col("start_x"))
      val dyc = abs(lit(34.0) - col("start_y"))
      val dist = sqrt(dxc * dxc + dyc * dyc)
      val ang = round(when(dxc === 0.0 && dyc === 0.0, lit(0.0))
        .when(dxc === 0.0, lit(math.Pi / 2))
        .otherwise(atan(dyc / dxc)), 9)
      val z = lit(-1.2) - lit(0.09) * dist + lit(0.95) * ang +
        (when(col("bodypart_id") === 1, -0.3).when(col("bodypart_id") === 2, -0.15).otherwise(0.0)) +
        (when(col("type_id") === 12, 2.1).when(col("type_id") === 13, 0.15).otherwise(0.0))
      df.withColumn("xg", round(lit(1.0) / (lit(1.0) + exp(-z)), 9))
    }
    (sql, addCols)
  }

  /** The committed frozen xG GBT (generated by [[graft.FreezeGbt]]). */
  private lazy val frozenXg =
    graft.vaep.FrozenGbt.loadResource("/graft/xg_gbt_frozen.txt", "xg")

  // ---- queries --------------------------------------------------------------

  // lazy: the frozen-xG oracle string needs the committed resource, which
  // graft.FreezeGbt (re)generates USING this object's feature builders —
  // strict init would deadlock that bootstrap on a fresh checkout
  lazy val all: Seq[Q] = Seq(

    Q("xg_shots_features",
      s"""$OracleCte $LtrCte
         |SELECT game_id, action_id, seq, player_id,
         |  ${featureSql.mkString(",\n  ")},
         |  result_id = 1 AS result_success_a0
         |FROM ltr WHERE $ShotsWhere""".stripMargin) { (s, dir) =>
      shotsWithFeatures(s, dir)
    },

    Q("xg_rate_logistic", {
      val (pSql, _) = logitSqlAndCols
      s"""$OracleCte $LtrCte
         |SELECT game_id, action_id, seq, player_id,
         |  $pSql AS xg,
         |  result_id = 1 AS goal
         |FROM ltr WHERE $ShotsWhere""".stripMargin
    }) { (s, dir) =>
      val (_, addCols) = logitSqlAndCols
      addCols(shotStates(s, dir))
        .select(col("game_id"), col("action_id"), col("seq"), col("player_id"),
          col("xg"), (col("result_id") === Spadl.ResultSuccess).as("goal"))
    },

    // Per-player xG vs realized goals — the standard over/under-performance
    // table analysts derive from any xG model. xg is pre-rounded to 9
    // decimals, so the DECIMAL(38,18) sum is exact; requantized to 6 before
    // the one double cast (the >2^53 ulp rule).
    Q("xg_player_totals", {
      val (pSql, _) = logitSqlAndCols
      s"""$OracleCte $LtrCte, shot_p AS (
         |  SELECT player_id, $pSql AS xg, result_id = 1 AS goal
         |  FROM ltr WHERE $ShotsWhere
         |)
         |SELECT player_id,
         |  CAST(count(*) AS BIGINT) AS n_shots,
         |  CAST(sum(CASE WHEN goal THEN 1 ELSE 0 END) AS BIGINT) AS goals,
         |  CAST(CAST(round(sum(CAST(xg AS DECIMAL(38,18))), 6) AS DECIMAL(38,6)) AS DOUBLE) AS xg_total
         |FROM shot_p GROUP BY player_id""".stripMargin
    }) { (s, dir) =>
      val (_, addCols) = logitSqlAndCols
      addCols(shotStates(s, dir))
        .groupBy("player_id")
        .agg(count(lit(1)).as("n_shots"),
          sum(when(col("result_id") === Spadl.ResultSuccess, 1L).otherwise(0L)).as("goals"),
          sum(col("xg").cast("decimal(38,18)")).cast("decimal(38,6)")
            .cast("double").as("xg_total"))
    },

    // The notebook's naive baseline (always predict the train-set class
    // prior) in closed form: with a constant predictor, Brier and log-loss
    // reduce to exact count arithmetic — only ln() needs the round-9 trig
    // rule, and AUROC of a constant score is 0.5 by convention (sklearn's
    // value for it).
    Q("xg_naive_baseline",
      s"""$OracleCte, shots AS (
         |  SELECT game_id, result_id = 1 AS y FROM actions WHERE $ShotsWhere
         |), c AS (
         |  SELECT
         |    CAST(sum(CASE WHEN game_id < $TrainGames THEN 1 ELSE 0 END) AS BIGINT) AS ntr,
         |    CAST(sum(CASE WHEN game_id < $TrainGames AND y THEN 1 ELSE 0 END) AS BIGINT) AS nptr,
         |    CAST(sum(CASE WHEN game_id >= $TrainGames THEN 1 ELSE 0 END) AS BIGINT) AS nte,
         |    CAST(sum(CASE WHEN game_id >= $TrainGames AND y THEN 1 ELSE 0 END) AS BIGINT) AS npte
         |  FROM shots
         |), m AS (
         |  SELECT *, CAST(nptr AS DOUBLE) / CAST(ntr AS DOUBLE) AS p FROM c
         |)
         |SELECT ntr AS n_train, nte AS n_test, p AS avg_p,
         |  (CAST(npte AS DOUBLE) * (1.0 - p) * (1.0 - p) + CAST(nte - npte AS DOUBLE) * (p * p)) / CAST(nte AS DOUBLE) AS brier,
         |  -((CAST(npte AS DOUBLE) * round(ln(p), 9) + CAST(nte - npte AS DOUBLE) * round(ln(1.0 - p), 9)) / CAST(nte AS DOUBLE)) AS log_loss,
         |  0.5 AS roc_auc
         |FROM m""".stripMargin) { (s, dir) =>
      val shots = actions(s, dir).filter(col("type_id").isin(ShotTypes: _*))
        .select(col("game_id"), (col("result_id") === Spadl.ResultSuccess).as("y"))
      val c = shots.agg(
        sum(when(col("game_id") < TrainGames, 1L).otherwise(0L)).as("ntr"),
        sum(when(col("game_id") < TrainGames && col("y"), 1L).otherwise(0L)).as("nptr"),
        sum(when(col("game_id") >= TrainGames, 1L).otherwise(0L)).as("nte"),
        sum(when(col("game_id") >= TrainGames && col("y"), 1L).otherwise(0L)).as("npte"))
      val p = col("nptr").cast("double") / col("ntr").cast("double")
      c.select(
        col("ntr").as("n_train"), col("nte").as("n_test"), p.as("avg_p"),
        ((col("npte").cast("double") * (lit(1.0) - p) * (lit(1.0) - p) +
          (col("nte") - col("npte")).cast("double") * (p * p)) / col("nte").cast("double")).as("brier"),
        (-((col("npte").cast("double") * round(log(p), 9) +
          (col("nte") - col("npte")).cast("double") * round(log(lit(1.0) - p), 9)) /
          col("nte").cast("double"))).as("log_loss"),
        lit(0.5).as("roc_auc"))
    },

    // The frozen xG GBT (same FrozenGbt machinery as
    // vaep_rate_gbt_frozen): one trained shot model frozen to literal
    // trees, the predict path value-golden over the exact shot features —
    // xG scoring modulo training, hash-exact.
    Q("xg_rate_gbt_frozen", {
      val m = frozenXg
      s"""$OracleCte $LtrCte, f AS (
         |  SELECT game_id, action_id, seq, result_id,
         |    start_x AS start_x_a0, start_y AS start_y_a0,
         |    ${polarSql(0).mkString(",\n    ")},
         |    ${sf("start_x", 1)} AS start_x_a1, ${sf("start_y", 1)} AS start_y_a1,
         |    (${sf("end_x", 1)} - ${sf("start_x", 1)}) AS dx_a1,
         |    (${sf("end_y", 1)} - ${sf("start_y", 1)}) AS dy_a1,
         |    sqrt((${sf("end_x", 1)} - ${sf("start_x", 1)}) * (${sf("end_x", 1)} - ${sf("start_x", 1)}) + (${sf("end_y", 1)} - ${sf("start_y", 1)}) * (${sf("end_y", 1)} - ${sf("start_y", 1)})) AS movement_a1,
         |    (${sf("end_x", 1)} - start_x) AS dx_a01,
         |    (${sf("end_y", 1)} - start_y) AS dy_a01,
         |    sqrt((${sf("end_x", 1)} - start_x) * (${sf("end_x", 1)} - start_x) + (${sf("end_y", 1)} - start_y) * (${sf("end_y", 1)} - start_y)) AS mov_a01,
         |    ${sf("team_id", 1)} = team_id AS team_1
         |  FROM ltr WHERE $ShotsWhere
         |)
         |SELECT game_id, action_id, seq,
         |  round(${graft.vaep.FrozenGbt.sql(m)}, 9) AS xg,
         |  result_id = 1 AS goal
         |FROM f""".stripMargin
    }) { (s, dir) =>
      shotsWithFeatures(s, dir)
        .withColumn("xg", round(graft.vaep.FrozenGbt.column(frozenXg), 9))
        .select(col("game_id"), col("action_id"), col("seq"), col("xg"),
          col("result_success_a0").as("goal"))
    },

    // The learned lane: seeded GBT fit on the first half of games, scored
    // on the held-out second half (the notebook's XGBClassifier cell).
    // Rows-only like all learned models; XgSpec gates Brier vs the naive
    // baseline and seeded determinism.
    Q.rowsOnly("xg_rate_gbt") { (s, dir) =>
      val data = shotsWithFeatures(s, dir).cache()
      val fc = featureNames
      val model = XgModel.fit(data.filter(col("game_id") < TrainGames), fc,
        "result_success_a0", maxIter = 10, maxDepth = 3, seed = 42L)
      val rated = XgModel.predict(model, data.filter(col("game_id") >= TrainGames), fc)
        .select("game_id", "action_id", "seq", "xg")
      data.unpersist()
      rated
    })
}
