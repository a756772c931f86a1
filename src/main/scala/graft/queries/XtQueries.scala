package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Q
import graft.core.{SynActions, Tables}
import graft.core.SynActions.OracleCte
import graft.xt.XThreat

/** xT operator family (SURVEY.md §2.6, §2.10). The fit aggregates all have
  * exact SQL oracles (integer counts and single exact divisions); the solved
  * value surface (driver value iteration) is rows-only, but `xt_rate_grid`
  * oracle-checks the rating projection against a closed-form grid. */
object XtQueries {

  private def actions(s: SparkSession, dir: String): DataFrame =
    SynActions.fromEvents(Tables.events(s, dir))

  /** Freeze-chain length for the converged-surface oracle: must exceed the
    * data-dependent iteration count (7 at sf0.01; contraction rate is the
    * overall move-success mass, so the count moves only logarithmically in
    * eps and barely with SF). */
  val MaxSolveSteps = 32

  private[queries] val cellSql = XThreat.flatCellIndexSql("start_x", "start_y")
  private[queries] val endCellSql = XThreat.flatCellIndexSql("end_x", "end_y")
  private[queries] val moveSql = "type_id IN (0, 1, 21)"

  /** Shared fit-statistics CTE prefix: cell spine, goal·shot product gs,
    * move probability, sparse transition matrix, zero surface it0. */
  private[queries] def fitStatsCtes: String = {
    val n = XThreat.DefaultL * XThreat.DefaultW
    s"""$OracleCte, spine AS MATERIALIZED (
       |  SELECT range AS cell FROM range(0, $n)
       |), cs AS MATERIALIZED (
       |  SELECT $cellSql AS cell,
       |    sum(CASE WHEN type_id = 11 THEN 1 ELSE 0 END) AS shots,
       |    sum(CASE WHEN type_id = 11 AND result_id = 1 THEN 1 ELSE 0 END) AS goals,
       |    sum(CASE WHEN $moveSql THEN 1 ELSE 0 END) AS moves
       |  FROM actions GROUP BY 1
       |), g AS MATERIALIZED (
       |  SELECT s.cell,
       |    (CASE WHEN cs.shots <> 0 THEN cs.goals / cs.shots ELSE 0.0 END)
       |      * (CASE WHEN cs.shots + cs.moves <> 0 THEN cs.shots / (cs.shots + cs.moves) ELSE 0.0 END) AS gs,
       |    coalesce(CASE WHEN cs.shots + cs.moves <> 0 THEN cs.moves / (cs.shots + cs.moves) ELSE 0.0 END, 0.0) AS pmove
       |  FROM spine s LEFT JOIN cs ON s.cell = cs.cell
       |), moves AS MATERIALIZED (
       |  SELECT $cellSql AS start_cell, $endCellSql AS end_cell, result_id
       |  FROM actions WHERE $moveSql
       |), sc AS MATERIALIZED (
       |  SELECT start_cell, count(*) AS n_start FROM moves GROUP BY 1
       |), trans AS MATERIALIZED (
       |  SELECT m.start_cell, m.end_cell, count(*) / any_value(sc.n_start) AS p
       |  FROM moves m JOIN sc ON m.start_cell = sc.start_cell
       |  WHERE m.result_id = 1
       |  GROUP BY m.start_cell, m.end_cell
       |), it0 AS MATERIALIZED (
       |  SELECT cell, 0.0::DOUBLE AS v FROM spine
       |)""".stripMargin
  }

  /** Freeze-chain CTEs solving to the eps=1e-5 fixpoint: step k applies the
    * raw update only while unfrozen (d$k carries the cumulative stop flag,
    * computed with the driver's signed max-improvement test); after the
    * converging step every it$k copies values verbatim, so
    * it$MaxSolveSteps IS the converged surface. */
  private[queries] def convergedChainCtes: String = {
    val chain = (1 to MaxSolveSteps).map { k =>
      s"""${updateCte(s"u$k", s"it${k - 1}")}, d$k AS MATERIALIZED (
         |  SELECT ((SELECT f FROM d${k - 1}) OR
         |    (SELECT max(u.v - x.v) FROM u$k u JOIN it${k - 1} x ON u.cell = x.cell) <= 1e-5) AS f
         |), it$k AS MATERIALIZED (
         |  SELECT u.cell, CASE WHEN (SELECT f FROM d${k - 1}) THEN x.v ELSE u.v END AS v
         |  FROM u$k u JOIN it${k - 1} x ON u.cell = x.cell
         |)""".stripMargin
    }.mkString(", ")
    s"d0 AS MATERIALIZED (SELECT false AS f), $chain"
  }

  /** Driver-equivalent iteration count: unfrozen steps + the converging one. */
  private def iterCountSql: String =
    (1 to MaxSolveSteps)
      .map(k => s"(CASE WHEN (SELECT f FROM d$k) THEN 0 ELSE 1 END)").mkString(" + ") + " + 1"

  /** One raw value-iteration step (left-fold ordered sums — bit-exact vs the
    * driver's ascending-j loop, zero terms being exact no-ops). */
  private def updateCte(name: String, prev: String): String =
    s"""$name AS MATERIALIZED (
       |  SELECT g.cell, g.gs + g.pmove * coalesce(
       |      list_reduce(list(t.p * x.v ORDER BY t.end_cell), (a, b) -> a + b),
       |      0.0::DOUBLE) AS v
       |  FROM g
       |  LEFT JOIN trans t ON t.start_cell = g.cell
       |  LEFT JOIN $prev x ON x.cell = t.end_cell
       |  GROUP BY g.cell, g.gs, g.pmove
       |)""".stripMargin

  val all: Seq[Q] = Seq(

    // DuckDB sum(INT) widens to HUGEINT; cast the final aggregate back to
    // BIGINT to match Spark's sum-of-long output type.
    Q("xt_cell_stats",
      s"""$OracleCte
         |SELECT $cellSql AS cell,
         |  CAST(sum(CASE WHEN type_id = 11 THEN 1 ELSE 0 END) AS BIGINT) AS shots,
         |  CAST(sum(CASE WHEN type_id = 11 AND result_id = 1 THEN 1 ELSE 0 END) AS BIGINT) AS goals,
         |  CAST(sum(CASE WHEN $moveSql THEN 1 ELSE 0 END) AS BIGINT) AS moves
         |FROM actions
         |GROUP BY 1""".stripMargin) { (s, dir) =>
      XThreat.cellStats(actions(s, dir))
    },

    Q("xt_scoring_action_prob",
      s"""$OracleCte, g AS (
         |  SELECT $cellSql AS cell,
         |    sum(CASE WHEN type_id = 11 THEN 1 ELSE 0 END) AS shots,
         |    sum(CASE WHEN type_id = 11 AND result_id = 1 THEN 1 ELSE 0 END) AS goals,
         |    sum(CASE WHEN $moveSql THEN 1 ELSE 0 END) AS moves
         |  FROM actions GROUP BY 1
         |)
         |SELECT cell,
         |  CASE WHEN shots <> 0 THEN goals / shots ELSE 0.0 END AS scoring_prob,
         |  CASE WHEN shots + moves <> 0 THEN shots / (shots + moves) ELSE 0.0 END AS shot_prob,
         |  CASE WHEN shots + moves <> 0 THEN moves / (shots + moves) ELSE 0.0 END AS move_prob
         |FROM g""".stripMargin) { (s, dir) =>
      // _safe_divide semantics (reference `xthreat.py:70-71`): 0 when the
      // denominator is 0. Long/long division in Spark yields double, like
      // DuckDB's int division — exact for these magnitudes.
      XThreat.cellStats(actions(s, dir)).select(
        col("cell"),
        when(col("shots") =!= 0, col("goals") / col("shots")).otherwise(0.0).as("scoring_prob"),
        when(col("shots") + col("moves") =!= 0, col("shots") / (col("shots") + col("moves")))
          .otherwise(0.0).as("shot_prob"),
        when(col("shots") + col("moves") =!= 0, col("moves") / (col("shots") + col("moves")))
          .otherwise(0.0).as("move_prob"))
    },

    Q("xt_transition_matrix",
      s"""$OracleCte, moves AS (
         |  SELECT $cellSql AS start_cell, $endCellSql AS end_cell, result_id
         |  FROM actions WHERE $moveSql
         |), sc AS MATERIALIZED (
         |  SELECT start_cell, count(*) AS n_start FROM moves GROUP BY 1
         |)
         |SELECT m.start_cell, m.end_cell, count(*) / any_value(sc.n_start) AS p
         |FROM moves m JOIN sc ON m.start_cell = sc.start_cell
         |WHERE m.result_id = 1
         |GROUP BY m.start_cell, m.end_cell""".stripMargin) { (s, dir) =>
      XThreat.transitionEntries(actions(s, dir))
    },

    // The solved surface, value-golden to the eps=1e-5 fixpoint: the oracle
    // runs a freeze-chain of MaxSolveSteps value-iteration steps — once the
    // max per-cell improvement drops ≤ eps (the driver's stop test, computed
    // the same signed way), every later step copies values verbatim, so
    // step K equals the driver's converged surface bit-for-bit and the
    // iteration count = (#unfrozen steps) + 1. Data-dependent iteration
    // counts up to MaxSolveSteps are covered; XThreatSpec pins the margin.
    Q("xt_fit_surface", {
      s"""$fitStatsCtes, $convergedChainCtes
         |SELECT cell, v AS xt_value, CAST($iterCountSql AS INT) AS iterations
         |FROM it$MaxSolveSteps""".stripMargin
    }) { (s, dir) =>
      import s.implicits._
      val model = XThreat.fit(actions(s, dir))
      model.xT.zipWithIndex.toSeq
        .map { case (v, c) => (c.toLong, v, model.iterations) }
        .toDF("cell", "xt_value", "iterations")
    },

    // Value iteration, exactly 5 steps from the zero surface — chained-CTE
    // oracle with left-fold ordered sums (bit-exact: the driver loop adds
    // T(i,j)·x(j) in ascending j with zero terms as exact no-ops, which is
    // the same fold as list_reduce over the sparse entries in end_cell
    // order seeded by the first term).
    Q("xt_value_iteration", {
      val iters = (1 to 5).map(k => updateCte(s"it$k", s"it${k - 1}")).mkString(", ")
      s"""$fitStatsCtes, $iters
         |SELECT cell, v AS xt_value FROM it5""".stripMargin
    }) { (s, dir) =>
      import s.implicits._
      val model = XThreat.fitIterations(actions(s, dir), 5)
      model.xT.zipWithIndex.toSeq
        .map { case (v, c) => (c.toLong, v) }
        .toDF("cell", "xt_value")
    },

    // Rating with the genuinely fitted surface — value-golden since the
    // converged surface itself is (freeze chain + list lookup).
    Q("xt_rate",
      s"""$fitStatsCtes, $convergedChainCtes, gl AS MATERIALIZED (
         |  SELECT list(v ORDER BY cell) AS grid FROM it$MaxSolveSteps
         |)
         |SELECT game_id, action_id, seq,
         |  CASE WHEN $moveSql AND result_id = 1
         |       THEN list_extract(grid, $endCellSql + 1) - list_extract(grid, $cellSql + 1)
         |  END AS xt_value
         |FROM actions, gl""".stripMargin) { (s, dir) =>
      val a = actions(s, dir)
      val model = XThreat.fit(a)
      a.withColumn("xt_value", XThreat.rateColumn(model))
        .select("game_id", "action_id", "seq", "xt_value")
    },

    // Rating projection logic oracle-checked against a closed-form grid:
    // grid(c) = (c*37 % 100)/1000 — same lookup/difference semantics.
    Q("xt_rate_grid",
      s"""$OracleCte
         |SELECT game_id, action_id, seq,
         |  CASE WHEN $moveSql AND result_id = 1
         |       THEN ($endCellSql * 37 % 100) / 1000.0 - ($cellSql * 37 % 100) / 1000.0
         |  END AS xt_value
         |FROM actions""".stripMargin) { (s, dir) =>
      val grid = Array.tabulate(XThreat.DefaultL * XThreat.DefaultW)(c => (c * 37 % 100) / 1000.0)
      val model = XThreat.Model(XThreat.DefaultL, XThreat.DefaultW,
        grid, grid, grid, Array(), grid, 0)
      actions(s, dir)
        .withColumn("xt_value", XThreat.rateColumn(model))
        .select("game_id", "action_id", "seq", "xt_value")
    },

    // Interpolated rating with the genuinely CONVERGED surface — the oracle
    // re-solves the surface via the freeze chain, lists it in cell order,
    // and evaluates the same closed-form bilinear (term order mirrored
    // exactly, so doubles are bit-identical). The clean and
    // reference-compat variants share ONE oracle builder (interpOracle)
    // parameterized by the coordinate-source CTE, so the bilinear tail
    // cannot drift between them.
    Q("xt_rate_interp",
      interpOracle(
        """snap AS (
          |  SELECT game_id, action_id, seq, type_id, result_id,
          |    start_x AS sxs, start_y AS sys, end_x AS exs, end_y AS eys
          |  FROM actions
          |)""".stripMargin)) { (s, dir) =>
      val a = actions(s, dir)
      val model = XThreat.fit(a)
      a.withColumn("xt_value", XThreat.rateInterpColumn(model))
        .select("game_id", "action_id", "seq", "xt_value")
    },

    // The reference-compat interpolation flag (XThreat.scala compat
    // section): upstream's interp2d double-flip cancels exactly, leaving
    // its 1050×680 lattice QUANTIZATION of the query point as the only
    // observable deviation — reproduced here by snapping coordinates
    // before the same closed-form bilinear, oracle-mirrored.
    Q("xt_rate_interp_ref", {
      def snapX(c: String) =
        s"least(greatest(CAST(floor($c / 105.0 * 1050) AS INT), 0), 1049) * (105.0::DOUBLE / 1049)"
      def snapY(c: String) =
        s"68.0::DOUBLE - (679 - least(greatest(CAST(floor($c / 68.0 * 680) AS INT), 0), 679)) * (68.0::DOUBLE / 679)"
      interpOracle(
        s"""snap AS (
           |  SELECT game_id, action_id, seq, type_id, result_id,
           |    ${snapX("start_x")} AS sxs, ${snapY("start_y")} AS sys,
           |    ${snapX("end_x")} AS exs, ${snapY("end_y")} AS eys
           |  FROM actions
           |)""".stripMargin)
    }) { (s, dir) =>
      val a = actions(s, dir)
      val model = XThreat.fit(a)
      a.withColumn("xt_value", XThreat.rateInterpRefCompatColumn(model))
        .select("game_id", "action_id", "seq", "xt_value")
    })

  /** Converged-surface interpolated-rating oracle over a coordinate-source
    * CTE named `snap` exposing (game_id, action_id, seq, type_id,
    * result_id, sxs, sys, exs, eys): the shared clamp/index/bilinear
    * chain, term order mirroring XThreat.interpolateColumn exactly. */
  private def interpOracle(snapCte: String): String = {
    val l = XThreat.DefaultL
    val w = XThreat.DefaultW
    val cw = graft.core.Spadl.FieldLength / l
    val ch = graft.core.Spadl.FieldWidth / w
    def interpSql(p: String): String = {
      val fx = s"($p" + s"gx - $p" + "x0)"
      val fy = s"($p" + s"gy - $p" + "y0)"
      def at(rowExpr: String, colExpr: String) =
        s"list_extract(grid, (${w - 1} - ($rowExpr)) * $l + ($colExpr) + 1)"
      s"""${at(s"${p}y0", s"${p}x0")} * (1 - $fx) * (1 - $fy)
         | + ${at(s"${p}y0", s"${p}x0 + 1")} * $fx * (1 - $fy)
         | + ${at(s"${p}y0 + 1", s"${p}x0")} * (1 - $fx) * $fy
         | + ${at(s"${p}y0 + 1", s"${p}x0 + 1")} * $fx * $fy""".stripMargin.replace("\n", "")
    }
    s"""$fitStatsCtes, $convergedChainCtes, gl AS MATERIALIZED (
       |  SELECT list(v ORDER BY cell) AS grid FROM it$MaxSolveSteps
       |), $snapCte, pts AS (
       |  SELECT game_id, action_id, seq, type_id, result_id,
       |    least(greatest(sxs / $cw - 0.5, 0.0), ${l - 1}.0) AS sgx,
       |    least(greatest(sys / $ch - 0.5, 0.0), ${w - 1}.0) AS sgy,
       |    least(greatest(exs / $cw - 0.5, 0.0), ${l - 1}.0) AS egx,
       |    least(greatest(eys / $ch - 0.5, 0.0), ${w - 1}.0) AS egy
       |  FROM snap
       |), idx AS (
       |  SELECT *,
       |    least(CAST(floor(sgx) AS INT), ${l - 2}) AS sx0,
       |    least(CAST(floor(sgy) AS INT), ${w - 2}) AS sy0,
       |    least(CAST(floor(egx) AS INT), ${l - 2}) AS ex0,
       |    least(CAST(floor(egy) AS INT), ${w - 2}) AS ey0
       |  FROM pts
       |)
       |SELECT game_id, action_id, seq,
       |  CASE WHEN $moveSql AND result_id = 1
       |       THEN (${interpSql("e")}) - (${interpSql("s")})
       |  END AS xt_value
       |FROM idx, gl""".stripMargin
  }
}
