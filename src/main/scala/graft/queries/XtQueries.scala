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

  private val cellSql = XThreat.flatCellIndexSql("start_x", "start_y")
  private val endCellSql = XThreat.flatCellIndexSql("end_x", "end_y")
  private val moveSql = "type_id IN (0, 1, 21)"

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
         |), sc AS (
         |  SELECT start_cell, count(*) AS n_start FROM moves GROUP BY 1
         |)
         |SELECT m.start_cell, m.end_cell, count(*) / any_value(sc.n_start) AS p
         |FROM moves m JOIN sc ON m.start_cell = sc.start_cell
         |WHERE m.result_id = 1
         |GROUP BY m.start_cell, m.end_cell""".stripMargin) { (s, dir) =>
      XThreat.transitionEntries(actions(s, dir))
    },

    // The solved surface: driver-side value iteration — the CONVERGED
    // surface stays rows-only (iteration count is data-dependent), but the
    // fixed-5-step solve below is value-golden, which makes the solve math
    // itself oracle-checked.
    Q.rowsOnly("xt_fit_surface") { (s, dir) =>
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
      val n = XThreat.DefaultL * XThreat.DefaultW
      val iters = (1 to 5).map { k =>
        s"""it$k AS (
           |  SELECT g.cell, g.gs + g.pmove * coalesce(
           |      list_reduce(list(t.p * x.v ORDER BY t.end_cell), (a, b) -> a + b),
           |      0.0::DOUBLE) AS v
           |  FROM g
           |  LEFT JOIN trans t ON t.start_cell = g.cell
           |  LEFT JOIN it${k - 1} x ON x.cell = t.end_cell
           |  GROUP BY g.cell, g.gs, g.pmove
           |)""".stripMargin
      }.mkString(", ")
      s"""$OracleCte, spine AS (
         |  SELECT range AS cell FROM range(0, $n)
         |), cs AS (
         |  SELECT $cellSql AS cell,
         |    sum(CASE WHEN type_id = 11 THEN 1 ELSE 0 END) AS shots,
         |    sum(CASE WHEN type_id = 11 AND result_id = 1 THEN 1 ELSE 0 END) AS goals,
         |    sum(CASE WHEN $moveSql THEN 1 ELSE 0 END) AS moves
         |  FROM actions GROUP BY 1
         |), g AS (
         |  SELECT s.cell,
         |    (CASE WHEN cs.shots <> 0 THEN cs.goals / cs.shots ELSE 0.0 END)
         |      * (CASE WHEN cs.shots + cs.moves <> 0 THEN cs.shots / (cs.shots + cs.moves) ELSE 0.0 END) AS gs,
         |    coalesce(CASE WHEN cs.shots + cs.moves <> 0 THEN cs.moves / (cs.shots + cs.moves) ELSE 0.0 END, 0.0) AS pmove
         |  FROM spine s LEFT JOIN cs ON s.cell = cs.cell
         |), moves AS (
         |  SELECT $cellSql AS start_cell, $endCellSql AS end_cell, result_id
         |  FROM actions WHERE $moveSql
         |), sc AS (
         |  SELECT start_cell, count(*) AS n_start FROM moves GROUP BY 1
         |), trans AS (
         |  SELECT m.start_cell, m.end_cell, count(*) / any_value(sc.n_start) AS p
         |  FROM moves m JOIN sc ON m.start_cell = sc.start_cell
         |  WHERE m.result_id = 1
         |  GROUP BY m.start_cell, m.end_cell
         |), it0 AS (
         |  SELECT cell, 0.0::DOUBLE AS v FROM spine
         |), $iters
         |SELECT cell, v AS xt_value FROM it5""".stripMargin
    }) { (s, dir) =>
      import s.implicits._
      val model = XThreat.fitIterations(actions(s, dir), 5)
      model.xT.zipWithIndex.toSeq
        .map { case (v, c) => (c.toLong, v) }
        .toDF("cell", "xt_value")
    },

    // Rating with the genuinely fitted surface — rows-only.
    Q.rowsOnly("xt_rate") { (s, dir) =>
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
    })
}
