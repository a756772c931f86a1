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

    // The solved surface: driver-side value iteration — not SQL-expressible,
    // rows-only check (cell, xT value, plus fit diagnostics).
    Q.rowsOnly("xt_fit_surface") { (s, dir) =>
      import s.implicits._
      val model = XThreat.fit(actions(s, dir))
      model.xT.zipWithIndex.toSeq
        .map { case (v, c) => (c.toLong, v, model.iterations) }
        .toDF("cell", "xt_value", "iterations")
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
