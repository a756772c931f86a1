package graft.xt

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Spadl

/** The Expected Threat (xT) model — a grid Markov model solved by value
  * iteration (reference `socceraction/xthreat.py`).
  *
  * Spark-first design: the reference loops 192× over pandas `value_counts`
  * (`xthreat.py:212-216`); here ALL fit statistics come from two hash
  * aggregations (one `groupBy(start_cell)`, one
  * `groupBy(start_cell, end_cell)`) — a single shuffle each with map-side
  * partial aggregation, tree-collected to ≤ 192 + 192² tiny rows. The value
  * iteration itself is driver-side Array math (≈37k flops/iter) and the
  * resulting 192-double surface is shipped back as a literal, so `rate` is a
  * map-only codegen'd projection — no shuffle, broadcast, or UDF at all.
  * This shape is exactly what survives 100 TB: the only global exchange is
  * the partial-agg tree reduction.
  */
object XThreat {

  val DefaultL = 16 // cells along x (N in the reference, `xthreat.py:22`)
  val DefaultW = 12 // cells along y (M, `xthreat.py:21`)

  final case class Model(
      l: Int,
      w: Int,
      pScoring: Array[Double],
      pShot: Array[Double],
      pMove: Array[Double],
      transition: Array[Array[Double]], // [start][end]
      xT: Array[Double],
      iterations: Int)

  /** Flat cell index with top-left origin: (w−1−yj)·l + xi, where
    * xi = trunc(x/105·l) clipped to [0, l−1] (reference `xthreat.py:25-38`). */
  def flatCellIndex(x: Column, y: Column, l: Int = DefaultL, w: Int = DefaultW): Column = {
    val xi = least(greatest(floor(x / Spadl.FieldLength * l), lit(0L)), lit(l - 1L))
    val yj = least(greatest(floor(y / Spadl.FieldWidth * w), lit(0L)), lit(w - 1L))
    (lit(w - 1L) - yj) * l + xi
  }

  /** SQL rendering of the same index (for oracle parity). */
  def flatCellIndexSql(x: String, y: String, l: Int = DefaultL, w: Int = DefaultW): String = {
    val xi = s"least(greatest(CAST(floor($x / 105.0 * $l) AS BIGINT), 0), ${l - 1})"
    val yj = s"least(greatest(CAST(floor($y / 68.0 * $w) AS BIGINT), 0), ${w - 1})"
    s"((${w - 1} - $yj) * $l + $xi)"
  }

  /** Ball-progressing actions: pass, cross, dribble (reference
    * `xthreat.py:110-139`; take-ons excluded). */
  def isMoveAction: Column =
    col("type_id").isin(Spadl.TypePass, Spadl.TypeCross, Spadl.TypeDribble)

  /** Per-start-cell statistics: shots, goals, moves — one aggregation pass
    * (reference `scoring_prob` + `action_prob`, `xthreat.py:74-174`). */
  def cellStats(actions: DataFrame, l: Int = DefaultL, w: Int = DefaultW): DataFrame = {
    val isShot = col("type_id") === Spadl.TypeShot
    val isMove = isMoveAction
    actions
      .filter(!isnan(col("start_x")) && !isnan(col("start_y")))
      .withColumn("cell", flatCellIndex(col("start_x"), col("start_y"), l, w))
      .groupBy("cell")
      .agg(
        sum(when(isShot, 1L).otherwise(0L)).as("shots"),
        sum(when(isShot && col("result_id") === Spadl.ResultSuccess, 1L).otherwise(0L)).as("goals"),
        sum(when(isMove, 1L).otherwise(0L)).as("moves"))
  }

  /** Sparse (start, end, p) move transition entries: successful end-cell
    * counts ÷ ALL moves starting in the cell (reference `xthreat.py:177-218`). */
  def transitionEntries(actions: DataFrame, l: Int = DefaultL, w: Int = DefaultW): DataFrame = {
    val moves = actions.filter(isMoveAction)
      .withColumn("start_cell", flatCellIndex(col("start_x"), col("start_y"), l, w))
      .withColumn("end_cell", flatCellIndex(col("end_x"), col("end_y"), l, w))
    val startCounts = moves.groupBy("start_cell").agg(count(lit(1)).as("n_start"))
    moves.filter(col("result_id") === Spadl.ResultSuccess)
      .groupBy("start_cell", "end_cell")
      .agg(count(lit(1)).as("n_succ"))
      .join(startCounts, "start_cell")
      .select(col("start_cell"), col("end_cell"),
        (col("n_succ") / col("n_start")).as("p"))
  }

  /** Fixed-iteration solve — the value-golden variant: exactly `iterations`
    * value-iteration steps from the zero surface, SQL-mirrorable with
    * chained CTEs (the convergence loop's iteration count is data-dependent,
    * so the converged surface stays a rows-only check). */
  def fitIterations(actions: DataFrame, iterations: Int,
                    l: Int = DefaultL, w: Int = DefaultW): Model =
    fit(actions, l, w, eps = Double.NegativeInfinity, maxIterations = iterations)

  /** Fit: aggregate on the cluster, solve on the driver
    * (reference `xthreat.py:322-345` + `__solve` :278-320). */
  def fit(actions: DataFrame, l: Int = DefaultL, w: Int = DefaultW,
          eps: Double = 1e-5, maxIterations: Int = Int.MaxValue): Model = {
    val n = l * w
    val stats = cellStats(actions, l, w).collect()
    val shots = new Array[Double](n)
    val goals = new Array[Double](n)
    val moves = new Array[Double](n)
    stats.foreach { r =>
      val c = r.getLong(0).toInt
      shots(c) = r.getLong(1).toDouble
      goals(c) = r.getLong(2).toDouble
      moves(c) = r.getLong(3).toDouble
    }
    def safeDiv(a: Double, b: Double) = if (b != 0.0) a / b else 0.0
    val pScoring = Array.tabulate(n)(i => safeDiv(goals(i), shots(i)))
    val pShot = Array.tabulate(n)(i => safeDiv(shots(i), shots(i) + moves(i)))
    val pMove = Array.tabulate(n)(i => safeDiv(moves(i), shots(i) + moves(i)))

    val trans = Array.fill(n)(new Array[Double](n))
    transitionEntries(actions, l, w).collect().foreach { r =>
      trans(r.getLong(0).toInt)(r.getLong(1).toInt) = r.getDouble(2)
    }

    // value iteration: xT ← pScoring·pShot + pMove·(T xT), until the signed
    // per-cell improvement is ≤ eps everywhere (the surface is monotone
    // nondecreasing, so signed and absolute convergence coincide).
    val gs = Array.tabulate(n)(i => pScoring(i) * pShot(i))
    var xt = new Array[Double](n)
    var iterations = 0
    var converged = false
    while (!converged && iterations < maxIterations) {
      val next = new Array[Double](n)
      var i = 0
      while (i < n) {
        var payoff = 0.0
        val row = trans(i)
        var j = 0
        while (j < n) { payoff += row(j) * xt(j); j += 1 }
        next(i) = gs(i) + pMove(i) * payoff
        i += 1
      }
      converged = (0 until n).forall(i => next(i) - xt(i) <= eps)
      xt = next
      iterations += 1
    }
    Model(l, w, pScoring, pShot, pMove, trans, xt, iterations)
  }

  /** M7 — rate: successful move actions get xT(end) − xT(start); everything
    * else null (reference `xthreat.py:380-437`, NaN there). The fitted
    * surface rides along as a 192-double literal inside codegen. */
  def rateColumn(model: Model): Column = {
    val grid = typedLit(model.xT.toSeq)
    val startIdx = flatCellIndex(col("start_x"), col("start_y"), model.l, model.w)
    val endIdx = flatCellIndex(col("end_x"), col("end_y"), model.l, model.w)
    when(isMoveAction && col("result_id") === Spadl.ResultSuccess,
      element_at(grid, (endIdx + 1).cast("int")) -
        element_at(grid, (startIdx + 1).cast("int")))
      .otherwise(lit(null).cast("double"))
  }

  /** M9 — persist / restore the value surface as a JSON 2-D array in
    * row-major [w][l] layout (reference `xthreat.py:439-501`). */
  def toJson(model: Model): String =
    (0 until model.w).map { r =>
      (0 until model.l).map(c => model.xT(r * model.l + c)).mkString("[", ",", "]")
    }.mkString("[", ",", "]")

  def gridFromJson(json: String): (Int, Int, Array[Double]) = {
    val rows = json.trim.stripPrefix("[").stripSuffix("]")
      .split("\\],\\s*\\[").map(_.stripPrefix("[").stripSuffix("]"))
    val parsed = rows.map(_.split(",").map(_.trim.toDouble))
    val w = parsed.length
    val l = if (w > 0) parsed(0).length else 0
    (l, w, parsed.flatten)
  }

  /** M8 — closed-form bilinear interpolation over cell centers (replaces the
    * reference's scipy `interp2d`, `xthreat.py:347-378`): value at (x, y)
    * interpolates the 4 surrounding cell-center values, clamped at borders.
    *
    * DELIBERATE DEVIATION: the reference pairs xT row 0 (the HIGH-y band,
    * since the flat index is (w−1−yj)·l+xi) with the LOWEST-y cell center
    * when building its interp2d input, producing a vertically mirrored
    * surface that `rate(use_interpolation=True)` then indexes with another
    * flip. This implementation maps rows to physical y directly, so
    * interpolated values differ from socceraction's at any y-asymmetric
    * point — parity tests against upstream's interpolated ratings are not
    * expected to match (the non-interpolated path IS value-identical). */
  /** Column form of [[interpolate]] — the same closed-form bilinear math as
    * Column expressions over the surface literal, so `rate` with
    * interpolation is a map-only codegen'd projection exactly like the
    * cell-lookup path (reference `rate(use_interpolation=True)`,
    * `xthreat.py:380-437`). Value-identical to the driver scalar
    * (XThreatSpec asserts bit equality), and carries the same documented
    * orientation deviation. */
  def interpolateColumn(grid: Column, x: Column, y: Column,
                        l: Int = DefaultL, w: Int = DefaultW): Column = {
    val cw = Spadl.FieldLength / l
    val ch = Spadl.FieldWidth / w
    val gx = least(greatest(x / cw - 0.5, lit(0.0)), lit(l - 1.0))
    val gy = least(greatest(y / ch - 0.5, lit(0.0)), lit(w - 1.0))
    val x0 = least(floor(gx).cast("int"), lit(l - 2))
    val y0 = least(floor(gy).cast("int"), lit(w - 2))
    val fx = gx - x0
    val fy = gy - y0
    def v(yj: Column, xi: Column): Column =
      element_at(grid, ((lit(w - 1) - yj) * l + xi + 1).cast("int"))
    v(y0, x0) * (lit(1.0) - fx) * (lit(1.0) - fy) +
      v(y0, x0 + 1) * fx * (lit(1.0) - fy) +
      v(y0 + 1, x0) * (lit(1.0) - fx) * fy +
      v(y0 + 1, x0 + 1) * fx * fy
  }

  /** M7 with interpolation: successful move actions get
    * interp(end) − interp(start); everything else null. */
  def rateInterpColumn(model: Model): Column = {
    val grid = typedLit(model.xT.toSeq)
    when(isMoveAction && col("result_id") === Spadl.ResultSuccess,
      interpolateColumn(grid, col("end_x"), col("end_y"), model.l, model.w) -
        interpolateColumn(grid, col("start_x"), col("start_y"), model.l, model.w))
      .otherwise(lit(null).cast("double"))
  }

  def interpolate(model: Model, x: Double, y: Double): Double = {
    val cw = Spadl.FieldLength / model.l
    val ch = Spadl.FieldWidth / model.w
    val gx = math.min(math.max(x / cw - 0.5, 0.0), model.l - 1.0)
    val gy = math.min(math.max(y / ch - 0.5, 0.0), model.w - 1.0)
    val x0 = math.min(gx.toInt, model.l - 2)
    val y0 = math.min(gy.toInt, model.w - 2)
    val fx = gx - x0
    val fy = gy - y0
    def v(yj: Int, xi: Int) = model.xT((model.w - 1 - yj) * model.l + xi)
    v(y0, x0) * (1 - fx) * (1 - fy) + v(y0, x0 + 1) * fx * (1 - fy) +
      v(y0 + 1, x0) * (1 - fx) * fy + v(y0 + 1, x0 + 1) * fx * fy
  }
}
