package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.core.Spadl
import graft.streaming.SessionEngine.{ActionRow, ValuedAction}

/** Skew-salted variant of the per-match CEP pass (north star: "skew from
  * long matches is handled via salted repartitioning on (game_id,
  * period)").
  *
  * `runBatch` co-locates each WHOLE game in one task; one marathon match
  * (or a data bug concatenating streams under one game_id) makes that task
  * the straggler. This variant splits the work:
  *
  *  - stage A — keyed by (game_id, period_id): the heavy O(n) scan runs
  *    per period (sort, intra-period clearance fix, dribble synthesis —
  *    dribbles never cross periods — period-local resequencing and
  *    PROVISIONAL k-lookahead labels);
  *  - stage B — keyed by game_id but fed ONLY boundary fragments (each
  *    period's first `k` rows and row count, ≤ (k+1)·periods rows per
  *    game): computes global id offsets, the period-last clearance
  *    correction (end := next period's first start), and corrected labels
  *    for each period's tail rows (whose lookahead window crosses into the
  *    next period);
  *  - stage C — a co-partitioned join of the corrections back onto the
  *    stage-A output.
  *
  * Label windows depend only on (team, type, result) of following rows and
  * clearance corrections only on the next period's first start — so the
  * boundary fragments are sufficient, stage-B state is O(k·periods), and
  * the skewed key never funnels its full row set through one task again.
  * SaltedSessionSpec asserts bit-equality with `runBatch`.
  */
object SaltedSession {

  /** Stage-A output row: a provisionally-labeled action plus its
    * period-local index and the period's row count. */
  final case class LocalRow(
      game_id: Long, period_id: Int, local_id: Long, n_period: Long,
      time_seconds: Double, team_id: Long, player_id: Long,
      start_x: Double, start_y: Double, end_x: Double, end_y: Double,
      type_id: Int, result_id: Int, bodypart_id: Int, seq: Long,
      scores: Boolean, concedes: Boolean)

  /** Per-period offset of global action ids. */
  final case class Offset(game_id: Long, period_id: Int, offset: Long)

  private def goalish(t: Int): Boolean =
    t == Spadl.TypeShot || t == Spadl.TypeShotPenalty || t == Spadl.TypeShotFreekick

  /** The period-local scan: identical math to SessionEngine.processGame,
    * restricted to one period (all of whose stencils are period-local
    * except the boundary cases stage B fixes). */
  private[streaming] def processPeriod(rows: Seq[ActionRow], k: Int): IndexedSeq[LocalRow] = {
    val sorted = rows.toIndexedSeq.sortBy(a => (a.time_seconds, a.seq))
    if (sorted.isEmpty) return IndexedSeq.empty
    val cleared = sorted.zipWithIndex.map { case (a, i) =>
      if (a.type_id == Spadl.TypeClearance && i + 1 < sorted.length)
        a.copy(end_x = sorted(i + 1).start_x, end_y = sorted(i + 1).start_y)
      else a // the period-LAST clearance is fixed in stage B
    }
    val withDribbles = cleared.zipWithIndex.flatMap { case (a, i) =>
      val self = Seq(a)
      if (i + 1 >= cleared.length) self
      else {
        val nx = cleared(i + 1)
        val dx = a.end_x - nx.start_x
        val dy = a.end_y - nx.start_y
        val d2 = dx * dx + dy * dy
        val cond = a.team_id == nx.team_id &&
          nx.type_id != Spadl.TypeFoul &&
          nx.type_id != Spadl.TypeShot && nx.bodypart_id != Spadl.BodypartHead &&
          d2 >= 9.0 && d2 <= 3600.0 &&
          nx.time_seconds - a.time_seconds < 10.0 &&
          a.period_id == nx.period_id
        if (!cond) self
        else self :+ ActionRow(a.game_id, a.action_id, nx.period_id,
          (a.time_seconds + nx.time_seconds) / 2, nx.team_id, nx.player_id,
          a.end_x, a.end_y, nx.start_x, nx.start_y, Spadl.TypeDribble,
          Spadl.ResultSuccess, Spadl.BodypartFoot, a.seq)
      }
    }
    val n = withDribbles.length.toLong
    withDribbles.zipWithIndex.map { case (a, i) =>
      val window = withDribbles.slice(i, math.min(i + k, withDribbles.length))
      val scores = window.exists(b => goalish(b.type_id) &&
        ((b.result_id == Spadl.ResultSuccess && b.team_id == a.team_id) ||
          (b.result_id == Spadl.ResultOwngoal && b.team_id != a.team_id)))
      val concedes = window.exists(b => goalish(b.type_id) &&
        ((b.result_id == Spadl.ResultOwngoal && b.team_id == a.team_id) ||
          (b.result_id == Spadl.ResultSuccess && b.team_id != a.team_id)))
      LocalRow(a.game_id, a.period_id, i.toLong, n, a.time_seconds, a.team_id,
        a.player_id, a.start_x, a.start_y, a.end_x, a.end_y, a.type_id,
        a.result_id, a.bodypart_id, a.seq, scores, concedes)
    }
  }

  /** Compact per-period goal summary of the NEXT period's first k rows —
    * all stage C needs to evaluate the cross-boundary part of a tail row's
    * label window (labels depend only on team/type/result). */
  final case class BoundaryGoals(
      game_id: Long, period_id: Int, // the period whose tails these serve
      // position j (0-based) in the next period → (team_id, owngoal?)
      goals: Seq[(Long, Long, Boolean)]) // (next-period local_id, team, owngoal)

  private[streaming] def boundaryGoals(heads: Seq[LocalRow], k: Int): Seq[BoundaryGoals] = {
    val byPeriod = heads.groupBy(_.period_id).toSeq.sortBy(_._1)
      .map { case (p, rs) => (p, rs.sortBy(_.local_id)) }
    byPeriod.sliding(2).flatMap {
      case Seq((p, _), (_, nextHeads)) =>
        val gs = nextHeads.take(k).filter(r => goalish(r.type_id) &&
          (r.result_id == Spadl.ResultSuccess || r.result_id == Spadl.ResultOwngoal))
          .map(r => (r.local_id, r.team_id, r.result_id == Spadl.ResultOwngoal))
        Seq(BoundaryGoals(nextHeads.head.game_id, p, gs))
      case _ => Seq.empty
    }.toSeq
  }

  /** The salted batch pass: semantically identical to
    * `SessionEngine.runBatch` (asserted by SaltedSessionSpec), with the
    * per-game shuffle replaced by a per-(game, period) shuffle plus a
    * boundary-fragment stitch. */
  def runBatch(actions: DataFrame, nrActions: Int = 10): DataFrame = {
    val spark = actions.sparkSession
    import spark.implicits._
    val k = nrActions

    val local = actions
      .select(col("game_id"), col("action_id"), col("period_id"),
        col("time_seconds"), col("team_id"), col("player_id"), col("start_x"),
        col("start_y"), col("end_x"), col("end_y"), col("type_id"),
        col("result_id"), col("bodypart_id"), col("seq"))
      .as[ActionRow]
      .groupByKey(a => (a.game_id, a.period_id))
      .flatMapGroups((_: (Long, Int), it: Iterator[ActionRow]) =>
        processPeriod(it.toSeq, k).iterator)

    // boundary fragments: each period's first k+1 rows (carry the count)
    val heads = local.filter(r => r.local_id <= k)

    val stitched = heads
      .groupByKey(_.game_id)
      .flatMapGroups { (_: Long, it: Iterator[LocalRow]) =>
        val hs = it.toSeq
        val byPeriod = hs.groupBy(_.period_id).toSeq.sortBy(_._1)
          .map { case (p, rs) => (p, rs.sortBy(_.local_id)) }
        val counts = byPeriod.map { case (p, rs) => (p, rs.head.n_period) }
        val gid = hs.head.game_id
        val offsets = counts.scanLeft(0L) { case (acc, (_, n)) => acc + n }
          .zip(counts).map { case (off, (p, _)) => Offset(gid, p, off) }
        val bgs = boundaryGoals(hs, k)
        val clearFixes = byPeriod.sliding(2).flatMap {
          case Seq((p, _), (_, nextHeads)) =>
            val n = counts.find(_._1 == p).get._2
            Seq((p, n - 1, nextHeads.head.start_x, nextHeads.head.start_y))
          case _ => Seq.empty
        }.toSeq
        Iterator.single((gid, offsets, bgs, clearFixes))
      }

    val offsetsDf = stitched.flatMap(_._2).toDF()
    val goalsDf = stitched.flatMap { case (gid, _, bgs, _) =>
      bgs.flatMap(bg => bg.goals.map { case (lid, team, og) =>
        (gid, bg.period_id, lid, team, og)
      })
    }.toDF("game_id", "period_id", "next_local_id", "goal_team", "is_owngoal")
    val clearDf = stitched.flatMap { case (gid, _, _, cfs) =>
      cfs.map { case (p, lid, x, y) => (gid, p, lid, x, y) }
    }.toDF("game_id", "period_id", "local_id", "fix_end_x", "fix_end_y")

    // stage C: apply offsets, clearance fixes, and boundary label ORs
    val base = local.toDF()
      .join(offsetsDf, Seq("game_id", "period_id"))
      .join(clearDf, Seq("game_id", "period_id", "local_id"), "left")
    // boundary labels: tail row i (local) sees next-period rows with
    // next_local_id < k - (n_period - i); goals there flip scores/concedes
    val withGoals = base
      .join(goalsDf, Seq("game_id", "period_id"), "left")
      .withColumn("borrow",
        col("next_local_id").isNotNull &&
          col("next_local_id") < lit(k) - (col("n_period") - col("local_id")))
      .groupBy((base.columns).map(col): _*)
      .agg(
        max(when(col("borrow") &&
          ((!col("is_owngoal") && col("goal_team") === col("team_id")) ||
            (col("is_owngoal") && col("goal_team") =!= col("team_id"))), true)
          .otherwise(false)).as("b_scores"),
        max(when(col("borrow") &&
          ((col("is_owngoal") && col("goal_team") === col("team_id")) ||
            (!col("is_owngoal") && col("goal_team") =!= col("team_id"))), true)
          .otherwise(false)).as("b_concedes"))

    withGoals.select(
      col("game_id"),
      (col("offset") + col("local_id")).as("action_id"),
      col("period_id"), col("time_seconds"), col("team_id"), col("player_id"),
      col("start_x"), col("start_y"),
      // the boundary fix only applies when the period-last row IS a
      // clearance (stage B ships it unconditionally; cheaper than shipping
      // the type)
      coalesce(when(col("type_id") === graft.core.Spadl.TypeClearance, col("fix_end_x")),
        col("end_x")).as("end_x"),
      coalesce(when(col("type_id") === graft.core.Spadl.TypeClearance, col("fix_end_y")),
        col("end_y")).as("end_y"),
      col("type_id"), col("result_id"), col("bodypart_id"), col("seq"),
      (col("scores") || col("b_scores")).as("scores"),
      (col("concedes") || col("b_concedes")).as("concedes"))
  }
}
