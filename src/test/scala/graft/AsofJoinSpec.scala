package graft

import org.apache.spark.sql.functions._

import graft.operators.AsofJoin

/** Semantics of the single-sort backward as-of join (operators/AsofJoin):
  * inclusive bound, per-key isolation, no-match nulls, null payload fields
  * surviving the struct carry, and plan shape (no join node). */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private val left = Seq(
    (1L, 10L, "p1"), (1L, 20L, "p2"), (1L, 5L, "p0"),
    (2L, 50L, "q1"), (3L, 7L, "r1")
  ).toDF("k", "ts", "tag")

  private val right = Seq(
    (1L, 10L, 100L, Some("a")), (1L, 15L, 101L, None),
    (2L, 60L, 200L, Some("late")), (9L, 1L, 900L, Some("z"))
  ).toDF("k", "ts", "rid", "rv")

  test("backward as-of: inclusive bound, latest preceding per key, null on no match") {
    val out = AsofJoin.backward(left, right, "k", "ts", Seq("rid", "rv"))
      .orderBy("k", "ts").collect()
    // k=1 ts=5  → no right row ≤ 5 → null
    assert(out(0).isNullAt(out(0).fieldIndex("rid")))
    // k=1 ts=10 → right at exactly 10 matches (inclusive)
    assert(out(1).getAs[Long]("rid") == 100L && out(1).getAs[String]("rv") == "a")
    // k=1 ts=20 → latest preceding is ts=15, whose rv payload FIELD is null
    assert(out(2).getAs[Long]("rid") == 101L)
    assert(out(2).isNullAt(out(2).fieldIndex("rv")))
    // k=2 ts=50 → right row at 60 is in the future → null
    assert(out(3).isNullAt(out(3).fieldIndex("rid")))
    // k=3 has no right rows at all → null
    assert(out(4).isNullAt(out(4).fieldIndex("rid")))
  }

  test("left columns and row count are preserved") {
    val out = AsofJoin.backward(left, right, "k", "ts", Seq("rid"))
    assert(out.count() == left.count())
    assert(out.columns.toSeq == Seq("k", "ts", "tag", "rid"))
    assert(collectSorted(out, "k", "ts").map(_.getAs[String]("tag")) ==
      Seq("p0", "p1", "p2", "q1", "r1"))
  }

  test("matches the naive join-then-argmax formulation on a pseudo-random dataset") {
    val l = (0 until 400).map(i =>
      ((i * 13L) % 7, (i * 7919L) % 500, i.toLong)).toDF("k", "ts", "lid")
    val r = (0 until 300).map(i =>
      ((i * 17L) % 7, (i * 104729L) % 500, 1000L + i)).toDF("k", "ts", "rid")
      .groupBy("k", "ts").agg(max("rid").as("rid")) // unique per (k, ts)
    val fast = AsofJoin.backward(l, r, "k", "ts", Seq("rid"))
      .select("k", "ts", "lid", "rid")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        if (x.isNullAt(3)) -1L else x.getLong(3))).toSet
    // naive: range join + max-ts argmax per left row
    val naive = l.as("l").join(r.as("r"),
        col("l.k") === col("r.k") && col("r.ts") <= col("l.ts"), "left")
      .groupBy(col("l.k"), col("l.ts"), col("l.lid"))
      .agg(max_by(col("r.rid"), col("r.ts")).as("rid"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        if (x.isNullAt(3)) -1L else x.getLong(3))).toSet
    assert(fast == naive)
  }

  test("plan has a single shuffle and no join node") {
    val plan = AsofJoin.backward(left, right, "k", "ts", Seq("rid"))
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("join"))
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1)
  }

  test("bucketed variant equals backward on edge cases and pseudo-random data") {
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (0 until r.length).map(i =>
        if (r.isNullAt(i)) null else r.get(i)).toList).toSet
    assert(canon(AsofJoin.backwardBucketed(left, right, "k", "ts", Seq("rid", "rv"), 4)) ==
      canon(AsofJoin.backward(left, right, "k", "ts", Seq("rid", "rv"))))
    val l = (0 until 400).map(i =>
      ((i * 13L) % 7, (i * 7919L) % 500, i.toLong)).toDF("k", "ts", "lid")
    val r = (0 until 300).map(i =>
      ((i * 17L) % 7, (i * 104729L) % 500, 1000L + i)).toDF("k", "ts", "rid")
      .groupBy("k", "ts").agg(max("rid").as("rid"))
    for (b <- Seq(2, 5, 64))
      assert(canon(AsofJoin.backwardBucketed(l, r, "k", "ts", Seq("rid"), b)) ==
        canon(AsofJoin.backward(l, r, "k", "ts", Seq("rid"))), s"buckets=$b")
    // null-ts left rows survive the bucketed stitch (bucket 0), matching
    // backward instead of vanishing from the equi-join
    val lNull = Seq((1L, Some(10L), "p1"), (1L, None, "pN"), (3L, None, "qN"))
      .toDF("k", "ts", "tag")
    val rSmall = Seq((1L, 5L, 100L)).toDF("k", "ts", "rid")
    val bucketed = AsofJoin.backwardBucketed(lNull, rSmall, "k", "ts", Seq("rid"), 4)
    assert(bucketed.count() == 3)
    assert(canon(bucketed) == canon(AsofJoin.backward(lNull, rSmall, "k", "ts", Seq("rid"))))
    // a null-ts RIGHT payload must ride the cross-bucket carry too
    // (backward's NULLS FIRST window carries it as the oldest row)
    val lFar = Seq((1L, 0L, "a"), (1L, 1000L, "b")).toDF("k", "ts", "tag")
    val rNull = Seq((1L, Option.empty[Long], 100L)).toDF("k", "ts", "rid")
    assert(canon(AsofJoin.backwardBucketed(lFar, rNull, "k", "ts", Seq("rid"), 4)) ==
      canon(AsofJoin.backward(lFar, rNull, "k", "ts", Seq("rid"))))
    // string ts is rejected up front (bucket math vs lexicographic order
    // would silently diverge)
    val lStr = Seq((1L, "5", "x")).toDF("k", "ts", "tag")
    val rStr = Seq((1L, "30", 1L)).toDF("k", "ts", "rid")
    val err = intercept[IllegalArgumentException] {
      AsofJoin.backwardBucketed(lStr, rStr, "k", "ts", Seq("rid"), 4)
    }
    assert(err.getMessage.contains("numeric/temporal"))
  }

  test("bucketed variant: ONE hot key splits across (key, bucket) tasks") {
    // 20k left + 2k right rows, all on a single key — the case that
    // serializes backward's window into one task
    val l = (0 until 20000).map(i => (1L, (i * 7919L) % 100000, i.toLong))
      .toDF("k", "ts", "lid")
    val r = (0 until 2000).map(i => (1L, (i * 104729L) % 100000, 1000000L + i))
      .toDF("k", "ts", "rid").groupBy("k", "ts").agg(max("rid").as("rid"))
    val out = AsofJoin.backwardBucketed(l, r, "k", "ts", Seq("rid"), numBuckets = 16)
    // value parity with the serial form on the hot key
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        if (x.isNullAt(3)) -1L else x.getLong(3))).toSet
    assert(canon(out) == canon(AsofJoin.backward(l, r, "k", "ts", Seq("rid"))))
    // plan shape: the corpus carry window is keyed (k, __bucket) — 16
    // independent groups for this key, multi-task under hash partitioning.
    // The bucket-level carry was localized eagerly, so NO per-key-only
    // window survives into the distributed job at all.
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val lp = out.queryExecution.optimizedPlan
    val wins = lp.collect { case w: LWindow => w }
    assert(wins.exists(_.partitionSpec.size == 2))
    assert(wins.forall(_.partitionSpec.size == 2))
  }

  test("bucketed variant: wide key space auto-falls back to backward (carry guard)") {
    val l = (0 until 5000).map(i => (i.toLong, (i * 7L) % 500, i.toLong))
      .toDF("k", "ts", "lid")
    val r = (0 until 5000).map(i => (i.toLong, (i * 3L) % 500, 1000000L + i))
      .toDF("k", "ts", "rid")
    // 5000 keys × 16 buckets = 80k carry rows > maxCarryRows=1000 → backward
    val guarded = AsofJoin.backwardBucketed(l, r, "k", "ts", Seq("rid"),
      numBuckets = 16, maxCarryRows = 1000L)
    import org.apache.spark.sql.catalyst.plans.logical.{Join => LJoin, Window => LWindow}
    val lp = guarded.queryExecution.optimizedPlan
    assert(lp.collect { case j: LJoin => j }.isEmpty, "guard did not fall back")
    assert(lp.collect { case w: LWindow => w }.forall(_.partitionSpec.size == 1))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        if (x.isNullAt(3)) -1L else x.getLong(3))).toSet
    assert(canon(guarded) == canon(AsofJoin.backward(l, r, "k", "ts", Seq("rid"))))
    // within budget, the bucketed plan (with its localized-carry join) runs
    val inBudget = AsofJoin.backwardBucketed(l, r, "k", "ts", Seq("rid"),
      numBuckets = 4, maxCarryRows = 1L << 18)
    assert(inBudget.queryExecution.optimizedPlan
      .collect { case j: LJoin => j }.nonEmpty)
    assert(canon(inBudget) == canon(guarded))
  }
}
