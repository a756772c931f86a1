package graft.queries

import org.apache.spark.sql.functions._

import graft.Q
import graft.core.Tables

/** General relational operators over the TPC-H-ish tables: scan + agg,
  * broadcast dim join, semi-join shaping, windowed top-k. These exercise the
  * engine's bread-and-butter plans (pushdown, partial aggregation, broadcast
  * joins) and provide the bench headline numbers.
  *
  * Float determinism: every aggregated measure is integer-valued or cast to
  * DECIMAL before summing, so results are order-independent and hash-stable
  * vs the DuckDB oracle.
  */
object RelationalQueries {

  val all: Seq[Q] = Seq(

    // DuckDB's sum() widens (BIGINT→HUGEINT, DECIMAL(18,2)→DECIMAL(38,2))
    // while Spark keeps BIGINT / DECIMAL(28,2); both sides therefore cast the
    // FINAL aggregate — BIGINT for counts, DOUBLE for money (the decimal sum
    // is exact, so the double conversion is deterministic and identical).
    Q("q1_agg",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast("bigint")).cast("bigint").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_price"),
          sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1) - col("l_discount")).cast("decimal(18,2)")).cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
    },

    Q("q2_join_agg",
      """SELECT n.n_name,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders o
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY n.n_name""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir)
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
    },

    Q("q3_topk_window",
      """WITH ranked AS (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders
        |)
        |SELECT o_custkey, o_orderkey, o_totalprice FROM ranked WHERE rk <= 3""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, dir)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    },

    Q("q4_semi_join",
      """SELECT o_orderkey, o_totalprice FROM orders o
        |WHERE EXISTS (
        |  SELECT 1 FROM lineitem l
        |  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45
        |)""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir).join(
        Tables.lineitem(s, dir).filter(col("l_quantity") > 45),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
        .select("o_orderkey", "o_totalprice")
    },

    Q("q5_filter_pushdown",
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1998-06-01' AND l_discount < 0.05""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1998-06-01").cast("timestamp") &&
          col("l_discount") < 0.05)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    },

    Q("q6_events_sessionize",
      """WITH g AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us,
        |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000 OR lag(ts) OVER w IS NULL
        |         THEN 1 ELSE 0 END AS boundary
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), s AS (
        |  SELECT user_id, event_id, us,
        |    CAST(sum(boundary) OVER (PARTITION BY user_id ORDER BY us, event_id
        |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM g
        |)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  max(us) - min(us) AS dur_us
        |FROM s GROUP BY user_id, session_id""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val ws = Window.partitionBy("user_id").orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, dir)
        .withColumn("us", unix_micros(col("ts").cast("timestamp")))
        .withColumn("boundary",
          when(col("us") - lag("us", 1).over(w) > 1800000000L ||
            lag("ts", 1).over(w).isNull, 1).otherwise(0))
        .withColumn("session_id", sum("boundary").over(ws))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"), (max("us") - min("us")).as("dur_us"))
    },

    // Backward as-of join: each purchase gets the user's most recent
    // preceding (inclusive) click. Spark side is the single-sort union
    // formulation (operators/AsofJoin.scala — no join node, skew-immune);
    // the oracle is DuckDB's native ASOF LEFT JOIN. The right side is
    // pre-aggregated per (user_id, us) so the as-of match is unique.
    Q("q7_asof_join",
      """WITH clicks AS (
        |  SELECT user_id, epoch_us(ts) AS us, max(event_id) AS last_click_id
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2
        |), purchases AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS us
        |  FROM events WHERE event_type = 'purchase'
        |)
        |SELECT p.event_id, p.user_id, p.us, c.last_click_id,
        |  p.us - c.us AS gap_us
        |FROM purchases p ASOF LEFT JOIN clicks c
        |  ON p.user_id = c.user_id AND c.us <= p.us""".stripMargin) { (s, dir) =>
      import graft.operators.AsofJoin
      val ev = Tables.events(s, dir)
        .withColumn("us", unix_micros(col("ts").cast("timestamp")))
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy("user_id", "us").agg(max("event_id").as("last_click_id"))
        .withColumn("click_us", col("us"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "us")
      AsofJoin.backward(purchases, clicks, "user_id", "us",
        Seq("last_click_id", "click_us"))
        .select(col("event_id"), col("user_id"), col("us"), col("last_click_id"),
          (col("us") - col("click_us")).as("gap_us"))
    },

    // The hot-key as-of path: same semantics and oracle as q7_asof_join but
    // through the ts-range-bucketed two-pass formulation (bounded tasks at
    // any key skew — operators/AsofJoin.backwardBucketed).
    Q("q7_asof_join_bucketed",
      """WITH clicks AS (
        |  SELECT user_id, epoch_us(ts) AS us, max(event_id) AS last_click_id
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2
        |), purchases AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS us
        |  FROM events WHERE event_type = 'purchase'
        |)
        |SELECT p.event_id, p.user_id, p.us, c.last_click_id,
        |  p.us - c.us AS gap_us
        |FROM purchases p ASOF LEFT JOIN clicks c
        |  ON p.user_id = c.user_id AND c.us <= p.us""".stripMargin) { (s, dir) =>
      import graft.operators.AsofJoin
      val ev = Tables.events(s, dir)
        .withColumn("us", unix_micros(col("ts").cast("timestamp")))
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy("user_id", "us").agg(max("event_id").as("last_click_id"))
        .withColumn("click_us", col("us"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "us")
      AsofJoin.backwardBucketed(purchases, clicks, "user_id", "us",
        Seq("last_click_id", "click_us"), numBuckets = 16)
        .select(col("event_id"), col("user_id"), col("us"), col("last_click_id"),
          (col("us") - col("click_us")).as("gap_us"))
    })
}
