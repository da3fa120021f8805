package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window / analytic functions (SURVEY.md §2.5).
  *
  * Doris evaluates these in a single AnalyticEvalNode
  * ([doris: be/src/vec/exec/vanalytic_eval_node.cpp]) with frame analysis in
  * [doris: fe/.../analysis/AnalyticWindow.java]. Spark's WindowExec covers the
  * whole surface; we only declare PARTITION BY / ORDER BY / frame.
  *
  * Scale notes: a window = one shuffle on the partition key + per-partition
  * sort. Partition keys here (returnflag, suppkey, user_id) have enough
  * cardinality to spread across a cluster; none of the frames require
  * buffering an unbounded partition in memory except the running-total frame,
  * which Spark streams incrementally. ORDER BY carries unique tiebreakers so
  * row_number/ntile are deterministic for the oracle.
  */
object Windows {

  def queries: Map[String, QueryDef] = Map(
    // Ranking family: row_number/rank/dense_rank/percent_rank/cume_dist/ntile.
    // Partition-key design: row_number/ntile partition by a 64-way customer
    // bucket (pmod(o_custkey, 64)) — a 3-value key like o_orderstatus would
    // put the whole table in 3 window partitions at scale. The rank/
    // percent_rank/cume_dist family stays on o_orderstatus deliberately: it
    // demonstrates peer-group semantics over a coarse key (results are
    // order-insensitive within peers) and at 100 TB that specific window
    // would need the same bucketing treatment (documented tradeoff).
    // Determinism: testdata keys are not unique (duplicate (l_orderkey,
    // l_linenumber) pairs), so row_number/ntile order is fully tiebroken.
    "win_rank" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val coarse = (floor($"o_totalprice" / 1000.0) * 1000.0).desc
        val wPeers = Window.partitionBy($"o_orderstatus").orderBy(coarse)
        val bucket = pmod($"o_custkey", lit(64))
        val wUnique = Window.partitionBy(bucket)
          .orderBy($"o_totalprice".desc, $"o_orderkey")
        Tables.orders(s, dir)
          .select(
            $"o_orderkey", $"o_orderstatus",
            bucket.as("cust_bucket"),
            row_number().over(wUnique).as("rn"),
            rank().over(wPeers).as("rk"),
            dense_rank().over(wPeers).as("drk"),
            round(percent_rank().over(wPeers), 6).as("prk"),
            round(cume_dist().over(wPeers), 6).as("cd"),
            ntile(4).over(wUnique).as("quartile"))
          .orderBy($"o_orderkey")
      },
      """SELECT o_orderkey, o_orderstatus,
        |  o_custkey % 64 AS cust_bucket,
        |  row_number() OVER wu AS rn,
        |  rank() OVER wp AS rk,
        |  dense_rank() OVER wp AS drk,
        |  round(percent_rank() OVER wp, 6) AS prk,
        |  round(cume_dist() OVER wp, 6) AS cd,
        |  ntile(4) OVER wu AS quartile
        |FROM orders
        |WINDOW wp AS (PARTITION BY o_orderstatus
        |              ORDER BY floor(o_totalprice / 1000.0) * 1000.0 DESC),
        |       wu AS (PARTITION BY o_custkey % 64
        |              ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin),

    // Offset family: lag/lead with defaults, first_value/last_value.
    "win_offset" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, dir)
          .select(
            $"user_id", $"event_id",
            lag($"value", 1, -1.0).over(w).as("prev_value"),
            lead($"value", 1, -1.0).over(w).as("next_value"),
            lag($"event_type", 2).over(w).as("prev2_type"),
            first_value($"event_id").over(wRun).as("first_event"),
            last_value($"event_id").over(wRun).as("latest_event"))
          .orderBy($"user_id", $"event_id")
      },
      """SELECT user_id, event_id,
        |  lag(value, 1, -1.0) OVER w AS prev_value,
        |  lead(value, 1, -1.0) OVER w AS next_value,
        |  lag(event_type, 2) OVER w AS prev2_type,
        |  first_value(event_id) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_event,
        |  last_value(event_id) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS latest_event
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, event_id""".stripMargin),

    // IGNORE NULLS variants of the offset/value family — the gap-filling
    // idiom (last known sensor reading, previous non-null price). Same
    // deterministic (ts, event_id) window as win_offset; the nullable
    // column is derived (value >= 50) so both null and non-null branches
    // execute on every user partition.
    "win_ignore_nulls" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val v = when($"value" >= 50, $"value")
        Tables.events(s, dir)
          .select(
            $"user_id", $"event_id", v.as("v"),
            lag(v, 1, null, true).over(w).as("prev_nn"),
            lead(v, 1, null, true).over(w).as("next_nn"),
            first_value(v, lit(true)).over(wRun).as("first_nn"),
            last_value(v, lit(true)).over(wRun).as("run_nn"))
          .orderBy($"user_id", $"event_id")
      },
      """SELECT user_id, event_id,
        |  CASE WHEN value >= 50 THEN value END AS v,
        |  lag(CASE WHEN value >= 50 THEN value END, 1 IGNORE NULLS) OVER w AS prev_nn,
        |  lead(CASE WHEN value >= 50 THEN value END, 1 IGNORE NULLS) OVER w AS next_nn,
        |  first_value(CASE WHEN value >= 50 THEN value END IGNORE NULLS)
        |    OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_nn,
        |  last_value(CASE WHEN value >= 50 THEN value END IGNORE NULLS)
        |    OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_nn
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, event_id""".stripMargin),

    // Aggregate-over-ROWS-frame: running totals + moving averages.
    // Runs over orders (o_orderkey unique) so the ROWS frame content is
    // deterministic cross-engine.
    //
    // Scale trap (caught by the round-11 sf1 verify): `count(*) OVER (...
    // CURRENT ROW AND UNBOUNDED FOLLOWING)` executes as Spark's
    // UnboundedFollowingWindowFunctionFrame, which RE-AGGREGATES the frame
    // from every row position — O(rows²) per partition. orders partitioned
    // by o_orderstatus has only 3 partitions, so at sf1 (~500k rows each)
    // the key effectively hung (10× data → 100× work). The remaining-rows
    // count is re-expressed with the subtraction identity
    // `count over FULL frame − row_number() + 1`: the full-frame aggregate
    // is computed ONCE per partition (UnboundedWindowFunctionFrame) and
    // row_number is a running frame — both O(rows). Same value, linear
    // cost; the oracle keeps the declarative UNBOUNDED FOLLOWING spelling
    // (DuckDB's segment-tree frames are O(n log n) either way).
    "win_frame" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"o_orderstatus").orderBy($"o_orderkey")
        val full = w.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)
        Tables.orders(s, dir)
          .select(
            $"o_orderkey", $"o_orderstatus",
            // running sum checked in integer cents (×80 halfway-free):
            // Spark's window frame accumulates sequentially while DuckDB
            // sums via a segment tree, so a DOUBLE running total's
            // summation TREE differs and 1.5M-row prefixes drift past the
            // 12-digit comparator (caught at sf1) — BIGINT cents are
            // association-free
            sum(expr("CAST(round(o_totalprice * 80) AS BIGINT)")).over(
              w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
              .as("running_cents"),
            round(avg($"o_totalprice").over(
              w.rowsBetween(-2, Window.currentRow)), 4).as("mv3_price"),
            (count(lit(1)).over(full) - row_number().over(w) + 1L)
              .as("remaining"))
          .orderBy($"o_orderstatus", $"o_orderkey")
      },
      """SELECT o_orderkey, o_orderstatus,
        |  CAST(sum(CAST(round(o_totalprice * 80) AS BIGINT)) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_cents,
        |  round(avg(o_totalprice) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS mv3_price,
        |  count(*) OVER (w ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS remaining
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_orderkey)
        |ORDER BY o_orderstatus, o_orderkey""".stripMargin),

    // RANGE frame on a numeric order key: peers by value distance, not rows.
    // (DataFrame rangeBetween only accepts integral offsets, so the
    // fractional-range frame is declared in SQL — same Catalyst plan.)
    "win_range_frame" -> QueryDef(
      (s, dir) => {
        Tables.orders(s, dir).createOrReplaceTempView("v_orders_wrf")
        s.sql(
          """SELECT o_orderkey, o_orderstatus,
            |  count(*) OVER w AS n_within_5k,
            |  round(sum(o_totalprice) OVER w, 2) AS sum_within_5k
            |FROM v_orders_wrf
            |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice
            |             RANGE BETWEEN 5000.0 PRECEDING AND CURRENT ROW)
            |ORDER BY o_orderkey""".stripMargin)
      },
      """SELECT o_orderkey, o_orderstatus,
        |  count(*) OVER w AS n_within_5k,
        |  round(sum(o_totalprice) OVER w, 2) AS sum_within_5k
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice
        |             RANGE BETWEEN 5000.0 PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin),

    // Time-interval RANGE frame — the event-time twin of win_range_frame's
    // numeric range: a trailing 1-hour running sum per event_type, the
    // batch spelling of a sliding window aggregate (each row sees the sum
    // of its partition's preceding hour). One sort-shuffle on the
    // partition key; the frame scan is a per-partition two-pointer pass,
    // so the window cost is linear at any SF. ts is second-truncated on
    // both engines (events.ts is ns-precision; Spark holds µs, DuckDB ns —
    // TESTDATA.md rule: never compare raw ts), and RANGE frames are
    // peer-inclusive so truncation ties can't diverge the frame contents.
    "win_time_range" -> QueryDef(
      (s, dir) => {
        Tables.events(s, dir).createOrReplaceTempView("v_events_wtr")
        s.sql(
          """SELECT event_id,
            |  round(sum(value) OVER (
            |    PARTITION BY event_type ORDER BY date_trunc('second', ts)
            |    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW), 2)
            |    AS hour_sum
            |FROM v_events_wtr ORDER BY event_id""".stripMargin)
      },
      """SELECT event_id,
        |  round(sum(value) OVER (
        |    PARTITION BY event_type ORDER BY date_trunc('second', ts)
        |    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW), 2)
        |    AS hour_sum
        |FROM events ORDER BY event_id""".stripMargin),

    // Batch gap-based SESSIONIZATION — the classic lag+running-sum window
    // composition (30-min inactivity gap ⇒ new session), the batch
    // counterpart of stream_session's native session_window. Everything is
    // partitioned by user_id: one hash shuffle feeds both window passes, and
    // the session/per-user rollups re-aggregate within the same key space —
    // no second wide shuffle of the event stream. Ordering is (ts, event_id)
    // so equal-timestamp events assign deterministically in both engines.
    // The gap test compares FRACTIONAL epoch seconds on both sides
    // (cast-to-double here, epoch(ts) in DuckDB): unix_timestamp floors to
    // whole seconds, so a true gap in (1800.0, 1801.0) would split a
    // session in DuckDB but not here — microsecond-resolution ts makes
    // that divergence one data regeneration away.
    "win_sessionize" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        val prev = lag($"ts", 1).over(w)
        Tables.events(s, dir).select($"user_id", $"ts", $"event_id")
          .withColumn("new_s", when(prev.isNull ||
            $"ts".cast("double") - prev.cast("double") > 1800d, 1L)
            .otherwise(0L))
          .withColumn("sess", sum($"new_s").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy($"user_id", $"sess")
          .agg(count(lit(1)).as("n_ev"))
          .groupBy($"user_id")
          .agg(count(lit(1)).as("n_sessions"),
            max($"n_ev").as("max_session_events"),
            sum($"n_ev").as("n_events"))
          .orderBy($"user_id")
      },
      """WITH m AS (SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |      OR epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800
        |      THEN 1 ELSE 0 END AS new_s
        |  FROM events),
        |sx AS (SELECT user_id, sum(new_s) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS sess FROM m),
        |g AS (SELECT user_id, sess, count(*) AS n_ev FROM sx GROUP BY 1, 2)
        |SELECT user_id, count(*) AS n_sessions,
        |  max(n_ev) AS max_session_events,
        |  CAST(sum(n_ev) AS BIGINT) AS n_events
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin),

    // nth_value over the FULL partition frame (UNBOUNDED PRECEDING..
    // UNBOUNDED FOLLOWING — the default running frame would make it a
    // per-row prefix-nth instead): third-highest price per status, reduced
    // to one row per partition since the full-frame value is constant.
    "win_nth" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"o_orderstatus")
          .orderBy($"o_totalprice".desc, $"o_orderkey")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Tables.orders(s, dir)
          .withColumn("third", nth_value($"o_totalprice", 3).over(w))
          .groupBy($"o_orderstatus")
          .agg(round(max($"third"), 2).as("third_price"),
            count(lit(1)).as("n_rows"))
          .orderBy($"o_orderstatus")
      },
      """SELECT o_orderstatus,
        |  round(max(third), 2) AS third_price, count(*) AS n_rows
        |FROM (SELECT o_orderstatus, nth_value(o_totalprice, 3) OVER (
        |        PARTITION BY o_orderstatus
        |        ORDER BY o_totalprice DESC, o_orderkey
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |        AS third
        |      FROM orders) t
        |GROUP BY 1 ORDER BY 1""".stripMargin),

    // QUALIFY (Doris 2.x / DuckDB): filter on a window result without a
    // subquery. Spark has no QUALIFY keyword; the translation is the window
    // column + filter + drop — Catalyst plans it identically to the
    // subquery spelling (one window sort-shuffle, filter above), which is
    // why this is a pure dialect shim, not an engine gap. Top-3 orders by
    // price per order status.
    "win_qualify" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"o_orderstatus")
          .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
        Tables.orders(s, dir)
          .withColumn("rk", row_number().over(w))
          .filter($"rk" <= 3)
          .select($"o_orderstatus", $"rk", $"o_orderkey",
            round($"o_totalprice", 2).as("price"))
          .orderBy($"o_orderstatus", $"rk")
      },
      """SELECT o_orderstatus,
        |  row_number() OVER (PARTITION BY o_orderstatus
        |                     ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk,
        |  o_orderkey, round(o_totalprice, 2) AS price
        |FROM orders
        |QUALIFY rk <= 3
        |ORDER BY o_orderstatus, rk""".stripMargin)
  )
}
