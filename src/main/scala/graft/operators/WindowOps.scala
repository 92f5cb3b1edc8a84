package graft.operators

import graft.{Det, Q, QueryModule, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column
import org.apache.spark.sql.types.{DoubleType, LongType}

/** §2.5 window functions.
  *
  * Determinism: every window orderBy ends in a unique tiebreaker
  * (o_orderkey / event_id) — rank/lag/frame results would otherwise be
  * tie-dependent. Row frames (not range) per SURVEY §5.3; running sums use
  * exact decimals so prefix sums are reproducible.
  *
  * Scale notes: a window = one shuffle on partitionBy keys + per-partition
  * sort. Partition keys here (o_custkey, user_id) are high-cardinality, so
  * partitions stay small and skew-free at 100 TB. No global windows
  * (Window.orderBy without partitionBy) — those single-task at scale.
  */
object WindowOps extends QueryModule {
  import Det._

  override def queries: Map[String, Q.Fn] = Map(
    "win_rank" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"),
          row_number().over(w).as("rn"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          ntile(4).over(w).as("quartile"))
        .orderBy("o_orderkey")
    }),

    "win_topk_group" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 3)
        .select(col("o_custkey"), col("rn"), col("o_orderkey"),
          col("o_totalprice"))
        .orderBy("o_custkey", "rn")
    }),

    "win_lag_lead" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          coalesce(lag("event_id", 1).over(w), lit(-1L)).as("prev_id"),
          coalesce(lead("event_id", 1).over(w), lit(-1L)).as("next_id"),
          coalesce(
            unix_timestamp(col("ts")) - unix_timestamp(lag("ts", 1).over(w)),
            lit(-1L)).as("gap_s"))
        .orderBy("event_id")
    }),

    "win_running" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"),
          sum(dec2(col("o_totalprice"))).over(w).cast("double")
            .as("run_total"))
        .orderBy("o_orderkey")
    }),

    // distribution functions + frame-boundary values over one window pass
    "win_cume" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      val frame = w.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"),
          first(col("o_orderkey")).over(frame).as("cheapest_key"),
          last(col("o_orderkey")).over(frame).as("priciest_key"),
          nth_value(col("o_orderkey"), 2).over(frame).as("second_key"))
        .orderBy("o_orderkey")
    }),

    // forward fill (last observation carried forward): sparse per-user
    // measurements (only purchases carry a value here) propagated to
    // every later event via last(..., ignoreNulls) over an unbounded-
    // preceding frame — the gap-filling idiom for sensor/price series.
    // One shuffle by user_id; the frame never looks ahead, so the
    // streaming analogue is a running value state.
    "win_fill_forward" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("ts"),
          when(col("event_type") === "purchase", col("value")).as("sparse"))
        .select(col("event_id"), col("user_id"),
          last(col("sparse"), ignoreNulls = true).over(w).as("filled"))
        .orderBy("event_id")
    }),

    // ntile bucketing: equal-depth quartiles per language, the shape a
    // train/val/test split or per-stratum binning uses. Partitioned by
    // lang so each sort is per-stratum — never a single global order
    // (the scale-safe form; a global ntile funnels everything through
    // one partition).
    "win_ntile" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          ntile(4).over(Window.partitionBy("lang").orderBy("doc_id"))
            .cast("bigint").as("quartile"))
        .orderBy("doc_id")),

    // value-based (RANGE) frame: 30-day trailing spend per customer. A
    // range frame includes ALL rows in the value band, so it is
    // deterministic as a set even under order ties — safe to compare
    // (sums stay exact decimals). Complements the row frames above.
    "win_range_frame" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("wr_orders")
      s.sql(
        """SELECT o_orderkey, o_custkey,
          |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
          |    PARTITION BY o_custkey ORDER BY o_orderdate
          |    RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW
          |  ) AS DOUBLE) AS spend_30d
          |FROM wr_orders ORDER BY o_orderkey""".stripMargin)
    }),

    "win_moving_avg" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(-2, Window.currentRow)
      Tables.events(s, d)
        .select(col("event_id"),
          (sum(dec2(col("value"))).over(w).cast("double") /
            count(lit(1)).over(w)).as("mov_avg"))
        .orderBy("event_id")
    }),

    // ABC / Pareto classification: per return flag, suppliers ranked by
    // exact-decimal revenue; running revenue share classifies A (≤80%),
    // B (≤95%), C (rest). Cumulative sums stay DECIMAL (order-exact)
    // until the one share division; windows partition by the group so
    // nothing single-tasks at scale (global Pareto = per-group Pareto
    // over a coarse stratum + a final merge in practice).
    "win_abc_pareto" -> ((s, d) => {
      val rev = Tables.lineitem(s, d)
        .groupBy("l_returnflag", "l_suppkey")
        .agg(sum(dec2(col("l_extendedprice"))).as("rev"))
      val rank = Window.partitionBy("l_returnflag")
        .orderBy(col("rev").desc, col("l_suppkey"))
      val cum = rank.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val all = Window.partitionBy("l_returnflag")
      // divide in DOUBLE space: decimal-division scale rules differ
      // between engines, but both cumulative and total sums are exact
      // decimals, so casting each to double first gives bit-equal shares
      val share = sum("rev").over(cum).cast("double") /
        sum("rev").over(all).cast("double")
      rev.select(col("l_returnflag"), col("l_suppkey"),
          col("rev").cast("double").as("revenue"),
          row_number().over(rank).cast("long").as("rk"),
          share.as("cum_share"),
          when(share <= 0.80, "A").when(share <= 0.95, "B")
            .otherwise("C").as("abc_class"))
        .orderBy("l_returnflag", "rk")
    }),

    // running DISTINCT count per user (how many distinct event types has
    // this user touched so far): windows don't support DISTINCT
    // aggregates in either engine, so the composition is the standard
    // trick — flag each (user, type)'s FIRST occurrence with one
    // row_number window, then running-sum the flags. Both windows ride
    // the same user_id exchange.
    "win_running_distinct" -> ((s, d) => {
      val firstOcc = Window.partitionBy("user_id", "event_type")
        .orderBy(col("ts"), col("event_id"))
      val run = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("first_flag",
          when(row_number().over(firstOcc) === 1, 1L).otherwise(0L))
        .select(col("event_id"), col("user_id"),
          sum("first_flag").over(run).as("distinct_types_so_far"))
        .orderBy("event_id")
    }),

    // exponentially-decayed running metric (EWMA, half-life = 1 event):
    // ewma_t = Σ_{k=0..19} value_{t-k}·2⁻ᵏ over each user's event
    // stream, in exact integer space — the value is micro-quantized
    // (decimal-exact) and each lagged term is arithmetic-shifted, so no
    // float accumulation exists and both engines replay bit-equal. The
    // 20-lag truncation IS the metric's definition (documented): term
    // k=20 of a ≤ 500.00 value is < 1 micro-unit. One window pass
    // (user_id partition, 20 LAG calls share the single sort) — the
    // running twin of agg_decay's grouped halving chain.
    "win_ewma" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val terms = col("q") +: (1 until 20).map(k =>
        coalesce(shiftright(lag(col("q"), k).over(w), k), lit(0L)))
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("ts"),
          (dec2(col("value")) * 1000000).cast("long").as("q"))
        .select(col("event_id"), col("user_id"),
          terms.reduce(_ + _).as("ewma_micro"))
        .withColumn("ewma",
          col("ewma_micro").cast("double") / lit(1000000.0))
        .orderBy("event_id")
    }),

    // linear gap interpolation: sparse per-user measurements (purchase
    // values) filled linearly by row position between the nearest
    // observations on both sides — the two-sided completion of
    // win_fill_forward's LOCF. Four IGNORE NULLS frame lookups over one
    // user_id exchange; leading/trailing gaps stay NULL (no
    // extrapolation). Determinism: observed values are cent-quantized
    // exact integers, and the interpolation is integer-exact products
    // followed by ONE division written identically on both engines, so
    // IEEE rounding agrees bit-for-bit.
    "win_interpolate" -> ((s, d) => {
      val base = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val back = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val fwd = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val prevQ = last(col("qc"), ignoreNulls = true).over(back)
      val prevRn = last(when(col("qc").isNotNull, col("rn")),
        ignoreNulls = true).over(back)
      val nextQ = first(col("qc"), ignoreNulls = true).over(fwd)
      val nextRn = first(when(col("qc").isNotNull, col("rn")),
        ignoreNulls = true).over(fwd)
      val cents = when(col("qc").isNotNull, col("qc").cast("double"))
        .when(prevQ.isNull || nextQ.isNull, lit(null))
        .otherwise(prevQ.cast("double") +
          ((nextQ - prevQ).cast("double") * (col("rn") - prevRn).cast("double"))
            / (nextRn - prevRn).cast("double"))
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("ts"),
          when(col("event_type") === "purchase",
            (dec2(col("value")) * 100).cast("long")).as("qc"))
        .withColumn("rn", row_number().over(base))
        .select(col("event_id"), col("user_id"),
          when(col("qc").isNotNull, 1L).otherwise(0L).as("is_observed"),
          (cents / lit(100.0)).as("filled"))
        .orderBy("event_id")
    }),

    // maximum drawdown per user — the risk-metric window composition:
    // running balance (exact decimal cumulative purchase revenue),
    // running peak (cumulative MAX of that), drawdown = peak − balance,
    // then one keyed reduce for the per-user maximum. Both windows and
    // the final agg ride ONE user_id exchange; all arithmetic stays
    // DECIMAL until the output cast, so the result is aggregation-order
    // independent.
    "win_drawdown" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // signed P&L series: purchases credit, errors debit (a refund
      // proxy) — a monotone series would have zero drawdown everywhere
      val bal = sum(when(col("event_type") === "purchase", dec2(col("value")))
        .when(col("event_type") === "error", -dec2(col("value")))
        .otherwise(dec2(lit(0.0)))).over(w)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("ts"),
          col("event_type"), col("value"))
        .withColumn("bal", bal)
        .withColumn("peak", max(col("bal")).over(w))
        .groupBy("user_id")
        .agg(max(col("bal")).cast("double").as("peak_balance"),
          max(col("peak") - col("bal")).cast("double").as("max_drawdown"))
        .orderBy("user_id")
    }),

    // time-series resampling to a fixed daily grid: one row per (user,
    // calendar day) between the user's first and last activity — gap
    // days materialized with n_events = 0 — with the day's exact
    // purchase revenue and its LOCF carry-forward. The grid generation
    // is a per-user sequence() explode (bounded by each user's own
    // span, never a global calendar crossJoin); the daily rollup
    // map-side combines before its (user, day) shuffle; the LOCF rides
    // the same user partitioning. Completes the series toolkit:
    // win_fill_forward (sparse LOCF), win_interpolate (two-sided
    // linear), ts_resample (grid + fill).
    "ts_resample" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day"),
          col("event_type"), col("value"))
      val grid = ev.groupBy("user_id")
        .agg(min("day").as("d0"), max("day").as("d1"))
        .select(col("user_id"),
          explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
      val daily = ev.groupBy("user_id", "day")
        .agg(count(lit(1)).as("n_ev"),
          sum(when(col("event_type") === "purchase", dec2(col("value"))))
            .as("rev_d"))
      val w = Window.partitionBy("user_id").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(daily, Seq("user_id", "day"), "left")
        .select(col("user_id"),
          col("day").cast("timestamp").as("day_ts"),
          coalesce(col("n_ev"), lit(0L)).as("n_events"),
          col("rev_d").cast("double").as("day_rev"),
          last(col("rev_d"), ignoreNulls = true).over(w).cast("double")
            .as("rev_locf"))
        .orderBy("user_id", "day_ts")
    }),

    // forecasting feature matrix: per-user daily revenue with calendar
    // lag-1d / lag-7d and a rolling-7-day sum/mean — the standard
    // feature block in front of any demand model. RANGE frames over the
    // integer day number make every feature CALENDAR-correct under gaps
    // (a ROWS frame would silently read "7 observations" as "7 days");
    // no grid explode is needed, so sparse users cost only their
    // observed rows. Revenue sums ride the dec2 exactness discipline;
    // every window shares ONE user_id partitioning — a single shuffle
    // at any scale.
    "ts_lag_features" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("user_id"),
          datediff(to_date(col("ts")), lit("2024-01-01").cast("date"))
            .cast("long").as("day"))
        .agg(sum(dec2(col("value"))).as("rev"), count(lit(1)).as("n_ev"))
      def rng(lo: Long, hi: Long) = Window.partitionBy("user_id")
        .orderBy("day").rangeBetween(lo, hi)
      daily.select(col("user_id"), col("day"),
          col("rev").cast("double").as("rev"),
          col("n_ev"),
          sum("rev").over(rng(-1, -1)).cast("double").as("lag1_rev"),
          sum("rev").over(rng(-7, -7)).cast("double").as("lag7_rev"),
          sum("rev").over(rng(-6, 0)).cast("double").as("roll7_rev"),
          (sum("rev").over(rng(-6, 0)).cast("double") /
            count(lit(1)).over(rng(-6, 0)).cast("double"))
            .as("roll7_mean"))
        .orderBy("user_id", "day")
    }),

    // Bollinger-style volatility bands per user: rolling 7-day mean ±2σ
    // of daily revenue with a breakout flag — the anomaly gate that
    // adapts to each entity's own volatility (validate_anomaly's global
    // z-score can't). The breakout decision is EXACT-INTEGER: x > μ+2σ
    // ⟺ d > 0 ∧ d² > 4M with d = x·n−Σx and M = n·Σx²−(Σx)² (both
    // integers) — no float boundary can flip between engines; the
    // reported mean/sd are quantized doubles for reading. Moments ride
    // the same single user_id RANGE frame family as ts_lag_features.
    "win_bollinger" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("user_id"),
          datediff(to_date(col("ts")), lit("2024-01-01").cast("date"))
            .cast("long").as("day"))
        .agg((sum(dec2(col("value"))) * 100).cast(LongType).as("cents"))
      val w = Window.partitionBy("user_id").orderBy("day")
        .rangeBetween(-6, 0)
      val m = daily
        .withColumn("n", count(lit(1)).over(w))
        .withColumn("sx", sum("cents").over(w))
        .withColumn("sxx", sum(col("cents") * col("cents")).over(w))
      val dDev = col("cents") * col("n") - col("sx")
      val mBig = col("n") * col("sxx") - col("sx") * col("sx")
      m.select(col("user_id"), col("day"),
          (col("cents").cast(DoubleType) / 100.0).as("rev"),
          col("n").as("n_days"),
          (floor(col("sx").cast(DoubleType) / col("n").cast(DoubleType)
            + 0.5) / 100.0).as("mean"),
          (floor(sqrt(mBig.cast(DoubleType)) / col("n").cast(DoubleType)
            * 100.0 + 0.5) / 10000.0).as("sd"),
          when(dDev > 0 && dDev * dDev > mBig * 4, 1L).otherwise(0L)
            .as("is_breakout"))
        .orderBy("user_id", "day")
    }),

    // forecast backtest: MAE/MAPE of the naive (yesterday) and
    // seasonal-naive (last week) forecasters on the daily revenue
    // series — the baseline every forecasting model must beat before it
    // ships, and the health check that catches a silently-degrading
    // model (its error creeping toward naive's). Forecasts come from
    // the same calendar RANGE frames ts_lag_features uses; errors are
    // exact integer cents, MAPE terms quantized per day (PSI
    // discipline). Output: one row per method.
    "ts_backtest_naive" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(datediff(to_date(col("ts")),
          lit("2024-01-01").cast("date")).cast("long").as("day"))
        .agg((sum(dec2(col("value"))) * 100).cast(LongType).as("cents"))
      def rng(lag: Long) = Window.orderBy("day").rangeBetween(lag, lag)
      val f = daily
        .withColumn("f1", sum("cents").over(rng(-1)))
        .withColumn("f7", sum("cents").over(rng(-7)))
      def metrics(fc: Column, label: String) = {
        val err = abs(col("cents") - fc)
        val mapeT = floor(err.cast(DoubleType) /
          col("cents").cast(DoubleType) * 1e6 + 0.5).cast(LongType)
        f.where(fc.isNotNull && col("cents") > 0)
          .agg(count(lit(1)).as("n_days"),
            sum(err).as("sae"), sum(mapeT).as("smape"))
          .select(lit(label).as("method"), col("n_days"),
            (col("sae").cast(DoubleType) / col("n_days").cast(DoubleType)
              / 100.0).as("mae"),
            (col("smape").cast(DoubleType) / col("n_days").cast(DoubleType)
              / 1e6).as("mape"))
      }
      metrics(col("f1"), "naive")
        .unionByName(metrics(col("f7"), "seasonal_naive"))
        .orderBy("method")
    }),

    // classical additive seasonal decomposition of the daily revenue
    // series: x = trend + seasonal + residual — the readout that
    // separates "we grew" from "it was Saturday" before any forecast
    // or anomaly judgment. Trend = centered 7-day rolling mean
    // (defined only where the calendar RANGE frame holds all 7 days —
    // edges NULL, never a partial-window lie); seasonal = per-weekday
    // mean of the detrended series; residual = what neither explains.
    // Determinism: the detrended value dev7 = x·7 − Σ7 stays an EXACT
    // integer (no division until the final readouts, the win_cusum
    // deviation trick); weekday = day-number % 7 (both engines'
    // dayofweek() disagree on week start — the modulo is portable).
    // Scale: the frame is the calendar-bounded daily series (O(days)
    // at any corpus size); seasonal is a broadcast ≤7-row join.
    "ts_seasonal_decompose" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(datediff(to_date(col("ts")),
          lit("2024-01-01").cast("date")).cast("long").as("day"))
        .agg((sum(dec2(col("value"))) * 100).cast(LongType).as("cents"))
      val w7 = Window.orderBy("day").rangeBetween(-3, 3)
      val t = daily
        .withColumn("s7", sum("cents").over(w7))
        .withColumn("c7", count(lit(1)).over(w7))
        .withColumn("dev7",
          when(col("c7") === 7, col("cents") * 7 - col("s7")))
        .withColumn("wd", pmod(col("day"), lit(7L)))
      val seas = t.where(col("dev7").isNotNull)
        .groupBy("wd").agg(sum("dev7").as("sd"), count(lit(1)).as("nd"))
        .select(col("wd"),
          (floor(col("sd").cast(DoubleType) / col("nd").cast(DoubleType)
            / 700.0 * 1e4 + 0.5) / 1e4).as("seasonal"))
      t.join(broadcast(seas), Seq("wd"), "left")
        .select(col("day"),
          (col("cents").cast(DoubleType) / 100.0).as("revenue"),
          when(col("c7") === 7, col("s7").cast(DoubleType) / 700.0)
            .as("trend"),
          col("seasonal"),
          when(col("dev7").isNotNull && col("seasonal").isNotNull,
            floor((col("dev7").cast(DoubleType) / 700.0 - col("seasonal"))
              * 1e4 + 0.5) / 1e4).as("residual"))
        .orderBy("day")
    }),

    // rolling 7-day OLS trend per user: the slope of daily revenue on
    // the day index inside a calendar RANGE frame — the per-entity
    // trend detector a monitoring pipeline runs (positive slope =
    // growing spend). All five OLS moments (n, Σd, Σy, Σdy, Σd²) are
    // exact integer sums over ONE shared user_id+day frame; the slope
    // is a single closed-form division, null when the window holds one
    // day (denominator 0 — no trend from one point). Cents ride the
    // dec2 discipline.
    "win_rolling_slope" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("user_id"),
          datediff(to_date(col("ts")), lit("2024-01-01").cast("date"))
            .cast("long").as("day"))
        .agg((sum(dec2(col("value"))) * 100).cast(LongType).as("cents"))
      val w = Window.partitionBy("user_id").orderBy("day")
        .rangeBetween(-6, 0)
      val m = daily
        .withColumn("n", count(lit(1)).over(w))
        .withColumn("sd", sum("day").over(w))
        .withColumn("sy", sum("cents").over(w))
        .withColumn("sdy", sum(col("day") * col("cents")).over(w))
        .withColumn("sdd", sum(col("day") * col("day")).over(w))
      val den = col("n") * col("sdd") - col("sd") * col("sd")
      val slope = (col("n") * col("sdy") - col("sd") * col("sy"))
        .cast(DoubleType) / den.cast(DoubleType)
      m.select(col("user_id"), col("day"),
          (col("cents").cast(DoubleType) / 100.0).as("rev"),
          col("n").as("n_days"),
          when(den =!= 0,
            floor(slope * 1e6 + 0.5) / 1e6 / 100.0).as("slope"))
        .orderBy("user_id", "day")
    }),

    // CUSUM change-point chart over the daily revenue series — "WHEN did
    // the level shift?" (the sequel to stream_drift's "did it shift?").
    // The textbook recurrence s_t = max(0, s_{t-1} + dev_t) is NOT
    // window-expressible, but its closed form is: s_t = P_t − min_{j≤t}
    // P_j with P the prefix sum of deviations — two frames over ONE
    // ordering. Everything runs ×D (day count) in exact integer cents:
    // dev_t = x_t·D − T needs no division, and the 2σ alarm threshold
    // compares integers against ⌊2·√(sx2·D − T²)⌋ (= 2Dσ scaled), ONE
    // sqrt of an exactly-determined integer — no float boundary can
    // disagree between engines. The windows run on the calendar-bounded
    // daily frame (30 rows here, ≤ 36 525/century anywhere) — the
    // validate_anomaly second-level precedent, never a row-scale sort.
    // Long headroom: sx2·D tops out ~2⁶² at ~10⁹ cents/day × 10⁴ days.
    "win_cusum" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("day"))
        .agg((sum(dec2(col("value"))) * 100).cast(LongType).as("cents"))
      // the closed-form statistic comes from the shared core
      // (StatsOps.cusumCore — also GraftApi.cusum); the chart adds the
      // 2σ alarm threshold from one extra broadcast moment aggregate
      val scored = graft.operators.StatsOps
        .cusumCore(daily, col("day"), col("cents"))
      val thr = daily.agg(count(lit(1)).as("dd"), sum("cents").as("t"),
          sum(col("cents") * col("cents")).as("sx2"))
        .select(floor(
          sqrt((col("sx2") * col("dd") - col("t") * col("t"))
            .cast(DoubleType)) * 2.0 + 0.5).cast(LongType).as("thr"))
      scored.crossJoin(broadcast(thr))
        .select(col("ord").cast("timestamp").as("day_ts"),
          (col("x").cast(DoubleType) / 100.0).as("rev"),
          (col("cusum_scaled").cast(DoubleType) / col("nn").cast(DoubleType)
            / 100.0).as("cusum"),
          when(col("cusum_scaled") > col("thr"), 1L).otherwise(0L)
            .as("is_alarm"))
        .orderBy("day_ts")
    }),

    // gaps-and-islands: per-user runs of CONSECUTIVE active days (the
    // classic streak computation). day − row_number() is constant within
    // a run, so one (user, day)-distinct pass + one user-partitioned
    // window + two keyed aggs do it — no self-join, no sequence explode.
    // At 100 TB every stage rides the user_id partitioning.
    "win_gap_islands" -> ((s, d) => {
      val days = Tables.events(s, d)
        .select(col("user_id"),
          datediff(to_date(col("ts")), lit("2024-01-01").cast("date"))
            .cast("long").as("day"))
        .distinct()
      val w = Window.partitionBy("user_id").orderBy("day")
      days
        .withColumn("grp", col("day") - row_number().over(w))
        .groupBy("user_id", "grp")
        .agg(count(lit(1)).as("len"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_streaks"), max("len").as("longest_streak"))
        .orderBy("user_id")
    })
  )

  /** generated ewma oracle: the 20-term lag/shift chain, emitted by the
    * same loop bounds the Spark chain uses. */
  private val duckEwma: String = {
    val lags = (1 until 20).map(k => s"LAG(q, $k) OVER w AS q$k")
      .mkString(",\n    ")
    val terms = "q" +: (1 until 20).map(k => s"COALESCE((q$k >> $k), 0)")
    s"""WITH b AS (SELECT event_id, user_id, ts,
       |    CAST(CAST(value AS DECIMAL(18,2)) * 1000000 AS BIGINT) AS q
       |  FROM events),
       |l AS (SELECT event_id, user_id, q,
       |    $lags
       |  FROM b WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |m AS (SELECT event_id, user_id,
       |    ${terms.mkString(" + ")} AS ewma_micro
       |  FROM l)
       |SELECT event_id, user_id, CAST(ewma_micro AS BIGINT) AS ewma_micro,
       |  CAST(ewma_micro AS DOUBLE) / 1000000.0 AS ewma
       |FROM m ORDER BY event_id""".stripMargin
  }

  override def oracles: Map[String, String] = Map(
    "win_drawdown" ->
      """WITH b AS (SELECT event_id, user_id, ts,
        |    SUM(CASE WHEN event_type = 'purchase'
        |          THEN CAST(value AS DECIMAL(18,2))
        |        WHEN event_type = 'error'
        |          THEN -CAST(value AS DECIMAL(18,2))
        |        ELSE CAST(0.0 AS DECIMAL(18,2)) END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bal
        |  FROM events),
        |p AS (SELECT user_id, bal,
        |    MAX(bal) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
        |  FROM b)
        |SELECT user_id, CAST(MAX(bal) AS DOUBLE) AS peak_balance,
        |  CAST(MAX(peak - bal) AS DOUBLE) AS max_drawdown
        |FROM p GROUP BY user_id ORDER BY user_id""".stripMargin,
    "ts_resample" ->
      """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day, event_type,
        |    value FROM events),
        |b AS (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM ev
        |  GROUP BY user_id),
        |g AS (SELECT user_id, CAST(gs AS DATE) AS day
        |  FROM b, unnest(generate_series(CAST(d0 AS TIMESTAMP),
        |    CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS u(gs)),
        |dly AS (SELECT user_id, day, COUNT(*) AS n_ev,
        |    SUM(CASE WHEN event_type = 'purchase'
        |      THEN CAST(value AS DECIMAL(18,2)) END) AS rev_d
        |  FROM ev GROUP BY 1, 2)
        |SELECT g.user_id, CAST(g.day AS TIMESTAMP) AS day_ts,
        |  COALESCE(n_ev, 0) AS n_events,
        |  CAST(rev_d AS DOUBLE) AS day_rev,
        |  CAST(LAST_VALUE(rev_d IGNORE NULLS) OVER (
        |    PARTITION BY g.user_id ORDER BY g.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS rev_locf
        |FROM g LEFT JOIN dly ON g.user_id = dly.user_id AND g.day = dly.day
        |ORDER BY g.user_id, day_ts""".stripMargin,
    "ts_lag_features" ->
      """WITH dly AS (SELECT user_id,
        |    CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
        |      AS BIGINT) AS day,
        |    SUM(CAST(value AS DECIMAL(18,2))) AS rev,
        |    COUNT(*) AS n_ev
        |  FROM events GROUP BY 1, 2)
        |SELECT user_id, day, CAST(rev AS DOUBLE) AS rev, n_ev,
        |  CAST(SUM(rev) OVER (PARTITION BY user_id ORDER BY day
        |    RANGE BETWEEN 1 PRECEDING AND 1 PRECEDING) AS DOUBLE)
        |    AS lag1_rev,
        |  CAST(SUM(rev) OVER (PARTITION BY user_id ORDER BY day
        |    RANGE BETWEEN 7 PRECEDING AND 7 PRECEDING) AS DOUBLE)
        |    AS lag7_rev,
        |  CAST(SUM(rev) OVER (PARTITION BY user_id ORDER BY day
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS roll7_rev,
        |  CAST(SUM(rev) OVER (PARTITION BY user_id ORDER BY day
        |      RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    / CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY day
        |      RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS roll7_mean
        |FROM dly ORDER BY user_id, day""".stripMargin,
    "win_bollinger" ->
      """WITH dly AS (SELECT user_id,
        |    CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
        |      AS BIGINT) AS day,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
        |      AS cents
        |  FROM events GROUP BY 1, 2),
        |m AS (SELECT user_id, day, cents,
        |    COUNT(*) OVER w AS n,
        |    CAST(SUM(cents) OVER w AS BIGINT) AS sx,
        |    CAST(SUM(cents * cents) OVER w AS BIGINT) AS sxx
        |  FROM dly
        |  WINDOW w AS (PARTITION BY user_id ORDER BY day
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW))
        |SELECT user_id, day,
        |  CAST(cents AS DOUBLE) / 100.0 AS rev,
        |  n AS n_days,
        |  floor(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) + 0.5) / 100.0
        |    AS mean,
        |  floor(sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) / CAST(n AS DOUBLE)
        |    * 100.0 + 0.5) / 10000.0 AS sd,
        |  CAST(CASE WHEN cents * n - sx > 0
        |    AND (cents * n - sx) * (cents * n - sx)
        |      > (n * sxx - sx * sx) * 4
        |    THEN 1 ELSE 0 END AS BIGINT) AS is_breakout
        |FROM m ORDER BY user_id, day""".stripMargin,
    "ts_seasonal_decompose" ->
      """WITH dly AS (SELECT
        |    CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
        |      AS BIGINT) AS day,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
        |      AS cents
        |  FROM events GROUP BY 1),
        |t AS (SELECT day, cents,
        |    CAST(SUM(cents) OVER w AS BIGINT) AS s7,
        |    COUNT(*) OVER w AS c7,
        |    day % 7 AS wd
        |  FROM dly
        |  WINDOW w AS (ORDER BY day
        |    RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |t2 AS (SELECT *,
        |    CASE WHEN c7 = 7 THEN cents * 7 - s7 END AS dev7 FROM t),
        |seas AS (SELECT wd,
        |    floor(CAST(SUM(dev7) AS DOUBLE) / CAST(COUNT(dev7) AS DOUBLE)
        |      / 700.0 * 10000 + 0.5) / 10000 AS seasonal
        |  FROM t2 WHERE dev7 IS NOT NULL GROUP BY wd)
        |SELECT t2.day, CAST(t2.cents AS DOUBLE) / 100.0 AS revenue,
        |  CASE WHEN c7 = 7 THEN CAST(s7 AS DOUBLE) / 700.0 END AS trend,
        |  seas.seasonal,
        |  CASE WHEN dev7 IS NOT NULL AND seas.seasonal IS NOT NULL THEN
        |    floor((CAST(dev7 AS DOUBLE) / 700.0 - seas.seasonal)
        |      * 10000 + 0.5) / 10000 END AS residual
        |FROM t2 LEFT JOIN seas ON seas.wd = t2.wd
        |ORDER BY day""".stripMargin,
    "ts_backtest_naive" ->
      """WITH dly AS (SELECT
        |    CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
        |      AS BIGINT) AS day,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
        |      AS cents
        |  FROM events GROUP BY 1),
        |f AS (SELECT day, cents,
        |    CAST(SUM(cents) OVER (ORDER BY day
        |      RANGE BETWEEN 1 PRECEDING AND 1 PRECEDING) AS BIGINT) AS f1,
        |    CAST(SUM(cents) OVER (ORDER BY day
        |      RANGE BETWEEN 7 PRECEDING AND 7 PRECEDING) AS BIGINT) AS f7
        |  FROM dly),
        |m1 AS (SELECT 'naive' AS method, COUNT(*) AS n_days,
        |    CAST(SUM(abs(cents - f1)) AS BIGINT) AS sae,
        |    CAST(SUM(CAST(floor(CAST(abs(cents - f1) AS DOUBLE)
        |      / CAST(cents AS DOUBLE) * 1e6 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS smape
        |  FROM f WHERE f1 IS NOT NULL AND cents > 0),
        |m7 AS (SELECT 'seasonal_naive' AS method, COUNT(*) AS n_days,
        |    CAST(SUM(abs(cents - f7)) AS BIGINT) AS sae,
        |    CAST(SUM(CAST(floor(CAST(abs(cents - f7) AS DOUBLE)
        |      / CAST(cents AS DOUBLE) * 1e6 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS smape
        |  FROM f WHERE f7 IS NOT NULL AND cents > 0),
        |u AS (SELECT * FROM m1 UNION ALL SELECT * FROM m7)
        |SELECT method, n_days,
        |  CAST(sae AS DOUBLE) / CAST(n_days AS DOUBLE) / 100.0 AS mae,
        |  CAST(smape AS DOUBLE) / CAST(n_days AS DOUBLE) / 1e6 AS mape
        |FROM u ORDER BY method""".stripMargin,
    "win_rolling_slope" ->
      """WITH dly AS (SELECT user_id,
        |    CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
        |      AS BIGINT) AS day,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
        |      AS cents
        |  FROM events GROUP BY 1, 2),
        |m AS (SELECT user_id, day, cents,
        |    COUNT(*) OVER w AS n,
        |    CAST(SUM(day) OVER w AS BIGINT) AS sd,
        |    CAST(SUM(cents) OVER w AS BIGINT) AS sy,
        |    CAST(SUM(day * cents) OVER w AS BIGINT) AS sdy,
        |    CAST(SUM(day * day) OVER w AS BIGINT) AS sdd
        |  FROM dly
        |  WINDOW w AS (PARTITION BY user_id ORDER BY day
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW))
        |SELECT user_id, day,
        |  CAST(cents AS DOUBLE) / 100.0 AS rev,
        |  n AS n_days,
        |  CASE WHEN n * sdd - sd * sd <> 0 THEN
        |    floor(CAST(n * sdy - sd * sy AS DOUBLE)
        |      / CAST(n * sdd - sd * sd AS DOUBLE) * 1e6 + 0.5) / 1e6
        |      / 100.0
        |  END AS slope
        |FROM m ORDER BY user_id, day""".stripMargin,
    "win_cusum" ->
      """WITH dly AS (SELECT CAST(ts AS DATE) AS day,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
        |      AS cents
        |  FROM events GROUP BY 1),
        |tot AS (SELECT COUNT(*) AS dd, CAST(SUM(cents) AS BIGINT) AS t,
        |    CAST(SUM(cents * cents) AS BIGINT) AS sx2 FROM dly),
        |j AS (SELECT day, cents, dd, t, sx2,
        |    cents * dd - t AS dev FROM dly, tot),
        |p AS (SELECT *, CAST(SUM(dev) OVER (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS pf FROM j),
        |c AS (SELECT *, pf - least(CAST(MIN(pf) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT),
        |      0) AS cusum_s,
        |    CAST(floor(sqrt(CAST(sx2 * dd - t * t AS DOUBLE)) * 2.0 + 0.5)
        |      AS BIGINT) AS thr
        |  FROM p)
        |SELECT CAST(day AS TIMESTAMP) AS day_ts,
        |  CAST(cents AS DOUBLE) / 100.0 AS rev,
        |  CAST(cusum_s AS DOUBLE) / CAST(dd AS DOUBLE) / 100.0 AS cusum,
        |  CAST(CASE WHEN cusum_s > thr THEN 1 ELSE 0 END AS BIGINT)
        |    AS is_alarm
        |FROM c ORDER BY day_ts""".stripMargin,
    "win_ewma" -> duckEwma,
    "win_interpolate" ->
      """WITH b AS (SELECT event_id, user_id, ts,
        |    CASE WHEN event_type = 'purchase'
        |      THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
        |    END AS qc,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS rn
        |  FROM events),
        |f AS (SELECT event_id, user_id, qc, rn,
        |    LAST_VALUE(qc IGNORE NULLS) OVER wb AS pq,
        |    LAST_VALUE(CASE WHEN qc IS NOT NULL THEN rn END IGNORE NULLS)
        |      OVER wb AS prn,
        |    FIRST_VALUE(qc IGNORE NULLS) OVER wf AS nq,
        |    FIRST_VALUE(CASE WHEN qc IS NOT NULL THEN rn END IGNORE NULLS)
        |      OVER wf AS nrn
        |  FROM b
        |  WINDOW wb AS (PARTITION BY user_id ORDER BY rn
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    wf AS (PARTITION BY user_id ORDER BY rn
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT event_id, user_id,
        |  CAST(CASE WHEN qc IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
        |    AS is_observed,
        |  (CASE WHEN qc IS NOT NULL THEN CAST(qc AS DOUBLE)
        |        WHEN pq IS NULL OR nq IS NULL THEN NULL
        |        ELSE CAST(pq AS DOUBLE)
        |          + (CAST(nq - pq AS DOUBLE) * CAST(rn - prn AS DOUBLE))
        |            / CAST(nrn - prn AS DOUBLE)
        |   END) / 100.0 AS filled
        |FROM f ORDER BY event_id""".stripMargin,
    "win_abc_pareto" ->
      """WITH rev AS (SELECT l_returnflag, l_suppkey,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
        |  FROM lineitem GROUP BY 1, 2),
        |r AS (SELECT l_returnflag, l_suppkey,
        |    CAST(rev AS DOUBLE) AS revenue,
        |    CAST(ROW_NUMBER() OVER w AS BIGINT) AS rk,
        |    CAST(SUM(rev) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
        |        AND CURRENT ROW) AS DOUBLE)
        |      / CAST(SUM(rev) OVER (PARTITION BY l_returnflag) AS DOUBLE)
        |      AS cum_share
        |  FROM rev
        |  WINDOW w AS (PARTITION BY l_returnflag ORDER BY rev DESC, l_suppkey))
        |SELECT l_returnflag, l_suppkey, revenue, rk, cum_share,
        |  CASE WHEN cum_share <= 0.80 THEN 'A'
        |       WHEN cum_share <= 0.95 THEN 'B'
        |       ELSE 'C' END AS abc_class
        |FROM r ORDER BY l_returnflag, rk""".stripMargin,
    "win_running_distinct" ->
      """SELECT event_id, user_id,
        |  CAST(SUM(first_flag) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS distinct_types_so_far
        |FROM (SELECT event_id, user_id, ts,
        |        CASE WHEN ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |               ORDER BY ts, event_id) = 1 THEN 1 ELSE 0 END
        |          AS first_flag
        |      FROM events) t
        |ORDER BY event_id""".stripMargin,
    "win_gap_islands" ->
      """WITH days AS (SELECT DISTINCT user_id,
        |    date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day
        |  FROM events),
        |runs AS (SELECT user_id,
        |    day - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS grp
        |  FROM days),
        |islands AS (SELECT user_id, grp, COUNT(*) AS len
        |  FROM runs GROUP BY user_id, grp)
        |SELECT user_id, COUNT(*) AS n_streaks, MAX(len) AS longest_streak
        |FROM islands GROUP BY user_id ORDER BY user_id""".stripMargin,
    "win_rank" ->
      """SELECT o_orderkey, o_custkey,
        |  ROW_NUMBER() OVER w AS rn, RANK() OVER w AS rnk,
        |  DENSE_RANK() OVER w AS drnk, NTILE(4) OVER w AS quartile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,
    "win_topk_group" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "win_lag_lead" ->
      """SELECT event_id, user_id,
        |  COALESCE(LAG(event_id, 1) OVER w, -1) AS prev_id,
        |  COALESCE(LEAD(event_id, 1) OVER w, -1) AS next_id,
        |  COALESCE(date_diff('second', LAG(ts, 1) OVER w, ts), -1) AS gap_s
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin,
    "win_running" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_total
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "win_cume" ->
      """SELECT o_orderkey, o_custkey,
        |  PERCENT_RANK() OVER w AS pr, CUME_DIST() OVER w AS cd,
        |  FIRST_VALUE(o_orderkey) OVER wf AS cheapest_key,
        |  LAST_VALUE(o_orderkey) OVER wf AS priciest_key,
        |  NTH_VALUE(o_orderkey, 2) OVER wf AS second_key
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey),
        |  wf AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_orderkey""".stripMargin,
    "win_fill_forward" ->
      """SELECT event_id, user_id,
        |  last_value(CASE WHEN event_type = 'purchase' THEN value END
        |             IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
        |FROM events ORDER BY event_id""".stripMargin,
    "win_ntile" ->
      """SELECT doc_id, lang,
        |  CAST(NTILE(4) OVER (PARTITION BY lang ORDER BY doc_id) AS BIGINT)
        |    AS quartile
        |FROM documents ORDER BY doc_id""".stripMargin,
    "win_range_frame" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate
        |    RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW
        |  ) AS DOUBLE) AS spend_30d
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "win_moving_avg" ->
      """SELECT event_id,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
        |    / COUNT(1) OVER w AS mov_avg
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin
  )
}
