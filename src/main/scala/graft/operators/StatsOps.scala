package graft.operators

import graft.{Det, Q, QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** §2 round-7 statistics wave: hypothesis tests, drift indices and
  * concentration / distribution-fit profiling — the readouts a curation
  * pipeline runs on every shard before and after a filter change.
  *
  * Determinism discipline (SURVEY §5.3, agg_entropy precedent): every
  * transcendental (ln) is quantized to an exact integer once per input
  * row/bin (`floor(x·S + 0.5)` as BIGINT), all sums over quantized terms
  * are exact integer/decimal arithmetic (order-insensitive under any
  * partial-aggregation split), and the final statistic is one double
  * expression over exactly-determined operands, quantized once more on
  * output. DuckDB replays the identical arithmetic, so hashes match
  * bit-for-bit.
  *
  * Scale shape: none of these queries ranks the raw corpus. The
  * Mann–Whitney ranking is value-compacted (grouped by the 2-dp
  * quantized value first — the frame entering the global cumulative
  * window is bounded by the value range, ≤ ~56 k rows at ANY corpus
  * size, the agg_weighted_percentile discipline); PSI reduces to 10
  * fixed bins map-side; Gini's window is partitioned per segment and
  * runs on per-customer aggregates; the Zipf fit ranks only the top-N
  * spectrum head via TakeOrderedAndProject (constant-size at any
  * corpus scale — the full vocabulary never feeds one task).
  */
object StatsOps extends QueryModule {
  /** output quantization for test statistics (1e-4: agg_entropy's). */
  private val StatScale = 1e4
  /** per-term ln quantization (1e-6 keeps 6 significant decimals; terms
    * are summed exactly as integers afterwards). */
  private val LnScale = 1e6

  /** text_zipf fits the slope on the top-N head of the frequency
    * spectrum — constant-size regardless of corpus scale (the full
    * vocabulary is O(10⁸⁺) at 100 TB and must never feed one task). */
  private[graft] val ZipfHeadN = 2000

  /** THE 2-dp value quantizer the value-compacted rank frames ride
    * (profile_mannwhitney here; agg_weighted_percentile's cent twin is
    * AggOps.centQuant). The compaction contract: output cardinality ≤
    * 100·(value range)+1 REGARDLESS of corpus size — what keeps the
    * unpartitioned cumulative window legal at 100 TB. StatsSpec pins
    * the bound on a synthetic 200k-distinct-value input, so switching
    * to a finer or unbounded quantization (raw micros, ppm) fails the
    * TEST, not production (VERDICT r7 "what's wrong" #2). */
  private[graft] def quant2dp(v: Column): Column = floor(v * 100 + 0.5)

  /** Shared Laplace-smoothed PSI term, quantized (the ONE definition —
    * profile_psi, stream_drift and GraftApi.psi all replay it):
    * ⌊(p−q)·ln(p/q)·10⁶+½⌋ with p=(n+1)/(tot+nBins), q=(nb+1)/(tb+nBins).
    * Callers must feed the FULL bin grid (bins empty on both sides
    * still contribute a nonzero term whenever tot ≠ tb — dropping them
    * understates PSI; round-7b review finding). */
  private[graft] def psiTerm(n: Column, tot: Column, nb: Column,
      tb: Column, nBins: Int): Column = {
    val p = (n + 1).cast(DoubleType) / (tot + nBins).cast(DoubleType)
    val q = (nb + 1).cast(DoubleType) / (tb + nBins).cast(DoubleType)
    floor((p - q) * log(p / q) * LnScale + 0.5).cast(LongType)
  }

  /** Frame-parametric Mann–Whitney core (bound by profile_mannwhitney,
    * re-exposed by GraftApi.mannWhitney): value-compacted exact rank
    * algebra; z is NULL when varU = 0 (all values tied, or an empty
    * arm) — Spark would emit NaN where DuckDB NULLs, so the guard IS
    * the cross-engine contract. `value` must already be integer-
    * quantized. */
  private[graft] def mannWhitneyCore(df: DataFrame, isTreatment: Column,
      value: Column): DataFrame = {
    val ev = df.select(when(isTreatment, 1L).otherwise(0L).as("g"),
      value.cast(LongType).as("iv"))
    val byV = ev.groupBy("iv").agg(sum("g").as("t1"), count(lit(1)).as("t"))
    val w = Window.orderBy("iv")
    val ranked = byV.withColumn("before", coalesce(
      sum("t").over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val g = ranked.agg(
      sum("t1").as("n1"), (sum("t") - sum("t1")).as("n2"),
      sum(col("t1") * (col("before") * 2 + col("t") + 1)).as("r1x2"),
      sum(col("t") * col("t") * col("t") - col("t")).as("ties"))
    val n1 = col("n1").cast(DoubleType)
    val n2 = col("n2").cast(DoubleType)
    val n = n1 + n2
    val u1x2 = col("r1x2") - col("n1") * (col("n1") + 1)
    val varU = n1 * n2 / 12.0 *
      ((n + 1) - col("ties").cast(DoubleType) / (n * (n - 1)))
    val z = (u1x2.cast(DoubleType) - n1 * n2) / (sqrt(varU) * 2.0)
    // n1 > 0 ∧ n2 > 0 first: with a single pooled row varU is 0/0 →
    // Spark NaN, and NaN > 0 is TRUE in Spark (z would read 0.0) while
    // DuckDB's NULL comparison stays NULL — the extra conjuncts make
    // the NULL contract hold on both engines for every degenerate input
    g.select(col("n1"), col("n2"),
      (u1x2.cast(DoubleType) / 2.0).as("u1"),
      when(col("n1") > 0 && col("n2") > 0 && varU > 0,
        floor(z * StatScale + 0.5) / StatScale).as("z"))
  }

  /** Frame-parametric Gini core (bound by agg_gini, re-exposed by
    * GraftApi.gini): closed form on the ascending per-entity sort;
    * decimal sums (Σi·cents overflows BIGINT near 10⁹ entities/group);
    * NULL when the group's total is 0 (Gini of nothing is undefined —
    * Spark NaN vs DuckDB NULL otherwise). Output: (g, n, s, gini). */
  private[graft] def giniCore(df: DataFrame, group: Column, cents: Column,
      id: Column): DataFrame = {
    val x = df.select(group.as("g"), cents.as("c"), id.as("i"))
    val w = Window.partitionBy("g").orderBy("c", "i")
    x.withColumn("r", row_number().over(w).cast(LongType))
      .groupBy("g").agg(count(lit(1)).as("n"),
        sum(col("c").cast(DecimalType(38, 0))).as("s"),
        sum((col("r") * col("c")).cast(DecimalType(38, 0))).as("s1"))
      .select(col("g"), col("n"), col("s"),
        when(col("s") =!= 0,
          floor((col("s1") * 2 - (col("n") + 1) * col("s")).cast(DoubleType)
            / (col("n") * col("s")).cast(DoubleType) * LnScale + 0.5)
            / LnScale).as("gini"))
  }

  /** Frame-parametric Kaplan–Meier core over a (t, dead) subject frame
    * (bound by agg_survival, re-exposed by GraftApi.kaplanMeier).
    * Extinction is handled explicitly: a step where EVERY at-risk
    * subject dies (d = n) sends S to exactly 0 — ln(1−d/n) would be
    * ln(0), which Spark NULLs (silently dropping the −∞ term) and
    * DuckDB hard-errors on; the `extinct` running flag is the shared
    * contract (survival 0.0, log_surv NULL from that step on). */
  private[graft] def kaplanMeierCore(subj: DataFrame): DataFrame = {
    val byT = subj.groupBy("t").agg(
      sum("dead").as("d"), (count(lit(1)) - sum("dead")).as("c"))
    val wRev = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFwd = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val atRisk = byT
      .withColumn("n_risk", sum(col("d") + col("c")).over(wRev))
    val lnTerm = when(col("d") > 0 && col("d") < col("n_risk"),
      floor(log(lit(1.0) - col("d").cast(DoubleType) /
        col("n_risk").cast(DoubleType)) * LnScale + 0.5).cast(LongType))
      .otherwise(0L)
    atRisk.withColumn("iln", lnTerm)
      .withColumn("extinct",
        max(when(col("d") === col("n_risk"), 1L).otherwise(0L))
          .over(wFwd))
      .withColumn("log_surv", when(col("extinct") === 0,
        sum("iln").over(wFwd).cast(DoubleType) / LnScale))
      .select(col("t"), col("n_risk"), col("d"), col("c"),
        col("log_surv"),
        when(col("extinct") === 1, 0.0)
          .otherwise(floor(exp(col("log_surv")) * StatScale + 0.5)
            / StatScale).as("survival"))
  }

  /** Frame-parametric one-sided CUSUM core (bound by win_cusum's chart,
    * re-exposed by GraftApi.cusum): closed form s_t = P_t − min(0, min
    * P_j) over deviation-scaled integers (dev = x·n − T — stays
    * integral, no division). Output: (ord, x, nn, cusum_scaled) with
    * cusum_scaled in x·n units. */
  private[graft] def cusumCore(series: DataFrame, ord: Column,
      x: Column): DataFrame = {
    val s = series.select(ord.as("ord"), x.cast(LongType).as("x"))
    val tot = s.agg(count(lit(1)).as("nn"), sum("x").as("t"))
    val wp = Window.orderBy("ord")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    s.crossJoin(broadcast(tot))
      .withColumn("__dev", col("x") * col("nn") - col("t"))
      .withColumn("__p", sum("__dev").over(wp))
      .select(col("ord"), col("x"), col("nn"),
        (col("__p") - least(min("__p").over(wp), lit(0L)))
          .as("cusum_scaled"))
  }

  /** The ONE per-customer spend frame (segment, o_custkey, cents) both
    * concentration readouts rank — agg_gini and profile_lorenz must
    * measure the same quantity or the curve stops explaining the
    * coefficient (round-7b review #6: the two copies could drift). */
  private def segmentSpend(s: org.apache.spark.sql.SparkSession,
      d: String): DataFrame = {
    val spend = Tables.orders(s, d)
      .groupBy("o_custkey")
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("spend"))
      .select(col("o_custkey"),
        (col("spend") * 100).cast(LongType).as("cents"))
    spend.join(
      Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment").as("segment")),
      col("o_custkey") === col("c_custkey"))
  }

  /** Benford expected shares log10(1+1/d) as ONE shared CASE string of
    * round-trip double literals (the bm25Expr discipline). The E0
    * suffix matters: a bare decimal literal parses as DECIMAL in both
    * engines and the two DECIMAL→DOUBLE casts disagreed in the last ulp
    * (measured: digit 3, …93 vs …92); an exponent literal parses as
    * DOUBLE directly, so both engines hold the bit-identical value. */
  private val benfordCase: String = (1 to 9).map(dd =>
    s"WHEN $dd THEN ${math.log10(1.0 + 1.0 / dd)}E0")
    .mkString("CASE digit ", " ", " ELSE 0.0E0 END")

  def queries: Map[String, Q.Fn] = Map(
    // ── Mann–Whitney U (Wilcoxon rank-sum), purchase vs click values ──
    // The canonical nonparametric A/B readout when value distributions
    // are skewed (Welch's t — profile_ab_test — assumes near-normal
    // means). Average ranks with tie correction, normal-approximation
    // z. All rank arithmetic is exact integers on the value-compacted
    // frame: avg rank of tied value v = before(v) + (t_v + 1)/2, kept
    // ×2 to stay integral.
    "profile_mannwhitney" -> ((s, d) =>
      mannWhitneyCore(
        Tables.events(s, d)
          .where(col("event_type").isin("purchase", "click")),
        col("event_type") === "purchase",
        quant2dp(col("value")))),

    // ── Population Stability Index, first vs second half of the month ──
    // The deployed-model drift gate: PSI = Σ (p−q)·ln(p/q) over fixed
    // bins. Bins are FIXED-WIDTH (value div 56.1, clamped to 0..9) so no
    // quantile fit precedes the scan; Laplace-smoothed shares make empty
    // bins well-defined. Each bin term is ln-quantized then summed —
    // 10 rows, so the "window" total is trivially cheap at any scale.
    // The FULL fixed 0..9 grid is part of the contract: a bin empty in
    // BOTH halves still carries a nonzero smoothed term whenever
    // ta ≠ tb (round-7b review: dropping such bins understated PSI and
    // broke the smoothed-shares-sum-to-1 property).
    "profile_psi" -> ((s, d) => {
      val ev = Tables.events(s, d).select(
        greatest(least(floor(col("value") / lit(56.1)), lit(9)), lit(0))
          .cast(IntegerType).as("bin"),
        when(dayofmonth(col("ts")) <= 15, 1L).otherwise(0L).as("isA"))
      val bins = ev.groupBy("bin").agg(
        sum("isA").as("n_a"), (count(lit(1)) - sum("isA")).as("n_b"))
      val tot = bins.agg(sum("n_a").as("ta"), sum("n_b").as("tb"))
      val grid = tot
        .select(col("ta"), col("tb"),
          explode(sequence(lit(0), lit(9))).as("bin"))
        .join(bins, Seq("bin"), "left")
        .select(col("bin"), coalesce(col("n_a"), lit(0L)).as("n_a"),
          coalesce(col("n_b"), lit(0L)).as("n_b"), col("ta"), col("tb"))
      grid
        .withColumn("iterm",
          psiTerm(col("n_a"), col("ta"), col("n_b"), col("tb"), 10))
        .withColumn("psi",
          sum("iterm").over(Window.partitionBy()).cast(DoubleType) / LnScale)
        .select(col("bin"), col("n_a"), col("n_b"),
          (col("iterm").cast(DoubleType) / LnScale).as("term"), col("psi"))
        .orderBy("bin")
    }),

    // ── Chi-squared independence, event mix × user cohort ──
    // "Did the event-type mix shift between cohorts?" — the categorical
    // drift gate (PSI's numeric twin). Pearson χ² over the 5×5
    // contingency table INCLUDING empty cells (absent combos contribute
    // E, not 0 — dropping them understates χ²): the full grid is the
    // cross of two tiny distinct frames, margins are broadcast 1-row /
    // 5-row aggregates, and each cell term uses the margin form
    // (O·N − R·C)²/(N·R·C) with EVERY product in double space: o·n and
    // r·c reach n², n·r·c reaches ~n³/cells, so Long products would
    // silently wrap at only ~3·10⁹ events while DuckDB errors — the
    // double factors stay exact below 2⁵³ ≈ 9·10¹⁵ events and both
    // engines evaluate the identical expression tree. Effect size ships
    // alongside as Cramér's V — χ² alone always "significises" at
    // 100 TB row counts.
    "profile_chisq" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_type"), (col("user_id") % 5).as("bucket"))
      // margins and the total are WINDOW sums over the completed grid
      // (≤ |types|·|buckets| ≈ 25 rows at ANY corpus size — both keys
      // are low-cardinality by construction, so the unpartitioned
      // window is bounded): the old form aggregated a separate branch
      // per margin, and Spark INLINES shared subtrees, so each margin
      // re-scanned events (6 pruned scans; measured in the formatted
      // plan — round-8 self-review). Now only the cell counts and the
      // two distinct frames touch events.
      val o = ev.groupBy("event_type", "bucket").agg(count(lit(1)).as("o"))
      val types = o.select("event_type").distinct()
      val buckets = o.select("bucket").distinct()
      val grid = types.crossJoin(buckets)
        .join(o, Seq("event_type", "bucket"), "left")
        .select(col("event_type"), col("bucket"),
          coalesce(col("o"), lit(0L)).as("o"))
      val cells = grid
        .withColumn("r", sum("o").over(Window.partitionBy("event_type")))
        .withColumn("c", sum("o").over(Window.partitionBy("bucket")))
        .withColumn("n", sum("o").over(Window.partitionBy()))
      // each factor is cast to Double BEFORE the products: o·n and r·c
      // reach n² and n·r·c reaches ~n³/cells, so Long products overflow
      // at only ~3·10⁹ events (and DuckDB would error while Spark wraps
      // silently — the worst cross-engine divergence class). Double
      // products are exact below 2⁵³ per factor and both engines
      // associate identically on this shared shape. (round-8 advisory)
      val diff = col("o").cast(DoubleType) * col("n").cast(DoubleType) -
        col("r").cast(DoubleType) * col("c").cast(DoubleType)
      val den = col("n").cast(DoubleType) * col("r").cast(DoubleType) *
        col("c").cast(DoubleType)
      val iterm = floor(diff * diff / den * LnScale + 0.5).cast(LongType)
      val g = cells.agg(
        sum(iterm).as("tsum"),
        countDistinct("event_type").as("nr"),
        countDistinct("bucket").as("nc"),
        max("n").as("n"))
      val chi2 = col("tsum").cast(DoubleType) / LnScale
      val mindf = least(col("nr") - 1, col("nc") - 1).cast(DoubleType)
      g.select(
        (floor(chi2 * StatScale + 0.5) / StatScale).as("chi2"),
        ((col("nr") - 1) * (col("nc") - 1)).as("df"),
        col("n"),
        (floor(sqrt(chi2 / (col("n").cast(DoubleType) * mindf))
          * StatScale + 0.5) / StatScale).as("cramers_v"))
    }),

    // ── Gini concentration of customer spend per market segment ──
    // "How concentrated is this segment's revenue?" — the inequality
    // readout a mixture designer runs per source/domain. Closed form on
    // ascending-sorted x (cents, exact): G = (2·Σ i·x_i − (n+1)·Σx) /
    // (n·Σx). The rank window is PARTITIONED by segment over
    // per-customer aggregates — no global sort, no raw-order rows.
    "agg_gini" -> ((s, d) =>
      giniCore(segmentSpend(s, d),
          col("segment"), col("cents"), col("o_custkey"))
        .select(col("g").as("segment"), col("n").as("n_customers"),
          (col("s").cast(DoubleType) / 100.0).as("total_spend"),
          col("gini"))
        .orderBy("segment")),

    // ── lag-1 / lag-7 autocorrelation of the daily revenue series ──
    // The forecasting pre-check: is there day-to-day momentum and a
    // weekly cycle worth modeling? Pearson autocorrelation on the
    // deviation-scaled series dev_t = x_t·D − T (exact integer cents —
    // win_cusum's trick: the common D scale cancels in the ratio, so NO
    // division happens before the final one). Lead pairs come from two
    // RANGE day-frames on ONE calendar-bounded ordering; output is a
    // single row. Long headroom: dev² sums top out ~2⁶² at ~10⁷
    // cents·days of daily variance — decimal is the documented fallback.
    "agg_autocorr" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(datediff(to_date(col("ts")),
          lit("2024-01-01").cast("date")).cast("long").as("day"))
        .agg((sum(Det.dec2(col("value"))) * 100).cast(LongType).as("cents"))
      val tot = daily.agg(count(lit(1)).as("dd"), sum("cents").as("t"))
      val j = daily.crossJoin(broadcast(tot))
        .withColumn("dev", col("cents") * col("dd") - col("t"))
      def atLag(lag: Long) = Window.orderBy("day").rangeBetween(lag, lag)
      val paired = j
        .withColumn("dev1", sum("dev").over(atLag(1)))
        .withColumn("dev7", sum("dev").over(atLag(7)))
      val g = paired.agg(
        max("dd").as("n_days"),
        sum(col("dev") * col("dev")).as("s0"),
        sum(col("dev") * col("dev1")).as("s1"),
        sum(col("dev") * col("dev7")).as("s7"))
      // s0 = 0 ⟺ every day has identical revenue: autocorrelation is
      // undefined (Spark NaN vs DuckDB NULL — the guard is the contract)
      g.select(col("n_days"),
        when(col("s0") =!= 0,
          floor(col("s1").cast(DoubleType) / col("s0").cast(DoubleType)
            * LnScale + 0.5) / LnScale).as("acf1"),
        when(col("s0") =!= 0,
          floor(col("s7").cast(DoubleType) / col("s0").cast(DoubleType)
            * LnScale + 0.5) / LnScale).as("acf7"))
    }),

    // ── Benford first-digit audit over order totals ──
    // The classic fabricated-data screen: naturally-occurring amounts
    // put digit d first with probability log10(1+1/d); synthetic or
    // tampered feeds flatten toward 1/9. The first digit comes from the
    // INTEGER cents rendered as a string (both engines print integers
    // identically — no double-formatting hazard, no log10 boundary),
    // expected shares are shared round-trip literals, and the summary
    // MAD (mean |share−expected|, the Nigrini statistic) rides one
    // 9-row window. One scan, 9-row output at any corpus size.
    "profile_benford" -> ((s, d) => {
      val c = Tables.orders(s, d)
        .select(floor(col("o_totalprice") * 100 + 0.5).cast(LongType)
          .as("cents"))
        .where(col("cents") > 0)
        .select(substring(col("cents").cast(StringType), 1, 1)
          .cast(IntegerType).as("digit"))
      val byD = c.groupBy("digit").agg(count(lit(1)).as("n"))
      val tot = byD.agg(sum("n").as("nn"))
      // full 1..9 grid: an ABSENT digit is the strongest Benford
      // violation and must contribute |0 − expected| to the MAD
      val grid = tot.select(col("nn"),
          explode(sequence(lit(1), lit(9))).as("digit"))
        .join(byD, Seq("digit"), "left")
        .select(col("digit"), coalesce(col("n"), lit(0L)).as("n"),
          col("nn"))
      val g = grid
        .select(col("digit"), col("n"),
          (col("n").cast(DoubleType) / col("nn").cast(DoubleType))
            .as("share"),
          expr(s"CAST(($benfordCase) AS DOUBLE)").as("expected"))
        .withColumn("adev",
          floor(abs(col("share") - col("expected")) * LnScale + 0.5)
            .cast(LongType))
      g.withColumn("mad",
          (sum("adev").over(Window.partitionBy()).cast(DoubleType) /
            LnScale / count(lit(1)).over(Window.partitionBy())
              .cast(DoubleType)))
        .select(col("digit"), col("n"), col("share"), col("expected"),
          (floor(col("mad") * StatScale + 0.5) / StatScale).as("mad"))
        .orderBy("digit")
    }),

    // ── Welch two-sample t-test (unequal variances) ──
    // The parametric complement of profile_mannwhitney: does mean
    // purchase value differ between the even and odd user cohorts?
    // Welch's form with the Satterthwaite df is the correct default —
    // pooled-variance Student's t silently assumes homoscedasticity,
    // which real metric pairs rarely satisfy. Moments are exact
    // integer cents (Σx, Σx² — profile_power's discipline), so the
    // divisions/sqrt run once on exactly-determined doubles and both
    // engines evaluate the identical IEEE tree; t and df are
    // quantized at StatScale for the hash compare. Scale: ONE
    // map-side-combined global aggregate — the shuffle carries six
    // numbers regardless of corpus size.
    "profile_ttest" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .where(col("event_type") === "purchase")
        .select((col("user_id") % 2).as("g"),
          floor(col("value") * 100 + 0.5).cast(LongType).as("iv"))
      val a = ev.agg(
        sum(when(col("g") === 0, 1L).otherwise(0L)).as("n1"),
        sum(when(col("g") =!= 0, 1L).otherwise(0L)).as("n2"),
        sum(when(col("g") === 0, col("iv"))).as("s1"),
        sum(when(col("g") =!= 0, col("iv"))).as("s2"),
        sum(when(col("g") === 0, col("iv") * col("iv"))).as("q1"),
        sum(when(col("g") =!= 0, col("iv") * col("iv"))).as("q2"))
      def dd(c: String) = col(c).cast(DoubleType)
      val n1 = dd("n1"); val n2 = dd("n2")
      // sample variances from the exact moment sums, cents²
      val v1 = (dd("q1") - dd("s1") * dd("s1") / n1) / (n1 - 1.0)
      val v2 = (dd("q2") - dd("s2") * dd("s2") / n2) / (n2 - 1.0)
      val se2 = v1 / n1 + v2 / n2
      val delta = dd("s1") / n1 - dd("s2") / n2
      val t = delta / sqrt(se2)
      val df = se2 * se2 /
        ((v1 / n1) * (v1 / n1) / (n1 - 1.0) +
          (v2 / n2) * (v2 / n2) / (n2 - 1.0))
      // both variances need df ≥ 1; a zero standard error (constant
      // values both cohorts) has no finite t — NULL, not ±Inf, so the
      // engines cannot diverge on the degenerate shape
      val ok = col("n1") > 1 && col("n2") > 1 && se2 > 0
      a.select(col("n1"), col("n2"),
        (floor(delta * StatScale + 0.5) / StatScale / 100.0).as("delta"),
        when(ok, floor(t * StatScale + 0.5) / StatScale).as("t_stat"),
        when(ok, floor(df * StatScale + 0.5) / StatScale).as("df"))
    }),

    // ── A/B power analysis: required n per arm for the observed gap ──
    // The question every experiment review asks FIRST: "could this test
    // even have detected the effect?" n = 2s²(z_α/2+z_β)²/δ² at α=0.05,
    // power 0.8 — z constants as E0 round-trip literals, pooled sample
    // variance and mean gap from exact integer cent sums (one scan,
    // map-side combined), every division in a fixed shared association.
    "profile_power" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .where(col("event_type").isin("purchase", "click"))
        .select(when(col("event_type") === "purchase", 1L).otherwise(0L)
          .as("g"),
          floor(col("value") * 100 + 0.5).cast(LongType).as("iv"))
      val g = ev.agg(
        sum("g").as("n1"), (count(lit(1)) - sum("g")).as("n2"),
        sum(when(col("g") === 1, col("iv"))).as("s1"),
        sum(when(col("g") === 0, col("iv"))).as("s2"),
        sum(when(col("g") === 1, col("iv") * col("iv"))).as("q1"),
        sum(when(col("g") === 0, col("iv") * col("iv"))).as("q2"))
      val n1 = col("n1").cast(DoubleType)
      val n2 = col("n2").cast(DoubleType)
      // ss = Σx² − (Σx)²/n, in cents²; δ in cents
      val ss1 = col("q1").cast(DoubleType) -
        col("s1").cast(DoubleType) * col("s1").cast(DoubleType) / n1
      val ss2 = col("q2").cast(DoubleType) -
        col("s2").cast(DoubleType) * col("s2").cast(DoubleType) / n2
      val s2p = (ss1 + ss2) / (n1 + n2 - 2.0)
      val delta = col("s1").cast(DoubleType) / n1 -
        col("s2").cast(DoubleType) / n2
      val zsum = expr("1.959963984540054E0 + 0.8416212335729143E0")
      val nReq = ceil(lit(2.0) * s2p * zsum * zsum / (delta * delta))
      // δ = 0 (identical arm means): no finite n detects a zero effect —
      // NULL, not Spark's ceil(Inf) vs DuckDB's NULL divergence. The
      // pooled variance needs df = n1+n2−2 > 0 too: at one row per arm
      // s2p is 0/0 (Spark NaN → floor 0.0 vs DuckDB NULL) — both
      // s2_pooled and n_required go NULL below the minimum sample.
      val hasDf = col("n1") + col("n2") > 2
      g.select(col("n1"), col("n2"),
        (floor(delta * StatScale + 0.5) / StatScale / 100.0).as("delta"),
        when(hasDf, floor(s2p * StatScale + 0.5) / StatScale / 10000.0)
          .as("s2_pooled"),
        when(hasDf && delta =!= 0, nReq.cast(LongType)).as("n_required"))
    }),

    // ── ratio metric with delta-method variance, per user cohort ──
    // Revenue-per-event is a RATIO of sums whose unit of randomization
    // is the user — naive row-level variance is wrong (Deng et al.
    // 2018's ratio-metric correction, the experimentation-platform
    // standard): R = Σx/Σy, se² = Σ(x_u − R·y_u)² / (Σy)² over user
    // aggregates. Everything is exact integer cents until the two
    // divisions; the linearized residual uses quantized R so both
    // engines square the identical double. 95% CI via E0 z literal.
    "agg_ratio_metrics" -> ((s, d) => {
      val perUser = Tables.events(s, d)
        .groupBy((col("user_id") % 5).as("bucket"), col("user_id"))
        .agg(
          sum(when(col("event_type") === "purchase",
            floor(col("value") * 100 + 0.5).cast(LongType))
            .otherwise(0L)).as("x"),
          count(lit(1)).as("y"))
      // second moments go decimal with the FIRST OPERAND widened (the
      // agg_gini overflow rule, applied before the multiply: a single
      // x > ~3·10⁹ cents would overflow the Long product before any
      // cast; the oracle widens to HUGEINT the same way — casting its
      // SUM back to BIGINT would error at exactly the scale this
      // protects, round-7b review #2)
      val g = perUser.groupBy("bucket").agg(
        count(lit(1)).as("n_users"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x").cast(DecimalType(38, 0)) * col("x")).as("sxx"),
        sum(col("x").cast(DecimalType(38, 0)) * col("y")).as("sxy"),
        sum(col("y").cast(DecimalType(38, 0)) * col("y")).as("syy"))
      val r = col("sx").cast(DoubleType) / col("sy").cast(DoubleType)
      // Σ(x−Ry)² = Σx² − 2RΣxy + R²Σy², with R quantized once so the
      // expansion is a fixed double expression on both engines
      val rq = floor(r * 1e9 + 0.5) / 1e9
      val ssr = col("sxx").cast(DoubleType) -
        lit(2.0) * rq * col("sxy").cast(DoubleType) +
        rq * rq * col("syy").cast(DoubleType)
      val se = sqrt(greatest(ssr, lit(0.0))) /
        col("sy").cast(DoubleType)
      val z = expr("1.959963984540054E0")
      g.select(col("bucket"), col("n_users"),
          (floor(r * StatScale + 0.5) / StatScale / 100.0)
            .as("rev_per_event"),
          (floor(se * LnScale + 0.5) / LnScale / 100.0).as("se"),
          (floor((r - z * se) * StatScale + 0.5) / StatScale / 100.0)
            .as("ci_lo"),
          (floor((r + z * se) * StatScale + 0.5) / StatScale / 100.0)
            .as("ci_hi"))
        .orderBy("bucket")
    }),

    // ── Kaplan–Meier survival over user activity lifetimes ──
    // "How long do users stay active?" with right-censoring done
    // PROPERLY (agg_retention's cohort grid can't say — users still
    // active at the observation edge aren't churned, just unobserved):
    // duration = last−first active day; users whose last activity is
    // within 2 days of the corpus edge are censored. S(t) = Π(1−dᵢ/nᵢ)
    // via the log trick: per-step ln terms quantized 1e-6 (exact
    // integer cumulative sum — the PSI discipline), survival = exp of
    // the exact log, quantized 1e-4 on output (agg_entropy's
    // transcendental-tail risk profile). At-risk counts come from ONE
    // reverse cumulative window over the duration-compacted frame
    // (≤ calendar-bounded distinct durations, never user-scale rows).
    "agg_survival" -> ((s, d) => {
      val perUser = Tables.events(s, d)
        .groupBy("user_id")
        .agg(min(to_date(col("ts"))).as("d0"),
          max(to_date(col("ts"))).as("d1"))
      val edge = perUser.agg(max("d1").as("maxd"))
      val subj = perUser.crossJoin(broadcast(edge))
        .select(datediff(col("d1"), col("d0")).cast(LongType).as("t"),
          when(datediff(col("maxd"), col("d1")) > 2, 1L).otherwise(0L)
            .as("dead"))
      kaplanMeierCore(subj).orderBy("t")
    }),

    // ── MAD robust outlier flags over the daily revenue series ──
    // validate_anomaly's z-scores break exactly when needed most: a fat
    // outlier inflates the mean AND the σ it is judged against
    // (masking). Median/MAD have a 50% breakdown point. Both medians
    // are LOWER medians (rank ⌈n/2⌉ — pure integer rank picks, no
    // interpolation to diverge between engines), and the 3σ-equivalent
    // flag |x−med|·10⁴ > 44478·MAD (3·1.4826 scaled integer) is an
    // exact integer inequality — no float boundary anywhere in the
    // whole op. Windows ride the calendar-bounded daily frame.
    "profile_outlier_mad" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("day"))
        .agg((sum(Det.dec2(col("value"))) * 100).cast(LongType).as("cents"))
      def lowerMedian(df: DataFrame, c: String): DataFrame = {
        val w = Window.orderBy(col(c), col("day"))
        df.withColumn("__rn", row_number().over(w))
          .withColumn("__n", count(lit(1)).over(Window.partitionBy()))
          .where(col("__rn") === expr("(__n + 1) div 2"))
          .select(col(c).as("med"))
      }
      val med = lowerMedian(daily, "cents")
      val withDev = daily.crossJoin(broadcast(med))
        .withColumn("dev", abs(col("cents") - col("med")))
      val mad = lowerMedian(withDev.select(col("day"),
        col("dev").as("cents")), "cents")
        .select(col("med").as("mad"))
      withDev.crossJoin(broadcast(mad))
        .select(col("day").cast("timestamp").as("day_ts"),
          (col("cents").cast(DoubleType) / 100.0).as("rev"),
          (col("med").cast(DoubleType) / 100.0).as("median"),
          (col("mad").cast(DoubleType) / 100.0).as("mad"),
          when(col("dev") * 10000 > col("mad") * 44478, 1L)
            .otherwise(0L).as("is_outlier"))
        .orderBy("day_ts")
    }),

    // ── Lorenz curve deciles per market segment ──
    // Gini's graphical twin: "the bottom 50% of customers carry X% of
    // revenue" — the readout that makes concentration actionable. Each
    // segment's customers split into 10 equal-count deciles (NTILE over
    // the same per-segment ordering agg_gini ranks — both engines give
    // the remainder to the FIRST buckets), decile spends sum exactly in
    // decimal, cumulative shares ride a 10-row window. Same scale shape
    // as agg_gini: per-segment windows over per-customer aggregates.
    "profile_lorenz" -> ((s, d) => {
      val x = segmentSpend(s, d)
      val wOrd = Window.partitionBy("segment").orderBy("cents", "o_custkey")
      val byDecile = x.withColumn("decile", ntile(10).over(wOrd))
        .groupBy("segment", "decile")
        .agg(count(lit(1)).as("n"),
          sum(col("cents").cast(DecimalType(38, 0))).as("dsum"))
      val wCum = Window.partitionBy("segment").orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy("segment")
      byDecile
        .withColumn("cum", sum("dsum").over(wCum))
        .withColumn("tot", sum("dsum").over(wAll))
        .select(col("segment"), col("decile"), col("n"),
          when(col("tot") =!= 0,
            floor(col("cum").cast(DoubleType) / col("tot").cast(DoubleType)
              * LnScale + 0.5) / LnScale).as("cum_share"))
        .orderBy("segment", "decile")
    }),

    // ── Jensen–Shannon divergence between two languages' token mixes ──
    // The symmetric, bounded (≤ ln 2) corpus-comparison measure — what
    // PSI is to a score column, JS is to a VOCABULARY: "how differently
    // do these two sources use words?" (domain-shift detection before
    // mixing corpora). Laplace smoothing over the UNION vocabulary (so
    // both distributions live on the same support — KL would be ∞ on
    // disjoint tokens, JS's midpoint keeps every term finite), one
    // quantized term per token (PSI discipline), vocab-bounded frames
    // (Heaps-sublinear — never corpus-row-scale).
    "text_js_divergence" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .where(col("lang").isin("en", "de"))
        .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
        .where(length(col("tok")) > 0)
      val byT = toks.groupBy("tok").agg(
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("cen"),
        (count(lit(1)) - sum(when(col("lang") === "en", 1L).otherwise(0L)))
          .as("cde"))
      val tot = byT.agg(sum("cen").as("na"), sum("cde").as("nb"),
        count(lit(1)).as("v"))
      val j = byT.crossJoin(broadcast(tot))
      val p = (col("cen") + 1).cast(DoubleType) /
        (col("na") + col("v")).cast(DoubleType)
      val q = (col("cde") + 1).cast(DoubleType) /
        (col("nb") + col("v")).cast(DoubleType)
      val m = (p + q) / 2.0
      val iterm = floor(
        (lit(0.5) * p * log(p / m) + lit(0.5) * q * log(q / m))
          * LnScale + 0.5).cast(LongType)
      j.select(col("na"), col("nb"), col("v"), iterm.as("iterm"))
        .groupBy("na", "nb", "v")
        .agg(sum("iterm").as("tsum"))
        .select(col("na").as("n_en"), col("nb").as("n_de"),
          col("v").as("vocab"),
          (col("tsum").cast(DoubleType) / LnScale).as("js_nats"))
    }),

    // ── Zipf-law fit over the corpus token-frequency spectrum ──
    // Corpus health profiling: natural text follows freq ∝ rank^(−s)
    // with s ≈ 1; a broken crawl or synthetic corpus shows up as a
    // deviant slope. OLS of ln(freq) on ln(rank) in quantized-integer
    // space. The fit runs on the TOP-N SPECTRUM HEAD (published Zipf
    // fits use the head — the hapax tail is a flat run that only blurs
    // the slope): orderBy(freq.desc).limit(N) compiles to
    // TakeOrderedAndProject, a distributed partial top-k, so the full
    // vocabulary (O(10⁸⁺) distinct tokens at 100 TB of web text) NEVER
    // feeds a single-task rank window — the window touches exactly
    // ZipfHeadN rows (PlanSpec-locked). Moment sums ride
    // DecimalType(38,0) (exact, matching DuckDB's HUGEINT SUM widening)
    // so quantized cross-products can never wrap Long — each lx·ly term
    // is ~(ln·10⁶)² ≈ 10¹⁴, which overflows BIGINT at ~10⁵ terms
    // (round-8 advisory).
    "text_zipf" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("tok"))
        .where(length(col("tok")) > 0)
        .groupBy("tok").agg(count(lit(1)).as("freq"))
      val head = toks
        .orderBy(col("freq").desc, col("tok").asc).limit(ZipfHeadN)
      val w = Window.orderBy(col("freq").desc, col("tok").asc)
      val r = head.withColumn("rank", row_number().over(w).cast(LongType))
        .select(
          floor(log(col("rank").cast(DoubleType)) * LnScale + 0.5)
            .cast(LongType).as("lx"),
          floor(log(col("freq").cast(DoubleType)) * LnScale + 0.5)
            .cast(LongType).as("ly"))
      val g = r.agg(
        count(lit(1)).as("n"), sum("lx").as("sx"), sum("ly").as("sy"),
        sum(col("lx").cast(DecimalType(38, 0)) * col("ly")).as("sxy"),
        sum(col("lx").cast(DecimalType(38, 0)) * col("lx")).as("sxx"))
      // normalized moments with ONE division each (shared shape with the
      // oracle — float ops must associate identically on both engines)
      val moments = g.select(
        col("n").cast(DoubleType).as("nd"),
        (col("sx").cast(DoubleType) / LnScale).as("a"),
        (col("sy").cast(DoubleType) / LnScale).as("b"),
        (col("sxy").cast(DoubleType) / lit(LnScale * LnScale)).as("c"),
        (col("sxx").cast(DoubleType) / lit(LnScale * LnScale)).as("e"))
      // a 1-token vocabulary has zero x-variance: no line to fit (the
      // NULL guard keeps Spark NaN and DuckDB NULL from diverging)
      val fitted = moments.select(col("nd"), col("a"), col("b"),
        when(col("nd") * col("e") - col("a") * col("a") =!= 0.0,
          (col("nd") * col("c") - col("a") * col("b")) /
            (col("nd") * col("e") - col("a") * col("a"))).as("slope"))
      fitted.select(col("nd").cast(LongType).as("n_vocab"),
        (floor(col("slope") * StatScale + 0.5) / StatScale).as("zipf_slope"),
        (floor((col("b") - col("slope") * col("a")) / col("nd")
          * StatScale + 0.5) / StatScale).as("ln_intercept"))
    })
  )

  def oracles: Map[String, String] = Map(
    "profile_mannwhitney" ->
      s"""WITH ev AS (SELECT event_type,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS iv
        |  FROM events WHERE event_type IN ('purchase', 'click')),
        |byv AS (SELECT iv,
        |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS t1,
        |    COUNT(*) AS t
        |  FROM ev GROUP BY iv),
        |rk AS (SELECT *, COALESCE(SUM(t) OVER (ORDER BY iv
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
        |  FROM byv),
        |g AS (SELECT CAST(SUM(t1) AS BIGINT) AS n1,
        |    CAST(SUM(t) - SUM(t1) AS BIGINT) AS n2,
        |    CAST(SUM(t1 * (bef * 2 + t + 1)) AS BIGINT) AS r1x2,
        |    CAST(SUM(t * t * t - t) AS BIGINT) AS ties
        |  FROM rk),
        |v AS (SELECT n1, n2, r1x2,
        |    CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0
        |      * ((CAST(n1 + n2 AS DOUBLE) + 1)
        |        - CAST(ties AS DOUBLE) / (CAST(n1 + n2 AS DOUBLE)
        |          * (CAST(n1 + n2 AS DOUBLE) - 1))) AS varu
        |  FROM g)
        |SELECT n1, n2,
        |  CAST(r1x2 - n1 * (n1 + 1) AS DOUBLE) / 2.0 AS u1,
        |  CASE WHEN n1 > 0 AND n2 > 0 AND varu > 0 THEN
        |    floor((CAST(r1x2 - n1 * (n1 + 1) AS DOUBLE)
        |        - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))
        |      / (sqrt(varu) * 2.0)
        |      * $StatScale + 0.5) / $StatScale
        |  END AS z
        |FROM v""".stripMargin,
    "profile_psi" ->
      s"""WITH ev AS (SELECT
        |    CAST(greatest(least(floor(value / 56.1), 9), 0) AS INTEGER)
        |    AS bin,
        |    CASE WHEN date_part('day', ts) <= 15 THEN 1 ELSE 0 END AS isa
        |  FROM events),
        |bins AS (SELECT bin, CAST(SUM(isa) AS BIGINT) AS n_a,
        |    CAST(COUNT(*) - SUM(isa) AS BIGINT) AS n_b
        |  FROM ev GROUP BY bin),
        |tot AS (SELECT CAST(SUM(n_a) AS BIGINT) AS ta,
        |    CAST(SUM(n_b) AS BIGINT) AS tb FROM bins),
        |grid AS (SELECT CAST(g.b AS INTEGER) AS bin,
        |    COALESCE(bins.n_a, 0) AS n_a, COALESCE(bins.n_b, 0) AS n_b,
        |    tot.ta, tot.tb
        |  FROM unnest(range(0, 10)) AS g(b) CROSS JOIN tot
        |  LEFT JOIN bins ON bins.bin = g.b),
        |pb AS (SELECT bin, n_a, n_b,
        |    CAST(floor((CAST(n_a + 1 AS DOUBLE) / CAST(ta + 10 AS DOUBLE)
        |        - CAST(n_b + 1 AS DOUBLE) / CAST(tb + 10 AS DOUBLE))
        |      * ln((CAST(n_a + 1 AS DOUBLE) / CAST(ta + 10 AS DOUBLE))
        |          / (CAST(n_b + 1 AS DOUBLE) / CAST(tb + 10 AS DOUBLE)))
        |      * $LnScale + 0.5) AS BIGINT) AS iterm
        |  FROM grid)
        |SELECT bin, n_a, n_b,
        |  CAST(iterm AS DOUBLE) / $LnScale AS term,
        |  CAST(SUM(iterm) OVER () AS DOUBLE) / $LnScale AS psi
        |FROM pb ORDER BY bin""".stripMargin,
    "profile_chisq" ->
      s"""WITH ev AS (SELECT event_type, user_id % 5 AS bucket FROM events),
        |o AS (SELECT event_type, bucket, COUNT(*) AS o FROM ev
        |  GROUP BY 1, 2),
        |types AS (SELECT DISTINCT event_type FROM ev),
        |buckets AS (SELECT DISTINCT bucket FROM ev),
        |grid AS (SELECT t.event_type, b.bucket, COALESCE(o.o, 0) AS o
        |  FROM types t CROSS JOIN buckets b
        |  LEFT JOIN o ON o.event_type = t.event_type
        |    AND o.bucket = b.bucket),
        |rt AS (SELECT event_type, COUNT(*) AS r FROM ev GROUP BY 1),
        |ct AS (SELECT bucket, COUNT(*) AS c FROM ev GROUP BY 1),
        |tot AS (SELECT COUNT(*) AS n FROM ev),
        |cells AS (SELECT g.o, rt.r, ct.c, tot.n,
        |    CAST(floor((CAST(g.o AS DOUBLE) * CAST(tot.n AS DOUBLE)
        |        - CAST(rt.r AS DOUBLE) * CAST(ct.c AS DOUBLE))
        |      * (CAST(g.o AS DOUBLE) * CAST(tot.n AS DOUBLE)
        |        - CAST(rt.r AS DOUBLE) * CAST(ct.c AS DOUBLE))
        |      / (CAST(tot.n AS DOUBLE) * CAST(rt.r AS DOUBLE)
        |        * CAST(ct.c AS DOUBLE)) * $LnScale + 0.5)
        |      AS BIGINT) AS iterm,
        |    g.event_type, g.bucket
        |  FROM grid g JOIN rt ON rt.event_type = g.event_type
        |    JOIN ct ON ct.bucket = g.bucket, tot),
        |s AS (SELECT CAST(SUM(iterm) AS BIGINT) AS tsum,
        |    COUNT(DISTINCT event_type) AS nr,
        |    COUNT(DISTINCT bucket) AS nc, MAX(n) AS n
        |  FROM cells)
        |SELECT
        |  floor(CAST(tsum AS DOUBLE) / $LnScale * $StatScale + 0.5)
        |    / $StatScale AS chi2,
        |  (nr - 1) * (nc - 1) AS df, n,
        |  floor(sqrt((CAST(tsum AS DOUBLE) / $LnScale)
        |      / (CAST(n AS DOUBLE) * CAST(least(nr - 1, nc - 1) AS DOUBLE)))
        |    * $StatScale + 0.5) / $StatScale AS cramers_v
        |FROM s""".stripMargin,
    "agg_gini" ->
      s"""WITH spend AS (SELECT o_custkey,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
        |      AS cents
        |  FROM orders GROUP BY o_custkey),
        |x AS (SELECT c.c_mktsegment AS segment, s.o_custkey, s.cents,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY c.c_mktsegment
        |      ORDER BY s.cents, s.o_custkey) AS BIGINT) AS i
        |  FROM spend s JOIN customer c ON s.o_custkey = c.c_custkey),
        |g AS (SELECT segment, COUNT(*) AS n_customers, SUM(cents) AS s,
        |    SUM(i * cents) AS s1
        |  FROM x GROUP BY segment)
        |SELECT segment, n_customers,
        |  CAST(s AS DOUBLE) / 100.0 AS total_spend,
        |  CASE WHEN s <> 0 THEN
        |    floor(CAST(s1 * 2 - (n_customers + 1) * s AS DOUBLE)
        |        / CAST(n_customers * s AS DOUBLE) * $LnScale + 0.5)
        |      / $LnScale END AS gini
        |FROM g ORDER BY segment""".stripMargin,
    "agg_autocorr" ->
      s"""WITH dly AS (SELECT
        |    CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
        |      AS BIGINT) AS day,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
        |      AS cents
        |  FROM events GROUP BY 1),
        |tot AS (SELECT COUNT(*) AS dd, CAST(SUM(cents) AS BIGINT) AS t
        |  FROM dly),
        |j AS (SELECT day, cents, dd, cents * dd - t AS dev FROM dly, tot),
        |p AS (SELECT *,
        |    CAST(SUM(dev) OVER (ORDER BY day
        |      RANGE BETWEEN 1 FOLLOWING AND 1 FOLLOWING) AS BIGINT)
        |      AS dev1,
        |    CAST(SUM(dev) OVER (ORDER BY day
        |      RANGE BETWEEN 7 FOLLOWING AND 7 FOLLOWING) AS BIGINT)
        |      AS dev7
        |  FROM j),
        |g AS (SELECT MAX(dd) AS n_days,
        |    CAST(SUM(dev * dev) AS BIGINT) AS s0,
        |    CAST(SUM(dev * dev1) AS BIGINT) AS s1,
        |    CAST(SUM(dev * dev7) AS BIGINT) AS s7
        |  FROM p)
        |SELECT n_days,
        |  CASE WHEN s0 <> 0 THEN
        |    floor(CAST(s1 AS DOUBLE) / CAST(s0 AS DOUBLE) * $LnScale + 0.5)
        |      / $LnScale END AS acf1,
        |  CASE WHEN s0 <> 0 THEN
        |    floor(CAST(s7 AS DOUBLE) / CAST(s0 AS DOUBLE) * $LnScale + 0.5)
        |      / $LnScale END AS acf7
        |FROM g""".stripMargin,
    "profile_benford" ->
      s"""WITH c AS (SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1)
        |      AS INTEGER) AS digit
        |  FROM (SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
        |          AS cents FROM orders) WHERE cents > 0),
        |byd AS (SELECT digit, COUNT(*) AS n FROM c GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM byd),
        |grid AS (SELECT g.digit, COALESCE(byd.n, 0) AS n, tot.nn
        |  FROM (SELECT CAST(d AS INTEGER) AS digit
        |        FROM unnest(range(1, 10)) AS u(d)) g
        |  CROSS JOIN tot LEFT JOIN byd ON byd.digit = g.digit),
        |t AS (SELECT digit, n,
        |    CAST(n AS DOUBLE) / CAST(nn AS DOUBLE) AS share,
        |    CAST(($benfordCase) AS DOUBLE) AS expected
        |  FROM grid),
        |a AS (SELECT *, CAST(floor(abs(share - expected) * $LnScale + 0.5)
        |    AS BIGINT) AS adev FROM t)
        |SELECT digit, n, share, expected,
        |  floor(CAST(SUM(adev) OVER () AS DOUBLE) / $LnScale
        |    / CAST(COUNT(*) OVER () AS DOUBLE) * $StatScale + 0.5)
        |    / $StatScale AS mad
        |FROM a ORDER BY digit""".stripMargin,
    "agg_survival" ->
      s"""WITH pu AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS d0,
        |    MAX(CAST(ts AS DATE)) AS d1
        |  FROM events GROUP BY user_id),
        |edge AS (SELECT MAX(d1) AS maxd FROM pu),
        |subj AS (SELECT
        |    CAST(date_diff('day', d0, d1) AS BIGINT) AS t,
        |    CASE WHEN date_diff('day', d1, maxd) > 2 THEN 1 ELSE 0 END
        |      AS dead
        |  FROM pu, edge),
        |byt AS (SELECT t, CAST(SUM(dead) AS BIGINT) AS d,
        |    CAST(COUNT(*) - SUM(dead) AS BIGINT) AS c
        |  FROM subj GROUP BY t),
        |ar AS (SELECT *, CAST(SUM(d + c) OVER (ORDER BY t DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS n_risk FROM byt),
        |ln_t AS (SELECT *,
        |    CASE WHEN d > 0 AND d < n_risk
        |      THEN CAST(floor(ln(1.0 - CAST(d AS DOUBLE)
        |        / CAST(n_risk AS DOUBLE)) * $LnScale + 0.5) AS BIGINT)
        |    ELSE 0 END AS iln
        |  FROM ar),
        |cum AS (SELECT *, CAST(SUM(iln) OVER (ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cln,
        |    MAX(CASE WHEN d = n_risk THEN 1 ELSE 0 END) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS extinct
        |  FROM ln_t)
        |SELECT t, n_risk, d, c,
        |  CASE WHEN extinct = 0 THEN CAST(cln AS DOUBLE) / $LnScale END
        |    AS log_surv,
        |  CASE WHEN extinct = 1 THEN 0.0
        |    ELSE floor(exp(CAST(cln AS DOUBLE) / $LnScale)
        |      * $StatScale + 0.5) / $StatScale
        |  END AS survival
        |FROM cum ORDER BY t""".stripMargin,
    "profile_ttest" ->
      s"""WITH ev AS (SELECT user_id % 2 AS g,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS iv
        |  FROM events WHERE event_type = 'purchase'),
        |a AS (SELECT
        |    CAST(SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(SUM(CASE WHEN g <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        |    CAST(SUM(CASE WHEN g = 0 THEN iv END) AS BIGINT) AS s1,
        |    CAST(SUM(CASE WHEN g <> 0 THEN iv END) AS BIGINT) AS s2,
        |    CAST(SUM(CASE WHEN g = 0 THEN iv * iv END) AS BIGINT) AS q1,
        |    CAST(SUM(CASE WHEN g <> 0 THEN iv * iv END) AS BIGINT) AS q2
        |  FROM ev),
        |b AS (SELECT n1, n2,
        |    (CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
        |      / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1.0) AS v1,
        |    (CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)
        |      / CAST(n2 AS DOUBLE)) / (CAST(n2 AS DOUBLE) - 1.0) AS v2,
        |    CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
        |      - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS delta
        |  FROM a),
        |c AS (SELECT n1, n2, delta, v1, v2,
        |    v1 / CAST(n1 AS DOUBLE) + v2 / CAST(n2 AS DOUBLE) AS se2
        |  FROM b)
        |SELECT n1, n2,
        |  floor(delta * $StatScale + 0.5) / $StatScale / 100.0 AS delta,
        |  CASE WHEN n1 > 1 AND n2 > 1 AND se2 > 0 THEN
        |    floor(delta / sqrt(se2) * $StatScale + 0.5) / $StatScale
        |  END AS t_stat,
        |  CASE WHEN n1 > 1 AND n2 > 1 AND se2 > 0 THEN
        |    floor(se2 * se2
        |      / ((v1 / CAST(n1 AS DOUBLE)) * (v1 / CAST(n1 AS DOUBLE))
        |          / (CAST(n1 AS DOUBLE) - 1.0)
        |        + (v2 / CAST(n2 AS DOUBLE)) * (v2 / CAST(n2 AS DOUBLE))
        |          / (CAST(n2 AS DOUBLE) - 1.0))
        |      * $StatScale + 0.5) / $StatScale
        |  END AS df
        |FROM c""".stripMargin,
    "profile_power" ->
      s"""WITH ev AS (SELECT
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS g,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS iv
        |  FROM events WHERE event_type IN ('purchase', 'click')),
        |a AS (SELECT CAST(SUM(g) AS BIGINT) AS n1,
        |    CAST(COUNT(*) - SUM(g) AS BIGINT) AS n2,
        |    CAST(SUM(CASE WHEN g = 1 THEN iv END) AS BIGINT) AS s1,
        |    CAST(SUM(CASE WHEN g = 0 THEN iv END) AS BIGINT) AS s2,
        |    CAST(SUM(CASE WHEN g = 1 THEN iv * iv END) AS BIGINT) AS q1,
        |    CAST(SUM(CASE WHEN g = 0 THEN iv * iv END) AS BIGINT) AS q2
        |  FROM ev),
        |b AS (SELECT n1, n2,
        |    CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
        |      / CAST(n1 AS DOUBLE) AS ss1,
        |    CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)
        |      / CAST(n2 AS DOUBLE) AS ss2,
        |    CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
        |      - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS delta
        |  FROM a),
        |c AS (SELECT n1, n2, delta,
        |    (ss1 + ss2) / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 2.0)
        |      AS s2p
        |  FROM b)
        |SELECT n1, n2,
        |  floor(delta * $StatScale + 0.5) / $StatScale / 100.0 AS delta,
        |  CASE WHEN n1 + n2 > 2 THEN
        |    floor(s2p * $StatScale + 0.5) / $StatScale / 10000.0
        |  END AS s2_pooled,
        |  CASE WHEN n1 + n2 > 2 AND delta <> 0 THEN
        |    CAST(ceil(2.0 * s2p
        |        * (1.959963984540054E0 + 0.8416212335729143E0)
        |        * (1.959963984540054E0 + 0.8416212335729143E0)
        |        / (delta * delta)) AS BIGINT)
        |  END AS n_required
        |FROM c""".stripMargin,
    "agg_ratio_metrics" ->
      s"""WITH pu AS (SELECT user_id % 5 AS bucket, user_id,
        |    CAST(SUM(CASE WHEN event_type = 'purchase'
        |      THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
        |      ELSE 0 END) AS BIGINT) AS x,
        |    COUNT(*) AS y
        |  FROM events GROUP BY 1, 2),
        |g AS (SELECT bucket, COUNT(*) AS n_users,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |    SUM(CAST(x AS HUGEINT) * x) AS sxx,
        |    SUM(CAST(x AS HUGEINT) * y) AS sxy,
        |    SUM(CAST(y AS HUGEINT) * y) AS syy
        |  FROM pu GROUP BY bucket),
        |h AS (SELECT bucket, n_users, sy,
        |    CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE) AS r,
        |    floor(CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE) * 1e9 + 0.5)
        |      / 1e9 AS rq,
        |    CAST(sxx AS DOUBLE) AS dxx, CAST(sxy AS DOUBLE) AS dxy,
        |    CAST(syy AS DOUBLE) AS dyy
        |  FROM g),
        |k AS (SELECT bucket, n_users, r,
        |    sqrt(greatest(dxx - 2.0 * rq * dxy + rq * rq * dyy, 0.0))
        |      / CAST(sy AS DOUBLE) AS se
        |  FROM h)
        |SELECT bucket, n_users,
        |  floor(r * $StatScale + 0.5) / $StatScale / 100.0
        |    AS rev_per_event,
        |  floor(se * $LnScale + 0.5) / $LnScale / 100.0 AS se,
        |  floor((r - 1.959963984540054E0 * se) * $StatScale + 0.5)
        |    / $StatScale / 100.0 AS ci_lo,
        |  floor((r + 1.959963984540054E0 * se) * $StatScale + 0.5)
        |    / $StatScale / 100.0 AS ci_hi
        |FROM k ORDER BY bucket""".stripMargin,
    "profile_outlier_mad" ->
      """WITH dly AS (SELECT CAST(ts AS DATE) AS day,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
        |      AS cents
        |  FROM events GROUP BY 1),
        |r1 AS (SELECT cents AS med FROM (
        |  SELECT cents, ROW_NUMBER() OVER (ORDER BY cents, day) AS rn,
        |    COUNT(*) OVER () AS n FROM dly) t WHERE rn = (n + 1) // 2),
        |dv AS (SELECT dly.day, dly.cents, r1.med,
        |    abs(dly.cents - r1.med) AS dev FROM dly, r1),
        |r2 AS (SELECT dev AS mad FROM (
        |  SELECT dev, day, ROW_NUMBER() OVER (ORDER BY dev, day) AS rn,
        |    COUNT(*) OVER () AS n FROM dv) t WHERE rn = (n + 1) // 2)
        |SELECT CAST(dv.day AS TIMESTAMP) AS day_ts,
        |  CAST(dv.cents AS DOUBLE) / 100.0 AS rev,
        |  CAST(dv.med AS DOUBLE) / 100.0 AS median,
        |  CAST(r2.mad AS DOUBLE) / 100.0 AS mad,
        |  CAST(CASE WHEN dv.dev * 10000 > r2.mad * 44478 THEN 1 ELSE 0 END
        |    AS BIGINT) AS is_outlier
        |FROM dv, r2 ORDER BY day_ts""".stripMargin,
    "profile_lorenz" ->
      s"""WITH spend AS (SELECT o_custkey,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
        |      AS cents
        |  FROM orders GROUP BY o_custkey),
        |x AS (SELECT c.c_mktsegment AS segment, s.o_custkey, s.cents,
        |    CAST(NTILE(10) OVER (PARTITION BY c.c_mktsegment
        |      ORDER BY s.cents, s.o_custkey) AS INTEGER) AS decile
        |  FROM spend s JOIN customer c ON s.o_custkey = c.c_custkey),
        |bd AS (SELECT segment, decile, COUNT(*) AS n,
        |    CAST(SUM(cents) AS HUGEINT) AS dsum
        |  FROM x GROUP BY 1, 2),
        |cm AS (SELECT *, SUM(dsum) OVER (PARTITION BY segment
        |      ORDER BY decile
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    SUM(dsum) OVER (PARTITION BY segment) AS tot
        |  FROM bd)
        |SELECT segment, decile, n,
        |  CASE WHEN tot <> 0 THEN
        |    floor(CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE)
        |      * $LnScale + 0.5) / $LnScale END AS cum_share
        |FROM cm ORDER BY segment, decile""".stripMargin,
    "text_js_divergence" ->
      s"""WITH toks AS (SELECT lang, unnest(string_split(text, ' ')) AS tok
        |  FROM documents WHERE lang IN ('en', 'de')),
        |ft AS (SELECT lang, tok FROM toks WHERE length(tok) > 0),
        |byt AS (SELECT tok,
        |    CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS cen,
        |    CAST(COUNT(*) - SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS cde
        |  FROM ft GROUP BY tok),
        |tot AS (SELECT CAST(SUM(cen) AS BIGINT) AS na,
        |    CAST(SUM(cde) AS BIGINT) AS nb, COUNT(*) AS v FROM byt),
        |t AS (SELECT na, nb, v,
        |    CAST(floor((0.5 * (CAST(cen + 1 AS DOUBLE)
        |          / CAST(na + v AS DOUBLE))
        |        * ln((CAST(cen + 1 AS DOUBLE) / CAST(na + v AS DOUBLE))
        |          / ((CAST(cen + 1 AS DOUBLE) / CAST(na + v AS DOUBLE)
        |            + CAST(cde + 1 AS DOUBLE) / CAST(nb + v AS DOUBLE))
        |            / 2.0))
        |      + 0.5 * (CAST(cde + 1 AS DOUBLE) / CAST(nb + v AS DOUBLE))
        |        * ln((CAST(cde + 1 AS DOUBLE) / CAST(nb + v AS DOUBLE))
        |          / ((CAST(cen + 1 AS DOUBLE) / CAST(na + v AS DOUBLE)
        |            + CAST(cde + 1 AS DOUBLE) / CAST(nb + v AS DOUBLE))
        |            / 2.0)))
        |      * $LnScale + 0.5) AS BIGINT) AS iterm
        |  FROM byt, tot)
        |SELECT na AS n_en, nb AS n_de, v AS vocab,
        |  CAST(SUM(iterm) AS DOUBLE) / $LnScale AS js_nats
        |FROM t GROUP BY na, nb, v""".stripMargin,
    "text_zipf" ->
      s"""WITH toks AS (SELECT tok, COUNT(*) AS freq
        |  FROM (SELECT unnest(string_split(text, ' ')) AS tok
        |        FROM documents) WHERE length(tok) > 0 GROUP BY tok),
        |hd AS (SELECT tok, freq FROM toks
        |  ORDER BY freq DESC, tok ASC LIMIT $ZipfHeadN),
        |r AS (SELECT
        |    CAST(floor(ln(CAST(ROW_NUMBER() OVER (ORDER BY freq DESC,
        |      tok ASC) AS DOUBLE)) * $LnScale + 0.5) AS BIGINT) AS lx,
        |    CAST(floor(ln(CAST(freq AS DOUBLE)) * $LnScale + 0.5)
        |      AS BIGINT) AS ly
        |  FROM hd),
        |g AS (SELECT COUNT(*) AS n, SUM(lx) AS sx, SUM(ly) AS sy,
        |    SUM(lx * ly) AS sxy, SUM(lx * lx) AS sxx
        |  FROM r),
        |m AS (SELECT CAST(n AS DOUBLE) AS nd,
        |    CAST(sx AS DOUBLE) / $LnScale AS a,
        |    CAST(sy AS DOUBLE) / $LnScale AS b,
        |    CAST(sxy AS DOUBLE) / ${LnScale * LnScale} AS c,
        |    CAST(sxx AS DOUBLE) / ${LnScale * LnScale} AS e
        |  FROM g),
        |f AS (SELECT nd, a, b,
        |    CASE WHEN nd * e - a * a <> 0.0 THEN
        |      (nd * c - a * b) / (nd * e - a * a) END AS slope
        |  FROM m)
        |SELECT CAST(nd AS BIGINT) AS n_vocab,
        |  floor(slope * $StatScale + 0.5) / $StatScale AS zipf_slope,
        |  floor((b - slope * a) / nd * $StatScale + 0.5) / $StatScale
        |    AS ln_intercept
        |FROM f""".stripMargin
  )
}
