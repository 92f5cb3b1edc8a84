package graft.operators

import graft.{Det, Q, QueryModule, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** §2.14 (round 4) data-quality + pipeline-diagnostic operators: the
  * audits a production ETL runs against every snapshot before and after
  * the curation loop — constraint validation, cross-table reconciliation,
  * snapshot-to-snapshot drift, join-key skew diagnosis, and percentile
  * winsorization.
  *
  * Scale notes:
  *  - every audit here is a one-or-two-pass aggregate: violations are
  *    counted with conditional aggregates in a SINGLE scan (never one
  *    scan per rule), reconciliation is one partial-aggregated shuffle on
  *    the join key, and drift compares two time windows inside one
  *    grouped aggregate instead of scanning the snapshot twice.
  *  - result frames are O(groups), not O(rows) — at 100 TB the audit
  *    output is a handful of rows either way, so nothing here returns a
  *    corpus-sized frame.
  *  - exactness discipline matches Core.Det: money sums ride decimal,
  *    shares/ratios are single IEEE divisions of exact integers — both
  *    engines perform the identical operation, so oracle hashes match.
  */
object QualityOps extends QueryModule {

  /** 2024-01-15 00:00 UTC / 2024-01-01 / 2024-02-01, in epoch seconds.
    * Second-granularity comparison is ns/µs-truncation safe (SURVEY §5.3:
    * events.ts is ns in parquet, µs after the Spark-side read). */
  private val cutMid = 1705276800L
  private val cutLo = 1704067200L
  private val cutHi = 1706745600L

  private val knownTypes = Seq("click", "error", "purchase", "signup", "view")

  /** The star schema's FK edges: (edge label, child table, fk col,
    * parent table, pk col). Shared by the query and the generated
    * oracle so both audit the identical edge list. */
  private val FkEdges = Seq(
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
      "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey",
      "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
      "supplier", "s_suppkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey",
      "customer", "c_custkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey",
      "nation", "n_nationkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey",
      "nation", "n_nationkey"),
    ("nation.n_regionkey->region", "nation", "n_regionkey",
      "region", "r_regionkey"))

  override def queries: Map[String, Q.Fn] = Map(
    // referential-integrity audit over every FK edge of the star schema
    // (the snapshot gate a warehouse load runs before publishing): per
    // edge, child cardinality, orphan FKs (left_anti against the
    // parent), NULL FKs, parent-PK duplicates, and the pass verdict.
    // One anti-join + one distinct-count per edge — each is a
    // broadcast-sized parent at any realistic dimension scale, and the
    // verdict frame is O(edges). 100 TB: the fact-side anti-joins are
    // the only wide work; they shuffle fk hashes only.
    "validate_pk_fk" -> ((s, d) => {
      import s.implicits._
      val per = FkEdges.map { case (label, child, fk, parent, pk) =>
        val c = Tables.t(s, d, child)
        val p = Tables.t(s, d, parent)
        val orphans = c.select(col(fk)).where(col(fk).isNotNull)
          .join(p.select(col(pk)), col(fk) === col(pk), "left_anti")
          .agg(count(lit(1)).as("n_orphans"))
          .select(lit(label).as("edge"), col("n_orphans"))
        // coalesce: sum over an EMPTY child is NULL in Spark while the
        // oracle's COUNT(*) WHERE is 0 — an empty table must read as a
        // passing edge, not a NULL verdict
        val stats = c.agg(count(lit(1)).as("n_child"),
            coalesce(sum(when(col(fk).isNull, 1L).otherwise(0L)), lit(0L))
              .as("n_null_fk"))
          .select(lit(label).as("edge"), col("n_child"), col("n_null_fk"))
        val pdups = p.agg((count(lit(1)) - countDistinct(col(pk)))
            .as("n_pk_dups"))
          .select(lit(label).as("edge"), col("n_pk_dups"))
        stats.join(orphans, "edge").join(pdups, "edge")
      }
      per.reduce(_.unionByName(_))
        .select(col("edge"), col("n_child"), col("n_null_fk"),
          col("n_orphans"), col("n_pk_dups"),
          (col("n_null_fk") === 0L && col("n_orphans") === 0L &&
            col("n_pk_dups") === 0L).cast(LongType).as("is_valid"))
        .orderBy("edge")
    }),
    // rule-based constraint audit: six declared invariants counted in ONE
    // scan via conditional aggregates, stacked to (rule, checked,
    // violations) rows. A per-rule-scan formulation would read the
    // snapshot six times; this reads it once — the shape that matters
    // when the snapshot is 100 TB.
    "validate_constraints" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("value"), col("event_type"), col("user_id"),
          get_json_object(col("props"), "$.k").cast(IntegerType).as("k"),
          unix_timestamp(col("ts")).as("tsec"))
        .agg(
          count(lit(1)).as("n"),
          expr("count_if(value < 0)").as("v_neg"),
          expr("count_if(value > 500)").as("v_hi"),
          expr(s"count_if(event_type NOT IN (${knownTypes.map("'" + _ + "'").mkString(",")}))")
            .as("v_type"),
          expr("count_if(k IS NULL OR k < 0 OR k > 99)").as("v_props"),
          expr(s"count_if(tsec < $cutLo OR tsec >= $cutHi)").as("v_window"),
          expr("count_if(user_id < 0 OR user_id >= 10000)").as("v_user"))
        .select(expr(
          """stack(6,
            |  'props_k_in_0_99',   n, v_props,
            |  'ts_in_jan_2024',    n, v_window,
            |  'type_in_vocab',     n, v_type,
            |  'user_id_in_range',  n, v_user,
            |  'value_le_500',      n, v_hi,
            |  'value_nonneg',      n, v_neg) AS (rule, n_checked, n_violations)
            |""".stripMargin))
        .orderBy("rule")),

    // cross-table reconciliation: recompute each order's charge from its
    // line items (decimal-exact sum, one partial-aggregated shuffle on
    // the natural join key) and classify every order against the stored
    // total. diff stays DECIMAL end-to-end — exact under any partial/
    // final aggregation split across 1000 executors.
    "validate_reconcile" -> ((s, d) => {
      val per = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(
          sum(Det.dec6(col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
            (lit(1.0) + col("l_tax")))).as("charge"),
          count(lit(1)).as("n_lines"))
      Tables.orders(s, d)
        .join(per, col("o_orderkey") === col("l_orderkey"), "left")
        .select(col("o_orderstatus"), col("n_lines"),
          (Det.dec2(col("o_totalprice")) - col("charge")).as("diff"))
        .groupBy("o_orderstatus")
        .agg(
          count(lit(1)).as("n_orders"),
          expr("count_if(n_lines IS NULL)").as("n_no_lines"),
          expr("count_if(n_lines IS NOT NULL AND abs(diff) <= 1.0)").as("n_matched"),
          expr("count_if(n_lines IS NOT NULL AND abs(diff) > 1.0)").as("n_mismatched"),
          coalesce(sum(abs(col("diff"))), lit(0)).cast(DoubleType).as("total_drift"))
        .orderBy("o_orderstatus")
    }),

    // snapshot drift profile: per-category share in the first half of the
    // month vs the second, |Δshare| as the drift signal. Both windows are
    // counted in ONE grouped aggregate (count_if on the window predicate);
    // totals come from an unpartitioned window over the O(categories)
    // grouped frame — never a second scan of the snapshot.
    "profile_drift" -> ((s, d) => {
      val g = Tables.events(s, d)
        .groupBy("event_type")
        .agg(
          expr(s"count_if(unix_timestamp(ts) < $cutMid)").as("n_a"),
          expr(s"count_if(unix_timestamp(ts) >= $cutMid)").as("n_b"))
      val all = Window.partitionBy(lit(1))
      g.select(col("event_type"), col("n_a"), col("n_b"),
          (col("n_a").cast(DoubleType) / sum("n_a").over(all)).as("share_a"),
          (col("n_b").cast(DoubleType) / sum("n_b").over(all)).as("share_b"))
        .withColumn("drift", abs(col("share_a") - col("share_b")))
        .orderBy("event_type")
    }),

    // two-sample Kolmogorov–Smirnov test: is the purchase-value
    // distribution the same as the view-value distribution? The classic
    // nonparametric drift test complementing profile_drift's share
    // deltas (which only see category frequencies, not value shapes).
    // Exactness: values compact to cents; the ECDF difference is kept
    // as the INTEGER cross-product |n1cum·N2 − n2cum·N1| (no division
    // until the final row), so the supremum is chosen in exact integer
    // space and only the reported statistic performs one IEEE division.
    // The α=0.05 decision compares D against c(α)·√((N1+N2)/(N1·N2)),
    // c = 1.358 — sqrt is correctly-rounded IEEE, identical on both
    // engines. Scale shape: value compaction is a map-side-combined
    // groupBy to O(distinct cents) rows; the cumulative window rides
    // that compacted frame (the agg_weighted_percentile discipline),
    // never a per-row sort.
    "profile_ks_test" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .where(col("event_type").isin("purchase", "view"))
        .select((Det.dec2(col("value")) * 100).cast(LongType).as("vc"),
          col("event_type"))
      val byVal = ev.groupBy("vc")
        .agg(count(when(col("event_type") === "purchase", 1)).as("c1"),
          count(when(col("event_type") === "view", 1)).as("c2"))
      val cum = Window.orderBy("vc")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = Window.partitionBy(lit(1))
      // the global cumulative window is over O(distinct cents) rows —
      // bounded by the value domain (~49k here), not the corpus
      val cw = byVal
        .withColumn("n1c", sum("c1").over(cum))
        .withColumn("n2c", sum("c2").over(cum))
        .withColumn("n1", sum("c1").over(tot))
        .withColumn("n2", sum("c2").over(tot))
        .withColumn("dnum", abs(col("n1c") * col("n2") - col("n2c") * col("n1")))
      cw.groupBy("n1", "n2").agg(max("dnum").as("dn"))
        .select(col("n1"), col("n2"),
          (col("dn").cast(DoubleType) /
            (col("n1") * col("n2")).cast(DoubleType)).as("ks_stat"),
          when(col("dn").cast(DoubleType) /
            (col("n1") * col("n2")).cast(DoubleType) >
            lit(1.358) * sqrt((col("n1") + col("n2")).cast(DoubleType) /
              (col("n1") * col("n2")).cast(DoubleType)), 1L)
            .otherwise(0L).as("reject_h0"))
    }),

    // join-key skew diagnosis — the check that decides whether a join
    // needs salting (join_skew_salted) BEFORE it runs: per-key counts
    // (one partial-aggregated shuffle carrying O(distinct keys)), then
    // top-5 heavy hitters with share-of-total and a skew ratio
    // (count × n_keys / total; 1.0 = perfectly uniform).
    // Scale shape (round 7, VERDICT r6 #1): the diagnostic itself must
    // not be the bottleneck on the high-cardinality keys it exists to
    // check. Totals ride a 1-row aggregate crossJoined back broadcast;
    // the top-5 plans as TakeOrderedAndProject (per-partition partial
    // top-k, no global sort); the rank is a 5×5 broadcast
    // predecessor-count self-join. The previous form put the WHOLE
    // per-key count frame through single-partition windows — O(keys)
    // on one task. The per-key count subtree appears three times but
    // is one physical scan (ReuseExchange; PlanSpec asserts this and
    // that the plan is Window-free).
    "profile_skew" -> ((s, d) => {
      val counts = Tables.lineitem(s, d)
        .groupBy("l_suppkey").agg(count(lit(1)).as("cnt"))
      val tot = counts.agg(sum("cnt").as("tot"), count(lit(1)).as("n_keys"))
      val top5 = counts.orderBy(col("cnt").desc, col("l_suppkey")).limit(5)
      top5.join(broadcast(top5.select(col("l_suppkey").as("b_key"),
            col("cnt").as("b_cnt"))),
          col("b_cnt") > col("cnt") ||
            (col("b_cnt") === col("cnt") && col("b_key") <= col("l_suppkey")))
        .groupBy("l_suppkey", "cnt")
        .agg(count(lit(1)).as("rk"))
        .crossJoin(broadcast(tot))
        .select(col("rk"), col("l_suppkey"), col("cnt"),
          (col("cnt").cast(DoubleType) / col("tot")).as("share"),
          ((col("cnt") * col("n_keys")).cast(DoubleType) / col("tot"))
            .as("skew_ratio"))
        .orderBy("rk")
    }),

    // day-level volume anomaly detection: daily event counts vs the
    // month's mean/std, |z| >= 2 flags the outlier days — the freshness/
    // volume monitor every ingest pipeline runs. Moments are exact
    // integer sums over the O(days) grouped frame (same discipline as
    // profile_corr), so mean/std/z are shared double expressions and the
    // flags cannot drift between engines. Day counts come from ONE scan;
    // the unpartitioned second-level agg runs on 31 rows.
    // partition-freshness / completeness audit: "did every expected
    // daily partition land, and did any land suspiciously thin?" — the
    // first check a 100 TB ingest runs each morning. The expected grid
    // comes from the observed [min,max] day span (one 1-row broadcast
    // aggregate + a sequence explode over DAYS — grid size is calendar-
    // bounded, never row-bounded); each day reports its row count, a
    // missing flag, and a thin flag against half the overall daily mean
    // (exact integer cross-multiply 2·n·days < N — no float boundary).
    "validate_freshness" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n_events"))
      val span = daily.agg(min("day").as("d0"), max("day").as("d1"),
        sum("n_events").as("total"), count(lit(1)).as("n_days"))
      val grid = span.select(
        explode(expr("sequence(d0, d1, interval 1 day)")).as("day"),
        col("total"), col("n_days"))
      grid.join(daily, Seq("day"), "left")
        .select(col("day").cast("timestamp").as("day_ts"),
          coalesce(col("n_events"), lit(0L)).as("n_events"),
          when(col("n_events").isNull, 1L).otherwise(0L).as("is_missing"),
          when(coalesce(col("n_events"), lit(0L)) * col("n_days") * 2
            < col("total"), 1L).otherwise(0L).as("is_thin"))
        .orderBy("day_ts")
    }),

    "validate_anomaly" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      val m = daily.agg(
        count(lit(1)).as("nd"),
        sum("n").as("s1"),
        sum(col("n") * col("n")).as("s2"))
      val nd = col("nd").cast(DoubleType)
      val mean = col("s1").cast(DoubleType) / nd
      val variance = col("s2").cast(DoubleType) / nd - mean * mean
      daily.crossJoin(broadcast(m))
        .select(col("day"), col("n"),
          ((col("n").cast(DoubleType) - mean) / sqrt(variance)).as("z"))
        .where(abs((col("n").cast(DoubleType) - mean) / sqrt(variance)) >= 2.0)
        .orderBy("day")
    }),

    // percentile winsorization audit: per-stratum exact p01/p99 bounds
    // (first pass), then clip classification + inlier sum in a second
    // pass with the 3-row bounds frame broadcast. Exact percentile is
    // inherently two-pass; the sketch sibling (agg_approx_percentile)
    // is the one-pass form at 100 TB.
    "clean_outliers" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val bounds = li.groupBy("l_returnflag")
        .agg(expr("percentile(l_extendedprice, 0.01)").as("lo"),
          expr("percentile(l_extendedprice, 0.99)").as("hi"))
      li.join(broadcast(bounds), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
          min("lo").as("p01"), min("hi").as("p99"),
          count(lit(1)).as("n"),
          expr("count_if(l_extendedprice < lo)").as("n_lo"),
          expr("count_if(l_extendedprice > hi)").as("n_hi"),
          sum(Det.dec2(when(col("l_extendedprice").between(col("lo"), col("hi")),
            col("l_extendedprice")))).cast(DoubleType).as("inlier_sum"))
        .orderBy("l_returnflag")
    })
  )

  override def oracles: Map[String, String] = Map(
    // generated from the SAME FkEdges list the query audits
    "validate_pk_fk" -> {
      val branches = FkEdges.map { case (label, child, fk, parent, pk) =>
        s"""SELECT '$label' AS edge,
           |  (SELECT COUNT(*) FROM $child) AS n_child,
           |  (SELECT COUNT(*) FROM $child WHERE $fk IS NULL)
           |    AS n_null_fk,
           |  (SELECT COUNT(*) FROM $child c WHERE c.$fk IS NOT NULL
           |    AND NOT EXISTS (SELECT 1 FROM $parent p
           |      WHERE p.$pk = c.$fk)) AS n_orphans,
           |  (SELECT COUNT(*) - COUNT(DISTINCT $pk) FROM $parent)
           |    AS n_pk_dups""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""SELECT edge, n_child, n_null_fk, n_orphans, n_pk_dups,
         |  CAST(CASE WHEN n_null_fk = 0 AND n_orphans = 0
         |    AND n_pk_dups = 0 THEN 1 ELSE 0 END AS BIGINT) AS is_valid
         |FROM (
         |$branches
         |) ORDER BY edge""".stripMargin
    },
    "validate_freshness" ->
      """WITH dly AS (SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_events
        |  FROM events GROUP BY 1),
        |sp AS (SELECT MIN(day) AS d0, MAX(day) AS d1,
        |    CAST(SUM(n_events) AS BIGINT) AS total,
        |    COUNT(*) AS n_days FROM dly),
        |g AS (SELECT CAST(gs AS DATE) AS day, total, n_days
        |  FROM sp, unnest(generate_series(CAST(d0 AS TIMESTAMP),
        |    CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS u(gs))
        |SELECT CAST(g.day AS TIMESTAMP) AS day_ts,
        |  COALESCE(dly.n_events, 0) AS n_events,
        |  CAST(CASE WHEN dly.n_events IS NULL THEN 1 ELSE 0 END
        |    AS BIGINT) AS is_missing,
        |  CAST(CASE WHEN COALESCE(dly.n_events, 0) * g.n_days * 2
        |    < g.total THEN 1 ELSE 0 END AS BIGINT) AS is_thin
        |FROM g LEFT JOIN dly ON g.day = dly.day
        |ORDER BY day_ts""".stripMargin,
    "validate_constraints" ->
      s"""WITH a AS (SELECT count(*) AS n,
        |  COUNT(*) FILTER (WHERE value < 0) AS v_neg,
        |  COUNT(*) FILTER (WHERE value > 500) AS v_hi,
        |  COUNT(*) FILTER (WHERE event_type NOT IN
        |    (${knownTypes.map("'" + _ + "'").mkString(",")})) AS v_type,
        |  COUNT(*) FILTER (WHERE k IS NULL OR k < 0 OR k > 99) AS v_props,
        |  COUNT(*) FILTER (WHERE tsec < $cutLo OR tsec >= $cutHi) AS v_window,
        |  COUNT(*) FILTER (WHERE user_id < 0 OR user_id >= 10000) AS v_user
        |FROM (SELECT value, event_type, user_id,
        |        CAST(json_extract_string(props, '$$.k') AS INT) AS k,
        |        epoch_ms(ts) // 1000 AS tsec
        |      FROM events))
        |SELECT rule, n AS n_checked, v AS n_violations FROM (
        |  SELECT 'props_k_in_0_99' AS rule, n, v_props AS v FROM a
        |  UNION ALL SELECT 'ts_in_jan_2024', n, v_window FROM a
        |  UNION ALL SELECT 'type_in_vocab', n, v_type FROM a
        |  UNION ALL SELECT 'user_id_in_range', n, v_user FROM a
        |  UNION ALL SELECT 'value_le_500', n, v_hi FROM a
        |  UNION ALL SELECT 'value_nonneg', n, v_neg FROM a)
        |ORDER BY rule""".stripMargin,
    "validate_reconcile" ->
      """WITH per AS (SELECT l_orderkey,
        |    SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)
        |        AS DECIMAL(26,6))) AS charge,
        |    COUNT(*) AS n_lines
        |  FROM lineitem GROUP BY l_orderkey),
        |j AS (SELECT o_orderstatus, n_lines,
        |    CAST(o_totalprice AS DECIMAL(18,2)) - charge AS diff
        |  FROM orders LEFT JOIN per ON o_orderkey = l_orderkey)
        |SELECT o_orderstatus,
        |  COUNT(*) AS n_orders,
        |  COUNT(*) FILTER (WHERE n_lines IS NULL) AS n_no_lines,
        |  COUNT(*) FILTER (WHERE n_lines IS NOT NULL AND ABS(diff) <= 1.0)
        |    AS n_matched,
        |  COUNT(*) FILTER (WHERE n_lines IS NOT NULL AND ABS(diff) > 1.0)
        |    AS n_mismatched,
        |  CAST(COALESCE(SUM(ABS(diff)), 0) AS DOUBLE) AS total_drift
        |FROM j GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "profile_ks_test" ->
      """WITH ev AS (SELECT
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc,
        |    event_type
        |  FROM events WHERE event_type IN ('purchase', 'view')),
        |bv AS (SELECT vc,
        |    COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS c1,
        |    COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS c2
        |  FROM ev GROUP BY vc),
        |cw AS (SELECT vc,
        |    SUM(c1) OVER w AS n1c, SUM(c2) OVER w AS n2c,
        |    SUM(c1) OVER () AS n1, SUM(c2) OVER () AS n2
        |  FROM bv WINDOW w AS (ORDER BY vc
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |m AS (SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
        |    CAST(MAX(abs(n1c * n2 - n2c * n1)) AS BIGINT) AS dn
        |  FROM cw GROUP BY n1, n2)
        |SELECT n1, n2,
        |  CAST(dn AS DOUBLE) / CAST(n1 * n2 AS DOUBLE) AS ks_stat,
        |  CAST(CASE WHEN CAST(dn AS DOUBLE) / CAST(n1 * n2 AS DOUBLE) >
        |      1.358 * sqrt(CAST(n1 + n2 AS DOUBLE)
        |        / CAST(n1 * n2 AS DOUBLE))
        |    THEN 1 ELSE 0 END AS BIGINT) AS reject_h0
        |FROM m""".stripMargin,
    "profile_drift" ->
      s"""WITH g AS (SELECT event_type,
        |    COUNT(*) FILTER (WHERE epoch_ms(ts) // 1000 < $cutMid) AS n_a,
        |    COUNT(*) FILTER (WHERE epoch_ms(ts) // 1000 >= $cutMid) AS n_b
        |  FROM events GROUP BY event_type)
        |SELECT event_type, n_a, n_b,
        |  CAST(n_a AS DOUBLE) / SUM(n_a) OVER () AS share_a,
        |  CAST(n_b AS DOUBLE) / SUM(n_b) OVER () AS share_b,
        |  ABS(CAST(n_a AS DOUBLE) / SUM(n_a) OVER ()
        |    - CAST(n_b AS DOUBLE) / SUM(n_b) OVER ()) AS drift
        |FROM g ORDER BY event_type""".stripMargin,
    "profile_skew" ->
      """WITH c AS (SELECT l_suppkey, COUNT(*) AS cnt
        |  FROM lineitem GROUP BY l_suppkey),
        |r AS (SELECT l_suppkey, cnt,
        |    ROW_NUMBER() OVER (ORDER BY cnt DESC, l_suppkey) AS rk,
        |    SUM(cnt) OVER () AS tot,
        |    COUNT(*) OVER () AS n_keys
        |  FROM c)
        |SELECT CAST(rk AS BIGINT) AS rk, l_suppkey, cnt,
        |  CAST(cnt AS DOUBLE) / tot AS share,
        |  CAST(cnt * n_keys AS DOUBLE) / tot AS skew_ratio
        |FROM r WHERE rk <= 5 ORDER BY rk""".stripMargin,
    "validate_anomaly" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n
        |  FROM events GROUP BY 1),
        |m AS (SELECT COUNT(*) AS nd, SUM(n) AS s1, SUM(n * n) AS s2
        |  FROM daily)
        |SELECT day, n,
        |  (CAST(n AS DOUBLE) - CAST(s1 AS DOUBLE) / CAST(nd AS DOUBLE))
        |    / sqrt(CAST(s2 AS DOUBLE) / CAST(nd AS DOUBLE)
        |        - (CAST(s1 AS DOUBLE) / CAST(nd AS DOUBLE))
        |          * (CAST(s1 AS DOUBLE) / CAST(nd AS DOUBLE))) AS z
        |FROM daily, m
        |WHERE abs((CAST(n AS DOUBLE) - CAST(s1 AS DOUBLE) / CAST(nd AS DOUBLE))
        |    / sqrt(CAST(s2 AS DOUBLE) / CAST(nd AS DOUBLE)
        |        - (CAST(s1 AS DOUBLE) / CAST(nd AS DOUBLE))
        |          * (CAST(s1 AS DOUBLE) / CAST(nd AS DOUBLE)))) >= 2.0
        |ORDER BY day""".stripMargin,
    "clean_outliers" ->
      """WITH b AS (SELECT l_returnflag AS rf,
        |    quantile_cont(l_extendedprice, 0.01) AS lo,
        |    quantile_cont(l_extendedprice, 0.99) AS hi
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag,
        |  min(lo) AS p01, min(hi) AS p99,
        |  COUNT(*) AS n,
        |  COUNT(*) FILTER (WHERE l_extendedprice < lo) AS n_lo,
        |  COUNT(*) FILTER (WHERE l_extendedprice > hi) AS n_hi,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
        |    FILTER (WHERE l_extendedprice BETWEEN lo AND hi) AS DOUBLE)
        |    AS inlier_sum
        |FROM lineitem JOIN b ON l_returnflag = rf
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  )
}
