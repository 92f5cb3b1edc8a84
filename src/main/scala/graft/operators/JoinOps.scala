package graft.operators

import graft.{Det, Q, QueryModule, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.3 joins.
  *
  * Scale notes per operator:
  *  - dims (region/nation/part/supplier/customer) are broadcast — explicit
  *    `broadcast()` hints where the join must never degrade to a shuffle.
  *  - fact⋈fact (orders⋈lineitem) shuffles on the join key; both sides are
  *    hash-partitioned on the same key, so AQE can coalesce/split skew.
  *  - as-of is implemented as ONE window pass over a single shuffle by
  *    user_id — not the naive range join, whose output is O(purchases ×
  *    prior clicks) and explodes at 100 TB.
  *  - the interval self-join is an equi-join on user_id with a bounded
  *    time predicate; per-user cardinality is bounded, so the post-join
  *    filter cannot explode. (For unbounded keys one would bucket by
  *    (user_id, time_bucket) instead.)
  */
object JoinOps extends QueryModule {
  import Det._

  override def queries: Map[String, Q.Fn] = Map(
    "join_broadcast" -> ((s, d) =>
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)),
          col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_items"),
          dsum(col("l_quantity")).as("sum_qty"))
        .orderBy("p_brand")),

    "join_shuffle" -> ((s, d) =>
      Tables.orders(s, d)
        .join(Tables.lineitem(s, d),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          dsum4(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("revenue"))
        .orderBy("o_orderpriority")),

    // TPC-H Q5 shape: local-supplier revenue per nation in ASIA.
    // Dim chain nation⋈region broadcasts; customer/supplier broadcast
    // into the orders⋈lineitem shuffle.
    "join_multiway" -> ((s, d) => {
      val asiaNations = Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d).where(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(Tables.supplier(s, d)),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(asiaNations), col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(dsum4(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
        .orderBy("n_name")
    }),

    "join_left" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"),
          "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy("c_custkey")),

    // right-outer mirror of join_left: orders on the stream side, every
    // customer preserved from the build side
    "join_right" -> ((s, d) =>
      Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"),
          "right_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"),
          dsum(col("o_totalprice")).as("sum_price"))
        .orderBy("c_custkey")),

    "join_full" -> ((s, d) => {
      val cn = Tables.customer(s, d).groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_cust"))
      val sn = Tables.supplier(s, d).groupBy("s_nationkey")
        .agg(count(lit(1)).as("n_supp"))
      cn.join(sn, cn("c_nationkey") === sn("s_nationkey"), "full_outer")
        .select(
          coalesce(col("c_nationkey"), col("s_nationkey")).as("nationkey"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
        .orderBy("nationkey")
    }),

    "join_semi" -> ((s, d) =>
      Tables.orders(s, d)
        .join(Tables.lineitem(s, d).where(col("l_quantity") >= 49),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .select("o_orderkey")
        .orderBy("o_orderkey")),

    // customers with no URGENT order (plain no-orders is empty at sf0.01)
    "join_anti" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d).where(col("o_orderpriority") === "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")),

    "join_cross" -> ((s, d) =>
      Tables.region(s, d).crossJoin(Tables.nation(s, d))
        .select(col("r_name"), col("n_name"))
        .orderBy("r_name", "n_name")),

    // non-equi band join → BroadcastNestedLoopJoin with a 4-row build side
    "join_theta_range" -> ((s, d) => {
      val bands = s.createDataFrame(Seq(
        (0, 0.0, 50.0), (1, 50.0, 100.0), (2, 100.0, 200.0),
        (3, 200.0, 600.0)))
        .toDF("band_id", "lo", "hi")
      Tables.events(s, d)
        .join(broadcast(bands),
          col("value") >= col("lo") && col("value") < col("hi"))
        .groupBy("band_id")
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
        .orderBy("band_id")
    }),

    // as-of: latest click at-or-before each purchase, per user.
    // Single window pass (events are ts-monotonic in event_id, FIXTURES.md,
    // so MAX(click event_id) over the preceding frame IS the latest click —
    // avoids IGNORE NULLS, which DuckDB and Spark spell differently).
    "join_asof" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("last_click",
          max(when(col("event_type") === "click", col("event_id"))).over(w))
        .where(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"),
          coalesce(col("last_click"), lit(-1L)).as("c_id"))
        .orderBy("p_id")
    }),

    // as-of NEAREST (round 6b): the bidirectional variant — for each
    // purchase the closest click in EITHER direction by |Δts|, ties to
    // the backward match (the pandas merge_asof direction='nearest'
    // semantics time-series alignment needs when events interleave).
    // Same two-window single-pass shape as join_asof (backward running
    // max + forward running min, both (ts, event_id)-ordered; events.ts
    // is monotone in event_id per FIXTURES.md so the id extrema carry
    // their timestamps), and the Δ comparison runs in exact integer
    // MICROSECONDS (unix_micros both engines) — no float boundary.
    // 100 TB: one user_id-partitioned window pass, no join at all.
    "join_asof_nearest" -> ((s, d) => {
      val ord = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
      val wb = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wf = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val clickId = when(col("event_type") === "click", col("event_id"))
      val clickUs = when(col("event_type") === "click",
        unix_micros(col("ts")))
      Tables.events(s, d)
        .withColumn("b_id", max(clickId).over(wb))
        .withColumn("b_us", max(clickUs).over(wb))
        .withColumn("f_id", min(clickId).over(wf))
        .withColumn("f_us", min(clickUs).over(wf))
        .where(col("event_type") === "purchase")
        .withColumn("p_us", unix_micros(col("ts")))
        .select(col("event_id").as("p_id"), col("user_id"),
          when(col("b_id").isNull && col("f_id").isNull, lit(-1L))
            .when(col("f_id").isNull, col("b_id"))
            .when(col("b_id").isNull, col("f_id"))
            .when(col("p_us") - col("b_us") <= col("f_us") - col("p_us"),
              col("b_id"))
            .otherwise(col("f_id")).as("c_id"),
          when(col("b_id").isNull && col("f_id").isNull, lit(-1L))
            .when(col("f_id").isNull, col("p_us") - col("b_us"))
            .when(col("b_id").isNull, col("f_us") - col("p_us"))
            .otherwise(least(col("p_us") - col("b_us"),
              col("f_us") - col("p_us"))).as("delta_us"))
        .orderBy("p_id")
    }),

    // as-of with TOLERANCE: same single window pass as join_asof, but a
    // match only counts if the latest click is within 30 minutes of the
    // purchase — the bounded-staleness form every real as-of join API
    // exposes. events.ts is monotone in event_id (FIXTURES.md), so the
    // running max of click ts IS the ts of the latest click.
    "join_asof_tol" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("last_click",
          max(when(col("event_type") === "click", col("event_id"))).over(w))
        .withColumn("last_click_ts",
          max(when(col("event_type") === "click", col("ts"))).over(w))
        .where(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"),
          when(col("last_click_ts") >=
              col("ts") - expr("INTERVAL 30 MINUTE"), col("last_click"))
            .otherwise(lit(-1L)).as("c_id"))
        .orderBy("p_id")
    }),

    // bucketed co-located join: both facts pre-bucketed on the join key,
    // so the join itself needs no shuffle (PlanSpec asserts zero
    // exchanges on this shape). At 100 TB this is the amortize-once
    // answer for a fact⋈fact join that runs every day.
    "join_bucketed" -> ((s, d) => {
      val (bkOrders, bkLineitem) = Fixtures.bucketedTables(s, d)
      s.table(bkOrders)
        .join(s.table(bkLineitem),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_items"),
          dsum(col("l_quantity")).as("sum_qty"))
        .orderBy("o_orderstatus")
    }),

    // cost-based join reordering: the query is WRITTEN worst-first
    // (fact ⋈ fact, selective dim last); CostBasedJoinReorder uses the
    // ANALYZE'd catalog stats (Fixtures.statsTables) to rewrite it
    // selective-first — orders ⋈ σ(customer) runs before lineitem joins
    // in, shrinking the big join's probe side ~5× (PlanSpec asserts the
    // reordered shape). This is the ad-hoc-join answer the hand-ordered
    // star joins above don't need but a real user writing arbitrary
    // multiway joins does; at 100 TB per-snapshot ANALYZE is standard
    // warehouse hygiene and the stats are O(columns) metadata. CBO confs
    // are session-local, so the query plans in a cloned session (the
    // GraphOps pattern) — nothing leaks into concurrently planned queries.
    "join_cbo_reorder" -> ((s, d) => {
      val (tc, to, tl) = Fixtures.statsTables(s, d)
      val cbo = s.newSession()
      cbo.conf.set("spark.sql.shuffle.partitions",
        s.conf.get("spark.sql.shuffle.partitions"))
      cbo.conf.set("spark.sql.cbo.enabled", "true")
      cbo.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      cbo.table(tl)
        .join(cbo.table(to), col("l_orderkey") === col("o_orderkey"))
        .join(cbo.table(tc).where(col("c_mktsegment") === "BUILDING"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          dsum4(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("revenue"))
        .orderBy("o_orderpriority")
    }),

    // dynamic partition pruning: the fact is laid out partitioned by lang
    // (Fixtures.docsByLang); the dim-side tier filter is only known at run
    // time, so Catalyst injects a dynamicpruning subquery into the fact
    // scan's PartitionFilters — at 100 TB the fact reads ONLY the
    // partitions the filtered dim keeps, without the user hand-writing the
    // partition predicate. PlanSpec asserts the dynamicpruning expression
    // is present.
    "join_dpp" -> ((s, d) => {
      val fact = s.read.schema(Tables.documents(s, d).schema)
        .parquet(Fixtures.docsByLang(s, d))
      val dim = s.read.parquet(Fixtures.langDim(s, d))
        .where(col("tier") === "hot")
      fact.join(broadcast(dim), "lang")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
        .orderBy("lang")
    }),

    // the same interval-pair semantics with a time-bucketed equi-key:
    // events land in 5-min buckets, the probe side also checks the
    // previous bucket, so the join key is (user_id, bucket) and every
    // candidate pair is within one bucket width. At 100 TB this bounds
    // the per-task pair space by bucket population, not by per-user
    // history — the standard rewrite when single users span years of
    // events. Output is identical to join_interval (same oracle).
    "join_interval_bucketed" -> ((s, d) => {
      val bucket = (unix_timestamp(col("ts")) / lit(300L)).cast("long")
      val e1 = Tables.events(s, d)
        .select(col("event_id").as("id1"), col("user_id").as("u"),
          col("ts").as("ts1"), bucket.as("bkt"))
      // probe side fans out to its own and the NEXT bucket so pairs that
      // straddle a boundary are found exactly once from the left row
      val e2 = Tables.events(s, d)
        .select(col("event_id").as("id2"), col("user_id").as("u"),
          col("ts").as("ts2"), bucket.as("b0"))
        .withColumn("bkt", explode(array(col("b0"), col("b0") - 1)))
        .drop("b0")
      e1.join(e2, Seq("u", "bkt"))
        .where(col("id2") > col("id1") &&
          col("ts2") >= col("ts1") &&
          col("ts2") <= col("ts1") + expr("INTERVAL 5 MINUTE"))
        .groupBy(col("u").as("user_id"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("user_id")
    }),

    // pairs of same-user events within a 5-minute interval
    "join_interval" -> ((s, d) => {
      val e1 = Tables.events(s, d)
        .select(col("event_id").as("id1"), col("user_id").as("u1"),
          col("ts").as("ts1"))
      val e2 = Tables.events(s, d)
        .select(col("event_id").as("id2"), col("user_id").as("u2"),
          col("ts").as("ts2"))
      e1.join(e2, col("u1") === col("u2") && col("id2") > col("id1") &&
          col("ts2") >= col("ts1") &&
          col("ts2") <= col("ts1") + expr("INTERVAL 5 MINUTE"))
        .groupBy(col("u1").as("user_id"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("user_id")
    }),

    // correlated LATERAL join (Spark 4 SQL): top-2 highest-value line
    // items PER ORDER via a per-row subquery with ORDER BY + LIMIT.
    // Catalyst decorrelates this into a window-rank over one shuffle —
    // same physical shape as win_topk_group — so the per-row subquery
    // never executes row-at-a-time; the surface is what SQL-first users
    // migrate with.
    "join_lateral" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("lat_orders")
      Tables.lineitem(s, d).createOrReplaceTempView("lat_lineitem")
      s.sql(
        """SELECT o_orderkey, t.l_linenumber, t.l_extendedprice
          |FROM lat_orders,
          |  LATERAL (SELECT l_linenumber, l_extendedprice
          |           FROM lat_lineitem WHERE l_orderkey = o_orderkey
          |           ORDER BY l_extendedprice DESC, l_linenumber
          |           LIMIT 2) t
          |ORDER BY o_orderkey, l_extendedprice DESC, l_linenumber""".stripMargin)
    }),

    // recursive CTE (Spark 4 SQL): generate a daily date spine, then
    // LEFT-join order counts onto it so zero-order days SURFACE as rows —
    // the gap-filling pattern a reporting pipeline needs (a plain groupBy
    // silently skips empty days). Day arithmetic stays integer-indexed so
    // both engines produce identical DATEs; output cast to string to
    // avoid date-encoding differences in the compare.
    "sql_recursive" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("rec_orders")
      s.sql(
        """WITH RECURSIVE spine(i) AS (
          |  SELECT 0 UNION ALL SELECT i + 1 FROM spine WHERE i < 58
          |),
          |days AS (SELECT date_add(DATE '1995-01-01', i) AS day FROM spine)
          |SELECT CAST(day AS STRING) AS day,
          |  COUNT(o_orderkey) AS n_orders
          |FROM days LEFT JOIN rec_orders
          |  ON CAST(o_orderdate AS DATE) = day
          |GROUP BY day ORDER BY day""".stripMargin)
    }),

    // null-safe equality join (<=>): NULL keys MATCH each other instead
    // of silently dropping — the semantic a key-reconciliation join needs
    // when "unknown" is itself a join bucket. Plans as an ordinary hash
    // join (EqualNullSafe is a supported equi-key), so the scale profile
    // equals join_shuffle. A tenth of customers get a NULL nation to
    // exercise it; the dim carries an explicit NULL row.
    "join_null_safe" -> ((s, d) => {
      val a = Tables.customer(s, d).select(
        when(col("c_custkey") % 10 === 0, lit(null))
          .otherwise(col("c_nationkey")).as("nk"))
      val b = Tables.nation(s, d).select(col("n_nationkey"))
        .unionAll(Tables.nation(s, d)
          .select(lit(null).cast("int").as("n_nationkey")).limit(1))
      a.join(b, col("nk") <=> col("n_nationkey"))
        .groupBy(coalesce(col("n_nationkey"), lit(-1)).as("key"))
        .agg(count(lit(1)).as("n_matched"))
        .orderBy("key")
    }),

    // salted shuffle join — the join-side twin of agg_salted_skew. The
    // derived foreign key routes ~70% of lineitem to supplier 1 (a REAL
    // key, so the hot rows produce matched output spread across reducers
    // — round-2 advisory: key 0 matched nothing and the skew was only
    // shuffled, never joined), the exact hot-key shape that stalls a
    // shuffle join on a single reducer
    // at 100 TB. Salting spreads it: the fact adds salt = orderkey mod 8,
    // the dim replicates ×8 (cheap — dims are small by definition), and
    // the join key widens to (key, salt), so the hot key occupies 8
    // reducers instead of 1. The shuffle_hash hint pins the shuffle path
    // (a broadcast would hide the mechanism at test SF; AQE skew-split is
    // the runtime alternative, exercised in PlanSpec). Result is provably
    // identical to the unsalted join — exactly what the oracle checks.
    "join_skew_salted" -> ((s, d) => {
      val S = 8
      val fact = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_quantity"),
          when(col("l_orderkey") % 10 < 7, 1L)
            .otherwise(col("l_suppkey")).as("sk"))
        .withColumn("salt", pmod(col("l_orderkey"), lit(S)))
      val dim = Tables.supplier(s, d)
        .select(col("s_suppkey"), col("s_nationkey"))
        .withColumn("salt", explode(array((0 until S).map(lit(_)): _*)))
      fact.join(dim.hint("shuffle_hash"),
          fact("sk") === dim("s_suppkey") && fact("salt") === dim("salt"))
        .groupBy("s_nationkey")
        .agg(count(lit(1)).as("n_rows"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy("s_nationkey")
    })
  )

  override def oracles: Map[String, String] = Map(
    // reordering is result-invariant, so the oracle is the plain join
    "join_cbo_reorder" ->
      """SELECT o_orderpriority, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
        |    AS DECIMAL(22,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "join_lateral" ->
      """SELECT o_orderkey, t.l_linenumber, t.l_extendedprice
        |FROM orders,
        |  LATERAL (SELECT l_linenumber, l_extendedprice
        |           FROM lineitem WHERE l_orderkey = o_orderkey
        |           ORDER BY l_extendedprice DESC, l_linenumber
        |           LIMIT 2) t
        |ORDER BY o_orderkey, l_extendedprice DESC, l_linenumber""".stripMargin,
    "sql_recursive" ->
      """WITH RECURSIVE spine(i) AS (
        |  SELECT 0 UNION ALL SELECT i + 1 FROM spine WHERE i < 58
        |),
        |days AS (SELECT (DATE '1995-01-01' + i) AS day FROM spine)
        |SELECT CAST(day AS VARCHAR) AS day, COUNT(o_orderkey) AS n_orders
        |FROM days LEFT JOIN orders ON CAST(o_orderdate AS DATE) = day
        |GROUP BY day ORDER BY day""".stripMargin,
    "join_null_safe" ->
      """WITH a AS (SELECT CASE WHEN c_custkey % 10 = 0 THEN NULL
        |       ELSE c_nationkey END AS nk FROM customer),
        |b AS (SELECT n_nationkey FROM nation
        |      UNION ALL SELECT CAST(NULL AS INTEGER))
        |SELECT COALESCE(b.n_nationkey, -1) AS key, COUNT(1) AS n_matched
        |FROM a JOIN b ON a.nk IS NOT DISTINCT FROM b.n_nationkey
        |GROUP BY 1 ORDER BY key""".stripMargin,
    "join_skew_salted" ->
      """SELECT s_nationkey, COUNT(1) AS n_rows,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN supplier
        |  ON (CASE WHEN l_orderkey % 10 < 7 THEN 1
        |       ELSE l_suppkey END) = s_suppkey
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,
    "join_broadcast" ->
      """SELECT p_brand, COUNT(1) AS n_items,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "join_shuffle" ->
      """SELECT o_orderpriority, COUNT(1) AS n_items,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(22,4))) AS DOUBLE) AS revenue
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "join_multiway" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(22,4))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders   ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "join_left" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "join_right" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "join_full" ->
      """SELECT COALESCE(c_nationkey, s_nationkey) AS nationkey,
        |  COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
        |FROM (SELECT c_nationkey, COUNT(1) AS n_cust FROM customer GROUP BY c_nationkey) c
        |FULL JOIN (SELECT s_nationkey, COUNT(1) AS n_supp FROM supplier GROUP BY s_nationkey) s
        |  ON c.c_nationkey = s.s_nationkey
        |ORDER BY nationkey""".stripMargin,
    "join_semi" ->
      """SELECT o_orderkey FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
        |ORDER BY o_orderkey""".stripMargin,
    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "join_cross" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin,
    "join_theta_range" ->
      """SELECT band_id, COUNT(1) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events
        |JOIN (VALUES (0, 0.0, 50.0), (1, 50.0, 100.0), (2, 100.0, 200.0),
        |             (3, 200.0, 600.0)) AS b(band_id, lo, hi)
        |  ON value >= lo AND value < hi
        |GROUP BY band_id ORDER BY band_id""".stripMargin,
    "join_asof" ->
      """SELECT event_id AS p_id, user_id, COALESCE(last_click, -1) AS c_id
        |FROM (SELECT event_id, user_id, event_type,
        |        MAX(CASE WHEN event_type = 'click' THEN event_id END)
        |          OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click
        |      FROM events) t
        |WHERE event_type = 'purchase' ORDER BY p_id""".stripMargin,
    // identical two-window pass + exact integer-µs nearest rule
    "join_asof_nearest" ->
      """SELECT event_id AS p_id, user_id,
        |  CASE WHEN b_id IS NULL AND f_id IS NULL THEN -1
        |       WHEN f_id IS NULL THEN b_id
        |       WHEN b_id IS NULL THEN f_id
        |       WHEN p_us - b_us <= f_us - p_us THEN b_id
        |       ELSE f_id END AS c_id,
        |  CASE WHEN b_id IS NULL AND f_id IS NULL THEN -1
        |       WHEN f_id IS NULL THEN p_us - b_us
        |       WHEN b_id IS NULL THEN f_us - p_us
        |       ELSE least(p_us - b_us, f_us - p_us) END AS delta_us
        |FROM (SELECT event_id, user_id, event_type, epoch_us(ts) AS p_us,
        |        MAX(CASE WHEN event_type = 'click' THEN event_id END)
        |          OVER wb AS b_id,
        |        MAX(CASE WHEN event_type = 'click' THEN epoch_us(ts) END)
        |          OVER wb AS b_us,
        |        MIN(CASE WHEN event_type = 'click' THEN event_id END)
        |          OVER wf AS f_id,
        |        MIN(CASE WHEN event_type = 'click' THEN epoch_us(ts) END)
        |          OVER wf AS f_us
        |      FROM events
        |      WINDOW wb AS (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |      wf AS (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)) t
        |WHERE event_type = 'purchase' ORDER BY p_id""".stripMargin,
    "join_asof_tol" ->
      """SELECT event_id AS p_id, user_id,
        |  CASE WHEN last_click_ts >= ts - INTERVAL 30 MINUTE
        |       THEN last_click ELSE -1 END AS c_id
        |FROM (SELECT event_id, user_id, ts, event_type,
        |        MAX(CASE WHEN event_type = 'click' THEN event_id END)
        |          OVER w AS last_click,
        |        MAX(CASE WHEN event_type = 'click' THEN ts END)
        |          OVER w AS last_click_ts
        |      FROM events
        |      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) t
        |WHERE event_type = 'purchase' ORDER BY p_id""".stripMargin,
    "join_bucketed" ->
      """SELECT o_orderstatus, COUNT(1) AS n_items,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // the dim keeps exactly the 'hot' langs (Fixtures.langDim is derived
    // from the corpus's distinct langs with tier = hot iff lang in de/en)
    "join_dpp" ->
      """SELECT lang, COUNT(1) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM documents WHERE lang IN ('de', 'en')
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "join_interval_bucketed" ->
      """SELECT e1.user_id AS user_id, COUNT(1) AS n_pairs
        |FROM events e1 JOIN events e2
        |  ON e1.user_id = e2.user_id AND e2.event_id > e1.event_id
        | AND e2.ts >= e1.ts AND e2.ts <= e1.ts + INTERVAL 5 MINUTE
        |GROUP BY e1.user_id ORDER BY user_id""".stripMargin,
    "join_interval" ->
      """SELECT e1.user_id AS user_id, COUNT(1) AS n_pairs
        |FROM events e1 JOIN events e2
        |  ON e1.user_id = e2.user_id AND e2.event_id > e1.event_id
        | AND e2.ts >= e1.ts AND e2.ts <= e1.ts + INTERVAL 5 MINUTE
        |GROUP BY e1.user_id ORDER BY user_id""".stripMargin
  )
}
