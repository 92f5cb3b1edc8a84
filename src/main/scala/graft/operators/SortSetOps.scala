package graft.operators

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.functions._

/** §2.6 sort/limit/top-k + §2.7 set operations.
  *
  * Scale notes: `orderBy(...).limit(k)` plans as TakeOrderedAndProject —
  * per-partition top-k then a k-row merge on the driver, never a global
  * sort. The full sorts are range-partitioned (sampled boundaries), which
  * scales linearly. Set ops shuffle on the full row — fine for the narrow
  * projections used here.
  */
object SortSetOps extends QueryModule {

  override def queries: Map[String, Q.Fn] = Map(
    "sort_multi" -> ((s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderstatus"), col("o_totalprice"), col("o_orderkey"))
        .orderBy(col("o_orderstatus").asc, col("o_totalprice").desc_nulls_last,
          col("o_orderkey").asc)),

    "topk" -> ((s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)),

    // UNION ALL keeps duplicates — per-nation combined party counts show
    // the multiplicity is preserved
    "set_union_all" -> ((s, d) =>
      Tables.customer(s, d)
        .select(col("c_nationkey").as("nationkey"))
        .union(Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")))
        .groupBy("nationkey").agg(count(lit(1)).as("n_parties"))
        .orderBy("nationkey")),

    "set_union" -> ((s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
        .union(Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")))
        .distinct()
        .orderBy("nationkey")),

    "set_intersect" -> ((s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
        .intersect(Tables.supplier(s, d)
          .select(col("s_nationkey").as("nationkey")))
        .orderBy("nationkey")),

    // bag semantics: INTERSECT ALL keeps min(multiplicity) copies per
    // value, EXCEPT ALL subtracts occurrence counts — the forms that
    // answer "how many overlapping rows", not just "which values"
    "set_intersect_all" -> ((s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
        .intersectAll(Tables.supplier(s, d)
          .select(col("s_nationkey").as("nationkey")))
        .orderBy("nationkey")),

    "set_except_all" -> ((s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
        .exceptAll(Tables.supplier(s, d)
          .select(col("s_nationkey").as("nationkey")))
        .orderBy("nationkey")),

    // customers that never placed a high-value order, as a key difference
    "set_except" -> ((s, d) =>
      Tables.customer(s, d).select(col("c_custkey").as("custkey"))
        .except(Tables.orders(s, d).where(col("o_totalprice") > 450000)
          .select(col("o_custkey").as("custkey")))
        .orderBy("custkey")),

    // keep only the key columns: which source row survives dropDuplicates
    // is nondeterministic, the key set is not (SURVEY §5.3.4)
    "distinct_rows" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select("l_returnflag", "l_linestatus")
        .dropDuplicates("l_returnflag", "l_linestatus")
        .orderBy("l_returnflag", "l_linestatus"))
  )

  override def oracles: Map[String, String] = Map(
    "sort_multi" ->
      """SELECT o_orderstatus, o_totalprice, o_orderkey FROM orders
        |ORDER BY o_orderstatus ASC, o_totalprice DESC NULLS LAST, o_orderkey ASC""".stripMargin,
    "topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "set_union_all" ->
      """SELECT nationkey, COUNT(1) AS n_parties FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  UNION ALL
        |  SELECT s_nationkey FROM supplier)
        |GROUP BY nationkey ORDER BY nationkey""".stripMargin,
    "set_union" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |UNION
        |SELECT s_nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,
    "set_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT
        |SELECT s_nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,
    "set_intersect_all" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT ALL
        |SELECT s_nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,
    "set_except_all" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT ALL
        |SELECT s_nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,
    "set_except" ->
      """SELECT c_custkey AS custkey FROM customer
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_totalprice > 450000
        |ORDER BY custkey""".stripMargin,
    "distinct_rows" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
