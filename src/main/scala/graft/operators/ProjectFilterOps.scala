package graft.operators

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.functions._

/** §2.2 projection / filter / predicates.
  *
  * Scale notes: every predicate here is Catalyst-pushable (comparison, IN,
  * LIKE, BETWEEN on scan columns), so at 100 TB these queries do row-group
  * skipping at the parquet reader instead of post-scan filtering. Derived
  * columns are per-row IEEE double arithmetic — identical expression order
  * on both engines makes them bit-exact without any aggregation concerns.
  */
object ProjectFilterOps extends QueryModule {

  override def queries: Map[String, Q.Fn] = Map(
    "project_compute" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("disc_price"),
          (col("l_quantity") * col("l_tax")).as("qty_tax"))
        .orderBy("l_orderkey", "l_linenumber")),

    "filter_pred" -> ((s, d) =>
      Tables.lineitem(s, d)
        .where(col("l_quantity") < 24 &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_returnflag") =!= "N")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_discount"))
        .orderBy("l_orderkey", "l_linenumber")),

    "filter_in_like_between" -> ((s, d) =>
      Tables.part(s, d)
        .where(col("p_brand").isin("Brand#1", "Brand#2", "Brand#3") &&
          col("p_name").like("%red%") &&
          col("p_size").between(1, 25) &&
          col("p_type").isNotNull)
        .select(col("p_partkey"), col("p_name"), col("p_brand"),
          col("p_size"))
        .orderBy("p_partkey"))
  )

  override def oracles: Map[String, String] = Map(
    "project_compute" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_extendedprice * (1.0 - l_discount) AS disc_price,
        |  l_quantity * l_tax AS qty_tax
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "filter_pred" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount
        |FROM lineitem
        |WHERE l_quantity < 24 AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_returnflag <> 'N'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "filter_in_like_between" ->
      """SELECT p_partkey, p_name, p_brand, p_size FROM part
        |WHERE p_brand IN ('Brand#1','Brand#2','Brand#3')
        |  AND p_name LIKE '%red%'
        |  AND p_size BETWEEN 1 AND 25
        |  AND p_type IS NOT NULL
        |ORDER BY p_partkey""".stripMargin
  )
}
