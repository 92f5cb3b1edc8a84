package graft.operators

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.functions._

/** Incremental upsert / SCD1 merge — the bread-and-butter ETL operator:
  * reconcile an existing snapshot with a delta batch into a new snapshot,
  * classifying every output row.
  *
  * Scale design: one full-outer shuffle join on the natural key (both
  * sides hash-partitioned on it — AQE handles skewed keys), and change
  * detection via a HASH-DIFF of the payload columns, so at 100 TB the
  * comparison is one 128-bit digest per row instead of N column
  * comparisons (and, in a real lake, the snapshot side can pre-store the
  * digest and skip reading unchanged payload columns entirely). With no
  * table format offering MERGE offline, full-outer + hash-diff IS the
  * standard rewrite.
  */
object MergeOps extends QueryModule {

  /** Snapshot ⟗ delta with per-row action classification — shared core of
    * the SCD1 and SCD2 queries. The delta batch is derived
    * deterministically from the snapshot (= customer): +100.00 balance
    * for keys ≡0 (mod 7) (updates), untouched rows for keys ≡0 (mod 5)
    * (no-op upserts), and brand-new keys +1e6 for keys ≡0 (mod 13)
    * (inserts). */
  private def classified(s: org.apache.spark.sql.SparkSession, d: String) = {
    val snap = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    val delta = snap.where(col("c_custkey") % 7 === 0)
      .select(col("c_custkey"), col("c_name"),
        (col("c_acctbal") + 100.0).as("c_acctbal"))
      .unionAll(snap.where(col("c_custkey") % 5 === 0 &&
        col("c_custkey") % 7 =!= 0))
      .unionAll(snap.where(col("c_custkey") % 13 === 0)
        .select((col("c_custkey") + 1000000L).as("c_custkey"),
          concat(col("c_name"), lit(" (new)")).as("c_name"),
          col("c_acctbal")))
    def digest(prefix: String) =
      md5(concat_ws("|", col(s"${prefix}c_name"), col(s"${prefix}c_acctbal")))
    val sSide = snap.select(col("c_custkey").as("s_key"),
      col("c_name").as("s_c_name"), col("c_acctbal").as("s_c_acctbal"))
    val dSide = delta.select(col("c_custkey").as("d_key"),
      col("c_name").as("d_c_name"), col("c_acctbal").as("d_c_acctbal"))
    sSide.join(dSide, col("s_key") === col("d_key"), "full_outer")
      .withColumn("action",
        when(col("s_key").isNull, "insert")
          .when(col("d_key").isNull, "carried")
          .when(digest("d_") === digest("s_"), "unchanged")
          .otherwise("updated"))
  }

  override def queries: Map[String, Q.Fn] = Map(
    // SCD1: last-write-wins flat snapshot + action audit column
    "upsert_snapshot" -> ((s, d) =>
      classified(s, d)
        .select(
          coalesce(col("d_key"), col("s_key")).as("c_custkey"),
          coalesce(col("d_c_name"), col("s_c_name")).as("c_name"),
          coalesce(col("d_c_acctbal"), col("s_c_acctbal")).as("c_acctbal"),
          col("action"))
        .orderBy("c_custkey")),

    // SCD2: history-preserving merge — updated keys close their old
    // version (valid_to = batch date) and open a new current one; inserts
    // open a first version; unchanged/carried rows keep their open
    // version. Same single full-outer shuffle as SCD1 — the version rows
    // are a narrow union on top, so the 100 TB cost profile is identical.
    "upsert_scd2" -> ((s, d) => {
      val c = classified(s, d)
      val oldRows = c.where(col("s_key").isNotNull)
        .select(col("s_key").as("c_custkey"),
          col("s_c_name").as("c_name"),
          col("s_c_acctbal").as("c_acctbal"),
          lit("2024-01-01").as("valid_from"),
          when(col("action") === "updated", "2024-06-01")
            .otherwise("9999-12-31").as("valid_to"),
          when(col("action") === "updated", 0L).otherwise(1L)
            .as("is_current"))
      val newRows = c.where(col("action").isin("insert", "updated"))
        .select(col("d_key").as("c_custkey"),
          col("d_c_name").as("c_name"),
          col("d_c_acctbal").as("c_acctbal"),
          lit("2024-06-01").as("valid_from"),
          lit("9999-12-31").as("valid_to"),
          lit(1L).as("is_current"))
      oldRows.unionAll(newRows).orderBy("c_custkey", "valid_from")
    })
  )

  override def oracles: Map[String, String] = Map(
    // same merge in plain relational SQL; DuckDB compares columns directly
    // where Spark compares digests — equivalent because digest equality ⟺
    // payload equality (both digests computed in-engine on the same rows)
    "upsert_snapshot" ->
      """WITH snap AS (SELECT c_custkey, c_name, c_acctbal FROM customer),
        |delta AS (
        |  SELECT c_custkey, c_name, c_acctbal + 100.0 AS c_acctbal
        |  FROM snap WHERE c_custkey % 7 = 0
        |  UNION ALL SELECT * FROM snap
        |    WHERE c_custkey % 5 = 0 AND c_custkey % 7 <> 0
        |  UNION ALL SELECT c_custkey + 1000000, c_name || ' (new)', c_acctbal
        |    FROM snap WHERE c_custkey % 13 = 0)
        |SELECT COALESCE(d.c_custkey, s.c_custkey) AS c_custkey,
        |  COALESCE(d.c_name, s.c_name) AS c_name,
        |  COALESCE(d.c_acctbal, s.c_acctbal) AS c_acctbal,
        |  CASE WHEN s.c_custkey IS NULL THEN 'insert'
        |       WHEN d.c_custkey IS NULL THEN 'carried'
        |       WHEN d.c_name = s.c_name AND d.c_acctbal = s.c_acctbal
        |         THEN 'unchanged'
        |       ELSE 'updated' END AS action
        |FROM snap s FULL JOIN delta d ON s.c_custkey = d.c_custkey
        |ORDER BY c_custkey""".stripMargin,
    "upsert_scd2" ->
      """WITH snap AS (SELECT c_custkey, c_name, c_acctbal FROM customer),
        |delta AS (
        |  SELECT c_custkey, c_name, c_acctbal + 100.0 AS c_acctbal
        |  FROM snap WHERE c_custkey % 7 = 0
        |  UNION ALL SELECT * FROM snap
        |    WHERE c_custkey % 5 = 0 AND c_custkey % 7 <> 0
        |  UNION ALL SELECT c_custkey + 1000000, c_name || ' (new)', c_acctbal
        |    FROM snap WHERE c_custkey % 13 = 0),
        |j AS (SELECT s.c_custkey AS s_key, s.c_name AS s_c_name,
        |        s.c_acctbal AS s_c_acctbal, d.c_custkey AS d_key,
        |        d.c_name AS d_c_name, d.c_acctbal AS d_c_acctbal,
        |        CASE WHEN s.c_custkey IS NULL THEN 'insert'
        |             WHEN d.c_custkey IS NULL THEN 'carried'
        |             WHEN d.c_name = s.c_name AND d.c_acctbal = s.c_acctbal
        |               THEN 'unchanged'
        |             ELSE 'updated' END AS action
        |      FROM snap s FULL JOIN delta d ON s.c_custkey = d.c_custkey)
        |SELECT s_key AS c_custkey, s_c_name AS c_name,
        |  s_c_acctbal AS c_acctbal, '2024-01-01' AS valid_from,
        |  CASE WHEN action = 'updated' THEN '2024-06-01'
        |       ELSE '9999-12-31' END AS valid_to,
        |  CAST(CASE WHEN action = 'updated' THEN 0 ELSE 1 END AS BIGINT)
        |    AS is_current
        |FROM j WHERE s_key IS NOT NULL
        |UNION ALL
        |SELECT d_key, d_c_name, d_c_acctbal, '2024-06-01', '9999-12-31',
        |  CAST(1 AS BIGINT)
        |FROM j WHERE action IN ('insert', 'updated')
        |ORDER BY c_custkey, valid_from""".stripMargin
  )
}
