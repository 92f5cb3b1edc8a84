package graft.operators

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

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
        .orderBy("p_partkey")),

    // scalar + correlated-IN subqueries; Catalyst decorrelates the IN to
    // a semi join and the scalar aggregate broadcasts as a single row
    "filter_subquery" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("sq_orders")
      Tables.lineitem(s, d).createOrReplaceTempView("sq_lineitem")
      // threshold = exact decimal sum / count, divided once in double
      // space — bit-identical on both engines (same rationale as Det.davg)
      s.sql(
        """SELECT o_orderkey, o_totalprice FROM sq_orders
          |WHERE o_totalprice >
          |    (SELECT 1.5 * CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          |            / COUNT(1) FROM sq_orders)
          |  AND o_orderkey IN (SELECT l_orderkey FROM sq_lineitem
          |                     WHERE l_quantity >= 45)
          |ORDER BY o_orderkey""".stripMargin)
    }),

    // deterministic hash sampling: md5-prefix filter keeps ~1/16 of rows
    // identically in any engine — unlike rng-based sample(), this is
    // reproducible across partitionings, retries, and engines, which is
    // what a 100 TB pipeline needs for stable dev subsets
    "sample_hash" -> ((s, d) =>
      Tables.lineitem(s, d)
        .where(substring(md5(concat_ws("|", col("l_orderkey"),
          col("l_linenumber"))), 1, 1) === "0")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .orderBy("l_orderkey", "l_linenumber")),

    // deterministic 3-way train/val/test assignment (~80/10/10): the
    // bucket is a pure function of the row key (md5 mod 10), so the
    // split is reproducible across engines, retries, partitionings and
    // reruns — one narrow pass, no RNG, no shuffle until the summary agg
    "sample_split_hash" -> ((s, d) => {
      val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 2),
        16, 10).cast("int") % 10
      Tables.documents(s, d)
        .select(col("doc_id"),
          when(bucket < 8, "train").when(bucket === 8, "val")
            .otherwise("test").as("split"))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"), min("doc_id").as("min_id"),
          max("doc_id").as("max_id"))
        .orderBy("split")
    }),

    // weighted reservoir sampling (Efraimidis–Spirakis 2006): keep the k
    // docs with the smallest -ln(u)/w keys, u a pure md5-derived uniform
    // and w = n_chars — P(selected) ∝ weight, the length/token-budget-
    // aware doc sampler of a curation mix. Deterministic everywhere: u is
    // exact integer arithmetic on the row key (no RNG), and the one
    // transcendental (ln) is quantized at 1e9 before comparison/output
    // (the agg_entropy discipline), with doc_id tiebreak, so selection
    // and hashes are engine-stable. Residual risk, accepted: a 1-ulp
    // libm ln() divergence landing key·1e9 exactly on a half-integer
    // would flip key_q by 1 between engines; no such boundary exists in
    // the fixture and the quantum leaves ~8 significant digits of
    // agreement margin. Weight is greatest(n_chars, 1): an empty doc
    // must degrade to the minimum weight, not an Infinity key that
    // breaks the BIGINT cast. Scale shape: one narrow scan; the
    // top-k runs as TakeOrderedAndProject (per-partition k-heaps, merge
    // of k-row partials) — no full sort, no shuffle of the corpus.
    "sample_weighted" -> ((s, d) => {
      val u = graft.Det.md5Uniform(col("doc_id"))
      val w = greatest(col("n_chars"), lit(1)).cast(DoubleType)
      val keyQ = floor(-log(u) / w * lit(1e9)
        + lit(0.5)).cast(LongType)
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("n_chars"),
          keyQ.as("key_q"))
        .orderBy(col("key_q"), col("doc_id"))
        .limit(200)
    }),

    // stratified deterministic sampling: per-stratum hash rates (the
    // over-represented lang downsamples to ~3/16, the rest keep ~10/16) —
    // the rebalancing primitive of a training-data mix, reproducible
    // across engines/retries because the keep decision is a pure hash of
    // the row key, never an RNG
    "sample_stratified" -> ((s, d) => {
      val h = substring(md5(col("doc_id").cast("string")), 1, 1)
      Tables.documents(s, d)
        .where((col("lang") === "en" && h.isin("0", "1", "2")) ||
          (col("lang") =!= "en" && h.between("0", "9")))
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
        .orderBy("doc_id")
    }),

    // null-cleansing surface: synthesize nulls (the testdata has none),
    // then na.fill one column and na.drop on the other — the standard
    // schema-cleansing pair
    "clean_nulls" -> ((s, d) =>
      Tables.events(s, d)
        .withColumn("etype_n", nullif(col("event_type"), lit("error")))
        .withColumn("val_n",
          when(col("value") < 1.0, lit(null)).otherwise(col("value")))
        .na.fill(Map("val_n" -> 0.0))
        .na.drop(Seq("etype_n"))
        .select(col("event_id"), col("etype_n"), col("val_n"))
        .orderBy("event_id")),

    // cast matrix: the type-normalization surface of a schema-cleansing
    // stage (string↔number, double→decimal quantization, ts→date/epoch)
    "fn_cast" -> ((s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          col("o_orderkey").cast("string").as("key_str"),
          (col("o_orderkey").cast("string").cast("long") * 2)
            .as("key_roundtrip2"),
          col("o_totalprice").cast(DecimalType(18, 0)).cast("long")
            .as("price_long"),
          col("o_totalprice").cast("string").cast("double").as("price_rt"),
          col("o_orderdate").cast("date").as("odate"),
          col("o_orderdate").cast("date").cast("string").as("odate_str"),
          year(col("o_orderdate").cast("date")).cast("long").as("oyear"))
        .orderBy("o_orderkey"))
  )

  override def oracles: Map[String, String] = Map(
    "sample_weighted" ->
      """WITH t AS (SELECT doc_id, lang, n_chars,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
        |      AS UBIGINT) AS h
        |  FROM documents)
        |SELECT doc_id, lang, n_chars,
        |  CAST(floor(-ln((h + 0.5) / 4294967296.0)
        |    / CAST(greatest(n_chars, 1) AS DOUBLE) * 1e9 + 0.5)
        |    AS BIGINT) AS key_q
        |FROM t ORDER BY key_q, doc_id LIMIT 200""".stripMargin,
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
        |ORDER BY p_partkey""".stripMargin,
    "filter_subquery" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice >
        |    (SELECT 1.5 * CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |            / COUNT(1) FROM orders)
        |  AND o_orderkey IN (SELECT l_orderkey FROM lineitem
        |                     WHERE l_quantity >= 45)
        |ORDER BY o_orderkey""".stripMargin,
    "sample_hash" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE substring(md5(concat_ws('|', l_orderkey, l_linenumber)), 1, 1) = '0'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "sample_split_hash" ->
      """WITH b AS (SELECT doc_id,
        |  ((instr('0123456789abcdef',
        |          substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
        |   + instr('0123456789abcdef',
        |           substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) % 10
        |    AS bucket
        |FROM documents)
        |SELECT CASE WHEN bucket < 8 THEN 'train'
        |            WHEN bucket = 8 THEN 'val'
        |            ELSE 'test' END AS split,
        |  COUNT(*) AS n_docs, MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
        |FROM b GROUP BY 1 ORDER BY split""".stripMargin,
    "sample_stratified" ->
      """SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE (lang = 'en' AND substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)
        |         IN ('0', '1', '2'))
        |   OR (lang <> 'en' AND substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)
        |         BETWEEN '0' AND '9')
        |ORDER BY doc_id""".stripMargin,
    "clean_nulls" ->
      """SELECT event_id, event_type AS etype_n,
        |  COALESCE(CASE WHEN value < 1.0 THEN NULL ELSE value END, 0.0) AS val_n
        |FROM events WHERE event_type <> 'error'
        |ORDER BY event_id""".stripMargin,
    "fn_cast" ->
      """SELECT o_orderkey,
        |  CAST(o_orderkey AS VARCHAR) AS key_str,
        |  CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) * 2 AS key_roundtrip2,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,0)) AS BIGINT) AS price_long,
        |  CAST(CAST(o_totalprice AS VARCHAR) AS DOUBLE) AS price_rt,
        |  CAST(o_orderdate AS DATE) AS odate,
        |  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS odate_str,
        |  CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS oyear
        |FROM orders ORDER BY o_orderkey""".stripMargin
  )
}
