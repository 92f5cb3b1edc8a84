package graft.operators

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** §2.1 scans, sources, sinks.
  *
  * Scale notes: parquet scans rely on Catalyst pushdown — filters land in
  * `PushedFilters`, projections in `ReadSchema`, so at 100 TB only the
  * needed row groups / columns are read. The csv/json round-trip queries
  * materialize a small deterministic extract under java.io.tmpdir purely to
  * exercise the source-format readers; production-path reads would point at
  * real csv/json directories with an explicit schema (never inferSchema on
  * a large lake — that is a full extra pass).
  */
object ScanOps extends QueryModule {

  /** Write-once deterministic side files for the csv/json/orc source
    * tests live in Fixtures (shared, fingerprint-keyed against stale
    * testdata). Int/string columns only, so the text round-trip is
    * value-exact. */
  private def sideFile(s: SparkSession, sfDir: String, fmt: String): String =
    Fixtures.sideFile(s, sfDir, fmt)

  private val sideSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType)))

  /** PERMISSIVE typed read of the malformed-CSV fixture: rows whose
    * user_id fails the LongType parse keep their parseable fields, null
    * the bad one, and capture the raw line in `_corrupt` — nothing is
    * silently dropped (asserted row-for-row in OperatorSpec). */
  private[graft] def malformedFrame(s: SparkSession, d: String): DataFrame =
    s.read.schema(sideSchema.add(StructField("_corrupt", StringType)))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .csv(Fixtures.malformedCsv(s, d))

  override def queries: Map[String, Q.Fn] = Map(
    // projection + predicate pushdown reach the parquet reader (verified
    // via explain: PushedFilters + 3-column ReadSchema).
    "scan_parquet" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .where(col("l_quantity") < 5)
        .orderBy("l_orderkey", "l_linenumber")),

    "scan_csv" -> ((s, d) =>
      s.read.schema(sideSchema).option("header", "true")
        .csv(sideFile(s, d, "csv"))
        .orderBy("event_id")),

    // gzip-compressed CSV ingest: same typed read, codec selected by
    // extension. A single .gz member is unsplittable (one task per file)
    // — acceptable for landing files; the 100 TB guidance in the fixture
    // comment is splittable codecs or parquet, and this id proves the
    // read path is codec-transparent either way.
    "scan_csv_gzip" -> ((s, d) =>
      s.read.schema(sideSchema).option("header", "true")
        .csv(sideFile(s, d, "csv_gz"))
        .orderBy("event_id")),

    "scan_json" -> ((s, d) =>
      s.read.schema(sideSchema).json(sideFile(s, d, "json"))
        .orderBy("event_id")),

    // ORC round trip — the other columnar format Spark ships natively;
    // same pushdown/pruning machinery as parquet
    "scan_orc" -> ((s, d) =>
      s.read.schema(sideSchema).orc(sideFile(s, d, "orc"))
        .where(col("event_id") < 5000)
        .orderBy("event_id")),

    // XML source round trip — Spark 4 ships the XML datasource natively;
    // explicit schema + rowTag, same pushdown-free text-source posture
    // as csv/json (production reads give the schema, never infer)
    "scan_xml" -> ((s, d) =>
      s.read.format("xml").option("rowTag", "ev").schema(sideSchema)
        .load(sideFile(s, d, "xml"))
        .orderBy("event_id")),

    // line-oriented text source (the log-file reader): each line is one
    // row; the csv side file doubles as the fixture, header filtered out
    "scan_text" -> ((s, d) =>
      s.read.text(sideFile(s, d, "csv"))
        .where(col("value") =!= "event_id,user_id,event_type")
        .orderBy("value")),

    // malformed-input ingestion: a typed PERMISSIVE read over a CSV with
    // deterministically injected bad rows (non-numeric user_id on
    // event_id % 97 == 3). Clean rows aggregate normally; corrupt rows
    // land in quarantine and are COUNTED, never silently dropped — the
    // error-row story a 100 TB ingest needs (a FAILFAST read would kill
    // the job on the first bad row; DROPMALFORMED would lie about
    // totals). The quarantine split is one narrow filter on the captured
    // corrupt column; the oracle reconstructs the same arithmetic from
    // the injection rule.
    "scan_csv_malformed" -> ((s, d) =>
      malformedFrame(s, d)
        .agg(count(lit(1)).as("n_total"),
          count(when(col("_corrupt").isNull, 1)).as("n_clean"),
          count(col("_corrupt")).as("n_quarantined"),
          sum(when(col("_corrupt").isNull, col("user_id")))
            .as("sum_clean_uid"),
          min(when(col("_corrupt").isNotNull, col("event_id")))
            .as("min_bad_id"))),

    // the JSON quarantine shape: a syntax-corrupt record (injected
    // truncation on event_id % 97 == 3) nulls EVERY typed field and
    // captures the raw line — contrast with CSV, where parseable sibling
    // fields survive. Both total preservation and the all-null property
    // are part of the aggregate (n_bad_with_id must be 0).
    "scan_json_malformed" -> ((s, d) =>
      s.read.schema(sideSchema.add(StructField("_corrupt", StringType)))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(Fixtures.malformedJson(s, d))
        .agg(count(lit(1)).as("n_total"),
          count(when(col("_corrupt").isNull, 1)).as("n_clean"),
          count(col("_corrupt")).as("n_quarantined"),
          sum(when(col("_corrupt").isNull, col("user_id")))
            .as("sum_clean_uid"),
          count(when(col("_corrupt").isNotNull &&
            col("event_id").isNotNull, 1)).as("n_bad_with_id"))),

    // plain parquet sink + re-read; the re-read aggregate proves the
    // round trip is lossless (same count + exact decimal sum + key range
    // as computing directly on the source table).
    "sink_parquet" -> ((s, d) => {
      val dir = Fixtures.sinkDir(s, d, "orders", "orders_sink")
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .write.mode(SaveMode.Overwrite).parquet(dir)
      s.read.parquet(dir)
        .agg(count(lit(1)).as("n_rows"),
          sum(col("o_totalprice").cast(DecimalType(18, 2)))
            .cast(DoubleType).as("sum_price"),
          min("o_orderkey").as("min_key"), max("o_orderkey").as("max_key"))
    }),

    // whole-file binary ingest: Spark's binaryFile source over a
    // one-object-per-asset media directory (the raw media-lake layout
    // BEFORE consolidation into parquet binary columns — multimodal_*
    // operate on the consolidated form). The asset id is parsed from the
    // path; content hashes/lengths are recomputable from the md5-chain
    // payload definition, so even raw-file ingest stays oracle-checked.
    // pathGlobFilter prunes non-asset files at listing time.
    "scan_binaryfile" -> ((s, d) =>
      s.read.format("binaryFile").option("pathGlobFilter", "*.bin")
        .load(Fixtures.mediaBinDir(s, d))
        .select(
          regexp_extract(col("path"), "([0-9]+)\\.bin$", 1).cast("bigint")
            .as("doc_id"),
          col("length").as("n_bytes"),
          lower(hex(col("content"))).as("content_hex"))
        .orderBy("doc_id")),

    // schema-evolution read: two parquet generations (v2 added `value`)
    // unified by mergeSchema — rows from the old generation surface the
    // new column as null. mergeSchema costs a footer read per file, so at
    // 100 TB a production lake pins the merged schema in a catalog; the
    // read semantics demonstrated here are identical.
    "scan_evolving" -> ((s, d) => {
      val (v1, v2) = Fixtures.evolvingDirs(s, d)
      s.read.option("mergeSchema", "true").parquet(v1, v2)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"))
        .orderBy("event_id")
    }),

    // small-file compaction: rewrite a 64-fragment dataset into 2 files.
    // coalesce (not repartition) — compaction is a rewrite, not a
    // shuffle: input splits merge within tasks and no rows move between
    // executors. At 100 TB the target file count derives from
    // total-bytes / target-file-size per partition directory; the re-read
    // aggregate proves content preservation (file counts are asserted in
    // OperatorSpec — not SQL-expressible).
    "sink_compacted" -> ((s, d) => {
      val frag = Fixtures.fragmentedEvents(s, d)
      val dir = Fixtures.sinkDir(s, d, "events", "compacted")
      val schema = StructType(Seq(
        StructField("event_id", LongType),
        StructField("user_id", LongType),
        StructField("value", DoubleType)))
      s.read.schema(schema).parquet(frag)
        .coalesce(2)
        .write.mode(SaveMode.Overwrite).parquet(dir)
      s.read.schema(schema).parquet(dir)
        .agg(count(lit(1)).as("n_rows"),
          min("event_id").as("min_id"), max("event_id").as("max_id"),
          sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType)
            .as("sum_value"))
    }),

    // data-layout sink: sort WITHIN partitions by the filter column
    // before writing, so parquet row-group min/max statistics become
    // tight, disjoint ranges — a later `l_quantity < 5` scan skips
    // nearly every row group (the single-column z-order-lite every lake
    // maintains). sortWithinPartitions, not orderBy: no global sort, no
    // range-exchange — each task sorts only its own split. The re-read
    // runs a pushed-down range filter and aggregates, proving layout +
    // pushdown compose.
    "sink_sorted" -> ((s, d) => {
      val dir = Fixtures.sinkDir(s, d, "lineitem", "li_sorted")
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .sortWithinPartitions("l_quantity")
        .write.mode(SaveMode.Overwrite).parquet(dir)
      s.read.parquet(dir)
        .where(col("l_quantity") < 5)
        .agg(count(lit(1)).as("n_rows"),
          sum(col("l_quantity").cast(DecimalType(18, 2)))
            .cast(DoubleType).as("sum_qty"),
          min("l_orderkey").as("min_key"), max("l_orderkey").as("max_key"))
    }),

    // bloom-filter sink: row-group bloom filters on the point-lookup key.
    // min/max statistics cannot skip on a high-cardinality UNSORTED key
    // (every row group spans nearly the full key range); a bloom filter
    // gives each group a probabilistic definitely-not-here test, so an
    // o_custkey = K probe decodes only the groups that might hold K —
    // at 100 TB the difference between a full scan and a handful of row
    // groups for needle lookups. The re-read's point predicate pushes to
    // the parquet reader (parquet-mr consults the bloom before decoding);
    // OperatorSpec opens the footer and asserts the filter exists.
    "sink_bloom" -> ((s, d) => {
      val dir = Fixtures.sinkDir(s, d, "orders", "orders_bloom")
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .write.mode(SaveMode.Overwrite)
        .option("parquet.bloom.filter.enabled#o_custkey", "true")
        .option("parquet.bloom.filter.expected.ndv#o_custkey", "20000")
        // parquet-mr omits the bloom when a column stays fully
        // dictionary-encoded (the dictionary already answers membership
        // exactly). At 100 TB a customer key's NDV blows the dictionary
        // page and blooms engage naturally; at test scale force plain
        // encoding so the written structure is the at-scale one.
        .option("parquet.enable.dictionary#o_custkey", "false")
        .parquet(dir)
      s.read.parquet(dir)
        .where(col("o_custkey") === 7L)
        .agg(count(lit(1)).as("n_rows"),
          sum(col("o_totalprice").cast(DecimalType(18, 2)))
            .cast(DoubleType).as("sum_price"),
          min("o_orderkey").as("min_key"), max("o_orderkey").as("max_key"))
    }),

    // partitioned sink + re-read through partition pruning; the re-read
    // aggregate proves the round trip. Partition column (lang) has 5
    // values — at 100 TB partitionBy on a low-cardinality column like
    // this gives prunable directories without small-file explosion.
    "sink_partitioned" -> ((s, d) => {
      val dir = Fixtures.sinkDir(s, d, "documents", "docs_by_lang_sink")
      val src = Tables.documents(s, d)
      src.write.mode(SaveMode.Overwrite)
        .partitionBy("lang").parquet(dir)
      // explicit schema: an all-empty partitioned dir has no footers to
      // infer from (lang resolves from directory names when data exists)
      s.read.schema(src.schema).parquet(dir)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
        .orderBy("lang")
    })
  )

  override def oracles: Map[String, String] = Map(
    "scan_parquet" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_quantity < 5 ORDER BY l_orderkey, l_linenumber""".stripMargin,
    // the csv/json round trips preserve these columns exactly, so the
    // oracle is the original projection.
    "scan_csv" ->
      "SELECT event_id, user_id, event_type FROM events ORDER BY event_id",
    "scan_csv_gzip" ->
      "SELECT event_id, user_id, event_type FROM events ORDER BY event_id",
    "scan_json" ->
      "SELECT event_id, user_id, event_type FROM events ORDER BY event_id",
    "scan_orc" ->
      """SELECT event_id, user_id, event_type FROM events
        |WHERE event_id < 5000 ORDER BY event_id""".stripMargin,
    "scan_xml" ->
      "SELECT event_id, user_id, event_type FROM events ORDER BY event_id",
    // the text lines are exactly the csv rows, reconstructable from events
    "scan_text" ->
      """SELECT CAST(event_id AS VARCHAR) || ',' || CAST(user_id AS VARCHAR)
        |    || ',' || event_type AS value
        |FROM events ORDER BY value""".stripMargin,
    // full-byte compare: the file's hex equals the md5-chain definition
    // (stronger than a digest — every byte is checked; DuckDB 1.0 sha256
    // is VARCHAR-only so a blob digest can't be used here)
    "scan_binaryfile" ->
      """SELECT doc_id,
        |  CAST(octet_length(unhex(hx)) AS BIGINT) AS n_bytes,
        |  hx AS content_hex
        |FROM (SELECT doc_id,
        |        substr(repeat(md5(text), 4), 1,
        |               2 * CAST(7 + doc_id % 57 AS INT)) AS hx
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin,
    // reconstructed quarantine arithmetic: the injection rule
    // (event_id % 97 == 3 → unparseable user_id) is deterministic, so
    // the oracle recomputes every counter from the clean events table
    "scan_csv_malformed" ->
      """SELECT COUNT(1) AS n_total,
        |  COUNT(1) FILTER (WHERE event_id % 97 <> 3) AS n_clean,
        |  COUNT(1) FILTER (WHERE event_id % 97 = 3) AS n_quarantined,
        |  CAST(SUM(user_id) FILTER (WHERE event_id % 97 <> 3) AS BIGINT)
        |    AS sum_clean_uid,
        |  MIN(event_id) FILTER (WHERE event_id % 97 = 3) AS min_bad_id
        |FROM events""".stripMargin,
    "scan_json_malformed" ->
      """SELECT COUNT(1) AS n_total,
        |  COUNT(1) FILTER (WHERE event_id % 97 <> 3) AS n_clean,
        |  COUNT(1) FILTER (WHERE event_id % 97 = 3) AS n_quarantined,
        |  CAST(SUM(user_id) FILTER (WHERE event_id % 97 <> 3) AS BIGINT)
        |    AS sum_clean_uid,
        |  CAST(0 AS BIGINT) AS n_bad_with_id
        |FROM events""".stripMargin,
    "scan_evolving" ->
      """SELECT event_id, user_id, event_type, CAST(NULL AS DOUBLE) AS value
        |FROM events WHERE event_id % 2 = 0
        |UNION ALL
        |SELECT event_id, user_id, event_type, value
        |FROM events WHERE event_id % 2 = 1
        |ORDER BY event_id""".stripMargin,
    "sink_compacted" ->
      """SELECT COUNT(1) AS n_rows, MIN(event_id) AS min_id,
        |  MAX(event_id) AS max_id,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events""".stripMargin,
    "sink_sorted" ->
      """SELECT COUNT(1) AS n_rows,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  MIN(l_orderkey) AS min_key, MAX(l_orderkey) AS max_key
        |FROM lineitem WHERE l_quantity < 5""".stripMargin,
    "sink_bloom" ->
      """SELECT COUNT(1) AS n_rows,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_price,
        |  MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
        |FROM orders WHERE o_custkey = 7""".stripMargin,
    "sink_parquet" ->
      """SELECT COUNT(1) AS n_rows,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
        |FROM orders""".stripMargin,
    // CAST AS BIGINT: DuckDB SUM(BIGINT) widens to HUGEINT, Spark stays long.
    "sink_partitioned" ->
      """SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin
  )
}
