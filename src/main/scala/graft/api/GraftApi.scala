package graft.api

import graft.operators.GraphOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reusable operator surface: every core algorithm the declared
  * queries exercise, exposed as DataFrame-generic functions so a user can
  * run them on THEIR tables, not just the driver fixtures. Each function
  * is a thin, documented composition over the same primitives the query
  * map uses (codegen'd expressions, GraphOps, the §5.3 determinism
  * discipline) — the query ids in `SparkEntry` are these functions bound
  * to the test corpus.
  *
  * All functions are lazy plan builders: no actions, no caching, safe to
  * compose. Column arguments let callers point the ops at any schema.
  */
object GraftApi {

  // ---- text canonicalization & dedup -------------------------------

  /** Stage-0 canonicalization: lower → accent strip (codegen'd NFD fold)
    * → whitespace collapse → trim. Run before ANY text hashing. */
  def normalizeText(text: Column): Column =
    graft.functions.TextNormExprs.stripAccents(
      regexp_replace(trim(lower(text)), "\\s+", " "))

  /** URL canonicalization (the dedup_url core — run before URL-keyed
    * dedup/joins): lowercase scheme+host, strip default :443 port /
    * www. / fragment, drop tracking params (utm_*, fbclid, gclid),
    * sort surviving params, strip the trailing slash. Pure anchored
    * regexps + array builtins — whole-stage codegen.
    *
    * Contract notes: (a) anything that is not an `http(s)://host...`
    * URL (other schemes, relative paths, empty strings) canonicalizes
    * to NULL — malformed rows never share a canonical key; filter
    * `IS NOT NULL` before keying a dedup on the result. (b) http and
    * https spellings FOLD to one https key on purpose (page-level
    * dedup semantics); key on the raw URL where origin exactness
    * matters. */
  def canonicalUrl(url: Column): Column =
    graft.operators.TextOps.canonicalUrl(url)

  /** Sorted distinct k-word shingle hashes of whitespace-tokenized text
    * (codegen'd single-pass kernel, hash-compatible with
    * xxhash64(concat_ws(' ', words))). */
  def shingleHashes(text: Column, k: Int = 3): Column =
    graft.functions.ShingleExprs.shingleHashSet(split(text, " "), k)

  /** Exact dedup: one survivor (minimum `idCol`) per distinct `keyCol`
    * value, hashed so the shuffle never carries the raw key payload. */
  def dedupExact(df: DataFrame, keyCol: Column, idCol: Column): DataFrame = {
    val w = Window.partitionBy(sha2(keyCol.cast(StringType), 256))
      .orderBy(idCol)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
  }

  /** MinHash+LSH near-duplicate pairs over a (doc_id, text) frame:
    * (id1, id2, jaccard) for every pair with 3-word-shingle Jaccard ≥
    * `tau`. Signatures run on codegen md5 kernels; the candidate
    * shuffle carries band keys + ids only — sub-quadratic whenever the
    * corpus has a true near-dup margin (see dedup_near). */
  def nearDupPairs(docs: DataFrame, tau: Double = 0.6): DataFrame =
    graft.operators.VectorOps.minhashPairs(docs, tau)

  /** Verbatim-substring dup pairs over a (doc_id, text) frame:
    * (id1, id2, n_windows, max_span) for every pair sharing a
    * ≥ k-token verbatim span at ANY offsets — the Lee et al. 2022 dup
    * class whole-doc measures miss. `maxDf` caps hot boilerplate
    * window postings at scale (None = exact). */
  def substringPairs(docs: DataFrame, k: Int = 13,
      maxDf: Option[Int] = None): DataFrame =
    graft.operators.TextOps.substringPairs(docs, k, maxDf)

  /** Resolve a pair graph into components: returns (doc_id, rep) with
    * rep = the component's minimum id. `pairs` needs columns id1/id2;
    * `nodes` a single id column named doc_id. Fixpoint shuffles are
    * sized from the materialized edge count (GraphOps). */
  def resolveClusters(nodes: DataFrame, pairs: DataFrame): DataFrame =
    GraphOps.connectedComponents(nodes, pairs)

  /** Per-component sizes (rep, n_members) of a resolveClusters result —
    * the giant-component diagnostic to check BEFORE acting on a
    * keep-one-per-component policy (playbook in GraphOps scaladoc). */
  def componentSizes(labels: DataFrame): DataFrame =
    GraphOps.componentSizes(labels)

  // ---- warehouse surface -------------------------------------------

  /** Native change feed over a governed table's own version history —
    * the `table_changes(t, v0, v1)` readout every lake format exposes:
    * the row-level delta between snapshot `fromV` and snapshot `toV`
    * of a versioned catalog table, as (key, payload..., change_type)
    * with change_type ∈ insert / delete / update_preimage /
    * update_postimage (the Delta-CDF row shape). Both snapshots are
    * read through the REAL `VERSION AS OF` syntax, so this works on
    * any table the graft catalog governs, whatever statements (MERGE /
    * DELETE / UPDATE / INSERT, copy-on-write or merge-on-read)
    * produced the versions. Update detection hash-diffs the payload
    * (md5 over concat_ws — one 128-bit digest per row, not N column
    * comparisons). Scale: ONE full-outer shuffle on `keyCol` between
    * two snapshot scans — cdc_diff's exact cost profile; a lake format
    * with per-commit row-level manifests can serve the same feed
    * without the join, which is why this is the fallback readout, but
    * the output contract is identical. */
  def tableChanges(spark: org.apache.spark.sql.SparkSession,
      table: String, keyCol: String, fromV: Int, toV: Int): DataFrame = {
    val pre = spark.sql(s"SELECT * FROM $table VERSION AS OF $fromV")
    val post = spark.sql(s"SELECT * FROM $table VERSION AS OF $toV")
    val payload = pre.columns.filterNot(_ == keyCol).toSeq
    val a = pre.select(col(keyCol).as("__akey") +:
      payload.map(c => col(c).as(s"__a_$c")): _*)
    val b = post.select(col(keyCol).as("__bkey") +:
      payload.map(c => col(c).as(s"__b_$c")): _*)
    val j = a.join(b, col("__akey") === col("__bkey"), "full_outer")
    // digest over to_json(struct(...)): field-delimited and null-safe,
    // so neither a NULL shifting between columns nor a payload value
    // containing the would-be separator can alias two different rows
    // (concat_ws would conflate (NULL,'x') with ('x',NULL) and
    // ('a|b','c') with ('a','b|c'))
    def dg(p: String) =
      md5(to_json(struct(payload.map(c => col(s"$p$c").as(c)): _*)))
    val changed = col("__akey").isNotNull && col("__bkey").isNotNull &&
      dg("__a_") =!= dg("__b_")
    def img(keyC: String, p: String, ct: String) =
      col(keyC).as(keyCol) +: payload.map(c => col(s"$p$c").as(c)) :+
        lit(ct).as("change_type")
    j.where(col("__akey").isNull)
      .select(img("__bkey", "__b_", "insert"): _*)
      .unionAll(j.where(col("__bkey").isNull)
        .select(img("__akey", "__a_", "delete"): _*))
      .unionAll(j.where(changed)
        .select(img("__akey", "__a_", "update_preimage"): _*))
      .unionAll(j.where(changed)
        .select(img("__akey", "__b_", "update_postimage"): _*))
  }

  /** Consumer-side CHANGE FEED REPLAY — the other half of CDC: apply a
    * feed (rows with `change_type` ∈ insert / delete / update_preimage
    * / update_postimage and a monotone `versionCol`) to a base
    * snapshot and return the resulting state. No per-commit loop: for
    * each key the LAST effective change wins (window by `versionCol`),
    * so replaying an N-commit feed is ONE shuffle over the feed plus
    * one anti-join against the base — at 100 TB the feed is tiny next
    * to the base, and the anti-join is the only base-scale exchange.
    * Correct because a key has at most one effective (non-preimage)
    * change per commit — the shape every CDF producer (including
    * `graft.<t>.changes`) emits. Columns: `base` carries the payload
    * schema; `changes` the same columns + change_type + versionCol. */
  def applyChanges(base: DataFrame, changes: DataFrame, keyCol: String,
      versionCol: String, changeTypeCol: String = "change_type")
      : DataFrame = {
    val payload = base.columns.toSeq
    val eff = changes.where(col(changeTypeCol) =!= "update_preimage")
    val w = Window.partitionBy(keyCol).orderBy(col(versionCol).desc)
    val last = eff.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
    base.join(last.select(col(keyCol)), Seq(keyCol), "left_anti")
      .unionByName(last.where(col(changeTypeCol) =!= "delete")
        .select(payload.map(col): _*))
  }

  /** The governed table's COMMIT LOG — the `DESCRIBE HISTORY` readout:
    * one row per retained commit with its absolute version, the
    * operation that produced it (append / replace / truncate / delta /
    * stream-append / stream-complete), and the row count after the
    * commit. Reads the catalog-resolved `<table>.history` metadata
    * relation (the Iceberg metadata-table pattern; DESCRIBE HISTORY's
    * answer shape) — O(retained versions ≤ 64) metadata served from
    * the transaction log, no row data touched. The relation also
    * carries `commit_ts`; it is projected away here so readouts stay
    * deterministic. `table` is the catalog-qualified name, e.g.
    * "graft.events_t". */
  def tableHistory(spark: org.apache.spark.sql.SparkSession,
      table: String): DataFrame =
    spark.table(s"$table.history")
      .select(col("version"), col("operation"), col("n_rows"))

  /** OPTIMIZE — table maintenance for the merge-on-read path: compact
    * the base + delta-commit chain into ONE full snapshot commit
    * (operation 'compact' in the history). Reads are unchanged —
    * identical rows before and after (the id's oracle proves it) —
    * but subsequent scans resolve from the compacted head instead of
    * re-merging the op-log chain, and snapshot expiry past the
    * compaction point no longer strands a delta's base. Idempotent:
    * with no retained delta commits nothing is written and 0 is
    * returned; otherwise returns the number of delta commits the
    * compaction subsumed. Delta/Iceberg surface this as
    * OPTIMIZE / rewrite_data_files; Spark's parser has no OPTIMIZE
    * statement for third-party catalogs, so the library verb IS the
    * operator surface. `table` is catalog-qualified ("graft.t"). */
  def optimizeTable(spark: org.apache.spark.sql.SparkSession,
      table: String): Int =
    graft.sources.GraftTableStore.compact(table, Some(spark))

  // ---- incremental materialized views --------------------------------

  /** registered MV definitions: target table → (source, group columns,
    * summed column, output aliases, last commit folded in). In-JVM —
    * the structure a lake format persists in the MV's own metadata. */
  private final case class MvDef(source: String, groupCols: Seq[String],
      sumCol: String, countAlias: String, sumAlias: String,
      lastVersion: Int)
  private val mvDefs =
    new scala.collection.concurrent.TrieMap[String, MvDef]()

  // ---- MV DEFINITION DURABILITY (round 12) ---------------------------
  //
  // The definition + refresh watermark persist as warehouse sidecars
  // (the metadata a real format stores in the MV's own table
  // properties), written atomically on create and after every fold —
  // so a fresh process can keep maintaining an MV it never created:
  // the target table replays from its transaction log, the definition
  // loads here, and the watermark says exactly which commits are
  // already folded (no double-apply, no gap). In-memory caches clear
  // with the restart simulation via a registered hook.
  private lazy val mvRestartHook: Unit = {
    graft.sources.GraftLog.registerRestartHook { () =>
      mvDefs.clear(); gwDefs.clear()
    }
    // DROP TABLE on an MV retires its definition sidecar and caches —
    // otherwise sumDefOf/gwDefOf resurrect the stale definition after
    // a restart and sidecars accumulate forever
    graft.sources.GraftMergeCatalog.registerDropHook { name =>
      mvDefs.remove(name); gwDefs.remove(name)
      // the lock OBJECTS stay resident (as tableLocks deliberately
      // does): removing one while a concurrent refresh holds it would
      // hand a re-created same-named MV a FRESH object, letting two
      // folds interleave inside foldMvChanges. Bounded by distinct MV
      // names seen in-process.
      val f = mvSidecar(name)
      if (f.isFile) { f.delete(); () }
    }
  }
  private def mvSidecar(mv: String): java.io.File =
    graft.sources.GraftWarehouse.mvSidecar(mv)
  private def persistMv(mv: String, kind: String, source: String,
      groupCols: Seq[String], aggCol: String, aliases: Seq[String],
      lastVersion: Int): Unit = {
    import org.json4s.JsonDSL._
    val body = org.json4s.jackson.JsonMethods.compact(
      org.json4s.jackson.JsonMethods.render(
        ("kind" -> kind) ~ ("source" -> source) ~
          ("groupCols" -> groupCols.toList) ~ ("aggCol" -> aggCol) ~
          ("aliases" -> aliases.toList) ~
          ("lastVersion" -> lastVersion)))
    val f = mvSidecar(mv)
    val tmp = new java.io.File(f.getAbsolutePath + ".tmp")
    val out = new java.io.FileOutputStream(tmp)
    try out.write(body.getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (!tmp.renameTo(f)) throw new IllegalStateException(
      s"could not persist MV definition $f")
  }
  private def loadMv(mv: String): Option[(String, String, Seq[String],
      String, Seq[String], Int)] = {
    val f = mvSidecar(mv)
    if (!f.isFile) return None
    import org.json4s._
    val j = org.json4s.jackson.JsonMethods.parse(new String(
      java.nio.file.Files.readAllBytes(f.toPath),
      java.nio.charset.StandardCharsets.UTF_8))
    def str(n: String) = (j \ n).asInstanceOf[JString].s
    def strs(n: String) = (j \ n).asInstanceOf[JArray].arr
      .map(_.asInstanceOf[JString].s)
    val last = j \ "lastVersion" match {
      case JInt(n) => n.toInt
      case JLong(n) => n.toInt
      case other => throw new IllegalStateException(s"bad mv def: $other")
    }
    Some((str("kind"), str("source"), strs("groupCols"), str("aggCol"),
      strs("aliases"), last))
  }
  private def sumDefOf(mv: String): Option[MvDef] =
    mvDefs.get(mv).orElse(loadMv(mv).collect {
      case ("sum", source, gcols, aggCol, Seq(n, sa), last) =>
        val d = MvDef(source, gcols, aggCol, n, sa, last)
        mvDefs.putIfAbsent(mv, d)
        mvDefs(mv)
    })
  private def gwDefOf(mv: String): Option[GwDef] =
    gwDefs.get(mv).orElse(loadMv(mv).collect {
      case ("gw", source, gcols, aggCol, Seq(n, lo, hi), last) =>
        val d = GwDef(source, gcols, aggCol, n, lo, hi, last)
        gwDefs.putIfAbsent(mv, d)
        gwDefs(mv)
    })
  /** per-MV fold serialization: the lastVersion check and the
    * MERGE + version bump must be one atomic step, or a batch refresh
    * racing a maintenance micro-batch could both pass the
    * `_commit_version > lastVersion` filter and double-apply the same
    * commits' deltas. One lock object per MV, created with the def. */
  private val mvLocks =
    new scala.collection.concurrent.TrieMap[String, Object]()
  private def mvLock(mv: String): Object =
    mvLocks.getOrElseUpdate(mv, new Object)

  /** CREATE MATERIALIZED VIEW (the incrementally-maintainable shape:
    * COUNT(*) + SUM over group keys — the self-maintainable aggregate
    * class; MIN/MAX are not retractable and are refused by
    * construction since the API offers no slot for them). Materializes
    * `mv` as a governed table holding
    * `SELECT groupCols, COUNT(*) countAlias, SUM(sumCol) sumAlias FROM
    * source GROUP BY groupCols` and records the source version it
    * reflects. `source` must be a merge-on-read governed table (the
    * change feed keys the refresh) and `sumCol` a BIGINT (incremental
    * ± arithmetic stays exact; quantize money to cents first). At
    * 100 TB the point is [[refreshMaterializedView]]: maintenance cost
    * is O(changes + touched groups), never a source rescan. */
  def createMaterializedView(spark: org.apache.spark.sql.SparkSession,
      mv: String, source: String, groupCols: Seq[String],
      countAlias: String, sumCol: String, sumAlias: String): Unit = {
    val srcSchema = spark.table(source).schema
    require(srcSchema(sumCol).dataType ==
      org.apache.spark.sql.types.LongType,
      s"materialized view $mv: SUM column '$sumCol' must be BIGINT " +
        "(exact incremental arithmetic — quantize to cents first); " +
        s"got ${srcSchema(sumCol).dataType.sql}")
    // fail at CREATE, not first refresh, if the source cannot serve a
    // change feed (planning the feed scan fires the MoR requirement)
    spark.read.option("startingVersion", Int.MaxValue)
      .table(s"$source.changes").queryExecution.executedPlan
    // the recorded watermark must be the PUBLISHED head — what both
    // the baseline read below and the change feed serve. Recording
    // the chain head would skip staged WAP commits forever (their
    // versions <= lastVersion once published); and the baseline read
    // is PINNED to that exact version so a commit landing between the
    // head read and the snapshot read cannot diverge the MV.
    val head = graft.sources.GraftTableStore.publishedCount(source) - 1
    val ddlCols = groupCols.map(c =>
      s"$c ${srcSchema(c).dataType.sql}").mkString(", ")
    mvRestartHook // evict-on-restart registration (once)
    spark.sql(s"DROP TABLE IF EXISTS $mv")
    // the MV TABLE is file-backed so the materialized state itself
    // survives a restart alongside the definition sidecar
    spark.sql(s"CREATE TABLE $mv ($ddlCols, " +
      s"$countAlias BIGINT, $sumAlias BIGINT) " +
      "TBLPROPERTIES ('graft.store'='parquet')")
    val baseline = // a source with no commits yet has no version to pin
      if (head < 0) spark.table(source)
      else spark.sql(s"SELECT * FROM $source VERSION AS OF $head")
    baseline
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as(countAlias), sum(sumCol).as(sumAlias))
      .writeTo(mv).append()
    mvDefs.put(mv, MvDef(source, groupCols, sumCol, countAlias,
      sumAlias, head))
    persistMv(mv, "sum", source, groupCols, sumCol,
      Seq(countAlias, sumAlias), head)
    ()
  }

  /** REFRESH MATERIALIZED VIEW, incrementally: fold the source's
    * CHANGE FEED since the last refresh into the MV — inserts and
    * update postimages add, deletes and update preimages retract — as
    * per-group deltas MERGEd into the MV table (groups reaching
    * count 0 DELETE; new groups INSERT). The source table is never
    * rescanned: cost is O(change rows + touched groups), the
    * incremental-view-maintenance contract, vs the full
    * recompute-the-world refresh. Returns (change rows folded, source
    * version now reflected); a no-change refresh is a no-op. */
  def refreshMaterializedView(spark: org.apache.spark.sql.SparkSession,
      mv: String): (Long, Int) = {
    val d = sumDefOf(mv).getOrElse(throw new IllegalArgumentException(
      s"$mv is not a registered materialized view — " +
        "createMaterializedView first"))
    // resolve the source THROUGH the catalog first: a fresh process
    // must lazily replay its transaction log before the published
    // head is read, or the refresh would silently no-op on head = -1
    spark.table(d.source)
    // the feed serves PUBLISHED commits only — staged WAP commits
    // fold after their publish, not before
    val head = graft.sources.GraftTableStore.publishedCount(d.source) - 1
    if (head <= d.lastVersion) return (0L, head)
    val feed = spark.read
      .option("startingVersion", (d.lastVersion + 1).toString)
      .table(s"${d.source}.changes")
    (foldMvChanges(spark, mv, feed), head)
  }

  /** fold a frame of change-feed rows into the MV — the shared core
    * of batch refresh and streaming maintenance. Commit-granular
    * idempotence: rows at or below the MV's recorded version are
    * dropped first, so a replayed micro-batch (or a refresh racing
    * the stream) applies each commit EXACTLY once. Returns the number
    * of change rows folded. */
  private def foldMvChanges(spark: org.apache.spark.sql.SparkSession,
      mv: String, changes: DataFrame): Long = mvLock(mv).synchronized {
    val d0 = sumDefOf(mv).getOrElse(throw new IllegalArgumentException(
      s"$mv is not a registered materialized view"))
    // force the MV TABLE's lazy log attach before the watermark read —
    // a fresh process restores the commit-carried watermark during
    // replay, and reading the map first would see a hole
    spark.table(mv)
    // the AUTHORITATIVE watermark is the one that rode the MV's own
    // MERGE commit (durable atomically with the fold — no crash
    // window); the sidecar value backstops a pre-first-fold MV. Take
    // the max: a crash between the MERGE commit and the sidecar write
    // leaves the sidecar one window behind, and re-folding that
    // window would double-apply the sum deltas.
    val effectiveLast = graft.sources.GraftTableStore.mvWatermarkOf(mv)
      .map(_.toInt).map(math.max(_, d0.lastVersion))
      .getOrElse(d0.lastVersion)
    val d = d0.copy(lastVersion = effectiveLast)
    // cache: the feed materializes snapshot DIFFS driver-side (the
    // documented CDC cost) — the count, max-version readout and the
    // MERGE below must not pay for it three times
    val fresh = changes
      .where(col("_commit_version") > d.lastVersion.toLong).cache()
    try {
      val nChanges = fresh.count()
      if (nChanges == 0L) return 0L
      val newLast = fresh
        .agg(max(col("_commit_version"))).collect()(0).getLong(0).toInt
      val sign = when(col("_change_type")
        .isin("insert", "update_postimage"), 1L).otherwise(-1L)
      val viewName = s"__mv_delta_${mv.replace('.', '_')}"
      fresh.select(d.groupCols.map(col) :+ sign.as("__sign") :+
          col(d.sumCol): _*)
        .groupBy(d.groupCols.map(col): _*)
        .agg(sum(col("__sign")).as("__dn"),
          sum(col("__sign") * col(d.sumCol)).as("__ds"))
        .where(col("__dn") =!= 0L || col("__ds") =!= 0L)
        .createOrReplaceTempView(viewName)
      val on = d.groupCols.map(c => s"t.$c <=> s.$c").mkString(" AND ")
      val gList = d.groupCols.mkString(", ")
      val sList = d.groupCols.map(c => s"s.$c").mkString(", ")
      // the new watermark rides INSIDE the MERGE's commit (consumed by
      // the commit path on this thread) — durable atomically with the
      // fold itself, the no-double-apply guarantee
      graft.sources.GraftTableStore.beginMvFold(mv, newLast.toLong)
      spark.sql(
        s"""MERGE INTO $mv t USING $viewName s ON $on
           |WHEN MATCHED AND t.${d.countAlias} + s.__dn = 0 THEN DELETE
           |WHEN MATCHED THEN UPDATE SET
           |  ${d.countAlias} = t.${d.countAlias} + s.__dn,
           |  ${d.sumAlias} = t.${d.sumAlias} + s.__ds
           |WHEN NOT MATCHED AND s.__dn > 0 THEN
           |  INSERT ($gList, ${d.countAlias}, ${d.sumAlias})
           |  VALUES ($sList, s.__dn, s.__ds)""".stripMargin)
      mvDefs.put(mv, d.copy(lastVersion = newLast))
      persistMv(mv, "sum", d.source, d.groupCols, d.sumCol,
        Seq(d.countAlias, d.sumAlias), newLast)
      nChanges
    } finally {
      // a MERGE whose delta view net-cancelled commits nothing — the
      // armed watermark must not leak onto this thread's next commit
      graft.sources.GraftTableStore.abortMvFold()
      fresh.unpersist()
      ()
    }
  }

  /** GROUP-WISE RECOMPUTE MVs: the incremental-maintenance fallback
    * for NON-RETRACTABLE aggregates (MIN/MAX — a delete of the
    * current max cannot be folded from the change feed alone, the
    * reason [[createMaterializedView]] refuses them by construction).
    * The standard IVM answer, implemented here: the change feed still
    * tells us WHICH groups changed (O(changes)), and only those
    * groups recompute from the base — the base scan is semi-joined to
    * the touched keys (broadcast — changed groups are small by
    * definition), so refresh cost is O(changes + rows of touched
    * groups), never a full rescan. Definitions: target → (source,
    * group cols, agg column, aliases, last version folded). */
  private final case class GwDef(source: String, groupCols: Seq[String],
      aggCol: String, nAlias: String, minAlias: String,
      maxAlias: String, lastVersion: Int)
  private val gwDefs =
    new scala.collection.concurrent.TrieMap[String, GwDef]()
  private val gwLocks =
    new scala.collection.concurrent.TrieMap[String, Object]()
  private def gwLock(mv: String): Object =
    gwLocks.getOrElseUpdate(mv, new Object)

  /** CREATE a group-wise MV: `SELECT groupCols, COUNT(*) nAlias,
    * MIN(aggCol) minAlias, MAX(aggCol) maxAlias FROM source GROUP BY
    * groupCols`, materialized as a governed table pinned to the
    * source's published head. `source` must serve a change feed
    * (merge-on-read) — the feed is what names the touched groups. */
  def createGroupwiseView(spark: org.apache.spark.sql.SparkSession,
      mv: String, source: String, groupCols: Seq[String],
      aggCol: String, nAlias: String, minAlias: String,
      maxAlias: String): Unit = {
    val srcSchema = spark.table(source).schema
    // fail at CREATE if the source cannot serve a change feed
    spark.read.option("startingVersion", Int.MaxValue)
      .table(s"$source.changes").queryExecution.executedPlan
    val head = graft.sources.GraftTableStore.publishedCount(source) - 1
    val aggT = srcSchema(aggCol).dataType.sql
    val ddlCols = groupCols.map(c =>
      s"$c ${srcSchema(c).dataType.sql}").mkString(", ")
    mvRestartHook
    spark.sql(s"DROP TABLE IF EXISTS $mv")
    spark.sql(s"CREATE TABLE $mv ($ddlCols, $nAlias BIGINT, " +
      s"$minAlias $aggT, $maxAlias $aggT) " +
      "TBLPROPERTIES ('graft.store'='parquet')")
    val baseline =
      if (head < 0) spark.table(source)
      else spark.sql(s"SELECT * FROM $source VERSION AS OF $head")
    baseline.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as(nAlias), min(aggCol).as(minAlias),
        max(aggCol).as(maxAlias))
      .writeTo(mv).append()
    gwDefs.put(mv, GwDef(source, groupCols, aggCol, nAlias, minAlias,
      maxAlias, head))
    persistMv(mv, "gw", source, groupCols, aggCol,
      Seq(nAlias, minAlias, maxAlias), head)
    ()
  }

  /** REFRESH a group-wise MV: the feed since the last refresh names
    * the TOUCHED GROUPS; exactly those recompute from the base —
    * pinned to the head version the feed window ends at, so a commit
    * racing the refresh cannot smear two states together — and MERGE
    * into the MV (vanished groups DELETE, new groups INSERT, changed
    * groups UPDATE). Returns (touched groups, version reflected). */
  def refreshGroupwiseView(spark: org.apache.spark.sql.SparkSession,
      mv: String): (Long, Int) = gwLock(mv).synchronized {
    val d = gwDefOf(mv).getOrElse(throw new IllegalArgumentException(
      s"$mv is not a registered group-wise view — " +
        "createGroupwiseView first"))
    // lazy catalog attach before the head read (see the sum MV twin)
    spark.table(d.source)
    val head = graft.sources.GraftTableStore.publishedCount(d.source) - 1
    if (head <= d.lastVersion) return (0L, head)
    val fresh = spark.read
      .option("startingVersion", (d.lastVersion + 1).toString)
      .option("endingVersion", head.toString)
      .table(s"${d.source}.changes")
    val touched = fresh.select(d.groupCols.map(col): _*).distinct()
      .cache()
    try {
      val nTouched = touched.count()
      if (nTouched == 0L) {
        gwDefs.put(mv, d.copy(lastVersion = head))
        persistMv(mv, "gw", d.source, d.groupCols, d.aggCol,
          Seq(d.nAlias, d.minAlias, d.maxAlias), head)
        return (0L, head)
      }
      // recompute ONLY the touched groups, against the pinned head.
      // Joins must be NULL-SAFE like the MERGE ON below: a NULL group
      // key is a real group (groupBy treats it as one) — a null-unsafe
      // semi join would drop its base rows and wrongly DELETE its row
      val base = spark.sql(s"SELECT * FROM ${d.source} VERSION AS OF $head")
        .alias("b")
      val tAlias = touched.alias("t")
      val semiCond = d.groupCols.map(c =>
        col(s"b.$c") <=> col(s"t.$c")).reduce(_ && _)
      val recomputed = base
        .join(broadcast(tAlias), semiCond, "left_semi")
        .groupBy(d.groupCols.map(col): _*)
        .agg(count(lit(1)).as(d.nAlias),
          min(d.aggCol).as(d.minAlias), max(d.aggCol).as(d.maxAlias))
        .alias("r")
      val viewName = s"__gw_delta_${mv.replace('.', '_')}"
      // a touched group absent from the recompute has NO live rows —
      // the left join's null count marks it for DELETE
      val outCond = d.groupCols.map(c =>
        col(s"t.$c") <=> col(s"r.$c")).reduce(_ && _)
      touched.alias("t").join(recomputed, outCond, "left")
        .select(d.groupCols.map(c => col(s"t.$c")) ++
          Seq(col(d.nAlias), col(d.minAlias), col(d.maxAlias)): _*)
        .createOrReplaceTempView(viewName)
      val on = d.groupCols.map(c => s"t.$c <=> s.$c").mkString(" AND ")
      val gList = d.groupCols.mkString(", ")
      val sList = d.groupCols.map(c => s"s.$c").mkString(", ")
      spark.sql(
        s"""MERGE INTO $mv t USING $viewName s ON $on
           |WHEN MATCHED AND s.${d.nAlias} IS NULL THEN DELETE
           |WHEN MATCHED THEN UPDATE SET
           |  ${d.nAlias} = s.${d.nAlias},
           |  ${d.minAlias} = s.${d.minAlias},
           |  ${d.maxAlias} = s.${d.maxAlias}
           |WHEN NOT MATCHED AND s.${d.nAlias} IS NOT NULL THEN
           |  INSERT ($gList, ${d.nAlias}, ${d.minAlias}, ${d.maxAlias})
           |  VALUES ($sList, s.${d.nAlias}, s.${d.minAlias},
           |    s.${d.maxAlias})""".stripMargin)
      gwDefs.put(mv, d.copy(lastVersion = head))
      persistMv(mv, "gw", d.source, d.groupCols, d.aggCol,
        Seq(d.nAlias, d.minAlias, d.maxAlias), head)
      (nTouched, head)
    } finally { touched.unpersist(); () }
  }

  /** CROSS-TABLE TRANSACTION (BEGIN…COMMIT over governed tables): an
    * ATOMIC multi-table append. Each DataFrame stages as parquet
    * files IN SPARK TASKS (no driver rows), then every table's head
    * is OCC-verified against the version recorded when the
    * transaction began and all commits land inside ONE store-lock
    * hold — a concurrent commit to ANY written table makes the whole
    * transaction refuse loudly (nothing commits; retry), and no
    * reader can observe one side without the other. Parquet-backed
    * tables only; identity columns are refused (their commit-time
    * value assignment needs the single-table path), while enforced
    * CHECK constraints and generated columns get full INSERT
    * semantics task-side. Returns the committed head version per
    * table, read under the commit lock. `expectedHeads` overrides the
    * begin-snapshot for callers that already read at a version (and
    * for conflict tests). */
  def transactAppend(spark: org.apache.spark.sql.SparkSession,
      writes: Seq[(String, DataFrame)],
      expectedHeads: Option[Map[String, Int]] = None): Map[String, Int] =
    transact(spark, writes.map { case (t, df) => t -> TxnOp.Append(df) },
      expectedHeads)

  /** One table's operation inside [[transact]]. */
  sealed trait TxnOp
  object TxnOp {
    /** append the DataFrame's rows (full INSERT semantics: enforced
      * CHECKs, generated columns; identity tables refuse). */
    final case class Append(df: DataFrame) extends TxnOp
    /** delete the rows matching a SQL predicate, via per-file
      * deletion-vector bitmaps — zero data bytes rewritten. The
      * predicate must translate exactly (all-or-nothing); a shape
      * that doesn't belongs in a single-table DELETE statement. */
    final case class Delete(condition: String) extends TxnOp
  }

  /** READ-WRITE cross-table transaction (round 14): appends and
    * row-level DELETEs commit atomically under ONE intent marker —
    * the fact-plus-rollup reconciliation shape (append the corrected
    * facts, delete the stale dimension rows, readers see both or
    * neither). Every participant's head is OCC-verified against the
    * begin snapshot; a concurrent commit to ANY participant refuses
    * the whole transaction loudly, and a crash after the marker rolls
    * FORWARD on the next attach — both sides, in any process. Appends
    * stage task-side (no driver rows); deletes compute zone-map-
    * prescreened per-file DV bitmaps task-side (O(matched files)
    * metadata). */
  def transact(spark: org.apache.spark.sql.SparkSession,
      writes: Seq[(String, TxnOp)],
      expectedHeads: Option[Map[String, Int]] = None): Map[String, Int] = {
    import graft.sources.{GraftParquetStore, GraftTableStore}
    require(writes.nonEmpty, "empty transaction")
    require(writes.map(_._1).distinct.size == writes.size,
      "a transaction writes each table at most once")
    writes.foreach { case (t, _) =>
      spark.table(t) // force the lazy catalog attach before head reads
      require(GraftParquetStore.isBacked(t),
        s"transaction: $t is not parquet-backed — multi-table commits " +
          "are a file-store surface")
    }
    val heads = expectedHeads.getOrElse(
      writes.map(w => w._1 -> (GraftTableStore.commitCount(w._1) - 1))
        .toMap)
    val parts = writes.map {
      case (t, TxnOp.Append(df)) =>
        val (files, rows) = stageTxnAppend(spark, t, df)
        GraftTableStore.TxnStagedAppend(t, files, rows)
      case (t, TxnOp.Delete(cond)) =>
        GraftTableStore.stageTxnDelete(spark, t, cond)
    }
    // refresh every staged file's mtime at the commit point: an early
    // participant's staging dir goes idle while later (possibly huge)
    // participants stage, and a concurrent orphan sweep keys liveness
    // on mtime — the touch shrinks its exposure to the commit itself
    val now = System.currentTimeMillis()
    parts.foreach {
      case GraftTableStore.TxnStagedAppend(_, files, _) =>
        files.foreach { f =>
          val file = new java.io.File(f.path)
          file.setLastModified(now)
          Option(file.getParentFile).foreach(_.setLastModified(now))
        }
      case _ => ()
    }
    GraftTableStore.commitTxn(parts, heads)
  }

  /** the append side of a transaction: task-side staging with full
    * INSERT semantics (the body [[transactAppend]] always had). */
  private def stageTxnAppend(spark: org.apache.spark.sql.SparkSession,
      t: String, df: DataFrame)
      : (Vector[graft.sources.GraftFileInfo], Long) = {
    import graft.sources.GraftParquetStore
    // stage OUTSIDE the lock — Spark jobs must not block concurrent
    // commits. Enforced CHECK constraints evaluate per row inside the
    // staging pass and generated columns recompute in the writers
    // (ALWAYS semantics) — a transactional append admits exactly what
    // a plain INSERT admits; identity assignment needs the
    // commit-time high-water mark, so identity tables refuse.
    val m = GraftParquetStore.meta(t).get
    require(graft.sources.GraftGenerated.identityOf(m.schema).isEmpty,
      s"transaction: $t has an IDENTITY column — its commit-time " +
        "value assignment needs the single-table write path")
    val checks = graft.sources.GraftMergeCatalog.constraintsOf(t)
      .collect {
        case c: org.apache.spark.sql.connector.catalog.constraints.Check
          if c.enforced() => (c.name(), c.predicateSql())
      }.toSeq
    GraftParquetStore.stageAppendTaskSide(spark, m, df, checks)
  }

  /** SNAPSHOT-ISOLATED MULTI-TABLE READ — the read twin of
    * [[transact]]: capture ONE version vector for `tables`,
    * linearized against every commit path (single-table commits,
    * multi-table transactions), so a fact-joins-dim query racing a
    * transact reads EITHER the full pre-state or the full post-state
    * of both tables, never the fact rows without their dimension
    * update. Returns table -> pinned version; read each participant
    * with `VERSION AS OF <version>` (or [[tableAt]]) — version
    * pinning is exact inside the retention window, so the pinned
    * reads stay stable however many commits land after the capture.
    * Capture is O(tables) under the commit lock, zero I/O. */
  def readTransaction(spark: org.apache.spark.sql.SparkSession,
      tables: Seq[String]): Map[String, Int] = {
    require(tables.nonEmpty, "empty read transaction")
    tables.foreach(spark.table(_)) // force the lazy catalog attach
    graft.sources.GraftTableStore.snapshotHeads(tables)
  }

  /** `table` pinned at `version` — the reader side of a
    * [[readTransaction]] vector. */
  def tableAt(spark: org.apache.spark.sql.SparkSession,
      table: String, version: Int): DataFrame =
    spark.sql(s"SELECT * FROM $table VERSION AS OF $version")

  /** CONTINUOUS MV MAINTENANCE: a streaming query tailing the
    * source's change feed, folding every micro-batch into the MV
    * through the same commit-granular fold as the batch refresh — the
    * MV keeps itself fresh as commits land, no refresh calls. The
    * returned query runs Trigger.AvailableNow (catch up, then stop —
    * call again after more commits, or run it on a schedule the way a
    * warehouse schedules MV maintenance); batch refresh and the
    * stream can interleave safely (each commit folds exactly once). */
  def maintainMaterializedView(
      spark: org.apache.spark.sql.SparkSession, mv: String,
      checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val d = sumDefOf(mv).getOrElse(throw new IllegalArgumentException(
      s"$mv is not a registered materialized view — " +
        "createMaterializedView first"))
    spark.readStream.table(s"${d.source}.changes")
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        foldMvChanges(batch.sparkSession, mv, batch); ()
      }
      .start()
  }

  /** OPTIMIZE's deletion-vector PURGE: rewrite only the files whose
    * manifest entries carry a DV bitmap (each as a fresh file of its
    * live rows — same partition key, spec and width); DV-free files
    * survive by reference. Reads are unchanged; subsequent scans stop
    * paying the per-record bit test and manifest MIN/MAX/COUNT(col)
    * pushdown becomes answerable again. Returns files rewritten
    * (0 = no DVs, idempotent no-op). */
  def purgeDeletes(spark: org.apache.spark.sql.SparkSession,
      table: String): Int = {
    // an EQUALITY-DELETE suffix purges by task-side compaction first
    // (each file's live rows re-stage where the task runs, the key
    // test resolves exactly once, and the read path stops walking the
    // chain) — then bitmap-carrying files rewrite as usual
    if (graft.sources.GraftTableStore.hasEqDeleteSuffix(table))
      graft.sources.GraftTableStore.compact(table, Some(spark))
    graft.sources.GraftTableStore.purgeDvs(table, spark)
  }

  /** EQUALITY DELETE (Iceberg v2's second delete form): commit
    * "DELETE WHERE `keyCol` IN (`keys`)" as an O(|keys|) transaction-
    * log entry — ZERO data files opened, zero bytes rewritten at
    * commit time (measurable: [[graft.sources.GraftDvMetrics]]
    * records filesOpened=0). This is the streaming-upsert-friendly
    * delete: a CDC writer retires keys it KNOWS without scanning for
    * them; keys matching no live row are no-ops. Readers resolve the
    * key test at scan (the same task-side id test a merge-on-read
    * delta ships); [[purgeDeletes]] / OPTIMIZE compacts the chain
    * away. Returns the committed version. */
  def deleteWhereKeyIn(spark: org.apache.spark.sql.SparkSession,
      table: String, keyCol: String, keys: Seq[Any]): Int = {
    spark.table(table) // force the lazy catalog attach
    val internal = keys.map(
      org.apache.spark.sql.catalyst.CatalystTypeConverters
        .convertToCatalyst).toArray
    graft.sources.GraftTableStore.commitEqDelete(table, keyCol, internal)
  }

  /** BIN-PACKING compaction (OPTIMIZE's small-file rewrite): merge
    * files under `targetRows` live rows into files of up to that
    * size, within (partition key, spec, width) groups — semantics
    * unchanged, large and DV-carrying files survive by reference.
    * Returns the net file-count reduction (0 = idempotent no-op).
    * The streaming-ingest small-file problem at 100 TB, solved the
    * way every lake format solves it. */
  def rewriteSmallFiles(spark: org.apache.spark.sql.SparkSession,
      table: String, targetRows: Int): Int =
    graft.sources.GraftTableStore.binPack(table, targetRows, spark)

  /** VACUUM / expire_snapshots — explicit retention: drop all but the
    * newest `keep` retained versions NOW (the store's rolling 64-
    * version cap keeps applying on top). Version numbers stay ABSOLUTE
    * — expired versions fail loudly on `VERSION AS OF` with the
    * retention reason, exactly like versions aged out by the cap; if
    * the new earliest retained version is a delta commit it is
    * materialized first (checkpoint-before-expire), so every retained
    * version stays resolvable. Returns the number of versions
    * expired. */
  def expireSnapshots(spark: org.apache.spark.sql.SparkSession,
      table: String, keep: Int): Int =
    graft.sources.GraftTableStore.expireSnapshots(table, keep)

  /** VACUUM's ORPHAN SWEEP (round 13): collect files a crashed or
    * conflicted writer left behind — task-staged files a commit never
    * adopted (tmp staging dirs), files a refused commit had already
    * adopted into a version directory, and staged change-data of
    * expired versions. Only files older than `graceMs` and referenced
    * by NO retained manifest are touched, so a concurrent in-flight
    * write always survives (Delta's VACUUM grace-window contract).
    * Returns files deleted. */
  def vacuumOrphans(spark: org.apache.spark.sql.SparkSession,
      table: String, graceMs: Long = 10L * 60 * 1000,
      force: Boolean = false): Int = {
    // the staging-dir half scans the SHARED java.io.tmpdir across all
    // tables and sessions — a tiny grace would delete live concurrent
    // writers' staging work warehouse-wide. Enforce a floor (Iceberg's
    // remove_orphan_files guards older_than the same way); tests that
    // genuinely need a short grace opt in with `force`.
    val floor = 60000L
    if (!force && graceMs < floor)
      throw new IllegalArgumentException(
        s"remove_orphan_files: grace_ms=$graceMs is below the " +
          s"$floor ms safety floor — a short grace can delete live " +
          "concurrent writers' staging directories across the whole " +
          "warehouse; pass force=true only if you are certain no " +
          "other writer is active")
    spark.table(table) // lazy log attach before the manifest readout
    graft.sources.GraftTableStore.vacuumOrphans(table, graceMs) +
      graft.sources.GraftParquetStore.sweepStagingDirs(graceMs)
  }

  /** COPY INTO: incremental, IDEMPOTENT file ingest (Delta's COPY
    * INTO / Auto Loader shape). Lists parquet files under `srcDir`,
    * loads ONLY those not already recorded in the table's ingest
    * ledger (one distributed read+append over the new files' paths —
    * rows never touch the driver), and records them. Re-running after
    * new files land loads just the delta; re-running unchanged is a
    * no-op. Returns (filesLoaded, rowsLoaded). */
  def copyInto(spark: org.apache.spark.sql.SparkSession,
      table: String, srcDir: String): (Int, Long) = {
    import graft.sources.GraftTableStore
    def listParquet(f: java.io.File): Seq[java.io.File] = {
      val kids = Option(f.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
      kids.filter(_.isDirectory).flatMap(listParquet) ++
        kids.filter(k => k.isFile && k.getName.endsWith(".parquet"))
    }
    val all = listParquet(new java.io.File(srcDir))
      .map(_.getAbsolutePath).sorted
    // resolve the table THROUGH the catalog first: a fresh process
    // must lazily replay the transaction log (which carries the
    // ingest ledger) before the ledger is consulted — reading the
    // store directly would see an empty ledger and double-load
    spark.table(table)
    val done = GraftTableStore.ingestedFor(table)
    val fresh = all.filterNot(done)
    if (fresh.isEmpty) return (0, 0L)
    val df = spark.read.parquet(fresh: _*)
    val n = df.count()
    // EXACTLY-ONCE: the ledger update rides INSIDE the append commit
    // (one locked step, one transaction-log entry on a file-backed
    // table) — a crash either commits rows AND ledger or neither, so
    // a retry can never double-load. beginIngest stages the paths;
    // the commit consumes them; a failed append clears the staging.
    GraftTableStore.beginIngest(table, fresh)
    try df.writeTo(table).append()
    finally GraftTableStore.abortIngest(table) // no-op after a commit
    (fresh.length, n)
  }

  /** PARTITION SPEC EVOLUTION (Iceberg's headline ALTER — the one
    * partitioning change a 100 TB table can actually afford): make
    * `spec` the table's CURRENT partition spec WITHOUT rewriting a
    * single stored file. Metadata-only: files already written keep
    * their own spec id and keep pruning by THEIR spec at scan
    * (per-spec manifest evaluation); only commits from now on lay out
    * — and prune — under the new spec. While a live version still
    * mixes specs the scan reports UnknownPartitioning (no
    * storage-partitioned join across two key domains); a rewrite
    * (INSERT OVERWRITE, OPTIMIZE ZORDER) retires the legacy files and
    * the SPJ claim returns. `spec` is a comma-separated transform
    * list: `"status"` / `"identity(status)"`, `"bucket(16, k)"`,
    * `"days(ts)"`, `"truncate(1024, k)"`. */
  def evolvePartitioning(spark: org.apache.spark.sql.SparkSession,
      table: String, spec: String): Unit = {
    import graft.sources.{GraftBucketPart, GraftDaysPart, GraftIdentityPart, GraftPartField, GraftTruncatePart}
    val Bucket = """bucket\(\s*(\d+)\s*,\s*(\w+)\s*\)""".r
    val Trunc = """truncate\(\s*(\d+)\s*,\s*(\w+)\s*\)""".r
    val Days = """days\(\s*(\w+)\s*\)""".r
    val Ident = """identity\(\s*(\w+)\s*\)""".r
    val Bare = """(\w+)""".r
    // split on commas OUTSIDE parentheses: `bucket(16, k), days(ts)`
    // has both kinds
    val fields: Array[GraftPartField] = spec
      .split(""",(?![^(]*\))""").map(_.trim)
      .filter(_.nonEmpty).map {
        case Bucket(n, c) => GraftBucketPart(c, n.toInt)
        case Trunc(w, c) => GraftTruncatePart(c, w.toInt)
        case Days(c) => GraftDaysPart(c)
        case Ident(c) => GraftIdentityPart(c)
        case Bare(c) => GraftIdentityPart(c)
        case other => throw new IllegalArgumentException(
          s"unparseable partition transform: '$other' (supported: " +
            "identity(c)/c, bucket(n, c), days(c), truncate(w, c))")
      }
    require(fields.nonEmpty, "partition spec must name at least one " +
      "transform (dropping all partitioning is not supported)")
    graft.sources.GraftMergeCatalog.evolvePartitioning(table, fields)
  }

  /** DESCRIBE DETAIL (Delta's `DESCRIBE DETAIL` one-row table
    * summary): storage format, current row count, retained version
    * count, distinct partition count of the current manifest and a
    * has-files flag — O(metadata) from the transaction log and
    * manifest, no data row touched. The operational readout a
    * maintenance job checks before choosing compaction/VACUUM
    * targets. `table` catalog-qualified ("graft.t"). */
  def tableDetail(spark: org.apache.spark.sql.SparkSession,
      table: String): DataFrame = {
    import graft.sources.{GraftParquetStore, GraftTableStore}
    val hist = GraftTableStore.history(table)
    require(hist.nonEmpty, s"no such governed table (or no commits): " +
      s"$table")
    val backed = GraftParquetStore.isBacked(table)
    val files =
      if (backed) GraftTableStore.commitFiles(table, hist.last._1)
      else Vector.empty
    val nParts =
      if (backed) files.map(_.key).distinct.length.toLong else 0L
    import spark.implicits._
    Seq((if (backed) "parquet" else "memory",
      hist.last._3.toLong, hist.size.toLong, nParts,
      files.nonEmpty && files.forall(_.bytes > 0)))
      .toDF("format", "num_rows", "n_versions", "n_partitions",
        "has_files")
  }

  /** The stored CONSTRAINT LISTING of a governed table (the
    * information-schema readout): one row per constraint with its
    * name, kind (Check / PrimaryKey / Unique / ForeignKey), whether
    * it is ENFORCED (only CHECK can be) and whether RELY lets an
    * optimizer trust it. PK/UNIQUE/FK are INFORMATIONAL — declared
    * NOT ENFORCED, stored and served, never validated (the ANSI
    * RELY contract real warehouses use for join elimination). */
  def tableConstraints(spark: org.apache.spark.sql.SparkSession,
      table: String): DataFrame = {
    import spark.implicits._
    graft.sources.GraftMergeCatalog.constraintsOf(table).toSeq
      .map(c => (c.name(), c.getClass.getSimpleName, c.enforced(),
        c.rely()))
      .toDF("c_name", "c_type", "enforced", "rely")
  }

  /** SHALLOW CLONE (Delta's `CREATE TABLE dst SHALLOW CLONE src`):
    * create `dst` as a new governed table whose v0 commit REFERENCES
    * `src`'s current published content — on a parquet-backed source
    * the clone re-lists the source's file manifest verbatim (zero
    * rows read, zero bytes copied: at 100 TB a clone is one manifest
    * write), in memory the snapshot array is shared by reference.
    * The clone copies the source's full definition (physical schema
    * with column-mapping slots, partition spec, row-level mode,
    * parquet backing) and the two tables evolve independently from
    * that instant: the clone's own commits write under its own
    * directory. Shared files are GC-safe — every file-delete sweep
    * (retention trim, VACUUM, DROP TABLE) consults every registered
    * table's retained manifests and never deletes a still-referenced
    * file, so dropping or vacuuming the source cannot corrupt the
    * clone (the documented shallow-clone hazard in real lake formats;
    * removed here by the global manifest sweep). Returns the source
    * version the clone captured. Both names catalog-qualified
    * ("graft.src", "graft.dst"). */
  def cloneTable(spark: org.apache.spark.sql.SparkSession,
      src: String, dst: String): Int = {
    graft.sources.GraftMergeCatalog.cloneDef(src, dst)
    if (graft.sources.GraftParquetStore.isBacked(src))
      graft.sources.GraftParquetStore.registerLike(src, dst)
    graft.sources.GraftTableStore.cloneTable(src, dst)
  }

  /** RESTORE the table to version `v` (rollback): appends a commit
    * that REFERENCES the old content — history preserved, and on a
    * parquet-backed table the restore is METADATA-ONLY (the new
    * commit re-references version v's file manifest; no data moves —
    * Delta's RESTORE TABLE shape). Returns the new version. */
  def restoreTable(spark: org.apache.spark.sql.SparkSession,
      table: String, version: Int): Int =
    graft.sources.GraftTableStore.restore(table, version)

  /** OPTIMIZE ZORDER BY (colA, colB): rewrite the current snapshot of
    * a parquet-backed table sorted by the Morton interleave of the two
    * (integral) columns, so the output files hold z-contiguous ranges
    * and zone maps skip files for predicates on EITHER column — the
    * multi-dimensional layout rewrite. Returns the new version. */
  def optimizeZorder(spark: org.apache.spark.sql.SparkSession,
      table: String, colA: String, colB: String): Int = {
    val m = graft.sources.GraftParquetStore.meta(table).getOrElse(
      throw new IllegalArgumentException(
        s"OPTIMIZE ZORDER requires a parquet-backed table: $table"))
    graft.sources.GraftTableStore.zorder(table, m.schema,
      m.schema.fieldIndex(colA), m.schema.fieldIndex(colB), Some(spark))
  }

  /** Create a BRANCH — a writable named ref over the version chain —
    * at the current published (main) head. With the session conf
    * `graft.wap.branch` set to its name, every batch commit lands on
    * the branch while main stays put: the WRITE-AUDIT-PUBLISH pattern
    * (Iceberg's spark.wap.branch). Read it with
    * `VERSION AS OF '<branch>'`; publish with [[publishBranch]].
    * Unqualified reads, streaming reads and the change feed serve
    * ONLY published (main) commits throughout. */
  def createBranch(spark: org.apache.spark.sql.SparkSession,
      table: String, branch: String): Unit =
    graft.sources.GraftTableStore.createRef(table, branch, isTag = false)

  /** Create a TAG — an immutable named ref — at the current published
    * head (e.g. 'v2024-audit'); readable forever within retention via
    * `VERSION AS OF '<tag>'`, never writable. */
  def createTag(spark: org.apache.spark.sql.SparkSession,
      table: String, tag: String): Unit =
    graft.sources.GraftTableStore.createRef(table, tag, isTag = true)

  /** PUBLISH (WAP step 3): fast-forward main to the branch head — one
    * atomic pointer move, nothing rewritten; audit-approved staged
    * commits become visible to every reader at this instant. Forward-
    * only (a branch behind main refuses — publishing it would roll
    * the table back). Returns the newly published version. */
  def publishBranch(spark: org.apache.spark.sql.SparkSession,
      table: String, branch: String): Int =
    graft.sources.GraftTableStore.fastForward(table, branch)

  // ---- sampling & splits -------------------------------------------

  /** Deterministic hash sample at rate n/256 — a pure function of the
    * key: stable under relayout, retries and engine swaps (md5 prefix,
    * the cross-engine-provable form; never `sample()`). */
  def hashSample(df: DataFrame, key: Column, rate256: Int): DataFrame =
    df.where(conv(substring(md5(key.cast(StringType)), 1, 2), 16, 10)
      .cast(IntegerType) < rate256)

  /** Deterministic train/val/test assignment (~80/10/10 by md5 mod 10). */
  def split3(key: Column): Column = {
    val b = conv(substring(md5(key.cast(StringType)), 1, 2), 16, 10)
      .cast(IntegerType) % 10
    when(b < 8, "train").when(b === 8, "val").otherwise("test")
  }

  /** Weighted reservoir sample (Efraimidis–Spirakis): the k rows with
    * the smallest −ln(u)/w keys, u a pure md5 uniform of `key` (no
    * RNG). P(selected) ∝ weight for ANY positive weight — fractional
    * weights included (a floor-at-1 clamp here would silently flatten
    * sub-unit weights into a uniform sample); rows with NULL or
    * non-positive weight are excluded, their selection probability
    * being 0. Selection uses the raw double key with a `key` tiebreak
    * (layout-stable: both are pure row functions); the top-k runs as
    * per-partition heaps (TakeOrderedAndProject), no full sort. The
    * fixture query `sample_weighted` keeps its integer-weight
    * quantized-key form for cross-engine oracle hash-stability. */
  def weightedSample(df: DataFrame, key: Column, weight: Column,
      k: Int): DataFrame = {
    val w = weight.cast(DoubleType)
    df.where(w.isNotNull && w > 0.0)
      .withColumn("__kq", -log(graft.Det.md5Uniform(key)) / w)
      .orderBy(col("__kq"), key)
      .limit(k)
      .drop("__kq")
  }

  // ---- vectors ------------------------------------------------------

  /** Codegen'd float-vector dot product (≡ cosine on unit vectors). */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExprs.dotF(a, b)

  /** Exact top-k neighbors for a bounded query set: broadcast the
    * queries, one corpus scan, per-query window. `queries` must be
    * small (it is broadcast); columns q_id/q_emb. */
  def topK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("vec_id"))
    corpus.crossJoin(broadcast(queries))
      .where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(dot(col("q_emb"), col("embedding")), 4).as("sim"))
      .withColumn("rank", row_number().over(w).cast(LongType))
      .where(col("rank") <= k)
  }

  /** Distributed Lloyd's k-means over a (vec_id, embedding) frame:
    * deterministic init from the k smallest vec_ids, `iters`
    * broadcast-assign + integer-centroid-update rounds, exact argmin
    * assignment — collect-free, engine-exact after 1e6 quantization.
    * Returns (vec_id, cluster, dist_q). Each round re-derives the
    * quantized component stream from `emb`; at real scale persist/
    * checkpoint `emb` before calling (this builder stays action-free
    * by the API contract, so caching is the caller's choice). */
  def kmeans(emb: DataFrame, k: Int = 8, iters: Int = 2): DataFrame =
    graft.operators.AnalyticsOps.kmeansAssign(emb, k, iters)

  /** Upper-triangle covariance matrix of any frame with an `embedding`
    * array column, as (dim_i, dim_j, n_vecs, cov) — exact quantized
    * moments, one O(d²) shuffle (see vec_covariance); null-embedding
    * rows are excluded from n. Input to whitening / PCA. */
  def covariance(emb: DataFrame): DataFrame =
    graft.operators.AnalyticsOps.covarianceFrame(emb)

  /** Top-4 PCA eigenpairs of an embedding frame: (axes, eigenvalues),
    * or None on an empty / zero-variance corpus. The covariance is the
    * distributed exact-moment aggregation; the O(d²) eigen step is a
    * deterministic driver-side power iteration — a pure function of
    * the corpus (see vec_pca_project). */
  def pcaFit(emb: DataFrame): Option[(Array[Array[Double]], Array[Double])] =
    graft.operators.AnalyticsOps.pcaFit(emb)

  /** Project an embedding frame onto fitted axes: appends p1..pK
    * columns, each an exact integer dot of the 1e6-quantized embedding
    * and axis divided once in double space — bit-stable across
    * engines and layouts (the dot_q kernel). */
  def pcaProject(emb: DataFrame, axes: Array[Array[Double]]): DataFrame = {
    val pcols = axes.zipWithIndex.map { case (v, i) =>
      (graft.functions.VectorExprs.dotQ(col("embedding"),
        typedLit(v.map(x => math.floor(x * 1e6 + 0.5).toLong).toSeq))
        .cast(DoubleType) / lit(1e12)).as(s"p${i + 1}")
    }
    emb.select(emb.columns.map(col).toSeq ++ pcols: _*)
  }

  /** Fit 8×16 product-quantization codebooks on a bounded
    * deterministic sample of a (vec_id, embedding) frame (Jégou et
    * al. 2011), or None when the corpus is too small / the dimension
    * doesn't split. */
  def pqFit(emb: DataFrame): Option[Array[Array[Array[Double]]]] =
    graft.operators.VectorOps.pqFit(emb)

  /** PQ-encode an embedding frame with fitted codebooks: appends one
    * small-int code column per subspace (c0..c7) in a single narrow
    * codegen'd pass — the 64×-smaller representation an ANN index
    * stores at 100 TB. */
  def pqEncode(emb: DataFrame,
      codebooks: Array[Array[Array[Double]]]): DataFrame =
    graft.operators.VectorOps.pqEncode(emb, codebooks)

  // ---- curation -----------------------------------------------------

  /** Greedy longest-match subword (WordPiece-style) tokenization of a
    * (doc_id, text) frame: one row per word — (doc_id, word_idx, toks
    * array<string> with ## continuation markers, unk). Runs on the
    * codegen word_piece kernel over the fixed WordPieceUtil vocab
    * (single-char fallback ⇒ [UNK] only on out-of-alphabet words); a
    * production deployment swaps the vocab, the algorithm is the
    * standard WordPiece inference rule. Sum size(toks) per doc for
    * subword budgeting (pipeline_pack_subword's unit). */
  def subwordTokens(docs: DataFrame): DataFrame =
    graft.operators.TextOps.subwordPerWord(docs)

  /** Per-document MinHash LSH band keys of a (doc_id, text) frame —
    * (doc_id, band), 4 decimal-triple keys per doc (dedup_near's exact
    * family). The keyed unit for band-bucketed near-dup joins and the
    * streaming admission gate (NearDupBandProcessor). Docs under 3
    * words have no shingles hence no keys — they cannot near-collide. */
  def minhashBandKeys(docs: DataFrame): DataFrame =
    graft.operators.VectorOps.minhashBandKeys(docs)

  /** Cross-document boilerplate removal over aligned w-token chunks of
    * a (doc_id, text) frame: chunks in ≥ minDf distinct docs are
    * dropped everywhere; returns (doc_id, n_chunks, n_removed,
    * clean_text) with text rebuilt in chunk order. */
  def removeBoilerplate(docs: DataFrame, w: Int = 5,
      minDf: Int = 3): DataFrame =
    graft.operators.TextOps.boilerplateClean(docs, w, minDf)

  /** Directed containment pairs over a (doc_id, hs sorted-distinct
    * shingle-hash array) frame: rows where |A∩B|/|A| ≥ 0.9 — the
    * doc-embedded-in-doc relation symmetric Jaccard misses. */
  def containmentPairs(docs: DataFrame, minShingles: Int = 8): DataFrame =
    graft.operators.TextOps.containmentPairs(docs, minShingles)

  /** Remove every cross-doc duplicated ≥ k-token verbatim span from all
    * but its lowest-doc_id occurrence (the removal half of Lee et al.
    * 2022 — substringPairs detects, this rewrites): returns (doc_id,
    * n_tokens, n_removed, text_clean) over a (doc_id, text) frame. */
  def removeDuplicateSpans(docs: DataFrame, k: Int = 13): DataFrame =
    graft.operators.TextOps.substringClean(docs, k)

  /** The C4 span-dedup rule (Raffel et al. 2020 §2.2) over a (doc_id,
    * text) frame: every repeated aligned w-token chunk keeps exactly its
    * FIRST corpus-wide occurrence; later copies are cut and the text
    * rebuilt in order. Distinct from removeBoilerplate (df-threshold
    * drops ALL copies). Returns (doc_id, n_chunks, n_removed,
    * clean_text). */
  def dedupSpansKeepFirst(docs: DataFrame, w: Int = 5): DataFrame =
    graft.operators.TextOps.c4LineDedup(docs, w)

  /** Winnowing fingerprints (Schleimer et al. 2003, robust rule) over a
    * (doc_id, text) frame: token k-gram hashes, rightmost-minimum
    * selection per w-window — any shared ≥ w+k-1-token run between two
    * docs is guaranteed a shared fingerprint, at density 2/(w+1).
    * Returns (doc_id, pos, fp). */
  def winnowFingerprints(docs: DataFrame, k: Int = 3, w: Int = 4): DataFrame =
    graft.operators.TextOps.winnowFingerprints(docs, k, w)

  /** BPE merge learning (Sennrich et al. 2016) over a (doc_id, text)
    * frame: returns (merge table (rnd, p1, p2, pair_count), final
    * (w, cnt, pos, piece) segmentation state). Frequency-weighted over
    * the distinct-word frame, `</w>` terminal, lexicographic tiebreak,
    * greedy non-overlapping re-segmentation; rounds after pair
    * exhaustion are no-ops. */
  def bpeTrain(docs: DataFrame): (DataFrame, DataFrame) =
    graft.operators.BpeOps.trainChain(docs)

  /** Gopher repetition filter (Rae et al. 2021 A1.1) over a (doc_id,
    * text) frame: char-mass fractions of the dominant {2,3,4}-grams and
    * duplicated {5..8}-grams plus the paper-threshold is_clean verdict —
    * catches degenerate repetition-loop docs that duplicate nothing
    * cross-doc and therefore pass every dedup op. */
  def repetitionStats(docs: DataFrame): DataFrame =
    graft.operators.TextOps.repetitionStats(docs)

  /** Temperature-scaled mixture sampling (α = 0.5, the multilingual-LM
    * recipe) over any frame: budget = half the input, per-group rate
    * ∝ √n/n, admission decided in exact integer arithmetic (md5-byte
    * cross-multiplication — no RNG, no float boundary). Returns the
    * admitted rows plus the group's `rate`. */
  def temperatureSample(df: DataFrame, groupCol: String,
      idCol: String): DataFrame =
    graft.operators.CurationOps.temperatureSample(df, groupCol, idCol)

  /** MMR diversity reranking (Carbonell & Goldstein 1998) over a
    * (vec_id, embedding) corpus and a (q_id, q_emb) query frame: each
    * query's top-`poolSize` pool greedily reranked into a top-`k` by
    * λ·sim(q,c) − λC·max sim-to-selected (ties by vec_id) —
    * (q_id, vec_id, rank). The standard diversity pass for RAG context
    * assembly and training-example selection.
    *
    * Semantics to know before calling with external frames:
    *  - NULL embeddings (corpus or query side) are excluded from the
    *    pool — they can never be selected.
    *  - `excludeSelf` (default true) drops any candidate whose vec_id
    *    NUMERICALLY equals the query's q_id. That is correct when the
    *    queries are corpus members (self-retrieval is vacuous); for an
    *    external query frame whose q_id space is unrelated to corpus
    *    vec_ids, pass false — otherwise an id collision silently drops
    *    that candidate from that query's pool.
    *  - λ and its complement are separate parameters (not derived as
    *    1 − λ): the defaults must stay the bit-exact 0.7/0.3 doubles
    *    the engine's oracle replays; pass both when overriding. */
  def mmrRerank(corpus: DataFrame, queries: DataFrame,
      poolSize: Int = 20, k: Int = 10, lambda: Double = 0.7,
      lambdaC: Double = 0.3, excludeSelf: Boolean = true): DataFrame =
    graft.operators.VectorOps.mmrRerank(corpus, queries, poolSize, k,
      lambda, lambdaC, excludeSelf)

  /** SemDeDup (Abbas et al. 2023) over a (vec_id, embedding) frame:
    * cell-bounded semantic dedup against the given k-means centroids —
    * (vec_id, cluster, is_kept), keeping the centroid-nearest member of
    * every same-cell dup group at dot ≥ tau. Fit centroids once (e.g.
    * on a bounded sample) and reuse across snapshots. */
  def semanticDedup(emb: DataFrame, centroids: Array[Array[Double]],
      tau: Double = 0.4): DataFrame =
    graft.operators.VectorOps.semanticDedup(emb, centroids, tau)

  // ---- statistics & evaluation (round 7b) ---------------------------

  /** Population Stability Index between the `isA` and !`isA` halves of
    * `df`, over a precomputed integer `bin` column: (bin, n_a, n_b,
    * term, psi) over the UNION of the fixed [0, nBins) grid and every
    * OBSERVED bin label — a fixed bin empty on both sides still carries
    * its nonzero smoothed term (the profile_psi contract), and a caller
    * whose labels stray outside [0, nBins) keeps those rows in both the
    * term sum and the totals instead of having them silently dropped
    * (round-7b review: a dropped out-of-range bin deflated every
    * remaining share with no warning). `nBins` is also the Laplace
    * smoothing mass; ln terms quantized at 1e-6 via the shared
    * StatsOps.psiTerm kernel. */
  def psi(df: DataFrame, bin: Column, isA: Column,
      nBins: Int = 10): DataFrame = {
    val ev = df.select(bin.as("bin"),
      when(isA, 1L).otherwise(0L).as("isa"))
    val bins = ev.groupBy("bin").agg(
      sum("isa").as("n_a"), (count(lit(1)) - sum("isa")).as("n_b"))
    val tot = bins.agg(sum("n_a").as("ta"), sum("n_b").as("tb"))
    val gridBins = tot
      .select(explode(sequence(lit(0), lit(nBins - 1))).as("bin"))
      .unionByName(bins.select(col("bin").cast("int").as("bin")))
      .distinct()
    val grid = gridBins
      .crossJoin(broadcast(tot))
      .join(bins, Seq("bin"), "left")
      .select(col("bin"), coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"), col("ta"), col("tb"))
    grid
      .withColumn("iterm", graft.operators.StatsOps.psiTerm(
        col("n_a"), col("ta"), col("n_b"), col("tb"), nBins))
      .withColumn("psi",
        sum("iterm").over(Window.partitionBy()).cast(DoubleType) / 1e6)
      .select(col("bin"), col("n_a"), col("n_b"),
        (col("iterm").cast(DoubleType) / 1e6).as("term"), col("psi"))
  }

  /** Mann–Whitney U (rank-sum) z-statistic between the `isTreatment`
    * and control rows of `df`, over an integer-quantized `value`
    * column: one row (n1, n2, u1, z); z is NULL when the variance is 0
    * (all values tied or an empty arm). Delegates to the operator core
    * the `profile_mannwhitney` oracle verifies. Compact the values
    * FIRST (e.g. floor(x·100+0.5)) — the ranking window runs over
    * distinct values, never raw rows. */
  def mannWhitney(df: DataFrame, isTreatment: Column,
      value: Column): DataFrame =
    graft.operators.StatsOps.mannWhitneyCore(df, isTreatment, value)

  /** Per-group Gini concentration over integer amounts (cents):
    * (g, n, s, gini) — gini NULL when the group total is 0. Delegates
    * to the operator core the `agg_gini` oracle verifies; decimal sums
    * are overflow-proof at any n. `id` breaks ties deterministically. */
  def gini(df: DataFrame, group: Column, cents: Column,
      id: Column): DataFrame =
    graft.operators.StatsOps.giniCore(df, group, cents, id)

  /** Kaplan–Meier survival over a (t, dead) subject frame: per distinct
    * duration, (t, n_risk, d, c, log_surv, survival) — with exact-zero
    * survival (and NULL log_surv) once a step kills every at-risk
    * subject. Delegates to the core the `agg_survival` oracle
    * verifies. */
  def kaplanMeier(subjects: DataFrame): DataFrame =
    graft.operators.StatsOps.kaplanMeierCore(subjects)

  /** Shortlist recall@k: how many ids of each query's `exact` top-k
    * survive in `approx` — (q_id, hits, recall). Both inputs are
    * (q_id, vec_id) frames; the metric that qualifies a cheap ANN index
    * before it replaces the exact path (sim_recall_eval's core). */
  def recallAtK(exact: DataFrame, approx: DataFrame, k: Int): DataFrame =
    graft.operators.VectorOps.recallJoin(exact, approx, k)

  /** The signed hashing trick over a (id, text) frame: sparse
    * (id, dim, weight) rows in a fixed `dims`-dimensional space, md5
    * dims and ±1 signs (engine-portable, no vocabulary state) —
    * text_hash_embed's core. */
  def hashEmbed(docs: DataFrame, id: Column, text: Column,
      dims: Int = 256): DataFrame =
    graft.operators.TextOps.hashEmbedCore(docs, id, text, dims)

  /** Per-group cap: keep at most `cap` rows per `group`, preferring
    * the largest `score` (ties → smallest `id`) — the C4/Dolma
    * domain-cap rule, frame-generic (pipeline_source_cap's core).
    * Appends a `rank` column, REPLACING any existing column of that
    * name on the input frame. */
  def capPerGroup(df: DataFrame, group: Column, score: Column,
      id: Column, cap: Int): DataFrame =
    graft.operators.CurationOps.capPerGroupCore(df, group, score, id, cap)

  /** One-sided CUSUM over an ordered integer series (ord, x): adds the
    * running change-point statistic via the closed form P_t − min P_j
    * (two frames, one ordering — the recurrence itself is not
    * window-expressible). Deviations are vs the series' own mean,
    * scaled ×n to stay integral. Output: (ord, x, nn, cusum_scaled)
    * with cusum_scaled in x·n units — divide by the `nn` column to
    * read in x units (win_cusum's core). */
  def cusum(series: DataFrame, ord: Column, x: Column): DataFrame =
    graft.operators.StatsOps.cusumCore(series, ord, x)

  // ---- quality ------------------------------------------------------

  /** Per-group exact decimal sum cast back to double — the
    * aggregation-order-proof money/quantity sum (Det discipline). */
  def exactSum(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast(DoubleType)

  /** Quantize a double expression into exact integer space before
    * summing (floor(x·scale + 0.5)): makes transcendental-bearing
    * aggregates reproducible under any aggregation order. */
  def quantized(c: Column, scale: Double): Column =
    floor(c * scale + 0.5).cast(LongType)
}
