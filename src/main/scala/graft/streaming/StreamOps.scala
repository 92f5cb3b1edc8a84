package graft.streaming

import graft.{Det, Q, QueryModule, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** §2.10 streaming operators over the `events` table.
  *
  * Every id here ships in two forms (SURVEY §1.2): the batch-equivalent
  * SQL-expressible form below (oracle-compared — DuckDB replays plain SQL,
  * so `readStream` plans can't be verified that way) and a genuine
  * Structured Streaming form exercised by StreamingSpec (`MemoryStream` +
  * watermarks + `processAllAvailable`). The batch forms are the exact
  * semantics the streaming forms converge to on a closed input.
  *
  * Scale notes:
  *  - tumbling/sliding windows are plain hash aggregations on
  *    (window_start, key) — partial agg before the shuffle, O(windows)
  *    reduce side. A 15-min slide over 1 h fan-outs each row 4× *before*
  *    partial agg, which is the same cost Structured Streaming pays.
  *  - sessionization and running state are one shuffle + sort per user_id
  *    (high cardinality → small skew-free partitions); the streaming
  *    equivalents keep O(users) state, not O(events).
  *  - the late-data simulation keeps the watermark *per user* so the
  *    window stays partitioned — a global arrival-order watermark would
  *    single-task at 100 TB (the real streaming engine tracks watermarks
  *    distributed, per-partition; see StreamingSpec's true-watermark test).
  */
object StreamOps extends QueryModule {
  import Det._

  /** 30-minute session gap (seconds). */
  private val SessionGapS = 1800L

  override def queries: Map[String, Q.Fn] = Map(
    // 1-hour tumbling windows per event_type. window() starts align to
    // the epoch hour — identical to date_trunc('hour', ts).
    "stream_tumbling" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
        .select(col("w.start").as("w_start"), col("event_type"),
          col("n_events"), col("sum_value"))
        .orderBy("w_start", "event_type")),

    // 1-hour window sliding every 15 min: each event lands in exactly 4
    // windows whose starts are the 15-min marks in (ts-1h, ts].
    "stream_sliding" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("w.start").as("w_start"), col("n_events"))
        .orderBy("w_start")),

    // session windows (30-min inactivity gap) per user: lag → new-session
    // flag → running sum = session ordinal; then one agg per session.
    "stream_session" -> ((s, d) => {
      val ord = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val gapS = unix_timestamp(col("ts")) -
        unix_timestamp(lag("ts", 1).over(ord))
      Tables.events(s, d)
        .withColumn("new_s",
          when(gapS.isNull || gapS > SessionGapS, 1L).otherwise(0L))
        .withColumn("session_id", sum("new_s").over(run))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          date_trunc("second", min(col("ts"))).as("s_start"),
          date_trunc("second", max(col("ts"))).as("s_end"))
        .orderBy("user_id", "session_id")
    }),

    // session VALUE attribution: the same gap-based session assignment,
    // reduced to revenue per session, then each user's top-revenue
    // session — the "which visit converted" question. All three passes
    // (session-id window, per-session agg, top-pick window) ride ONE
    // user_id hash partitioning; nothing reshuffles.
    "sessionize_revenue" -> ((s, d) => {
      val ord = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val gapS = unix_timestamp(col("ts")) -
        unix_timestamp(lag("ts", 1).over(ord))
      val top = Window.partitionBy("user_id")
        .orderBy(col("revenue").desc, col("session_id"))
      Tables.events(s, d)
        .withColumn("new_s",
          when(gapS.isNull || gapS > SessionGapS, 1L).otherwise(0L))
        .withColumn("session_id", sum("new_s").over(run))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          sum(dec2(col("value"))).cast(DoubleType).as("revenue"))
        .withColumn("rk", row_number().over(top))
        .where(col("rk") === 1)
        .select("user_id", "session_id", "n_events", "revenue")
        .orderBy("user_id")
    }),

    // dedup-within-window: batch equivalent of
    // dropDuplicatesWithinWatermark on (user_id, event_type) with a 1-hour
    // horizon — survivor is min(event_id) per (hour-bucket, key), never
    // "first seen" (SURVEY §5.3.4).
    // streaming ingest dedup (the stateful twin of dedup_exact, and the
    // per-micro-batch admission gate of a streaming pipeline_ingest):
    // admit a document iff its content fingerprint has never been seen
    // before in arrival order (doc_id = the deterministic arrival
    // proxy); later copies are rejected with the keeper's id. This
    // batch form is the closed-input semantics; the genuine streaming
    // form — transformWithState keyed by fingerprint, O(distinct) × 8 B
    // state, exactly-once admission across triggers AND a checkpointed
    // restart — runs in StreamingSpec (IngestDedupProcessor). The
    // shuffle carries (32-byte hash, doc_id), never text; at corpus
    // scale the state store is fronted by the sink_bloom fingerprint
    // filter so cold keys skip the store entirely.
    "stream_ingest_dedup" -> ((s, d) => {
      val h = sha2(col("text").cast(BinaryType), 256)
      val wOrd = Window.partitionBy("h").orderBy("doc_id")
      val wAll = Window.partitionBy("h")
      Tables.documents(s, d)
        .select(col("doc_id"), h.as("h"))
        .select(col("doc_id"),
          when(row_number().over(wOrd) === 1, 1L).otherwise(0L)
            .as("admitted"),
          min("doc_id").over(wAll).as("first_id"))
        .orderBy("doc_id")
    }),

    // streaming NEAR-dup admission gate (round 7, VERDICT r6 next-step
    // #4) — the MinHash-band twin of stream_ingest_dedup, and the
    // streaming analogue of dedup_near a production ingest needs: a
    // document is admitted iff NONE of its 4 MinHash band keys
    // (VectorOps.minhashBandKeys — dedup_near's exact family) was
    // observed from ANY earlier-arriving document; its band keys enter
    // the observed set either way. Observed-not-admitted state is the
    // deliberate semantics choice: it is conservative (a doc near-dup
    // of a REJECTED doc is also rejected — at τ≈0.7 band collisions
    // chain through rejected docs to the same content family), it
    // needs no per-band transactionality across keys, and it makes the
    // gate replayable as plain SQL (admitted ⇔ first arrival in every
    // own band bucket) — an admitted-only-state gate is inherently
    // sequential and unverifiable by a relational oracle. blocked_by
    // reports the earliest blocker across colliding buckets. Docs
    // under 3 words have no bands and pass trivially (the dedup_near
    // exclusion rule). This batch form IS the closed-input semantics
    // (arrival order = doc_id); the genuine streaming form —
    // transformWithState keyed by BAND key (NearDupBandProcessor),
    // per-batch doc-level combine, exactly-once across triggers AND a
    // checkpointed restart — runs in StreamingSpec. Scale: state is
    // O(docs × 4) × 8 B keyed by band — the shuffle carries (band,
    // doc_id), never text; the batch form is one band-keyed window +
    // one doc-keyed agg.
    "stream_ingest_neardup" -> ((s, d) => {
      val wBand = Window.partitionBy("band")
      val perBand = graft.operators.VectorOps
        .minhashBandKeys(Tables.documents(s, d))
        .select(col("doc_id"), min("doc_id").over(wBand).as("first_id"))
      val verdict = perBand.groupBy("doc_id").agg(
        max(when(col("first_id") < col("doc_id"), 1L).otherwise(0L))
          .as("collides"),
        min(when(col("first_id") < col("doc_id"), col("first_id")))
          .as("blocked_by"))
      Tables.documents(s, d).select(col("doc_id"))
        .join(verdict, Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(coalesce(col("collides"), lit(0L)) === 1L, 0L)
            .otherwise(1L).as("admitted"),
          col("blocked_by"))
        .orderBy("doc_id")
    }),

    // streaming distribution-drift monitor: per 6-hour tumbling window,
    // the PSI of that window's value histogram against the corpus
    // baseline — the live twin of profile_psi, i.e. the alert a serving
    // pipeline raises when today's traffic stops looking like the
    // training distribution. Fixed bins (no quantile fit), Laplace
    // smoothing so thin windows are well-defined, per-bin ln terms
    // integer-quantized (the PSI discipline) so the replay is exact.
    // Batch form = closed-input semantics over the same windows; the
    // genuine streaming form (watermarked windowed counts converging to
    // this) runs in StreamingSpec. Scale: window×bin counts are the only
    // state — 10 integers per window key, map-side combined; the
    // baseline is a broadcast 10-row aggregate.
    "stream_drift" -> ((s, d) => {
      val binned = Tables.events(s, d).select(col("ts"),
        greatest(least(floor(col("value") / lit(56.1)), lit(9)), lit(0))
          .cast(IntegerType).as("bin"))
      val wb = binned
        .groupBy(window(col("ts"), "6 hours").as("w"), col("bin"))
        .agg(count(lit(1)).as("n"))
        .select(col("w.start").as("w_start"), col("bin"), col("n"))
      val base = binned.groupBy("bin").agg(count(lit(1)).as("nb"))
      val baseTot = base.agg(sum("nb").as("tb"))
      // FULL fixed 0..9 grid per window (the profile_psi contract: a
      // bin empty in both the window and the baseline still carries a
      // nonzero smoothed term whenever tw ≠ tb)
      val wTot = wb.groupBy("w_start").agg(sum("n").as("tw"))
      val grid = wTot
        .select(col("w_start"), col("tw"),
          explode(sequence(lit(0), lit(9))).as("bin"))
        .join(broadcast(base), Seq("bin"), "left")
        .crossJoin(broadcast(baseTot))
        .join(wb, Seq("w_start", "bin"), "left")
      val iterm = graft.operators.StatsOps.psiTerm(
        coalesce(col("n"), lit(0L)), col("tw"),
        coalesce(col("nb"), lit(0L)), col("tb"), 10)
      grid.groupBy("w_start", "tw")
        .agg(sum(iterm).as("tsum"))
        .select(col("w_start"), col("tw").as("n_events"),
          (col("tsum").cast(DoubleType) / 1e6).as("psi"))
        .orderBy("w_start")
    }),

    "stream_dedup" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour").as("w"),
          col("user_id"), col("event_type"))
        .agg(min("event_id").as("keep_id"), count(lit(1)).as("n_dups"))
        .select(col("w.start").as("w_start"), col("user_id"),
          col("event_type"), col("keep_id"), col("n_dups"))
        .orderBy("w_start", "user_id", "event_type")),

    // stream-stream enrichment join: each click joined to the purchases
    // the same user makes within the following 10 minutes — the
    // batch-equivalent of the watermarked stream-stream interval join
    // exercised for real in StreamingSpec. The equi-key (user_id) carries
    // the shuffle; the time bound is what caps per-key join state in the
    // streaming form (the watermark's job), so per-task memory stays
    // O(events-in-window), not O(history).
    "stream_join" -> ((s, d) => {
      val clicks = Tables.events(s, d)
        .where(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("c_id"),
          col("ts").as("c_ts"))
      val purchases = Tables.events(s, d)
        .where(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("p_id"),
          col("ts").as("p_ts"))
      clicks.join(purchases, Seq("user_id"))
        .where(col("p_ts") >= col("c_ts") &&
          col("p_ts") <= col("c_ts") + expr("INTERVAL 10 MINUTE"))
        .select(col("user_id"), col("c_id"), col("p_id"),
          (unix_timestamp(col("p_ts")) - unix_timestamp(col("c_ts")))
            .as("lag_s"))
        .orderBy("c_id", "p_id")
    }),

    // per-user running counters — the state a transformWithState /
    // mapGroupsWithState handler would keep (exercised for real in
    // StreamingSpec); batch form is a prefix-window over each user.
    "stream_stateful" -> ((s, d) => {
      val run = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          count(lit(1)).over(run).as("n_so_far"),
          sum(dec2(col("value"))).over(run).cast(DoubleType)
            .as("value_so_far"))
        .orderBy("event_id")
    }),

    // per-window top-k: each hour's 3 busiest event types — the
    // trending/leaderboard shape. Batch form = tumbling counts + one
    // rank window; the streaming form runs the same count aggregate per
    // window with the rank applied per emitted window in foreachBatch
    // (rank-over-stream isn't directly supported in append mode).
    "stream_windowed_topk" -> ((s, d) => {
      val counts = Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("w.start").as("w_start"), col("event_type"),
          col("n_events"))
      val w = Window.partitionBy("w_start")
        .orderBy(col("n_events").desc, col("event_type"))
      counts.withColumn("rk", row_number().over(w).cast(LongType))
        .where(col("rk") <= 3)
        .orderBy("w_start", "rk")
    }),

    // foreachBatch upsert sink — the canonical production streaming
    // pattern: each microbatch MERGEs last-write-wins state into a keyed
    // table. Batch-equivalent form: replay everything, keep each user's
    // latest event (ts desc, event_id desc tiebreak). StreamingSpec
    // drives the REAL foreachBatch incremental merge over multiple
    // triggers and asserts it converges to exactly this frame. At scale
    // the state table is keyed by user_id, each microbatch merge is one
    // partial-deduped shuffle of the batch (not the table).
    "stream_upsert_sink" -> ((s, d) => {
      val latest = Window.partitionBy("user_id")
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(s, d)
        .withColumn("rn", row_number().over(latest))
        .where(col("rn") === 1)
        .select(col("user_id"), col("event_id").as("last_event_id"),
          col("event_type").as("last_type"),
          col("value").as("last_value"))
        .orderBy("user_id")
    }),

    // streaming read FROM the governed DSv2 table (round 9, VERDICT r8
    // #2): the table you MERGE into is ALSO a stream source — every
    // commit to graft.sources.GraftTableStore is an offset, and a
    // micro-batch delivers the rows those commits appended
    // (GraftMicroBatchStream; the append-only prefix is verified, not
    // assumed). This batch form seeds the table with the purchase
    // events across THREE separate commits and aggregates the final
    // content read back through the catalog — the closed-input
    // semantics the genuine readStream.table form (StreamingSpec:
    // per-commit micro-batches + a checkpointed restart that resumes
    // MID-version-history) converges to. Scale: the governed store is
    // the test vehicle (purchase-slice-sized); against a real lake
    // table the same readStream.table call streams snapshot diffs, and
    // the windowed agg below is the standard watermarked shape.
    // STREAMING SINK INTO THE LAKE TABLE: append-mode writeStream
    // .toTable against a PARQUET-backed governed table stages parquet
    // files TASK-SIDE per epoch and commits manifests only — the
    // driver never sees a row and never re-materializes the base, the
    // streaming-ingest shape a lake format runs at 100 TB
    // (StreamingSpec pins the genuine stream: per-epoch manifest
    // commits with prefix reuse, exactly-once across a checkpointed
    // restart, replayed epochs deleting their re-staged files). This
    // closed-input form seeds the same PARTITIONED parquet-backed
    // table through three epoch-shaped commits — each clustered by
    // the partition column exactly as the streaming writer's tasks
    // are — and reads the converged content back through the catalog.
    "stream_parquet_sink" -> ((s, d) => {
      s.conf.set("spark.sql.catalog.graft",
        classOf[graft.sources.GraftMergeCatalog].getName)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"))
        .createOrReplaceTempView("pqsink_base")
      s.sql("DROP TABLE IF EXISTS graft.pqsink_t")
      s.sql("CREATE TABLE graft.pqsink_t (event_id BIGINT, " +
        "user_id BIGINT, event_type STRING, value DOUBLE) " +
        "PARTITIONED BY (event_type) " +
        "TBLPROPERTIES ('graft.store'='parquet')")
      (0 until 3).foreach { i =>
        s.sql("INSERT INTO graft.pqsink_t SELECT event_id, user_id, " +
          s"event_type, value FROM pqsink_base WHERE event_id % 3 = $i")
      }
      s.table("graft.pqsink_t")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          dsum(col("value")).as("sum_value"))
        .orderBy("event_type")
    }),

    "stream_table_read" -> ((s, d) => {
      s.conf.set("spark.sql.catalog.graft",
        classOf[graft.sources.GraftMergeCatalog].getName)
      Tables.events(s, d).where(col("event_type") === "purchase")
        .select(col("event_id"), col("ts"), col("value"))
        .createOrReplaceTempView("graft_feed_base")
      s.sql("DROP TABLE IF EXISTS graft.stream_feed")
      s.sql("CREATE TABLE graft.stream_feed (event_id BIGINT, " +
        "ts TIMESTAMP, value DOUBLE)")
      (0 until 3).foreach { i =>
        s.sql("INSERT INTO graft.stream_feed SELECT event_id, ts, " +
          s"value FROM graft_feed_base WHERE event_id % 3 = $i")
      }
      s.table("graft.stream_feed")
        .groupBy(window(col("ts"), "1 hour").as("w"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
        .select(col("w.start").as("w_start"), col("n_events"),
          col("sum_value"))
        .orderBy("w_start")
    }),

    // late-data flagging: events.ts is monotone in event_id (FIXTURES.md),
    // so real arrival order has no late rows; simulate out-of-order
    // arrival deterministically by md5(event_id) and flag rows older than
    // the per-user high-watermark minus a 10-min allowed delay. All
    // comparisons at second granularity so ns-vs-µs precision (DuckDB
    // reads the raw ns parquet) cannot flip a boundary.
    "late_data" -> ((s, d) => {
      val arrival = Window.partitionBy("user_id")
        .orderBy(md5(col("event_id").cast(StringType)))
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.events(s, d)
        .withColumn("ts_s", date_trunc("second", col("ts")))
        .withColumn("max_prior", max(col("ts_s")).over(arrival))
        .select(col("event_id"), col("user_id"),
          coalesce(col("ts_s") <
              col("max_prior") - expr("INTERVAL 10 MINUTE"),
            lit(false)).cast(IntegerType).as("is_late"))
        .orderBy("event_id")
    }),

    // CDC-UPSERT STREAM VIA EQUALITY DELETES (the round-15 composition
    // the eq-delete commit exists for): each micro-batch folds its
    // per-user LATEST state into a merge-on-read lake table by
    // committing "DELETE WHERE user_id IN (batch keys)" — an O(|keys|)
    // log entry, ZERO files opened, no scan-for-matches — followed by
    // the batch append. Pre-round-15 this shape paid a DV compute (a
    // zone-map-prescreened file scan) per batch; now the per-batch
    // write cost is O(batch). Keys the state table has never seen are
    // no-ops by design (batch 0 seeds through the same code path).
    // The closing purge_deletes compacts the delete chain task-side —
    // the scheduled-OPTIMIZE half of the production pair. The key
    // list is the CDC writer's OWN batch key set (O(distinct users
    // per batch) driver metadata — the eq-delete API's contract, not
    // a data funnel: rows stage task-side as every append does).
    // Batches slice by event_id % 3; the final state is each user's
    // latest row within their HIGHEST batch — exactly replayable in
    // SQL, so the oracle only matches if every delete retired exactly
    // the re-keyed rows and none of the absent-key no-ops misfired.
    "stream_upsert_eqdelete" -> ((s, d) => {
      s.conf.set("spark.sql.catalog.graft",
        classOf[graft.sources.GraftMergeCatalog].getName)
      Tables.events(s, d).createOrReplaceTempView("ueq_src")
      s.sql("DROP TABLE IF EXISTS graft.ueq_state")
      s.sql("CREATE TABLE graft.ueq_state (user_id BIGINT, " +
        "last_event_id BIGINT, last_type STRING, last_value DOUBLE) " +
        "TBLPROPERTIES ('graft.store'='parquet', " +
        "'graft.row-level'='merge-on-read', 'graft.row-id'='user_id')")
      for (b <- 0 until 3) {
        val latest = Window.partitionBy("user_id")
          .orderBy(col("ts").desc, col("event_id").desc)
        s.sql("SELECT user_id, event_id, event_type, value, ts " +
            s"FROM ueq_src WHERE event_id % 3 = $b")
          .withColumn("rn", row_number().over(latest))
          .where(col("rn") === 1)
          .select(col("user_id"), col("event_id").as("last_event_id"),
            col("event_type").as("last_type"),
            col("value").as("last_value"))
          .createOrReplaceTempView("ueq_batch")
        val keys = s.table("ueq_batch").select("user_id")
          .collect().map(_.getLong(0)).toSeq
        // an empty batch (empty source slice) has no keys to retire —
        // skip the eq-delete entirely, exactly as a CDC writer would
        if (b > 0 && keys.nonEmpty)
          graft.api.GraftApi.deleteWhereKeyIn(s, "graft.ueq_state",
            "user_id", keys)
        s.sql("INSERT INTO graft.ueq_state SELECT * FROM ueq_batch")
      }
      graft.api.GraftApi.purgeDeletes(s, "graft.ueq_state")
      s.table("graft.ueq_state").groupBy("last_type")
        .agg(count(lit(1)).as("n_users"),
          sum("last_event_id").cast(LongType).as("id_sum"),
          (sum(Det.dec2(col("last_value"))) * 100).cast(LongType)
            .as("cents"))
        .orderBy("last_type")
    })
  )

  override def oracles: Map[String, String] = Map(
    // first-occurrence-wins over text equivalence classes (grouping by
    // raw text = grouping by its sha2, minus negligible collisions)
    "stream_ingest_dedup" ->
      """SELECT doc_id,
        |  CAST(CASE WHEN ROW_NUMBER() OVER (PARTITION BY text
        |      ORDER BY doc_id) = 1 THEN 1 ELSE 0 END AS BIGINT)
        |    AS admitted,
        |  MIN(doc_id) OVER (PARTITION BY text) AS first_id
        |FROM documents ORDER BY doc_id""".stripMargin,
    // band-bucket replay: admitted ⇔ first arrival (min doc_id) in
    // every own band bucket; bands via the shared
    // VectorOps.duckMinhashBands chain, so the replay is bit-identical
    // to the kernel's signatures
    "stream_ingest_neardup" ->
      s"""WITH ${graft.operators.VectorOps.duckMinhashBands},
        |fb AS (SELECT bk, MIN(doc_id) AS first_id FROM bnd GROUP BY bk),
        |pv AS (SELECT b.doc_id,
        |    MAX(CASE WHEN f.first_id < b.doc_id THEN 1 ELSE 0 END)
        |      AS collides,
        |    MIN(CASE WHEN f.first_id < b.doc_id THEN f.first_id END)
        |      AS blocked_by
        |  FROM bnd b JOIN fb f ON b.bk = f.bk GROUP BY b.doc_id)
        |SELECT d.doc_id,
        |  CAST(CASE WHEN COALESCE(collides, 0) = 1 THEN 0 ELSE 1 END
        |    AS BIGINT) AS admitted,
        |  blocked_by
        |FROM documents d LEFT JOIN pv ON d.doc_id = pv.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    "stream_tumbling" ->
      """SELECT date_trunc('hour', ts) AS w_start, event_type,
        |  COUNT(1) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin,
    "stream_sliding" ->
      """SELECT make_timestamp(((epoch_ms(ts) // 900000) - k) * 900000000) AS w_start,
        |  COUNT(1) AS n_events
        |FROM events CROSS JOIN (VALUES (0), (1), (2), (3)) AS g(k)
        |GROUP BY 1 ORDER BY w_start""".stripMargin,
    "sessionize_revenue" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, ts, value,
        |    CASE WHEN LAG(ts) OVER w IS NULL
        |           OR date_diff('second', LAG(ts) OVER w, ts) > 1800
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id, value,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM flagged),
        |agged AS (
        |  SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |    COUNT(1) AS n_events,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |  FROM sess GROUP BY user_id, session_id),
        |ranked AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
        |    ORDER BY revenue DESC, session_id) AS rk
        |  FROM agged)
        |SELECT user_id, session_id, n_events, revenue FROM ranked
        |WHERE rk = 1 ORDER BY user_id""".stripMargin,
    "stream_session" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, ts, value,
        |    CASE WHEN LAG(ts) OVER w IS NULL
        |           OR date_diff('second', LAG(ts) OVER w, ts) > 1800
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id, ts,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM flagged)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  COUNT(1) AS n_events,
        |  date_trunc('second', MIN(ts)) AS s_start,
        |  date_trunc('second', MAX(ts)) AS s_end
        |FROM sess GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,
    "stream_drift" ->
      """WITH b AS (SELECT
        |    make_timestamp((epoch_ms(ts) // 21600000) * 21600000000)
        |      AS w_start,
        |    CAST(greatest(least(floor(value / 56.1), 9), 0) AS INTEGER)
        |      AS bin
        |  FROM events),
        |wb AS (SELECT w_start, bin, COUNT(*) AS n FROM b GROUP BY 1, 2),
        |base AS (SELECT bin, COUNT(*) AS nb FROM b GROUP BY 1),
        |bt AS (SELECT CAST(SUM(nb) AS BIGINT) AS tb FROM base),
        |wt AS (SELECT w_start, CAST(SUM(n) AS BIGINT) AS tw FROM wb
        |  GROUP BY 1),
        |g AS (SELECT wt.w_start, wt.tw, gb.b AS bin,
        |    COALESCE(base.nb, 0) AS nb, bt.tb,
        |    COALESCE(wb.n, 0) AS n
        |  FROM wt CROSS JOIN unnest(range(0, 10)) AS gb(b) CROSS JOIN bt
        |  LEFT JOIN base ON base.bin = gb.b
        |  LEFT JOIN wb ON wb.w_start = wt.w_start AND wb.bin = gb.b),
        |t AS (SELECT w_start, tw,
        |    CAST(floor((CAST(n + 1 AS DOUBLE) / CAST(tw + 10 AS DOUBLE)
        |        - CAST(nb + 1 AS DOUBLE) / CAST(tb + 10 AS DOUBLE))
        |      * ln((CAST(n + 1 AS DOUBLE) / CAST(tw + 10 AS DOUBLE))
        |          / (CAST(nb + 1 AS DOUBLE) / CAST(tb + 10 AS DOUBLE)))
        |      * 1e6 + 0.5) AS BIGINT) AS iterm
        |  FROM g)
        |SELECT w_start, tw AS n_events,
        |  CAST(SUM(iterm) AS DOUBLE) / 1e6 AS psi
        |FROM t GROUP BY 1, 2 ORDER BY w_start""".stripMargin,
    // three epoch-shaped commits are content-neutral: the sink
    // converges to the full events slice per type
    "stream_parquet_sink" ->
      """SELECT event_type, COUNT(1) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    // seeding across three commits is content-neutral: the final table
    // holds exactly the purchase slice, whatever the commit split
    "stream_table_read" ->
      """SELECT date_trunc('hour', ts) AS w_start, COUNT(1) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY w_start""".stripMargin,
    "stream_dedup" ->
      """SELECT date_trunc('hour', ts) AS w_start, user_id, event_type,
        |  MIN(event_id) AS keep_id, COUNT(1) AS n_dups
        |FROM events GROUP BY 1, 2, 3
        |ORDER BY w_start, user_id, event_type""".stripMargin,
    "stream_join" ->
      """SELECT c.user_id, c.event_id AS c_id, p.event_id AS p_id,
        |  date_diff('second', c.ts, p.ts) AS lag_s
        |FROM events c JOIN events p
        |  ON c.user_id = p.user_id
        | AND c.event_type = 'click' AND p.event_type = 'purchase'
        | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 10 MINUTE
        |ORDER BY c_id, p_id""".stripMargin,
    "stream_stateful" ->
      """SELECT event_id, user_id,
        |  COUNT(1) OVER w AS n_so_far,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS value_so_far
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "stream_windowed_topk" ->
      """WITH c AS (SELECT date_trunc('hour', ts) AS w_start, event_type,
        |    COUNT(1) AS n_events
        |  FROM events GROUP BY 1, 2)
        |SELECT w_start, event_type, n_events,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY w_start
        |    ORDER BY n_events DESC, event_type) AS BIGINT) AS rk
        |FROM c QUALIFY rk <= 3 ORDER BY w_start, rk""".stripMargin,
    "stream_upsert_sink" ->
      """SELECT user_id, event_id AS last_event_id,
        |  event_type AS last_type, value AS last_value
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
        |        ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events) t
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "late_data" ->
      """SELECT event_id, user_id,
        |  CAST(COALESCE(ts_s < max_prior - INTERVAL 10 MINUTE, FALSE) AS INT) AS is_late
        |FROM (SELECT event_id, user_id, date_trunc('second', ts) AS ts_s,
        |        MAX(date_trunc('second', ts)) OVER (PARTITION BY user_id
        |          ORDER BY md5(CAST(event_id AS VARCHAR))
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS max_prior
        |      FROM events) t
        |ORDER BY event_id""".stripMargin,
    "stream_upsert_eqdelete" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, value, ts,
        |    event_id % 3 AS b
        |  FROM events),
        |r AS (
        |  SELECT user_id, event_id, event_type, value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY b DESC, ts DESC, event_id DESC) AS rk
        |  FROM e),
        |f AS (SELECT * FROM r WHERE rk = 1)
        |SELECT event_type AS last_type, COUNT(*) AS n_users,
        |  CAST(SUM(event_id) AS BIGINT) AS id_sum,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
        |    AS cents
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
