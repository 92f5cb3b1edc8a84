package graft.operators

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** §2.13 (round 4) data-curation + storage-layout operators: the pieces a
  * training-data pipeline needs AROUND the core dedup/similarity loop —
  * mixture rebalancing, embedding quantization for storage, and Z-order
  * clustering for multi-dimensional data skipping.
  *
  * Scale notes:
  *  - pipeline_mixture derives per-group sampling rates from a tiny
  *    map-side-combined count aggregate, broadcasts the 5-row rate table,
  *    and keeps rows by a pure hash of the key — reproducible across
  *    engines, retries and repartitionings, no RNG state to coordinate
  *    across 1000 executors.
  *  - vec_quantize is a single narrow pass (no shuffle): int8 symmetric
  *    quantization cuts embedding storage 4× — at 100 TB of vectors this
  *    is the difference between re-reading 100 TB and 25 TB per ANN
  *    build. floor(x*s + 0.5) is used instead of round() because its
  *    double semantics are bit-identical on every engine.
  *  - fn_zorder / sink_zorder: bit-interleaved Morton codes give files
  *    that are simultaneously narrow in BOTH dimensions, so a 2-D box
  *    predicate (user × time) skips most files at the footer level —
  *    a 1-D sort clusters one dimension and leaves the other unsorted.
  *    The interleave is a 32-term integer expression (whole-stage
  *    codegen'd, no UDF); the identical arithmetic is emitted for the
  *    DuckDB oracle from the same loop, so the two engines cannot drift.
  */
object CurationOps extends QueryModule {

  /** Frame-parametric per-group cap core (bound by pipeline_source_cap,
    * re-exposed by GraftApi.capPerGroup): keep ≤ cap rows per group,
    * largest `score` first (ties → smallest `id`). Appends `rank` —
    * REPLACING any pre-existing column of that name. */
  private[graft] def capPerGroupCore(df: DataFrame, group: Column,
      score: Column, id: Column, cap: Int): DataFrame = {
    val w = Window.partitionBy(group).orderBy(score.desc, id)
    df.withColumn("rank", row_number().over(w).cast(LongType))
      .where(col("rank") <= cap)
  }

  /** 16-bit × 16-bit Morton interleave: bit i of `a` lands at position
    * 2i, bit i of `b` at 2i+1. Plain integer arithmetic — stays inside
    * whole-stage codegen. */
  private def morton16(a: Column, b: Column): Column =
    (0 until 16).map { i =>
      shiftright(a, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(b, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)

  /** The same interleave as DuckDB SQL, generated from the same loop. */
  private def morton16Duck(a: String, b: String): String =
    (0 until 16).map { i =>
      s"((($a >> $i) & 1) * ${1L << (2 * i)} + " +
        s"(($b >> $i) & 1) * ${1L << (2 * i + 1)})"
    }.mkString("\n    + ")

  /** First two md5 hex digits of a row key as an integer 0..255 — the
    * raw byte behind hashFrac, used directly where the admission test
    * can stay in exact integer arithmetic (sample_temperature). */
  private[operators] def hashByte(idCol: Column): Column =
    conv(substring(md5(idCol.cast("string")), 1, 2), 16, 10)
      .cast(IntegerType)

  /** Deterministic uniform-ish value in [0, 1) from a row key: first two
    * md5 hex digits over 256. Shared by pipeline_mixture and the
    * curation funnel so both stages sample identically. */
  private[operators] def hashFrac(idCol: Column): Column =
    hashByte(idCol).cast(DoubleType) / 256.0

  /** The frame-parametric core behind `sample_temperature` (and
    * GraftApi.temperatureSample): α = 0.5 temperature sampling over any
    * frame with a group column and an id column — budget = half the
    * input, per-group rate ∝ √n/n, admission decided in exact integer
    * space (see the query's scaladoc for the full argument). Returns
    * the admitted rows plus the group's `rate` (which OVERWRITES any
    * existing `rate` column — the one reserved output name). Helper
    * columns are `_ts_`-prefixed so an input frame with ordinary names
    * like `n` or `b` joins cleanly. */
  private[graft] def temperatureSample(df: org.apache.spark.sql.DataFrame,
      groupCol: String, idCol: String): org.apache.spark.sql.DataFrame = {
    val counts = df.groupBy(groupCol).agg(count(lit(1)).as("_ts_n"))
    val wq = counts.select(col(groupCol), col("_ts_n"),
      floor(sqrt(col("_ts_n").cast(DoubleType)) * 1e6 + 0.5)
        .cast(LongType).as("_ts_wq"))
    val tot = wq.agg(sum("_ts_wq").as("_ts_swq"),
      sum("_ts_n").as("_ts_tot"))
    val rates = wq.crossJoin(broadcast(tot))
      .select(col(groupCol), col("_ts_n"), col("_ts_wq"),
        col("_ts_swq"), expr("_ts_tot div 2").as("_ts_b"))
    df.join(broadcast(rates), groupCol)
      .where(hashByte(col(idCol)).cast(LongType) * col("_ts_swq") *
        col("_ts_n") < lit(256L) * col("_ts_b") * col("_ts_wq"))
      .withColumn("rate",
        (col("_ts_b") * col("_ts_wq")).cast(DoubleType) /
          (col("_ts_swq") * col("_ts_n")).cast(DoubleType))
      .drop("_ts_n", "_ts_wq", "_ts_swq", "_ts_b")
  }

  /** DuckDB mirror of hashByte (integer 0..255, no division). */
  private[operators] def duckHashByte(idExpr: String): String =
    s"""((instr('0123456789abcdef',
       |          substr(md5(CAST($idExpr AS VARCHAR)), 1, 1)) - 1) * 16
       |     + (instr('0123456789abcdef',
       |          substr(md5(CAST($idExpr AS VARCHAR)), 2, 1)) - 1))""".stripMargin

  /** DuckDB mirror of hashFrac. */
  private[operators] def duckHashFrac(idExpr: String): String =
    s"${duckHashByte(idExpr)} / 256.0"

  /** Array-shaped int8 quantization (vec_id, q_scale, q array<int>) —
    * the form a storage pipeline writes. The `vec_quantize` query entry
    * posexplodes this for the scalar-row oracle compare; TextVectorSpec
    * asserts the reconstruction-error bound on this array form. */
  private[graft] def quantized(s: SparkSession, d: String) = {
    val mxRaw = array_max(transform(col("embedding"),
      x => abs(x.cast(DoubleType))))
    Tables.embeddings(s, d)
      .withColumn("mx", when(mxRaw === 0.0, 1.0).otherwise(mxRaw))
      .select(col("vec_id"), (lit(127.0) / col("mx")).as("q_scale"),
        transform(col("embedding"), x =>
          floor(x.cast(DoubleType) * (lit(127.0) / col("mx")) + 0.5)
            .cast(IntegerType)).as("q"))
  }

  private def hourBucket: Column = expr("unix_timestamp(ts) div 3600")
  private val duckHour = "((epoch_ms(ts) // 1000) // 3600)"

  /** events + a `zval` column: both dimensions are first min/max-scaled
    * to the FULL 16-bit range before interleaving. Without this the dim
    * with more varying bits owns every high z-bit and the curve
    * degenerates to a 1-D sort (observed: raw user ids span 8 bits vs 10
    * for hour buckets — files came out time-sorted). The bounds come
    * from one map-side-combined min/max agg broadcast back (at 100 TB:
    * table-stats metadata instead of a scan — same two numbers). */
  private[operators] def zFrame(s: SparkSession, d: String) = {
    val ev = Tables.events(s, d).withColumn("hb", hourBucket)
    val bounds = ev.agg(min("user_id").as("ulo"), max("user_id").as("uhi"),
      min("hb").as("hlo"), max("hb").as("hhi"))
    ev.crossJoin(broadcast(bounds))
      .withColumn("zval", morton16(
        expr("((user_id - ulo) * 65535) div greatest(uhi - ulo, 1)"),
        expr("((hb - hlo) * 65535) div greatest(hhi - hlo, 1)")))
      .drop("hb", "ulo", "uhi", "hlo", "hhi")
  }

  /** DuckDB mirror of zFrame's normalize-then-interleave. */
  private def duckZ: String =
    s"""WITH bnd AS (SELECT min(user_id) AS ulo, max(user_id) AS uhi,
      |    min($duckHour) AS hlo, max($duckHour) AS hhi FROM events),
      |zin AS (SELECT event_id,
      |    ((user_id - ulo) * 65535) // greatest(uhi - ulo, 1) AS za,
      |    (($duckHour - hlo) * 65535) // greatest(hhi - hlo, 1) AS zb
      |  FROM events, bnd)
      |SELECT event_id, CAST(
      |    ${morton16Duck("za", "zb")}
      |  AS BIGINT) AS zval
      |FROM zin""".stripMargin

  // 2-D query box for the sink round-trip: 128 users × 5 days, in
  // data-independent literals (epoch hour 473400 = 2024-01-03 00:00 UTC)
  private val (userLo, userHi) = (64L, 191L)
  private val (hourLo, hourHi) = (473400L, 473519L)

  /** pipeline_pack training-sequence capacity (tokens per packed bin). */
  private val PackCap = 2048L

  override def queries: Map[String, Q.Fn] = Map(
    // count-driven mixture rebalance: downsample every language to the
    // rarest language's share (uniform target mixture). The keep rule is
    // a pure md5 hash of the key against a data-derived rate, so the
    // sample is deterministic; the rate table is a broadcast of 5 rows.
    // sample_stratified is the fixed-rate cousin; this one computes the
    // rates FROM the data, which is what a mixture target actually needs.
    // dataset card: the per-language (plus ALL, via rollup) summary a
    // training pipeline publishes with every corpus snapshot — doc/char/
    // token volumes and the exact-duplicate footprint. The dup count
    // rides a hash-keyed window (sha2, never raw text — dedup_exact's
    // shuffle rule); one scan, one rollup.
    "pipeline_dataset_card" -> ((s, d) => {
      val perText = Window.partitionBy(sha2(col("text"), 256))
      val dd = Tables.documents(s, d)
        .select(col("lang"), col("n_chars"),
          size(split(col("text"), " ")).cast(LongType).as("toks"),
          count(lit(1)).over(perText).as("occ"))
      dd.rollup("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").as("total_chars"),
          sum("toks").as("total_tokens"),
          expr("count_if(occ > 1)").as("n_dup_docs"))
        .select(coalesce(col("lang"), lit("ALL")).as("lang"),
          col("n_docs"), col("total_chars"), col("total_tokens"),
          col("n_dup_docs"))
        .orderBy("lang")
    }),

    // training-export sharding manifest: every doc deterministically
    // assigned to one of 16 shards by pure key hash (reproducible across
    // engines/retries/layouts — the property that lets a 100 TB export
    // resume per-shard), manifest = per-shard doc count + char volume +
    // id range. One narrow pass + one O(shards) agg.
    "pipeline_shards" -> ((s, d) => {
      val shard = (conv(substring(md5(col("doc_id").cast("string")), 1, 2),
        16, 10).cast("int") % 16).cast(LongType)
      Tables.documents(s, d)
        .select(col("doc_id"), col("n_chars"), shard.as("shard"))
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"),
          min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
        .orderBy("shard")
    }),

    // sequence-packing manifest (round 5): GPT-style pretraining packs
    // the token stream by concatenating docs in a fixed order and cutting
    // every PackCap tokens, documents straddling cut points. The manifest
    // records where each doc lands: shard (deterministic key hash — the
    // parallelism unit), bin (training sequence index), offset within the
    // bin. One running-sum window per shard partition; at 100 TB shards
    // number in the thousands, so the sequential-prefix arithmetic is
    // per-shard-parallel and each task's window state is O(1). Every
    // number is exact integer arithmetic — reproducible across engines,
    // retries and layouts, which is what makes a packed export resumable.
    "pipeline_pack" -> ((s, d) => {
      val ord = Window.partitionBy("shard").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.documents(s, d)
        .select(col("doc_id"), (col("doc_id") % 8).as("shard"),
          size(split(col("text"), " ")).cast(LongType).as("toks"))
        .withColumn("cum0", sum("toks").over(ord) - col("toks"))
        .select(col("doc_id"), col("shard"), col("toks"),
          expr(s"cum0 div $PackCap").as("bin"),
          (col("cum0") % lit(PackCap)).as("bin_offset"))
        .orderBy("doc_id")
    }),

    // pipeline_pack with the bins budgeted in SUBWORD tokens (round 7):
    // identical concat-and-cut manifest arithmetic, but `toks` is the
    // doc's WordPiece piece count (TextOps.subwordPerWord — the unit a
    // real pretraining pack run budgets; whitespace counts under-fill
    // bins by the subword fan-out, here ~1.3×). Wordless docs pack as
    // 0-token entries. Scale adds one doc_id-keyed count agg (ints
    // only) before the same per-shard-parallel running-sum window;
    // exact integer arithmetic end-to-end, so the manifest stays
    // resumable and engine-reproducible.
    "pipeline_pack_subword" -> ((s, d) => {
      val ord = Window.partitionBy("shard").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val toks = TextOps.subwordPerWord(Tables.documents(s, d))
        .groupBy("doc_id")
        .agg(sum(size(col("toks")).cast(LongType)).as("stoks"))
      Tables.documents(s, d).select(col("doc_id"))
        .join(toks, Seq("doc_id"), "left")
        .select(col("doc_id"), (col("doc_id") % 8).as("shard"),
          coalesce(col("stoks"), lit(0L)).as("toks"))
        .withColumn("cum0", sum("toks").over(ord) - col("toks"))
        .select(col("doc_id"), col("shard"), col("toks"),
          expr(s"cum0 div $PackCap").as("bin"),
          (col("cum0") % lit(PackCap)).as("bin_offset"))
        .orderBy("doc_id")
    }),

    // quality-proportional epoch repetition: upweight docs by emitting
    // floor(w) copies plus one more with probability frac(w), where
    // w = min(n_chars/400, 4) — the stochastic-rounding repeat schedule
    // behind "repeat high-quality data k×" curation (short docs with
    // w < 1 drop unless their coin lands). Every number is engine-exact:
    // w is one IEEE-correctly-rounded division + min, the coin u is pure
    // md5 integer arithmetic on the row key, and copies are integers —
    // no RNG, no transcendentals, so the manifest is reproducible across
    // engines, retries and layouts. Scale shape: one narrow scan, the
    // explode is per-row (×≤4 fan-out) with no shuffle before the output
    // ordering; the repeat decision never needs global state.
    "pipeline_upweight" -> ((s, d) => {
      val w = least(col("n_chars").cast(DoubleType) / lit(400.0), lit(4.0))
      val u = graft.Det.md5Uniform(col("doc_id"))
      val repeats = (floor(w) +
        when(u < w - floor(w), lit(1.0)).otherwise(lit(0.0)))
        .cast(LongType)
      Tables.documents(s, d)
        .select(col("doc_id"), col("n_chars"), repeats.as("repeats"))
        .where(col("repeats") >= 1)
        .select(col("doc_id"), col("n_chars"), col("repeats"),
          explode(sequence(lit(1L), col("repeats"))).as("copy_idx"))
        .orderBy("doc_id", "copy_idx")
    }),

    "pipeline_mixture" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val counts = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      val rates = counts
        .crossJoin(broadcast(counts.agg(min("n").as("mn"))))
        .select(col("lang"), (col("mn").cast(DoubleType) / col("n"))
          .as("rate"))
      docs.join(broadcast(rates), "lang")
        .where(hashFrac(col("doc_id")) < col("rate"))
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy("doc_id")
    }),

    // deterministic negative sampling — the contrastive-training staple
    // (word2vec/recsys): for every user, up to 2 event types they have
    // NEVER triggered, picked by a pure hash order (md5 of user:type —
    // reproducible across engines/retries/relayouts, the
    // pipeline_interleave discipline; an RNG-based pick cannot be
    // coordinated across 1000 executors or replayed by an oracle).
    // Scale: users × |universe| candidates via a broadcast ≤|types|-row
    // universe, positives removed by an anti-join keyed on the user —
    // never a row-scale shuffle beyond the distinct.
    "sample_negatives" -> ((s, d) => {
      // "item" = event type × value quintile (25 compound items — a
      // plain 5-type universe is saturated by every active user,
      // leaving nothing to sample)
      val item = concat_ws(":", col("event_type"),
        least(floor(col("value") / lit(112.1)), lit(4)).cast(IntegerType))
      val pos = Tables.events(s, d)
        .select(col("user_id"), item.as("item")).distinct()
      val universe = pos.select("item").distinct()
      val cand = pos.select("user_id").distinct()
        .crossJoin(broadcast(universe))
        .join(pos, Seq("user_id", "item"), "left_anti")
      val w = Window.partitionBy("user_id").orderBy(
        md5(concat_ws(":", col("user_id"), col("item"))), col("item"))
      cand.withColumn("rank", row_number().over(w).cast(LongType))
        .where(col("rank") <= 2)
        .select(col("user_id"), col("rank"),
          col("item").as("negative_item"))
        .orderBy("user_id", "rank")
    }),

    // deterministic training-order shuffle: within each source, docs
    // are ordered by a pure hash (md5 of doc_id — reproducible across
    // engines, retries and relayouts, no RNG state across 1000
    // executors); sources are then STRIPED round-robin into one global
    // position sequence, so a sequential trainer sees all sources
    // interleaved instead of source-sorted — the data-ordering step
    // every epoch pipeline needs (a source-clustered order biases early
    // training). pos = (rank−1)·n_sources + source_index is collision-
    // free by construction. Scale: one source-partitioned window + a
    // broadcast ≤|sources|-row index — the output order is carried by
    // the pos COLUMN, no global sort materializes it.
    "pipeline_interleave" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"))
      val srcs = docs.select("source").distinct()
      val srcIdx = srcs
        .withColumn("src_idx",
          row_number().over(Window.orderBy("source")).cast(LongType) - 1)
        .withColumn("n_src",
          count(lit(1)).over(Window.partitionBy()).cast(LongType))
      val wSrc = Window.partitionBy("source")
        .orderBy(md5(col("doc_id").cast(StringType)), col("doc_id"))
      docs.join(broadcast(srcIdx), "source")
        .withColumn("rk", row_number().over(wSrc).cast(LongType) - 1)
        .select(
          (col("rk") * col("n_src") + col("src_idx")).as("pos"),
          col("doc_id"), col("source"))
        .orderBy("pos")
    }),

    // per-source document cap — the domain-cap rule every web-scale
    // recipe applies (C4 caps per-URL, Dolma caps per-domain, RefinedWeb
    // per-registrar): no single source may contribute more than K docs,
    // and when a source exceeds K, keep its LONGEST documents (chars as
    // the cheap quality proxy; ties → doc_id). One window partitioned by
    // source — at 100 TB this is a per-domain shuffle whose partitions
    // are bounded by the cap's rank cutoff, with AQE skew-split handling
    // the megadomains; no global ordering anywhere.
    "pipeline_source_cap" -> ((s, d) =>
      capPerGroupCore(
          Tables.documents(s, d)
            .select(col("doc_id"), col("source"), col("n_chars")),
          col("source"), col("n_chars"), col("doc_id"), 20)
        .select("source", "rank", "doc_id", "n_chars")
        .orderBy("source", "rank")),

    // temperature-scaled mixture sampling (the multilingual-LM data
    // recipe, e.g. XLM-R / mT5: domain share ∝ n^α with α = 0.5) —
    // between pipeline_mixture's full rebalance (α = 0) and natural
    // sampling (α = 1): heads are damped, tails are boosted but never
    // oversampled past their size. Budget = half the corpus; per-lang
    // rate = B·w_l / (Σw·n_l) with w_l = √n_l. The admission test runs
    // ENTIRELY in exact integer space: w is quantized to wq =
    // ⌊√n·10⁶+½⌋ once (one IEEE-exact sqrt of an integer-valued
    // double), and "hashFrac < rate" cross-multiplies to
    // byte·Σwq·n < 256·B·wq — no float compare anywhere, so the
    // boundary can never flip between engines. (Long headroom: the
    // product tops out ~2⁶² at n ≈ 10⁹/lang; beyond that drop the
    // quantum to 10³ — documented, not hit at any test SF.) The rate
    // column is one exact-integer division, reported for observability.
    // 100 TB: counts/weights are a ≤|langs|-row broadcast; admission is
    // a narrow scan predicate — no shuffle beyond the count.
    "sample_temperature" -> ((s, d) =>
      temperatureSample(Tables.documents(s, d)
          .select(col("doc_id"), col("lang"), col("source")),
          "lang", "doc_id")
        .select(col("doc_id"), col("lang"), col("source"), col("rate"))
        .orderBy("doc_id")),

    // int8 symmetric quantization per vector: scale = 127 / max|x|,
    // q_i = floor(x_i * scale + 0.5) ∈ [-127, 127]. One narrow pass —
    // reconstruction error ≤ 0.5/scale is asserted in TextVectorSpec.
    // Output is posexploded to scalar rows (vec_id, dim, q_val, q_scale):
    // the driver's pandas compare cannot sort/hash an array column, and
    // the long shape hashes every component exactly (vec_centroid's
    // proven pattern). The array form stays available via quantized().
    "vec_quantize" -> ((s, d) =>
      quantized(s, d)
        .select(col("vec_id"), posexplode(col("q")).as(Seq("dim", "q_val")),
          col("q_scale"))
        .select(col("vec_id"), col("dim").cast(LongType).as("dim"),
          col("q_val"), col("q_scale"))
        .orderBy("vec_id", "dim")),

    // the Morton code itself as a queryable id — oracle-checked against
    // the identical generated arithmetic in DuckDB
    "fn_zorder" -> ((s, d) =>
      zFrame(s, d)
        .select(col("event_id"), col("zval"))
        .orderBy("event_id")),

    // Z-order clustered sink: range-partition + sort by the Morton code,
    // write 16 files, then answer a 2-D box query from the re-read. Each
    // file covers a contiguous z-interval ⇒ narrow in user AND time at
    // once (asserted file-by-file in OperatorSpec); parquet footer
    // min/max then skips most files for box predicates — the layout a
    // 100 TB event store wants when queries slice both dimensions.
    "sink_zorder" -> ((s, d) => {
      val dir = Fixtures.sinkDir(s, d, "events", "ev_zorder")
      zFrame(s, d)
        .repartitionByRange(16, col("zval"))
        .sortWithinPartitions("zval")
        .write.mode(SaveMode.Overwrite).parquet(dir)
      s.read.parquet(dir)
        .where(col("user_id").between(userLo, userHi) &&
          hourBucket.between(hourLo, hourHi))
        .agg(count(lit(1)).as("n_rows"),
          min("event_id").as("min_id"), max("event_id").as("max_id"),
          sum("event_id").as("sum_id"))
    })
  )

  override def oracles: Map[String, String] = Map(
    "pipeline_dataset_card" ->
      """WITH d AS (SELECT lang, n_chars,
        |    len(string_split(text, ' ')) AS toks,
        |    COUNT(*) OVER (PARTITION BY md5(text)) AS occ
        |  FROM documents)
        |SELECT COALESCE(lang, 'ALL') AS lang, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  CAST(SUM(toks) AS BIGINT) AS total_tokens,
        |  COUNT(*) FILTER (WHERE occ > 1) AS n_dup_docs
        |FROM d GROUP BY ROLLUP(lang) ORDER BY lang""".stripMargin,
    "pipeline_shards" ->
      """WITH b AS (SELECT doc_id, n_chars,
        |  ((instr('0123456789abcdef',
        |          substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
        |   + instr('0123456789abcdef',
        |           substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) % 16
        |    AS shard
        |FROM documents)
        |SELECT CAST(shard AS BIGINT) AS shard, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
        |FROM b GROUP BY shard ORDER BY shard""".stripMargin,
    "pipeline_pack" ->
      s"""WITH t AS (SELECT doc_id, doc_id % 8 AS shard,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
        |  FROM documents),
        |c AS (SELECT doc_id, shard, toks,
        |    CAST(SUM(toks) OVER (PARTITION BY shard ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      - toks AS cum0
        |  FROM t)
        |SELECT doc_id, shard, toks,
        |  cum0 // $PackCap AS bin, cum0 % $PackCap AS bin_offset
        |FROM c ORDER BY doc_id""".stripMargin,
    // the pack manifest re-derived over the recursive WordPiece replay
    // (TextOps.duckSubwordDone) — piece counts, then the identical
    // running-sum window
    "pipeline_pack_subword" ->
      s"""WITH RECURSIVE ${TextOps.duckSubwordDone},
        |pc AS (SELECT doc_id, CAST(SUM(len(pieces)) AS BIGINT) AS toks
        |  FROM done GROUP BY doc_id),
        |t AS (SELECT d.doc_id, d.doc_id % 8 AS shard,
        |    COALESCE(pc.toks, 0) AS toks
        |  FROM documents d LEFT JOIN pc ON d.doc_id = pc.doc_id),
        |c AS (SELECT doc_id, shard, toks,
        |    CAST(SUM(toks) OVER (PARTITION BY shard ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      - toks AS cum0
        |  FROM t)
        |SELECT doc_id, shard, toks,
        |  cum0 // $PackCap AS bin, cum0 % $PackCap AS bin_offset
        |FROM c ORDER BY doc_id""".stripMargin,
    "pipeline_upweight" ->
      """WITH t AS (SELECT doc_id, n_chars,
        |    least(CAST(n_chars AS DOUBLE) / 400.0, 4.0) AS w,
        |    (CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
        |       AS UBIGINT) + 0.5) / 4294967296.0 AS u
        |  FROM documents),
        |r AS (SELECT doc_id, n_chars,
        |    CAST(floor(w) + CASE WHEN u < w - floor(w) THEN 1 ELSE 0 END
        |      AS BIGINT) AS repeats
        |  FROM t)
        |SELECT doc_id, n_chars, repeats,
        |  unnest(generate_series(1, repeats)) AS copy_idx
        |FROM r WHERE repeats >= 1 ORDER BY doc_id, copy_idx""".stripMargin,
    "pipeline_mixture" ->
      s"""WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
        |m AS (SELECT min(n) AS mn FROM c),
        |r AS (SELECT lang, CAST(mn AS DOUBLE) / n AS rate FROM c, m)
        |SELECT d.doc_id, d.lang, d.source
        |FROM documents d JOIN r ON d.lang = r.lang
        |WHERE ${duckHashFrac("d.doc_id")}
        |  < r.rate
        |ORDER BY d.doc_id""".stripMargin,
    "sample_negatives" ->
      """WITH pos AS (SELECT DISTINCT user_id,
        |    event_type || ':' || CAST(CAST(least(floor(value / 112.1), 4)
        |      AS INTEGER) AS VARCHAR) AS item
        |  FROM events),
        |uni AS (SELECT DISTINCT item FROM pos),
        |cand AS (SELECT u.user_id, uni.item
        |  FROM (SELECT DISTINCT user_id FROM pos) u CROSS JOIN uni
        |  WHERE NOT EXISTS (SELECT 1 FROM pos p
        |    WHERE p.user_id = u.user_id AND p.item = uni.item)),
        |rk AS (SELECT user_id, item,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY
        |      md5(CAST(user_id AS VARCHAR) || ':' || item),
        |      item) AS BIGINT) AS rank
        |  FROM cand)
        |SELECT user_id, rank, item AS negative_item
        |FROM rk WHERE rank <= 2 ORDER BY user_id, rank""".stripMargin,
    "pipeline_interleave" ->
      """WITH srcs AS (SELECT source,
        |    CAST(ROW_NUMBER() OVER (ORDER BY source) AS BIGINT) - 1
        |      AS src_idx,
        |    CAST(COUNT(*) OVER () AS BIGINT) AS n_src
        |  FROM (SELECT DISTINCT source FROM documents)),
        |r AS (SELECT d.doc_id, d.source, s.src_idx, s.n_src,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY d.source
        |      ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id)
        |      AS BIGINT) - 1 AS rk
        |  FROM documents d JOIN srcs s ON s.source = d.source)
        |SELECT rk * n_src + src_idx AS pos, doc_id, source
        |FROM r ORDER BY pos""".stripMargin,
    "pipeline_source_cap" ->
      """SELECT source, rank, doc_id, n_chars FROM (
        |  SELECT source, doc_id, n_chars,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rank
        |  FROM documents) t
        |WHERE rank <= 20 ORDER BY source, rank""".stripMargin,
    // exact integer cross-multiplied admission — see the query's scaladoc
    "sample_temperature" ->
      s"""WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
        |w AS (SELECT lang, n,
        |    CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1000000.0 + 0.5)
        |      AS BIGINT) AS wq FROM c),
        |t AS (SELECT CAST(SUM(wq) AS BIGINT) AS swq,
        |    CAST(SUM(n) AS BIGINT) AS tot FROM w),
        |r AS (SELECT lang, n, wq, swq, tot // 2 AS b FROM w, t)
        |SELECT d.doc_id, d.lang, d.source,
        |  CAST(r.b * r.wq AS DOUBLE) / CAST(r.swq * r.n AS DOUBLE)
        |    AS rate
        |FROM documents d JOIN r ON d.lang = r.lang
        |WHERE ${duckHashByte("d.doc_id")}
        |  * r.swq * r.n < 256 * r.b * r.wq
        |ORDER BY d.doc_id""".stripMargin,
    "vec_quantize" ->
      """WITH e AS (SELECT vec_id, embedding,
        |  list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))
        |    AS mxr
        |  FROM embeddings),
        |m AS (SELECT vec_id, embedding,
        |  CASE WHEN mxr = 0 THEN 1.0 ELSE mxr END AS mx FROM e)
        |SELECT vec_id, i AS dim,
        |  CAST(floor(CAST(embedding[i + 1] AS DOUBLE) * (127.0 / mx) + 0.5)
        |    AS INTEGER) AS q_val,
        |  127.0 / mx AS q_scale
        |FROM m, unnest(range(0, len(embedding))) AS u(i)
        |ORDER BY vec_id, dim""".stripMargin,
    "fn_zorder" -> (duckZ + "\nORDER BY event_id"),
    "sink_zorder" ->
      s"""SELECT count(*) AS n_rows,
        |  min(event_id) AS min_id, max(event_id) AS max_id,
        |  CAST(sum(event_id) AS BIGINT) AS sum_id
        |FROM events
        |WHERE user_id BETWEEN $userLo AND $userHi
        |  AND $duckHour BETWEEN $hourLo AND $hourHi""".stripMargin
  )
}
