package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components for dup-cluster resolution.
  *
  * Alternating min-label propagation: each round RELAXES (every node takes
  * the minimum representative among itself and its neighbors — one shuffle
  * keyed by node id) then COMPRESSES (pointer jumping, rep := rep(rep) —
  * one shuffle keyed by rep). Relax moves the minimum one hop; compress
  * halves remaining path lengths, so convergence takes O(log diameter)
  * rounds; the loop detects the fixpoint (a round that changes nothing)
  * and exits — near-dup clusters are shallow in practice (dup groups, not
  * long chains), so 2 rounds typically suffice, with `rounds` as the
  * large-star/small-star-style upper bound for pathological diameters.
  *
  * Each round's labels are eagerly localCheckpoint'ed: the lineage would
  * otherwise branch ~3× per round (exponential recompute). This is the
  * same sanctioned driver-side step as a model fit (Core.scala contract);
  * superseded checkpoints are unpersisted immediately, and the final one
  * backing the returned frame is O(pair-participating nodes × 16 bytes) —
  * a keep-list for the duplicated subset, not a corpus.
  */
object GraphOps {

  /** @param nodes single column `doc_id` — every node, including isolated
    * @param pairs  undirected edges as columns `id1`, `id2`
    * @param rounds max relax+compress rounds (reach grows ~2^round, so 16
    *               covers diameter ~10^5 — needed because near-threshold
    *               similarity graphs degenerate into long chains: the
    *               sf0.1 cosine graph has a >256-hop component that 8
    *               rounds provably cannot close). The loop still exits at
    *               the first no-change round, so shallow dup-cluster
    *               graphs pay 2-3 rounds regardless of the bound.
    * @return (doc_id, rep) with rep = min doc_id of the component
    */
  def connectedComponents(nodes: DataFrame, pairs: DataFrame,
      rounds: Int = 16): DataFrame = {
    val edges = pairs
      .select(col("id1").as("a"), col("id2").as("b"))
      .union(pairs.select(col("id2").as("a"), col("id1").as("b")))
      .localCheckpoint(true)
    // size the fixpoint's shuffles from the MATERIALIZED edge count (free
    // — the checkpoint already ran): a similarity graph is usually a tiny
    // fraction of the corpus, and running 10+ rounds of joins over a
    // thousand-row frame at the corpus-sized partition count pays ~10×
    // the round latency in empty-task scheduling. ~50k edges/partition,
    // capped at the session setting — at 100 TB (billions of edges) this
    // IS the session setting; the spark.sql.shuffle.partitions conf is
    // restored before returning (queries execute sequentially per
    // session: Verify/Bench contract).
    val spark = edges.sparkSession
    val confKey = "spark.sql.shuffle.partitions"
    val aqeKey = "spark.sql.adaptive.enabled"
    val outerParts = spark.conf.get(confKey)
    val outerAqe = spark.conf.get(aqeKey, "true")
    val loopParts = math.max(1L, math.min(outerParts.toLong,
      edges.count() / 50000L + 1L))
    // AQE's per-stage re-planning buys nothing on the loop's right-sized
    // tiny shuffles and costs ~100 ms per stage × 4 stages × rounds; at
    // real scale loopParts == the session setting and AQE stays worth it,
    // so only bypass it when the graph is small enough to single-partition
    val bypassAqe = loopParts <= 4
    var labels = edges.select(col("a").as("doc_id")).distinct()
      .select(col("doc_id"), col("doc_id").as("rep"))
      .localCheckpoint(true)
    var previous = Seq(edges, labels)
    var converged = false
    var round = 0
    spark.conf.set(confKey, loopParts.toString)
    if (bypassAqe) spark.conf.set(aqeKey, "false")
    try while (!converged && round < rounds) {
      round += 1
      // relax: rep(x) = min(rep(x), min over neighbors' rep)
      val nbr = edges
        .join(labels.select(col("doc_id").as("b"), col("rep").as("brep")), "b")
        .groupBy(col("a").as("doc_id")).agg(min("brep").as("nrep"))
      val relaxed = labels.join(nbr, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("rep"), coalesce(col("nrep"), col("rep"))).as("rep"))
      // compress: rep(x) = rep(rep(x)) — rep is always a live node id.
      // The round's PREVIOUS label rides along into the checkpoint so the
      // fixpoint test below is a filter on already-materialized rows —
      // not an extra shuffle-join of two checkpointed frames per round.
      val compressed = relaxed.join(
          relaxed.select(col("doc_id").as("rid"), col("rep").as("rrep")),
          col("rep") === col("rid"))
        .join(labels.withColumnRenamed("rep", "prev"), "doc_id")
        .select(col("doc_id"), col("rrep").as("rep"), col("prev"))
        .localCheckpoint(true)
      converged = compressed.where(col("rep") =!= col("prev")).isEmpty
      previous.drop(1).foreach(_.unpersist())
      previous = Seq(edges, compressed)
      labels = compressed.select("doc_id", "rep")
    } finally {
      spark.conf.set(confKey, outerParts)
      spark.conf.set(aqeKey, outerAqe)
    }
    edges.unpersist()
    System.err.println(s"[graft] connectedComponents: " +
      (if (converged) s"converged in $round rounds"
       else s"NOT converged after $round rounds"))
    // an unconverged result must never silently materialize (it would be
    // persisted into write-once fixtures and reused downstream with no
    // signal — round-2 advisory); diameters beyond ~2^rounds fail fast
    require(converged,
      s"connected components did not converge within $rounds rounds " +
        "(graph diameter too large — raise `rounds`)")
    nodes.select(col("doc_id"))
      .join(labels.withColumnRenamed("doc_id", "pid"),
        col("doc_id") === col("pid"), "left")
      .select(col("doc_id"), coalesce(col("rep"), col("doc_id")).as("rep"))
  }
}
