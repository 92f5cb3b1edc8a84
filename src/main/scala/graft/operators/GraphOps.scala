package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components for dup-cluster resolution.
  *
  * Alternating min-label propagation: each round RELAXES (every node takes
  * the minimum representative among itself and its neighbors — one shuffle
  * keyed by node id) then COMPRESSES (pointer jumping, rep := rep(rep) —
  * one shuffle keyed by rep). Relax moves the minimum one hop; compress
  * halves remaining path lengths, so `rounds` rounds cover components of
  * diameter ~2^rounds. Near-dup clusters are shallow in practice (dup
  * groups, not long chains), so the default 4 rounds is ample; at extreme
  * diameters this is the standard O(log n)-round large-star/small-star
  * shape and `rounds` simply grows with log(diameter).
  *
  * Each round's labels are eagerly localCheckpoint'ed: the lineage would
  * otherwise branch ~3× per round (exponential recompute). This is the
  * same sanctioned driver-side step as a model fit (Core.scala contract);
  * superseded checkpoints are unpersisted immediately, and the final one
  * backing the returned frame is O(nodes × 16 bytes) — a keep-list, not a
  * corpus.
  */
object GraphOps {

  /** @param nodes single column `doc_id` — every node, including isolated
    * @param pairs  undirected edges as columns `id1`, `id2`
    * @return (doc_id, rep) with rep = min doc_id of the component
    */
  def connectedComponents(nodes: DataFrame, pairs: DataFrame,
      rounds: Int = 4): DataFrame = {
    val edges = pairs
      .select(col("id1").as("a"), col("id2").as("b"))
      .union(pairs.select(col("id2").as("a"), col("id1").as("b")))
      .localCheckpoint(true)
    var labels = nodes.select(col("doc_id"), col("doc_id").as("rep"))
      .localCheckpoint(true)
    var previous = Seq(edges, labels)
    for (_ <- 1 to rounds) {
      // relax: rep(x) = min(rep(x), min over neighbors' rep)
      val nbr = edges
        .join(labels.select(col("doc_id").as("b"), col("rep").as("brep")), "b")
        .groupBy(col("a").as("doc_id")).agg(min("brep").as("nrep"))
      val relaxed = labels.join(nbr, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("rep"), coalesce(col("nrep"), col("rep"))).as("rep"))
      // compress: rep(x) = rep(rep(x)) — rep is always a live node id
      val compressed = relaxed.join(
          relaxed.select(col("doc_id").as("rid"), col("rep").as("rrep")),
          col("rep") === col("rid"))
        .select(col("doc_id"), col("rrep").as("rep"))
        .localCheckpoint(true)
      previous.drop(1).foreach(_.unpersist())
      previous = Seq(edges, compressed)
      labels = compressed
    }
    edges.unpersist()
    labels
  }
}
