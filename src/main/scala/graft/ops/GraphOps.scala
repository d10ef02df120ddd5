package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Graph operators for dedup pipelines: near-duplicate PAIRS only become
  * removable duplicates once they are grouped into clusters — connected
  * components is the canonical way (the "dedup graph" step in large-scale
  * corpus curation).
  */
object GraphOps {

  /** Connected components by iterative min-label propagation: every vertex
    * starts labeled with its own id; each round every vertex takes the min
    * label among itself and its neighbors; fixpoint = components labeled by
    * their minimum vertex id.
    *
    * Scale shape: each round is one equi-join (edges ⋈ labels on src) plus
    * one groupBy(id).min — both shuffle on the same key, and AQE coalesces
    * the tiny tail rounds. Rounds needed = graph diameter (near-dup
    * clusters are clique-ish, so 2-3 in practice). `localCheckpoint`
    * truncates the per-round lineage — on a real cluster use
    * `checkpoint()` against a reliable dir instead (same call shape).
    * Convergence test: labels only ever decrease, so an unchanged label
    * SUM is a fixpoint proof — one cheap scalar action per round instead
    * of a change-count join.
    */
  def connectedComponents(
      vertices: DataFrame,
      edges: DataFrame,
      maxIter: Int = 50
  ): DataFrame = {
    val e2 = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = vertices.select(col("id"), col("id").as("label"))
      .localCheckpoint(true)
    var prevSum: java.math.BigDecimal = null
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      val prop = e2.join(labels, e2("src") === labels("id"))
        .select(e2("dst").as("id"), col("label"))
      val next = labels.union(prop)
        .groupBy("id").agg(min("label").as("label"))
        .localCheckpoint(true)
      val cur = next.agg(sum(col("label")).cast("decimal(38,0)").as("s"))
        .head.getDecimal(0)
      done = prevSum != null && cur.compareTo(prevSum) == 0
      prevSum = cur
      labels = next
      iter += 1
    }
    e2.unpersist()
    labels
  }

  /** Cluster documents by near-duplicate similarity (token Jaccard >=
    * threshold via the exact PPJoin miner) and label each doc with its
    * component (= min doc_id reachable).
    */
  def dedupClusters(docs: DataFrame, threshold: Double): DataFrame = {
    val edges = DedupOps.ngramJaccard(docs, threshold)
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    val verts = docs.select(col("doc_id").as("id"))
    connectedComponents(verts, edges)
      .select(col("id").as("doc_id"), col("label").as("component"))
      .orderBy("doc_id")
  }

  /** Keep-best representative per near-dup cluster: longest text wins,
    * lowest doc_id breaks ties. Realized as max(struct(n_chars, -doc_id))
    * — an associative argmax, so it partial-aggregates map-side (no
    * per-cluster sort, no window).
    */
  def dedupKeepBest(docs: DataFrame, threshold: Double): DataFrame =
    dedupClusters(docs, threshold)
      .join(docs.select(col("doc_id"), col("n_chars")), "doc_id")
      .groupBy(col("component"))
      .agg(
        count(lit(1)).as("n_docs"),
        max(struct(col("n_chars"), negate(col("doc_id")).as("neg_id"))).as("b"))
      .select(col("component"), col("n_docs"),
        negate(col("b.neg_id")).as("kept_doc"),
        col("b.n_chars").as("kept_chars"))
      .orderBy("component")
}
