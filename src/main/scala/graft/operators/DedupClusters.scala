package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

/** Cluster resolution over near-duplicate PAIRS (SURVEY.md §2.7 E1 — the
  * last mile of the dedup pipeline): connected components + survivor
  * selection.
  *
  * Every pair miner in this library (MinHash banding, PPJoin, SimHash,
  * embedding LSH, winnowing) emits verified (doc_a, doc_b) edges. Pairwise
  * keep-first is NOT transitively correct: with A~B and B~C but no direct
  * (A, C) edge, dropping B per-pair can leave A and C both "survivors" of
  * what is really one duplicate cluster. A 100 TB dedup must resolve the
  * transitive closure and keep exactly one document per component.
  *
  * [[connectedComponents]] is iterative min-id label propagation with
  * POINTER JUMPING (label ← label of label each round), the standard
  * O(log diameter)-round MapReduce CC shape (cf. Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC 2014 — the
  * small-star/large-star family; pointer jumping gives the same
  * logarithmic round bound over a STATIC edge set, which keeps every
  * iteration two hash-shuffles on the id key and never rewrites edges).
  * The driver loop only orchestrates: per round one join edges⋈labels
  * (propagate the smallest neighbor label), one join labels⋈labels
  * (jump), one `count` for the convergence check. No vertex data ever
  * reaches the driver; the iteration count is logged.
  */
object DedupClusters {

  /** Connected components over an undirected edge list.
    *
    * @param pairs two id columns (any orderable numeric type), one row per
    *              edge; direction and duplicates don't matter.
    * @return (id, rep): every id that appears in some edge, labeled with
    *         the smallest id in its component. Singletons (nodes with no
    *         edge) are absent — callers attach them with a left join +
    *         coalesce(rep, id), see [[dedupClusters]].
    *
    * The returned frame is persisted (it is the fixpoint of an iterative
    * computation — recomputing it from lineage would replay every round);
    * the caller owns cleanup per the library cache contract
    * ([[graft.Caching.withCleanup]]).
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 50): DataFrame = {
    val Array(ca, cb) = pairs.columns.take(2)
    val sym = pairs.select(col(ca).as("u"), col(cb).as("v"))
      .union(pairs.select(col(cb).as("u"), col(ca).as("v")))
      .distinct()
      .persist(MEMORY_AND_DISK)

    // round 0 folded into init: rep = min(self, direct neighbors)
    var labels = sym.groupBy(col("u"))
      .agg(least(col("u"), min(col("v"))).as("rep"))
      .select(col("u").as("id"), col("rep"))
      .persist(MEMORY_AND_DISK)

    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      // propagate: the smallest label among my neighbors' labels
      val nbrMin = sym
        .join(labels.select(col("id").as("v"), col("rep").as("vrep")), "v")
        .groupBy(col("u")).agg(min(col("vrep")).as("nbr_rep"))
        .select(col("u").as("id"), col("nbr_rep"))
      val prop = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("rep"), coalesce(col("nbr_rep"), col("rep"))).as("rep"))
      // pointer jump: rep ← rep(rep) — labels chase their own chain, so
      // path lengths halve per round instead of shrinking by one
      val jumped = prop
        .join(prop.toDF("jid", "rep2"), col("rep") === col("jid"), "left")
        .select(col("id"), coalesce(col("rep2"), col("rep")).as("rep"))
        .persist(MEMORY_AND_DISK)
      changed = jumped
        .join(labels.toDF("id", "old_rep"), "id")
        .filter(col("rep") < col("old_rep"))
        .count()
      labels.unpersist()
      labels = jumped
      iter += 1
    }
    sym.unpersist()
    if (changed > 0) {
      labels.unpersist(blocking = false)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds " +
          s"($changed labels still changing) — returning partial labels would " +
          "silently split components; raise maxIter (pointer jumping needs " +
          "O(log diameter) rounds, so 50 covers any real edge set)")
    }
    System.err.println(
      s"[graft] connectedComponents: converged in $iter rounds (maxIter=$maxIter)")
    labels
  }

  /** Declared key (`dedup_clusters`): transitive dedup resolution over the
    * MinHash-verified near-duplicate pairs ([[MinHashDedup.verified]], the
    * same pair set as the `dedup_minhash` key). One row per DOCUMENT:
    * its cluster representative (the smallest doc_id reachable through
    * Jaccard-≥0.8 edges; itself when it has no duplicate) and the
    * survivor verdict — the same keep-lowest discipline as
    * [[TextOps.docDedup]], now transitively correct. The DuckDB oracle
    * recomputes the closure from the brute-force pair set with a
    * WITH RECURSIVE min-id walk, so a propagation bug (a component split
    * or merged wrongly) turns rows red.
    */
  def dedupClusters(spark: SparkSession, dir: String): DataFrame = {
    val sh = MinHashDedup.shingleDocs(spark, dir).persist(MEMORY_AND_DISK)
    val pairs = MinHashDedup.verified(sh, MinHashDedup.candidatePairs(sh))
      .select(col("doc_a"), col("doc_b"))
    val cc = connectedComponents(pairs).toDF("doc_id", "rep")
    // The CC fixpoint loop has already materialized `cc` (its convergence
    // counts are actions), so the shingle frame backing the edge list is
    // no longer needed. `cc` itself stays cached and its handle is internal
    // to this key: a fully clean session afterwards comes from the harness's
    // spark.catalog.clearCache() per-key contract (Verify.scala). Library
    // users who want scoped cleanup call [[connectedComponents]] directly —
    // its returned frame IS the cached handle, wrappable in
    // [[graft.Caching.withCleanup]] (exercised in DedupClustersSpec).
    sh.unpersist(blocking = false)
    Tables.documents(spark, dir).select(col("doc_id"))
      .join(cc, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("rep"), col("doc_id")).as("cluster_rep"))
      .withColumn("is_survivor", col("cluster_rep") === col("doc_id"))
      .orderBy("doc_id")
  }
}
