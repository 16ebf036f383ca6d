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
  * [[connectedComponents]] is the ALTERNATING STAR algorithm of Kiveris
  * et al., "Connected Components in MapReduce and Beyond" (SoCC 2014):
  * large-star / small-star edge rewriting with the paper's O(log² n)
  * round bound, independent of how ids are laid out along paths. (The
  * round-8 implementation — min-label propagation + one pointer jump per
  * round over a static edge set — looked logarithmic on ascending-id
  * chains but degraded to ~1 hop/round on id-scrambled paths; the
  * `graft.Probe cc` 1000-node scrambled path caught it still unconverged
  * at 50 rounds. Star rounds rewrite edges toward local minima from both
  * endpoints, which is what the proven bound needs.) The driver loop only
  * orchestrates; no vertex data ever reaches the driver; the round count
  * is logged, and every round's frame is checkpointed to truncate both
  * lineage and the self-join's compounding size estimates.
  */
object DedupClusters {

  /** Connected components over an undirected edge list.
    *
    * @param pairs two id columns (any orderable numeric type), one row per
    *              edge; direction and duplicates don't matter.
    * @return (id, rep): every id that appears in some edge, labeled with
    *         the smallest id in its component. Self-loops contribute their
    *         node (an id seen ONLY in (x, x) pairs is its own singleton
    *         component, rep = x). Nodes appearing in no edge at all are
    *         absent — callers attach them with a left join +
    *         coalesce(rep, id), see [[dedupClusters]].
    *
    * The returned frame is persisted (it is the fixpoint of an iterative
    * computation — recomputing it from lineage would replay every round);
    * the caller owns cleanup per the library cache contract
    * ([[graft.Caching.withCleanup]]). On the reliable-checkpoint path
    * (session has a checkpoint dir) the loop DELETES each superseded
    * round's checkpoint files itself; only the FINAL round's file set
    * remains as the returned frame's recompute source — it is reclaimed by
    * Spark at GC when `spark.cleaner.referenceTracking.cleanCheckpoints`
    * is true, otherwise it lives until the checkpoint dir is cleaned.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 50): DataFrame = {
    val spark = pairs.sparkSession
    val Array(ca, cb) = pairs.columns.take(2)

    // Per-round LINEAGE TRUNCATION, not just caching: each star round
    // references the previous round's frame ~6 times (symmetrize + the
    // min-frame join on both operations), so the logical plan grows
    // geometrically. persist() caches data but Catalyst still analyzes/
    // optimizes (and the UI renders) the full tree on every action, so
    // beyond ~10 rounds planning dominates and the loop looks hung
    // (caught by the `graft.Probe cc` 1000-node path; the sf gate's 2-3
    // rounds never showed it). checkpoint()/localCheckpoint() rebase the
    // frame onto its materialized rows — the GraphX-Pregel discipline for
    // iterative dataflows. Reliable checkpoint is used when the session
    // has a checkpoint dir (cluster production: survives executor loss);
    // local checkpoint otherwise (single-JVM harness; blocks are
    // reclaimed explicitly each round below).
    // The createDataFrame rebase before the checkpoint RESETS PLAN
    // STATISTICS: checkpoint's LogicalRDD inherits the origin plan's
    // sizeInBytes estimate, and the star rounds' self-referencing joins
    // SQUARE it — round r would carry a 2^r-bit BigInt and Catalyst's
    // stats visitor ends up in million-digit BigInteger multiplies (the
    // probe's actual second hang, after lineage truncation fixed the
    // first). The rebase costs one row-format conversion per round,
    // during the checkpoint job itself; the materialized blocks serve all
    // downstream reads.
    def truncate(df: DataFrame): DataFrame = {
      val rebased = spark.createDataFrame(df.rdd, df.schema)
      if (spark.sparkContext.getCheckpointDir.isDefined) rebased.checkpoint()
      else rebased.localCheckpoint()
    }
    // Every round truncates, including round 0 (which also rebases the
    // caller's edge-mining plan — e.g. the full MinHash pipeline — to a
    // one-node leaf; the pairs frame is tiny so that rebase is free). A
    // persist-instead-of-checkpoint hybrid for shallow rounds was measured
    // SLOWER at sf0.1 (7-8 s vs 3-4 s): the checkpoint job materializes in
    // the same pass the fixpoint needs anyway, and the re-embedded plans
    // persist() leaves behind cost more in per-action analysis than the
    // row-format rebase costs in execution.
    // the materialized rows behind a truncated frame, for eager reclaim of
    // superseded rounds (ContextCleaner would get them only at GC)
    def backingRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
      df.queryExecution.analyzed.collectFirst {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      }
    // CAUTION — a released frame is PERMANENTLY DEAD on both paths, not
    // lazily recomputable: localCheckpoint has no lineage to recompute from
    // (unpersist destroys the only copy), and on the reliable path the
    // checkpoint FILES are deleted here too (Spark itself only cleans them
    // at GC with spark.cleaner.referenceTracking.cleanCheckpoints=true, so
    // a long-lived cluster session would otherwise accumulate one file set
    // per round per run). Call ONLY on frames no later computation touches
    // — i.e. the loop's superseded-round call sites.
    def release(df: DataFrame): Unit =
      backingRdd(df).foreach { r =>
        r.unpersist(false)
        r.getCheckpointFile.foreach { f =>
          val p = new org.apache.hadoop.fs.Path(f)
          p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
        }
      }

    // Alternating LARGE-STAR / SMALL-STAR (Kiveris et al., "Connected
    // Components in MapReduce and Beyond", SoCC 2014): edge-rewriting with
    // PROVEN O(log² n) round convergence for ANY id layout. The previous
    // min-label-propagation + single pointer-jump loop is O(log d) only
    // when ids increase along paths (the spec's ascending chain: 4
    // rounds); on the probe's XOR-scrambled 1000-node path it was still
    // unconverged at 50 rounds — the jump target's own label knowledge is
    // unrelated to the jumper's position when ids are shuffled, so
    // progress degrades to ~1 hop/round. Star operations rewrite edges
    // toward local minima from BOTH sides, which is what the proof needs.
    //
    // Edges stay canonical (u < v). Each operation is one symmetrize, one
    // algebraic groupBy-min (map-side partials — skew-proof even at the
    // star roots), one hash join on u, one distinct. Edge count never
    // exceeds |E| + |V|.

    // ONE pass over the caller's pair-mining plan: canonicalize and
    // materialize first, then split real edges from self-loops against the
    // materialized frame (a second reference to `pairs` would re-run the
    // whole mining pipeline — e.g. all of MinHash).
    val canon = truncate(pairs
      .select(least(col(ca), col(cb)).as("u"), greatest(col(ca), col(cb)).as("v"))
      .distinct())
    // No second checkpoint for the initial edge set (r22): the self-loop
    // filter is one narrow op over canon's already-materialized blocks, so
    // round 1 reads THROUGH it at filter cost instead of paying a full
    // rebase + re-materialization job. canon is not released explicitly —
    // round 1's release(edges) resolves backingRdd through the Filter to
    // canon's LogicalRDD and frees exactly those blocks.
    var edges = canon.filter(col("u") =!= col("v"))
    // An id seen ONLY in self-loop pairs is a singleton component labeled
    // rep = self. The star rounds drop self-loops (they carry no
    // connectivity), so those label rows are built here, eagerly, before
    // the loop can release anything. Skipped when the mining output has no
    // self-loops at all — the common case, decided by one cheap scan of
    // the already-materialized canon frame.
    val selfRows = canon.filter(col("u") === col("v"))
    val selfOnlyLabels: Option[DataFrame] =
      if (selfRows.isEmpty) None
      else Some(truncate(selfRows.select(col("u").as("id"))
        .join(edges.select(col("u").as("id"))
            .union(edges.select(col("v").as("id"))).distinct(),
          Seq("id"), "left_anti")
        .select(col("id"), col("id").as("rep"))))
    // canon's release is owned by round 1's release(edges) — see above

    def sym(e: DataFrame): DataFrame =
      e.union(e.select(col("v").as("u"), col("u").as("v")))

    // large-star(u): every neighbor v > u re-links to m(u) = min(N(u) ∪ {u});
    // m ≤ u < v keeps the output canonical
    def largeStar(e: DataFrame): DataFrame = {
      val s = sym(e)
      val m = s.groupBy("u").agg(least(col("u"), min(col("v"))).as("m"))
      s.filter(col("v") > col("u")).join(m, "u")
        .select(col("m").as("u"), col("v"))
        .distinct()
    }

    // small-star(u): u and its strictly-smaller neighbors link to their
    // minimum; every emitted edge (m, x) has m < x — canonical
    def smallStar(e: DataFrame): DataFrame = {
      val sm = sym(e).filter(col("v") < col("u"))
      val m = sm.groupBy("u").agg(min(col("v")).as("m"))
      val viaNbrs = sm.join(m, "u").filter(col("v") =!= col("m"))
        .select(col("m").as("u"), col("v"))
      val viaSelf = m.select(col("m").as("u"), col("u").as("v"))
      viaNbrs.union(viaSelf).distinct()
    }

    var iter = 0
    var changed = true
    var nEdges = edges.count()
    while (changed && iter < maxIter) {
      val next = truncate(smallStar(largeStar(edges)))
      // fixpoint ⟺ identical edge sets. Both frames are distinct-ed, so
      // |next| = |edges| ∧ next ∖ edges = ∅ ⟹ equality — one anti-join +
      // one count against two materialized frames (cheaper than the
      // two-sided exceptAll compare)
      val nNext = next.count()
      changed = nNext != nEdges ||
        !next.join(edges, Seq("u", "v"), "left_anti").isEmpty
      release(edges)
      edges = next
      nEdges = nNext
      iter += 1
    }
    if (changed) {
      release(edges)
      selfOnlyLabels.foreach(release)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds — " +
          "returning partial labels would silently split components; raise " +
          "maxIter (alternating star rounds are O(log² n) by the SoCC'14 " +
          "bound, so 50 covers any real edge set)")
    }
    System.err.println(
      s"[graft] connectedComponents: converged in $iter rounds (maxIter=$maxIter)")
    // at the fixpoint the graph is a disjoint union of stars rooted at
    // component minima: u column = roots, v column = members. Self-loop-only
    // singletons (labeled before the loop) union back in so the contract
    // "every id appearing in some pair gets a row" holds.
    val starLabels = edges.select(col("v").as("id"), col("u").as("rep"))
      .union(edges.select(col("u")).distinct()
        .select(col("u").as("id"), col("u").as("rep")))
    val labels = selfOnlyLabels.fold(starLabels)(starLabels.unionByName(_))
    // hand back a cacheManager-registered frame — the library cache
    // contract (callers own cleanup: unpersist / Caching.withCleanup).
    // Its one-pass materialization reads the final round's checkpoint
    // rows; those blocks stay as the cache's recompute source (raw RDD
    // blocks, not cacheManager-visible) and are reclaimed when the frame
    // is garbage-collected.
    val out = labels.persist(MEMORY_AND_DISK)
    out.count()
    out
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
    val labels = connectedComponents(pairs)
    val cc = labels.toDF("doc_id", "rep")
    // The CC fixpoint loop has already materialized `cc` (its convergence
    // counts are actions), so the shingle frame backing the edge list is
    // no longer needed. The final verdict frame is one narrow row per
    // document — materialize it and release BOTH caches inside the call
    // (r22 cache-contract enforcement; CacheHygieneSpec pins this key).
    // Library users composing further call [[connectedComponents]]
    // directly — its returned frame IS the cached handle, wrappable in
    // [[graft.Caching.withCleanup]] (exercised in DedupClustersSpec).
    sh.unpersist(blocking = false)
    // release `labels` (the persisted handle itself — `cc` is a Project
    // over it and would not match the cache entry)
    graft.Caching.withCleanup(labels) {
      Tables.documents(spark, dir).select(col("doc_id"))
        .join(cc, Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("rep"), col("doc_id")).as("cluster_rep"))
        .withColumn("is_survivor", col("cluster_rep") === col("doc_id"))
        .orderBy("doc_id")
        .localCheckpoint(true)
    }
  }
}
