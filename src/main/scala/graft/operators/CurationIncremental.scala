package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The curation macro in the incremental arrival mode (SURVEY.md §2.7
  * E10 composed with E14 — what an accumulating 100 TB corpus actually
  * runs nightly): each arriving batch goes quality-gate → dedup against
  * the batch AND the persisted fingerprint index → train split →
  * sequence packing whose global token offsets CONTINUE exactly where
  * the previous run ended, so the packed corpus reads as one unbroken
  * doc_id-ordered concatenation across arbitrarily many runs — a
  * training job consuming sequences never sees a seam.
  *
  * Persistent state between runs is tiny and narrow:
  *   - `fps/`:    accepted documents' 32 B fingerprints
  *     ([[IncrementalDedup]]'s bucket-partitioned layout, verbatim) —
  *     appended per step with ALL accepted survivors (both shards: a
  *     val-shard doc must still suppress future duplicates);
  *   - `cursor/`: ONE row — the global token offset the next run's
  *     packing starts from (the train shard's running total).
  *
  * Per-step cost is O(batch) text work + one narrow anti-join against
  * the index — the accumulated corpus's TEXT is never touched again,
  * which is the whole point vs re-running [[Curation.curate]] over
  * accumulation ∪ batch (O(total) text per night, growing forever).
  */
object CurationIncremental {

  /** gate → in-batch keep-first → anti-join vs `idxFps` — the accepted
    * survivors of one batch as the narrow (doc_id, quality, fp, n_tok)
    * frame every downstream stage consumes ([[Curation.curate]] stages
    * 1-2 with the cross-index arm; the text never passes this point). */
  def accepted(batch: DataFrame, idxFps: DataFrame): DataFrame = {
    val w = Window.partitionBy("fp").orderBy("doc_id")
    TextOps.quality(batch)
      .filter(col("verdict") === "keep")
      .select(col("doc_id"), col("quality"),
        TextOps.fingerprint(col("text")).as("fp"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
      .join(idxFps.select("fp"), Seq("fp"), "left_anti")
  }

  /** Stage 3-4 over one batch's accepted survivors: train shard, then
    * pack CONTINUING from `offset` (the cursor the previous run left).
    * `materialize = true` bounds packSequences' internal cache to the
    * call and returns an eagerly checkpointed frame ([[Packing
    * .packSequences]]'s contract) — the lazy default is the plan-audit
    * hook. */
  def packBatch(acc: DataFrame, offset: Long,
      budget: Int = Packing.SeqBudget,
      bucketWidth: Long = Packing.BucketWidth,
      materialize: Boolean = false): DataFrame =
    Packing.packSequences(
        acc.filter(Sampling.hashBucket(col("doc_id")) < Sampling.TrainUpper)
          .select("doc_id", "quality", "n_tok"),
        "doc_id", "n_tok", budget, bucketWidth, offset, materialize)
      .select("doc_id", "quality", "n_tok", "start_tok", "seq_id")

  // ---------------------------------------------------- persisted state

  private def pendingDir(path: String) =
    java.nio.file.Paths.get(path, "_pending")

  /** Converge possibly-crashed state at `path` (the [[IndexMaintenance
    * .recoverIndex]] discipline for this operator's TWO-piece state):
    * a committed-but-unfolded pending night rolls forward; an
    * uncommitted one rolls back, so the retried night REPRODUCES its
    * batch instead of swallowing it (fps would already contain the
    * batch) or double-reserving offsets. */
  def recoverState(spark: SparkSession, path: String): Unit = {
    val pend = pendingDir(path)
    if (java.nio.file.Files.exists(pend)) {
      if (Tables.artifactComplete(pend.toString)) foldPending(path)
      else IndexMaintenance.deleteRecursively(pend)
      spark.catalog.refreshByPath(s"$path/fps")
    }
  }

  /** Fold a COMMITTED pending night into the live state: append the
    * staged fp files into `fps/` (atomic per-file copy, skip files a
    * prior fold attempt already moved — staged part names are
    * write-fresh UUIDs, collision-free), then swap `cursor/` to the
    * staged row (copy staged in first, delete old after — never a
    * moment with no cursor file), then delete the marker FIRST and the
    * pending tree. Every action is idempotent, so a crash at any point
    * re-folds cleanly. */
  private def foldPending(path: String): Unit = {
    val pend = pendingDir(path)
    // fps: staged bucket dirs append into the live bucket dirs
    val fpsStaged = pend.resolve("fps")
    IndexMaintenance.listDir(fpsStaged)
      .filter(d => java.nio.file.Files.isDirectory(d) &&
        d.getFileName.toString.startsWith("bucket="))
      .foreach { d =>
        IndexMaintenance.dataFiles(d).foreach(
          IndexMaintenance.copyInto(_,
            java.nio.file.Paths.get(path, "fps", d.getFileName.toString)))
      }
    // cursor (and, for the full macro, budgets): staged files in, stale
    // files out (by name difference) — copy-first so there is never a
    // moment with no live file
    Seq("cursor", "budgets").foreach { piece =>
      val staged = pend.resolve(piece)
      if (java.nio.file.Files.isDirectory(staged)) {
        val live = java.nio.file.Paths.get(path, piece)
        val stagedNames =
          IndexMaintenance.dataFiles(staged).map(_.getFileName.toString).toSet
        IndexMaintenance.dataFiles(staged)
          .foreach(IndexMaintenance.copyInto(_, live))
        IndexMaintenance.dataFiles(live)
          .filterNot(f => stagedNames.contains(f.getFileName.toString))
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
    java.nio.file.Files.deleteIfExists(pend.resolve("_GRAFT_COMPLETE"))
    IndexMaintenance.deleteRecursively(pend)
  }

  /** Stage one night's state delta under `_pending` (invisible to Spark
    * readers of the live paths) and commit it with the completion
    * marker. Split from [[step]] so the crash spec can stop at either
    * side of the commit point. */
  private[operators] def stageAndCommit(spark: SparkSession, acc: DataFrame,
      nextCursor: Long, path: String, commit: Boolean = true,
      budgetRows: Option[Seq[(String, Long)]] = None): Unit = {
    import spark.implicits._
    val pend = pendingDir(path)
    IndexMaintenance.deleteRecursively(pend)
    IncrementalDedup.writeFpIndex(acc.select("fp"),
      pend.resolve("fps").toString)
    Seq(nextCursor).toDF("next_tok")
      .write.mode("overwrite").parquet(pend.resolve("cursor").toString)
    budgetRows.foreach(_.toDF("lang", "consumed")
      .write.mode("overwrite").parquet(pend.resolve("budgets").toString))
    if (commit) Tables.markArtifactComplete(pend.toString)
  }

  /** One nightly step against the state at `path`: returns the batch's
    * packed train rows (offsets continuing the cursor), appends accepted
    * fingerprints, advances the cursor. `init = true` starts fresh state
    * (empty index, cursor 0) — the first night; retry a crashed night
    * with the SAME init flag.
    *
    * Both outputs are eagerly checkpointed BEFORE the state writes
    * ([[IncrementalDedup.step]]'s guard): the fp append invalidates
    * plans scanning the index path, and the cursor overwrite would feed
    * a lazy re-evaluation the NEXT run's offset.
    *
    * State commit is ATOMIC at the pending marker: both the fp delta and
    * the advanced cursor are staged under `_pending`, the marker commits
    * them together, and [[recoverState]] (run at every non-init entry)
    * rolls a crashed night forward or back as one unit — a retried night
    * can never find the fps appended but the cursor stale, which would
    * dedup the whole batch against its own fingerprints and swallow it
    * permanently. Init nights read no state, so a plain overwrite retry
    * is already idempotent. */
  def step(spark: SparkSession, batch: DataFrame, path: String,
      budget: Int = Packing.SeqBudget,
      bucketWidth: Long = Packing.BucketWidth,
      init: Boolean = false): DataFrame = {
    import spark.implicits._
    if (!init) recoverState(spark, path)
    val (idxFps, cursor) =
      if (init) (Seq.empty[String].toDF("fp"), 0L)
      else (IncrementalDedup.readFpIndex(spark, s"$path/fps").select("fp"),
        spark.read.parquet(s"$path/cursor").head().getLong(0))
    val acc = accepted(batch, idxFps).localCheckpoint(true)
    val out = packBatch(acc, cursor, budget, bucketWidth, materialize = true)
    val total = out.agg(coalesce(sum("n_tok"), lit(0L))).head().getLong(0)
    if (init) {
      IncrementalDedup.writeFpIndex(acc.select("fp"), s"$path/fps")
      Seq(cursor + total).toDF("next_tok")
        .write.mode("overwrite").parquet(s"$path/cursor")
    } else {
      stageAndCommit(spark, acc, cursor + total, path)
      foldPending(path)
      spark.catalog.refreshByPath(s"$path/fps")
    }
    out
  }

  // ------------------------------------- full macro, arrival mode (r18)

  /** [[accepted]] with [[Curation.curationFull]]'s extra stages in the
    * same narrow discipline: the PII scrub fuses into the projection
    * (everything downstream — quality, fingerprint, token counts — sees
    * scrubbed text, so a redacted duplicate dedups against a redacted
    * original), and the domain column rides along for the mix. */
  def acceptedFull(batch: DataFrame, idxFps: DataFrame,
      domainCol: String = "lang"): DataFrame = {
    val w = Window.partitionBy("fp").orderBy("doc_id")
    TextOps.quality(batch.withColumn("text", Redact.clean(col("text"))))
      .filter(col("verdict") === "keep")
      .select(col("doc_id"), col(domainCol), col("quality"),
        TextOps.fingerprint(col("text")).as("fp"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
      .join(idxFps.select("fp"), Seq("fp"), "left_anti")
  }

  /** Train-shard + budget-mix one batch's accepted survivors, with each
    * domain's offsets CONTINUING at its persisted consumed counter —
    * the genuinely new state of the full arrival mode: `mix_start` is
    * the GLOBAL per-domain token offset (prior nights + this batch's
    * hash-order prefix), so a domain an earlier night exhausted selects
    * nothing tonight, and the budget boundary lands once, corpus-wide,
    * exactly where the one-shot mix would put it under nightly arrival
    * order. */
  def mixBatch(acc: DataFrame, budgets: Seq[(String, Long)],
      consumed: Map[String, Long], domainCol: String = "lang",
      materialize: Boolean = false): DataFrame =
    DomainMix.mix(
        acc.filter(Sampling.hashBucket(col("doc_id")) < Sampling.TrainUpper),
        domainCol, "n_tok", budgets, consumed, materialize)
      .withColumnRenamed("tok_start", "mix_start")

  /** Per-domain token totals of a mixed batch — the counter delta the
    * state commit persists (bounded: one row per budgeted domain). */
  private def consumedOf(mixed: DataFrame, domainCol: String): Map[String, Long] =
    mixed.groupBy(domainCol).agg(sum("n_tok").as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  /** Declared key (`curation_incremental_full`): the EVERY-stage macro
    * ([[Curation.curationFull]]: redact → quality → dedup → split →
    * domain-mix → pack) in the two-night arrival mode. Night 1 = even
    * docs from fresh state; night 2 = odd docs deduped against night 1's
    * accepted fingerprints, MIXED from night 1's per-domain consumed
    * counters, and packed from night 1's train total. The oracle chains
    * both nights as CTEs and compares `mix_start` (pins budget
    * continuation exactly — night 2's first fill per domain must equal
    * night 1's consumed total) and `start_tok` (pins the pack cursor),
    * so a seam in EITHER piece of state turns rows red. */
  def curationIncrementalFull(spark: SparkSession, dir: String,
      budgets: Seq[(String, Long)] = DomainMix.Budgets): DataFrame = {
    import spark.implicits._
    val docs = Redact.plantPii(Tables.documents(spark, dir)
      .select("doc_id", "text", "lang"))
    val acc1 = acceptedFull(docs.filter(col("doc_id") % 2 === 0),
        Seq.empty[String].toDF("fp"))
      .localCheckpoint(true)
    val mix1 = mixBatch(acc1, budgets, Map.empty, materialize = true)
    val out1 = packBatchMixed(mix1, 0L, materialize = true)
    val tot1 = out1.agg(coalesce(sum("n_tok"), lit(0L))).head().getLong(0)
    val cons1 = consumedOf(mix1, "lang")
    val mix2 = mixBatch(
      acceptedFull(docs.filter(col("doc_id") % 2 === 1), acc1.select("fp")),
      budgets, cons1, materialize = true)
    val out2 = packBatchMixed(mix2, tot1, materialize = true)
    out1.withColumn("batch", lit(1))
      .union(out2.withColumn("batch", lit(2)))
      .select("batch", "doc_id", "lang", "quality", "n_tok", "mix_start",
        "start_tok", "seq_id")
      .orderBy("start_tok")
  }

  /** [[packBatch]] for an already-sharded-and-mixed frame (the shard and
    * selection happened in [[mixBatch]]); carries the mix columns
    * through packSequences unchanged. */
  def packBatchMixed(mixed: DataFrame, offset: Long,
      budget: Int = Packing.SeqBudget,
      bucketWidth: Long = Packing.BucketWidth,
      materialize: Boolean = false): DataFrame =
    Packing.packSequences(mixed, "doc_id", "n_tok", budget, bucketWidth,
      offset, materialize)

  /** One nightly step of the FULL macro against the state at `path` —
    * [[step]]'s protocol with the third piece of state: `budgets/`
    * (one (domain, consumed) row per budgeted domain) commits atomically
    * with the fp delta and the cursor under the same pending marker.
    * fps of ALL accepted survivors enter the index, including docs the
    * mix rejected for budget — dedup state and sampling state are
    * independent: a budget-rejected doc is still SEEN text, and its
    * future duplicates must die. */
  def stepFull(spark: SparkSession, batch: DataFrame, path: String,
      budgets: Seq[(String, Long)] = DomainMix.Budgets,
      budget: Int = Packing.SeqBudget,
      bucketWidth: Long = Packing.BucketWidth,
      init: Boolean = false): DataFrame = {
    import spark.implicits._
    if (!init) recoverState(spark, path)
    val (idxFps, cursor, consumed) =
      if (init) (Seq.empty[String].toDF("fp"), 0L, Map.empty[String, Long])
      else (IncrementalDedup.readFpIndex(spark, s"$path/fps").select("fp"),
        spark.read.parquet(s"$path/cursor").head().getLong(0),
        spark.read.parquet(s"$path/budgets").collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap)
    val acc = acceptedFull(batch, idxFps).localCheckpoint(true)
    val mixed = mixBatch(acc, budgets, consumed, materialize = true)
    val out = packBatchMixed(mixed, cursor, budget, bucketWidth,
      materialize = true)
    val total = out.agg(coalesce(sum("n_tok"), lit(0L))).head().getLong(0)
    val delta = consumedOf(mixed, "lang")
    val newConsumed = budgets.map { case (d, _) =>
      d -> (consumed.getOrElse(d, 0L) + delta.getOrElse(d, 0L))
    }
    if (init) {
      IncrementalDedup.writeFpIndex(acc.select("fp"), s"$path/fps")
      Seq(cursor + total).toDF("next_tok")
        .write.mode("overwrite").parquet(s"$path/cursor")
      newConsumed.toDF("lang", "consumed")
        .write.mode("overwrite").parquet(s"$path/budgets")
    } else {
      stageAndCommit(spark, acc, cursor + total, path,
        budgetRows = Some(newConsumed))
      foldPending(path)
      spark.catalog.refreshByPath(s"$path/fps")
    }
    out.select("doc_id", "lang", "quality", "n_tok", "mix_start",
      "start_tok", "seq_id")
  }

  /** Declared key (`curation_incremental`): the two-batch fixture that
    * proves the seam is invisible — EVEN documents arrive as night 1
    * (fresh state), ODD documents as night 2 (dedup against night 1's
    * accepted fingerprints; packing continues at night 1's train-token
    * total). Output: both nights' packed rows stamped with their batch,
    * ordered by the global offset — the DuckDB oracle recomputes both
    * nights as chained CTEs, so a regression in any stage, in the
    * cross-index dedup arm, or in the offset hand-off (the first odd
    * start_tok must equal the even train total EXACTLY) turns rows red.
    * Frames-as-index like the sibling incremental keys; the persisted
    * [[step]] is spec- and probe-covered. */
  def curationIncremental(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val acc1 = accepted(docs.filter(col("doc_id") % 2 === 0),
        Seq.empty[String].toDF("fp"))
      .localCheckpoint(true)
    // materialize=true on both packs: packSequences' internal cache is
    // released before each returns (CacheHygieneSpec pins this key), and
    // out1 is consumed twice (total + union) so the checkpoint pays for
    // itself
    val out1 = packBatch(acc1, 0L, materialize = true)
    // the cursor hand-off: night 2 starts at night 1's train-token total
    // (a 1-row aggregate collect — the bounded-frame discipline)
    val tot1 = out1.agg(coalesce(sum("n_tok"), lit(0L))).head().getLong(0)
    val out2 = packBatch(
      accepted(docs.filter(col("doc_id") % 2 === 1), acc1.select("fp")), tot1,
      materialize = true)
    out1.withColumn("batch", lit(1))
      .union(out2.withColumn("batch", lit(2)))
      .select("batch", "doc_id", "quality", "n_tok", "start_tok", "seq_id")
      .orderBy("start_tok")
  }
}
