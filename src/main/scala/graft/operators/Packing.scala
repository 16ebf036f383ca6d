package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training-data pipelines (SURVEY.md §2.7
  * [EXT]): assign every document its token offset in the deterministic
  * doc_id-ordered corpus concatenation, and from it the fixed-budget
  * training sequence (context window) its first token lands in — the
  * "concat-and-chunk" batching step that turns a curated corpus into
  * training sequences.
  *
  * The interesting part is the global prefix sum. The naive form —
  * `sum(n_tok) over (order by doc_id)` with no partition — funnels the
  * ENTIRE corpus through one partition (Spark plans an unpartitioned
  * running window as Exchange SinglePartition), a guaranteed OOM/straggler
  * at 100 TB. This operator computes the identical result as a classic
  * two-phase parallel prefix sum:
  *
  *   1. bucket docs by a MONOTONE function of the sort key
  *      (`doc_id div bucketWidth` — monotone bucketing is exactly what
  *      range partitioning does, so any ordered key domain works);
  *   2. within-bucket running sums — a keyed window, parallel across
  *      buckets, each partition holds one bucket's docs;
  *   3. per-bucket totals (one map-side-combined aggregation down to
  *      #buckets rows) cumulated into bucket offsets by a tiny window
  *      over #buckets rows — the only single-partition step, O(#buckets)
  *      not O(#docs);
  *   4. broadcast the offsets back and add.
  *
  * Equivalence to the single-window form is asserted on random corpora in
  * CurationOpsSpec; the plan shape (no SinglePartition exchange of raw
  * docs, broadcast offset join) is pinned in PlanAuditSpec.
  */
object Packing {

  /** Tokens per packed training sequence for the declared key (a
    * GPT-2-ish context budget; any positive budget works). */
  val SeqBudget = 512

  /** doc_ids per prefix-sum bucket for the declared key. Sized so a
    * bucket's docs fit one executor partition (at 100 TB: pick
    * corpus_rows / desired_parallelism); correctness is independent of
    * the choice (asserted in spec). */
  val BucketWidth = 64L

  /** Whitespace token count, matching `split(text, ' ')` keep-empties —
    * the same tokenization every other text key uses. */
  private def nTok(text: Column): Column =
    size(split(text, " ")).cast("long")

  /** Two-phase distributed prefix sum + chunk assignment over an
    * arbitrary (id, n_tok) frame. `docs` must have unique ids; ordering
    * and bucketing both key off `idCol`.
    *
    * Cache contract ([[graft.Caching]]): both phases read `docs`, so the
    * narrow bucketed projection is persisted — without it the doc source
    * (a 100 TB text scan for the declared key) is scanned and tokenized
    * twice. The cached frame is id+two longs per row, ~1000× smaller than
    * the text it derives from. With `materialize = false` (the default,
    * the plan-audit hook) callers release it via
    * `spark.catalog.clearCache()` / `withCleanup` once the result is
    * materialized (Verify and Bench both do); `materialize = true` eagerly
    * localCheckpoints the result and releases the cache before returning —
    * the [[PhashIncremental.dedupHashedAgainst]] discipline, used by every
    * packing call that runs inside a larger job ([[CurationIncremental]])
    * so repeated steps cannot leak one cached frame each into the
    * session. */
  def packSequences(docs: DataFrame, idCol: String, nTokCol: String,
      budget: Int, bucketWidth: Long, offset: Long = 0L,
      materialize: Boolean = false): DataFrame = {
    val bucketed = docs.withColumn("bucket", expr(s"$idCol div $bucketWidth"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // phase 3: #buckets-row frame of exclusive bucket offsets. The window
    // is over bucket summaries, never docs; pmod(bucket, 1) ≡ 0 keeps
    // WindowExec's "No Partition Defined" warning out of driver logs
    // without changing semantics (same trick as Ranking.bm25Topk — a lit
    // would be constant-folded away and the warning would return).
    val wOff = Window.partitionBy(pmod(col("bucket"), lit(1)))
      .orderBy("bucket").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = bucketed.groupBy("bucket")
      .agg(sum(nTokCol).as("btot"))
      .withColumn("boff", sum("btot").over(wOff) - col("btot"))
      .select("bucket", "boff")

    // phase 2 + 4: within-bucket running sum, plus the broadcast offset
    val wIn = Window.partitionBy("bucket").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // `offset` continues a PRIOR corpus's global token position (the
    // incremental arrival mode: batch N+1 packs where batch N ended —
    // [[CurationIncremental]]); 0 is the standalone batch form
    val packed = bucketed
      .withColumn("start_tok",
        sum(nTokCol).over(wIn) - col(nTokCol))
      .join(broadcast(offsets), "bucket")
      .withColumn("start_tok", col("start_tok") + col("boff") + lit(offset))
      .withColumn("seq_id", expr(s"start_tok div $budget"))
      .drop("bucket", "boff")
    if (materialize)
      graft.Caching.withCleanup(bucketed)(packed.localCheckpoint(true))
    else packed
  }

  /** Declared key (`seq_pack`): doc_id → (n_tok, start_tok, seq_id) over
    * the documents table at the [[SeqBudget]] context budget. */
  def seqPack(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables.documents(spark, dir)
      .select(col("doc_id"), nTok(col("text")).as("n_tok"))
    packSequences(t, "doc_id", "n_tok", SeqBudget, BucketWidth)
      .select("doc_id", "n_tok", "start_tok", "seq_id")
      .orderBy("doc_id")
  }

  /** Declared key (`seq_pack_bpe`): [[seqPack]] with MODEL tokens — the
    * per-document count is [[Bpe.encodeSymCount]] under the PERSISTED
    * merge table ([[Bpe.servedMerges]]), so sequence budgets measure what
    * a training-batch writer actually packs: learned BPE symbols, not
    * whitespace words. The prefix-sum/bucket machinery is unchanged
    * (packSequences is generic over any (id, n_tok) frame); only the
    * narrow token projection differs — chained codegen'd replaces over
    * the one text scan, so the 100 TB cost profile is the bpe_encode
    * serve path plus the same two-phase pack. */
  def seqPackBpe(spark: SparkSession, dir: String): DataFrame = {
    val merges = Bpe.servedMerges(spark, dir)
    val t = Tables.documents(spark, dir)
      .select(col("doc_id"),
        Bpe.encodeSymCount(col("text"), merges).cast("long").as("n_tok"))
    packSequences(t, "doc_id", "n_tok", SeqBudget, BucketWidth)
      .select("doc_id", "n_tok", "start_tok", "seq_id")
      .orderBy("doc_id")
  }

  /** The CHUNK half of concat-and-chunk: [[packSequences]] gives each
    * document its global token offset; this explodes each document into
    * the per-sequence SEGMENTS a training-batch writer actually emits —
    * GPT-style packing cuts the corpus concatenation every `budget`
    * tokens, so a document straddling a boundary contributes a segment
    * to EACH sequence it overlaps (`seq_pack`'s one `seq_id` per doc is
    * only the sequence its first token lands in). One output row per
    * (doc, overlapped sequence):
    *
    *   - `doc_from` — segment start within the document's tokens;
    *   - `seq_from` — segment start within the sequence's budget;
    *   - `seg_len` — segment length.
    *
    * Invariants (spec-asserted): segments of a doc tile `[0, n_tok)`;
    * segments of a sequence tile `[0, budget)` exactly (the final
    * sequence may be partial); both follow from interval-intersection
    * arithmetic, which is all this is — a narrow explode over spanned
    * sequence ids (≤ 1 + n_tok/budget rows per doc), no extra shuffle
    * beyond [[packSequences]]'s own phases. */
  def chunkSequences(packed: DataFrame, budget: Int): DataFrame = {
    val segStart = greatest(col("start_tok"), col("seq_id") * budget)
    val segEnd = least(col("start_tok") + col("n_tok"),
      (col("seq_id") + 1) * budget)
    packed
      .drop("seq_id") // re-derived per overlapped sequence below
      .withColumn("seq_id", explode(sequence(
        expr(s"start_tok div $budget"),
        expr(s"(start_tok + n_tok - 1) div $budget"))))
      .withColumn("doc_from", segStart - col("start_tok"))
      .withColumn("seq_from", segStart - col("seq_id") * budget)
      .withColumn("seg_len", segEnd - segStart)
  }

  /** Declared key (`seq_chunks`): the per-sequence segment table over the
    * documents corpus — doc_id → one row per overlapped sequence. */
  def seqChunks(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables.documents(spark, dir)
      .select(col("doc_id"), nTok(col("text")).as("n_tok"))
    chunkSequences(
      packSequences(t, "doc_id", "n_tok", SeqBudget, BucketWidth), SeqBudget)
      .select("doc_id", "seq_id", "doc_from", "seq_from", "seg_len")
      .orderBy("doc_id", "seq_id")
  }
}
