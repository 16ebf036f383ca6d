package graft.operators

import graft.{SparkSpec, Tables}
import graft.streaming.StreamingOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming arrival-mode curation: [[StreamingOps
  * .streamingCurationIncremental]] drives [[CurationIncremental
  * .stepExactlyOnce]] per micro-batch. These specs pin the two claims
  * the scaladoc makes: micro-batching the stream is SEAM-FREE (chopping
  * the corpus into micro-batches yields byte-identical packed rows and
  * state to the same chops run as nightly steps), and the composite
  * batch→output→state effect is EXACTLY-ONCE under replay and under a
  * crash on either side of the state commit point. */
class StreamingCurationIncrementalSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "n_tok", "start_tok", "seq_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

  private def fps(path: String) =
    spark.read.parquet(s"$path/fps").select("fp")
      .collect().map(_.getString(0)).sorted.toSeq

  private def cursor(path: String) =
    CurationIncremental.readCtl(spark, path)._1

  private val n1 = Seq(
    (2L, "alpha beta gamma delta"),
    (4L, "one two three four"))
  private val n2 = Seq(
    (1L, "five six seven eight"),
    (3L, "delta gamma beta alpha"),   // dup of indexed doc 2 → dropped
    (7L, "nine ten eleven twelve"))

  test("micro-batches equal nightly steps: seam-free offsets, identical state") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val state = tmpDir("scur-state")
    val out = tmpDir("scur-out")
    val ck = tmpDir("scur-ck")
    val in = MemoryStream[(Long, String)]
    val q = StreamingOps.streamingCurationIncremental(
      in.toDF().toDF("doc_id", "text"), state, out, ck,
      budget = 8, bucketWidth = 2)
    try {
      in.addData(n1: _*); q.processAllAvailable()
      in.addData(n2: _*); q.processAllAvailable()
    } finally q.stop()
    // reference: the same chops as nightly steps on a separate state dir
    val ref = tmpDir("scur-ref")
    val ref1 = CurationIncremental.step(spark, n1.toDF("doc_id", "text"),
      ref, budget = 8, bucketWidth = 2, init = true)
    val ref2 = CurationIncremental.step(spark, n2.toDF("doc_id", "text"),
      ref, budget = 8, bucketWidth = 2)
    assert(rows(spark.read.parquet(s"$out/batch=0")) === rows(ref1))
    assert(rows(spark.read.parquet(s"$out/batch=1")) === rows(ref2))
    assert(Tables.artifactComplete(s"$out/batch=0") &&
      Tables.artifactComplete(s"$out/batch=1"))
    assert(cursor(state) === cursor(ref), "pack cursor must be seam-free")
    assert(fps(state) === fps(ref), "fp index must be chop-independent")
    assert(CurationIncremental.committedBatchId(spark, state) === 1L)
  }

  test("replay of a committed batch is a no-op, even with poisoned content") {
    import spark.implicits._
    val state = tmpDir("scur-replay-state")
    val out = tmpDir("scur-replay-out")
    assert(CurationIncremental.stepExactlyOnce(spark,
      n1.toDF("doc_id", "text"), state, out, 0L, budget = 8, bucketWidth = 2))
    assert(CurationIncremental.stepExactlyOnce(spark,
      n2.toDF("doc_id", "text"), state, out, 1L, budget = 8, bucketWidth = 2))
    val cursorBefore = cursor(state)
    val fpsBefore = fps(state)
    val outBefore = rows(spark.read.parquet(s"$out/batch=1"))
    // a re-delivered batch 1 — even with different rows — must not apply
    val applied = CurationIncremental.stepExactlyOnce(spark,
      Seq((99L, "poison content row here")).toDF("doc_id", "text"),
      state, out, 1L, budget = 8, bucketWidth = 2)
    assert(!applied)
    assert(cursor(state) === cursorBefore && fps(state) === fpsBefore)
    assert(rows(spark.read.parquet(s"$out/batch=1")) === outBefore)
  }

  test("crash BEFORE the state commit: rollback, the replay reproduces the batch") {
    import spark.implicits._
    val state = tmpDir("scur-precrash-state")
    val out = tmpDir("scur-precrash-out")
    val ref = tmpDir("scur-precrash-ref")
    val refOut = tmpDir("scur-precrash-refout")
    Seq(state -> out, ref -> refOut).foreach { case (s, o) =>
      assert(CurationIncremental.stepExactlyOnce(spark,
        n1.toDF("doc_id", "text"), s, o, 0L, budget = 8, bucketWidth = 2))
    }
    // simulate the crash: batch 1's delta staged but NOT committed (and
    // a half-written output dir with no completion marker)
    val poisonAcc = CurationIncremental.accepted(
      Seq((50L, "halfway crashed rows")).toDF("doc_id", "text"),
      spark.read.parquet(s"$state/fps").select("fp")).localCheckpoint(true)
    CurationIncremental.stageAndCommit(spark, poisonAcc, 999L, state,
      commit = false, metaRow = Some(1L))
    // the replay must roll the staging back and apply batch 1 cleanly
    assert(CurationIncremental.stepExactlyOnce(spark,
      n2.toDF("doc_id", "text"), state, out, 1L, budget = 8, bucketWidth = 2))
    assert(CurationIncremental.stepExactlyOnce(spark,
      n2.toDF("doc_id", "text"), ref, refOut, 1L, budget = 8, bucketWidth = 2))
    assert(rows(spark.read.parquet(s"$out/batch=1")) ===
      rows(spark.read.parquet(s"$refOut/batch=1")))
    assert(cursor(state) === cursor(ref) && fps(state) === fps(ref))
  }

  test("crash AFTER the commit, before the fold: roll-forward, the replay is skipped") {
    import spark.implicits._
    val state = tmpDir("scur-postcrash-state")
    val out = tmpDir("scur-postcrash-out")
    val ref = tmpDir("scur-postcrash-ref")
    val refOut = tmpDir("scur-postcrash-refout")
    Seq(state -> out, ref -> refOut).foreach { case (s, o) =>
      assert(CurationIncremental.stepExactlyOnce(spark,
        n1.toDF("doc_id", "text"), s, o, 0L, budget = 8, bucketWidth = 2))
    }
    // reference: batch 1 applied uninterrupted
    assert(CurationIncremental.stepExactlyOnce(spark,
      n2.toDF("doc_id", "text"), ref, refOut, 1L, budget = 8, bucketWidth = 2))
    // crashed run: replicate stepExactlyOnce up to the commit marker —
    // output durable, state delta committed — then "crash" before the fold
    val idxFps = spark.read.parquet(s"$state/fps").select("fp")
    val acc = CurationIncremental.accepted(n2.toDF("doc_id", "text"), idxFps)
      .localCheckpoint(true)
    val o1 = CurationIncremental.packBatch(acc, cursor(state),
      budget = 8, bucketWidth = 2, materialize = true)
    val total = o1.agg(coalesce(sum("n_tok"), lit(0L))).head().getLong(0)
    o1.write.mode("overwrite").parquet(s"$out/batch=1")
    Tables.markArtifactComplete(s"$out/batch=1")
    CurationIncremental.stageAndCommit(spark, acc, cursor(state) + total,
      state, metaRow = Some(1L))
    // the replay must roll the commit forward and SKIP re-application
    val applied = CurationIncremental.stepExactlyOnce(spark,
      n2.toDF("doc_id", "text"), state, out, 1L, budget = 8, bucketWidth = 2)
    assert(!applied, "a committed batch must not re-apply after roll-forward")
    assert(rows(spark.read.parquet(s"$out/batch=1")) ===
      rows(spark.read.parquet(s"$refOut/batch=1")))
    assert(cursor(state) === cursor(ref) && fps(state) === fps(ref))
    assert(CurationIncremental.committedBatchId(spark, state) === 1L)
  }

  test("FIRST batch crashes on either side of its marker: retry converges (no meta wedge)") {
    import spark.implicits._
    // reference: batch 0 applied uninterrupted
    val ref = tmpDir("scur-first-ref")
    val refOut = tmpDir("scur-first-refout")
    assert(CurationIncremental.stepExactlyOnce(spark,
      n1.toDF("doc_id", "text"), ref, refOut, 0L, budget = 8, bucketWidth = 2))
    // crash BEFORE the marker: the first batch's delta staged, uncommitted
    val sA = tmpDir("scur-first-pre")
    val oA = tmpDir("scur-first-preout")
    val accA = CurationIncremental.accepted(n1.toDF("doc_id", "text"),
      Seq.empty[String].toDF("fp")).localCheckpoint(true)
    CurationIncremental.stageAndCommit(spark, accA, 999L, sA,
      commit = false, metaRow = Some(0L))
    assert(CurationIncremental.stepExactlyOnce(spark,
      n1.toDF("doc_id", "text"), sA, oA, 0L, budget = 8, bucketWidth = 2),
      "a pre-marker first-batch crash must retry as a fresh first batch")
    assert(cursor(sA) === cursor(ref) && fps(sA) === fps(ref))
    assert(rows(spark.read.parquet(s"$oA/batch=0")) ===
      rows(spark.read.parquet(s"$refOut/batch=0")))
    // crash AFTER the marker, before the fold: the retry must roll the
    // first batch forward and classify itself as a replay — under the
    // r18 meta-written-last scheme this window wedged every retry
    // (meta/ present but unreadable → head() threw)
    val sB = tmpDir("scur-first-post")
    val oB = tmpDir("scur-first-postout")
    val accB = CurationIncremental.accepted(n1.toDF("doc_id", "text"),
      Seq.empty[String].toDF("fp")).localCheckpoint(true)
    val outB = CurationIncremental.packBatch(accB, 0L, budget = 8,
      bucketWidth = 2, materialize = true)
    val totB = outB.agg(coalesce(sum("n_tok"), lit(0L))).head().getLong(0)
    outB.write.mode("overwrite").parquet(s"$oB/batch=0")
    Tables.markArtifactComplete(s"$oB/batch=0")
    CurationIncremental.stageAndCommit(spark, accB, totB, sB,
      metaRow = Some(0L))
    val applied = CurationIncremental.stepExactlyOnce(spark,
      n1.toDF("doc_id", "text"), sB, oB, 0L, budget = 8, bucketWidth = 2)
    assert(!applied, "a committed first batch must not re-apply")
    assert(cursor(sB) === cursor(ref) && fps(sB) === fps(ref))
    assert(CurationIncremental.committedBatchId(spark, sB) === 0L)
    // belt-and-braces: a ctl/ directory with NO data files (the r18
    // wedge artifact's shape) reads as fresh state instead of throwing
    val sC = tmpDir("scur-first-wedge")
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(sC, "ctl"))
    assert(CurationIncremental.committedBatchId(spark, sC) === -1L)
    val oC = tmpDir("scur-first-wedgeout")
    assert(CurationIncremental.stepExactlyOnce(spark,
      n1.toDF("doc_id", "text"), sC, oC, 0L, budget = 8, bucketWidth = 2))
    assert(cursor(sC) === cursor(ref) && fps(sC) === fps(ref))
  }

  test("full macro: budget counters commit exactly-once with the batch id") {
    import spark.implicits._
    val budgets = Seq("en" -> 5L, "fr" -> 1000L)
    val f1 = Seq(
      (2L, "en", "alpha beta gamma delta epsilon zeta"),
      (4L, "en", "one two three four five six"),
      (1L, "fr", "cinq six sept huit"),
      (7L, "fr", "neuf dix onze douze")).toDF("doc_id", "lang", "text")
    val f2 = Seq(
      (2L, "en", "zz1 zz2 zz3 zz4"),
      (7L, "fr", "treize quatorze quinze seize")).toDF("doc_id", "lang", "text")
    // reference: two uninterrupted stepFull nights
    val ref = tmpDir("scurf-ref")
    CurationIncremental.stepFull(spark, f1, ref, budgets,
      budget = 8, bucketWidth = 2, init = true)
    val refOut2 = CurationIncremental.stepFull(spark, f2, ref, budgets,
      budget = 8, bucketWidth = 2)
      .select("doc_id", "lang", "n_tok", "mix_start", "start_tok").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    // exactly-once driver: same chops as micro-batches 0 and 1
    val state = tmpDir("scurf-state")
    val out = tmpDir("scurf-out")
    assert(CurationIncremental.stepFullExactlyOnce(spark, f1, state, out, 0L,
      budgets, budget = 8, bucketWidth = 2))
    assert(CurationIncremental.stepFullExactlyOnce(spark, f2, state, out, 1L,
      budgets, budget = 8, bucketWidth = 2))
    val got2 = spark.read.parquet(s"$out/batch=1")
      .select("doc_id", "lang", "n_tok", "mix_start", "start_tok").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got2 === refOut2)
    def consumed(p: String) = CurationIncremental.readCtl(spark, p)._3
    assert(consumed(state) === consumed(ref))
    assert(cursor(state) === cursor(ref))
    // the load-bearing case: a REPLAY of batch 1 must not double-count
    // the budget counters (en is exhausted; fr would jump 12 → 16)
    assert(!CurationIncremental.stepFullExactlyOnce(spark, f2, state, out, 1L,
      budgets, budget = 8, bucketWidth = 2))
    assert(consumed(state) === Map("en" -> 6L, "fr" -> 12L),
      "a replayed batch must not double-count domain budgets")
  }

  test("retract: a taken-down doc's twin is accepted again; cursor and history untouched") {
    import spark.implicits._
    val state = tmpDir("scur-retract-state")
    val out = tmpDir("scur-retract-out")
    assert(CurationIncremental.stepExactlyOnce(spark,
      n1.toDF("doc_id", "text"), state, out, 0L, budget = 8, bucketWidth = 2))
    val cursorBefore = cursor(state)
    // take down doc 2 ("alpha beta gamma delta")
    val removed = CurationIncremental.retract(spark,
      Seq((2L, "alpha beta gamma delta")).toDF("doc_id", "text"), state)
    assert(removed === 1L)
    assert(cursor(state) === cursorBefore,
      "takedown must not rewind consumed pack offsets")
    // a bag-of-words twin of the retracted doc now passes the gate
    // (doc_id 1 is a known train-shard id, so acceptance shows in the
    // packed output, not just the fp state)
    assert(CurationIncremental.stepExactlyOnce(spark,
      Seq((1L, "delta gamma beta alpha")).toDF("doc_id", "text"),
      state, out, 1L, budget = 8, bucketWidth = 2))
    val b1 = spark.read.parquet(s"$out/batch=1")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(b1 === Set(1L), "the retracted fp must no longer suppress a twin")
    // ...while a doc 4 twin (never retracted) still dies — asserted on
    // the fp state so the check is shard-independent
    val fpsBefore = fps(state).length
    assert(CurationIncremental.stepExactlyOnce(spark,
      Seq((23L, "four three two one")).toDF("doc_id", "text"),
      state, out, 2L, budget = 8, bucketWidth = 2))
    assert(fps(state).length === fpsBefore,
      "a twin of a non-retracted doc must still be rejected")
  }

  test("restart from the checkpoint: new data continues the offsets, old batches untouched") {
    // the file-drop restart pattern (StreamingSpec's T2 discipline): a
    // fresh MemoryStream can't resume a checkpoint, a file source can
    val srcDir = tmpDir("scur-restart-src")
    val state = tmpDir("scur-restart-state")
    val out = tmpDir("scur-restart-out")
    val ck = tmpDir("scur-restart-ck")
    def writeFile(name: String, docs: Seq[(Long, String)]): Unit =
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(srcDir, name),
        docs.map { case (id, t) => s"""{"doc_id": $id, "text": "$t"}""" }
          .mkString("", "\n", "\n")): Unit
    def startQuery() = StreamingOps.streamingCurationIncremental(
      spark.readStream.schema("doc_id LONG, text STRING").json(srcDir),
      state, out, ck, budget = 8, bucketWidth = 2)
    writeFile("a.json", n1)
    val q1 = startQuery(); q1.processAllAvailable(); q1.stop()
    // night 2 arrives while the query is DOWN
    writeFile("b.json", n2)
    val q2 = startQuery(); q2.processAllAvailable(); q2.stop()
    val b0 = rows(spark.read.parquet(s"$out/batch=0"))
    val b1 = rows(spark.read.parquet(s"$out/batch=1"))
    val cursorAfter2 = cursor(state)
    assert(b0.nonEmpty && b1.nonEmpty)
    // third chop, second restart (doc_id 2 is a KNOWN train-shard id —
    // night 1 packed it — and the fresh text gives it a fresh fp)
    writeFile("c.json", Seq((2L, "brand new content tonight")))
    val q3 = startQuery(); q3.processAllAvailable(); q3.stop()
    assert(rows(spark.read.parquet(s"$out/batch=0")) === b0)
    assert(rows(spark.read.parquet(s"$out/batch=1")) === b1)
    val b2 = rows(spark.read.parquet(s"$out/batch=2"))
    assert(b2.nonEmpty && b2.forall(_._3 === cursorAfter2),
      "the restarted stream must continue packing at the persisted cursor")
  }
}
