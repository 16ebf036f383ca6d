package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training + encoding (SURVEY.md §2.7 [EXT] —
  * Sennrich et al. 2016, "Neural Machine Translation of Rare Words with
  * Subword Units": iteratively merge the most frequent adjacent symbol
  * pair). [[TextOps.tokenCount]] *counts* BPE-ish tokens with a fixed
  * regex; this operator *learns* the merge table from the corpus and
  * re-tokenizes with it — the actual vocabulary-construction step of an
  * LLM data pipeline.
  *
  * Scale shape (why this is corpus-size-independent after one pass):
  * training runs on the WORD-COUNT dictionary, not the corpus — one
  * corpus pass aggregates (word, count), and every merge round is an
  * aggregation over the VOCABULARY frame (bounded: ~millions of rows at
  * 100 TB, weighted by counts), exactly how production BPE trainers
  * (subword-nmt, HuggingFace tokenizers) structure it. Each round
  * collects ONE row (the argmax pair) to the driver — the IVF-centroid
  * discipline; R rounds = R tiny collects.
  *
  * Cross-engine exactness trick — the seq-string encoding: a word's
  * symbol sequence is one string, symbols joined by DOUBLE spaces with
  * single-space ends: `' a  b  c '`. Applying merge (a,b) is then the
  * LITERAL string replace `' a  b ' → ' ab '`, which both engines
  * implement with identical left-to-right non-overlapping semantics:
  * the pattern's outer single spaces consume one space from each
  * neighboring joint and the replacement restores them, so consecutive
  * merge sites chain correctly in one pass (`' a  b  a  b '` →
  * `' ab  ab '`) and a run merges left-first (`'aaa'` → `'(aa)a'`) —
  * the BPE convention. Pair counting is the plain adjacent count
  * (overlap-agnostic), the subword-nmt convention; argmax ties break on
  * (pair) lexicographically.
  *
  * Encoding applies the learned merges to text IN TRAINING ORDER, one
  * global replace per merge — the classic implementation shortcut
  * (documented simplification vs. the lowest-rank-first loop; identical
  * on this merge table by construction, and the oracle recomputes the
  * same definition). Word boundaries are a reserved `#` symbol that can
  * never appear inside a merge, so a document encodes as ONE string and
  * merges cannot bridge words.
  */
object Bpe {

  /** Number of merge rounds for the declared keys. */
  val Merges = 8

  /** Reserved word-boundary symbol (the corpus is lowercase a-z words —
    * TESTDATA — so `#` collides with nothing). */
  val Boundary = "#"

  /** Seq-string of a word: chars joined by double spaces, single-space
    * ends: "abc" → " a  b  c ". */
  private[operators] def seqStr(w: Column): Column =
    concat(lit(" "),
      concat_ws("  ", transform(sequence(lit(1), length(w)), i => substring(w, i, lit(1)))),
      lit(" "))

  /** One merge application on a seq-string column. */
  private[operators] def applyMerge(seq: Column, l: String, r: String): Column =
    call_function("replace", seq, lit(s" $l  $r "), lit(s" ${l}${r} "))

  /** Train `merges` rounds on any (doc_id, text) frame — the
    * PRODUCTION-SCALE structure (r19; subword-nmt's): ONE distributed
    * pass builds the bounded word-count dictionary, then every merge
    * round runs DRIVER-SIDE over it with incrementally-maintained pair
    * statistics. The corpus is never re-scanned, and — unlike the r18
    * shape, which ran one distributed argmax aggregation per round —
    * no Spark job runs per merge at all: 32k production merges are 32k
    * in-memory argmax+update steps (milliseconds each, probe-pinned),
    * not 32k cluster round-trips. The dictionary is the bounded frame
    * the IVF-centroid discipline allows on the driver (~millions of
    * (word, count) rows at 100 TB — the corpus's text never leaves the
    * executors; `maxVocab` caps it harder for constrained drivers:
    * tail words below the cut carry negligible pair mass).
    *
    * Returns the merge table in training order: (rk, left, right, cnt).
    * Bit-identical to [[trainDistributed]] by construction (spec-pinned):
    * same overlap-agnostic adjacent pair counts, same (cnt desc, pair
    * lexicographic) argmax — ties compared in UTF-8 BYTE order
    * ([[utf8Lt]]), the same total order as Spark's UTF8 binary
    * `orderBy`, so the equality holds on ANY corpus, not just ASCII —
    * and the same left-first non-overlapping merge application. */
  def train(docs: DataFrame, merges: Int = Merges,
      maxVocab: Int = 0): Seq[(Int, String, String, Long)] = {
    // THE one corpus pass: word counts. The maxVocab cap is applied
    // DISTRIBUTIVELY, before anything reaches the driver (r19 verdict:
    // on real web text the distinct-token count — URLs, typos, hashes —
    // is billions, and a collect-then-cap would OOM the driver the cap
    // exists to protect). orderBy+limit is a TakeOrderedAndProject:
    // per-partition top-K heaps, one K-row exchange — never a full sort.
    // Tie order (count desc, word by Spark's UTF8 binary order) matches
    // trainFromDictionary's UTF-8 argmax tie-break, so the cut is
    // deterministic cross-engine.
    val wc = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val capped = if (maxVocab > 0) wc.orderBy(desc("c"), asc("w")).limit(maxVocab)
      else wc
    val dict = capped.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    trainFromDictionary(dict, merges)
  }

  /** Left-first non-overlapping application of one merge on a symbol
    * array — the in-memory twin of [[applyMerge]]'s seq-string literal
    * replace ('a a a' → '(aa) a'; 'a b a b' → '(ab)(ab)'). Shared by
    * the trainer's re-count, the served encoder, and the spec's
    * rank-order reference. */
  private[graft] def applyMergeSyms(sym: Array[String], l: String,
      r: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < sym.length) {
      if (i < sym.length - 1 && sym(i) == l && sym(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += sym(i); i += 1 }
    }
    out.toArray
  }

  /** A word's initial symbol array, split by CODE POINT — the same
    * segmentation Spark's `substring`/`length` use in [[seqStr]], so
    * the driver trainer/encoder and the distributed twin agree on
    * supplementary-plane text too (a UTF-16 `toCharArray` split would
    * shear a surrogate pair into two lone-surrogate symbols). */
  private[graft] def codePointSyms(w: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < w.length) {
      val n = Character.charCount(w.codePointAt(i))
      out += w.substring(i, i + n)
      i += n
    }
    out.toArray
  }

  /** Unsigned UTF-8 byte-order "less than" — Spark's UTF8String binary
    * ordering, reproduced on the driver so [[trainFromDictionary]]'s
    * argmax tie-break agrees with [[trainDistributed]]'s `orderBy` on
    * ANY corpus: JVM UTF-16 code-unit comparison diverges for
    * supplementary-plane characters (surrogate code units sort above
    * U+E000..U+FFFF in UTF-16 but their UTF-8 bytes sort below), which
    * would silently break the spec-pinned train ≡ trainDistributed
    * bit-equality on non-ASCII text (r19 ADVICE). */
  private[operators] def utf8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  /** The driver-side merge loop over a (word, count) dictionary —
    * [[train]]'s engine, callable directly when the dictionary is
    * already at hand. Maintains, across rounds: each word's current
    * symbol sequence, the global pair→count map (every ADJACENT
    * occurrence counts, overlap-agnostic — the subword-nmt convention
    * the distributed twin aggregates), and a pair→words occurrence
    * index so a merge touches only the words that contain its pair —
    * O(affected words × word length) per round, independent of both
    * corpus and vocabulary size after round costs localize. */
  def trainFromDictionary(dict: Seq[(String, Long)],
      merges: Int): Seq[(Int, String, String, Long)] = {
    import scala.collection.mutable
    val words = dict.map { case (w, _) => codePointSyms(w) }.toArray
    val counts = dict.map(_._2).toArray
    def pairsOf(sym: Array[String]): Iterator[(String, String)] =
      (0 until sym.length - 1).iterator.map(i => (sym(i), sym(i + 1)))
    val pairCount = mutable.HashMap.empty[(String, String), Long]
    val pairWords = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    for (wi <- words.indices; p <- pairsOf(words(wi))) {
      pairCount.update(p, pairCount.getOrElse(p, 0L) + counts(wi))
      pairWords.getOrElseUpdate(p, mutable.Set.empty) += wi
    }
    val out = mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rk = 1
    while (rk <= merges && pairCount.nonEmpty) {
      // deterministic argmax: count desc, then pair lexicographic in
      // UTF-8 BYTE order ([[utf8Lt]] — the twin's Spark orderBy order)
      var best: ((String, String), Long) = null
      for (e <- pairCount.iterator) {
        if (best == null || e._2 > best._2 ||
          (e._2 == best._2 && (utf8Lt(e._1._1, best._1._1) ||
            (e._1._1 == best._1._1 && utf8Lt(e._1._2, best._1._2))))) best = e
      }
      val ((l, r), cnt) = best
      out += ((rk, l, r, cnt))
      // re-count only the words that contain the merged pair
      val affected = pairWords.getOrElse((l, r), mutable.Set.empty).toArray
      for (wi <- affected) {
        val old = words(wi)
        for (p <- pairsOf(old)) {
          val left = pairCount(p) - counts(wi)
          if (left == 0L) pairCount.remove(p) else pairCount.update(p, left)
          pairWords.get(p).foreach(_ -= wi)
        }
        val merged = applyMergeSyms(old, l, r)
        words(wi) = merged
        for (p <- pairsOf(merged)) {
          pairCount.update(p, pairCount.getOrElse(p, 0L) + counts(wi))
          pairWords.getOrElseUpdate(p, mutable.Set.empty) += wi
        }
      }
      rk += 1
    }
    out.toSeq
  }

  /** The r18 one-distributed-aggregation-per-round trainer, kept as the
    * CROSS-CHECK twin: the spec pins `train ≡ trainDistributed` on the
    * corpus, so the driver-side pair bookkeeping can never drift from
    * the declarative definition the oracle also recomputes. Correct at
    * any corpus size (rounds aggregate the bounded VOCABULARY frame,
    * never the corpus), but pays one Spark job per merge — the shape
    * item 4 of the r18 verdict retired for production merge counts. */
  def trainDistributed(docs: DataFrame,
      merges: Int = Merges): Seq[(Int, String, String, Long)] = {
    // one corpus pass: word counts
    val wc = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .select(col("w"), col("c"), seqStr(col("w")).as("seq"))
      .persist()
    wc.count()
    var vocab = wc
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rk = 1
    var exhausted = false
    while (rk <= merges && !exhausted) {
      // adjacent symbol pairs over the vocabulary, weighted by word count
      val syms = split(trim(col("seq")), "  ")
      // guard fully-merged 1-symbol words: sequence(1, 0) runs DESCENDING
      // in Spark ([1, 0]), so an unguarded transform would index past the
      // single element
      val pairList = when(size(syms) >= 2,
        transform(sequence(lit(1), size(syms) - 1),
          i => struct(element_at(syms, i).as("l"), element_at(syms, i + 1).as("r"))))
        .otherwise(array().cast("array<struct<l:string,r:string>>"))
      val pairs = vocab
        .select(col("c"), explode(pairList).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("c").as("cnt"))
      // deterministic argmax: count desc, then pair lexicographic.
      // orderBy+limit(1) plans as TakeOrderedAndProject — per-partition
      // size-1 heaps merged on the driver — so a web-scale pair frame
      // (~|vocab| rows) never sorts on one task (a single-partition
      // row_number here would).
      val best = pairs.orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect()
      if (best.isEmpty) {
        // vocabulary fully merged before the requested rounds (tiny corpus
        // or merges > available pairs): return the merges learned so far
        exhausted = true
      } else {
        val (l, r, cnt) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        out += ((rk, l, r, cnt))
        vocab = vocab.select(col("w"), col("c"),
          applyMerge(col("seq"), l, r).as("seq"))
          // cut the one-projection-per-round lineage so R rounds stay flat
          .localCheckpoint(true)
        rk += 1
      }
    }
    wc.unpersist()
    out.toSeq
  }

  /** Declared key (`bpe_train`): the learned merge table over the corpus. */
  def bpeTrain(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    train(Tables.documents(spark, dir).select("doc_id", "text"))
      .toDF("rk", "lhs", "rhs", "cnt")
      .select(col("rk"), col("lhs"), col("rhs"),
        concat(col("lhs"), col("rhs")).as("merged"), col("cnt"))
      .orderBy("rk")
  }

  /** Merge-table PERSISTENCE — the "train once, encode every corpus
    * snapshot" production shape (the IVF-index discipline: tokenizers are
    * trained rarely and applied to every batch forever after; retraining
    * per job would also silently change the vocabulary). One tiny parquet
    * of (rk, lhs, rhs, cnt); read restores training order by rk. */
  def writeMergeTable(spark: SparkSession, path: String,
      merges: Seq[(Int, String, String, Long)]): Unit = {
    import spark.implicits._
    merges.toDF("rk", "lhs", "rhs", "cnt").coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  def readMergeTable(spark: SparkSession, path: String): Seq[(Int, String, String, Long)] =
    spark.read.parquet(path).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1).toSeq

  /** Where the served merge table for a given corpus dir lives (one table
    * per corpus, like the IVF index layout keys on its corpus). The path
    * also carries a staleness fingerprint — [[graft.Tables.corpusFingerprint]]
    * over the documents table's file names/sizes/mtimes — so a regenerated
    * corpus (even at identical byte total) retrains instead of serving a
    * merge table learned from the old data. */
  def mergeTablePath(dir: String): String =
    "target/fixtures/bpe_merges_" +
      dir.replaceAll("[^A-Za-z0-9.]", "_") + "_" +
      graft.Tables.corpusFingerprint(dir, "documents")

  /** Train-once/serve-forever accessor: read the persisted merge table for
    * `dir` if one exists, else train it once and persist. Every subsequent
    * call (and every later encode job over the same corpus) serves from
    * the artifact — the production tokenizer shape, where retraining per
    * job would both waste a corpus pass and silently drift the vocabulary. */
  def servedMerges(spark: SparkSession, dir: String): Seq[(Int, String, String, Long)] = {
    val path = mergeTablePath(dir)
    if (new java.io.File(path, "_SUCCESS").exists) readMergeTable(spark, path)
    else {
      val merges = train(
        Tables.documents(spark, dir).select("doc_id", "text"))
      writeMergeTable(spark, path, merges)
      merges
    }
  }

  /** Encode a text column with a learned merge table: the document
    * becomes one seq-string with `#` boundary symbols between words, the
    * merges apply in training order, and the symbol count excludes the
    * boundaries. Pure chained string expressions — narrow, codegen'd,
    * scan-bound at any corpus size. */
  def encodeSymCount(text: Column, merges: Seq[(Int, String, String, Long)]): Column = {
    val toks = split(text, " ")
    val docSeq = concat(lit(" "),
      concat_ws(s"  $Boundary  ",
        transform(toks, t => concat_ws("  ",
          transform(sequence(lit(1), length(t)), i => substring(t, i, lit(1)))))),
      lit(" "))
    val merged = merges.foldLeft(docSeq: Column) {
      case (s, (_, l, r, _)) => applyMerge(s, l, r)
    }
    size(split(trim(merged), "  ")) - (size(toks) - 1)
  }

  /** One word's encoded symbol count under the iterative LOWEST-RANK
    * merge algorithm — the production encoder's per-word kernel (the
    * HF-tokenizers/tiktoken shape): repeatedly find the adjacent pair
    * with the lowest merge rank present and apply it left-to-right
    * non-overlapping, until no pair is mergeable. For a table TRAINED
    * by BPE this is equivalent to applying the merges in rank order (a
    * merge's pair can only assemble once its constituent symbols exist,
    * which is exactly rank order — the spec pins the equivalence per
    * word at 4k-merge depth and against [[encodeSymCount]]'s chained
    * replaces on the corpus), but costs O(len × merges-APPLIED) instead
    * of O(len × table size) — at 32k merges the rank-order scan per
    * word is 32k map probes, this is ~len. */
  private[graft] def encodeWordSymCount(w: String,
      ranks: Map[(String, String), Int]): Int = {
    var syms: Array[String] = codePointSyms(w)
    var done = syms.length < 2
    while (!done) {
      var best = Int.MaxValue
      var bi = -1
      var i = 0
      while (i < syms.length - 1) {
        val rk = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (rk < best) { best = rk; bi = i }
        i += 1
      }
      if (bi < 0) done = true
      else {
        syms = applyMergeSyms(syms, syms(bi), syms(bi + 1))
        done = syms.length < 2
      }
    }
    syms.length
  }

  /** PRODUCTION-SCALE serving encoder ([[encodeSymCount]]'s twin for
    * merge tables beyond the chained-replace expression's reach): a
    * narrow mapPartitions pass applying the iterative lowest-rank
    * kernel per word, with a per-partition word→count memo — corpora
    * repeat words heavily (Zipf), so the kernel runs once per DISTINCT
    * word per partition and every later occurrence is a hash hit. The
    * rank map is table-sized (32k entries ≈ 1 MB) and ships in the
    * task closure — the driver-resident-model discipline. Returns
    * (doc_id, n_ws, n_sym); per-word sums equal the doc-level count
    * because merges never bridge the word boundary, the
    * [[encodeSymCount]] contract. mapPartitions (not an Expression) is
    * deliberate: the per-word loop is genuinely imperative state the
    * HOF/codegen surface can't express, and the stage stays scan-bound
    * and shuffle-free. */
  def servedEncode(docs: DataFrame,
      merges: Seq[(Int, String, String, Long)]): DataFrame = {
    import docs.sparkSession.implicits._
    val ranks = merges.map { case (rk, l, r, _) => (l, r) -> rk }.toMap
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val memo = scala.collection.mutable.HashMap.empty[String, Int]
        it.map { case (id, text) =>
          val ws = text.split(' ')
          var total = 0
          var i = 0
          while (i < ws.length) {
            total += memo.getOrElseUpdate(ws(i), encodeWordSymCount(ws(i), ranks))
            i += 1
          }
          (id, ws.length, total)
        }
      }
      .toDF("doc_id", "n_ws", "n_sym")
  }

  /** Declared key (`bpe_encode`): re-tokenize every document with the
    * PERSISTED merge table ([[servedMerges]] — trained at most once per
    * corpus, then served from the parquet artifact like the IVF index),
    * reporting whitespace vs learned-BPE symbol counts and the
    * chars-per-symbol ratio (the corpus-budgeting number the tokenizer
    * exists to improve). The returned plan is the serve path only: chained
    * literal replaces over the scan — no training aggregation in it. */
  def bpeEncode(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val merges = servedMerges(spark, dir)
    docs
      .select(col("doc_id"),
        size(split(col("text"), " ")).as("n_ws"),
        encodeSymCount(col("text"), merges).as("n_sym"),
        length(col("text")).as("n_chars"))
      .withColumn("chars_per_sym",
        round(col("n_chars").cast("double") / col("n_sym"), 6))
      .orderBy("doc_id")
  }
}
