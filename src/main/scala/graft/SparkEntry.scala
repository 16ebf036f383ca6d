package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._
import graft.functions._
import graft.sources.{Sinks, Sources}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every key in [[queries]] is an operator from SURVEY.md §2's Query-key
  * column; [[oracleSql]] carries the equivalent DuckDB SQL for the driver's
  * hash-compare. Column names and row order are aligned on both sides
  * (explicit aliases + ORDER BY on a unique key).
  */
object SparkEntry {

  /** Flagship query (SURVEY.md §7 Phase 1): session windows + COUNT,
    * the reference's one real query (StreamingFlinkSQL.java:35-39).
    * Driver smoke-checks rows > 0 on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame =
    Windows.sessionCount(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.3 windowed aggregations
    "session_count" -> (Windows.sessionCount _),
    "session_user"  -> (Windows.sessionUser _),
    "tumble_sum"    -> (Windows.tumbleSum _),
    "slide_agg"     -> (Windows.slideAgg _),
    // §2.5 relational surface
    "filter_scan"   -> (Relational.filterScan _),
    "agg_basic"     -> (Relational.aggBasic _),
    "agg_distinct"  -> (Relational.aggDistinct _),
    "join_inner"    -> (Relational.joinInner _),
    "join_outer"    -> (Relational.joinOuter _),
    "join_semi"     -> (Relational.joinSemi _),
    "join_star"     -> (Relational.joinStar _),
    // the 100 TB layout lever: both fact tables persisted bucketed+sorted
    // by the join key → SortMergeJoin with ZERO exchange and ZERO sort
    // under it (PlanAuditSpec-pinned); same rows as the plain join
    "bucket_join"   -> (BucketedJoin.bucketJoin _),
    "topk"          -> (Relational.topk _),
    "set_ops"       -> (Relational.setOps _),
    "rollup_agg"    -> (Relational.rollupAgg _),
    "cube_agg"      -> (Relational.cubeAgg _),
    "grouping_sets" -> (Relational.groupingSetsAgg _),
    "part_supplier" -> (Relational.partSupplier _),
    "win_rank"      -> (Relational.winRank _),
    "pivot_agg"     -> (Relational.pivotAgg _),
    "dedup"         -> (Relational.dedup _),
    "star_topk"     -> (Relational.starTopk _),
    "large_order"   -> (Relational.largeOrderTopk _),
    "asof_join"     -> (AsOfJoin.asofJoin _),
    "range_join"    -> ((s: SparkSession, d: String) => RangeJoin.rangeJoin(s, d)),
    // §2.5 function surface
    "scalar_funcs"  -> (Funcs.scalarFuncs _),
    "json_funcs"    -> (Funcs.jsonFuncs _),
    "agg_collect"   -> (Funcs.aggCollect _),
    // §2.1 sources / §2.2 sinks
    "seq_source"    -> (Sources.seqSource _),
    "pojo_scan"     -> (Sources.pojoScan _),
    "json_scan"     -> (Sources.jsonScan _),
    "zip_scan"      -> (Sources.zipScan _),
    "file_sink"     -> (Sinks.fileSink _),
    // §2.4 [EXT] scale helpers — bounded-heap top-k per key (win_rank
    // semantics, O(#keys × k) shuffle instead of a per-key sort) and the
    // salted hot-key aggregation (≡ plain GROUP BY by construction)
    "topk_perkey"   -> ((s: SparkSession, d: String) =>
      TopKPerKey.topOrdersPerCustomer(s, d)),
    "skew_agg"      -> (SkewedAgg.skewAgg _),
    // §2.7 LLM-pipeline operators
    "text_stats"    -> (TextOps.textStats _),
    "text_quality"  -> (TextOps.textQuality _),
    "doc_repetition" -> (TextOps.docRepetition _),
    "doc_dedup"     -> (TextOps.docDedup _),
    "dedup_minhash" -> (MinHashDedup.dedupMinhash _),
    "ngram_jaccard" -> (NgramJaccard.ngramJaccard _),
    "sim_topk"      -> (Similarity.simTopk _),
    // §2.7 E2/E4 — IVF ANN reported as recall vs the exact baseline, and
    // the multimodal fixture queries: all hard oracle rows
    "ann_topk"      -> ((s: SparkSession, d: String) => Similarity.annRecall(s, d)),
    // PQ-ADC shortlist + exact rerank, reported as per-query recall vs
    // the exact baseline (r12 — codebooks aren't DuckDB-expressible)
    "pq_topk"       -> ((s: SparkSession, d: String) => ProductQuant.pqRecall(s, d)),
    // IVFADC served end-to-end from the persisted cid-partitioned index
    // (build-once/serve-forever; both pruning axes compose)
    "ivfpq_topk"    -> ((s: SparkSession, d: String) => ProductQuant.ivfpqRecall(s, d)),
    // the arriving-batch mode of the ANN artifact: evens indexed (models
    // trained on them alone), odds APPENDED under the existing models,
    // queries recall-gated against the exact top-k over the FULL corpus
    "ivfpq_append"  -> ((s: SparkSession, d: String) => ProductQuant.ivfpqAppendRecall(s, d)),
    "embed_dedup"   -> ((s: SparkSession, d: String) =>
      Similarity.embedDedupRecallCheck(s, d)),
    "media_stats"   -> (Multimodal.mediaStatsQuery _),
    "payload_dedup" -> (Multimodal.payloadDedupQuery _),
    "media_dims"    -> (Multimodal.mediaDimsQuery _),
    // §2.7 E4 content level: real PNG pixel decode (pure-JVM inflate +
    // unfilter) → dHash → banded-Hamming perceptual near-dup
    "media_phash"   -> (ImagePhash.mediaPhashQuery _),
    // the lossy/cross-format half: baseline JPEG pixel decode (Huffman +
    // IDCT + YCbCr + restarts) — requal/PNG/grayscale twins, one dispatching pass
    "media_phash_jpeg" -> (ImagePhash.mediaPhashJpegQuery _),
    // the media family's ARRIVAL MODE (E14 discipline on E4): arriving
    // images near-dedup against a banded-Hamming index — even bases are
    // the curated corpus, odd bases + all twins arrive as the batch
    "media_phash_incremental" -> (PhashIncremental.mediaPhashIncremental _),
    // the same arrival mode for slot-ARRAY fingerprints: arriving videos
    // probe a persisted (slot, band) index, verify by slot majority
    "video_phash_incremental" -> (VideoPhashIncremental.videoPhashIncremental _),
    // pixels → MPEG-7-style spectral descriptor → the vector stack
    // (simhash bands + exact-cosine verify): the second, independent
    // content pathway over the same planted fixture
    "media_embed"   -> (ImageEmbed.mediaEmbedQuery _),
    // image embeddings through the PERSISTED IVFADC serving path: base
    // images indexed once, planted twins served as the query batch —
    // top-1 must be the planted base for every twin
    "media_ann"     -> (ImageEmbed.mediaAnnQuery _),
    // the audio modality's content level: WAV chunk-walk decode →
    // Goertzel band energies → Haitsma-Kalker sign fingerprint →
    // the shared banded-Hamming dedup (gain/dither/resample twins)
    "audio_phash"   -> (AudioPhash.audioPhashQuery _),
    // samples → log-spectral band profile → the vector stack: the
    // second, independent audio content pathway over the same planted
    // fixture (full log energies + cosine, not sign bits + Hamming)
    "audio_embed"   -> (AudioEmbed.audioEmbedQuery _),
    // audio embeddings through the PERSISTED IVFADC serving path: base
    // clips indexed once, planted twins served as the query batch —
    // the media_ann shape, proving the vector stack is modality-blind
    "audio_ann"     -> (AudioEmbed.audioAnnQuery _),
    // the audio ARRIVAL MODE (the media_phash_incremental parity harness
    // with the WAV/Goertzel decode stage): arriving clips near-dedup
    // against the banded-Hamming index of the even-id curated corpus —
    // the declared-key witness that the fingerprint index is
    // modality-blind, closing the arrival-mode matrix's last cell
    "audio_phash_incremental" -> (PhashIncremental.audioPhashIncremental _),
    // the video modality's content level, completing the trio: AVI/MJPEG
    // chunk-walk decode → per-frame dHash through the shared image stack
    // at fixed TIME positions → banded Hamming over (slot, band) keys
    // (requal / half-frame-rate / brightness twins)
    "video_phash"   -> (VideoPhash.videoPhashQuery _),
    // frames → per-slot-normalized concatenated color-layout spectra →
    // the vector stack: the second, independent video content pathway
    // over the same planted fixture (spectral shape + cosine, not
    // gradient signs + slot-majority Hamming)
    "video_embed"   -> (VideoEmbed.videoEmbedQuery _),
    // video embeddings through the PERSISTED IVFADC serving path: base
    // videos indexed once, planted twins served as the query batch —
    // closes the modality × pathway matrix (image/audio/video each
    // fingerprinted, embedded, AND ANN-served)
    "video_ann"     -> (VideoEmbed.videoAnnQuery _),
    // text → hashed n-gram embedding (feature hashing over the DSIR
    // unigram+bigram space, graft_hash_embed kernel) → the SAME vector
    // stack the media modalities ride: closes the text row of the
    // modality × pathway matrix (embed + ANN-serve for every modality)
    "text_embed"    -> (TextEmbed.textEmbedQuery _),
    // text embeddings through the PERSISTED IVFADC serving path: base
    // docs indexed once, planted paraphrase twins served as the query
    // batch — top-1 must be the planted base for every twin
    "text_ann"      -> (TextEmbed.textAnnQuery _),
    // the text-embedding family's ARRIVAL MODE (the media_phash_incremental
    // parity harness on hashed n-gram vectors): arriving docs near-dedup
    // against a persisted signature-band + vector index — even bases are
    // the curated corpus, odd bases + all paraphrase twins arrive
    "text_embed_incremental" -> (TextEmbed.textEmbedIncremental _),
    "lang_id"       -> (TextOps.langId _),
    "token_count"   -> (TextOps.tokenCount _),
    "doc_fingerprint" -> (TextOps.docFingerprint _),
    "winnow_pairs"  -> (TextOps.winnowPairsQuery _),
    // §2.7 E1 last mile: transitive cluster resolution over the verified
    // MinHash pair set (alternating-star connected components)
    "dedup_clusters" -> (DedupClusters.dedupClusters _),
    // §2.7 [EXT] training-data curation: deterministic hash splits,
    // stratified sampling, BM25 retrieval ranking, benchmark
    // decontamination, and embedding k-means assignment
    "split_hash"        -> (Sampling.splitHash _),
    "sample_stratified" -> ((s: SparkSession, d: String) =>
      Sampling.sampleStratified(s, d)),
    "sample_weighted"   -> ((s: SparkSession, d: String) =>
      Sampling.sampleWeighted(s, d)),
    "bm25_topk"         -> ((s: SparkSession, d: String) =>
      Ranking.bm25Topk(s, d)),
    // the production cadence: index the corpus once (inverted postings
    // partitioned by term bucket + doclen + stats, corpus-fingerprinted,
    // completion-marker-gated), serve every query from the artifact
    "bm25_serve"        -> ((s: SparkSession, d: String) =>
      Ranking.bm25Serve(s, d)),
    // the batch serving cadence: N term-sets answered from ONE
    // union-of-buckets pruned posting read, per-query fixed-order
    // scoring, bounded-heap top-k per query
    "bm25_serve_batch"  -> ((s: SparkSession, d: String) =>
      Ranking.bm25ServeBatch(s, d)),
    // the ARRIVAL MODE (E14 discipline on E6): even docs fully indexed,
    // odd docs appended as the nightly batch (O(batch) posting/doclen
    // deltas + exact integer stats delta, one atomic three-piece
    // commit), then served through the unchanged index path — the
    // full-corpus oracle certifies the appended artifact is
    // content-identical to a from-scratch build
    "bm25_serve_incremental" -> ((s: SparkSession, d: String) =>
      Ranking.bm25ServeIncremental(s, d)),
    "contamination"     -> (Contamination.contamination _),
    "kmeans_assign"     -> ((s: SparkSession, d: String) =>
      Similarity.kmeansAssign(s, d)),
    "seq_pack"          -> (Packing.seqPack _),
    "seq_chunks"        -> (Packing.seqChunks _),
    // tokenizer-aware packing: budgets count BPE symbols served from the
    // persisted merge table, not whitespace words
    "seq_pack_bpe"      -> (Packing.seqPackBpe _),
    "bloom_join"        -> (BloomJoin.bloomJoin _),
    // §2.7 [EXT] r12 curation extensions: PII scrub, weighted domain
    // mixing, and the exact suffix-array-family substring dedup
    "redact"            -> (Redact.redactQuery _),
    "domain_mix"        -> (DomainMix.domainMix _),
    "substring_dedup"   -> (SubstringDedup.substringDedup _),
    "substring_drop"    -> (SubstringDedup.substringDrop _),
    // E13's ARRIVAL MODE (the last dedup family to gain one): odd docs
    // arrive as the batch, their windows probing the even docs' persisted
    // digest index by membership + the in-batch count — exactly the batch
    // operator's spans restricted to the batch, without re-mining the
    // accumulated half
    "substring_dedup_incremental" ->
      (SubstringIncremental.substringDedupIncremental _),
    // the CUT half of the arrival mode: arriving docs are excised (not
    // just marked) against the accumulated digest index plus themselves —
    // the form a nightly pipeline actually consumes
    "substring_drop_incremental" ->
      (SubstringIncremental.substringDropIncremental _),
    // §2.7 [EXT] incremental dedup: batch vs persisted fingerprint index
    "dedup_incremental" -> (IncrementalDedup.dedupIncremental _),
    // the index's operational lifecycle certified end-to-end: build in
    // nightly appends → compact (crash-safe bucket swap) → retract (the
    // takedown path) → dedup a batch against the maintained index; the
    // oracle recomputes survivors from the parity/modulus rules alone
    "dedup_index_lifecycle" -> (IndexMaintenance.dedupIndexLifecycle _),
    // the takedown capstone: ONE journaled retraction across five
    // persisted family indexes at once (fp, MinHash bands+sets,
    // line-hash, substring digests, BM25) — write-ahead intent journal,
    // single commit marker, per-family bucket-pruned anti-join rewrites;
    // the oracle recomputes removed/survivor counts per family from the
    // parity/modulus rules and pins the in-query fresh-build parity
    "takedown" -> (Takedown.takedownQuery _),
    // the takedown capstone's VECTOR/MEDIA half (r19 verdict: these
    // families were spec-only): one journaled retraction across the
    // image-dHash, video slot-hash, text-embedding, and IVFADC indexes;
    // the oracle recomputes removed/survivor counts from the id parity
    // rules × fixed rows-per-id geometry and pins the in-query
    // frozen-model fresh-build parity
    "takedown_vectors" -> (Takedown.takedownVectorsQuery _),
    // §2.7 [EXT] incremental NEAR-dup: batch vs persisted band index (the
    // E14 arrival discipline for the MinHash family; exact-Jaccard verify
    // over the index's hashed shingle sets keeps the verdict oracle-exact)
    "dedup_minhash_incremental" -> (MinHashIncremental.dedupMinhashIncremental _),
    // §2.7 [EXT] CCNet-style unigram-LM quality scoring (en-slice model)
    "lm_score"          -> (LmScore.lmScore _),
    // §2.7 [EXT] the CCNet percentile cut: exact global rank via the
    // two-phase bucketed prefix sum (never a corpus-wide single sort)
    "ccnet_buckets"     -> ((s: SparkSession, d: String) => GlobalRank.ccnetBuckets(s, d)),
    // §2.7 [EXT] NB log-odds classifier (fastText-style quality filter,
    // weakly supervised by the heuristic gate; same scoring kernel)
    "nb_score"          -> (NbClassifier.nbScore _),
    // §2.7 [EXT] r12 second wave: semantic dedup (SemDeDup — k-means
    // shards the pair search), corpus-level line/paragraph dedup (CCNet
    // §4.2 / C4), and hashed-ngram importance selection (DSIR)
    "semdedup"          -> ((s: SparkSession, d: String) => SemDedup.semdedup(s, d)),
    "line_dedup"        -> (LineDedup.lineDedup _),
    "line_dedup_incremental" -> (LineDedup.lineDedupIncremental _),
    "dsir_select"       -> (Dsir.dsirSelect _),
    // §2.7 [EXT] BPE tokenizer: learn the merge table (one corpus pass +
    // bounded-vocabulary rounds), re-tokenize the corpus through it
    "bpe_train"         -> (Bpe.bpeTrain _),
    "bpe_encode"        -> (Bpe.bpeEncode _),
    // §2.7 [EXT] char-entropy quality signal (gibberish/noise detector)
    "char_entropy"      -> (TextOps.charEntropy _),
    // §2.7 [EXT] the Gopher rule battery as one conjunctive filter with
    // per-rule attribution booleans
    "gopher_rules"      -> (TextOps.gopherRulesQuery _),
    // §2.7 [EXT] the north-star pipeline composed end-to-end in ONE plan:
    // quality gate → exact dedup → train split → sequence packing
    "curation_pipeline" -> (Curation.curationPipeline _),
    // every optional stage live: redact + quality + dedup + split + mix +
    // pack as one plan (r12)
    "curation_full"     -> (Curation.curationFull _),
    // the macro in the E14 arrival mode: night 1 (even docs) curates into
    // fresh state, night 2 (odd docs) dedups against night 1's accepted
    // fingerprints and packs CONTINUING at night 1's train-token total —
    // the nightly shape of an accumulating corpus, seam-free by oracle
    "curation_incremental" ->
      (CurationIncremental.curationIncremental _),
    // the SAME two-night semantics driven through the persisted
    // exactly-once machinery (temp-dir state, committed batch=<id>
    // output dirs, atomic fp+cursor+batch-id commit, an injected
    // replay of chop 0 that must no-op) — the streaming arrival
    // driver's step, certified through the DuckDB gate
    "curation_stream" ->
      (CurationIncremental.curationStream _),
    // the EVERY-stage macro in the arrival mode: redact + quality + dedup
    // + split + domain-mix + pack across two nights, with the genuinely
    // new state — per-domain consumed-budget counters that carry across
    // nights (night 2 must stop filling a domain night 1 exhausted);
    // mix_start in the output pins the continuation exactly
    "curation_incremental_full" -> ((s: SparkSession, d: String) =>
      CurationIncremental.curationIncrementalFull(s, d)),
    // §2.4 [EXT] sketches, verified against exact results in-query
    "approx_distinct" -> ((s: SparkSession, d: String) =>
      Sketches.approxDistinctChecked(s, d)),
    "approx_quantile" -> ((s: SparkSession, d: String) =>
      Sketches.approxQuantileChecked(s, d)),
    "heavy_hitters" -> (HeavyHitters.heavyHittersChecked _),
    // SQL-string API surface (§3.1) — shares agg_basic's oracle shape
    "sql_agg"       -> (SqlSurface.sqlAgg _),
    "sql_subquery"  -> (SqlSurface.sqlSubquery _),
    // SimHash banding reported as per-document recall vs the in-query
    // brute-force Hamming baseline (the ann_topk verdict pattern): pair
    // identities aren't DuckDB-expressible (xxhash64 bit patterns), but the
    // document frame is — the oracle emits doc_id + TRUE, so a banding
    // recall regression turns the row red. Raw pair mining stays the
    // library API (SimHashDedup.nearDupPairs, covered by LlmOpsSpec).
    "dedup_simhash" -> ((s: SparkSession, d: String) =>
      SimHashDedup.bandingRecallCheck(Tables.documents(s, d).select("doc_id", "text"))),
  )

  /** Brute-force exact trigram-Jaccard ≥ 0.8 pairs — the shared oracle for
    * `dedup_minhash` (probabilistic LSH, recall 1.0 at this SF) and
    * `ngram_jaccard` (exact PPJoin prefix filter): identical output contract.
    * Split into CTE + SELECT so `dedup_clusters` can reuse the SAME edge
    * set inside its WITH RECURSIVE closure — Spark and DuckDB then resolve
    * components over identical pairs by construction.
    */
  private val jaccardShingleCte: String =
    """sh AS (
      |  SELECT doc_id, list_distinct([ toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
      |                                 FOR i IN range(1, len(toks) - 1) ]) AS shingles
      |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
      |  WHERE len(toks) >= 3
      |)""".stripMargin

  private val jaccardPairsSelect: String =
    """SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |       CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
      |         / len(list_distinct(list_concat(a.shingles, b.shingles))) AS jac
      |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
      |        / len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.8""".stripMargin

  private val exactJaccardPairsSql: String =
    s"WITH $jaccardShingleCte\n$jaccardPairsSelect\nORDER BY doc_a, doc_b"

  /** The winnowing k-gram hash chain, unrolled for DuckDB: identical
    * arithmetic to graft.plans.WinnowExpr.winnow (mod after every step;
    * the CAST makes DuckDB promote to BIGINT before `*257` can overflow
    * INT32). Base/modulus/k interpolate from the single source of truth. */
  private val winnowHashSql: String =
    (1 until TextOps.WinnowK).foldLeft("CAST(ascii(text[i:i]) AS BIGINT)") {
      (acc, j) =>
        s"(($acc) * ${graft.plans.WinnowExpr.Base} + ascii(text[i+$j:i+$j]))" +
          s" % ${graft.plans.WinnowExpr.Mod}"
    }

  /** The full winnowing recomputation as reusable CTEs (`m.fps` = each
    * document's sorted distinct fingerprint set): the per-position hash
    * chain, w-wide window minima (list slices clamp at the end exactly
    * like the kernel's min(i+w, nh) bound), distinct + sort. Shared by the
    * `doc_fingerprint` oracle (per-doc digests) and the `winnow_pairs`
    * oracle (postings join), so both gates pin the same kernel semantics. */
  private val winnowFpsCtes: String =
    s"""h AS (
       |  SELECT doc_id,
       |    [ $winnowHashSql
       |      FOR i IN range(1, length(text) - ${TextOps.WinnowK - 2}) ] AS hs
       |  FROM documents
       |), m AS (
       |  SELECT doc_id,
       |    list_sort(list_distinct(
       |      [ list_min(hs[i:i+${TextOps.WinnowW - 1}])
       |        FOR i IN range(1, greatest(2, len(hs) - ${TextOps.WinnowW - 2})) ])) AS fps
       |  FROM h
       |)""".stripMargin

  /** [[graft.operators.TextOps.quality]]'s score blend as DuckDB SQL over a
    * bare `text` column — shared by the `text_quality` oracle and the
    * composed `curation_pipeline` oracle (single source of truth for the
    * formula; every term is an exact-int division then IEEE double ops, so
    * it hash-matches the Spark side bitwise). */
  private val qualitySqlExpr: String =
    """0.4 * (CAST(len(list_filter(string_split(text, ' '), t -> t = 'a' OR t = 'the')) AS DOUBLE)
      |       / len(string_split(text, ' ')))
      |  + 0.4 * (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |           / len(string_split(text, ' ')))
      |  + 0.2 * (LEAST(CAST(length(text) - len(string_split(text, ' ')) + 1 AS DOUBLE)
      |                 / len(string_split(text, ' ')), 8.0) / 8.0)""".stripMargin

  /** The exact-substring-dedup recomputation as shared CTEs (`r` = every
    * duplicated window position with its merged-region id): L-token
    * windows, md5 digest grouping, duplicate marks, session-merge flags.
    * Shared by the `substring_dedup` oracle (region rows) and the
    * `substring_drop` oracle (cut text digests), so both gates pin the
    * same window/merge semantics. L interpolates from SubstringDedup. */
  private val substrRegionCtes: String =
    s"""t AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
       |  WHERE len(string_split(text, ' ')) >= ${SubstringDedup.SpanL}),
       |g AS (
       |  SELECT doc_id,
       |         unnest(range(1, len(toks) - ${SubstringDedup.SpanL - 2})) AS pos,
       |         toks
       |  FROM t),
       |k AS (
       |  SELECT doc_id, pos,
       |         md5(array_to_string(toks[pos:pos + ${SubstringDedup.SpanL - 1}], ' ')) AS gk
       |  FROM g),
       |d AS (
       |  SELECT doc_id, pos FROM k
       |  WHERE gk IN (SELECT gk FROM k GROUP BY gk HAVING COUNT(*) >= 2)),
       |s AS (
       |  SELECT doc_id, pos,
       |    CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
       |           OR pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
       |              > ${SubstringDedup.SpanL}
       |         THEN 1 ELSE 0 END AS brk
       |  FROM d),
       |r AS (
       |  SELECT doc_id, pos,
       |    SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS region
       |  FROM s)""".stripMargin

  /** CCNet unigram-LM scoring CTEs (train the en-slice model, score every
    * document to integer micro-log10 sums — see LmScore's exactness
    * contract). Shared by the `lm_score` oracle (raw scores) and the
    * `ccnet_buckets` oracle (scores → global rank → terciles), so both
    * gates pin the same model/scoring semantics. */
  private val lmScoreCtes: String =
    s"""cnt AS (
       |  SELECT t, COUNT(*) AS c FROM (
       |    SELECT unnest(string_split(text, ' ')) AS t
       |    FROM documents WHERE lang = 'en')
       |  GROUP BY t),
       |vocab AS (
       |  SELECT t, c, ROW_NUMBER() OVER (ORDER BY c DESC, t) AS rk FROM cnt),
       |model AS (SELECT t, c FROM vocab WHERE rk <= ${LmScore.VocabK}),
       |s AS (
       |  SELECT (SELECT SUM(c) FROM cnt) AS n,
       |         (SELECT COUNT(*) FROM model) AS v),
       |lp AS (
       |  SELECT m.t,
       |    CAST(ROUND(log10(CAST(m.c + 1 AS DOUBLE)
       |      / CAST(s.n + s.v + 1 AS DOUBLE)) * ${LmScore.Micro}, 0) AS BIGINT) AS lp
       |  FROM model m CROSS JOIN s),
       |oov AS (
       |  SELECT CAST(ROUND(log10(1.0 / CAST(n + v + 1 AS DOUBLE))
       |    * ${LmScore.Micro}, 0) AS BIGINT) AS lp FROM s),
       |tok AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
       |docsum AS (
       |  SELECT tok.doc_id, SUM(COALESCE(lp.lp, (SELECT lp FROM oov))) AS lpsum,
       |         COUNT(*) AS n_tok
       |  FROM tok LEFT JOIN lp ON tok.t = lp.t
       |  GROUP BY tok.doc_id)""".stripMargin

  /** Line-restructuring CTEs (chunk lines + planted boilerplate → one
    * (doc_id, idx, line) row per line — the [[graft.operators.LineDedup
    * .toLines]] recomputation). Shared by the `line_dedup` oracle
    * (corpus-wide keep-first) and the `line_dedup_incremental` oracle
    * (parity-split index + batch), so both gates pin the same
    * restructuring. */
  private val lineBuildCtes: String =
    s"""lt AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |built AS (
       |  SELECT doc_id,
       |    list_concat(list_concat(
       |      [ array_to_string(toks[i:i+${LineDedup.LineLen - 1}], ' ')
       |        FOR i IN range(1, len(toks) + 1, ${LineDedup.LineLen}) ],
       |      CASE WHEN doc_id % ${LineDedup.Boiler1Mod} = 0
       |           THEN ['${LineDedup.Boiler1}'] ELSE CAST([] AS VARCHAR[]) END),
       |      CASE WHEN doc_id % ${LineDedup.Boiler2Mod} = 0
       |           THEN ['${LineDedup.Boiler2}'] ELSE CAST([] AS VARCHAR[]) END) AS lines
       |  FROM lt),
       |ll AS (SELECT doc_id, unnest(range(1, len(lines) + 1)) AS idx, lines FROM built),
       |lx AS (SELECT doc_id, idx, lines[idx] AS line FROM ll)""".stripMargin

  /** BPE training CTEs, GENERATED round by round — the oracle unrolls the
    * same [[graft.operators.Bpe]] algorithm (word counts → seq-strings →
    * R × (pair counts, argmax, merge-replace)) as chained CTEs, so the
    * generator loop IS the specification both engines implement. Shared
    * by `bpe_train` (the merge table) and `bpe_encode` (re-tokenization
    * through the same merges). */
  private def bpeTrainCtes: Seq[String] = {
    val base = Seq(
      """wc AS (SELECT w, COUNT(*) AS c FROM (
        |  SELECT unnest(string_split(text, ' ')) AS w FROM documents) GROUP BY w)""".stripMargin,
      """s0 AS (SELECT w, c,
        |  ' ' || array_to_string(list_transform(range(1, len(w) + 1),
        |    i -> substr(w, i, 1)), '  ') || ' ' AS seq FROM wc)""".stripMargin)
    base ++ (1 to Bpe.Merges).flatMap { r =>
      Seq(
        s"""p$r AS (
           |  SELECT pr.l AS l, pr.r AS r, CAST(SUM(c) AS BIGINT) AS cnt
           |  FROM (SELECT c, unnest(list_transform(range(1, len(syms)),
           |          i -> {'l': syms[i], 'r': syms[i+1]})) AS pr
           |        FROM (SELECT c, string_split(trim(seq), '  ') AS syms FROM s${r - 1}))
           |  GROUP BY pr.l, pr.r)""".stripMargin,
        s"""b$r AS (
           |  SELECT l, r, cnt FROM (
           |    SELECT l, r, cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, l, r) AS rn FROM p$r)
           |  WHERE rn = 1)""".stripMargin,
        s"""s$r AS (
           |  SELECT w, c, replace(seq, ' ' || b.l || '  ' || b.r || ' ',
           |    ' ' || b.l || b.r || ' ') AS seq
           |  FROM s${r - 1} CROSS JOIN b$r b)""".stripMargin)
    }
  }

  /** BPE document-encoding CTEs: every document as one boundary-joined
    * seq-string, pushed through the learned merges in training order.
    * Ends at `enc${Bpe.Merges}`, whose n_sym expression both `bpe_encode`
    * and `seq_pack_bpe` consume. */
  private def bpeEncodeCtes: Seq[String] = {
    val enc0 =
      s"""enc0 AS (SELECT doc_id,
         |  CAST(len(string_split(text, ' ')) AS INT) AS n_ws,
         |  CAST(len(text) AS INT) AS n_chars,
         |  ' ' || array_to_string(list_transform(string_split(text, ' '), t ->
         |      array_to_string(list_transform(range(1, len(t) + 1),
         |        i -> substr(t, i, 1)), '  ')), '  ${Bpe.Boundary}  ') || ' ' AS seq
         |  FROM documents)""".stripMargin
    val encs = (1 to Bpe.Merges).map(r =>
      s"""enc$r AS (SELECT doc_id, n_ws, n_chars,
         |  replace(seq, ' ' || b.l || '  ' || b.r || ' ',
         |    ' ' || b.l || b.r || ' ') AS seq
         |  FROM enc${r - 1} CROSS JOIN b$r b)""".stripMargin)
    bpeTrainCtes ++ (enc0 +: encs)
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  /** The full-recompute BM25 ranking in DuckDB — one source of truth
    * gating BOTH the scan form (`bm25_topk`) and the served form
    * (`bm25_serve`): the served form must reproduce it from the
    * persisted index alone. */
  /** Full-recompute BM25 top-10 for an arbitrary fixed term set — the
    * single source of truth for all three bm25 oracles (`bm25_topk`,
    * `bm25_serve`, and per-qid for `bm25_serve_batch`); the term-score
    * association order comes from [[graft.operators.Ranking
    * .termScoreSql]], mirroring the Spark side exactly. */
  private def bm25RecomputeSql(terms: Seq[String]): String =
    s"""WITH t AS (
       |  SELECT doc_id, len(toks) AS dl,
       |${terms.map(t =>
           s"    len(list_filter(toks, x -> x = '$t')) AS tf_$t").mkString(",\n")}
       |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
       |), s AS (
       |  SELECT COUNT(*) AS n, CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl,
       |${terms.map(t =>
           s"    SUM(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS df_$t").mkString(",\n")}
       |  FROM t
       |), sc AS (
       |  SELECT doc_id,
       |    ROUND(${terms.map(Ranking.termScoreSql).mkString("\n      + ")}, 6) AS score
       |  FROM t, s
       |)
       |SELECT ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank, doc_id, score
       |FROM sc ORDER BY score DESC, doc_id LIMIT 10""".stripMargin

  private def bm25OracleSql: String = bm25RecomputeSql(Ranking.QueryTerms)

  /** The batch-serving oracle: each query's own full recompute, stamped
    * with its qid and unioned — certifying that the ONE pruned-read batch
    * plan answers every query exactly as a dedicated scan would. */
  private def bm25BatchOracleSql: String =
    s"""SELECT * FROM (
       |${Ranking.BatchQueries.map { case (q, ts) =>
           s"SELECT '$q' AS qid, * FROM (\n${bm25RecomputeSql(ts)}\n)" }
          .mkString("\nUNION ALL\n")}
       |) ORDER BY qid, rank""".stripMargin

  // the two-night arrival-mode recompute shared by `curation_incremental`
  // (frames-as-index form) and `curation_stream` (the persisted
  // exactly-once driver, which must land the identical rows through
  // committed batch directories and a replay no-op)
  private val curationIncrementalSql: String =
    s"""WITH scored AS (
         |  SELECT doc_id, text, $qualitySqlExpr AS quality FROM documents),
         |f AS (
         |  SELECT doc_id, quality,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         |    md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp
         |  FROM scored WHERE quality >= 0.35),
         |acc1 AS (
         |  SELECT * FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
         |    FROM f WHERE doc_id % 2 = 0) WHERE rn = 1),
         |train1 AS (
         |  SELECT doc_id, quality, n_tok FROM acc1
         |  WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '${Sampling.TrainUpper}'),
         |c1 AS (
         |  SELECT doc_id, quality, n_tok,
         |    CAST(SUM(n_tok) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok
         |      AS BIGINT) AS start_tok
         |  FROM train1),
         |t1 AS (SELECT COALESCE(SUM(n_tok), 0) AS tot FROM train1),
         |acc2 AS (
         |  SELECT * FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
         |    FROM f WHERE doc_id % 2 = 1)
         |  WHERE rn = 1 AND fp NOT IN (SELECT fp FROM acc1)),
         |train2 AS (
         |  SELECT doc_id, quality, n_tok FROM acc2
         |  WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '${Sampling.TrainUpper}'),
         |c2 AS (
         |  SELECT doc_id, quality, n_tok,
         |    CAST(SUM(n_tok) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok
         |      + (SELECT tot FROM t1) AS BIGINT) AS start_tok
         |  FROM train2)
         |SELECT * FROM (
         |  SELECT 1 AS batch, doc_id, quality, n_tok, start_tok,
         |         start_tok // ${Packing.SeqBudget} AS seq_id FROM c1
         |  UNION ALL
         |  SELECT 2 AS batch, doc_id, quality, n_tok, start_tok,
         |         start_tok // ${Packing.SeqBudget} AS seq_id FROM c2
         |) ORDER BY start_tok""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "session_count" ->
      """WITH s AS (
        |  SELECT ts, event_id,
        |    CASE WHEN LAG(ts) OVER (ORDER BY ts, event_id) IS NULL
        |           OR ts - LAG(ts) OVER (ORDER BY ts, event_id) > INTERVAL 5 SECOND
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events
        |), g AS (
        |  SELECT ts, SUM(brk) OVER (ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM s
        |)
        |SELECT MIN(ts) AS window_start, MAX(ts) + INTERVAL 5 SECOND AS window_end,
        |       CAST(COUNT(*) AS BIGINT) AS total
        |FROM g GROUP BY sid ORDER BY window_start""".stripMargin,
    "session_user" ->
      """WITH s AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |           OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) > INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events
        |), g AS (
        |  SELECT user_id, ts, event_id,
        |         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM s
        |)
        |SELECT user_id, MIN(ts) AS window_start, MAX(ts) + INTERVAL 30 MINUTE AS window_end,
        |       CAST(COUNT(*) AS BIGINT) AS n_events, CAST(SUM(event_id) AS BIGINT) AS id_sum
        |FROM g GROUP BY user_id, sid ORDER BY user_id, window_start""".stripMargin,
    "tumble_sum" ->
      """SELECT ws AS window_start, ws + INTERVAL 10 SECOND AS window_end,
        |       CAST(SUM(event_id) AS BIGINT) AS id_sum, CAST(COUNT(*) AS BIGINT) AS n
        |FROM (SELECT make_timestamp((epoch_ms(ts) // 10000) * 10000 * 1000) AS ws, event_id FROM events)
        |GROUP BY ws ORDER BY ws""".stripMargin,
    "slide_agg" ->
      """SELECT event_type, ws AS window_start, ws + INTERVAL 1 HOUR AS window_end,
        |       CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(event_id) AS BIGINT) AS id_sum
        |FROM (
        |  SELECT event_type, event_id,
        |         make_timestamp(((epoch_ms(ts) // 900000) - k) * 900000 * 1000) AS ws
        |  FROM events, (SELECT UNNEST(range(4)) AS k)
        |)
        |GROUP BY event_type, ws ORDER BY event_type, ws""".stripMargin,
    "filter_scan" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_shipdate
        |FROM lineitem
        |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1997-12-31 00:00:00'
        |  AND l_quantity > 45 AND l_returnflag IN ('R', 'A')
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "agg_basic" ->
      """SELECT l_returnflag, l_linestatus,
        |       SUM(l_quantity) AS sum_qty,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |       SUM(l_quantity) / COUNT(*) AS avg_qty,
        |       COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "agg_distinct" ->
      """SELECT l_returnflag,
        |       COUNT(DISTINCT l_suppkey) AS n_supp,
        |       COUNT(DISTINCT l_partkey) AS n_part,
        |       COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "join_inner" ->
      """SELECT o_orderkey, c_name, c_mktsegment, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,
    "join_outer" ->
      """SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
        |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        |GROUP BY c_custkey, c_name ORDER BY c_custkey""".stripMargin,
    "join_semi" ->
      """SELECT c_custkey, c_name, 'semi' AS how FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderstatus = 'F' AND o_totalprice > 200000)
        |UNION ALL
        |SELECT c_custkey, c_name, 'anti' AS how FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY how, c_custkey""".stripMargin,
    "join_star" ->
      """SELECT r_name, n_name,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |       COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    // bucketing is a LAYOUT choice, never a semantics choice: the oracle
    // recomputes the same aggregate from the RAW parquet with a plain
    // join — row equality certifies the bucketed copies are faithful and
    // the exchange-free plan loses nothing
    "bucket_join" ->
      """SELECT o_orderpriority, COUNT(*) AS n_items,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // TPC-H Q3 shape — the macro multi-operator key: filter + 3-way join +
    // per-order aggregation + top-10. Grouping by o_orderkey makes the
    // oracle's GROUP BY equal Spark's pre-join per-order aggregate exactly.
    "star_topk" ->
      """SELECT o_orderkey,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |       COUNT(*) AS n_items, o_orderdate, o_orderpriority
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
        |GROUP BY o_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,
    // Q18 macro: quantities sum as DECIMAL on both engines (exact, so the
    // HAVING cut and the output hash bitwise); threshold interpolates from
    // Relational (single source of truth)
    "large_order" ->
      s"""WITH po AS (
         |  SELECT l_orderkey,
         |         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty,
         |         COUNT(*) AS n_items
         |  FROM lineitem GROUP BY l_orderkey
         |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > ${Relational.LargeOrderQty}
         |)
         |SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty, n_items
         |FROM po
         |JOIN orders   ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "topk" ->
      """SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue, COUNT(*) AS n_orders
        |FROM orders GROUP BY o_custkey
        |ORDER BY revenue DESC, o_custkey LIMIT 10""".stripMargin,
    "set_ops" ->
      """WITH f AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'),
        |     b AS (SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING')
        |SELECT k, 'union' AS op FROM (SELECT k FROM f UNION SELECT k FROM b)
        |UNION ALL
        |SELECT k, 'intersect' AS op FROM (SELECT k FROM f INTERSECT SELECT k FROM b)
        |UNION ALL
        |SELECT k, 'except' AS op FROM (SELECT k FROM f EXCEPT SELECT k FROM b)
        |ORDER BY op, k""".stripMargin,
    "rollup_agg" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS flag, COALESCE(l_linestatus, 'ALL') AS status,
        |       COUNT(*) AS n, SUM(l_quantity) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY flag, status""".stripMargin,
    "cube_agg" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS flag, COALESCE(l_linestatus, 'ALL') AS status,
        |       COUNT(*) AS n, CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY flag, status""".stripMargin,
    "grouping_sets" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS flag, COALESCE(l_linestatus, 'ALL') AS status,
        |       COUNT(*) AS n, SUM(l_quantity) AS sum_qty
        |FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        |ORDER BY flag, status""".stripMargin,
    "part_supplier" ->
      """SELECT p_brand, n_name,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |       COUNT(*) AS n_items
        |FROM lineitem
        |JOIN part     ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |WHERE p_size <= 25
        |GROUP BY p_brand, n_name ORDER BY p_brand, n_name""".stripMargin,
    "skew_agg" ->
      """SELECT event_type, COUNT(*) AS n, CAST(SUM(event_id) AS BIGINT) AS s
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "win_rank" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice, prev_price, run_spend FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn,
        |    LAG(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS prev_price,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |      PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_spend
        |  FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "pivot_agg" ->
      """SELECT YEAR(o_orderdate) AS yr,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS "F",
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS "O",
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE o_orderstatus = 'P') AS DOUBLE) AS "P"
        |FROM orders GROUP BY YEAR(o_orderdate) ORDER BY yr""".stripMargin,
    "sql_subquery" ->
      """SELECT c_custkey, c_name,
        |       (SELECT MAX(o_totalprice) FROM orders WHERE o_custkey = c_custkey) AS max_price,
        |       (SELECT COUNT(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "dedup" ->
      """SELECT user_id, event_type, event_id, ts FROM (
        |  SELECT user_id, event_type, event_id, ts,
        |    ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
        |  FROM events)
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,
    "asof_join" ->
      """SELECT c.user_id, c.ts, c.event_id, v.vts AS view_ts, v.vid AS view_event_id
        |FROM (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click') c
        |ASOF JOIN (SELECT user_id AS vuid, ts AS vts, event_id AS vid
        |           FROM events WHERE event_type = 'view') v
        |  ON c.user_id = v.vuid AND v.vts <= c.ts
        |ORDER BY c.user_id, c.ts, c.event_id""".stripMargin,
    "range_join" ->
      """SELECT e.user_id, e.ts AS err_ts, e.event_id AS err_id,
        |       c.ts AS click_ts, c.event_id AS click_id
        |FROM (SELECT user_id, ts, event_id FROM events WHERE event_type = 'error') e
        |JOIN (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click') c
        |  ON e.user_id = c.user_id
        | AND c.ts BETWEEN e.ts - INTERVAL 4 HOUR AND e.ts + INTERVAL 4 HOUR
        |ORDER BY e.user_id, err_ts, click_ts""".stripMargin,
    "scalar_funcs" ->
      """SELECT o_orderkey,
        |  LOWER(o_orderpriority) AS prio_lower,
        |  SUBSTRING(o_orderpriority, 1, 3) AS prio3,
        |  o_orderstatus || '-' || o_orderpriority AS status_prio,
        |  YEAR(o_orderdate) AS yr, MONTH(o_orderdate) AS mo,
        |  CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS mon_start,
        |  CAST(FLOOR(o_totalprice) AS BIGINT) AS price_floor,
        |  ABS(o_custkey - 750) AS key_dist,
        |  CASE WHEN o_totalprice > 300000 THEN 'high'
        |       WHEN o_totalprice > 150000 THEN 'mid'
        |       ELSE 'low' END AS bucket,
        |  COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_co
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "agg_collect" ->
      """SELECT l_returnflag,
        |       array_to_string(list_sort(list(DISTINCT l_linestatus)), ' ') AS statuses,
        |       array_to_string(list_sort(list(DISTINCT YEAR(l_shipdate))), ' ') AS ship_years
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "json_funcs" ->
      """SELECT CAST(props->>'k' AS BIGINT) AS k, COUNT(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS val_sum,
        |       COUNT(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1 ORDER BY 1 NULLS FIRST""".stripMargin,
    "seq_source" ->
      """SELECT range % 97 AS bucket, COUNT(*) AS n, CAST(SUM(range) AS BIGINT) AS id_sum,
        |       MIN(range) AS id_min, MAX(range) AS id_max
        |FROM range(0, 1000000) GROUP BY bucket ORDER BY bucket""".stripMargin,
    "pojo_scan" ->
      """SELECT COUNT(*) AS n, CAST(SUM(c_custkey) AS BIGINT) AS id_sum,
        |       MIN(c_custkey) AS id_min, MAX(c_custkey) AS id_max
        |FROM customer WHERE c_custkey % 7 = 0""".stripMargin,
    "json_scan" ->
      """SELECT my_field3, COUNT(*) AS n, CAST(SUM(my_field1) AS BIGINT) AS f1_sum,
        |       CAST(SUM(my_field2) AS BIGINT) AS f2_sum
        |FROM read_json('/root/repo/target/fixtures/input_big.json.gz',
        |               format='newline_delimited',
        |               columns={my_field1: 'BIGINT', my_field2: 'INTEGER', my_field3: 'VARCHAR'})
        |GROUP BY my_field3 ORDER BY my_field3""".stripMargin,
    "zip_scan" ->
      """SELECT my_field3, COUNT(*) AS n, CAST(SUM(my_field1) AS BIGINT) AS f1_sum,
        |       CAST(SUM(my_field2) AS BIGINT) AS f2_sum
        |FROM read_json('/root/repo/target/fixtures/input_zip.json',
        |               format='newline_delimited',
        |               columns={my_field1: 'BIGINT', my_field2: 'INTEGER', my_field3: 'VARCHAR'})
        |GROUP BY my_field3 ORDER BY my_field3""".stripMargin,
    "file_sink" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
        |FROM orders WHERE o_orderstatus = 'F' ORDER BY o_orderkey""".stripMargin,
    "topk_perkey" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    // sketch/ANN verdict rows: the oracle computes what IS SQL-expressible
    // (exact distinct counts / exact top-k size) and literal TRUE for the
    // accuracy verdicts the Spark side computes against its own exact
    // baselines — a regression in the estimator/index turns the row red
    "approx_distinct" ->
      """SELECT l_returnflag,
        |       COUNT(DISTINCT l_suppkey) AS exact_supp,
        |       COUNT(DISTINCT l_partkey) AS exact_part,
        |       COUNT(*) AS n, TRUE AS supp_ok, TRUE AS part_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // k and the query-vector predicate interpolate from Similarity's
    // constants — the single source of truth the Spark side uses, so the
    // oracle cannot drift from what the queries compute
    "ann_topk" ->
      s"""SELECT vec_id AS q_id, CAST(${Similarity.DefaultK} AS BIGINT) AS n_exact, TRUE AS recall_ok
         |FROM embeddings WHERE vec_id < ${Similarity.NumQueryVecs} ORDER BY q_id""".stripMargin,
    // same verdict pattern for the PQ pipeline: TRUE = "the ADC shortlist
    // + exact rerank recovered ≥ minRecall of the exact top-k"
    "pq_topk" ->
      s"""SELECT vec_id AS q_id, CAST(${Similarity.DefaultK} AS BIGINT) AS n_exact, TRUE AS recall_ok
         |FROM embeddings WHERE vec_id < ${Similarity.NumQueryVecs} ORDER BY q_id""".stripMargin,
    // and for the composed IVFADC serving path (persisted index → probe →
    // ADC → rerank): TRUE = "both approximation layers together still
    // recovered ≥ minRecall of the exact top-k"
    "ivfpq_topk" ->
      s"""SELECT vec_id AS q_id, CAST(${Similarity.DefaultK} AS BIGINT) AS n_exact, TRUE AS recall_ok
         |FROM embeddings WHERE vec_id < ${Similarity.NumQueryVecs} ORDER BY q_id""".stripMargin,
    // and for the appended-index arrival mode: TRUE = "an index built on
    // the evens and APPENDED with the odds (no retrain) still recovered
    // >= minRecall of the exact top-k over the full corpus"
    "ivfpq_append" ->
      s"""SELECT vec_id AS q_id, CAST(${Similarity.DefaultK} AS BIGINT) AS n_exact, TRUE AS recall_ok
         |FROM embeddings WHERE vec_id < ${Similarity.NumQueryVecs} ORDER BY q_id""".stripMargin,
    // pair identities are xxhash64-derived (not DuckDB-expressible); the
    // per-document verdict frame is — literal TRUE = "banding missed no
    // brute-force Hamming pair touching this doc"
    "dedup_simhash" ->
      """SELECT doc_id, TRUE AS recall_ok FROM documents ORDER BY doc_id""",
    // id frame = originals + the deterministically planted copies (plant
    // constants interpolate from Similarity — single source of truth);
    // TRUE = LSH found every brute-force cosine pair touching this vector
    "embed_dedup" ->
      s"""SELECT vec_id, TRUE AS recall_ok FROM (
         |  SELECT vec_id FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + ${Similarity.PlantIdOffset} FROM embeddings
         |  WHERE vec_id < ${Similarity.PlantCount})
         |ORDER BY vec_id""".stripMargin,
    // the language-ID heuristic is deterministic column arithmetic, so the
    // oracle RECOMPUTES it: marker-token fraction per language, argmax with
    // the same lexicographically-largest-lang tie-break Spark's
    // greatest(struct(score, lang)) applies ('fr' > 'es' > 'en' > 'de')
    "lang_id" ->
      """WITH s AS (
        |  SELECT doc_id, lang,
        |    CAST(len(list_filter(string_split(lower(text), ' '),
        |      t -> t = 'der' OR t = 'die' OR t = 'und' OR t = 'ist' OR t = 'das')) AS DOUBLE)
        |      / len(string_split(lower(text), ' ')) AS s_de,
        |    CAST(len(list_filter(string_split(lower(text), ' '),
        |      t -> t = 'the' OR t = 'and' OR t = 'of' OR t = 'to' OR t = 'is')) AS DOUBLE)
        |      / len(string_split(lower(text), ' ')) AS s_en,
        |    CAST(len(list_filter(string_split(lower(text), ' '),
        |      t -> t = 'el' OR t = 'la' OR t = 'y' OR t = 'es' OR t = 'los')) AS DOUBLE)
        |      / len(string_split(lower(text), ' ')) AS s_es,
        |    CAST(len(list_filter(string_split(lower(text), ' '),
        |      t -> t = 'le' OR t = 'la' OR t = 'et' OR t = 'est' OR t = 'les')) AS DOUBLE)
        |      / len(string_split(lower(text), ' ')) AS s_fr
        |  FROM documents
        |)
        |SELECT doc_id, lang,
        |  -- NULL text => NULL scores: Spark's when(null > 0).otherwise
        |  -- yields 'und', so the NULL branch must precede the ELSE 'de'
        |  CASE WHEN greatest(s_de, s_en, s_es, s_fr) IS NULL THEN 'und'
        |       WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
        |       WHEN s_fr = greatest(s_de, s_en, s_es, s_fr) THEN 'fr'
        |       WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
        |       WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
        |       ELSE 'de' END AS pred_lang
        |FROM s ORDER BY doc_id""".stripMargin,
    // quantile-sketch verdict row: portable columns (count/min/max raw) +
    // literal TRUE for the within-1%-of-exact booleans Spark computes
    // against its own exact percentile; probe points interpolate from
    // Sketches.QuantilePs (single source of truth)
    "approx_quantile" ->
      s"""SELECT p, n, lo, hi, TRUE AS q_ok
         |FROM (SELECT UNNEST([${Sketches.QuantilePs.map(p => s"CAST($p AS DOUBLE)").mkString(", ")}]) AS p),
         |     (SELECT COUNT(*) AS n, MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi FROM orders)
         |ORDER BY p""".stripMargin,
    // Misra-Gries verdict rows: the oracle recomputes the guaranteed-heavy
    // set (exact count · k > n — pure integer arithmetic, no division) and
    // emits literal TRUE for the survival/bound booleans Spark certifies
    // against its own exact counts; k values interpolate from
    // HeavyHitters.CheckedKs (single source of truth)
    "heavy_hitters" ->
      s"""WITH exact AS (SELECT lang AS key, COUNT(*) AS exact_cnt
         |              FROM documents GROUP BY 1),
         |     tot AS (SELECT CAST(SUM(exact_cnt) AS BIGINT) AS n FROM exact),
         |     ks AS (SELECT UNNEST([${HeavyHitters.CheckedKs.mkString(", ")}]) AS k)
         |SELECT k, key, exact_cnt, n, TRUE AS survived_ok, TRUE AS bound_ok
         |FROM ks, exact, tot
         |WHERE exact_cnt * k > n
         |ORDER BY k, key""".stripMargin,
    "media_stats" ->
      s"""SELECT meta.modality AS modality, COUNT(*) AS n,
         |       AVG(meta.width) AS avg_width, MAX(meta.durationMs) AS max_duration_ms
         |FROM read_parquet('${Multimodal.fixturePath}/*.parquet')
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "payload_dedup" ->
      s"""SELECT media_id, modality, n_bytes FROM (
         |  SELECT media_id, meta.modality AS modality,
         |         CAST(octet_length(payload) AS INT) AS n_bytes,
         |         ROW_NUMBER() OVER (PARTITION BY payload ORDER BY media_id) AS rn
         |  FROM read_parquet('${Multimodal.fixturePath}/*.parquet'))
         |WHERE rn = 1 ORDER BY media_id""".stripMargin,
    // Spark decodes PIXELS from the payload bytes (full PNG inflate +
    // unfilter), dHashes them, and recovers the near-dup structure via
    // banded Hamming LSH; the oracle answers from the fixture's PLANTED
    // twin_of ground-truth column, which the Spark plan never reads —
    // equality certifies the whole perceptual pipeline: decode across all
    // five filter types, hash invariance under re-encoding, the Hamming
    // tolerance catching every perturbed twin, and zero false pairs
    // among the distinct base images.
    "media_phash" ->
      s"""SELECT media_id, twin_of AS dup_of, twin_of IS NULL AS keep
         |FROM read_parquet('${ImagePhash.fixturePath}/*.parquet')
         |ORDER BY media_id""".stripMargin,
    // the arrival mode over the same planted fixture: the batch is the
    // odd bases + ALL twins; every twin dies (cross-index if its base is
    // even — in the index — else in-batch keep-first against its base
    // arriving in the same batch), so the survivors are exactly the odd
    // bases. The oracle answers from kind/parity metadata the Spark plan
    // never reads; Spark must reach the same set from payload bytes via
    // the banded probe + exact-Hamming verify against the index frames.
    "media_phash_incremental" ->
      s"""SELECT media_id
         |FROM read_parquet('${ImagePhash.fixturePath}/*.parquet')
         |WHERE kind = 'base' AND media_id % 2 = 1
         |ORDER BY media_id""".stripMargin,
    // the video fixture under the same parity harness: all four twin
    // families (requal / half-frame-rate / brightness / MP4) must die —
    // cross-index or in-batch by their base's parity — leaving exactly
    // the odd base videos
    "video_phash_incremental" ->
      s"""SELECT media_id
         |FROM read_parquet('${VideoPhash.videoFixturePath}/*.parquet')
         |WHERE kind = 'base' AND media_id % 2 = 1
         |ORDER BY media_id""".stripMargin,
    // same certification shape for the lossy half: Spark decodes baseline
    // JPEG (and cross-format PNG) payloads to pixels and recovers the
    // near-dup structure; the oracle answers from the planted twin_of —
    // equality certifies Huffman/IDCT/YCbCr/restart decode, dHash
    // stability under real quantization error at two qualities, the
    // PNG↔JPEG cross-format match, the grayscale 1-component path, and
    // zero false pairs among the distinct bases
    "media_phash_jpeg" ->
      s"""SELECT media_id, twin_of AS dup_of, twin_of IS NULL AS keep
         |FROM read_parquet('${ImagePhash.jpegFixturePath}/*.parquet')
         |ORDER BY media_id""".stripMargin,
    // the embedding pathway must recover the SAME planted structure from
    // the same bytes through a different feature space (spectral AC
    // descriptor + cosine, not gradient-sign Hamming) — two independent
    // witnesses to the one pixel decode
    "media_embed" ->
      s"""SELECT media_id, twin_of AS dup_of, twin_of IS NULL AS keep
         |FROM read_parquet('${ImagePhash.jpegFixturePath}/*.parquet')
         |ORDER BY media_id""".stripMargin,
    // the serving composition: every planted twin, served as a query
    // against the persisted IVFADC index of the 400 bases, must come
    // back with its own base as top-1 — the oracle answers from the
    // planted twin_of; row equality certifies probe + ADC + rerank
    // end-to-end over the image-embedding column
    "media_ann" ->
      s"""SELECT media_id, twin_of AS found_base
         |FROM read_parquet('${ImagePhash.jpegFixturePath}/*.parquet')
         |WHERE twin_of IS NOT NULL
         |ORDER BY media_id""".stripMargin,
    // the TEXT modality's embedding pathway: the hashed n-gram projection
    // must recover the planted paraphrase structure (swap / clause-rotate
    // / drop twins) from the text alone, with zero false pairs among 400
    // independently drawn documents — the oracle answers from the planted
    // twin_of metadata the Spark plan never reads
    "text_embed" ->
      s"""SELECT doc_id, twin_of AS dup_of, twin_of IS NULL AS keep
         |FROM read_parquet('${TextEmbed.textFixturePath}/*.parquet')
         |ORDER BY doc_id""".stripMargin,
    // the text arrival mode: survivors must be exactly the odd bases —
    // twins of even bases die against the index, twins of odd bases die
    // in-batch against their lower-id base; the oracle answers from the
    // planted kind/parity metadata the Spark plan never reads
    "text_embed_incremental" ->
      s"""SELECT doc_id
         |FROM read_parquet('${TextEmbed.textFixturePath}/*.parquet')
         |WHERE kind = 'base' AND doc_id % 2 = 1
         |ORDER BY doc_id""".stripMargin,
    // text serving: every paraphrase twin, served against the persisted
    // IVFADC index of the 400 base documents, must come back with its own
    // base as top-1 — the media_ann certification shape on text
    "text_ann" ->
      s"""SELECT doc_id, twin_of AS found_base
         |FROM read_parquet('${TextEmbed.textFixturePath}/*.parquet')
         |WHERE twin_of IS NOT NULL
         |ORDER BY doc_id""".stripMargin,
    // audio: Spark decodes RIFF/WAVE PCM payloads (two sample RATES —
    // the resample twins carry 4 kHz streams), Goertzel-fingerprints
    // them, and recovers the near-dup structure; the oracle answers from
    // the planted twin_of — equality certifies the chunk-walk parse,
    // fingerprint invariance under gain/dither/resampling, and zero
    // false pairs among the distinct clips
    "audio_phash" ->
      s"""SELECT media_id, twin_of AS dup_of, twin_of IS NULL AS keep
         |FROM read_parquet('${AudioPhash.audioFixturePath}/*.parquet')
         |ORDER BY media_id""".stripMargin,
    // the embedding pathway must recover the SAME planted audio structure
    // from the same bytes through a different feature space (mean-centered
    // log-spectral profile + cosine, not adjacent-band signs + Hamming) —
    // two independent witnesses to the one WAV decode; measured margins:
    // twin min cosine 0.99996 vs distinct max 0.7195 around the 0.985 floor
    "audio_embed" ->
      s"""SELECT media_id, twin_of AS dup_of, twin_of IS NULL AS keep
         |FROM read_parquet('${AudioPhash.audioFixturePath}/*.parquet')
         |ORDER BY media_id""".stripMargin,
    // the serving composition for audio: every planted twin, served as a
    // query against the persisted IVFADC index of the 400 base clips,
    // must come back with its own base as top-1 — row equality certifies
    // probe + ADC + rerank end-to-end over the audio-embedding column
    "audio_ann" ->
      s"""SELECT media_id, twin_of AS found_base
         |FROM read_parquet('${AudioPhash.audioFixturePath}/*.parquet')
         |WHERE twin_of IS NOT NULL
         |ORDER BY media_id""".stripMargin,
    // the audio fixture under the parity harness: every twin dies —
    // cross-index if its base is even (in the index), in-batch keep-first
    // if odd (its base arrives in the same batch with a lower id) —
    // leaving exactly the odd base clips. The oracle answers from
    // kind/parity metadata; Spark must reach the same 200 ids from WAV
    // bytes via Goertzel fingerprints and the banded index probe.
    "audio_phash_incremental" ->
      s"""SELECT media_id
         |FROM read_parquet('${AudioPhash.audioFixturePath}/*.parquet')
         |WHERE kind = 'base' AND media_id % 2 = 1
         |ORDER BY media_id""".stripMargin,
    // video: Spark walks the RIFF/AVI container, JPEG-decodes the frames
    // sampled at fixed TIME positions (the half-frame-rate twins carry
    // HALF the frames at DOUBLE the frame period and still land on their
    // bases), dHashes each, and recovers the near-dup structure slot-wise;
    // the oracle answers from the planted twin_of — equality certifies
    // the container walk, the time-normalized sampling, per-frame
    // requantization/brightness invariance, and zero false pairs among
    // the distinct videos
    "video_phash" ->
      s"""SELECT media_id, twin_of AS dup_of, twin_of IS NULL AS keep
         |FROM read_parquet('${VideoPhash.videoFixturePath}/*.parquet')
         |ORDER BY media_id""".stripMargin,
    // the embedding pathway must recover the SAME planted video structure
    // from the same bytes through a different feature space (per-slot-
    // normalized color-layout spectra + cosine, not gradient signs +
    // slot-majority Hamming) — two independent witnesses to the one
    // container walk + frame decode; margins measured in VideoEmbedSpec
    "video_embed" ->
      s"""SELECT media_id, twin_of AS dup_of, twin_of IS NULL AS keep
         |FROM read_parquet('${VideoPhash.videoFixturePath}/*.parquet')
         |ORDER BY media_id""".stripMargin,
    // the serving composition for video: every planted twin, served as a
    // query against the persisted IVFADC index of the 200 base videos,
    // must come back with its own base as top-1 — row equality certifies
    // probe + ADC + rerank end-to-end over the video-embedding column
    "video_ann" ->
      s"""SELECT media_id, twin_of AS found_base
         |FROM read_parquet('${VideoPhash.videoFixturePath}/*.parquet')
         |WHERE twin_of IS NOT NULL
         |ORDER BY media_id""".stripMargin,
    // Spark parses fmt/width/height from the payload BYTES (PNG IHDR /
    // JPEG SOF, MediaDecoder.decodeDims); the oracle answers from the
    // fixture's METADATA columns — equality certifies the byte parse, and
    // the image-only row set certifies decode rejects non-image payloads.
    "media_dims" ->
      s"""SELECT media_id, meta.format AS fmt,
         |       CAST(meta.width AS INT) AS width, CAST(meta.height AS INT) AS height
         |FROM read_parquet('${Multimodal.fixturePath}/*.parquet')
         |WHERE meta.modality = 'image' ORDER BY media_id""".stripMargin,
    "text_stats" ->
      """SELECT doc_id, lang,
        |  len(string_split(text, ' ')) AS n_tokens,
        |  len(list_distinct(string_split(text, ' '))) AS n_types,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) / len(string_split(text, ' ')) AS ttr,
        |  CAST(len(regexp_extract_all(text, '[a-z]+')) AS INT) AS n_alpha_runs,
        |  CAST(len(list_filter(string_split(text, ' '), t -> t = 'a' OR t = 'the')) AS DOUBLE)
        |    / len(string_split(text, ' ')) AS stop_ratio,
        |  CAST(length(text) - len(string_split(text, ' ')) + 1 AS DOUBLE)
        |    / len(string_split(text, ' ')) AS mean_tok_len
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_quality" ->
      s"""SELECT doc_id, lang, n_chars,
         |  $qualitySqlExpr AS quality,
         |  CASE WHEN $qualitySqlExpr >= 0.35
         |       THEN 'keep' ELSE 'drop' END AS verdict
         |FROM documents ORDER BY doc_id""".stripMargin,
    // repetition fractions: the oracle rebuilds the 2/3-gram MULTISETS by
    // unnest + GROUP BY (dup frac = 1 − distinct/total; top frac = max
    // multiplicity/total — ≡ the Spark side's sorted-array max run); the
    // threshold interpolates from TextOps.RepetitionTau
    "doc_repetition" ->
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |g2 AS (SELECT doc_id, unnest([ array_to_string(toks[i:i+1], ' ')
         |                               FOR i IN range(1, len(toks)) ]) AS gram
         |       FROM d WHERE len(toks) >= 2),
         |g3 AS (SELECT doc_id, unnest([ array_to_string(toks[i:i+2], ' ')
         |                               FOR i IN range(1, len(toks) - 1) ]) AS gram
         |       FROM d WHERE len(toks) >= 3),
         |u2 AS (SELECT doc_id, gram, COUNT(*) AS c FROM g2 GROUP BY 1, 2),
         |u3 AS (SELECT doc_id, gram, COUNT(*) AS c FROM g3 GROUP BY 1, 2),
         |s2 AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n2, COUNT(*) AS d2,
         |              MAX(c) AS top2 FROM u2 GROUP BY 1),
         |s3 AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n3, COUNT(*) AS d3
         |       FROM u3 GROUP BY 1)
         |SELECT s2.doc_id,
         |  CAST(s2.n2 - s2.d2 AS DOUBLE) / s2.n2 AS dup2_frac,
         |  CAST(s2.top2 AS DOUBLE) / s2.n2 AS top2_frac,
         |  COALESCE(CAST(s3.n3 - s3.d3 AS DOUBLE) / s3.n3, 0.0) AS dup3_frac,
         |  CASE WHEN s2.n2 < ${TextOps.RepetitionMinGrams} THEN 'short'
         |       WHEN CAST(s2.top2 AS DOUBLE) / s2.n2 > ${TextOps.RepetitionTau}
         |       THEN 'drop' ELSE 'keep' END AS verdict
         |FROM s2 LEFT JOIN s3 USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    "doc_dedup" ->
      """SELECT doc_id, fp, lang, n_chars FROM (
        |  SELECT doc_id, lang, n_chars,
        |    md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp,
        |    ROW_NUMBER() OVER (
        |      PARTITION BY md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
        |      ORDER BY doc_id) AS rn
        |  FROM documents)
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    // token classes partition non-space chars, so the same pattern means
    // the same tokens under Java regex (Spark) and RE2 (DuckDB); patterns
    // interpolate from TextOps so the two sides cannot drift
    "token_count" ->
      s"""SELECT doc_id,
         |  len(string_split(text, ' ')) AS n_ws,
         |  len(regexp_extract_all(text, '${TextOps.BpePattern}')) AS n_bpe,
         |  len(regexp_extract_all(text, '${TextOps.BpeWord}')) AS n_word,
         |  len(regexp_extract_all(text, '${TextOps.BpeNum}')) AS n_num,
         |  len(regexp_extract_all(text, '${TextOps.BpePunct}')) AS n_punct,
         |  length(text) AS n_chars,
         |  CASE WHEN len(regexp_extract_all(text, '${TextOps.BpePattern}')) > 0
         |       THEN CAST(length(text) AS DOUBLE)
         |            / len(regexp_extract_all(text, '${TextOps.BpePattern}'))
         |       ELSE NULL END AS chars_per_tok
         |FROM documents ORDER BY doc_id""".stripMargin,
    // the oracle RECOMPUTES the winnowing pipeline: the unrolled k-term
    // hash chain per position, w-wide window minima (list slices clamp at
    // the end exactly like the kernel's min(i+w, nh) bound), distinct+sort,
    // and the same space-joined md5 digest — a hash-chain, selection, or
    // ordering regression in the kernel turns the row red
    "doc_fingerprint" ->
      s"""WITH $winnowFpsCtes
         |SELECT doc_id, len(fps) AS n_fp, list_min(fps) AS fp_min,
         |       list_max(fps) AS fp_max,
         |       md5(array_to_string(fps, ' ')) AS fp_digest
         |FROM m ORDER BY doc_id""".stripMargin,
    // winnowing pair mining: the oracle recomputes the ENTIRE pipeline —
    // kernel (shared CTEs above), postings, df cap, min-shared — with the
    // knobs interpolated from TextOps (single source of truth), so a
    // regression in either the kernel or the mining join turns rows red
    "winnow_pairs" ->
      s"""WITH $winnowFpsCtes, post AS (
         |  SELECT doc_id, UNNEST(fps) AS fp FROM m
         |), kept AS (
         |  SELECT doc_id, fp FROM post
         |  WHERE fp IN (SELECT fp FROM post GROUP BY fp
         |               HAVING COUNT(*) <= ${TextOps.WinnowDfCap})
         |)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |       CAST(COUNT(*) AS BIGINT) AS n_shared
         |FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
         |GROUP BY doc_a, doc_b
         |HAVING COUNT(*) >= ${TextOps.WinnowMinShared}
         |ORDER BY doc_a, doc_b""".stripMargin,
    "dedup_minhash" -> exactJaccardPairsSql,
    // NgramJaccard computes the SAME output contract exactly (PPJoin prefix
    // filter + exact verify), so it shares the brute-force oracle.
    "ngram_jaccard" -> exactJaccardPairsSql,
    // transitive closure over the SAME brute-force edge set dedup_minhash
    // is gated on: a recursive min-id walk labels every node with the
    // smallest doc_id it can reach, so a propagation bug on the Spark side
    // (a component split or merged wrongly) turns rows red. Singleton docs
    // join in with themselves as representative — one row per DOCUMENT.
    "dedup_clusters" ->
      s"""WITH RECURSIVE $jaccardShingleCte, pairs AS (
         |$jaccardPairsSelect
         |), edges AS (
         |  SELECT doc_a AS u, doc_b AS v FROM pairs
         |  UNION SELECT doc_b AS u, doc_a AS v FROM pairs
         |), reach(id, r) AS (
         |  SELECT u AS id, u AS r FROM (SELECT DISTINCT u FROM edges)
         |  UNION
         |  SELECT reach.id, e.v FROM reach JOIN edges e ON reach.r = e.u
         |), cc AS (
         |  SELECT id, MIN(r) AS rep FROM reach GROUP BY id
         |)
         |SELECT d.doc_id AS doc_id,
         |       COALESCE(cc.rep, d.doc_id) AS cluster_rep,
         |       COALESCE(cc.rep, d.doc_id) = d.doc_id AS is_survivor
         |FROM documents d LEFT JOIN cc ON d.doc_id = cc.id
         |ORDER BY doc_id""".stripMargin,
    // deterministic md5 split: bucket boundaries interpolate from Sampling
    // (single source of truth); string compare = ASCII order on both engines
    "split_hash" ->
      s"""SELECT doc_id, substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS bucket,
         |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '${Sampling.TrainUpper}' THEN 'train'
         |       WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '${Sampling.ValUpper}' THEN 'val'
         |       ELSE 'test' END AS split
         |FROM documents ORDER BY doc_id""".stripMargin,
    "sample_stratified" ->
      s"""SELECT lang, rn, doc_id, skey FROM (
         |  SELECT lang, doc_id, md5(CAST(doc_id AS VARCHAR) || '${Sampling.StratSalt}') AS skey,
         |    ROW_NUMBER() OVER (PARTITION BY lang
         |      ORDER BY md5(CAST(doc_id AS VARCHAR) || '${Sampling.StratSalt}'), doc_id) AS rn
         |  FROM documents)
         |WHERE rn <= ${Sampling.StratumN} ORDER BY lang, rn""".stripMargin,
    // A-ES weighted sampling: the oracle recomputes the hash uniform
    // (explicit hex-digit polynomial — the one hex→int both engines
    // spell identically), the micro-quantized log10(u)/w key, and the
    // per-stratum top-k; rank compares are integer, so no float flake
    "sample_weighted" ->
      s"""WITH t AS (
         |  SELECT doc_id, lang,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         |    md5(CAST(doc_id AS VARCHAR) || '${Sampling.WeightedSalt}') AS h
         |  FROM documents),
         |u AS (
         |  SELECT doc_id, lang, n_tok,
         |      (strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 4096
         |    + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) * 256
         |    + (strpos('0123456789abcdef', substr(h, 3, 1)) - 1) * 16
         |    + (strpos('0123456789abcdef', substr(h, 4, 1)) - 1) AS hi
         |  FROM t),
         |k AS (
         |  SELECT doc_id, lang, n_tok,
         |    CAST(ROUND(log10(CAST(hi + 1 AS DOUBLE) / 65537.0) / n_tok
         |      * ${LmScore.Micro}, 0) AS BIGINT) AS key_micro
         |  FROM u),
         |r AS (SELECT lang, doc_id, n_tok, key_micro,
         |        ROW_NUMBER() OVER (PARTITION BY lang
         |          ORDER BY key_micro DESC, doc_id) AS rn
         |      FROM k)
         |SELECT lang, rn, doc_id, n_tok, key_micro FROM r
         |WHERE rn <= ${Sampling.WeightedN} ORDER BY lang, rn""".stripMargin,
    // BM25: per-term tf/df columns and the scoring expression are GENERATED
    // from Ranking.QueryTerms / Ranking.termScoreSql (single source of
    // truth), so the oracle's arithmetic is association-identical to the
    // Spark column expression; avgdl derives from an exact integer Σdl
    "bm25_topk" -> bm25OracleSql,
    // the SAME full-recompute oracle gates the SERVED form: row equality
    // certifies the persisted postings/doclen/stats artifact end to end
    // (pruned-bucket read, posting-derived dfs, matched-docs-only scoring)
    "bm25_serve" -> bm25OracleSql,
    "bm25_serve_batch" -> bm25BatchOracleSql,
    // the ARRIVAL MODE under the same full-recompute oracle: the even-half
    // build + odd-batch append must be content-identical to a from-scratch
    // full-corpus index, so the unchanged serving path hash-matches the
    // full recompute — lost/duplicated postings or a skewed stats delta
    // turn rows red
    "bm25_serve_incremental" -> bm25OracleSql,
    // decontamination: containment is an exact int/int division, so rows
    // hash-match bitwise; knobs interpolate from Contamination
    "contamination" ->
      s"""WITH sh AS (
         |  SELECT doc_id, list_distinct([ array_to_string(toks[i:i+${Contamination.ShingleN - 1}], ' ')
         |                                 FOR i IN range(1, len(toks) - ${Contamination.ShingleN - 2}) ]) AS shingles
         |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
         |  WHERE len(toks) >= ${Contamination.ShingleN}
         |)
         |SELECT c.doc_id AS doc_id, b.doc_id AS bench_id,
         |       CAST(len(list_intersect(c.shingles, b.shingles)) AS BIGINT) AS n_common,
         |       CAST(len(list_intersect(c.shingles, b.shingles)) AS DOUBLE) / len(c.shingles) AS containment
         |FROM sh c JOIN sh b ON c.doc_id >= ${Contamination.BenchMaxId} AND b.doc_id < ${Contamination.BenchMaxId}
         |WHERE CAST(len(list_intersect(c.shingles, b.shingles)) AS DOUBLE) / len(c.shingles) >= ${Contamination.Tau}
         |ORDER BY doc_id, bench_id""".stripMargin,
    // k-means assignment: the oracle recomputes the SAME index-order
    // Σ(vᵢ−cvᵢ)² accumulation (list_sum ≡ the graft_dot fold — the
    // sim_topk-proven equivalence), so argmin and 6-dp distance match
    "kmeans_assign" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |c AS (SELECT CAST(vec_id AS INT) AS cid, v AS cv FROM e WHERE vec_id < ${Similarity.KmeansSeedC}),
         |d AS (SELECT e.vec_id, c.cid,
         |        list_sum([ (v[i] - cv[i]) * (v[i] - cv[i])
         |                   FOR i IN generate_series(1, len(v)) ]) AS d2
         |      FROM e, c),
         |r AS (SELECT vec_id, cid, d2,
         |        ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn FROM d)
         |SELECT vec_id, cid, ROUND(d2, 6) AS d2 FROM r WHERE rn = 1 ORDER BY vec_id""".stripMargin,
    // sequence packing: the oracle is the NAIVE single-window global
    // cumsum (exact integer arithmetic, so rows hash bitwise) — the Spark
    // side must reproduce it from the two-phase distributed prefix sum,
    // so a bucket-offset bug (a lost or double-counted bucket) turns rows
    // red. `div` = floor division on non-negative longs in both engines.
    "seq_pack" ->
      s"""WITH t AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
         |           FROM documents),
         |c AS (SELECT doc_id, n_tok,
         |        CAST(SUM(n_tok) OVER (ORDER BY doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok
         |          AS BIGINT) AS start_tok
         |      FROM t)
         |SELECT doc_id, n_tok, start_tok, start_tok // ${Packing.SeqBudget} AS seq_id
         |FROM c ORDER BY doc_id""".stripMargin,
    // the chunk half: the same global cumsum exploded into per-sequence
    // segments by interval intersection — a doc straddling a budget
    // boundary yields one row per overlapped sequence
    "seq_chunks" ->
      s"""WITH t AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
         |           FROM documents),
         |c AS (SELECT doc_id, n_tok,
         |        CAST(SUM(n_tok) OVER (ORDER BY doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok
         |          AS BIGINT) AS start_tok
         |      FROM t),
         |e AS (SELECT doc_id, n_tok, start_tok,
         |        unnest(range(start_tok // ${Packing.SeqBudget},
         |                     (start_tok + n_tok - 1) // ${Packing.SeqBudget} + 1)) AS seq_id
         |      FROM c)
         |SELECT doc_id, seq_id,
         |  GREATEST(start_tok, seq_id * ${Packing.SeqBudget}) - start_tok AS doc_from,
         |  GREATEST(start_tok, seq_id * ${Packing.SeqBudget})
         |    - seq_id * ${Packing.SeqBudget} AS seq_from,
         |  LEAST(start_tok + n_tok, (seq_id + 1) * ${Packing.SeqBudget})
         |    - GREATEST(start_tok, seq_id * ${Packing.SeqBudget}) AS seg_len
         |FROM e ORDER BY doc_id, seq_id""".stripMargin,
    // composed curation pipeline: the oracle chains the four stage oracles
    // as CTEs — the quality formula interpolates from qualitySqlExpr, the
    // fingerprint/split/packing shapes are the doc_dedup / split_hash /
    // seq_pack oracles' own SQL with their constants interpolated from the
    // same Scala vals. A stage-interaction bug (dedup seeing pre-filter
    // rows, packing offsets computed before the split, a dropped stage)
    // turns rows red even though each singleton key stays green.
    "curation_pipeline" ->
      s"""WITH scored AS (
         |  SELECT doc_id, text, $qualitySqlExpr AS quality FROM documents),
         |kept AS (SELECT * FROM scored WHERE quality >= 0.35),
         |dd AS (
         |  SELECT doc_id, quality,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         |    ROW_NUMBER() OVER (
         |      PARTITION BY md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
         |      ORDER BY doc_id) AS rn
         |  FROM kept),
         |train AS (
         |  SELECT doc_id, quality, n_tok FROM dd
         |  WHERE rn = 1
         |    AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '${Sampling.TrainUpper}'),
         |c AS (
         |  SELECT doc_id, quality, n_tok,
         |    CAST(SUM(n_tok) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok
         |      AS BIGINT) AS start_tok
         |  FROM train)
         |SELECT doc_id, quality, n_tok, start_tok,
         |       start_tok // ${Packing.SeqBudget} AS seq_id
         |FROM c ORDER BY doc_id""".stripMargin,
    // the two-night arrival-mode recompute: night 1 = the curation
    // stages over even docs from offset 0; night 2 = odd docs, keep-first
    // within the batch THEN excluded by night 1's accepted fingerprints,
    // packed from night 1's train total — the first odd start_tok equals
    // that total EXACTLY or rows go red (the seam the key exists to prove)
    "curation_incremental" -> curationIncrementalSql,
    // the persisted exactly-once driver computes the SAME two nights;
    // the identical recompute gates it (plus the injected replay of
    // chop 0, which must no-op or batch 1's offsets shift red)
    "curation_stream" -> curationIncrementalSql,
    // the full macro's ARRIVAL mode: both nights chained as CTEs over the
    // planted+cleaned corpus — night 2 dedups against night 1's accepted
    // fps, its per-domain mix offsets CONTINUE at night 1's consumed
    // totals (mix_start pins that exactly), and its pack offsets continue
    // at night 1's packed total (start_tok pins that)
    "curation_incremental_full" ->
      s"""WITH planted AS (
         |  SELECT doc_id, lang, text
         |    || CASE WHEN doc_id % ${Redact.EmailMod} = 0
         |            THEN ' contact user' || doc_id || '@example.com' ELSE '' END
         |    || CASE WHEN doc_id % ${Redact.IpMod} = 0
         |            THEN ' from 10.0.' || (doc_id % 256) || '.1' ELSE '' END
         |    || CASE WHEN doc_id % ${Redact.PhoneMod} = 0
         |            THEN ' call 555-01' || (doc_id % 10) || '-'
         |                 || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
         |    AS text
         |  FROM documents),
         |cleaned AS (
         |  SELECT doc_id, lang,
         |    regexp_replace(regexp_replace(regexp_replace(text,
         |      '${Redact.EmailRe}', '${Redact.EmailTag}', 'g'),
         |      '${Redact.Ipv4Re}', '${Redact.IpTag}', 'g'),
         |      '${Redact.PhoneRe}', '${Redact.PhoneTag}', 'g') AS text
         |  FROM planted),
         |scored AS (
         |  SELECT doc_id, lang, text, $qualitySqlExpr AS quality FROM cleaned),
         |f AS (
         |  SELECT doc_id, lang, quality,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         |    md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp
         |  FROM scored WHERE quality >= 0.35),
         |bud AS (SELECT * FROM (VALUES ${DomainMix.Budgets.map {
             case (d, n) => s"('$d', $n)" }.mkString(", ")}) AS v(lang, budget)),
         |acc1 AS (
         |  SELECT * FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
         |    FROM f WHERE doc_id % 2 = 0) WHERE rn = 1),
         |train1 AS (
         |  SELECT doc_id, lang, quality, n_tok FROM acc1
         |  WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '${Sampling.TrainUpper}'),
         |mix1c AS (
         |  SELECT t.doc_id, t.lang, t.quality, t.n_tok, budget,
         |    CAST(SUM(n_tok) OVER (PARTITION BY t.lang
         |      ORDER BY md5(CAST(t.doc_id AS VARCHAR) || '${DomainMix.MixSalt}'), t.doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok
         |      AS BIGINT) AS mix_start
         |  FROM train1 t JOIN bud ON t.lang = bud.lang),
         |mix1 AS (SELECT * FROM mix1c WHERE mix_start < budget),
         |cons1 AS (SELECT lang, SUM(n_tok) AS consumed FROM mix1 GROUP BY lang),
         |t1 AS (SELECT COALESCE(SUM(n_tok), 0) AS tot FROM mix1),
         |c1 AS (
         |  SELECT doc_id, lang, quality, n_tok, mix_start,
         |    CAST(SUM(n_tok) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok
         |      AS BIGINT) AS start_tok
         |  FROM mix1),
         |acc2 AS (
         |  SELECT * FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
         |    FROM f WHERE doc_id % 2 = 1)
         |  WHERE rn = 1 AND fp NOT IN (SELECT fp FROM acc1)),
         |train2 AS (
         |  SELECT doc_id, lang, quality, n_tok FROM acc2
         |  WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '${Sampling.TrainUpper}'),
         |mix2c AS (
         |  SELECT t.doc_id, t.lang, t.quality, t.n_tok, budget,
         |    CAST(SUM(n_tok) OVER (PARTITION BY t.lang
         |      ORDER BY md5(CAST(t.doc_id AS VARCHAR) || '${DomainMix.MixSalt}'), t.doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok
         |      + COALESCE((SELECT consumed FROM cons1 WHERE cons1.lang = t.lang), 0)
         |      AS BIGINT) AS mix_start
         |  FROM train2 t JOIN bud ON t.lang = bud.lang),
         |mix2 AS (SELECT * FROM mix2c WHERE mix_start < budget),
         |c2 AS (
         |  SELECT doc_id, lang, quality, n_tok, mix_start,
         |    CAST(SUM(n_tok) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok
         |      + (SELECT tot FROM t1) AS BIGINT) AS start_tok
         |  FROM mix2)
         |SELECT * FROM (
         |  SELECT 1 AS batch, doc_id, lang, quality, n_tok, mix_start, start_tok,
         |         start_tok // ${Packing.SeqBudget} AS seq_id FROM c1
         |  UNION ALL
         |  SELECT 2 AS batch, doc_id, lang, quality, n_tok, mix_start, start_tok,
         |         start_tok // ${Packing.SeqBudget} AS seq_id FROM c2
         |) ORDER BY start_tok""".stripMargin,
    // the full macro: all six stages chained as CTEs — planting and scrub
    // from the redact oracle, quality/dedup/split/pack from the
    // curation_pipeline oracle, mix from the domain_mix oracle, each over
    // the previous stage's output (cleaned text feeds EVERYTHING
    // downstream; the mix window runs over post-split survivors only)
    "curation_full" ->
      s"""WITH planted AS (
         |  SELECT doc_id, lang, text
         |    || CASE WHEN doc_id % ${Redact.EmailMod} = 0
         |            THEN ' contact user' || doc_id || '@example.com' ELSE '' END
         |    || CASE WHEN doc_id % ${Redact.IpMod} = 0
         |            THEN ' from 10.0.' || (doc_id % 256) || '.1' ELSE '' END
         |    || CASE WHEN doc_id % ${Redact.PhoneMod} = 0
         |            THEN ' call 555-01' || (doc_id % 10) || '-'
         |                 || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
         |    AS text
         |  FROM documents),
         |cleaned AS (
         |  SELECT doc_id, lang,
         |    regexp_replace(regexp_replace(regexp_replace(text,
         |      '${Redact.EmailRe}', '${Redact.EmailTag}', 'g'),
         |      '${Redact.Ipv4Re}', '${Redact.IpTag}', 'g'),
         |      '${Redact.PhoneRe}', '${Redact.PhoneTag}', 'g') AS text
         |  FROM planted),
         |scored AS (
         |  SELECT doc_id, lang, text, $qualitySqlExpr AS quality FROM cleaned),
         |kept AS (SELECT * FROM scored WHERE quality >= 0.35),
         |dd AS (
         |  SELECT doc_id, lang, quality,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         |    ROW_NUMBER() OVER (
         |      PARTITION BY md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
         |      ORDER BY doc_id) AS rn
         |  FROM kept),
         |train AS (
         |  SELECT doc_id, lang, quality, n_tok FROM dd
         |  WHERE rn = 1
         |    AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '${Sampling.TrainUpper}'),
         |bud AS (SELECT * FROM (VALUES ${DomainMix.Budgets.map {
             case (d, n) => s"('$d', $n)" }.mkString(", ")}) AS v(lang, budget)),
         |mixc AS (
         |  SELECT t.doc_id, t.quality, t.n_tok, budget,
         |    CAST(SUM(n_tok) OVER (PARTITION BY t.lang
         |      ORDER BY md5(CAST(t.doc_id AS VARCHAR) || '${DomainMix.MixSalt}'), t.doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok
         |      AS BIGINT) AS mix_start
         |  FROM train t JOIN bud ON t.lang = bud.lang),
         |mixed AS (SELECT doc_id, quality, n_tok FROM mixc WHERE mix_start < budget),
         |c AS (
         |  SELECT doc_id, quality, n_tok,
         |    CAST(SUM(n_tok) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok
         |      AS BIGINT) AS start_tok
         |  FROM mixed)
         |SELECT doc_id, quality, n_tok, start_tok,
         |       start_tok // ${Packing.SeqBudget} AS seq_id
         |FROM c ORDER BY doc_id""".stripMargin,
    // PII redaction: the oracle plants the identical synthetic PII by the
    // identical modulus rule (constants + patterns interpolate from Redact
    // — single source of truth; the patterns live in the Java-regex ∩ RE2
    // common subset so both engines match the same spans), then recomputes
    // the sequential email → IP → phone scrub. DuckDB's regexp_replace
    // needs the explicit 'g' flag to match Spark's replace-all.
    "redact" ->
      s"""WITH planted AS (
         |  SELECT doc_id, text
         |    || CASE WHEN doc_id % ${Redact.EmailMod} = 0
         |            THEN ' contact user' || doc_id || '@example.com' ELSE '' END
         |    || CASE WHEN doc_id % ${Redact.IpMod} = 0
         |            THEN ' from 10.0.' || (doc_id % 256) || '.1' ELSE '' END
         |    || CASE WHEN doc_id % ${Redact.PhoneMod} = 0
         |            THEN ' call 555-01' || (doc_id % 10) || '-'
         |                 || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
         |    AS text
         |  FROM documents),
         |e AS (SELECT doc_id,
         |        len(regexp_extract_all(text, '${Redact.EmailRe}')) AS n_email,
         |        regexp_replace(text, '${Redact.EmailRe}', '${Redact.EmailTag}', 'g') AS t1
         |      FROM planted),
         |i AS (SELECT doc_id, n_email,
         |        len(regexp_extract_all(t1, '${Redact.Ipv4Re}')) AS n_ip,
         |        regexp_replace(t1, '${Redact.Ipv4Re}', '${Redact.IpTag}', 'g') AS t2
         |      FROM e),
         |p AS (SELECT doc_id, n_email, n_ip,
         |        len(regexp_extract_all(t2, '${Redact.PhoneRe}')) AS n_phone,
         |        regexp_replace(t2, '${Redact.PhoneRe}', '${Redact.PhoneTag}', 'g') AS t3
         |      FROM i)
         |SELECT doc_id, n_email, n_ip, n_phone,
         |       n_email + n_ip + n_phone AS n_redactions, md5(t3) AS clean_fp
         |FROM p ORDER BY doc_id""".stripMargin,
    // weighted domain mixing: the oracle is the NAIVE per-domain global
    // cumsum in hash order (exact integer arithmetic) — the Spark side
    // must reproduce it from the two-phase (domain, skey-bucket) prefix
    // sum, so a lost/double-counted bucket or a wrong selection order
    // turns rows red. Budgets + salt interpolate from DomainMix.
    "domain_mix" ->
      s"""WITH t AS (
         |  SELECT lang, doc_id,
         |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         |         md5(CAST(doc_id AS VARCHAR) || '${DomainMix.MixSalt}') AS skey
         |  FROM documents),
         |b AS (SELECT * FROM (VALUES ${DomainMix.Budgets.map {
             case (d, n) => s"('$d', $n)" }.mkString(", ")}) AS v(lang, budget)),
         |c AS (
         |  SELECT t.lang, doc_id, n_tok, budget,
         |    CAST(SUM(n_tok) OVER (PARTITION BY t.lang ORDER BY skey, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok
         |      AS BIGINT) AS tok_start
         |  FROM t JOIN b ON t.lang = b.lang)
         |SELECT lang, doc_id, n_tok, tok_start FROM c
         |WHERE tok_start < budget ORDER BY lang, doc_id""".stripMargin,
    // exact substring dedup: the oracle recomputes the whole pipeline —
    // L-token windows, digest grouping, duplicated marks, session-merge —
    // over the same md5 window keys, so a regression in windowing, the
    // duplicate mark, or the region merge turns rows red. L interpolates
    // from SubstringDedup (single source of truth).
    "substring_dedup" ->
      s"""WITH $substrRegionCtes
         |SELECT doc_id, MIN(pos) AS start_tok,
         |       MAX(pos) + ${SubstringDedup.SpanL - 1} AS end_tok,
         |       MAX(pos) + ${SubstringDedup.SpanL} - MIN(pos) AS span_len
         |FROM r GROUP BY doc_id, region ORDER BY doc_id, start_tok""".stripMargin,
    // the arrival mode's oracle is the batch key's own full-corpus
    // recomputation restricted to the odd (batch) documents: a batch
    // window is duplicated-against-(index ∪ batch) iff its digest count
    // over the WHOLE corpus is ≥ 2 (it contributes one occurrence
    // itself), and regions merge per-document, so the restriction
    // commutes with the merge. Spark must reach the same rows through
    // the membership probe against the even half's digest index.
    "substring_dedup_incremental" ->
      s"""WITH $substrRegionCtes
         |SELECT doc_id, MIN(pos) AS start_tok,
         |       MAX(pos) + ${SubstringDedup.SpanL - 1} AS end_tok,
         |       MAX(pos) + ${SubstringDedup.SpanL} - MIN(pos) AS span_len
         |FROM r WHERE doc_id % 2 = 1
         |GROUP BY doc_id, region ORDER BY doc_id, start_tok""".stripMargin,
    // the cut half: regions (shared CTEs) expand to covered positions, an
    // anti-join keeps the uncut tokens, and the cut text is pinned by its
    // md5 digest — one row per INPUT document (fully-cut docs keep n_kept
    // 0 and the empty-string digest; span-free docs pass through uncut)
    "substring_drop" ->
      s"""WITH $substrRegionCtes,
         |reg AS (
         |  SELECT doc_id, MIN(pos) AS rs, MAX(pos) + ${SubstringDedup.SpanL - 1} AS re
         |  FROM r GROUP BY doc_id, region),
         |tok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |pos AS (SELECT doc_id, unnest(range(1, len(toks) + 1)) AS p, toks FROM tok),
         |cov AS (SELECT doc_id, unnest(range(rs, re + 1)) AS p FROM reg),
         |kept AS (
         |  SELECT pos.doc_id, pos.p, pos.toks FROM pos
         |  LEFT JOIN cov ON pos.doc_id = cov.doc_id AND pos.p = cov.p
         |  WHERE cov.p IS NULL),
         |agg AS (
         |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
         |         md5(array_to_string(list(toks[p] ORDER BY p), ' ')) AS clean_fp
         |  FROM kept GROUP BY doc_id)
         |SELECT tok.doc_id, CAST(len(tok.toks) AS BIGINT) AS n_tok,
         |       CAST(COALESCE(agg.n_kept, 0) AS BIGINT) AS n_kept,
         |       COALESCE(agg.clean_fp, md5('')) AS clean_fp
         |FROM tok LEFT JOIN agg ON tok.doc_id = agg.doc_id
         |ORDER BY tok.doc_id""".stripMargin,
    // the incremental CUT: the substring_drop recomputation restricted to
    // the odd (batch) half — regions from the FULL corpus's window counts
    // (restriction equivalence, as in substring_dedup_incremental), the
    // cut applied to batch documents only, one output row per batch doc
    "substring_drop_incremental" ->
      s"""WITH $substrRegionCtes,
         |reg AS (
         |  SELECT doc_id, MIN(pos) AS rs, MAX(pos) + ${SubstringDedup.SpanL - 1} AS re
         |  FROM r WHERE doc_id % 2 = 1 GROUP BY doc_id, region),
         |tok AS (SELECT doc_id, string_split(text, ' ') AS toks
         |        FROM documents WHERE doc_id % 2 = 1),
         |pos AS (SELECT doc_id, unnest(range(1, len(toks) + 1)) AS p, toks FROM tok),
         |cov AS (SELECT doc_id, unnest(range(rs, re + 1)) AS p FROM reg),
         |kept AS (
         |  SELECT pos.doc_id, pos.p, pos.toks FROM pos
         |  LEFT JOIN cov ON pos.doc_id = cov.doc_id AND pos.p = cov.p
         |  WHERE cov.p IS NULL),
         |agg AS (
         |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
         |         md5(array_to_string(list(toks[p] ORDER BY p), ' ')) AS clean_fp
         |  FROM kept GROUP BY doc_id)
         |SELECT tok.doc_id, CAST(len(tok.toks) AS BIGINT) AS n_tok,
         |       CAST(COALESCE(agg.n_kept, 0) AS BIGINT) AS n_kept,
         |       COALESCE(agg.clean_fp, md5('')) AS clean_fp
         |FROM tok LEFT JOIN agg ON tok.doc_id = agg.doc_id
         |ORDER BY tok.doc_id""".stripMargin,
    // the lifecycle key: the index is the even docs' fps built in four
    // appends, compacted, MINUS the retracted (doc_id % 10 = 0) docs'
    // fps — a retracted fp no longer suppresses, so an odd duplicate of
    // a retracted even doc SURVIVES; everything else is dedup_incremental
    "dedup_index_lifecycle" ->
      """WITH f AS (
        |  SELECT doc_id, lang, n_chars,
        |    md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp
        |  FROM documents),
        |idx AS (
        |  SELECT DISTINCT fp FROM f WHERE doc_id % 2 = 0
        |  AND fp NOT IN (SELECT fp FROM f WHERE doc_id % 10 = 0 AND doc_id % 2 = 0)),
        |b AS (
        |  SELECT doc_id, lang, n_chars, fp,
        |    ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        |  FROM f WHERE doc_id % 2 = 1)
        |SELECT doc_id, fp, lang, n_chars FROM b
        |WHERE rn = 1 AND fp NOT IN (SELECT fp FROM idx)
        |ORDER BY doc_id""".stripMargin,
    // unified takedown: five family indexes over the line-restructured
    // even half, doc_id % 10 = 0 retracted from all of them in one
    // journaled commit. The oracle recomputes each family's removed and
    // surviving row counts from the rules alone — distinct bag-of-words
    // keys for fp (identity semantics: shared fps go too), distinct
    // lines/windows with the remaining-support recount for the two
    // shared-evidence families, per-eligible-doc band/set row counts
    // for MinHash (16 bands + 1 set per doc with >= 3 tokens — counts
    // don't need the hash values), per-doc distinct-term posting counts
    // for BM25 — and pins the Spark-side fresh-build parity verdict TRUE
    "takedown" ->
      s"""WITH $lineBuildCtes,
         |t2 AS (SELECT doc_id, array_to_string(lines, chr(10)) AS text FROM built),
         |tr AS (SELECT doc_id, text FROM t2 WHERE doc_id % 10 = 0),
         |tk AS (SELECT doc_id, text FROM t2 WHERE doc_id % 2 = 0 AND doc_id % 10 <> 0),
         |fpr AS (SELECT DISTINCT array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ') AS fp FROM tr),
         |fpk AS (SELECT DISTINCT array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ') AS fp FROM tk),
         |lnr AS (SELECT DISTINCT line FROM lx WHERE doc_id % 10 = 0),
         |lnk AS (SELECT DISTINCT line FROM lx WHERE doc_id % 2 = 0 AND doc_id % 10 <> 0),
         |wr AS (SELECT DISTINCT w FROM (
         |  SELECT unnest([ array_to_string(toks[i:i+${SubstringDedup.SpanL - 1}], ' ')
         |                  FOR i IN range(1, len(toks) - ${SubstringDedup.SpanL - 2}) ]) AS w
         |  FROM (SELECT string_split(text, ' ') AS toks FROM tr)
         |  WHERE len(toks) >= ${SubstringDedup.SpanL})),
         |wk AS (SELECT DISTINCT w FROM (
         |  SELECT unnest([ array_to_string(toks[i:i+${SubstringDedup.SpanL - 1}], ' ')
         |                  FOR i IN range(1, len(toks) - ${SubstringDedup.SpanL - 2}) ]) AS w
         |  FROM (SELECT string_split(text, ' ') AS toks FROM tk)
         |  WHERE len(toks) >= ${SubstringDedup.SpanL})),
         |mer AS (SELECT COUNT(*) AS c FROM tr WHERE len(string_split(text, ' ')) >= 3),
         |mek AS (SELECT COUNT(*) AS c FROM tk WHERE len(string_split(text, ' ')) >= 3),
         |pr AS (SELECT COUNT(*) AS c FROM (SELECT DISTINCT doc_id, t FROM
         |        (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM tr))),
         |pk AS (SELECT COUNT(*) AS c FROM (SELECT DISTINCT doc_id, t FROM
         |        (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM tk)))
         |SELECT family, removed, survivors, parity_ok FROM (
         |  SELECT 'bm25_doclen' AS family, (SELECT COUNT(*) FROM tr) AS removed,
         |         (SELECT COUNT(*) FROM tk) AS survivors, TRUE AS parity_ok
         |  UNION ALL SELECT 'bm25_postings', (SELECT c FROM pr), (SELECT c FROM pk), TRUE
         |  UNION ALL SELECT 'fp', (SELECT COUNT(*) FROM fpr),
         |    (SELECT COUNT(*) FROM fpk WHERE fp NOT IN (SELECT fp FROM fpr)), TRUE
         |  UNION ALL SELECT 'line',
         |    (SELECT COUNT(*) FROM lnr WHERE line NOT IN (SELECT line FROM lnk)),
         |    (SELECT COUNT(*) FROM lnk), TRUE
         |  UNION ALL SELECT 'minhash_bands',
         |    ${MinHashDedup.numBands} * (SELECT c FROM mer),
         |    ${MinHashDedup.numBands} * (SELECT c FROM mek), TRUE
         |  UNION ALL SELECT 'minhash_sets', (SELECT c FROM mer), (SELECT c FROM mek), TRUE
         |  UNION ALL SELECT 'substring',
         |    (SELECT COUNT(*) FROM wr WHERE w NOT IN (SELECT w FROM wk)),
         |    (SELECT COUNT(*) FROM wk), TRUE
         |) ORDER BY family""".stripMargin,
    // the vector/media estate under the same harness: EVEN ids indexed,
    // id % 10 = 0 retracted from all four families in one journal
    // commit. Every family is identity-keyed with a FIXED row count per
    // id (4 dHash bands + 1 hash per image, 8 slots × 4 bands + 1 hash
    // array per video, 8 bands × 4 tables + 1 vector per document, one
    // inverted-file row per vector), so the oracle counts ids by the
    // parity rules from the fixtures' metadata — the Spark side must
    // reach the same counts from the retraction receipts and its
    // frozen-model fresh-build parity, which this pins TRUE
    "takedown_vectors" ->
      s"""WITH
         |imr AS (SELECT COUNT(*) c FROM read_parquet('${operators.ImagePhash.fixturePath}/*.parquet')
         |        WHERE media_id % 2 = 0 AND media_id % 10 = 0),
         |imk AS (SELECT COUNT(*) c FROM read_parquet('${operators.ImagePhash.fixturePath}/*.parquet')
         |        WHERE media_id % 2 = 0 AND media_id % 10 <> 0),
         |vir AS (SELECT COUNT(*) c FROM read_parquet('${operators.VideoPhash.videoFixturePath}/*.parquet')
         |        WHERE media_id % 2 = 0 AND media_id % 10 = 0),
         |vik AS (SELECT COUNT(*) c FROM read_parquet('${operators.VideoPhash.videoFixturePath}/*.parquet')
         |        WHERE media_id % 2 = 0 AND media_id % 10 <> 0),
         |txr AS (SELECT COUNT(*) c FROM read_parquet('${operators.TextEmbed.textFixturePath}/*.parquet')
         |        WHERE doc_id % 2 = 0 AND doc_id % 10 = 0),
         |txk AS (SELECT COUNT(*) c FROM read_parquet('${operators.TextEmbed.textFixturePath}/*.parquet')
         |        WHERE doc_id % 2 = 0 AND doc_id % 10 <> 0),
         |emr AS (SELECT COUNT(*) c FROM embeddings
         |        WHERE vec_id % 2 = 0 AND vec_id % 10 = 0),
         |emk AS (SELECT COUNT(*) c FROM embeddings
         |        WHERE vec_id % 2 = 0 AND vec_id % 10 <> 0)
         |SELECT family, removed, survivors, parity_ok FROM (
         |  SELECT 'ivfpq' AS family, (SELECT c FROM emr) AS removed,
         |         (SELECT c FROM emk) AS survivors, TRUE AS parity_ok
         |  UNION ALL SELECT 'phash_bands',
         |    ${operators.ImagePhash.Bands} * (SELECT c FROM imr),
         |    ${operators.ImagePhash.Bands} * (SELECT c FROM imk), TRUE
         |  UNION ALL SELECT 'phash_hashes', (SELECT c FROM imr), (SELECT c FROM imk), TRUE
         |  UNION ALL SELECT 'text_embed_bands',
         |    ${(64 / operators.TextEmbed.BandBits) * 4} * (SELECT c FROM txr),
         |    ${(64 / operators.TextEmbed.BandBits) * 4} * (SELECT c FROM txk), TRUE
         |  UNION ALL SELECT 'text_embed_vecs', (SELECT c FROM txr), (SELECT c FROM txk), TRUE
         |  UNION ALL SELECT 'video_bands',
         |    ${operators.VideoPhash.Slots * operators.ImagePhash.Bands} * (SELECT c FROM vir),
         |    ${operators.VideoPhash.Slots * operators.ImagePhash.Bands} * (SELECT c FROM vik), TRUE
         |  UNION ALL SELECT 'video_hashes', (SELECT c FROM vir), (SELECT c FROM vik), TRUE
         |) ORDER BY family""".stripMargin,
    // incremental dedup: even doc_ids are the accumulated corpus (their
    // distinct fingerprints are the index), odd doc_ids the arriving
    // batch; survivors are in-batch keep-first minus index membership
    "dedup_incremental" ->
      """WITH f AS (
        |  SELECT doc_id, lang, n_chars,
        |    md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp
        |  FROM documents),
        |idx AS (SELECT DISTINCT fp FROM f WHERE doc_id % 2 = 0),
        |b AS (
        |  SELECT doc_id, lang, n_chars, fp,
        |    ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        |  FROM f WHERE doc_id % 2 = 1)
        |SELECT doc_id, fp, lang, n_chars FROM b
        |WHERE rn = 1 AND fp NOT IN (SELECT fp FROM idx)
        |ORDER BY doc_id""".stripMargin,
    // incremental NEAR-dup: the same parity harness over the brute-force
    // trigram-Jaccard edge set the dedup_minhash oracle is gated on — a
    // batch (odd) doc survives iff it has no >= 0.8 pair with a lower odd
    // doc (in-batch keep-first) nor with ANY even doc (the index). The
    // Spark side verifies candidates exactly over hashed shingle sets, so
    // verdicts match the string-shingle recomputation 1:1.
    "dedup_minhash_incremental" ->
      s"""WITH $jaccardShingleCte, pairs AS (
         |$jaccardPairsSelect
         |)
         |SELECT d.doc_id AS doc_id, d.lang AS lang, d.n_chars AS n_chars
         |FROM documents d
         |WHERE d.doc_id % 2 = 1
         |  AND NOT EXISTS (SELECT 1 FROM pairs p
         |                  WHERE p.doc_b = d.doc_id AND p.doc_a % 2 = 1)
         |  AND NOT EXISTS (SELECT 1 FROM pairs p
         |                  WHERE (p.doc_a = d.doc_id AND p.doc_b % 2 = 0)
         |                     OR (p.doc_b = d.doc_id AND p.doc_a % 2 = 0))
         |ORDER BY doc_id""".stripMargin,
    // CCNet LM scoring: the oracle retrains the same add-one unigram
    // model (same top-K vocab with the same tie-break) and rescoring is
    // exact because per-token log-probs are quantized to integer
    // micro-log10 units before summation (see LmScore's scaladoc) — the
    // oracle sums per-token ROWS where Spark folds the token ARRAY, and
    // integer addition makes the two orders bit-equal
    "lm_score" ->
      s"""WITH $lmScoreCtes
         |SELECT d.doc_id, d.lang, CAST(ds.n_tok AS BIGINT) AS n_tok,
         |       ROUND(CAST(ds.lpsum AS DOUBLE) / ${LmScore.Micro} / ds.n_tok, 6) AS lp_mean
         |FROM documents d JOIN docsum ds ON d.doc_id = ds.doc_id
         |ORDER BY d.doc_id""".stripMargin,
    // CCNet tercile cut: the oracle computes the NAIVE global rank — one
    // ROW_NUMBER over the whole corpus — which the Spark side must
    // reproduce from the two-phase bucketed rank, so a lost or
    // double-counted score bucket turns rows red (the seq_pack/domain_mix
    // adversarial-oracle pattern, applied to ranking)
    "ccnet_buckets" ->
      s"""WITH $lmScoreCtes,
         |scored AS (
         |  SELECT d.doc_id, d.lang,
         |    ROUND(CAST(ds.lpsum AS DOUBLE) / ${LmScore.Micro} / ds.n_tok, 6) AS lp_mean
         |  FROM documents d JOIN docsum ds ON d.doc_id = ds.doc_id),
         |r AS (
         |  SELECT doc_id, lang, lp_mean,
         |    ROW_NUMBER() OVER (ORDER BY lp_mean DESC, doc_id) AS rank
         |  FROM scored),
         |nn AS (SELECT COUNT(*) AS n FROM scored)
         |SELECT doc_id, lang, lp_mean, rank,
         |  CASE WHEN rank * 3 <= n THEN 'head'
         |       WHEN rank * 3 <= n * 2 THEN 'middle'
         |       ELSE 'tail' END AS bucket
         |FROM r CROSS JOIN nn ORDER BY doc_id""".stripMargin,
    // NB log-odds classifier: the oracle re-derives the weak labels from
    // the quality formula, retrains the same count-based model (same
    // vocab cap/tie-break, same per-class-term micro quantization), and
    // row-sums — bit-equal to the kernel fold by the integer contract
    "nb_score" ->
      s"""WITH lab AS (
         |  SELECT doc_id, text, ($qualitySqlExpr) >= 0.35 AS pos FROM documents),
         |tk AS (SELECT pos, unnest(string_split(text, ' ')) AS t FROM lab),
         |cnt AS (
         |  SELECT t, SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS cp,
         |         SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS cn
         |  FROM tk GROUP BY t),
         |vocab AS (
         |  SELECT t, cp, cn,
         |    ROW_NUMBER() OVER (ORDER BY (cp + cn) DESC, t) AS rk FROM cnt),
         |model AS (SELECT t, cp, cn FROM vocab WHERE rk <= ${LmScore.VocabK}),
         |s AS (
         |  SELECT (SELECT SUM(cp) FROM cnt) AS np,
         |         (SELECT SUM(cn) FROM cnt) AS nn,
         |         (SELECT COUNT(*) FROM model) AS v),
         |lp AS (
         |  SELECT m.t,
         |    CAST(ROUND(log10(CAST(m.cp + 1 AS DOUBLE)
         |      / CAST(s.np + s.v + 1 AS DOUBLE)) * ${LmScore.Micro}, 0) AS BIGINT)
         |    - CAST(ROUND(log10(CAST(m.cn + 1 AS DOUBLE)
         |      / CAST(s.nn + s.v + 1 AS DOUBLE)) * ${LmScore.Micro}, 0) AS BIGINT) AS lp
         |  FROM model m CROSS JOIN s),
         |oov AS (
         |  SELECT CAST(ROUND(log10(1.0 / CAST(np + v + 1 AS DOUBLE))
         |           * ${LmScore.Micro}, 0) AS BIGINT)
         |       - CAST(ROUND(log10(1.0 / CAST(nn + v + 1 AS DOUBLE))
         |           * ${LmScore.Micro}, 0) AS BIGINT) AS lp FROM s),
         |dtok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
         |docsum AS (
         |  SELECT dtok.doc_id, SUM(COALESCE(lp.lp, (SELECT lp FROM oov))) AS lpsum,
         |         COUNT(*) AS n_tok
         |  FROM dtok LEFT JOIN lp ON dtok.t = lp.t
         |  GROUP BY dtok.doc_id)
         |SELECT d.doc_id, d.lang, CAST(ds.n_tok AS BIGINT) AS n_tok,
         |       ROUND(CAST(ds.lpsum AS DOUBLE) / ${LmScore.Micro} / ds.n_tok, 6) AS odds_mean
         |FROM documents d JOIN docsum ds ON d.doc_id = ds.doc_id
         |ORDER BY d.doc_id""".stripMargin,
    // Gopher rules: the oracle recomputes all four rule booleans — the
    // length/stopword arithmetic from the text_stats shapes, the
    // repetition gate from the doc_repetition counter CTEs; thresholds
    // interpolate from TextOps (single source of truth)
    "gopher_rules" ->
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks,
         |             len(text) AS len FROM documents),
         |st AS (SELECT doc_id, len(toks) AS n_tok,
         |         CAST(len - len(toks) + 1 AS DOUBLE) / len(toks) AS mean_tok_len,
         |         len(list_filter(toks, t -> ${TextOps.stopwords
             .map(s => s"t = '$s'").mkString(" OR ")})) > 0 AS has_stop
         |       FROM d),
         |g2 AS (SELECT doc_id, unnest([ array_to_string(toks[i:i+1], ' ')
         |                               FOR i IN range(1, len(toks)) ]) AS gram
         |       FROM d WHERE len(toks) >= 2),
         |u2 AS (SELECT doc_id, gram, COUNT(*) AS c FROM g2 GROUP BY 1, 2),
         |s2 AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n2, MAX(c) AS top2
         |       FROM u2 GROUP BY 1),
         |r AS (SELECT st.doc_id, st.n_tok, st.mean_tok_len,
         |        st.n_tok >= ${TextOps.GopherMinTok}
         |          AND st.n_tok <= ${TextOps.GopherMaxTok} AS r_wordcount,
         |        st.mean_tok_len >= ${TextOps.GopherMinMeanLen}
         |          AND st.mean_tok_len <= ${TextOps.GopherMaxMeanLen} AS r_meanlen,
         |        st.has_stop AS r_stopword,
         |        COALESCE(s2.n2, 0) < ${TextOps.RepetitionMinGrams}
         |          OR CAST(s2.top2 AS DOUBLE) / s2.n2 <= ${TextOps.RepetitionTau}
         |          AS r_repetition
         |      FROM st LEFT JOIN s2 ON st.doc_id = s2.doc_id)
         |SELECT doc_id, CAST(n_tok AS INT) AS n_tok, mean_tok_len,
         |  r_wordcount, r_meanlen, r_stopword, r_repetition,
         |  CASE WHEN r_wordcount AND r_meanlen AND r_stopword AND r_repetition
         |       THEN 'keep' ELSE 'drop' END AS verdict
         |FROM r ORDER BY doc_id""".stripMargin,
    // char entropy: the oracle's unnest+GROUP BY recomputation row-sums
    // the same integer micro terms the narrow run-length fold accumulates
    // — bit-equal by the integer contract; the final entropy expression
    // is the same IEEE op chain on both engines
    "char_entropy" ->
      s"""WITH ch AS (
         |  SELECT doc_id, c FROM (
         |    SELECT doc_id,
         |      unnest(list_transform(range(1, len(text) + 1),
         |        i -> substr(text, i, 1))) AS c
         |    FROM documents)
         |  WHERE c != ' '),
         |cnt AS (SELECT doc_id, c, COUNT(*) AS n FROM ch GROUP BY doc_id, c),
         |agg AS (SELECT doc_id,
         |          SUM(CAST(ROUND(log10(CAST(n AS DOUBLE)) * n * ${LmScore.Micro}, 0)
         |            AS BIGINT)) AS acc,
         |          SUM(n) AS nn,
         |          CAST(COUNT(*) AS INT) AS nd
         |        FROM cnt GROUP BY doc_id)
         |SELECT doc_id, CAST(nn AS INT) AS n_chars_ns, nd AS n_distinct,
         |  ROUND((log10(CAST(nn AS DOUBLE)) - CAST(acc AS DOUBLE) / ${LmScore.Micro} / nn)
         |    / log10(2.0), 6) AS entropy_bits
         |FROM agg ORDER BY doc_id""".stripMargin,
    // BPE training: the oracle unrolls the identical merge rounds (see
    // bpeTrainCtes) — a divergence in pair counting, the argmax
    // tie-break, or the merge-replace semantics turns rows red
    "bpe_train" -> {
      val sel = (1 to Bpe.Merges).map(r =>
        s"SELECT $r AS rk, l AS lhs, r AS rhs, l || r AS merged, cnt FROM b$r")
        .mkString(" UNION ALL ")
      s"""WITH ${bpeTrainCtes.mkString(",\n")}
         |SELECT * FROM ($sel) ORDER BY rk""".stripMargin
    },
    // BPE encoding: the corpus re-tokenized through the same learned
    // merges — boundary symbols keep merges word-local
    "bpe_encode" ->
      s"""WITH ${bpeEncodeCtes.mkString(",\n")}
         |SELECT doc_id, n_ws,
         |  CAST(len(string_split(trim(seq), '  ')) - (n_ws - 1) AS INT) AS n_sym,
         |  n_chars,
         |  ROUND(CAST(n_chars AS DOUBLE)
         |    / (len(string_split(trim(seq), '  ')) - (n_ws - 1)), 6) AS chars_per_sym
         |FROM enc${Bpe.Merges} ORDER BY doc_id""".stripMargin,
    // tokenizer-aware packing: the seq_pack running sum over MODEL token
    // counts — the same BPE encode CTEs feed n_tok, so the budget counts
    // learned symbols, not whitespace words
    "seq_pack_bpe" ->
      s"""WITH ${bpeEncodeCtes.mkString(",\n")},
         |t AS (SELECT doc_id,
         |        CAST(len(string_split(trim(seq), '  ')) - (n_ws - 1) AS BIGINT) AS n_tok
         |      FROM enc${Bpe.Merges}),
         |c AS (SELECT doc_id, n_tok,
         |        CAST(SUM(n_tok) OVER (ORDER BY doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok
         |          AS BIGINT) AS start_tok
         |      FROM t)
         |SELECT doc_id, n_tok, start_tok, start_tok // ${Packing.SeqBudget} AS seq_id
         |FROM c ORDER BY doc_id""".stripMargin,
    // SemDeDup: the oracle recomputes planting, the kmeans_assign-form
    // cluster argmin, the within-cluster pair cosines (the sim_topk
    // index-order fold over precomputed norms), and the keep verdicts —
    // a regression in assignment, pairing, or the ε-ball compare turns
    // rows red. Constants interpolate from SemDedup/Similarity.
    "semdedup" ->
      s"""WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |e AS (SELECT vec_id, v FROM base
         |      UNION ALL
         |      SELECT vec_id + ${Similarity.PlantIdOffset}, v FROM base
         |      WHERE vec_id < ${Similarity.PlantCount}),
         |c AS (SELECT CAST(vec_id AS INT) AS cid, v AS cv FROM e
         |      WHERE vec_id < ${Similarity.KmeansSeedC}),
         |d AS (SELECT e.vec_id, c.cid,
         |        list_sum([ (v[i] - cv[i]) * (v[i] - cv[i])
         |                   FOR i IN generate_series(1, len(v)) ]) AS d2
         |      FROM e, c),
         |r AS (SELECT vec_id, cid,
         |        ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn FROM d),
         |a AS (SELECT e.vec_id, r.cid, e.v,
         |        sqrt(list_sum([ v[i] * v[i] FOR i IN generate_series(1, len(v)) ])) AS nrm
         |      FROM e JOIN r ON e.vec_id = r.vec_id AND r.rn = 1),
         |p AS (SELECT y.vec_id, CAST(COUNT(*) AS BIGINT) AS n_near
         |      FROM a x JOIN a y ON x.cid = y.cid AND x.vec_id < y.vec_id
         |      WHERE list_sum([ x.v[i] * y.v[i] FOR i IN generate_series(1, len(x.v)) ])
         |              / (x.nrm * y.nrm) >= ${SemDedup.Tau}
         |      GROUP BY y.vec_id)
         |SELECT a.vec_id, a.cid, CAST(COALESCE(p.n_near, 0) AS BIGINT) AS n_near,
         |       p.n_near IS NULL AS keep
         |FROM a LEFT JOIN p ON a.vec_id = p.vec_id
         |ORDER BY a.vec_id""".stripMargin,
    // corpus-level line dedup: the oracle recomputes the deterministic
    // restructuring (chunk lines + planted boilerplate), the md5-keyed
    // corpus-wide keep-first, and the ordered reassembly digest
    "line_dedup" ->
      s"""WITH $lineBuildCtes,
         |k AS (SELECT doc_id, idx, line,
         |        ROW_NUMBER() OVER (PARTITION BY md5(line) ORDER BY doc_id, idx) AS rn
         |      FROM lx),
         |agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
         |          md5(array_to_string(list(line ORDER BY idx), chr(10))) AS clean_fp
         |        FROM k WHERE rn = 1 GROUP BY doc_id)
         |SELECT b.doc_id, CAST(len(b.lines) AS BIGINT) AS n_lines,
         |       CAST(COALESCE(agg.n_kept, 0) AS BIGINT) AS n_kept,
         |       COALESCE(agg.clean_fp, md5('')) AS clean_fp
         |FROM built b LEFT JOIN agg ON b.doc_id = agg.doc_id
         |ORDER BY b.doc_id""".stripMargin,
    // incremental line dedup: even docs' distinct line hashes are the
    // index, odd docs the batch — batch keep-first minus index membership,
    // then the same ordered reassembly (the dedup_incremental parity
    // harness, one level down)
    "line_dedup_incremental" ->
      s"""WITH $lineBuildCtes,
         |ifp AS (SELECT DISTINCT md5(line) AS fp FROM lx WHERE doc_id % 2 = 0),
         |b AS (SELECT doc_id, idx, line FROM lx WHERE doc_id % 2 = 1),
         |k AS (SELECT doc_id, idx, line,
         |        ROW_NUMBER() OVER (PARTITION BY md5(line) ORDER BY doc_id, idx) AS rn
         |      FROM b),
         |kept AS (SELECT doc_id, idx, line FROM k
         |         WHERE rn = 1 AND md5(line) NOT IN (SELECT fp FROM ifp)),
         |agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
         |          md5(array_to_string(list(line ORDER BY idx), chr(10))) AS clean_fp
         |        FROM kept GROUP BY doc_id)
         |SELECT bb.doc_id, CAST(len(bb.lines) AS BIGINT) AS n_lines,
         |       CAST(COALESCE(agg.n_kept, 0) AS BIGINT) AS n_kept,
         |       COALESCE(agg.clean_fp, md5('')) AS clean_fp
         |FROM built bb LEFT JOIN agg ON bb.doc_id = agg.doc_id
         |WHERE bb.doc_id % 2 = 1
         |ORDER BY bb.doc_id""".stripMargin,
    // DSIR: the oracle retrains both hashed-ngram bucket models (one
    // corpus pass, target flag as a column), re-derives the per-bucket
    // micro-log10 importance weights, and row-sums — bit-equal to the
    // kernel's array fold by the integer-quantization contract
    "dsir_select" ->
      s"""WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
         |fb AS (
         |  SELECT doc_id, lang,
         |    list_transform(
         |      list_concat(toks,
         |        [ array_to_string(toks[i:i+1], ' ') FOR i IN range(1, len(toks)) ]),
         |      f -> substr(md5(f), 1, 2)) AS buckets
         |  FROM t),
         |ex AS (SELECT lang = 'en' AS tgt, unnest(buckets) AS b FROM fb),
         |cnt AS (SELECT b, SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS ct,
         |               COUNT(*) AS cr
         |        FROM ex GROUP BY b),
         |s AS (SELECT (SELECT SUM(ct) FROM cnt) AS nt,
         |             (SELECT SUM(cr) FROM cnt) AS nr),
         |lw AS (SELECT cnt.b,
         |         CAST(ROUND(log10(CAST(cnt.ct + 1 AS DOUBLE)
         |           / CAST(s.nt + ${Dsir.NumBuckets} AS DOUBLE)) * ${LmScore.Micro}, 0) AS BIGINT)
         |       - CAST(ROUND(log10(CAST(cnt.cr + 1 AS DOUBLE)
         |           / CAST(s.nr + ${Dsir.NumBuckets} AS DOUBLE)) * ${LmScore.Micro}, 0) AS BIGINT) AS lw
         |       FROM cnt CROSS JOIN s),
         |dtok AS (SELECT doc_id, unnest(buckets) AS b FROM fb),
         |ds AS (SELECT dtok.doc_id, SUM(lw.lw) AS lw_sum, COUNT(*) AS n_feat
         |       FROM dtok JOIN lw ON dtok.b = lw.b GROUP BY dtok.doc_id)
         |SELECT f2.doc_id, f2.lang, CAST(ds.n_feat AS BIGINT) AS n_feat,
         |       ROUND(CAST(ds.lw_sum AS DOUBLE) / ${LmScore.Micro} / ds.n_feat, 6) AS lw_mean,
         |       ds.lw_sum > 0 AS selected
         |FROM fb f2 JOIN ds ON f2.doc_id = ds.doc_id
         |ORDER BY f2.doc_id""".stripMargin,
    // bloom-pruned join: the oracle is the SAME join WITHOUT the bloom —
    // might_contain has no false negatives and the exact join removes its
    // false positives, so any divergence means the bloom dropped a real key
    "bloom_join" -> BloomJoin.oracleSql,
    "sql_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       SUM(l_quantity) AS sum_qty,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |       SUM(l_quantity) / COUNT(*) AS avg_qty,
        |       COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "sim_topk" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < ${Similarity.NumQueryVecs}),
        |p AS (
        |  SELECT q_id, vec_id,
        |    list_sum([ v[i] * qv[i] FOR i IN generate_series(1, len(v)) ])
        |      / (sqrt(list_sum([ v[i] * v[i] FOR i IN generate_series(1, len(v)) ]))
        |         * sqrt(list_sum([ qv[i] * qv[i] FOR i IN generate_series(1, len(qv)) ]))) AS cos
        |  FROM e, q WHERE vec_id != q_id),
        |r AS (SELECT q_id, vec_id, cos,
        |        ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rn
        |      FROM p)
        |SELECT q_id, rn, vec_id, ROUND(cos, 6) AS cos FROM r WHERE rn <= ${Similarity.DefaultK}
        |ORDER BY q_id, rn""".stripMargin,
  )
}
