package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text → embedding: a deterministic hashed n-gram projection through
  * the SAME vector stack every other modality rides (SURVEY.md §2.7
  * E2/E3 — closes the text row of the modality × pathway matrix: images,
  * audio, and video each embed from their bytes and serve from a
  * persisted IVFADC index; text similarity was previously served only
  * from the pre-supplied `embeddings` table).
  *
  * The feature space is [[Dsir]]'s (word unigrams + bigrams — the
  * distribution DSIR importance-weights is the one this embeds), hashed
  * into [[Dim]] signed buckets and L2-normalized (`graft_hash_embed`,
  * feature hashing per Weinberger et al. 2009; [[graft.plans
  * .HashEmbedExpr]] for the kernel/HOF contract). Near-duplicate
  * paraphrases — a few tokens swapped, clauses reordered, small drops —
  * keep most n-grams and land at cosine ≳ 0.9; independently drawn
  * documents share almost none and land near 0. Downstream is
  * [[ImageEmbed.embedNearDup]] and the [[ProductQuant]] serving stack
  * UNCHANGED — the point of the matrix: once text becomes a vector it is
  * just another embedding modality.
  *
  * Scale: the embedding is one codegen'd projection over the text scan
  * (O(tokens) hashes per document, no shuffle), so the 100 TB cost
  * profile is the scan itself; everything after is the shared
  * banded-signature candidate mining and cid-pruned ANN serving.
  */
object TextEmbed {

  /** Embedding dimension: 64 matches the vector stack's 64-bit
    * signatures and factors cleanly into [[AnnSubspaces]] PQ subspaces. */
  val Dim = 64

  /** Cosine floor for the verify stage — fixture margins are measured in
    * TextEmbedSpec: planted-paraphrase min cosine and distinct-doc max
    * cosine must straddle this with room on both sides. */
  val CosThreshold = 0.8

  /** (id, …, text) → (id, v): the hashed n-gram embedding as one narrow
    * projection. Kernel when the session has GraftExtensions, bit-equal
    * HOF fold otherwise (the engine-wide catalog-fallback contract). */
  def embedText(docs: DataFrame, idCol: String = "doc_id",
      dim: Int = Dim): DataFrame =
    embedWith(docs, idCol, dim,
      useKernel = docs.sparkSession.catalog.functionExists("graft_hash_embed"))

  /** Both formulations behind one switch so the spec can assert their
    * bit-equality. The HOF form touches all `dim` slots per feature —
    * the O(dim × features) cost the kernel exists to avoid — but spells
    * the identical arithmetic in built-ins: same xxhash64(seed 42), same
    * pmod bucket, same bit-32 sign, same fold order (unigrams then
    * bigrams), same normalization. */
  private[operators] def embedWith(docs: DataFrame, idCol: String, dim: Int,
      useKernel: Boolean): DataFrame = {
    val toksCol = split(col("text"), " ")
    val v =
      if (useKernel) call_function("graft_hash_embed", toksCol, lit(dim))
      else {
        // toks materializes in its own projection (the Dsir lambda
        // re-split lesson)
        val feats = concat(col("toks"), TextOps.gramsOfToks(col("toks"), 2))
        def bucket(f: Column) = pmod(xxhash64(f), lit(dim.toLong))
        def sign(f: Column) =
          lit(1.0) - shiftrightunsigned(xxhash64(f), 32)
            .bitwiseAND(lit(1L)).cast("double") * 2.0
        val acc = aggregate(feats,
          array_repeat(lit(0.0), dim),
          (a, f) => transform(a, (s, i) =>
            s + when(bucket(f) === i.cast("long"), sign(f)).otherwise(0.0)))
        val ss = aggregate(acc, lit(0.0), (s, x) => s + x * x)
        when(ss > 0.0, transform(acc, x => x / sqrt(ss))).otherwise(acc)
      }
    if (useKernel)
      docs.select(col(idCol), v.as("v"))
    else
      docs.select(col(idCol), toksCol.as("toks"))
        .select(col(idCol), v.as("v"))
  }

  // ------------------------------------------------------------- fixture

  val NBase = 400
  private val SwapOffset = 100000L
  private val RotateOffset = 200000L
  private val DropOffset = 300000L

  val textFixturePath = "/root/repo/target/fixtures/text_paraphrase_v3.parquet"

  /** Topics in the fixture corpus — matches [[AnnClusters]] so the IVF
    * coarse cells have real structure to find. */
  val NTopics = 8

  /** Deterministic token stream for base doc `id`: 120 tokens by the
    * SPECIFIED java.util.Random LCG — 30 from the doc's TOPIC core (a
    * 40-word per-topic vocabulary: the topical word reuse real corpora
    * have, and what gives embedding space its cluster structure — IVF
    * recall COMES from that structure; uniformly random vectors have
    * none and defeat coarse quantization by construction) and 90 from a
    * broad 50k-type pool (so distinct docs, same topic or not, still
    * share almost no content and their cosines stay low). */
  private def baseToks(id: Long): Array[String] = {
    val rnd = new java.util.Random(id * 2654435761L + 17)
    val topic = id % NTopics
    Array.tabulate(120)(j =>
      if (j < 30) s"t${topic}c" + rnd.nextInt(40)
      else "w" + rnd.nextInt(50000))
  }

  /** Write the paraphrase fixture once (the [[ImagePhash
    * .ensureJpegPhashFixture]] atomic-move discipline). Schema:
    * (doc_id, text, twin_of, kind) — ground truth the oracle reads; the
    * Spark side must recover it from the text alone. Three paraphrase
    * families over disjoint base ranges (so each base has at most one
    * twin and `dup_of` is deterministic):
    *   - `swap`   (bases 0-99):    every 40th token replaced (3 of 120);
    *   - `rotate` (bases 100-199): 20-token clauses rotated by one —
    *     only the clause-boundary bigrams change;
    *   - `drop`   (bases 200-299): 3 tokens deleted.
    * The edit sizes put twins at cosine ~0.95-0.97 — the near-duplicate
    * operating point (meaningfully edited, unmistakably the same
    * document); measured margins in TextEmbedSpec. */
  def ensureTextFixture(spark: SparkSession): Unit = synchronized {
    val p = java.nio.file.Paths.get(textFixturePath)
    if (!java.nio.file.Files.exists(p)) {
      import spark.implicits._
      val rows = spark.range(NBase).map { id =>
        (id.longValue, baseToks(id).mkString(" "), Option.empty[Long], "base")
      }.union(spark.range(100).map { i =>
        val t = baseToks(i)
        val swapped = t.indices.map(j =>
          if (j % 40 == 7) "s" + j else t(j))
        (SwapOffset + i, swapped.mkString(" "), Option(i.longValue), "swap")
      }).union(spark.range(100, 200).map { i =>
        val t = baseToks(i)
        val chunks = t.grouped(20).toSeq
        val rotated = (chunks.tail :+ chunks.head).flatten
        (RotateOffset + i, rotated.mkString(" "), Option(i.longValue), "rotate")
      }).union(spark.range(200, 300).map { i =>
        val t = baseToks(i)
        val dropped = t.indices.filter(_ % 40 != 3).map(t)
        (DropOffset + i, dropped.mkString(" "), Option(i.longValue), "drop")
      }).toDF("doc_id", "text", "twin_of", "kind")
      val tmp = textFixturePath + ".tmp"
      rows.repartition(4).write.mode("overwrite").parquet(tmp)
      java.nio.file.Files.move(java.nio.file.Paths.get(tmp), p,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
  }

  // -------------------------------------------------- near-dup verdicts

  /** Candidate-mining band geometry for the TEXT operating point. Media
    * twins are bit-jitter at cosine ~0.9999 (signature Hamming ≤ 3), so
    * [[ImageEmbed.embedNearDup]]'s 4×16 bands + radius cut are exact
    * there; genuine paraphrases live at cosine ~0.93-0.98 — signature
    * Hamming 4-9 of 64 — where a 16-bit clean band is rare. 8 bands of
    * 8 bits put the clean-band probability at ~0.5 per table at cosine
    * 0.95, and four OR-amplified deterministic tables (identity /
    * reversed / rotated / rotated-reversed coordinate images — equally
    * random independent plane sets, the [[ImageEmbed.embedNearDup]]
    * L-table construction widened) drive the per-pair miss below 1e-9;
    * the frozen fixture is then verified exhaustively in TextEmbedSpec.
    * Precision stays exact: every candidate passes a true cosine.
    *
    * Scale story: 8-bit buckets are the 10²-10⁶-doc geometry (bucket
    * population ~n/256 per band; the exact-verify join prices it).
    * At web scale, text near-dup candidates belong to the MinHash
    * family ([[MinHashDedup]], probed at 1M — Jaccard on the SAME
    * n-gram space), while the embedding's scale role is ANN SERVING
    * through the persisted IVFADC index, where cid pruning + exact
    * rerank own the operating point — both paths are first-class here. */
  val Bands = 8
  val BandBits = 8

  /** Near-dup verdicts over a text embedding frame: L-table banded
    * signatures → exact-cosine verify at `threshold` → keep-first-by-id
    * (one row per input id, the dedup family's verdict shape). */
  def textNearDup(emb: DataFrame, threshold: Double = CosThreshold): DataFrame = {
    def tableCand(hashed: DataFrame): DataFrame = {
      val banded = hashed.select(col("doc_id"),
        explode(array((0 until Bands).map(b =>
          struct(lit(b).as("b"),
            shiftrightunsigned(col("sig"), BandBits * b)
              .bitwiseAND(lit((1L << BandBits) - 1)).as("v"))): _*)).as("band"))
        .select(col("doc_id"), col("band.b").as("b"), col("band.v").as("bv"))
      banded.as("a").join(banded.as("b"),
          col("a.b") === col("b.b") && col("a.bv") === col("b.bv") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("lo"), col("b.doc_id").as("hi"))
        .distinct()
    }
    // four deterministic coordinate images of v — independent plane sets
    val shift1 = (v: Column) => concat(slice(v, 2, Dim - 1), slice(v, 1, 1))
    val tables: Seq[Column] = Seq(col("v"), reverse(col("v")),
      shift1(col("v")), reverse(shift1(col("v"))))
    val cand = tables.map(t => tableCand(
        emb.select(col("doc_id"), Similarity.simhashFor(emb, t, 64).as("sig"))))
      .reduce(_ union _).distinct()
    val verified = cand
      .join(emb.select(col("doc_id").as("lo"), col("v").as("v_lo")), "lo")
      .join(emb.select(col("doc_id").as("hi"), col("v").as("v_hi")), "hi")
      .filter(Similarity.cosineFor(emb, col("v_lo"), col("v_hi")) >= threshold)
    val dupOf = verified.groupBy(col("hi").as("doc_id"))
      .agg(min("lo").as("dup_of"))
    emb.select("doc_id").join(dupOf, Seq("doc_id"), "left")
      .withColumn("keep", col("dup_of").isNull)
  }

  // ------------------------------------------------------- declared keys

  /** Declared key (`text_embed`): text → hashed n-gram embedding →
    * the vector-stack near-dup ([[textNearDup]]: L-table hyperplane
    * signatures, banded candidates, exact cosine verify) over the
    * planted paraphrase fixture. Row equality vs the planted twin_of
    * certifies that the embedding — not string matching — recovers
    * swap/rotate/drop paraphrases with zero false pairs among 400
    * independently drawn documents. */
  def textEmbedQuery(spark: SparkSession, dir: String): DataFrame = {
    ensureTextFixture(spark)
    textNearDup(embedText(spark.read.parquet(textFixturePath)
        .select("doc_id", "text")))
      .orderBy("doc_id")
  }

  // -------------------------------------------- persisted ANN serving

  /** Serving location for the text-embedding IVFADC index — the
    * [[ImageEmbed.mediaAnnIndexPath]] staleness discipline keyed on the
    * text fixture's files. */
  def textAnnIndexPath: String =
    "target/fixtures/text_ivfpq_" +
      graft.Tables.pathFingerprint(textFixturePath)

  val AnnClusters = 8
  val AnnSubspaces = 8

  /** Declared key (`text_ann`): the "find near-duplicates of this text
    * across the corpus" serving query — the [[ImageEmbed.mediaAnnQuery]]
    * shape on the text modality. The 400 base documents' embeddings are
    * built into an IVF(+PQ) index at most once (completion-marker-gated,
    * cid-partitioned); the 300 paraphrase twins are the query batch,
    * probed + ADC-shortlisted + exact-reranked through [[ProductQuant
    * .ivfPqSearch]]. Every twin's top-1 must be its planted base. */
  def textAnnQuery(spark: SparkSession, dir: String): DataFrame = {
    ensureTextFixture(spark)
    val fix = spark.read.parquet(textFixturePath)
    val idxPath = textAnnIndexPath
    if (!graft.Tables.artifactComplete(idxPath)) synchronized {
      if (!graft.Tables.artifactComplete(idxPath)) {
        val baseEmb = ProductQuant.normalized(
          embedText(fix.filter(col("kind") === "base"))
            .withColumnRenamed("doc_id", "vec_id"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        graft.Caching.withCleanup(baseEmb) {
          ProductQuant.writeIvfPqIndex(spark, idxPath, baseEmb,
            c = AnnClusters, m = AnnSubspaces)
        }
        graft.Tables.markArtifactComplete(idxPath)
      }
    }
    val (assigned, centroids, cbs) = ProductQuant.readIvfPqIndex(spark, idxPath)
    val queries = ProductQuant.normalized(
      embedText(fix.filter(col("kind") =!= "base"))
        .withColumnRenamed("doc_id", "vec_id"))
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    // nProbe 4 (not the media keys' 2): a paraphrase at cosine ~0.94 sits
    // genuinely off its base — with 8 coarse cells over 64-dim hashed
    // vectors the base's cell is not always the twin's top-2; probing
    // half the lists restores exact top-1 on the frozen fixture while the
    // serving story stays nProbe/c of the index read
    ProductQuant.ivfPqSearch(assigned, assigned.select("vec_id", "v"),
        queries, centroids, cbs, k = 1, nProbe = 4)
      .select(col("q_id").as("doc_id"), col("vec_id").as("found_base"))
      .orderBy("doc_id")
  }
}
