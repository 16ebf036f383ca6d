package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** LLM-pipeline operators (SURVEY.md §2.7): minhash near-dup detection on
  * crafted edits, fingerprint dedup on reorderings, SimHash locality,
  * ANN recall vs the exact baseline, language ID on real sample text. */
class LlmOpsSpec extends SparkSpec {

  def docsDf(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("minhash LSH finds planted near-duplicates and no false positives") {
    import spark.implicits._
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 60).map(i => if (i == 30) "EDITED" else s"tok$i").mkString(" ")
    val unrelated = (1 to 60).map(i => s"other$i").mkString(" ")
    val sh = Seq((0L, base), (1L, nearDup), (2L, unrelated)).toDF("doc_id", "text")
      .withColumn("shingles", array_distinct(expr(
        """transform(sequence(0, size(split(text, ' ')) - 3),
          |          i -> concat_ws(' ', split(text, ' ')[i], split(text, ' ')[i+1], split(text, ' ')[i+2]))""".stripMargin)))
      .select("doc_id", "shingles")
    val pairs = MinHashDedup.verified(sh, MinHashDedup.candidatePairs(sh)).collect()
    assert(pairs.length === 1)
    assert(pairs(0).getAs[Long]("doc_a") === 0L)
    assert(pairs(0).getAs[Long]("doc_b") === 1L)
    assert(pairs(0).getAs[Double]("jac") >= 0.8)
  }

  test("dedup_minhash on testdata finds the planted pairs, symmetric-free") {
    val pairs = MinHashDedup.dedupMinhash(spark, sf0001).collect()
    assert(pairs.nonEmpty, "sf0.001 documents carry planted near-dups")
    pairs.foreach { r =>
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
      assert(r.getAs[Double]("jac") >= MinHashDedup.threshold)
    }
  }

  test("ngram_jaccard finds planted near-duplicates exactly, no false positives") {
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 60).map(i => if (i == 30) "EDITED" else s"tok$i").mkString(" ")
    val unrelated = (1 to 60).map(i => s"other$i").mkString(" ")
    val pairs = NgramJaccard.pairs(
      docsDf(Seq((0L, base), (1L, nearDup), (2L, unrelated)))).collect()
    assert(pairs.length === 1)
    assert(pairs(0).getAs[Long]("doc_a") === 0L)
    assert(pairs(0).getAs[Long]("doc_b") === 1L)
    // exact: 58 trigrams each, 55 shared → jac = 55/61
    assert(math.abs(pairs(0).getAs[Double]("jac") - 55.0 / 61.0) < 1e-12)
  }

  test("ngram_jaccard matches dedup_minhash's exact pairs on sf0.001") {
    val exact = NgramJaccard.ngramJaccard(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val lsh = MinHashDedup.dedupMinhash(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(exact.nonEmpty)
    assert(exact === lsh, "LSH recall is 1.0 at this SF; both are verified-exact")
  }

  test("fingerprint collapses token reorderings and duplicates") {
    val df = docsDf(Seq(
      (1L, "alpha beta gamma"),
      (2L, "gamma alpha beta"),      // reorder → same bag
      (3L, "alpha beta beta gamma"), // dup token → same distinct bag
      (4L, "alpha beta delta")))     // different bag
      .withColumn("fp", TextOps.fingerprint(col("text")))
    val fps = df.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("fp")).toMap
    assert(fps(1L) === fps(2L))
    assert(fps(1L) === fps(3L))
    assert(fps(1L) !== fps(4L))
  }

  test("simhash: near-identical vectors share a hash, opposite vectors differ") {
    import spark.implicits._
    val v = (1 to 64).map(i => math.sin(i.toDouble))
    val vNear = v.updated(0, v.head + 1e-6)
    val vOpp = v.map(-_)
    val df = Seq((1L, v), (2L, vNear), (3L, vOpp)).toDF("id", "v")
      .withColumn("h", Similarity.simhash(col("v"), bits = 16))
    val h = df.collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("h")).toMap
    assert(h(1L) === h(2L))
    assert(java.lang.Long.bitCount(h(1L) ^ h(3L)) === 16, "all hyperplane signs flip")
  }

  test("assignCids (broadcast + min_by form) matches the driver-side argmin") {
    import spark.implicits._
    val vecs = (0L until 40L).map(i =>
      (i, (0 until 8).map(d => math.sin(i * 8 + d).abs).toSeq))
    val emb = vecs.toDF("vec_id", "v").select(col("vec_id"), col("v").cast("array<double>").as("v"))
    val centroids: Seq[(Int, Seq[Double])] = (0 until 5).map(c =>
      (c, (0 until 8).map(d => math.cos(c * 8 + d).abs).toSeq))
    val got = Similarity.assignCids(spark, emb, centroids).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cid")).toMap
    def d2(v: Seq[Double], c: Seq[Double]): Double =
      v.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum
    vecs.foreach { case (id, v) =>
      val want = centroids.minBy { case (cid, cv) => (d2(v, cv), cid) }._1
      assert(got(id) === want, s"vec $id assigned ${got(id)}, expected $want")
    }
  }

  test("ivfTopk achieves reasonable recall vs exact simTopk on sf0.001") {
    val exact = Similarity.simTopk(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    val ivf = Similarity.ivfTopk(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    val recall = exact.intersect(ivf).size.toDouble / exact.size
    assert(recall >= 0.4, s"IVF nProbe=2/c=8 recall $recall too low")
    assert(ivf.size === exact.size, "top-k fully filled from probed lists")
  }

  test("ivfSearch serves a 10k-row query TABLE fully distributed") {
    // the batch-serving shape: corpus indexed once, a large query frame
    // searched against it — no driver collect anywhere on the query path
    val emb = spark.range(2000).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(15)),
        d => sin(col("id") * 16 + d)).as("v"))
    val centroids = Similarity.trainCentroids(spark, emb, c = 8, lloydIters = 1)
    val assigned = emb.join(Similarity.assignCids(spark, emb, centroids), "vec_id")
    val queries = spark.range(10000).select(col("id").as("q_id"),
      transform(sequence(lit(0), lit(15)),
        d => cos(col("id") * 16 + d)).as("qv"))
    val out = Similarity.ivfSearch(assigned, queries, centroids, k = 10, nProbe = 2)
      .groupBy("q_id").agg(count(lit(1)).as("n"))
    assert(out.count() === 10000L, "every query row must be served")
    assert(out.filter(col("n") =!= 10).count() === 0L,
      "probed lists (~250 vectors × 2 probes) must fill the full top-10")
  }

  test("IVF index persists and serves identical top-k after a round-trip") {
    // build-once/serve-many: the index written to parquet must answer
    // exactly like the in-memory (assigned, centroids) pair it came from
    val emb = graft.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val dir = tmpDir("ivf-index")
    val trained = Similarity.writeIvfIndex(spark, dir, emb, c = 8, lloydIters = 2)
    val (assigned, centroids) = Similarity.readIvfIndex(spark, dir)
    assert(centroids.length === 8)
    assert(centroids === trained.sortBy(_._1),
      "centroids must round-trip bit-exactly through parquet")
    // the inverted file is cid-partitioned on disk (one directory per list)
    val listDirs = new java.io.File(s"$dir/assigned").listFiles()
      .filter(_.getName.startsWith("cid=")).map(_.getName).sorted
    assert(listDirs.length === 8, s"expected 8 cid= list dirs, got ${listDirs.toSeq}")
    val queries = emb.filter(col("vec_id") < Similarity.NumQueryVecs)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val served = Similarity.ivfSearch(assigned, queries, centroids)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))
    // the SAME trained index served in-memory (no retrain — Lloyd's
    // distributed summation is not ulp-deterministic across runs)
    val assigned2 = emb.join(Similarity.assignCids(spark, emb, trained), "vec_id")
    val direct = Similarity.ivfSearch(assigned2, queries, trained)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))
    assert(served.toSeq === direct.toSeq)
  }

  test("ann_topk recall verdict (declared IVF form) holds with slack on sf0.001") {
    val rows = Similarity.annRecall(spark, sf0001).collect()
    assert(rows.length === 5, "one verdict row per query vector")
    assert(rows.forall(_.getAs[Long]("n_exact") === 10L))
    assert(rows.forall(_.getAs[Boolean]("recall_ok")),
      "IVF recall must clear the declared bound (0.3, measured ≥ 0.4)")
  }

  test("annTopk achieves high recall vs exact simTopk on sf0.001") {
    val exact = Similarity.simTopk(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    val approx = Similarity.annTopk(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"multi-probe LSH recall $recall too low")
  }

  test("minhash signature agreement estimates jaccard (property)") {
    import org.apache.spark.sql.functions._
    val sh = MinHashDedup.shingleDocs(spark, sf0001)
    val sigs = sh.select(col("doc_id"),
      call_function("graft_minhash64", transform(col("shingles"), s => xxhash64(s))).as("sig"),
      col("shingles"))
    val pairs = sigs.as("a").join(sigs.as("b"), col("a.doc_id") < col("b.doc_id"))
      .withColumn("jac", size(array_intersect(col("a.shingles"), col("b.shingles"))).cast("double")
        / size(array_union(col("a.shingles"), col("b.shingles"))))
      .withColumn("agree", aggregate(
        zip_with(col("a.sig"), col("b.sig"), (x, y) => when(x === y, 1).otherwise(0)),
        lit(0), (s, x) => s + x).cast("double") / 64.0)
    // E[agreement] = jaccard: planted near-dups agree on almost all
    // positions, unrelated pairs on almost none
    val planted = pairs.filter(col("jac") >= 0.8)
    assert(planted.filter(col("agree") < 0.7).count() === 0)
    val unrelated = pairs.filter(col("jac") < 0.05).agg(avg("agree")).head().getDouble(0)
    assert(unrelated < 0.15, s"mean agreement on unrelated pairs was $unrelated")
  }

  test("embedDedup finds planted near-duplicate vectors, none elsewhere") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val base = (0 until 40).map(i => (i.toLong, Array.fill(32)(rng.nextGaussian())))
    // plant near-dups of vectors 0..4 under ids 1000..1004 (tiny perturbation)
    val dups = base.take(5).map { case (id, v) =>
      (id + 1000L, v.map(x => x + rng.nextGaussian() * 1e-4))
    }
    val emb = (base ++ dups).toDF("vec_id", "v")
    val pairs = Similarity.embedDedup(emb).collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    assert(pairs === (0L until 5L).map(i => (i, i + 1000L)).toSet)
  }

  test("embed_dedup recall check: planted rows all green, verdict frame covers corpus + plants") {
    val out = Similarity.embedDedupRecallCheck(spark, sf0001, plantCount = 20).collect()
    val n = graft.Tables.embeddings(spark, sf0001).count()
    assert(out.length === n + 20, "one verdict row per original + planted vector")
    assert(out.forall(_.getAs[Boolean]("recall_ok")),
      "bit-identical planted copies must be found by LSH — recall 1.0 by construction")
    // the planted ids are present and individually certified
    val planted = out.filter(_.getAs[Long]("vec_id") >= Similarity.PlantIdOffset)
    assert(planted.length === 20)
    spark.catalog.clearCache()
  }

  test("embedDedup on testdata embeddings finds no false near-dups") {
    val emb = graft.Tables.embeddings(spark, sf0001)
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("embedding").cast("array<double>").as("v"))
    // sf0.001 embeddings have no planted near-dup pairs (max pairwise cos ≈ 0.5)
    assert(Similarity.embedDedup(emb).count() === 0L)
  }

  test("langIdScore identifies real function-word text, und for markerless") {
    import spark.implicits._
    val df = Seq(
      ("en", "the cat is on the mat and the dog"),
      ("de", "der hund und die katze ist das tier"),
      ("fr", "le chat est sur la table et les chiens"),
      ("es", "el gato y la mesa es los perros"),
      ("und", "xylophone quartz bridge")).toDF("expected", "text")
      .withColumn("predicted", TextOps.langIdScore(col("text")))
    df.collect().foreach { r =>
      assert(r.getAs[String]("predicted") === r.getAs[String]("expected"),
        s"text: ${r.getAs[String]("text")}")
    }
  }

  test("text_stats ratios are consistent") {
    val out = TextOps.textStats(spark, sf0001)
    assert(out.filter("ttr > 1.0 OR ttr <= 0").count() === 0)
    assert(out.filter("stop_ratio < 0 OR stop_ratio > 1").count() === 0)
    assert(out.filter("n_types > n_tokens").count() === 0)
  }

  test("repetition fractions on crafted docs match hand counts") {
    import spark.implicits._
    val docs = Seq(
      // 25×"a": 24×"a a" → dup2 23/24, top2 1.0; 23×"a a a" → dup3 22/23
      (1L, Seq.fill(25)("a").mkString(" ")),
      // 24 distinct tokens: dup2 0, top2 1/23 < tau → keep
      (2L, (1 to 24).map(i => s"t$i").mkString(" ")),
      // "p q p q … p" (25 toks): 12×"p q" + 12×"q p" → dup2 22/24, top2 0.5
      (3L, Seq.tabulate(25)(i => if (i % 2 == 0) "p" else "q").mkString(" ")),
      // 4 tokens: has 2-grams but below the min-length gate → "short"
      (5L, "w x y z"),
      // single token: no 2-grams — dropped entirely
      (4L, "solo")
    ).toDF("doc_id", "text")
    val out = TextOps.repetition(docs).orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 5L))
    val byId = out.map(r => r.getLong(0) ->
      (r.getAs[Double]("dup2_frac"), r.getAs[Double]("top2_frac"),
        r.getAs[Double]("dup3_frac"), r.getAs[String]("verdict"))).toMap
    assert(byId(1L) == ((23.0 / 24, 1.0, 22.0 / 23, "drop")))
    assert(byId(2L) == ((0.0, 1.0 / 23, 0.0, "keep")))
    // 3-grams: 12×"p q p" + 11×"q p q" → dup3 21/23
    assert(byId(3L) == ((22.0 / 24, 0.5, 21.0 / 23, "drop")))
    assert(byId(5L) == ((0.0, 1.0 / 3, 0.0, "short")))
  }

  test("randomized cross-check: repetition fractions vs in-memory recount") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val docs = (1L to 60L).map { id =>
      val nTok = 2 + rnd.nextInt(40)
      val vocab = 1 + rnd.nextInt(6) // small vocab → real collisions
      (id, Seq.fill(nTok)(s"t${rnd.nextInt(vocab)}").mkString(" "))
    }
    val out = TextOps.repetition(docs.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r).toMap
    docs.foreach { case (id, text) =>
      val toks = text.split(" ", -1)
      def stats(n: Int) = {
        val grams = toks.sliding(n).filter(_.length == n).map(_.mkString(" ")).toSeq
        (grams.size, grams.distinct.size,
          if (grams.isEmpty) 0L else grams.groupBy(identity).values.map(_.size).max.toLong)
      }
      val (n2, d2, top2) = stats(2)
      val (n3, d3, _) = stats(3)
      val r = out(id)
      assert(r.getAs[Double]("dup2_frac") == (n2 - d2).toDouble / n2, s"doc $id dup2")
      assert(r.getAs[Double]("top2_frac") == top2.toDouble / n2, s"doc $id top2")
      val expDup3 = if (n3 == 0) 0.0 else (n3 - d3).toDouble / n3
      assert(r.getAs[Double]("dup3_frac") == expDup3, s"doc $id dup3")
    }
  }

  test("BPE-ish token classes split crafted mixed text correctly") {
    import spark.implicits._
    // "hello world42 foo-bar!! x3" → words {hello, world, foo, bar, x},
    // nums {42, 3}, punct runs {-, !!}; bpe = 5 + 2 + 2
    val r = Seq("hello world42 foo-bar!! x3").toDF("text")
      .select(
        TextOps.nMatches(col("text"), TextOps.BpePattern).as("n_bpe"),
        TextOps.nMatches(col("text"), TextOps.BpeWord).as("n_word"),
        TextOps.nMatches(col("text"), TextOps.BpeNum).as("n_num"),
        TextOps.nMatches(col("text"), TextOps.BpePunct).as("n_punct"))
      .head()
    assert(r.getInt(0) === 9)
    assert(r.getInt(1) === 5)
    assert(r.getInt(2) === 2)
    assert(r.getInt(3) === 2)
  }

  test("token_count classes partition every non-space char on real docs") {
    val out = TextOps.tokenCount(spark, sf0001)
    assert(out.filter("n_bpe != n_word + n_num + n_punct").count() === 0,
      "disjoint classes must partition the BPE-ish token stream")
    assert(out.filter("chars_per_tok <= 0").count() === 0)
  }

  test("doc_fingerprint digest is deterministic and fingerprints non-empty") {
    val a = TextOps.docFingerprint(spark, sf0001).collect()
    val b = TextOps.docFingerprint(spark, sf0001).collect()
    assert(a.sameElements(b))
    assert(a.forall(r => r.getInt(r.fieldIndex("n_fp")) > 0))
  }

  test("winnowPairs pairs docs sharing a long passage; disjoint docs stay unpaired") {
    import spark.implicits._
    spark.catalog.clearCache()
    // 146-char shared passage ≫ k+w−1 = 10: the winnowing theorem
    // guarantees shared fingerprints, and ~146/w distinct window minima
    // clear the minShared=5 bar with a wide margin
    val shared = "the quick brown fox jumps over the lazy dog while seventeen " +
      "zebras quietly examine forty two mysterious glowing artifacts near " +
      "the old stone bridge"
    val docs = Seq(
      (1L, s"unique preamble about gardens and rivers $shared"),
      (2L, s"$shared entirely different closing remarks follow here today"),
      (3L, "zzz qqq www eee rrr ttt yyy uuu iii ooo ppp fff ggg hhh jjj kkk"))
      .toDF("doc_id", "text")
    val pairs = TextOps.winnowPairs(docs)
    val got = pairs.collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 2L)),
      "exactly the passage-sharing pair, nothing touching the disjoint doc")
    assert(got.head.getLong(2) >= TextOps.WinnowMinShared)
    // the returned frame is the ONLY cache winnowPairs leaves behind —
    // the O(corpus) postings frame is freed internally via withCleanup
    pairs.unpersist(blocking = true)
    assert(spark.sharedState.cacheManager.isEmpty,
      "dropping the returned handle must leave a clean session")
  }

  test("winnowing fingerprints overlap for texts sharing long substrings only") {
    import spark.implicits._
    val base = "some long borrowed passage of at least ten chars"
    val df = Seq(
      (1L, s"prefix words $base suffix words"),
      (2L, s"$base completely different tail content here"),
      (3L, "nothing in common with anything else at all")).toDF("doc_id", "text")
      .select(col("doc_id"),
        call_function("graft_winnow", col("text"),
          lit(TextOps.WinnowK), lit(TextOps.WinnowW)).as("fps"))
    val pairs = df.as("a").join(df.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        arrays_overlap(col("a.fps"), col("b.fps")).as("o"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getBoolean(2)).toMap
    assert(pairs((1L, 2L)), "shared passage must share fingerprints")
    assert(!pairs((1L, 3L)) && !pairs((2L, 3L)),
      "unrelated texts must not collide")
  }
}
