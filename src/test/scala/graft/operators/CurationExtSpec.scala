package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** r12 curation-family extensions: PII redaction, weighted domain mixing,
  * exact substring dedup, and their composition into Curation.curate. The
  * declared keys are oracle-gated at sf0.01; these specs pin the semantics
  * on crafted inputs where ground truth is hand-checkable. */
class CurationExtSpec extends SparkSpec {

  test("redact: per-class counts and placeholders on crafted PII") {
    import spark.implicits._
    val docs = Seq(
      (1L, "mail me at bob@example.com or alice.smith+tag@sub.domain.org now"),
      (2L, "server 192.168.0.1 and 10.0.0.255 up"),
      (3L, "call +14155550123 or 415-555-0123"),
      (4L, "clean text no pii"),
      (5L, "mixed bob@x.io at 1.2.3.4 dial 555-123-4567")).toDF("doc_id", "text")
    val r = Redact.redact(docs)
      .select("doc_id", "n_email", "n_ip", "n_phone", "n_redactions", "clean")
      .collect().map(x => x.getLong(0) ->
        (x.getInt(1), x.getInt(2), x.getInt(3), x.getInt(4), x.getString(5))).toMap
    assert(r(1L)._1 === 2 && r(1L)._4 === 2)
    assert(r(1L)._5 === s"mail me at ${Redact.EmailTag} or ${Redact.EmailTag} now")
    assert(r(2L)._2 === 2 && r(2L)._5 === s"server ${Redact.IpTag} and ${Redact.IpTag} up")
    assert(r(3L)._3 === 2 && r(3L)._5 === s"call ${Redact.PhoneTag} or ${Redact.PhoneTag}")
    assert(r(4L)._4 === 0 && r(4L)._5 === "clean text no pii")
    assert(r(5L) === ((1, 1, 1, 3,
      s"mixed ${Redact.EmailTag} at ${Redact.IpTag} dial ${Redact.PhoneTag}")))
  }

  test("redact: class order is sequential — a phone-shaped email local part is one email") {
    import spark.implicits._
    val r = Redact.redact(Seq((1L, "reach 123-456-7890@example.com today"))
      .toDF("doc_id", "text")).collect()(0)
    assert(r.getAs[Int]("n_email") === 1 && r.getAs[Int]("n_phone") === 0)
    assert(r.getAs[String]("clean") === s"reach ${Redact.EmailTag} today")
  }

  test("domain_mix: two-phase prefix sum ≡ naive per-domain cumsum; budgets honored") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // 4 domains × ~1250 docs with varying token counts; domain "d" unbudgeted
    val docs = spark.range(5000)
      .select(col("id").as("doc_id"),
        element_at(typedLit(Seq("a", "b", "c", "d")), (pmod(col("id"), lit(4)) + 1).cast("int")).as("dom"),
        (pmod(xxhash64(col("id")), lit(50)) + 1).as("n_tok"))
    val budgets = Seq("a" -> 5000L, "b" -> 800L, "c" -> 2000000L)
    val got = DomainMix.mix(docs, "dom", "n_tok", budgets)
      .select("dom", "doc_id", "n_tok", "tok_start")
    // naive oracle: one window per domain, selection by exclusive cumsum
    val w = Window.partitionBy("dom").orderBy("skey", "doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bdf = budgets.toDF("dom", "budget")
    val want = docs.join(broadcast(bdf), "dom")
      .withColumn("skey", md5(concat(col("doc_id").cast("string"), lit(DomainMix.MixSalt))))
      .withColumn("tok_start", sum("n_tok").over(w) - col("n_tok"))
      .filter(col("tok_start") < col("budget"))
      .select("dom", "doc_id", "n_tok", "tok_start")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "two-phase selection must equal the naive per-domain cumsum")
    // budget semantics: each truncated domain fills to ≥ budget (boundary
    // doc included), the over-budgeted domain keeps all docs, the
    // unbudgeted domain is dropped
    val sums = got.groupBy("dom").agg(sum("n_tok").as("toks"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(sums("a")._1 >= 5000L && sums("b")._1 >= 800L)
    assert(sums("c")._2 === 1250L, "over-budget domain must keep every doc")
    assert(!sums.contains("d"), "unbudgeted domain must be dropped")
    // minimality: dropping each truncated domain's LAST selected doc goes under budget
    Seq("a" -> 5000L, "b" -> 800L).foreach { case (d, b) =>
      val last = got.filter(col("dom") === d).orderBy(desc("tok_start")).limit(1)
        .collect()(0)
      assert(last.getAs[Long]("tok_start") < b,
        s"$d: every selected doc must start inside the budget")
      assert(sums(d)._1 - last.getAs[Long]("n_tok") < b,
        s"$d: selection must be minimal — one fewer doc underfills the budget")
    }
  }

  test("substring_dedup: planted cross-doc passage, within-doc repeat, short docs") {
    import spark.implicits._
    // L = 8. d1/d2 share a 10-token passage at positions 6..15 (tokens
    // unique to the pair elsewhere); d3 repeats an 8-token block at
    // positions 1..8 and 10..17 (gap 9 > L → two separate regions);
    // d4 is shorter than L; d5 is all-unique noise.
    val s10 = (1 to 10).map(j => s"s$j").mkString(" ")
    val r8 = (1 to 8).map(j => s"r$j").mkString(" ")
    val docs = Seq(
      (1L, s"u1 u2 u3 u4 u5 $s10 v1 v2 v3 v4 v5"),
      (2L, s"w1 w2 w3 w4 w5 $s10 x1 x2 x3 x4 x5"),
      (3L, s"$r8 mid $r8"),
      (4L, "tiny doc"),
      (5L, (1 to 30).map(j => s"n$j").mkString(" "))).toDF("doc_id", "text")
    val spans = SubstringDedup.duplicatedSpans(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(spans === Set(
      (1L, 6L, 15L, 10L), (2L, 6L, 15L, 10L),
      (3L, 1L, 8L, 8L), (3L, 10L, 17L, 8L)))
  }

  test("substring_dedup: abutting duplicated windows merge into one region") {
    import spark.implicits._
    // one 20-token passage duplicated across two docs → consecutive
    // duplicated window positions 3..15 merge into a single (3, 22) region
    val p = (1 to 20).map(j => s"p$j").mkString(" ")
    val docs = Seq(
      (1L, s"a1 a2 $p a3 a4"), (2L, s"b1 b2 $p b3 b4")).toDF("doc_id", "text")
    val spans = SubstringDedup.duplicatedSpans(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(spans === Set((1L, 3L, 22L, 20L), (2L, 3L, 22L, 20L)))
  }

  test("substring_drop: cut text keeps exactly the out-of-region tokens, in order") {
    import spark.implicits._
    // d1/d2 share a 10-token passage at positions 6..15; d3 has no dups;
    // d4/d5 are exact duplicates → fully covered → everything cut
    val s10 = (1 to 10).map(j => s"s$j").mkString(" ")
    val whole = (1 to 12).map(j => s"w$j").mkString(" ")
    val docs = Seq(
      (1L, s"u1 u2 u3 u4 u5 $s10 v1 v2 v3 v4 v5"),
      (2L, s"w1 w2 w3 w4 w5 $s10 x1 x2 x3 x4 x5"),
      (3L, (1 to 10).map(j => s"n$j").mkString(" ")),
      (4L, whole), (5L, whole)).toDF("doc_id", "text")
    val got = SubstringDedup.dropDuplicatedSpans(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    def fp(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got(1L) === ((20L, 10L, fp("u1 u2 u3 u4 u5 v1 v2 v3 v4 v5"))))
    assert(got(2L) === ((20L, 10L, fp("w1 w2 w3 w4 w5 x1 x2 x3 x4 x5"))))
    assert(got(3L) === ((10L, 10L, fp((1 to 10).map(j => s"n$j").mkString(" ")))),
      "span-free docs must pass through uncut")
    assert(got(4L) === ((12L, 0L, fp(""))) && got(5L) === got(4L),
      "fully-duplicated docs cut to empty")
  }

  test("substring dedup randomized cross-check: operator spans equal brute-force recompute") {
    import spark.implicits._
    val L = SubstringDedup.SpanL
    // small vocab + short docs force genuine cross/within-doc window
    // collisions; the oracle here is an INDEPENDENT in-test recompute
    // (hash-free window comparison, different merge implementation)
    val rnd = new scala.util.Random(4242)
    val corpus = (0 until 40).map { id =>
      (id.toLong, Seq.fill(12 + rnd.nextInt(14))("t" + rnd.nextInt(6)).mkString(" "))
    }
    val got = SubstringDedup.duplicatedSpans(corpus.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // brute force: all window occurrences by token-content key
    val windows = corpus.flatMap { case (id, text) =>
      val toks = text.split(" ")
      (0 to toks.length - L).map(i => (toks.slice(i, i + L).toSeq, id, i + 1L))
    }
    val dupPos = windows.groupBy(_._1).filter(_._2.size >= 2).values.flatten
      .map(w => (w._2, w._3)).toSet
    val want = dupPos.groupBy(_._1).flatMap { case (id, ps) =>
      val sorted = ps.map(_._2).toSeq.sorted
      // independent merge: fold positions into regions on the gap-L rule
      sorted.foldLeft(List.empty[(Long, Long)]) {
        case (acc, p) if acc.nonEmpty && p - acc.head._2 <= L =>
          (acc.head._1, p) :: acc.tail
        case (acc, p) => (p, p) :: acc
      }.map { case (s, e) => (id, s, e + L - 1, e + L - s) }
    }.toSet
    assert(got === want, s"operator=${got.size} brute=${want.size} spans")
  }

  test("curate composition: lmFilter drops off-model docs between quality gate and dedup") {
    import spark.implicits._
    // reference model: function words + common tokens (quality-gate-friendly)
    val ref = Seq((1L, "the a alpha beta gamma the a delta epsilon zeta"),
      (2L, "a the alpha delta beta the a epsilon gamma zeta"))
      .toDF("doc_id", "text")
    val (model, oov) = LmScore.collectModel(LmScore.trainModel(ref))
    // both docs pass the heuristic gate (stopwords + diversity) AND sit in
    // the md5 train shard (ids 11 and 20 — curate includes the split, so
    // id choice matters); doc 20's vocabulary is off-model so its mean
    // log-prob sits at the OOV floor
    val docs = Seq(
      (11L, "the a alpha beta gamma delta epsilon zeta the a"),
      (20L, "the a qq ww ee rr tt yy uu ii"))
      .toDF("doc_id", "text")
    val gateOnly = Curation.curate(docs).select("doc_id").as[Long].collect().sorted
    assert(gateOnly.toSeq === Seq(11L, 20L), "both must pass the heuristic gate")
    // cutoff between the two docs' scores (scores are deterministic; pick
    // the midpoint computed from the operator itself)
    val scores = LmScore.scoreKernel(docs, model, oov)
      .select("doc_id", "lp_mean").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores(11L) > scores(20L))
    val cutoff = (scores(11L) + scores(20L)) / 2
    val filtered = Curation.curate(docs, lmFilter = Some((model, oov, cutoff)))
      .select("doc_id").as[Long].collect().sorted
    assert(filtered.toSeq === Seq(11L), "the off-model doc must die at the LM filter")
  }

  test("curate composition: dsirFilter keeps target-like docs, drops off-target ones") {
    import spark.implicits._
    // target model trained on function-word-heavy reference text; the
    // raw corpus is the union of target-like and junk-vocabulary docs
    // junk class = keyword-list spam with no function words, so the
    // function-word buckets stay target-leaning under add-one smoothing
    // (at this fixture size the +B smoothing term dominates raw counts;
    // the 1M-doc probe covers the large-count regime)
    val corpus = Seq(
      (true, "the a alpha beta gamma delta the a epsilon zeta"),
      (true, "a the alpha delta beta epsilon the a gamma zeta"),
      (false, "qq ww ee rr tt yy qq ww uu ii"),
      (false, "ww rr qq tt ii uu ee yy qq ww"))
      .toDF("is_target", "text")
    val (weights, oov) = Dsir.trainWeights(corpus)
    // both docs pass the heuristic gate and sit in the train shard (ids
    // 11/20 — the lmFilter spec's choice); 20's vocabulary is junk-class
    val docs = Seq(
      (11L, "the a alpha beta gamma delta epsilon zeta the a"),
      (20L, "the a qq ww ee rr tt yy uu ii"))
      .toDF("doc_id", "text")
    val gateOnly = Curation.curate(docs).select("doc_id").as[Long].collect().sorted
    assert(gateOnly.toSeq === Seq(11L, 20L), "both must pass the heuristic gate")
    val selected = Curation.curate(docs, dsirFilter = Some((weights, oov)))
      .select("doc_id").as[Long].collect().sorted
    spark.catalog.clearCache()
    assert(selected.toSeq === Seq(11L), "the off-target doc must die at the DSIR stage")
  }

  test("curate composition: redactPii dedups docs that differ only in PII") {
    import spark.implicits._
    val base = "the a the a b c d e f g"
    val docs = Seq(
      (1L, s"$base mail bob@example.com"),
      (2L, s"$base mail eve@other.org")).toDF("doc_id", "text")
    val plain = Curation.curate(docs).select("doc_id").collect().map(_.getLong(0)).toSet
    val scrubbed = Curation.curate(docs, redactPii = true)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    spark.catalog.clearCache()
    assert(plain === Set(1L, 2L), "distinct PII → distinct fingerprints without redaction")
    assert(scrubbed === Set(1L), "redacted twins must collapse to the lower doc_id")
  }

  test("curate composition: mixBudgets bounds per-domain training tokens") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf0001).select("doc_id", "text", "lang")
    val budgets = Seq("en" -> 400L, "de" -> 200L)
    val out = Curation.curate(docs, mixBudgets = Some(budgets))
    val byLang = out.join(docs.select("doc_id", "lang"), "doc_id")
      .groupBy("lang").agg(sum("n_tok").as("toks"), max("n_tok").as("biggest"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    spark.catalog.clearCache()
    assert(byLang.keySet.subsetOf(Set("en", "de")), s"unbudgeted langs leaked: $byLang")
    budgets.foreach { case (lang, b) =>
      byLang.get(lang).foreach { case (toks, biggest) =>
        // budget overshoot is bounded by the boundary doc
        assert(toks - biggest < b, s"$lang: ${toks} tokens vs budget $b")
      }
    }
    // the packed offsets stay contiguous after the mix stage
    val chain = out.orderBy("doc_id").collect()
    chain.foldLeft(0L) { (expect, r) =>
      assert(r.getAs[Long]("start_tok") === expect, s"offset chain broke at $r")
      expect + r.getAs[Long]("n_tok")
    }
  }
}
