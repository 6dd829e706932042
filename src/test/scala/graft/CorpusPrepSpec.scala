package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Sampling, Tables}
import graft.text.TextOps

/** Round-2 training-data-prep operators: chunking, PII redaction,
  * deterministic hash split, bigram vocabulary. */
class CorpusPrepSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  lazy val docs = Tables.documents(spark, sf).cache()

  test("chunking reassembles to the exact original text") {
    val rejoined = TextOps.chunkDocs(docs, 16)
      .groupBy(col("doc_id"))
      .agg(concat_ws(" ", array_sort(collect_list(struct(col("chunk_no"), col("chunk_text"))))
        .getField("chunk_text")).as("rebuilt"))
    val mismatches = docs.join(rejoined, "doc_id")
      .filter(col("text") =!= col("rebuilt")).count()
    assert(mismatches == 0, "concatenating ordered chunks must restore the document")
  }

  test("chunk sizes: k tokens everywhere except the last chunk; totals add up") {
    val c = TextOps.chunkDocs(docs, 16).cache()
    val perDoc = c.groupBy(col("doc_id"))
      .agg(max(col("chunk_no")).as("last"), sum(col("n_tokens")).as("total"))
    // non-terminal chunks are exactly k tokens
    val short = c.join(perDoc, "doc_id")
      .filter(col("chunk_no") < col("last") && col("n_tokens") =!= 16).count()
    assert(short == 0, "only the final chunk may be short")
    // token totals match the tokenizer
    val bad = perDoc.join(
        docs.select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n")),
        "doc_id")
      .filter(col("total") =!= col("n")).count()
    assert(bad == 0, "chunk token counts must sum to the document token count")
    c.unpersist()
  }

  test("PII redaction: emails and phones replaced, counts exact") {
    val pii = Seq(
      (1L, "contact me at jane.doe+x@example-mail.com or 604-555-1234 thanks"),
      (2L, "no pii here at all"),
      (3L, "two mails a@b.io c.d@e.org and 555 123 4567 phone")).toDF("doc_id", "text")
    val out = TextOps.redactPii(pii).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) == ((1L, 1L)) && out(2L) == ((0L, 0L)) && out(3L) == ((2L, 1L)))
    val redacted = pii.select(col("doc_id"),
      regexp_replace(regexp_replace(col("text"), TextOps.EmailRe, "[EMAIL]"),
        TextOps.PhoneRe, "[PHONE]").as("r"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(redacted(1L) == "contact me at [EMAIL] or [PHONE] thanks")
    assert(redacted(3L).contains("[EMAIL] [EMAIL] and [PHONE] phone"))
  }

  test("hash split is deterministic, exhaustive, and ~trainFrac") {
    val a = Sampling.hashSplit(docs, "doc_id", "s42", 0.8).select("doc_id", "split")
    val b = Sampling.hashSplit(docs, "doc_id", "s42", 0.8).select("doc_id", "split")
    assert(a.exceptAll(b).count() == 0, "same salt must give identical assignment")
    val n = docs.count().toDouble
    val train = a.filter(col("split") === "train").count().toDouble
    assert(math.abs(train / n - 0.8) < 0.08, s"train fraction ${train / n} far from 0.8")
    // different salt reshuffles the assignment
    val c = Sampling.hashSplit(docs, "doc_id", "other", 0.8).select("doc_id", "split")
    assert(a.exceptAll(c).count() > 0, "salt must change the assignment")
  }

  test("sampleByHash(frac) is a subset of hashSplit train at the same salt/frac") {
    val sampled = Sampling.sampleByHash(docs, "doc_id", "s42", 0.8).select("doc_id")
    val train = Sampling.hashSplit(docs, "doc_id", "s42", 0.8)
      .filter(col("split") === "train").select("doc_id")
    assert(sampled.exceptAll(train).count() == 0)
    assert(sampled.count() == train.count())
  }

  test("bigram vocabulary: golden counts on a tiny corpus") {
    val tiny = Seq((1L, "a b a b c"), (2L, "a b"), (3L, "x")).toDF("doc_id", "text")
    val rows = TextOps.bigramVocab(tiny, 1).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // doc1: "a b","b a","a b","b c"; doc2: "a b"; doc3 too short
    assert(rows == Map("a b" -> 3L, "b a" -> 1L, "b c" -> 1L))
  }

  test("vocab encoding: frequency-ranked ids, OOV zero, order preserved") {
    val tiny = Seq((1L, "a b a"), (2L, "b c"), (3L, "a")).toDF("doc_id", "text")
    // counts: a=3, b=2, c=1; minCount=2 -> vocab a->1, b->2; c is OOV
    val rows = TextOps.encodeCorpus(tiny, 2).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(rows == Map(
      1L -> (3L, 0L, "1 2 1"),
      2L -> (2L, 1L, "2 0"),
      3L -> (1L, 0L, "1")))
  }

  test("repetition stats: golden fractions on known documents") {
    val tiny = Seq(
      (1L, "a a a a"),       // 4 tokens, 1 distinct; bigrams: "a a" x3
      (2L, "a b c d"),       // all distinct; top bigram 1/3
      (3L, "x")).toDF("doc_id", "text") // single token: no bigrams
    val rows = TextOps.repetitionStats(tiny).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getAs[Double]("dup_token_frac") == 0.75)
    assert(rows(1L).getAs[Long]("top_bigram_cnt") == 3L)
    assert(rows(1L).getAs[Double]("top_bigram_frac") == 1.0)
    assert(rows(2L).getAs[Double]("dup_token_frac") == 0.0)
    assert(math.abs(rows(2L).getAs[Double]("top_bigram_frac") - 0.333333) < 1e-9)
    assert(rows(3L).getAs[Long]("n_bigrams") == 0L &&
      rows(3L).isNullAt(rows(3L).fieldIndex("top_bigram_frac")))
  }

  test("contamination: overlapping shingles found, clean docs zero") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps high"), // shares "the quick brown"+"quick brown fox"
      (2L, "totally unrelated text goes here")).toDF("doc_id", "text")
    val eval = Seq((100L, "the quick brown fox")).toDF("doc_id", "text")
    val rows = graft.dedup.Dedup.contamination(corpus, eval, 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows(1L) == ((4L, 2L)), s"doc 1: 4 shingles, 2 contaminated: $rows")
    assert(rows(2L) == ((3L, 0L)))
  }

  test("unigram logprob: uniform corpus scores ln(1/V) everywhere") {
    // 4 tokens, each appearing once → p = 1/4 for every token
    val tiny = Seq((1L, "a b"), (2L, "c d")).toDF("doc_id", "text")
    val rows = TextOps.unigramLogProb(tiny).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("avg_logprob")).toMap
    val expected = BigDecimal(math.log(0.25)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(rows.values.forall(v => math.abs(v - expected) < 1e-9), s"$rows vs $expected")
  }

  test("mixture sample: weight-1 domains survive whole, weight-0 vanish, rest thin out") {
    val weights = Map("src0" -> 1.0, "src3" -> 0.0, "src1" -> 0.5)
    val kept = Sampling.mixtureSample(docs, "source", "doc_id", "mix", weights, default = 0.75)
      .groupBy(col("source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val per = docs.groupBy(col("source")).count().first().getLong(1)
    assert(kept("src0") == per, "weight 1.0 must keep every row")
    assert(!kept.contains("src3"), "weight 0.0 must drop the domain")
    assert(kept("src1") > 0 && kept("src1") < per, "fractional weight must thin, not empty")
    // deterministic: the same call draws the same rows
    val a = Sampling.mixtureSample(docs, "source", "doc_id", "mix", weights).select("doc_id")
    assert(a.exceptAll(Sampling.mixtureSample(docs, "source", "doc_id", "mix", weights)
      .select("doc_id")).count() == 0)
  }

  test("temperature sample: min group survives whole, shares flatten toward sqrt(n)") {
    val kept = Sampling.temperatureSample(docs, "lang", "doc_id", "temp")
      .groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val in = docs.groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nMin = in.values.min
    def isqrt(n: Long): Long = { val s = math.sqrt(n.toDouble).toLong
      if (s * s > n) s - 1 else if ((s + 1) * (s + 1) <= n) s + 1 else s }
    in.foreach { case (g, n) =>
      if (isqrt(n) == isqrt(nMin)) assert(kept(g) == n, s"min-weight group $g keeps all")
      else {
        // expected keep fraction isqrt(nMin)/isqrt(n) within md5 sampling noise
        val exp = n.toDouble * isqrt(nMin) / isqrt(n)
        assert(math.abs(kept(g) - exp) <= 4 * math.sqrt(exp) + 4,
          s"$g kept=${kept(g)} expected≈$exp of $n")
      }
    }
    // deterministic
    val a = Sampling.temperatureSample(docs, "lang", "doc_id", "temp").select("doc_id")
    assert(a.exceptAll(Sampling.temperatureSample(docs, "lang", "doc_id", "temp")
      .select("doc_id")).count() == 0)
  }

  test("pack shards: greedy first-fit invariant holds for every document") {
    val budget = 512L
    val packed = TextOps.packShards(docs, budget).cache()
    assert(packed.count() == docs.count(), "every document gets a shard")
    // recompute the running sum locally per source and check the rule
    packed.collect().groupBy(_.getString(1)).foreach { case (_, rows) =>
      var cum = 0L
      rows.sortBy(_.getLong(0)).foreach { r =>
        assert(r.getLong(3) == cum / budget,
          s"doc ${r.getLong(0)}: shard ${r.getLong(3)} != ${cum / budget}")
        cum += r.getLong(2)
      }
    }
    packed.unpersist()
  }

  test("epoch shuffle: each epoch is a full permutation; epochs differ; order matches the hash rank") {
    val out = Sampling.epochShuffle(docs, "doc_id", "s42", 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = docs.count()
    val byEpoch = out.groupBy(_._1)
    assert(byEpoch.keySet == Set(0L, 1L))
    byEpoch.foreach { case (_, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (1L to n).toSeq, "positions must be 1..n")
      assert(rows.map(_._3).toSet == docs.collect().map(_.getAs[Long]("doc_id")).toSet)
    }
    // the bucketed two-phase numbering equals the plain global rank
    val e0 = byEpoch(0L).sortBy(_._2).map(_._3).toSeq
    val expected = docs.collect().map(_.getAs[Long]("doc_id"))
      .map(id => (org.apache.commons.codec.digest.DigestUtils.md5Hex(s"$id|s42:0").take(8), id))
      .sortBy(identity).map(_._2).toSeq
    assert(e0 == expected)
    assert(e0 != byEpoch(1L).sortBy(_._2).map(_._3).toSeq, "epochs must reshuffle")
  }

  test("distinctive terms: exclusive tokens outrank shared ones; k bounds per source") {
    val d = Seq(
      (1L, "sA", "zebra zebra zebra common common"),
      (2L, "sA", "zebra common common"),
      (3L, "sB", "yak yak common common"),
      (4L, "sB", "yak common common common"))
      .toDF("doc_id", "source", "text")
    val out = TextOps.distinctiveTerms(d, 2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val bySrc = out.groupBy(_._1)
    assert(bySrc.keySet == Set("sA", "sB"))
    bySrc.values.foreach(rows => assert(rows.length <= 2 &&
      rows.map(_._5).sorted.toSeq == (1L to rows.length).toSeq))
    // the source-exclusive token ranks first in each source
    assert(bySrc("sA").minBy(_._5)._2 == "zebra")
    assert(bySrc("sB").minBy(_._5)._2 == "yak")
    // hand-check sA/zebra: cnt=4, tot_s=8, cnt_rest=0, tot_rest=8
    // → (1e6·4·8) div (8·(0+1)) = 4000000
    val z = bySrc("sA").find(_._2 == "zebra").get
    assert((z._3, z._4) == (4L, 4000000L))
    // corpus run stays bounded and ordered
    val corpus = TextOps.distinctiveTerms(docs, 10).collect()
    assert(corpus.nonEmpty)
    assert(corpus.groupBy(_.getString(0)).values.forall(_.length <= 10))
  }

  test("source overlap: mirrored sources share exactly their mirrored fingerprints") {
    val mirrored = docs.filter(col("doc_id") % 3 === 0)
      .withColumn("source", concat(lit("m_"), col("source")))
      .withColumn("doc_id", col("doc_id") + 1000L)
    val out = graft.text.TextOps.sourceOverlap(docs.unionByName(mirrored)).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (a, b, common, fa, fb) = (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4))
      assert(a < b, "pairs must be ordered once")
      assert(common >= 1 && common <= math.min(fa, fb))
      assert(r.getDouble(5) == common.toDouble / (fa + fb - common))
    }
    // a mirror pair's common count equals the mirrored doc's distinct fps
    val bySrc = docs.filter(col("doc_id") % 3 === 0)
      .select(graft.text.TextOps.fingerprint(col("text")).as("fp"), col("source"))
      .distinct().collect().groupBy(_.getString(1)).map { case (s, rs) => s -> rs.length }
    val pairs = out.map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    bySrc.foreach { case (s, nfp) =>
      val key = if (s < s"m_$s") (s, s"m_$s") else (s"m_$s", s)
      // the mirror's fp set is a subset of the source's, so the
      // intersection is exactly the mirror's size
      assert(pairs.get(key).contains(nfp.toLong), s"mirror pair for $s wrong: ${pairs.get(key)}")
    }
  }

  test("bigram NLL: every doc scored, scores positive, LM laws hold") {
    val out = graft.text.LanguageModel.bigramNll(docs).collect()
    assert(out.length == docs.count(), "every document gets a score")
    out.foreach { r =>
      val (n, nll, perTok) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(n >= 1)
      assert(nll > 0, "add-1 NLL is strictly positive (num < den in every term)")
      assert(perTok == nll / n, "per-token score is floor division")
    }
    // identical duplicate docs must score identically (pure function of
    // (corpus counts, text)); build a corpus with a known repetition
    val dup = spark.createDataFrame(Seq(
      (0L, "a b a b"), (1L, "a b a b"), (2L, "c d"), (3L, "a b c d")
    )).toDF("doc_id", "text")
    val scored = graft.text.LanguageModel.bigramNll(dup).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(scored(0L) == scored(1L), "equal text ⇒ equal NLL")
    // the frequent pattern (a b: seen 5x) must beat the rare one (c d:
    // 2x) per token — the filter-signal direction the operator exists for
    val perTok = graft.text.LanguageModel.bigramNll(dup).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(perTok(0L) < perTok(2L),
      s"frequent bigrams must score cheaper per token: ${perTok(0L)} vs ${perTok(2L)}")
  }

  test("slice-trained NLL: self-training matches, OOV text pays the floor") {
    import graft.text.LanguageModel
    // training on the whole corpus must reproduce bigramNll exactly —
    // the OOV left-join path degenerates to the inner-join path when
    // every key is in vocabulary
    val self = LanguageModel.bigramNllFrom(docs, docs).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val base = LanguageModel.bigramNll(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(self == base, "bigramNllFrom(docs, docs) must equal bigramNll(docs)")
    // a corpus with an in-domain and an out-of-domain doc: the OOV doc
    // must score strictly higher per token (the domain-distance signal)
    val train = spark.createDataFrame(Seq(
      (0L, "the cat sat on the mat"), (1L, "the dog sat on the rug")
    )).toDF("doc_id", "text")
    val score = spark.createDataFrame(Seq(
      (10L, "the cat sat on the rug"), (11L, "zq xv qqq zz vv xx")
    )).toDF("doc_id", "text")
    val out = LanguageModel.bigramNllFrom(train, score).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out(10L) < out(11L),
      s"OOV text must pay more per token: ${out(10L)} vs ${out(11L)}")
  }

  test("gopher rules: each rule fires on its designed violation") {
    import graft.text.QualityRules
    // 12 distinct words/repeat (modal count stays 5/60 ≤ 20%), mean
    // word length 43/12 ≈ 3.6 ∈ [3,10], stopwords {the, and, in}
    val good = ("the cats and dogs sat upon some mats in his sunny yard " * 5).trim
    val fixture = spark.createDataFrame(Seq(
      (0L, good),                                  // passes everything
      (1L, "too short"),                           // ok_len fails
      (2L, good + " " + Seq.fill(40)("x").mkString(" ")), // mean word len < 3
      (3L, good + " " + Seq.fill(20)("9 9 #").mkString(" ")), // alpha+symbol fail
      (4L, Seq.fill(60)("lorem").mkString(" ")),   // no stopwords + repetition
      (5L, good + " " + Seq.fill(30)("the").mkString(" ")) // modal token > 20%
    )).toDF("doc_id", "text")
    val out = QualityRules.gopherRules(fixture, minTok = 50, maxTok = 100000)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7), r.getLong(8))).toMap
    assert(out(0L) == ((1L, 1L, 1L, 1L, 1L, 1L, 1L)), s"clean doc: ${out(0L)}")
    assert(out(1L)._1 == 0L, "short doc must fail ok_len")
    assert(out(2L)._2 == 0L, s"1-char padding must fail ok_wordlen: ${out(2L)}")
    assert(out(3L)._3 == 0L && out(3L)._5 == 0L,
      s"digit+symbol flood must fail ok_alpha and ok_symbol: ${out(3L)}")
    assert(out(4L)._4 == 0L && out(4L)._6 == 0L,
      s"stopword-free repetition must fail ok_stop and ok_repeat: ${out(4L)}")
    assert(out(5L)._6 == 0L, s"modal-token flood must fail ok_repeat: ${out(5L)}")
    assert(out.filter(_._1 != 0L).forall(_._2._7 == 0L),
      "every violating doc must fail the conjunction")
  }
}
