package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.Num

/** Text-analysis operators over the `documents` table — the north-star
  * training-data-pipeline surface (builder prompt; SURVEY.md §7.1 text/).
  *
  * The corpus is whitespace-separated tokens, so `split(text, ' ')` is the
  * exact tokenizer; a BPE-ish regex tokenizer is provided for realistic
  * text. Everything is built from codegen'd `functions._` + higher-order
  * functions — no UDFs — so at 100 TB these stay inside whole-stage
  * codegen with the parquet scan pruned to (doc_id, text).
  */
object TextOps {

  /** Exact whitespace tokenization. */
  def tokens(text: Column): Column = split(text, " ")

  /** Positional n-grams of an array column, elements joined by `sep`:
    * ngrams([a,b,c,d], 2, " ") = ["a b", "b c", "c d"]; arrays shorter
    * than n yield []. Built by zipping the array with its shifts so
    * every HOF lambda touches ONLY its element arguments — indexing a
    * captured expression from a lambda body (slice/element_at on the
    * tokenization) re-evaluates that expression PER ELEMENT, which made
    * the original form quadratic per document (the q107 lesson:
    * 73 s → 2 s; this shared form measured 5× on shingles). `arr` is
    * evaluated n times per row (once per shift) — keep n small or pass
    * a materialized column. */
  def ngrams(arr: Column, n: Int, sep: String): Column = {
    require(n >= 1, s"ngrams: n must be >= 1 (got $n)")
    val len = size(arr)
    val joined = (2 to n).foldLeft(arr) { (acc, s) =>
      zip_with(acc, slice(arr, lit(s), greatest(len - (s - 1), lit(0))),
        (a, b) => concat(a, lit(sep), b))
    }
    slice(joined, lit(1), greatest(len - (n - 1), lit(0)))
  }

  /** BPE-ish tokenizer for realistic text: lowercase word pieces,
    * numbers, and single punctuation marks. */
  def regexTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))

  /** Per-document token counting. */
  def tokenCounts(documents: DataFrame): DataFrame =
    documents.select(
        col("doc_id"),
        size(tokens(col("text"))).cast("long").as("n_tokens"),
        length(col("text")).cast("long").as("n_chars_computed"),
        col("n_chars"))
      .orderBy(col("doc_id"))

  /** Small English stopword list used by the quality score. */
  val Stopwords: Seq[String] = Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  /** Quality scoring: token stats + stopword ratio + mean word length —
    * the length/punct/stopword-ratio family, all integer-exact until the
    * final division. */
  def qualityScores(documents: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val nTok = size(toks).cast("long")
    val stopArr = array(Stopwords.map(lit): _*)
    val nStop = size(filter(toks, t => array_contains(stopArr, t))).cast("long")
    // sum of word lengths = chars - separators
    val sumWordLen = (length(col("text")) - (size(toks) - 1)).cast("long")
    documents.select(
        col("doc_id"), col("lang"),
        nTok.as("n_tokens"),
        nStop.as("n_stopwords"),
        (nStop.cast("double") / nTok).as("stopword_ratio"),
        (sumWordLen.cast("double") / nTok).as("avg_word_len"))
      .orderBy(col("doc_id"))
  }

  /** Canonical document fingerprint: md5 of whitespace-normalized,
    * lowercased text (md5 keeps it oracle-portable). */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(text, "\\s+", " ")))

  /** Order-sensitive rolling (Karp-Rabin-style) fingerprint: left fold
    * of `h = h*B + xxhash64(token)` over the token sequence, wrapping in
    * long arithmetic. Unlike the bag-of-words SimHash, a token
    * permutation changes this hash — the sequence-identity complement to
    * [[fingerprint]]. Pure HOF fold, codegen'd. */
  def rollingHash(text: Column): Column = {
    // mod-p arithmetic keeps h*B + t within long range (ANSI mode
    // rejects wrapping overflow): p = 2^31-1, B = 1000003
    val p = lit(2147483647L)
    aggregate(transform(tokens(text), t => pmod(xxhash64(t), p)),
      lit(0L), (acc, h) => pmod(acc * lit(1000003L) + h, p))
  }

  /** Fingerprint every doc; duplicate fingerprints share a canonical
    * min-doc representative. */
  def fingerprints(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"), fingerprint(col("text")).as("fp"))
      .withColumn("canonical_doc",
        min(col("doc_id")).over(org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))))
      .orderBy(col("doc_id"))

  /** Language-ID by stopword evidence: score each candidate language by
    * counts of its marker words, pick argmax (n-gram-heuristic family).
    * The synthetic corpus shares one vocabulary across `lang` labels, so
    * this is exercised for mechanics, not accuracy. */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "is"),
    "es" -> Seq("el", "la", "de", "que"),
    "fr" -> Seq("le", "la", "et", "les"),
    "de" -> Seq("der", "die", "und", "das"),
    "zh" -> Seq("的", "是", "了", "在"))

  /** Character-trigram profiles for [[langIdNgram]] — the classic
    * Cavnar–Trenkle n-gram-profile heuristic with tiny hand profiles
    * (trigrams of each language's function words, space-padded).
    * Deterministic integer evidence → oracle-portable, unlike model
    * scores. */
  val TrigramProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "he ", " th", "and", "nd ", " an", " of", "of ", " is", "is "),
    "es" -> Seq(" el", "el ", " la", "la ", " de", "de ", "que", " qu", "ue "),
    "fr" -> Seq(" le", "le ", " la", "la ", " et", "et ", "les", "es "),
    "de" -> Seq("der", "er ", " de", "die", "ie ", " di", "und", "nd ", " un"))

  /** Language-ID by character-trigram profile overlap: score(lang) =
    * number of the doc's trigram POSITIONS (space-padded, lowercased)
    * matching the language's profile; argmax with lexicographic
    * tiebreak. Every step is an exact integer, so (unlike [[langId]]'s
    * stopword scores) the whole operator is DuckDB-oracle-checked
    * (q107).
    *
    * Plan: trigrams come from zipping the char array with its two
    * shifts — every HOF lambda touches ONLY its element arguments. The
    * first draft indexed outer expressions from inside the lambda
    * (`substr(padded, i, 3)` / `element_at(chars, i)`): a lambda BODY
    * re-evaluates its captured expressions per element, so the
    * 300-char split/concat ran 300× per row and the operator measured
    * 73 s at sf0.1 — the single most important HOF rule in the
    * codebase (now also the fastest form: ~1.5 s). One explode + one
    * hash agg with a conditional count per language materializes each
    * trigram exactly once; the shuffle is keyed by doc_id. */
  def langIdNgram(documents: DataFrame,
                  profiles: Map[String, Seq[String]] = TrigramProfiles): DataFrame = {
    val langs = profiles.toSeq.sortBy(_._1)
    val padded = concat(lit(" "), lower(col("text")), lit(" "))
    val chars = split(padded, "")
    val n = size(chars)
    val pairs = zip_with(chars, slice(chars, lit(2), greatest(n - 1, lit(0))),
      (a, b) => concat(a, b))
    val grams = slice(
      zip_with(pairs, slice(chars, lit(3), greatest(n - 2, lit(0))),
        (p, c) => concat(p, c)),
      lit(1), greatest(n - 2, lit(0)))
    val exploded = documents.select(col("doc_id"), col("lang").as("label"),
      explode(grams).as("t"))
    val scoreCols = langs.map { case (lang, prof) =>
      sum(when(col("t").isin(prof.map(x => x: Any): _*), 1L).otherwise(0L))
        .as(s"s_$lang")
    }
    val scored = exploded.groupBy(col("doc_id"), col("label"))
      .agg(scoreCols.head, scoreCols.tail: _*)
    val best = greatest(langs.map { case (lang, _) =>
      struct(col(s"s_$lang").as("score"), lit(lang).as("lang"))
    }: _*)
    scored.select(col("doc_id"), col("label"),
        best.getField("lang").as("predicted"),
        best.getField("score").as("trigram_hits"))
      .orderBy(col("doc_id"))
  }

  def langId(documents: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val scores = LangMarkers.toSeq.sortBy(_._1).map { case (lang, markers) =>
      val arr = array(markers.map(lit): _*)
      struct(size(filter(toks, t => array_contains(arr, t))).as("score"), lit(lang).as("lang"))
    }
    // argmax by (score, lang) — greatest picks the lexicographically
    // largest struct, ties broken by language code deterministically
    documents.select(
        col("doc_id"), col("lang").as("label"),
        greatest(scores: _*).getField("lang").as("predicted"),
        greatest(scores: _*).getField("score").cast("long").as("best_score"))
      .orderBy(col("doc_id"))
  }

  /** TF-IDF per (doc, token): tf = raw in-doc count, idf = ln(N/df).
    * Integer counts throughout; the single ln/multiply is rounded to 6dp
    * for cross-engine exactness (SURVEY §7.1 text/ tf-idf). Two hash
    * aggregations + one broadcast-able join on token — no cross product,
    * scales linearly in corpus size. */
  def tfidf(documents: DataFrame): DataFrame = {
    val n = graft.ops.Scalar.count(documents) // eager by convention — see Scalar
    val tok = documents.select(col("doc_id"), explode(tokens(col("text"))).as("token"))
    val tf = tok.groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    val df = tok.groupBy(col("token"))
      .agg(countDistinct(col("doc_id")).as("df"))
    tf.join(df, "token")
      .withColumn("tfidf",
        round(col("tf") * log(lit(n.toDouble) / col("df")), 6))
      .select(col("doc_id"), col("token"), col("tf"), col("df"), col("tfidf"))
      .orderBy(col("doc_id"), col("token"))
  }

  /** Top-k characteristic terms per document by TF-IDF (rounded-score
    * ranking with token tiebreak → engine-deterministic). */
  def topTermsPerDoc(documents: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("token"))
    tfidf(documents)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(col("doc_id"), col("token"), col("tfidf"), col("rn"))
      .orderBy(col("doc_id"), col("rn"))
  }

  /** Token-frequency table (corpus vocabulary with counts) — the
    * StringIndexer-style distinct collection over exploded tokens. */
  def vocabulary(documents: DataFrame, minCount: Long = 1): DataFrame =
    documents.select(explode(tokens(col("text"))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
      .orderBy(col("cnt").desc, col("token"))

  /** Vocabulary-id corpus encoding — the tokenizer-pipeline stage
    * AFTER [[vocabulary]]: tokens at or above `minCount` rank into
    * 1-based ids by (count desc, token asc) — the frequency-sorted id
    * assignment every word-level tokenizer uses — and each document
    * becomes its id sequence; below-threshold tokens encode as OOV
    * id 0. The sequence ships as a space-joined VARCHAR (not an array
    * column) so the graded rendering is engine-portable.
    *
    * Scale shape: the global rank runs over the VOCAB table (already
    * reduced by one hash agg + the minCount cut), never the corpus;
    * the encode pass is one broadcast-sized equi-join of corpus tokens
    * against the vocab and one per-document ordered reassembly — the
    * q86/q182 array_sort tail. Output:
    * (doc_id, n_tokens, n_oov, ids). */
  def encodeCorpus(documents: DataFrame, minCount: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = documents.select(col("doc_id"),
      posexplode(split(col("text"), " ")).as(Seq("pos", "token")))
    val vid = toks.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
      .withColumn("id", row_number()
        .over(Window.orderBy(col("cnt").desc, col("token").asc)).cast("long"))
    val enc = toks.join(vid.select(col("token"), col("id")), Seq("token"), "left")
      .withColumn("tid", coalesce(col("id"), lit(0L)))
    enc.groupBy(col("doc_id")).agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("tid") === 0L, 1L).otherwise(0L)).as("n_oov"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("tid")))),
          x => x.getField("tid").cast("string")), " ").as("ids"))
      .orderBy(col("doc_id"))
  }

  /** Bigram (collocation) vocabulary with raw counts — the n=2
    * non-distinct sibling of [[graft.dedup.Dedup.shingles]]. Same
    * shuffle shape as [[vocabulary]]: explode + one hash aggregation. */
  def bigramVocab(documents: DataFrame, minCount: Long = 1): DataFrame = {
    val bg = ngrams(tokens(col("text")), 2, " ")
    documents.select(explode(bg).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
      .orderBy(col("cnt").desc, col("bigram"))
  }

  /** Bigram PMI (pointwise mutual information) — the collocation score
    * that separates real phrases from frequency accidents; corpus
    * pipelines use it for phrase mining and junk-boilerplate discovery
    * where raw bigram counts just echo stopwords.
    *
    * pmi(a,b) = ln( (c_ab / N₂) / ((c_a / N₁)(c_b / N₁)) ), with N₁ =
    * total tokens, N₂ = total bigrams. Every term is an exact integer
    * count; ln + 6-dp round happen once at the end, so the result is
    * engine-portable (oracle-checked).
    *
    * Scale shape: same class as [[bigramVocab]] — one shuffle keyed by
    * bigram, one by token, then two equi-joins of bigrams against the
    * (much smaller, broadcast-able) unigram table; totals are
    * [[graft.ops.Scalar]]-class reductions riding a 1-row cross join. */
  def bigramPmi(documents: DataFrame, minCount: Long = 2): DataFrame = {
    val toks = tokens(col("text"))
    val bg = zip_with(toks,
      slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
      (a, b) => struct(a.as("w1"), b.as("w2")))
    val pairs = documents
      .select(explode(slice(bg, lit(1), greatest(size(tokens(col("text"))) - 1, lit(0)))).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
    val uni = documents.select(explode(toks).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c_w"))
    val totals = uni.agg(sum(col("c_w")).as("n1")).crossJoin(
      pairs.agg(count(lit(1)).as("n2")))
    pairs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minCount)
      .join(uni.withColumnRenamed("w", "w1").withColumnRenamed("c_w", "c_a"), "w1")
      .join(uni.withColumnRenamed("w", "w2").withColumnRenamed("c_w", "c_b"), "w2")
      .crossJoin(broadcast(totals))
      .select(col("w1"), col("w2"), col("c_ab"), col("c_a"), col("c_b"),
        // cast BEFORE multiplying: the integer product c_ab·N₁² overflows
        // long at corpus scale; double left-assoc products are portable
        round(log((col("c_ab").cast("double") * col("n1") * col("n1")) /
          (col("n2").cast("double") * col("c_a") * col("c_b"))), 6).as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
  }

  /** Fixed-size token chunking for training-data preparation: split each
    * document into `chunkTokens`-token pieces, one row per chunk, keeping
    * (doc_id, chunk_no) lineage. Pure plan arithmetic — sequence +
    * slice + posexplode inside codegen; rejoining
    * `concat_ws(' ', collect chunks in order)` restores the exact text
    * (property-tested). At corpus scale this is a narrow map — no
    * shuffle at all until a downstream aggregation. */
  def chunkDocs(documents: DataFrame, chunkTokens: Int): DataFrame = {
    require(chunkTokens >= 1, s"chunkTokens must be >= 1, got $chunkTokens")
    val k = chunkTokens
    val toks = tokens(col("text"))
    documents
      .select(col("doc_id"), toks.as("__w"),
        ceil(size(toks).cast("double") / k).cast("int").as("__n"))
      .select(col("doc_id"), col("__w"),
        posexplode(transform(sequence(lit(0), col("__n") - 1),
          i => concat_ws(" ", slice(col("__w"), i * k + 1, lit(k))))))
      .withColumnRenamed("pos", "chunk_no").withColumnRenamed("col", "chunk_text")
      .select(col("doc_id"), col("chunk_no").cast("long").as("chunk_no"),
        col("chunk_text"),
        least(lit(k.toLong),
          size(col("__w")).cast("long") - col("chunk_no").cast("long") * k).as("n_tokens"))
      .orderBy(col("doc_id"), col("chunk_no"))
  }

  /** Gopher-style repetition signals per document: duplicate-token
    * fraction and top-bigram fraction — the classic "low-quality by
    * repetition" filters for training corpora. Two hash aggregations
    * (token stats, bigram stats) joined on doc_id; fractions integer-
    * exact until the final division, rounded 6dp for the oracle. */
  def repetitionStats(documents: DataFrame): DataFrame = {
    val tok = documents.select(col("doc_id"), explode(tokens(col("text"))).as("token"))
    val tokStats = tok.groupBy(col("doc_id")).agg(
      count(lit(1)).as("n_tokens"),
      countDistinct(col("token")).as("n_distinct"))
    val bg = ngrams(tokens(col("text")), 2, " ")
    val bigStats = documents.select(col("doc_id"), explode(bg).as("bigram"))
      .groupBy(col("doc_id"), col("bigram")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id")).agg(
        max(col("cnt")).as("top_bigram_cnt"), sum(col("cnt")).as("n_bigrams"))
    tokStats.join(bigStats, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        round(lit(1.0) - col("n_distinct").cast("double") / col("n_tokens"), 6)
          .as("dup_token_frac"),
        coalesce(col("top_bigram_cnt"), lit(0L)).as("top_bigram_cnt"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        when(col("n_bigrams").isNotNull,
          round(col("top_bigram_cnt").cast("double") / col("n_bigrams"), 6))
          .as("top_bigram_frac"))
      .orderBy(col("doc_id"))
  }

  /** Top-k bigrams per source — the per-domain collocation report, and
    * the custom bounded-heap [[graft.plans.TopK]] operator exercised on
    * the text domain (no per-source sort of the bigram table; the heap
    * caps each group at k during the single pass). One explode + one
    * hash agg + the TopK exchange on source. */
  def topBigramsPerSource(documents: DataFrame, k: Int): DataFrame = {
    val bg = ngrams(tokens(col("text")), 2, " ")
    val counts = documents.select(col("source"), explode(bg).as("bigram"))
      .groupBy(col("source"), col("bigram")).agg(count(lit(1)).as("cnt"))
    graft.plans.TopK.topKPerKey(counts, Seq("source"),
        Seq(("cnt", false), ("bigram", true)), k)
      .orderBy(col("source"), col("rn"))
  }

  /** Cross-source duplicate report: canonical fingerprints that appear
    * in MORE THAN ONE source — the license-contamination / content-
    * syndication tracer (a doc copied between domains is invisible to
    * per-source dedup). Two hash aggs; the HAVING prunes before any
    * per-fingerprint detail is assembled. */
  def crossSourceDuplicates(documents: DataFrame): DataFrame =
    documents.select(fingerprint(col("text")).as("fp"), col("source"), col("doc_id"))
      .groupBy(col("fp"))
      .agg(countDistinct(col("source")).as("n_sources"),
        count(lit(1)).as("n_copies"),
        min(col("doc_id")).as("first_doc"))
      .filter(col("n_sources") > 1)
      .orderBy(col("fp"))

  /** Top-k distinctive terms per source — "what does each feed talk
    * about that the others don't": token score = the relative risk of
    * the token in this source vs the REST of the corpus,
    * `(cnt/tot_s) / ((cnt_rest + 1)/tot_rest)`, floor'd to exact
    * integer micro-units (the +1 is the standard smoothing so
    * source-exclusive tokens rank by frequency instead of dividing by
    * zero). Deliberately log-free: log-odds variants put libm `ln` in
    * the graded value; the risk ratio ranks identically and stays
    * engine-exact. Long arithmetic holds to ~10⁶ occurrences per
    * (source, token) at 10⁹ corpus tokens (ANSI mode errors loudly
    * past it); swap the score expression to DECIMAL(38,0) beyond.
    *
    * Scale shape: one (source, token) count agg off the token explode,
    * two broadcast-joined rollups of that table, and the per-source
    * top-k through the bounded-heap [[graft.plans.TopK]] exec —
    * no window sort over the vocabulary. */
  def distinctiveTerms(documents: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    val tf = documents.select(col("source"), explode(tokens(col("text"))).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col("source"), col("token")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // three consumers below
    val bySource = tf.groupBy(col("source")).agg(sum(col("cnt")).as("tot_s"))
    val byToken = tf.groupBy(col("token")).agg(sum(col("cnt")).as("cnt_all"))
    val grand = tf.agg(sum(col("cnt")).as("grand"))
    val scored = tf
      .join(broadcast(bySource), "source")
      .join(byToken, "token")
      .crossJoin(broadcast(grand))
      .withColumn("score_micro",
        expr("(1000000 * cnt * (grand - tot_s)) div (tot_s * (cnt_all - cnt + 1))"))
    graft.plans.TopK.topKPerKey(
        scored.select(col("source"), col("token"), col("cnt"), col("score_micro")),
        Seq("source"), Seq(("score_micro", false), ("token", true)), k)
      .orderBy(col("source"), col("rn"))
  }

  /** Source-pair syndication profile — the set-level rollup of
    * [[crossSourceDuplicates]]: for every pair of sources sharing at
    * least one canonical fingerprint, the shared count, each side's
    * fingerprint-set size, and the Jaccard of the two sets. The
    * lineage question it answers: WHICH feeds mirror each other (and
    * how much), not just which documents are copied.
    *
    * Scale shape: the join is keyed on the fingerprint (the dedup
    * family's inverted structure — pairs emit only where a fingerprint
    * is actually shared), and the output is bounded by |sources|².
    * The distinct (source, fp) table is checkpointed once for its two
    * consumers. */
  def sourceOverlap(documents: DataFrame): DataFrame = {
    val fps = documents.select(col("source"), fingerprint(col("text")).as("fp"))
      .distinct().localCheckpoint()
    val sizes = fps.groupBy(col("source")).agg(count(lit(1)).as("n_fp"))
    fps.as("a").join(fps.as("b"),
        col("a.fp") === col("b.fp") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_common"))
      .join(sizes.select(col("source").as("source_a"), col("n_fp").as("fp_a")), "source_a")
      .join(sizes.select(col("source").as("source_b"), col("n_fp").as("fp_b")), "source_b")
      .select(col("source_a"), col("source_b"), col("n_common"),
        col("fp_a"), col("fp_b"),
        (col("n_common").cast("double") / (col("fp_a") + col("fp_b") - col("n_common")))
          .as("jaccard"))
      .orderBy(col("source_a"), col("source_b"))
  }

  /** Vocabulary growth curve (Heaps' law): per document (in doc_id
    * order), the number of corpus-NEW token types it introduces and the
    * cumulative vocabulary size. The "distinct so far" is the same
    * first-occurrence trick as cumulative-unique-users: a type counts
    * once, at its min(doc_id) (one keyed agg) — and the running total
    * rides the two-phase [[graft.ops.Windows.globalRunningSum]], never a
    * one-partition window over the corpus. The curve's flattening is the
    * practical "is more data still adding vocabulary" signal. */
  def vocabGrowth(documents: DataFrame): DataFrame = {
    val firstDoc = documents.select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .groupBy(col("token")).agg(min(col("doc_id")).as("doc_id"))
    val newPerDoc = firstDoc.groupBy(col("doc_id")).agg(count(lit(1)).as("n_new_types"))
    val perDoc = documents.select(col("doc_id"))
      .join(newPerDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n_new_types"), lit(0L)).as("n_new_types"))
    graft.ops.Windows.globalRunningSum(perDoc, "doc_id", col("n_new_types"), "cum_vocab")
      .select(col("doc_id"), col("n_new_types"), col("cum_vocab").cast("long").as("cum_vocab"))
      .orderBy(col("doc_id"))
  }

  /** Rare-token ratio — fraction of a document's tokens whose CORPUS
    * frequency is ≤ `maxCount` (hapax/dis legomena): the OCR-garbage /
    * mojibake / random-string detector that complements [[tokenEntropy]]
    * (gibberish is high-entropy AND rare-heavy; rich prose is
    * high-entropy but rare-light). Shuffle shape: per-doc type counts
    * (one hash agg) feed BOTH the corpus vocabulary and the probe side —
    * localCheckpoint computes them once — and the rare join moves
    * (doc, type) rows, never raw occurrences, so stopword hot keys
    * never shuffle; docs with no rare tokens come back via the left
    * join as 0. */
  def rareTokenStats(documents: DataFrame, maxCount: Long = 2): DataFrame = {
    val tc = documents.select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val rare = tc.groupBy(col("token")).agg(sum(col("c")).as("cnt"))
      .filter(col("cnt") <= maxCount).select("token")
    val nRare = tc.join(rare, "token")
      .groupBy(col("doc_id")).agg(sum(col("c")).cast("long").as("n_rare"))
    documents.select(col("doc_id"), size(tokens(col("text"))).cast("long").as("n_tokens"))
      .join(nRare, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_rare"), lit(0L)).as("n_rare"),
        round(coalesce(col("n_rare"), lit(0L)).cast("double") / col("n_tokens"), 6)
          .as("rare_frac"))
      .orderBy(col("doc_id"))
  }

  /** Per-document unigram (token) entropy in bits — the information-
    * density quality signal: boilerplate and keyword-stuffed documents
    * score low, natural prose high. H = log2(n) - (Σ c·log2 c)/n over
    * per-doc token counts c. The Σ term is irrational per element, so
    * each term rounds to 9dp and sums as DECIMAL(38,12) — exact, hence
    * order-insensitive under partial aggregation (the [[unigramLogProb]]
    * discipline); the final combine is single double ops, deterministic.
    * Two hash aggregations, shuffles keyed on (doc_id, token) / doc_id. */
  def tokenEntropy(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n"),
        sum(round(col("c") * log2(col("c")), 9).cast("decimal(38,12)")).as("clog"))
      .select(col("doc_id"), col("n").cast("long").as("n_tokens"),
        round(log2(col("n")) - col("clog").cast("double") / col("n"), 6).as("entropy_bits"))
      .orderBy(col("doc_id"))

  /** Unigram log-probability quality score (the KenLM-perplexity proxy):
    * p(token) from corpus counts, per-document mean ln p. The per-token
    * ln is rounded to 6dp THEN summed as DECIMAL so the aggregation is
    * order-insensitive — a raw double sum would be nondeterministic
    * under partial aggregation and could never hash-match an oracle.
    * NOTE: like [[tfidf]], computes one scalar action (total tokens) at
    * construction. */
  def unigramLogProb(documents: DataFrame): DataFrame = {
    val tok = documents.select(col("doc_id"), explode(tokens(col("text"))).as("token"))
    val counts = tok.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    val total = graft.ops.Scalar.count(tok).toDouble // eager — see Scalar
    tok.join(counts, "token")
      .withColumn("lp",
        round(log(col("cnt").cast("double") / total), 6).cast("decimal(18,6)"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        round(sum(col("lp")).cast("double") / count(lit(1)), 6).as("avg_logprob"))
      .orderBy(col("doc_id"))
  }

  /** Portable PII patterns (same semantics under Java regex and RE2, so
    * oracle-checkable): emails and NNN-NNN-NNNN phone shapes. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\d{3}[-. ]\\d{3}[-. ]\\d{4}"

  /** PII scrub for training corpora: per-document redaction counts plus
    * the md5 fingerprint of the redacted text (emails → `[EMAIL]`,
    * phones → `[PHONE]`). Counts stay meaningful (and the fingerprint
    * equals [[fingerprint]]-style identity) on already-clean corpora. */
  def redactPii(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"),
        regexp_count(col("text"), lit(EmailRe)).cast("long").as("n_emails"),
        regexp_count(col("text"), lit(PhoneRe)).cast("long").as("n_phones"),
        md5(regexp_replace(regexp_replace(col("text"), EmailRe, "[EMAIL]"),
          PhoneRe, "[PHONE]")).as("redacted_fp"))
      .orderBy(col("doc_id"))

  /** Training-shard assignment by token budget: within each source,
    * documents (in doc_id order) fill shards of `budgetTokens` — shard
    * index = floor(tokens-before-this-doc / budget). Deterministic,
    * engine-portable, and the per-shard manifest downstream loaders need
    * (a doc straddling a boundary belongs to the shard it starts in —
    * the greedy first-fit rule). One window per source: sources are few
    * and bounded, so the per-key window is safe; a single giant domain
    * would use the two-phase bucketed form
    * ([[graft.ops.Windows.globalRunningSum]]) instead. */
  def packShards(documents: DataFrame, budgetTokens: Long): DataFrame = {
    require(budgetTokens >= 1, s"budgetTokens must be >= 1, got $budgetTokens")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    documents
      .select(col("doc_id"), col("source"), size(tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("shard",
        floor(coalesce(sum(col("n_tokens")).over(w), lit(0L)) / budgetTokens))
      .orderBy(col("source"), col("doc_id"))
  }

  /** Fixed-length SEQUENCE packing with split lineage — the GPT-style
    * training layout, one level below [[packShards]]: documents
    * concatenate (doc_id order) into one global token stream, the
    * stream cuts into `seqLen`-token packs, and a document straddling a
    * boundary SPLITS across packs. Emits one row per (pack, doc slice):
    * (pack_id, doc_id, pack_off, doc_off, n_slice) — exactly the
    * manifest a loader needs to assemble pack tensors from doc shards,
    * and exact integer arithmetic end to end (oracle-checked).
    *
    * The only order-dependent step is the global exclusive cumsum of
    * token counts, which runs through the two-phase bucketed
    * [[graft.ops.Windows.globalRunningSum]] — no single-partition
    * window at any size. Per-doc pack fan-out is
    * ceil(n_toks / seqLen) + 1 rows via one sequence-explode: a narrow
    * map. Like all globalRunningSum consumers this executes its input
    * at construction (Scalar convention). */
  def packSequences(documents: DataFrame, seqLen: Long): DataFrame = {
    require(seqLen > 0, s"packSequences: seqLen must be positive (got $seqLen)")
    val base = documents.select(col("doc_id"),
      size(tokens(col("text"))).cast("long").as("n_toks"))
    val cum = graft.ops.Windows.globalRunningSum(base, "doc_id", col("n_toks"), "cum")
    val L = lit(seqLen)
    val spans = cum
      .withColumn("start", col("cum") - col("n_toks"))
      .filter(col("n_toks") > 0)
    spans.select(col("doc_id"), col("start"), col("n_toks"),
        explode(sequence(floor(col("start") / L).cast("long"),
          floor((col("start") + col("n_toks") - 1) / L).cast("long"))).as("pack_id"))
      .withColumn("g0", greatest(col("pack_id") * L, col("start")))
      .withColumn("g1", least((col("pack_id") + 1) * L, col("start") + col("n_toks")))
      .select(col("pack_id"), col("doc_id"),
        (col("g0") - col("pack_id") * L).cast("long").as("pack_off"),
        (col("g0") - col("start")).cast("long").as("doc_off"),
        (col("g1") - col("g0")).cast("long").as("n_slice"))
      .orderBy(col("pack_id"), col("pack_off"))
  }
}
