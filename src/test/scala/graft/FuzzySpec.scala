package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.dedup.Fuzzy
import graft.ops.Tables

/** Edit-distance similarity join: the SymSpell deletion-neighborhood
  * candidate generation must be LOSSLESS vs brute-force all-pairs —
  * the equivalence is the whole point of the design (equi-join
  * candidates, exact verify). */
class FuzzySpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def brute(df: org.apache.spark.sql.DataFrame, column: String, maxEd: Int) = {
    val v = df.groupBy(col(column).as("name")).agg(count(lit(1)).as("n"))
    v.as("a").join(v.as("b"), col("a.name") < col("b.name"))
      .filter(levenshtein(col("a.name"), col("b.name")) <= maxEd)
      .select(col("a.name").as("name_a"), col("b.name").as("name_b"),
        levenshtein(col("a.name"), col("b.name")).cast("long").as("dist"),
        col("a.n").as("n_a"), col("b.n").as("n_b"))
      .orderBy(col("name_a"), col("name_b"))
  }

  // substitutions, inserts, deletes, a transposition (= ed 2), short
  // strings down to length 1, and repeated rows for the weights
  private lazy val words = Seq(
    "cold", "old", "bold", "colt", "cool", "c", "d", "co", "oc",
    "gear", "bear", "gears", "ear", "year", "tear", "fear",
    "widget", "widgets", "wdiget", "midget", "gadget",
    "a.b", "a_b", "axb"
  ).flatMap(w => Seq.fill(1 + w.length % 3)(w)).toDF("w")

  test("symspell join == brute force at maxEd = 2") {
    val got = Fuzzy.editDistanceJoin(words, "w", 2).collect().toSeq
    val want = brute(words, "w", 2).collect().toSeq
    assert(got == want)
    assert(want.nonEmpty, "fixture must actually produce pairs")
  }

  test("symspell join == brute force at maxEd = 1") {
    val got = Fuzzy.editDistanceJoin(words, "w", 1).collect().toSeq
    val want = brute(words, "w", 1).collect().toSeq
    assert(got == want)
  }

  test("part-name join on sf0.001 matches brute force") {
    val p = Tables.part(spark, sf)
    val got = Fuzzy.editDistanceJoin(p, "p_name", 2).collect().toSeq
    val want = brute(p, "p_name", 2).collect().toSeq
    assert(got == want)
    assert(want.nonEmpty)
  }

  test("entityResolution: edges stay in-cluster, canonical is the modal variant") {
    val p = Tables.part(spark, sf)
    val r = Fuzzy.entityResolution(p, "p_name", "p_partkey", 2).collect()
    val entityOf = r.map(x => x.getString(0) -> x.getLong(2)).toMap
    // every fuzzy edge's endpoints share an entity (CC soundness)
    brute(p, "p_name", 2).collect().foreach { e =>
      assert(entityOf(e.getString(0)) == entityOf(e.getString(1)),
        s"edge ${e.getString(0)} ~ ${e.getString(1)} split across entities")
    }
    // the canonical carries the entity's max count (min-name tiebreak)
    r.groupBy(_.getLong(2)).values.foreach { cluster =>
      val byName = cluster.map(x => x.getString(0) -> x.getLong(1)).toMap
      val canon = cluster.head.getString(3)
      assert(cluster.forall(_.getString(3) == canon), "canonical not constant in cluster")
      assert(byName(canon) == byName.values.max, "canonical is not the modal variant")
      assert(cluster.head.getLong(5) == byName.values.sum, "n_entity mismatch")
      assert(cluster.head.getLong(4) == byName.size.toLong, "n_variants mismatch")
    }
    // total mass is conserved
    assert(r.map(_.getLong(1)).sum == p.count())
  }
}
