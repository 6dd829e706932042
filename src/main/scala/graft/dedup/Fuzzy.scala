package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fuzzy string matching — the edit-distance similarity join behind
  * spelling-variant canonicalization (query-log normalization, OCR/typo
  * clustering, product-name reconciliation). The reference's dedup is
  * exact-key only (`/root/reference/etl.py:10`); this is the
  * approximate-key complement the LLM-curation surface needs.
  *
  * Scale design (SymSpell deletion neighborhoods): if lev(a, b) <= d
  * then deleting at most d characters from each side reaches a common
  * string, so the depth-d deletion neighborhoods of a and b intersect.
  * Candidate pairs therefore come from an EQUI-JOIN on the variant key
  * — never an all-pairs comparison — and the exact `levenshtein`
  * verify runs only on bucket collisions. The dictionary is
  * distinct-compressed first (names << rows at any scale, and the
  * per-name weight rides along from the same agg), and the variant
  * fan-out is O(len^d) per name: ~1 + L + L(L-1)/2 keys at d = 2.
  * Everything shuffles on hash-distributed variant keys; the verify is
  * a codegen'd built-in.
  */
object Fuzzy {

  /** All distinct strings reachable from `s` by deleting at most
    * `maxEd` characters, as a column expression over attribute `src`
    * (HOF lambdas touch only their own arguments plus attribute refs —
    * the non-attribute-capture discipline from TextOps.ngrams). */
  private def deletionNeighborhood(src: String, maxEd: Int) = {
    require(maxEd == 1 || maxEd == 2, s"maxEd must be 1 or 2, got $maxEd")
    val s = col(src)
    val d0 = array(s)
    // delete position i (1-based): prefix of i-1 chars ++ suffix from i+1.
    // Guards: a descending `sequence` (the Dedup.shingles trap) would
    // emit junk index pairs for strings shorter than the deletion depth
    val d1 = when(length(s) >= 1,
      transform(sequence(lit(1), length(s)),
        i => concat(substr(s, lit(1), i - 1), substr(s, i + 1))))
      .otherwise(array().cast("array<string>"))
    val d2 =
      if (maxEd < 2) array().cast("array<string>")
      else when(length(s) >= 2,
        flatten(transform(sequence(lit(1), length(s) - 1), i =>
          transform(sequence(i + 1, length(s)), j =>
            concat(substr(s, lit(1), i - 1),
              substr(s, i + 1, j - i - 1), substr(s, j + 1))))))
        .otherwise(array().cast("array<string>"))
    array_distinct(concat(d0, d1, d2))
  }

  /** Entity resolution over spelling variants: fuzzy-match edges
    * ([[editDistanceJoin]]) → connected components → one canonical
    * surface form per entity (the most frequent variant, ties to the
    * lexicographically smallest). The full record-linkage shape —
    * block, match, cluster, canonicalize — with every stage the
    * bucketed/equi-join form.
    *
    * `idColumn` supplies a stable long id per value (min over the
    * value's rows — an agg, never a global row_number), which is what
    * the CC machinery labels; the entity_id is the cluster's min id.
    *
    * Output per distinct value: (name, n, entity_id, canonical,
    * n_variants, n_entity), ordered by name. */
  def entityResolution(df: DataFrame, column: String, idColumn: String,
                       maxEd: Int = 2): DataFrame = {
    val dict = df.groupBy(col(column).as("name"))
      .agg(count(lit(1)).as("n"), min(col(idColumn)).as("id"))
      .localCheckpoint()
    val edges = editDistanceJoin(df, column, maxEd)
      .join(dict.select(col("name").as("name_a"), col("id").as("ia")), "name_a")
      .join(dict.select(col("name").as("name_b"), col("id").as("ib")), "name_b")
      .select(col("ia"), col("ib"))
    val comp = graft.cluster.ConnectedComponents
      .components(dict.select(col("id")), edges)
      .toDF("id", "entity_id")
    val m = dict.join(comp, "id")
    val w = Window.partitionBy(col("entity_id"))
      .orderBy(col("n").desc, col("name"))
    val canon = m.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("entity_id"), col("name").as("canonical"))
    val tot = m.groupBy(col("entity_id"))
      .agg(count(lit(1)).as("n_variants"), sum(col("n")).as("n_entity"))
    m.join(canon, "entity_id").join(tot, "entity_id")
      .select(col("name"), col("n"), col("entity_id"), col("canonical"),
        col("n_variants"), col("n_entity"))
      .orderBy(col("name"))
  }

  /** Edit-distance similarity join over the distinct values of `column`
    * in `df`: one row per unordered pair of distinct strings with
    * lev <= maxEd, carrying both sides' row counts (the merge weight a
    * canonicalization pass needs). Output: name_a < name_b, dist, n_a,
    * n_b, ordered by (name_a, name_b). */
  def editDistanceJoin(df: DataFrame, column: String, maxEd: Int = 2): DataFrame = {
    val dict = df.groupBy(col(column).as("name"))
      .agg(count(lit(1)).as("n"))
      // the variant explode re-derives from `name` per output row if the
      // agg gets collapsed into it — materialize the (tiny) dictionary
      .localCheckpoint()
    val keyed = dict.select(col("name"),
        explode(deletionNeighborhood("name", maxEd)).as("variant"))
    val cand = keyed.as("a")
      .join(keyed.as("b"),
        col("a.variant") === col("b.variant") && col("a.name") < col("b.name"))
      .select(col("a.name").as("name_a"), col("b.name").as("name_b"))
      .distinct()
    cand
      .filter(levenshtein(col("name_a"), col("name_b")) <= maxEd)
      .join(dict.select(col("name").as("name_a"), col("n").as("n_a")), Seq("name_a"))
      .join(dict.select(col("name").as("name_b"), col("n").as("n_b")), Seq("name_b"))
      .select(col("name_a"), col("name_b"),
        levenshtein(col("name_a"), col("name_b")).cast("long").as("dist"),
        col("n_a"), col("n_b"))
      .orderBy(col("name_a"), col("name_b"))
  }
}
