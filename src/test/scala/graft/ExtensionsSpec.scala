package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.CosineSimilarity
import graft.sim.Similarity
import graft.ops.Tables

/** Native expression + SQL registration: bit-identity with the HOF
  * forms (oracle contract) and SQL-surface availability. */
class ExtensionsSpec extends AnyFunSuite {
  import TestSpark._

  test("native cosine_sim == HOF cosine bit-for-bit") {
    val e = Tables.embeddings(spark, sf).limit(50)
    val pairs = e.select(col("vec_id").as("a"), col("embedding").as("ea"))
      .crossJoin(e.select(col("vec_id").as("b"), col("embedding").as("eb")))
      .filter(col("a") < col("b")).limit(500)
    val diff = pairs.select(
        Similarity.cosine(col("ea"), col("eb")).as("hof"),
        CosineSimilarity.cosineSim(col("ea"), col("eb")).as("native"))
      .filter(col("hof") =!= col("native")).count()
    assert(diff == 0, "native expression must be bit-identical to the HOF form")
  }

  test("cosine_sim is callable from SQL via session extensions") {
    Tables.embeddings(spark, sf).limit(5).createOrReplaceTempView("emb_ext")
    val self = spark.sql("SELECT cosine_sim(embedding, embedding) AS c FROM emb_ext")
      .collect().map(_.getDouble(0))
    assert(self.forall(c => math.abs(c - 1.0) < 1e-9))
  }

  test("long_dot == HOF integer dot, callable from SQL") {
    import spark.implicits._
    val rows = Seq(
      (1L, Seq(3L, -2L, 7L), Seq(10L, 4L, -1L)),
      (2L, Seq(0L, 0L, 0L), Seq(1L, 2L, 3L)),
      (3L, Seq(1L << 20, -(1L << 20), 5L), Seq(1L << 20, 1L << 20, -5L)))
      .toDF("id", "a", "b")
    val got = rows.select(col("id"),
        graft.functions.LongDot.longDot(col("a"), col("b")).as("d"),
        aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0L), _ + _).as("hof"))
      .collect()
    got.foreach(r => assert(r.getLong(1) == r.getLong(2), s"id ${r.getLong(0)}"))
    rows.createOrReplaceTempView("ld_ext")
    val sql = spark.sql("SELECT id, long_dot(a, b) AS d FROM ld_ext ORDER BY id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sql == got.map(r => r.getLong(0) -> r.getLong(1)).toMap)
  }

  test("haversine_km and severity_ordinal callable from SQL") {
    import spark.implicits._
    val d = spark.sql("SELECT haversine_km(49.28, -123.12, 49.89, -119.50) AS km")
      .first().getDouble(0)
    assert(math.abs(d - 272) < 5)
    // SQL twin must equal the Column-DSL form exactly on double inputs
    // (bare SQL literals parse as DECIMAL, so cast explicitly)
    val dSql = spark.sql(
      """SELECT haversine_km(CAST(49.28 AS DOUBLE), CAST(-123.12 AS DOUBLE),
        |CAST(49.89 AS DOUBLE), CAST(-119.50 AS DOUBLE)) AS km""".stripMargin)
      .first().getDouble(0)
    val dsl = Seq(1).toDF("x").select(graft.ops.Geo.haversineKm(
      lit(49.28), lit(-123.12), lit(49.89), lit(-119.50))).first().getDouble(0)
    assert(dSql == dsl)
    val s = spark.sql(
      "SELECT severity_ordinal('MAJOR') AS a, severity_ordinal('garbage') AS b").first()
    assert(s.getDouble(0) == 3.0 && s.getDouble(1) == 1.0)
  }

  test("nfc_normalize composes decomposed sequences, is idempotent, SQL-callable") {
    import spark.implicits._
    val d = Seq(
      (1L, "café"),            // e + combining acute → é
      (2L, "café"),             // already composed
      (3L, "plain ascii")
    ).toDF("id", "s")
    val got = d.select(col("id"), graft.functions.NfcNormalize.nfc(col("s")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "café", "decomposed must compose")
    assert(got(1L) == got(2L), "both forms normalize to the same bytes")
    assert(got(3L) == "plain ascii", "ascii is a fixed point")
    // idempotence
    val twice = d.select(graft.functions.NfcNormalize.nfc(
        graft.functions.NfcNormalize.nfc(col("s"))).as("n2"),
      graft.functions.NfcNormalize.nfc(col("s")).as("n1"))
      .filter(col("n1") =!= col("n2")).count()
    assert(twice == 0)
    // SQL registration
    val viaSql = spark.sql("SELECT nfc_normalize('café') AS n").first().getString(0)
    assert(viaSql == "café")
  }

  test("custom TopKPerKey operator == window top-N, without sorting partitions") {
    val o = graft.ops.Tables.orders(spark, sf)
      .select("o_custkey", "o_orderkey", "o_totalprice")
    def custom = graft.plans.TopK.topKPerKey(o, Seq("o_custkey"),
      Seq(("o_totalprice", false), ("o_orderkey", true)), 3)
    val viaWindow = graft.ops.Windows.topOrdersPerCustomer(
        graft.ops.Tables.orders(spark, sf), 3)
      .collect().map(_.toSeq).toSet
    val viaCustom = custom
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
      .collect().map(_.toSeq).toSet
    assert(viaCustom == viaWindow,
      "custom operator must reproduce the window top-N exactly")
    val plan = custom.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"strategy did not plan the custom exec:\n$plan")
    assert(plan.contains("Exchange hashpartitioning"),
      "required distribution must insert the key shuffle")
    assert(!plan.contains("+- Sort"),
      s"custom top-k must not sort partitions:\n$plan")
  }

  test("global top-k (empty keys) is exact — AllTuples forces one partition") {
    val o = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
    val topGlobal = graft.plans.TopK.topKPerKey(o, Seq.empty,
      Seq(("o_totalprice", false), ("o_orderkey", true)), 5)
    val expected = o.orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(5).collect().map(_.toSeq).toSeq
    val got = topGlobal.orderBy(col("rn")).collect().map(_.toSeq.init).toSeq
    assert(got == expected,
      s"global top-k must equal the global sort+limit, got $got vs $expected")
    assert(topGlobal.count() == 5,
      "a per-partition heap would emit up to k rows per partition")
  }
}
