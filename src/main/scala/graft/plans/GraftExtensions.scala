package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import graft.functions.CosineSimilarity

/** Session extensions (SURVEY.md §7.3 / builder-prompt extension point):
  * registers graft's functions into the SQL function registry so
  * `spark.sql("SELECT cosine_sim(a, b) ...")` works for SQL users.
  *
  * `cosine_sim` is the native codegen expression. `haversine_km` and
  * `severity_ordinal` are built from raw Catalyst nodes (Column-DSL
  * trees can't be injected: Spark 4 wraps them in unresolvable
  * `ColumnNodeExpression`s); their semantics are pinned equal to the
  * Column-DSL forms in [[graft.ops.Geo]] by ExtensionsSpec.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[CosineSimilarity].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  /** Catalyst-node twin of [[graft.ops.Geo.haversineKm]]. */
  private def haversineExpr(lat1: Expression, lon1: Expression,
                            lat2: Expression, lon2: Expression): Expression = {
    val two = Literal(2.0)
    val dLat = ToRadians(Subtract(lat2, lat1))
    val dLon = ToRadians(Subtract(lon2, lon1))
    val a = Add(
      Pow(Sin(Divide(dLat, two)), two),
      Multiply(Multiply(Cos(ToRadians(lat1)), Cos(ToRadians(lat2))),
        Pow(Sin(Divide(dLon, two)), two)))
    Multiply(Literal(2 * graft.ops.Geo.EarthRadiusKm), Asin(Sqrt(a)))
  }

  /** Catalyst-node twin of [[graft.ops.Geo.severityOrdinal]]. */
  private def severityExpr(s: Expression): Expression =
    CaseWhen(Seq(
      (EqualTo(s, Literal("MINOR")), Literal(1.0)),
      (EqualTo(s, Literal("MODERATE")), Literal(2.0)),
      (EqualTo(s, Literal("MAJOR")), Literal(3.0))), Some(Literal(1.0)))

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => TopKStrategy)
    e.injectOptimizerRule(_ => WindowTopKRewrite)
    e.injectFunction((FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two float arrays"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("long_dot"),
      info("long_dot", "long_dot(a, b) - exact integer dot product of two bigint arrays"),
      (exprs: Seq[Expression]) => graft.functions.LongDot(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("haversine_km"),
      info("haversine_km", "haversine_km(lat1, lon1, lat2, lon2) - great-circle km"),
      (exprs: Seq[Expression]) => haversineExpr(exprs(0), exprs(1), exprs(2), exprs(3))))
    e.injectFunction((FunctionIdentifier("severity_ordinal"),
      info("severity_ordinal", "severity_ordinal(s) - MINOR/MODERATE/MAJOR -> 1/2/3, else 1"),
      (exprs: Seq[Expression]) => severityExpr(exprs(0))))
    e.injectFunction((FunctionIdentifier("lsh_buckets"),
      info("lsh_buckets", "lsh_buckets(embedding, planes, tables) - hyperplane LSH bucket per table"),
      (exprs: Seq[Expression]) => graft.functions.LshBuckets(exprs(0),
        exprs(1).eval().asInstanceOf[Int], exprs(2).eval().asInstanceOf[Int])))
    e.injectFunction((FunctionIdentifier("nfc_normalize"),
      info("nfc_normalize", "nfc_normalize(s) - Unicode canonical composition (same name/semantics as DuckDB)"),
      (exprs: Seq[Expression]) => graft.functions.NfcNormalize(exprs(0))))
  }
}
