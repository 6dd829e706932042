package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-probe for the HOF capture cost: times the index-into-outer
  * shingle construction vs the zip-with-shifts form on the sf
  * documents table (scratch diagnostic, not part of the surface). */
object HofProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.tune(
      SparkSession.builder().master("local[32]"), 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.ops.Tables.documents(spark, d)
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[hof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    val toks = split(col("text"), " ")
    val idxForm = when(size(toks) >= 3,
      transform(sequence(lit(0), size(toks) - 3),
        i => concat_ws(" ", slice(toks, i + 1, lit(3))))).otherwise(array())
    val n = size(toks)
    val zipForm = slice(
      zip_with(
        zip_with(toks, slice(toks, lit(2), greatest(n - 1, lit(0))),
          (a, b) => concat(a, lit(" "), b)),
        slice(toks, lit(3), greatest(n - 2, lit(0))),
        (p, c) => concat(p, lit(" "), c)),
      lit(1), greatest(n - 2, lit(0)))
    for (round <- 1 to 2) {
      time(s"r$round index-into-outer") {
        docs.select(explode(idxForm)).write.format("noop").mode("overwrite").save()
      }
      time(s"r$round zip-with-shifts") {
        docs.select(explode(zipForm)).write.format("noop").mode("overwrite").save()
      }
      // equality check once
      if (round == 1) {
        val a = docs.select(col("doc_id"), idxForm.as("g"))
        val b = docs.select(col("doc_id"), zipForm.as("g"))
        val diff = a.exceptAll(b).count() + b.exceptAll(a).count()
        println(s"[hof] forms equal: ${diff == 0}")
      }
    }
    spark.stop()
  }
}
