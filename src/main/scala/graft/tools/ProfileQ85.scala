package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the q85 semantic-dedup stages (not part of the
  * library surface; used to attribute bench wall-time between k-means
  * build, in-cell pairing, GraphX CC, and the final window). */
object ProfileQ85 {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.tune(
      SparkSession.builder().master("local[32]"), 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-30s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
    }
    // warm-up
    spark.range(32).select(sum("id")).collect()
    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      val emb = time("read")(graft.ops.Tables.embeddings(spark, d))
      val idx = time("ivfBuild (kmeans train)")(
        graft.sim.Similarity.ivfBuild(emb.select(col("vec_id"), col("embedding")), 16))
      time("assign+checkpoint") {
        idx.assigned.write.format("noop").mode("overwrite").save()
      }
      time("full semanticDedup") {
        graft.dedup.Dedup.semanticDedup(emb, 0.9)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
