package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-query wall-time profiler (not part of the driver contract):
  * times one or more `SparkEntry.queries` entries through the same
  * noop sink as [[graft.Bench]], repeated so cold (codegen/IO) and
  * warm (steady-state) costs separate — the repo's standard A/B method
  * for attributing bench lines (SCALE.md round-2 notes).
  *
  * Usage: runMain graft.tools.ProfileQuery <queryName>[,name2,...] [rounds]
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.map(_.split(",").toSeq)
      .getOrElse(sys.error("usage: ProfileQuery <queryName>[,name2,...] [rounds]"))
    val rounds = args.lift(1).map(_.toInt).getOrElse(3)
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString).toInt
    val spark = graft.GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (r <- 1 to rounds; name <- names) {
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      val t0 = System.nanoTime()
      fn(spark, d).write.format("noop").mode("overwrite").save()
      println(f"[prof] round $r $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    spark.stop()
  }
}
