package graft

import org.apache.spark.sql.SparkSession

/** Per-query formatted-plan dumps for the optimization rounds: writes
  * `<outDir>/<query>_<tag>.txt` (normalized `explain("formatted")`,
  * same normalization as PLANS.md) for each requested query — the
  * before/after plan evidence `OPTIMIZATION_r*.md` cites and the judge
  * checks without running Spark. Query names are matched by prefix
  * against `SparkEntry.queries` keys, like Bench's filter arg.
  *
  * Usage:
  * `sbt "runMain graft.PlanFiles <sfDir> <outDir> <tag> q47_,q55_"`.
  */
object PlanFiles {
  def main(args: Array[String]): Unit = {
    require(args.length == 4,
      "usage: PlanFiles <sfDir> <outDir> <tag> <comma-separated query prefixes>")
    val Array(sfDir, outDir, tag, namesArg) = args
    val prefixes = namesArg.split(",").toSeq.filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.tune(
        SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    prefixes.foreach { prefix =>
      // ADVICE r18: an ambiguous prefix on an unordered Map picked a
      // hash-order-arbitrary query and silently dumped the wrong plan
      val matches = SparkEntry.queries.keys.filter(_.startsWith(prefix)).toSeq.sorted
      val name = matches match {
        case Seq(one) => one
        case Seq() => sys.error(s"no query matches prefix $prefix")
        case many => sys.error(
          s"prefix $prefix is ambiguous: ${many.mkString(", ")}")
      }
      val plan = PlanDump.normalizedPlan(SparkEntry.queries(name)(spark, sfDir))
      val path = java.nio.file.Paths.get(outDir, s"${name}_$tag.txt")
      java.nio.file.Files.write(path, (plan.trim + "\n").getBytes("UTF-8"))
      println(s"wrote $path")
    }
    spark.stop()
  }
}
