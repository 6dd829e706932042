package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops._

/** Scale-slope harness (not part of the driver contract): replicates the
  * sf0.1 tables in-plan to multiply row counts WITHOUT new test data,
  * then times headline operators at 1× and N×. A near-linear slope is
  * the local evidence that the partition/shuffle strategy holds as data
  * grows; superlinear growth flags an operator that would fall over at
  * cluster scale. Results summarized in SCALE.md.
  *
  * Usage: runMain graft.StressBench [factor] (default 10)
  */
object StressBench {

  /** Replicate rows `factor`× with key remapping so join/group keys keep
    * realistic cardinality (keys get a replica suffix, values unchanged). */
  def replicate(df: DataFrame, factor: Int, keyCols: Seq[String]): DataFrame = {
    val exploded = df.withColumn("__rep", explode(sequence(lit(0L), lit(factor - 1L))))
    keyCols.foldLeft(exploded) { (d, k) =>
      d.withColumn(k, col(k) * factor + col("__rep"))
    }.drop("__rep")
  }

  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(10)
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    import spark.implicits._

    val li1 = Tables.lineitem(spark, sf)
    val liN = replicate(li1, factor, Seq("l_orderkey"))
    val o1 = Tables.orders(spark, sf)
    val oN = replicate(o1, factor, Seq("o_orderkey", "o_custkey"))
    val ev1 = Tables.events(spark, sf)
    val evN = replicate(ev1, factor, Seq("event_id", "user_id"))
    val part = Tables.part(spark, sf)

    def run(name: String, f1: => Long, fN: => Long): Unit = {
      f1 // warm-up: JIT + codegen + file index, so timings measure data work
      val t1 = time(f1); val tN = time(fN)
      val slope = tN / t1 / factor
      println(f"STRESS $name%-22s 1x=${t1}%6.2fs  ${factor}x=${tN}%7.2fs  slope=${slope}%5.2f (1.0 = linear)")
    }

    run("pricing_summary",
      Rollups.pricingSummary(li1).count(), Rollups.pricingSummary(liN).count())
    run("broadcast_join",
      Joins.brandVolume(li1, part).count(), Joins.brandVolume(liN, part).count())
    run("window_topn",
      Windows.topOrdersPerCustomer(o1).count(), Windows.topOrdersPerCustomer(oN).count())
    run("sessionize",
      EventOps.sessionize(ev1, 30).count(), EventOps.sessionize(evN, 30).count())
    run("asof_join",
      EventOps.purchaseAsofClick(ev1).count(), EventOps.purchaseAsofClick(evN).count())
    run("exact_dedup",
      graft.dedup.Dedup.exactDedup(Tables.documents(spark, sf)).count(), {
        val docsN = Tables.documents(spark, sf)
          .withColumn("__rep", explode(sequence(lit(0L), lit(factor - 1L))))
          .withColumn("doc_id", col("doc_id") * factor + col("__rep")).drop("__rep")
        graft.dedup.Dedup.exactDedup(docsN).count()
      })
    spark.stop()
  }
}
