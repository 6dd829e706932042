package graft.ml

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-shot full-reference-grid CV run (`ml-sparkml.py:56-62`: numTrees
  * [50,100,150] × maxDepth [5,10,15] × maxBins [16,32], 3-fold, rmse
  * selector) over the events feature table — flag-gated behind its own
  * main so the 54-fit cost never lands in tests or the bench.
  *
  * The reference's own numbers (BASELINE.md) came from its 580k-event
  * harvest, which is not reproducible in this environment; this records
  * OUR metrics on the driver-generated fixture next to them. Output:
  * `CV_METRICS.md` in the cwd (committed).
  *
  * Usage: `sbt "runMain graft.ml.CvGridRun /root/testdata/sf0.001"`.
  */
object CvGridRun {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val feats = DurationPipeline.eventFeatures(graft.ops.Tables.events(spark, sfDir))
      .na.drop(Seq("label", "k")).coalesce(4).cache()
    val n = feats.count()
    val Array(train, test) = feats.randomSplit(Array(0.8, 0.2), 42) // ml-sparkml.py:46

    val cv = DurationPipeline.crossValidatedRfReferenceGrid(
      Seq("event_type"), Seq("type_code", "h", "d", "k"), "label")
    val t0 = System.nanoTime()
    val cvModel = cv.fit(train)
    val fitSec = (System.nanoTime() - t0) / 1e9
    val best = cvModel.bestModel.asInstanceOf[org.apache.spark.ml.PipelineModel]
    val rf = best.stages.last
      .asInstanceOf[org.apache.spark.ml.regression.RandomForestRegressionModel]
    val metrics = DurationPipeline.evaluate(best, test, "label")

    val md =
      s"""# CV_METRICS — full reference tuning grid
         |
         |`graft.ml.CvGridRun` over `$sfDir/events.parquet` features
         |(n=$n, 80/20 split seed 42), the reference's exact grid
         |(`ml-sparkml.py:56-62`): numTrees [50,100,150] × maxDepth
         |[5,10,15] × maxBins [16,32], 3-fold CV selecting on rmse.
         |
         |CAVEAT: BASELINE.md's reference metrics (RF rmse 7.752 at 25%
         |data / 9.55 full) were measured on its 580k-event DriveBC
         |harvest, which is not reproducible here (zero egress); these
         |numbers are on the driver-generated events fixture and are NOT
         |directly comparable — they demonstrate full grid parity of the
         |tuning machinery, not of the data.
         |
         || metric | value |
         ||---|---|
         || rmse | ${metrics("rmse")} |
         || mae | ${metrics("mae")} |
         || mse | ${metrics("mse")} |
         || r2 | ${metrics("r2")} |
         |
         |Best params: numTrees=${rf.getNumTrees}, maxDepth=${rf.getMaxDepth},
         |maxBins=${rf.getMaxBins}. Grid size ${cvModel.getEstimatorParamMaps.length}
         |candidates × 3 folds = ${cvModel.getEstimatorParamMaps.length * 3} fits
         |in ${f"$fitSec%.1f"} s.
         |""".stripMargin
    java.nio.file.Files.writeString(java.nio.file.Paths.get("CV_METRICS.md"), md)
    println(md)
    spark.stop()
  }
}
