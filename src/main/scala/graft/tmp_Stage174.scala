import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Stage174 {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"STAGE $name%-12s ${(System.nanoTime()-t0)/1e9}%6.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.tune(SparkSession.builder().master("local[32]"), 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = graft.ops.Tables.embeddings(spark, "/root/testdata/sf0.1")
    val q = t("quantize") {
      e.select(col("vec_id"),
        expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT))").as("vq"))
        .localCheckpoint() }
    val centroid = t("centroid") {
      q.select(posexplode(col("vq")).as(Seq("j", "x")))
        .groupBy(col("j")).agg(sum(col("x")).as("c"))
        .collect().sortBy(_.getInt(0)).map(_.getLong(1)).toSeq }
    import graft.functions.LongDot.longDot
    val cLit = typedlit(centroid)
    val scored = t("scored") {
      q.select(col("vec_id"), col("vq"),
        longDot(col("vq"), cLit).as("cdot"),
        longDot(col("vq"), col("vq")).as("vnorm2")).localCheckpoint() }
    val a = scored.select(col("vec_id").as("ida"), col("vq").as("va"), col("vnorm2").as("na"))
    val b = scored.select(col("vec_id").as("idb"), col("vq").as("vb"), col("vnorm2").as("nb"))
    val dxy = longDot(col("va"), col("vb"))
    val pre = col("ida") < col("idb") &&
      dxy.cast("double") >= sqrt(lit(0.16 * (1.0 - 1e-9)) * col("na").cast("double") * col("nb").cast("double"))
    val pairs = t("pairs") {
      a.join(b, pre).withColumn("dxy", dxy)
        .filter(col("dxy") > 0L &&
          lit(25L).cast("decimal(38,0)") * col("dxy").cast("decimal(38,0)") * col("dxy").cast("decimal(38,0)") >=
          lit(4L).cast("decimal(38,0)") * col("na").cast("decimal(38,0)") * col("nb").cast("decimal(38,0)"))
        .select(col("ida").as("src"), col("idb").as("dst")).localCheckpoint() }
    println("pairs n=" + pairs.count())
    val groups = t("cc") {
      graft.cluster.ConnectedComponents.components(scored.select(col("vec_id")), pairs)
        .toDF("vec_id", "group_id").localCheckpoint() }
    val affC = col("cdot").cast("double") / sqrt(col("vnorm2").cast("double"))
    val wKeep = org.apache.spark.sql.expressions.Window.partitionBy(col("group_id")).orderBy(affC.asc, col("vec_id").asc)
    t("keep+sink") {
      groups.join(scored.select(col("vec_id"), col("cdot"), col("vnorm2")), "vec_id")
        .withColumn("keep", row_number().over(wKeep) === 1)
        .select(col("vec_id"), col("group_id"), col("cdot"), col("vnorm2"), col("keep"))
        .orderBy(col("vec_id"))
        .write.format("noop").mode("overwrite").save() }
    spark.stop()
  }
}
