package graft.cluster

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed DBSCAN (SURVEY.md §2.8 U2) — the reference's one custom
  * algorithm. The reference collected the whole dataset to the driver for
  * sklearn because a naive per-partition pandas-UDF version clustered
  * each partition independently and was wrong (`Report.pdf p.15`,
  * `/root/reference/cluster.py:33-58`). This is the Spark-native design
  * it needed:
  *
  *  1. grid partition: cell side = eps, so all eps-neighbors of a point
  *     lie in its 3×3 cell neighborhood;
  *  2. candidate pairs via an equi-join of points against the 9 probe
  *     cells (shuffle on cell key only — never a cross product);
  *  3. core points = neighbor count (incl. self) >= minPts;
  *  4. clusters = connected components over core-core edges
  *     ([[ConnectedComponents]] — alternating-star contraction, pure
  *     Catalyst plans);
  *  5. border points attach to the min core-neighbor's component;
  *     everything else is noise (cluster = -1, sklearn convention).
  *
  * Cluster ids are the min point id of the component's cores —
  * deterministic, unlike sklearn's discovery order; tests compare
  * partitions, not labels. Skewed grids (a dense city cell) are handled
  * by AQE skew-join splitting; at 100 TB the cell key-space is huge so
  * the shuffle is well spread.
  *
  * Input: (id: long, x: double, y: double) in a euclidean plane; for
  * lat/lon use [[latLonToLocalXY]] (km-scaled equirectangular — within
  * ~0.3% of haversine at the reference's 25 km eps over BC latitudes).
  */
object DBSCAN {

  /** Project (lat, lon) degrees to local km coordinates. Computes one
    * [[graft.ops.Scalar]] (mean latitude) at construction. */
  def latLonToLocalXY(df: DataFrame, latCol: String, lonCol: String): DataFrame = {
    val kmPerDegLat = math.Pi * graft.ops.Geo.EarthRadiusKm / 180.0
    val meanLat: Double = graft.ops.Scalar.reduce(df, avg(col(latCol)))
    val kmPerDegLon = kmPerDegLat * math.cos(math.toRadians(meanLat))
    df.withColumn("x", col(lonCol) * kmPerDegLon)
      .withColumn("y", col(latCol) * kmPerDegLat)
  }

  /** N-dimensional distributed DBSCAN over `dims` columns. Same grid
    * strategy generalized: cells are per-dimension eps-boxes, candidate
    * pairs come from the 3^d neighbor-cell equi-join on the cell-array
    * key. Returns input columns + `cluster`. Supports the reference's
    * 3-D coords⊕severity variant (`cluster.py:50-58`). */
  def runND(points: DataFrame, dims: Seq[String], eps: Double, minPts: Int): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    val cellArr = array(dims.map(d => floor(col(d) / eps).cast("long")): _*)
    val pts = points.select(
      (col("id").cast("long") +: dims.map(d => col(d).cast("double"))): _*)
      .withColumn("__cell", cellArr)

    // 3^d neighbor-cell probes per point
    val offsetCombos: Seq[Seq[Long]] =
      dims.indices.foldLeft(Seq(Seq.empty[Long])) { (acc, _) =>
        acc.flatMap(c => Seq(-1L, 0L, 1L).map(o => c :+ o))
      }
    val probeCells = array(offsetCombos.map { combo =>
      array(combo.zipWithIndex.map { case (o, i) =>
        col("__cell").getItem(i) + o }: _*)
    }: _*)
    val aCols = dims.zipWithIndex.map { case (d, i) => col(d).as(s"__a$i") }
    val probes = pts.select(
        (col("id").as("a_id") +: aCols :+ explode(probeCells).as("__cell")): _*)
    val bCols = dims.zipWithIndex.map { case (d, i) => col(d).as(s"__b$i") }
    val bSide = pts.select((col("id").as("b_id") +: bCols :+ col("__cell")): _*)

    val dist2 = dims.indices.map(i =>
      pow(col(s"__a$i") - col(s"__b$i"), 2)).reduce(_ + _)
    // pairs feeds the degree count, the core-core edge build, AND the
    // border assignment — materialize the probe join once instead of
    // re-running the 3^d-cell shuffle per consumer (see ngramJaccard).
    val pairs = probes.join(bSide, Seq("__cell"))
      .filter(dist2 <= eps * eps)
      .select(col("a_id"), col("b_id"))
      .localCheckpoint()

    val degrees = pairs.groupBy(col("a_id")).agg(count(lit(1)).as("deg"))
    val cores = degrees.filter(col("deg") >= minPts).select(col("a_id").as("id"))
      .localCheckpoint()
    val coreSet = cores.withColumn("is_core", lit(true))
    val coreEdges = pairs
      .join(coreSet.select(col("id").as("a_id")), "a_id")
      .join(coreSet.select(col("id").as("b_id")), "b_id")
      .filter(col("a_id") < col("b_id"))
      .localCheckpoint() // contraction re-consumes its input per round
    val components = ConnectedComponents.components(cores, coreEdges)
      .toDF("id", "cluster")
      .localCheckpoint() // consumed by border assignment + final join
    val borderAssign = pairs
      .join(coreSet.select(col("id").as("b_id")), "b_id")
      .join(components.select(col("id").as("b_id"), col("cluster")), "b_id")
      .groupBy(col("a_id").as("id")).agg(min(col("cluster")).as("border_cluster"))

    points.join(components, Seq("id"), "left")
      .join(borderAssign, Seq("id"), "left")
      .select(points.columns.toIndexedSeq.map(col) :+
        coalesce(col("cluster"), col("border_cluster"), lit(-1L)).as("cluster"): _*)
  }

  /** The reference's coords⊕severity euclidean variant
    * (`cluster.py:50-58`): 3-D DBSCAN over (radians(lat), radians(lon),
    * severity ordinal). With eps ≈ 25 km/R⊕ ≈ 0.004 and severity steps
    * of 1.0, differing severities can never be neighbors — the metric
    * the reference chose effectively stratifies clusters by severity,
    * and this replicates that exactly. */
  def severityCoordsDbscan(df: DataFrame, latCol: String, lonCol: String,
                           severityNumCol: String, epsKm: Double, minPts: Int): DataFrame =
    runND(
      df.withColumn("__rlat", radians(col(latCol)))
        .withColumn("__rlon", radians(col(lonCol)))
        .withColumn("__sev", col(severityNumCol).cast("double")),
      Seq("__rlat", "__rlon", "__sev"),
      epsKm / graft.ops.Geo.EarthRadiusKm, minPts)
      .drop("__rlat", "__rlon", "__sev")

  /** Distributed DBSCAN. Returns (id, x, y, cluster). */
  def run(points: DataFrame, eps: Double, minPts: Int): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    val pts = points.select(col("id").cast("long"), col("x").cast("double"),
      col("y").cast("double"))
      .withColumn("cx", floor(col("x") / eps).cast("long"))
      .withColumn("cy", floor(col("y") / eps).cast("long"))

    // 9-cell probes: each point visits its cell + 8 neighbors; joining
    // probes.cell = points.cell yields every directed candidate pair
    // whose distance can be <= eps (including the self pair).
    val offsets = Seq(-1L, 0L, 1L)
    val probeCells = array(
      (for (dx <- offsets; dy <- offsets)
        yield struct((col("cx") + dx).as("px"), (col("cy") + dy).as("py"))): _*)
    val probes = pts.select(col("id").as("a_id"), col("x").as("ax"), col("y").as("ay"),
        explode(probeCells).as("pc"))
      .select(col("a_id"), col("ax"), col("ay"),
        col("pc.px").as("cx"), col("pc.py").as("cy"))

    // pairs feeds the degree count, the core-core edge build, AND the
    // border assignment — materialize the probe join once instead of
    // re-running the 9-cell shuffle per consumer (see ngramJaccard).
    val pairs = probes.join(pts.select(col("id").as("b_id"), col("x").as("bx"),
        col("y").as("by"), col("cx"), col("cy")), Seq("cx", "cy"))
      .filter(pow(col("ax") - col("bx"), 2) + pow(col("ay") - col("by"), 2) <= eps * eps)
      .select(col("a_id"), col("b_id"))
      .localCheckpoint()

    val degrees = pairs.groupBy(col("a_id")).agg(count(lit(1)).as("deg"))
    val cores = degrees.filter(col("deg") >= minPts).select(col("a_id").as("id"))
      .localCheckpoint()

    // Core-core edges → connected components (DataFrame-native
    // alternating-star contraction — see ConnectedComponents).
    val coreSet = cores.withColumn("is_core", lit(true))
    val coreEdges = pairs
      .join(coreSet.select(col("id").as("a_id")), "a_id")
      .join(coreSet.select(col("id").as("b_id")), "b_id")
      .filter(col("a_id") < col("b_id"))
      .localCheckpoint() // contraction re-consumes its input per round
    val components = ConnectedComponents.components(cores, coreEdges)
      .toDF("id", "cluster")
      .localCheckpoint() // consumed by border assignment + final join

    // Border points: non-core with a core neighbor — attach to the min
    // component among core neighbors (deterministic).
    val borderAssign = pairs
      .join(coreSet.select(col("id").as("b_id")), "b_id") // neighbor is core
      .join(components.select(col("id").as("b_id"), col("cluster")), "b_id")
      .groupBy(col("a_id").as("id")).agg(min(col("cluster")).as("border_cluster"))

    pts.select(col("id"), col("x"), col("y"))
      .join(components, Seq("id"), "left")
      .join(borderAssign, Seq("id"), "left")
      .select(col("id"), col("x"), col("y"),
        coalesce(col("cluster"), col("border_cluster"), lit(-1L)).as("cluster"))
  }

  /** N-dimensional exact local DBSCAN (test oracle for [[runND]]). */
  def localND(points: Seq[(Long, Seq[Double])], eps: Double, minPts: Int): Map[Long, Long] = {
    val arr = points.toArray
    val idx = arr.indices
    def d2(i: Int, j: Int): Double =
      arr(i)._2.zip(arr(j)._2).map { case (a, b) => (a - b) * (a - b) }.sum
    val neighbors = idx.map(i => idx.filter(j => d2(i, j) <= eps * eps)).toArray
    val core = idx.map(i => neighbors(i).length >= minPts).toArray
    val label = Array.fill(arr.length)(-2L)
    var cid = -1L
    for (i <- idx if core(i) && label(i) == -2L) {
      cid += 1
      label(i) = cid
      var frontier = List(i)
      while (frontier.nonEmpty) {
        val cur = frontier.head; frontier = frontier.tail
        for (n <- neighbors(cur) if label(n) < 0) {
          label(n) = cid
          if (core(n)) frontier = n :: frontier
        }
      }
    }
    idx.map(i => arr(i)._1 -> (if (label(i) == -2L) -1L else label(i))).toMap
  }

  /** Exact single-node reference implementation (classic DBSCAN) — the
    * semantics oracle for [[run]] and the small-input fallback, preserving
    * the reference's driver-side behavior (`cluster.py:40-44`). */
  def local(points: Seq[(Long, Double, Double)], eps: Double, minPts: Int): Map[Long, Long] = {
    val arr = points.toArray
    val idx = arr.indices
    def d2(i: Int, j: Int) = {
      val dx = arr(i)._2 - arr(j)._2; val dy = arr(i)._3 - arr(j)._3
      dx * dx + dy * dy
    }
    val neighbors = idx.map(i => idx.filter(j => d2(i, j) <= eps * eps)).toArray
    val core = idx.map(i => neighbors(i).length >= minPts).toArray
    val label = Array.fill(arr.length)(-2L) // -2 unvisited, -1 noise
    var cid = -1L
    for (i <- idx if core(i) && label(i) == -2L) {
      cid += 1
      label(i) = cid
      var frontier = List(i)
      while (frontier.nonEmpty) {
        val cur = frontier.head; frontier = frontier.tail
        for (n <- neighbors(cur) if label(n) < 0) {
          label(n) = cid
          if (core(n)) frontier = n :: frontier
        }
      }
    }
    idx.map(i => arr(i)._1 -> (if (label(i) == -2L) -1L else label(i))).toMap
  }
}
