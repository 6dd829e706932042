package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Geospatial scalar operators (SURVEY.md §2.8 U1) — pure Catalyst
  * expressions, replacing the reference's 4-variant pandas UDF
  * (`/root/reference/etl-events.py:28-63`, `etl-historical.py:15-52`,
  * `etl-ml.py:21-58`, `inference-prediction.py:10-33`) with codegen'd
  * higher-order functions: no Python boundary, full whole-stage codegen.
  *
  * Canonical coordinate order is `[lon, lat]` (per `etl-events.py:65`);
  * the reference's lat/lon swap in `etl-ml.py:75-76` /
  * `inference-prediction.py:26` is a documented bug we do NOT replicate
  * (SURVEY §7.4 trap 3).
  */
object Geo {

  /** Point coords: `"[-122.5, 49.1]"` → array<double>. Malformed → null
    * (from_json PERMISSIVE), matching the UDF's null-on-garbage branch. */
  def pointCoords(coords: Column): Column =
    from_json(coords, org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.DoubleType))

  /** LineString coords: nested array-of-[lon,lat]. */
  def lineCoords(coords: Column): Column =
    from_json(coords, org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)))

  /** Mean of one axis (0 = lon, 1 = lat) over LineString vertices — the
    * `np.mean` centroid (`etl-historical.py:39-42`) as an aggregate HOF. */
  private def axisMean(line: Column, axis: Int): Column =
    aggregate(line, lit(0.0), (acc, p) => acc + p.getItem(axis)) / size(line)

  /** Centroid of a LineString as struct(lon, lat). */
  def lineCentroid(line: Column): Column =
    struct(axisMean(line, 0).as("lon"), axisMean(line, 1).as("lat"))

  /** Polymorphic GeoJSON → struct(lon, lat): Point passthrough,
    * LineString centroid, malformed/missing → null. The whole reference
    * UDF family as one Catalyst expression. */
  def lonLat(geoType: Column, coords: Column): Column = {
    val pc = pointCoords(coords)
    val lc = lineCoords(coords)
    when(geoType === "Point" && pc.isNotNull && size(pc) === 2,
        struct(pc.getItem(0).as("lon"), pc.getItem(1).as("lat")))
      .when(geoType === "LineString" && lc.isNotNull && size(lc) >= 1,
        lineCentroid(lc))
      .otherwise(lit(null))
  }

  /** Haversine distance in km between two (lat, lon) pairs, degrees in —
    * the metric of the reference's coordinate DBSCAN (`cluster.py:8-11`,
    * R⊕ = 6371.0088 km). */
  val EarthRadiusKm = 6371.0088
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1)
    val dLon = radians(lon2 - lon1)
    val a = pow(sin(dLat / 2), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon / 2), 2)
    lit(2 * EarthRadiusKm) * asin(sqrt(a))
  }

  /** Severity ordinal map MINOR/MODERATE/MAJOR → 1/2/3, fallback 1
    * (`cluster.py:13-17,49` incl. the fillna(1)). */
  def severityOrdinal(severity: Column): Column =
    when(severity === "MINOR", 1.0).when(severity === "MODERATE", 2.0)
      .when(severity === "MAJOR", 3.0).otherwise(1.0)

  /** Spatial radius self-join: every unordered pair of points within
    * distance `r` — "which incidents sit near each other", the
    * road-network question the reference answered with driver-side
    * DBSCAN, exposed as a standalone relational operator.
    *
    * Grid candidate generation (the [[graft.cluster.DBSCAN]] pattern as
    * a reusable join): bucket points into r-sized cells, probe each
    * point's 9-cell neighborhood with an EQUI-join on the cell key, then
    * apply the exact distance predicate. Any pair within r differs by
    * < r per axis, so it shares a 9-cell neighborhood — candidate
    * generation is provably lossless and the output equals the naive
    * cross-product filter (the DuckDB oracle) exactly; the cross product
    * itself never materializes. a < b dedupes the unordered pair;
    * distance is 6-dp rounded with the usual determinism contract.
    *
    * Scale: one narrow shuffle on the cell key; candidates per point are
    * bounded by its 9-cell population — at 100 TB, cell-size skew (a
    * dense metro) is AQE skew-split territory, and the knob is r itself:
    * the operator stays equi-join-shaped at any scale. */
  def radiusPairs(points: DataFrame, r: Double): DataFrame = {
    val pts = points.select(col("id").cast("long"), col("x").cast("double"),
        col("y").cast("double"))
      .withColumn("cx", floor(col("x") / r).cast("long"))
      .withColumn("cy", floor(col("y") / r).cast("long"))
    val offsets = Seq(-1L, 0L, 1L)
    val probeCells = array(
      (for (dx <- offsets; dy <- offsets)
        yield struct((col("cx") + dx).as("px"), (col("cy") + dy).as("py"))): _*)
    val probes = pts
      .select(col("id").as("a_id"), col("x").as("ax"), col("y").as("ay"),
        explode(probeCells).as("pc"))
      .select(col("a_id"), col("ax"), col("ay"),
        col("pc.px").as("cx"), col("pc.py").as("cy"))
    probes.join(pts.select(col("id").as("b_id"), col("x").as("bx"),
        col("y").as("by"), col("cx"), col("cy")), Seq("cx", "cy"))
      .filter(col("a_id") < col("b_id"))
      // plain multiplication, not pow(x, 2): both engines then do the
      // identical IEEE multiply and the 6-dp distance is bit-portable
      .withColumn("d2",
        (col("ax") - col("bx")) * (col("ax") - col("bx")) +
          (col("ay") - col("by")) * (col("ay") - col("by")))
      .filter(col("d2") <= r * r)
      .select(col("a_id"), col("b_id"), round(sqrt(col("d2")), 6).as("dist"))
      .orderBy(col("a_id"), col("b_id"))
  }
}
