package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Clean, Geo, Ingest}

/** Open511 ETL parity: golden assertions on the checked-in fixture,
  * covering the reference's implied invariants (SURVEY.md §5):
  * dedup idempotence, Point/LineString/malformed centroid, severity
  * fallback, [lon,lat] ordering. */
class Open511Spec extends AnyFunSuite {
  import TestSpark._
  lazy val events = Ingest.readEvents(spark, Ingest.fixturePath).cache()

  test("strict read parses all fixture events incl. polymorphic coords") {
    assert(events.count() == 8) // 7 distinct + 1 duplicate id
    assert(events.schema("geography").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .apply("coordinates").dataType == org.apache.spark.sql.types.StringType)
  }

  test("dedup by id is idempotent and keeps 7 events") {
    val d = Clean.dedupById(events)
    assert(d.count() == 7)
    assert(Clean.dedupById(d).count() == 7)
  }

  test("centroid: Point passthrough, LineString mean, garbage null, [lon,lat]") {
    val ll = events.dropDuplicates("id").select(col("id"),
      Geo.lonLat(col("geography.type"), col("geography.coordinates")).as("p"))
      .collect().map(r => r.getString(0) ->
        Option(r.getStruct(1)).map(s => (s.getDouble(0), s.getDouble(1)))).toMap
    assert(ll("example.gov/EV-1").contains((-122.5, 49.1)))          // Point
    val c2 = ll("example.gov/EV-2").get                               // LineString centroid
    assert(math.abs(c2._1 - (-120.2)) < 1e-9 && math.abs(c2._2 - 50.266666666666666) < 1e-9)
    assert(ll("example.gov/EV-4").isEmpty, "null geography → null")
    assert(ll("example.gov/EV-5").isEmpty, "garbage coords → null")
    assert(ll("example.gov/EV-7").contains((-121.25, 51.5)), "single-vertex line = that point")
  }

  test("ml table: duration in days, array sizes, severity ordinal fallback") {
    val ml = Clean.mlTable(events)
    val row = ml.filter(col("id") === "example.gov/EV-2").first()
    assert(math.abs(row.getAs[Double]("duration") - 2.5208333333333335) < 1e-9)
    assert(row.getAs[Int]("num_roads") == 2 && row.getAs[Int]("num_areas") == 1)
    val unknown = ml.filter(col("id") === "example.gov/EV-3").first()
    assert(unknown.getAs[Double]("severity_numeric") == 1.0, "UNKNOWN falls back to 1")
    assert(!ml.columns.contains("+ivr_message"), "junk columns dropped")
  }

  test("timestamps are offset-aware UTC") {
    val ts = Clean.withTimestamps(events).filter(col("id") === "example.gov/EV-1")
      .select(date_format(col("created_ts"), "yyyy-MM-dd HH:mm:ss")).first().getString(0)
    assert(ts == "2024-09-05 15:51:04") // 08:51:04-07:00 → UTC
  }

  test("time-series table explodes subtypes × roads × areas") {
    val t = Clean.timeSeriesTable(events)
    // EV-3: 2 subtypes × 1 road × 2 areas = 4 rows
    assert(t.filter(col("id") === "example.gov/EV-3").count() == 4)
    // EV-4: empty subtype/road arrays kept via explode_outer (1 row, nulls)
    val ev4 = t.filter(col("id") === "example.gov/EV-4")
    assert(ev4.count() == 1 && ev4.first().getAs[String]("road") == null)
  }

  test("severity rollup counts deduped events") {
    val r = Clean.severityRollup(events).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r == Map("MINOR" -> 2L, "MODERATE" -> 2L, "MAJOR" -> 2L, "UNKNOWN" -> 1L))
  }

  test("typed Dataset[CleanedEvent] view: schema-checked, typed transforms work") {
    val ds = graft.schema.CleanedEvent.view(Clean.mlTable(events))
    val majors = ds.filter(e => e.severity.contains("MAJOR")).collect()
    assert(majors.length == 2)
    assert(majors.forall(_.severity_numeric.contains(3.0)))
    val withCoords = ds.filter(_.longitude.isDefined).count()
    assert(withCoords == 5) // EV-4 (null geography) and EV-5 (garbage) excluded
  }

  test("athena rollups: subtype and month/year counts partition the time-series table") {
    val ts = Clean.timeSeriesTable(events)
    val n = ts.count()
    assert(Clean.subtypeRollup(events).agg(sum("cnt")).first().getLong(0) == n)
    val mon = Clean.monthlyRollup(events).collect()
    assert(mon.map(_.getLong(2)).sum == n)
    val ym = mon.map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(ym == ym.sorted, "month/year rollup must be ordered (athena.sql:29)")
  }

  test("haversine: Vancouver→Kelowna ≈ 272 km") {
    import spark.implicits._
    val d = Seq((49.28, -123.12, 49.89, -119.50)).toDF("lat1", "lon1", "lat2", "lon2")
      .select(Geo.haversineKm(col("lat1"), col("lon1"), col("lat2"), col("lon2")))
      .first().getDouble(0)
    assert(math.abs(d - 272) < 5, s"got $d")
  }
}
