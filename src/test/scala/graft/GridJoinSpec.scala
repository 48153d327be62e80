package graft

import graft.geo.GridJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GridJoinSpec extends AnyFunSuite with SparkTestBase {

  test("grid cell equi-join equals the naive theta join on every zone") {
    val pts = DerivedModel.occurrence(spark, "/root/testdata/sf0.001")
    val zs = GridJoin.zones(spark)
    val got = GridJoin.pointsPerZone(pts, "decimalLatitude",
        "decimalLongitude", "taxonKey", zs)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // naive reference: bbox theta join (the shape the grid join replaces)
    val want = pts.crossJoin(zs)
      .filter(col("decimalLatitude") >= col("lat0") &&
        col("decimalLatitude") <= col("lat1") &&
        col("decimalLongitude") >= col("lon0") &&
        col("decimalLongitude") <= col("lon1"))
      .groupBy(col("zone_id"))
      .agg(count(lit(1)), countDistinct(col("taxonKey")))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == want && got.nonEmpty,
      s"grid join diverges from theta join: ${got.size} vs ${want.size} zones")
  }

  test("a point on a cell boundary joins through exactly one cell") {
    import spark.implicits._
    // lat 10.0 sits exactly on the 10-degree cell edge; the zone covers
    // cells on both sides of it — the pair must appear once, not twice
    val pts = Seq((7L, 10.0, 5.0)).toDF("taxonKey", "lat", "lon")
    val zs = spark.range(1).selectExpr("id AS zone_id", "0L AS lat0",
      "20L AS lat1", "0L AS lon0", "20L AS lon1")
    val got = GridJoin.pointsPerZone(pts, "lat", "lon", "taxonKey", zs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((0L, 1L)), s"got $got")
  }
}
