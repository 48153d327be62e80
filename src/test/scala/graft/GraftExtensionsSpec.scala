package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SparkSessionExtensions route: the shared test session is built with
  * `withExtensions(new GraftExtensions)` (SparkTestBase), so the custom
  * expressions must resolve from plain SQL text with no per-function
  * registration calls.
  */
class GraftExtensionsSpec extends AnyFunSuite with SparkTestBase {

  test("custom functions usable from SQL via extensions") {
    val row = spark.sql(
      """SELECT point_in_polygon(0.5D, 0.5D, 'POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))') AS inside,
        |       point_in_polygon(5.0D, 5.0D, 'POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))') AS outside,
        |       graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dot,
        |       graft_rolling_hash('abc') AS rh""".stripMargin).collect().head
    assert(row.getBoolean(0))
    assert(!row.getBoolean(1))
    assert(row.getDouble(2) == 11.0)
    assert(row.getLong(3) == graft.text.RollingHashExpr.hashBytes("abc".getBytes("UTF-8")))
  }
}
