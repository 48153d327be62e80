package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sketch-based aggregates: no cross-engine oracle (HLL internals are
  * engine-specific) — checked against exact values within the documented
  * error bound instead.
  */
class ApproxAggSpec extends AnyFunSuite with SparkTestBase {

  test("approx_count_distinct within rsd of exact") {
    val li = DerivedModel.table(spark, "/root/testdata/sf0.001", "lineitem")
    val row = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey"), rsd = 0.02).as("approx"))
      .collect().head
    val exact = row.getLong(0).toDouble
    val approx = row.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact < 0.06,
      s"approx $approx vs exact $exact beyond 3x rsd")
  }

  test("approx percentile brackets the exact median") {
    val li = DerivedModel.table(spark, "/root/testdata/sf0.001", "lineitem")
    val row = li.agg(
      expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("approx"),
      median(col("l_extendedprice")).as("exact"))
      .collect().head
    val approx = row.getDouble(0)
    val exact = row.getDouble(1)
    assert(math.abs(approx - exact) / exact < 0.05)
  }
}
