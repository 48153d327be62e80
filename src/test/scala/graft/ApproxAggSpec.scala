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

  // the grouped forms previously gated as agg_approx_distinct /
  // agg_approx_percentile: moved here (spec-only) because the raw sketch
  // values are engine-specific and can never hash-match a DuckDB oracle;
  // the gated agg_approx_*_bounded twins carry the hard signal
  test("grouped approx_count_distinct within rsd of exact per group") {
    val li = DerivedModel.table(spark, "/root/testdata/sf0.001", "lineitem")
    val rows = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact"),
        approx_count_distinct(col("l_partkey"), rsd = 0.02).as("approx"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getLong(1).toDouble
      val approx = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact < 0.06,
        s"group ${r.get(0)}: approx $approx vs exact $exact beyond 3x rsd")
    }
  }

  test("grouped p95 percentile_approx brackets the exact p95") {
    val li = DerivedModel.table(spark, "/root/testdata/sf0.001", "lineitem")
      .withColumn("cents", floor(col("l_extendedprice") * 100 + 0.5))
    val rows = li.groupBy(col("l_returnflag"))
      .agg(percentile_approx(col("cents"), lit(0.95), lit(10000)).as("approx"),
        expr("percentile(cents, 0.95)").as("exact"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getLong(1).toDouble
      val exact = r.getDouble(2)
      assert(math.abs(approx - exact) / exact < 0.05,
        s"group ${r.get(0)}: approx p95 $approx vs exact $exact")
    }
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
