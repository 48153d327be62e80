package graft

import graft.ops.AsofJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsofJoinSpec extends AnyFunSuite with SparkTestBase {

  private def leftDf = {
    import spark.implicits._
    Seq(
      (1L, 10L, 100L, "l1"),
      (2L, 10L, 200L, "l2"),
      (3L, 10L, 250L, "l3"),
      (4L, 20L, 50L, "l4"),   // before any right row for key 20
      (5L, 30L, 100L, "l5")   // key with no right rows at all
    ).toDF("id", "k", "ts", "tag")
  }

  private def rightDf = {
    import spark.implicits._
    Seq(
      (10L, 90L, 1.0),
      (10L, 200L, 2.0), // ties left id=2 at ts=200
      (10L, 240L, 3.0),
      (20L, 60L, 4.0)
    ).toDF("k", "ts", "v")
  }

  test("inclusive backward as-of picks the latest right row at-or-before") {
    val out = AsofJoin.backward(leftDf, rightDf, Seq("k"), "ts", "ts", Seq("v"))
      .select(col("id"), col("asof_v"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(1L) == Some(1.0)) // ts=100 sees right@90
    assert(out(2L) == Some(2.0)) // ts=200 sees right@200 (inclusive)
    assert(out(3L) == Some(3.0)) // ts=250 sees right@240
    assert(out(4L) == None)      // ts=50 precedes right@60
    assert(out(5L) == None)      // no right rows for key
  }

  test("strict backward as-of excludes equal timestamps") {
    val out = AsofJoin.backward(leftDf, rightDf, Seq("k"), "ts", "ts",
      Seq("v"), strict = true)
      .select(col("id"), col("asof_v"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(2L) == Some(1.0)) // ts=200 must NOT see right@200, only right@90
    assert(out(3L) == Some(3.0))
  }

  test("NULL payload in the matched right row stays NULL (no substitution)") {
    import spark.implicits._
    // latest qualifying right row (ts=200) has v = NULL, w = "w2": the
    // output must carry (NULL, "w2") from THAT row — not v=1.0 from the
    // older ts=90 row (per-column last(ignoreNulls) would mix rows)
    val l = Seq((1L, 10L, 300L)).toDF("id", "k", "ts")
    val r = Seq(
      (10L, 90L, Some(1.0), Some("w1")),
      (10L, 200L, None: Option[Double], Some("w2"))
    ).toDF("k", "ts", "v", "w")
    val row = AsofJoin.backward(l, r, Seq("k"), "ts", "ts", Seq("v", "w"))
      .select(col("asof_v"), col("asof_w")).collect().head
    assert(row.isNullAt(0), "NULL payload must not be replaced by an older right row's value")
    assert(row.getString(1) == "w2")
  }

  test("all-NULL payload right row still matches (struct is non-null)") {
    import spark.implicits._
    val l = Seq((1L, 10L, 300L)).toDF("id", "k", "ts")
    val r = Seq(
      (10L, 90L, Some(1.0)),
      (10L, 200L, None: Option[Double])
    ).toDF("k", "ts", "v")
    val row = AsofJoin.backward(l, r, Seq("k"), "ts", "ts", Seq("v"))
      .select(col("asof_v")).collect().head
    assert(row.isNullAt(0))
  }

  test("matches the quadratic theta-join formulation on events data") {
    val ev = DerivedModel.events(spark, "/root/testdata/sf0.001")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value"))
    val fast = AsofJoin.backward(clicks, purchases, Seq("user_id"), "ts", "ts",
      Seq("value"), strict = true)
      .select(col("event_id"), col("asof_value"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    // naive: every qualifying pair, keep max right ts per left row
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_id")).orderBy(col("r_ts").desc)
    val slow = clicks
      .join(purchases.select(col("user_id").as("r_uid"), col("ts").as("r_ts"),
        col("value").as("r_v")),
        col("user_id") === col("r_uid") && col("r_ts") < col("ts"), "left")
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col("event_id"), col("r_v"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(fast == slow)
  }
}
