package graft

import graft.ops.Sampling
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite with SparkTestBase {

  test("withGlobalPosition: contiguous 0-based positions equal to global rank") {
    import spark.implicits._
    val df = (0L until 1000L).toDF("id")
    val out = Sampling.withGlobalPosition(df, "id")
      .select(col("id"), col("position")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    assert(out.size == 1000)
    assert(out.values.toSeq.sorted == (0L until 1000L), "contiguous, 0-based")

    // positions must equal the rank in the (md5(key), key) total order —
    // the single-partition window reference
    val ref = df.select(col("id"),
        (row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(Sampling.shuffleKey(col("id")), col("id"))) - 1).cast("long")
          .as("position"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == ref)
  }

  test("withGlobalPosition is partitioning-invariant") {
    import spark.implicits._
    val df = (0L until 500L).toDF("id")
    val a = Sampling.withGlobalPosition(df.repartition(7), "id")
      .select("id", "position").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Sampling.withGlobalPosition(df.coalesce(1), "id")
      .select("id", "position").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("deterministicShuffle orders by the content hash") {
    import spark.implicits._
    val df = (0L until 100L).toDF("id")
    val got = Sampling.deterministicShuffle(df, "id").collect().map(_.getLong(0)).toSeq
    val want = (0L until 100L)
      .sortBy(i => (org.apache.commons.codec.digest.DigestUtils.md5Hex(i.toString), i))
    assert(got == want)
  }
}
