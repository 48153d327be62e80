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

  test("weightedSample: per-group rates, nested subsets, determinism") {
    import spark.implicits._
    val df = (0L until 4000L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "grp")
    def ids(w: Map[String, Double], d: Double) =
      Sampling.weightedSample(df, "id", "grp", w, d)
        .collect().map(_.getLong(0)).toSet

    val half = ids(Map("a" -> 0.5), 1.0)
    val quarter = ids(Map("a" -> 0.25), 1.0)
    val aHalf = half.count(_ % 2 == 0)
    assert(math.abs(aHalf - 1000) < 100, s"~50% of group a kept, got $aHalf/2000")
    assert(half.count(_ % 2 == 1) == 2000, "default weight 1.0 keeps all of b")
    // monotone recipes: the 25% sample is a subset of the 50% sample
    assert(quarter.filter(_ % 2 == 0).subsetOf(half.filter(_ % 2 == 0)))
    assert(ids(Map("a" -> 0.5), 1.0) == half, "pure function of the data")
    assert(ids(Map("a" -> 0.0), 0.0).isEmpty)
  }

  test("datasetSplit: full coverage, stable labels, nested train bands") {
    import spark.implicits._
    val df = (0L until 4000L).toDF("id")
    def splits(train: Double, v: Double) =
      Sampling.datasetSplit(df, "id", train, v)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val s = splits(0.8, 0.1)
    assert(s.size == 4000 && s.values.toSet == Set("train", "val", "test"))
    val n = s.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(math.abs(n("train") - 3200) < 150, s"~80% train, got ${n("train")}")
    assert(math.abs(n("val") - 400) < 100, s"~10% val, got ${n("val")}")
    assert(splits(0.8, 0.1) == s, "pure function of the key")
    // scaling-law nesting: a smaller train band is a subset of a larger one
    val small = splits(0.5, 0.1).filter(_._2 == "train").keySet
    assert(small.subsetOf(s.filter(_._2 == "train").keySet))
  }

  test("dedupBlocks keeps each block's first occurrence and rebuilds docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f"),  // blocks: "a b c", "d e f"
      (2L, "a b c x y z"),  // "a b c" removed (first seen in doc 1)
      (3L, "a b c d e f"),  // fully deduplicated -> empty
      (4L, "p q r")         // untouched
    ).toDF("doc_id", "text")
    val out = graft.dedup.Dedup.dedupBlocks(docs, "doc_id", "text", blockTokens = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(
      1L -> "a b c d e f",
      2L -> "x y z",
      3L -> "",
      4L -> "p q r"))
  }

  test("hourly gap-fill: dense grid, zero rows on gaps, forward fill") {
    import spark.implicits._
    val events = Seq(
      (1L, "2024-01-01 00:10:00", 1.00),
      (1L, "2024-01-01 00:40:00", 2.00),
      // gap at 01:00
      (1L, "2024-01-01 02:05:00", 5.00),
      (2L, "2024-01-01 10:00:00", 7.00)
    ).toDF("user_id", "ts_s", "value")
      .select(col("user_id"), col("ts_s").cast("timestamp").as("ts"), col("value"))
    val out = graft.ops.Resample.hourlyGapFill(events, "user_id", "ts", "value")
      .orderBy("user_id", "bucket_start")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString.take(13), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Long])))
    assert(out.toSeq == Seq(
      (1L, "2024-01-01 00", 2L, Some(300L), Some(300L)),
      (1L, "2024-01-01 01", 0L, None, Some(300L)), // gap: zero events, ffill
      (1L, "2024-01-01 02", 1L, Some(500L), Some(500L)),
      (2L, "2024-01-01 10", 1L, Some(700L), Some(700L))))
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
