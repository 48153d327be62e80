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

  test("temperatureMixSample: small domains upweighted, rate-1 cap keeps " +
    "all, membership matches the driver-side formula") {
    import spark.implicits._
    // domains: tiny (3 rows) and big (1000 rows). alpha=0.5 weights:
    // s_tiny = isqrt(3) = 1, s_big = isqrt(1000) = 31, S = 32.
    // target 500 => r_tiny = 500*1/(32*3) > 1 (capped: keep all),
    // r_big = 500*31/(32*1000) ~ 0.484
    val df = ((0L until 3L).map(i => (i, "tiny")) ++
      (100L until 1100L).map(i => (i, "big"))).toDF("id", "dom")
    val kept = Sampling.temperatureMixSample(df, "dom", "id", targetRows = 500L)
      .collect().map(r => (r.getLong(1), r.getString(0)))
    val tinyKept = kept.count(_._2 == "tiny")
    val bigKept = kept.count(_._2 == "big")
    assert(tinyKept == 3, s"rate >= 1 must keep the whole tiny domain, got $tinyKept")
    assert(bigKept > 350 && bigKept < 600,
      s"big domain should keep ~48%, got $bigKept/1000")
    // membership is the driver-replayable hash threshold
    val thrBig = math.floor(500.0 * 31 / (32.0 * 1000) * 4294967296.0).toLong
    val wantBig = (100L until 1100L).filter { i =>
      org.apache.commons.codec.digest.DigestUtils.md5Hex(i.toString)
        .substring(0, 8) < f"$thrBig%08x"
    }.toSet
    assert(kept.filter(_._2 == "big").map(_._1).toSet == wantBig,
      "big-domain membership must equal the md5-threshold formula")
    // determinism
    val again = Sampling.temperatureMixSample(df, "dom", "id", targetRows = 500L)
      .collect().map(r => (r.getLong(1), r.getString(0))).toSet
    assert(again == kept.toSet)
  }

  test("temperatureMixSample integer isqrt is exact around perfect squares") {
    import spark.implicits._
    // counts 15, 16, 17 -> isqrt 3, 4, 4; with target big enough every
    // rate caps at 1, so the observable is just that nothing crashes and
    // all rows survive; the isqrt exactness is observed through the keep
    // RATES at a non-capping target: r_d ∝ isqrt(c_d)/c_d
    val df = ((0L until 15L).map(i => (i, "a")) ++
      (100L until 116L).map(i => (i, "b")) ++
      (200L until 217L).map(i => (i, "c"))).toDF("id", "dom")
    val all = Sampling.temperatureMixSample(df, "dom", "id",
      targetRows = 1000L).count()
    assert(all == 48L, "all three domains cap at rate 1")
    // non-capping: s = (3,4,4), S = 11; thresholds floor-scale exactly
    val kept = Sampling.temperatureMixSample(df, "dom", "id", targetRows = 10L)
      .collect().map(r => (r.getLong(1), r.getString(0)))
    def thr(sd: Long, cd: Long): Long =
      math.floor(10.0 * sd / (11.0 * cd) * 4294967296.0).toLong
    val want = (
      (0L until 15L).filter(i => org.apache.commons.codec.digest.DigestUtils
        .md5Hex(i.toString).substring(0, 8) < f"${thr(3, 15)}%08x").map((_, "a")) ++
      (100L until 116L).filter(i => org.apache.commons.codec.digest.DigestUtils
        .md5Hex(i.toString).substring(0, 8) < f"${thr(4, 16)}%08x").map((_, "b")) ++
      (200L until 217L).filter(i => org.apache.commons.codec.digest.DigestUtils
        .md5Hex(i.toString).substring(0, 8) < f"${thr(4, 17)}%08x").map((_, "c"))
    ).toSet
    assert(kept.toSet == want,
      s"isqrt-derived thresholds must replay exactly: got ${kept.toSet}, want $want")
  }

  test("epochRepeat: integer copies exact, fractional copies hash-nested, zero drops") {
    import spark.implicits._
    val df = (0L until 3000L).map(i => (i, s"d${i % 3}")).toDF("id", "dom")
    def out(e: Map[String, Double]) =
      Sampling.epochRepeat(df, "id", "dom", e, defaultEpochs = 1.0)
        .collect().map(r => (r.getLong(0), r.getLong(2)))
    // integer factors: exactly e copies per row, epoch_idx 0..e-1
    val twice = out(Map("d0" -> 2.0, "d1" -> 0.0))
    val byId = twice.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert((0L until 3000L by 3L).forall(byId(_) == Seq(0L, 1L)), "d0 rows twice")
    assert((1L until 3000L by 3L).forall(i => !byId.contains(i)), "d1 rows dropped")
    assert((2L until 3000L by 3L).forall(byId(_) == Seq(0L)), "default once")
    // fractional: ~f of the domain gains the extra copy, and the extra
    // population NESTS across fractions (same hash threshold machinery)
    def extras(f: Double) = out(Map("d0" -> (1.0 + f)))
      .groupBy(_._1).collect { case (i, c) if i % 3 == 0 && c.length == 2 => i }.toSet
    val e25 = extras(0.25); val e75 = extras(0.75)
    assert(e25.subsetOf(e75), "fractional-copy population must nest")
    assert(math.abs(e25.size - 250) < 60 && math.abs(e75.size - 750) < 60,
      s"fractions off: ${e25.size}/1000 for 0.25, ${e75.size}/1000 for 0.75")
  }

  test("domainCapSample equals the per-domain reference window; caps nest") {
    import spark.implicits._
    val df = (0L until 900L).map(i => (i, s"dom${i % 4}")).toDF("id", "dom")
    val got = Sampling.domainCapSample(df, "dom", "id", cap = 50L)
      .select("id").collect().map(_.getLong(0)).toSet
    // reference: one row_number window per domain over the (md5, id) order
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("dom"))
      .orderBy(Sampling.shuffleKey(col("id")), col("id"))
    val ref = df.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 50L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == ref)
    assert(got.size == 200, s"4 domains x 50 = 200, got ${got.size}")
    // a tighter cap selects a SUBSET (stability under cap changes)
    val tight = Sampling.domainCapSample(df, "dom", "id", cap = 10L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(tight.size == 40 && tight.subsetOf(got))
    // under-cap domains keep everything
    val all = Sampling.domainCapSample(df, "dom", "id", cap = 300L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(all.size == 900)
  }

  test("tokenBudgetSelect equals the single-window reference order") {
    import spark.implicits._
    val df = (0L until 1000L)
      .map(i => (i, i % 7, i % 13 + 1))
      .toDF("id", "score", "toks")
    val out = Sampling.tokenBudgetSelect(df, "id", "toks", "score",
        budget = 2000L)
      .select("id", "tokens_before").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    // reference: one global window over the (score desc, md5, id) order
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("score").desc, Sampling.shuffleKey(col("id")), col("id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val ref = df.withColumn("tb", coalesce(sum(col("toks")).over(w), lit(0L)))
      .filter(col("tb") < 2000L)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out == ref)
    // greedy-fill contract: running totals stay under budget, and the
    // selected set's total overshoots by at most one row's tokens
    val total = out.keys.toSeq.map(i => i % 13 + 1).sum
    assert(out.values.max < 2000L)
    assert(total >= 2000L && total - 2000L < 13L, s"total $total")
  }

  test("tokenBudgetSelect: budget >= corpus keeps everything; partitioning-invariant") {
    import spark.implicits._
    val df = (0L until 300L).map(i => (i, i % 3, 5L)).toDF("id", "score", "toks")
    assert(Sampling.tokenBudgetSelect(df, "id", "toks", "score", 100000L).count() == 300L)
    val a = Sampling.tokenBudgetSelect(df.repartition(7), "id", "toks", "score", 500L)
      .select("id").collect().map(_.getLong(0)).toSet
    val b = Sampling.tokenBudgetSelect(df.coalesce(1), "id", "toks", "score", 500L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a == b && a.size == 100, "100 docs of 5 tokens fill a 500-token budget")
  }
}
