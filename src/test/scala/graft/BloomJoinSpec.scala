package graft

import graft.ops.BloomJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BloomJoinSpec extends AnyFunSuite with SparkTestBase {

  test("bloomPrunedJoin is row-identical to the plain inner join") {
    import spark.implicits._
    val big = (0L until 10000L).map(i => (i % 997, i)).toDF("key", "payload")
    val small = (0L until 997L by 13L).map(i => (i, s"dim_$i")).toDF("key", "name")

    val plain = big.join(small, Seq("key"))
      .select("key", "payload", "name").collect().map(_.toSeq).toSet
    val pruned = BloomJoin.bloomPrunedJoin(big, small, "key",
        expectedItems = 100L, numBits = 8192L)
      .select("key", "payload", "name").collect().map(_.toSeq).toSet
    assert(pruned == plain)
    assert(plain.nonEmpty)
  }

  test("an undersized bloom still returns the exact join result") {
    import spark.implicits._
    val big = (0L until 5000L).map(i => (i, i * 2)).toDF("key", "payload")
    val small = (0L until 5000L by 7L).map(i => (i, i.toString)).toDF("key", "name")

    // 64 bits for ~715 keys: nearly every probe is a false positive —
    // the equi-join must still drop them all
    val pruned = BloomJoin.bloomPrunedJoin(big, small, "key",
        expectedItems = 10L, numBits = 64L)
      .select("key", "payload", "name").collect().map(_.toSeq).toSet
    val plain = big.join(small, Seq("key"))
      .select("key", "payload", "name").collect().map(_.toSeq).toSet
    assert(pruned == plain)
  }

  test("the bloom predicate actually prunes non-matching rows pre-join") {
    import spark.implicits._
    val big = (0L until 100000L).toDF("key")
    val small = Seq(1L, 2L, 3L).toDF("key")
    val bloom = BloomJoin.bloomBytes(small, "key",
      expectedItems = 3L, numBits = 8192L)
    val kept = big.filter(BloomJoin.mightContain(bloom, col("key"))).count()
    // 3 true keys + fpp * 100k; at 8192 bits / 3 items fpp is ~0 —
    // allow a generous margin while still proving real pruning happened
    assert(kept >= 3 && kept < 1000, s"bloom kept $kept of 100000 rows")
  }
}
