package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftColumnBridge.{column, expression}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter join pruning: filter the big (fact) side of an equi-join
  * by a bloom filter built from the small/mid (dim) side's keys BEFORE the
  * join's shuffle, so fact rows that cannot match never enter the
  * exchange.
  *
  * This is the semi-join-reduction classic (and what Spark's own
  * `InjectRuntimeFilter` does for eligible shapes, but that rule only
  * fires with a selective filter creator and within its own size bounds —
  * this operator makes the reduction explicit and caller-controlled). At
  * 100 TB the win is the shuffle-volume cut on the fact side: a dim side
  * of 10M keys is a few MB of bloom bits, while the pruned fact rows would
  * have been TBs of exchange.
  *
  * Mechanics: one aggregation over the dim keys builds an
  * `org.apache.spark.util.sketch.BloomFilter` (Spark's
  * [[BloomFilterAggregate]], map-side combined); the resulting bytes —
  * KBs–MBs, bounded by `numBits` — come back to the driver exactly like a
  * scalar-subquery runtime filter materializes, and are re-embedded as a
  * binary literal inside a codegen'd [[BloomFilterMightContain]] predicate
  * on the fact scan. Keys are hashed with `xxhash64` on BOTH sides (the
  * aggregate requires a LONG child; hashing also makes the probe
  * type-agnostic).
  *
  * False positives only let extra rows into the join, where the exact
  * equi-condition drops them — the result is row-identical to the plain
  * join, which is exactly what the gated oracle checks. Size `numBits` ≈
  * 10× expected distinct keys for ~1% fpp; an undersized bloom degrades
  * gracefully (more pass-through, never wrong results).
  */
object BloomJoin {

  /** Bloom bytes for `keys`'s `key` column (hashed via xxhash64).
    * One map-side-combined aggregation; the bytes are `numBits / 8` plus a
    * small header.
    */
  def bloomBytes(keys: DataFrame, key: String, expectedItems: Long,
      numBits: Long): Array[Byte] = {
    val agg = new BloomFilterAggregate(
      expression(xxhash64(col(key))),
      Literal(expectedItems), Literal(numBits))
    keys.select(column(agg.toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]](0)
  }

  /** Predicate `might_contain(<bloom literal>, xxhash64(keyCol))`. */
  def mightContain(bloom: Array[Byte], keyCol: Column): Column =
    column(BloomFilterMightContain(
      Literal(bloom, BinaryType), expression(xxhash64(keyCol))))

  /** Inner equi-join of `big` and `small` on `key` with the big side
    * bloom-pruned first. Row-identical to `big.join(small, Seq(key))`.
    *
    * `expectedItems` should estimate the dim side's distinct keys — an
    * over-estimate wastes bloom bits, an under-estimate raises fpp (still
    * correct). The default `numBits` (8M bits = 1 MB) holds ~800k keys at
    * ~1% fpp.
    */
  def bloomPrunedJoin(big: DataFrame, small: DataFrame, key: String,
      expectedItems: Long = 1000000L, numBits: Long = 8L * 1024 * 1024): DataFrame = {
    val bloom = bloomBytes(small, key, expectedItems, numBits)
    big.filter(mightContain(bloom, big(key))).join(small, Seq(key))
  }
}
