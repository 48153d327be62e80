package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utility: salted equi-join.
  *
  * AQE's skew-join handling covers sort-merge joins at runtime, but when a
  * handful of hot keys dominate (the "common species" problem in
  * occurrence data — a few taxa hold a large share of all records),
  * pre-salting bounds any single task deterministically: the big side
  * derives a salt from its row content, the small side is replicated
  * `saltBuckets` times, and the join key becomes (key, salt). Result is
  * row-identical to the plain join; the hot key's rows spread over
  * `saltBuckets` tasks.
  */
object SkewJoin {

  /** Inner equi-join of `big` and `small` on `key`, salted.
    * The salt is `pmod(hash(all big-side columns), saltBuckets)` —
    * deterministic, so results are reproducible run to run.
    */
  def saltedEquiJoin(big: DataFrame, small: DataFrame, key: String,
      saltBuckets: Int = 16): DataFrame = {
    require(saltBuckets > 0)
    val bigSalted = big.withColumn("_graft_salt",
      pmod(hash(big.columns.map(col).toIndexedSeq: _*), lit(saltBuckets)))
    val smallExploded = small.withColumn("_graft_salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    bigSalted
      .join(smallExploded, Seq(key, "_graft_salt"))
      .drop("_graft_salt")
  }
}
