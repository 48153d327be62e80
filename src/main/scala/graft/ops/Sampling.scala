package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reproducible sampling for training-data pipelines.
  *
  * `df.sample()` draws from a per-partition RNG — the result changes with
  * partitioning, retries, and engine, which is useless for a dataset
  * recipe that must be re-runnable and auditable. Content-hash sampling
  * fixes that: a row is in the sample iff a hash of its KEY falls in the
  * accept range, so membership is a pure function of the data. Any
  * engine (and the DuckDB oracle) reproduces the exact same subset, the
  * filter pipelines into the scan (no shuffle), and the rate holds per
  * partition at any scale.
  */
object Sampling {

  /** Accept iff the first hex nibble of md5(key) is < `sixteenths`
    * (rate = sixteenths/16). md5 of the stringified key is deliberately
    * the hash: every engine agrees on it byte-for-byte.
    */
  def hashSample(df: DataFrame, keyCol: String, sixteenths: Int): DataFrame = {
    require(sixteenths >= 1 && sixteenths <= 16)
    val accepted = (0 until sixteenths).map(i => i.toHexString)
    df.filter(substring(md5(col(keyCol).cast("string").cast("binary")), 1, 1)
      .isin(accepted: _*))
  }

  /** Deterministic stratified sample: the `quota` hash-smallest rows per
    * stratum, ordered by (md5(key), key) — a total order, so the selected
    * set is unique and stable. One shuffle on the stratum column; at
    * scale, quotas per stratum bound the reducer-side state.
    */
  def stratifiedSample(df: DataFrame, stratumCol: String, keyCol: String,
      quota: Int): DataFrame = {
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(md5(col(keyCol).cast("string").cast("binary")), col(keyCol))
    df.withColumn("_graft_sample_rn", row_number().over(w))
      .filter(col("_graft_sample_rn") <= quota)
      .drop("_graft_sample_rn")
  }

  /** The hash-sample predicate alone, for composing into other filters. */
  def hashSamplePredicate(key: Column, sixteenths: Int): Column = {
    val accepted = (0 until sixteenths).map(i => i.toHexString)
    substring(md5(key.cast("string").cast("binary")), 1, 1).isin(accepted: _*)
  }
}
