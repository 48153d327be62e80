package graft.ops

import org.apache.spark.sql.DataFrame

/** Scale-adaptive parallelism floor for compute-heavy operator inputs.
  *
  * Why this exists (r16 optimization round): a parquet file is split at
  * ROW-GROUP boundaries, so a table written as one row group is ONE scan
  * task no matter how many cores exist — and every per-row expression
  * that rides the scan stage (tokenization, shingling, minhash/simhash,
  * BPE encode, KN scoring) then runs single-threaded. At sf0.1 every
  * base table is a single-row-group file, which serialized the whole
  * scan-side compute of the bench on a 32-core box (measured: the
  * all-pairs kNN dropped 3.8 → 0.7 s when its anchor side was spread).
  *
  * [[spreadIfNarrow]] inserts a round-robin repartition to the cluster's
  * `defaultParallelism` ONLY when the input's leaf relations are smaller
  * than `defaultParallelism × spark.sql.files.maxPartitionBytes` — i.e.
  * when the scan cannot possibly yield one task per core. The decision
  * reads optimizer STATISTICS (no job, no plan execution); at production
  * scale (TB-sized inputs) the condition is false and the operator keeps
  * its shuffle-free scan — this is a parallelism FLOOR derived from input
  * size, never a constant tuned for local mode. Row placement changes;
  * every caller computes placement-independent results (pair sets,
  * grouped aggregates, per-row scores), which the oracle board pins.
  */
object Parallelism {

  def spreadIfNarrow(df: DataFrame): DataFrame = {
    if (df.isStreaming) return df
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    val maxPartitionBytes = org.apache.spark.network.util.JavaUtils
      .byteStringAsBytes(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "128MB"))
    // NonFatal only (r16 ADVICE): a blanket Throwable catch would swallow
    // InterruptedException/fatal errors and silently mask a real planning
    // bug as "don't spread"
    val leafBytes =
      try df.queryExecution.optimizedPlan.collectLeaves()
        .map(_.stats.sizeInBytes).sum
      catch { case scala.util.control.NonFatal(_) => return df }
    if (leafBytes < BigInt(target) * maxPartitionBytes) df.repartition(target)
    else df
  }
}
