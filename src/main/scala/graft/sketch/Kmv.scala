package graft.sketch

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** K-MINIMUM-VALUES distinct-count sketch (Bar-Yossef et al. 2002; the
  * theta-sketch family's simplest member) — the distinct-count sketch
  * that CAN hash-gate against an external oracle, unlike engine-internal
  * HLL whose register layout is opaque (the r4 lesson that moved
  * `approx_count_distinct` to spec-only; [[Hll]] re-derives the registers
  * explicitly and is gated in its own right): the sketch is literally the
  * `k` smallest hash values of the distinct set, and the estimator is one
  * integer division — every byte replays in DuckDB.
  *
  * Hash space: the first 12 hex chars of md5 as a 48-bit integer
  * (`conv` ≡ DuckDB `CAST('0x'||… AS BIGINT)`), so `(k−1)·2^48` stays in
  * int64 for k up to 2^14. Hash collisions collapse deterministically
  * (both engines `DISTINCT` the same 48-bit values) — at 1M distinct
  * values the collision expectation is ~0.2%, inside the sketch's own
  * `O(1/√k)` error.
  *
  * Estimator: `n < k` → exact `n` (the sketch IS the distinct set);
  * else `(k−1)·2^48 div h_(k)` — the classic unbiased KMV estimate,
  * floored once.
  *
  * Scale shape: the sketch build is `distinct` (one content-keyed
  * shuffle, map-side combined) + `TakeOrdered(k)` — never a global
  * sort; per-shard sketches MERGE LOSSLESSLY (`k` smallest of the union
  * of per-shard sketches = `k` smallest overall, since every global
  * minimum is a minimum of its shard), so a 100 TB corpus sketches
  * shard-by-shard and unions k-row relations — the same
  * combine-the-summaries contract as the fixed-grid quantile sketch.
  */
object Kmv {

  val HashSpace: Long = 1L << 48

  /** The shared 48-bit hash: first 12 md5 hex chars as an integer. */
  def kmvHashCol(value: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(value.cast("string").cast("binary")), 1, 12), 16, 10)
      .cast("long")

  /** 48-bit hash relation `h` of the column's distinct values. */
  def kmvHashes(df: DataFrame, valueCol: String): DataFrame =
    df.select(col(valueCol).as("_v")).distinct()
      .select(kmvHashCol(col("_v")).as("h"))
      .distinct()

  /** STOCHASTIC-AVERAGING variant (one minimum per `h mod k` bucket —
    * the Flajolet/minCount shape): strictly bounded k-row state whose
    * per-bucket `min` is an ASSOCIATIVE aggregate, which makes it the
    * streaming-maintainable form ([[graft.streaming.StreamingOps
    * .streamingBucketMinSketch]]): bottom-k needs the whole distinct
    * set re-ranked per update; a bucket min folds row-by-row in update
    * mode with no dedup state at all (duplicates can't change a min).
    * Estimator: `n̂ = k²·S div Σ(bucket minima)` — for uniform hashes
    * `E[min] ≈ S·k/n` per bucket, so the sum inverts to n; biased when
    * `n ≲ k` (sparse buckets — `n_buckets` beside the estimate flags
    * that regime). Exactly replayable: one integer division, in-range
    * for `k ≤ 181` at S = 2^48 (beyond that, drop to the DECIMAL
    * multiply the KN gate uses).
    */
  def bucketMinSketch(hashes: DataFrame, k: Int): DataFrame =
    hashes.groupBy((col("h") % k).as("bucket")).agg(min(col("h")).as("min_h"))

  /** One-row `(n_buckets, sum_min, est_distinct)` for a bucket-min
    * sketch. */
  def bucketMinEstimate(sketch: DataFrame, k: Int): DataFrame = {
    require(k.toLong * k <= Long.MaxValue / HashSpace,
      s"k^2 * 2^48 must stay in int64, got k=$k (max k = 181)")
    // greatest(..., 1): a value hashing to exactly 0 (p ~ 2^-48/value)
    // would zero the divisor — Spark's non-ANSI DIV yields NULL silently
    // where DuckDB errors, so both sides clamp identically instead
    sketch.agg(count(lit(1)).as("n_buckets"),
        sum(col("min_h")).as("sum_min"))
      .select(col("n_buckets"), col("sum_min"),
        expr(s"CAST((${k.toLong * k}L * ${HashSpace}L) DIV greatest(sum_min, 1) AS BIGINT)")
          .as("est_distinct"))
  }

  /** The sketch: `k` smallest hashes (TakeOrdered — no global sort). */
  def kmvSketch(hashes: DataFrame, k: Int): DataFrame =
    hashes.orderBy(col("h")).limit(k)

  /** Lossless merge: `k` smallest of unioned sketches. Equals
    * `kmvSketch` of the combined corpus whenever each input is a
    * superset-sketch of its shard (KmvSpec pins the property). */
  def kmvMerge(sketches: Seq[DataFrame], k: Int): DataFrame =
    sketches.reduce(_.unionByName(_)).distinct().orderBy(col("h")).limit(k)

  /** One-row estimate relation `(n_sketch, kth_h, est_distinct)`. */
  def kmvEstimate(sketch: DataFrame, k: Int): DataFrame =
    sketch.agg(count(lit(1)).as("n_sketch"), max(col("h")).as("kth_h"))
      .select(col("n_sketch"), col("kth_h"),
        when(col("n_sketch") < k, col("n_sketch"))
          // greatest-clamp: see bucketMinEstimate — zero-hash divisor
          .otherwise(expr(s"CAST((${k - 1}L * ${HashSpace}L) DIV greatest(kth_h, 1) AS BIGINT)"))
          .as("est_distinct"))

  /** DuckDB twin of the gate's sketch + parity-split merge + estimate
    * over one column: identical hash, identical k-minima, identical
    * integer estimator, and the merge-losslessness witness
    * (`merge_matches` must be TRUE — the merged kth equals the direct
    * sketch's kth).
    */
  def kmvGateSql(table: String, valueCol: String, k: Int): String =
    s"""WITH vals AS (SELECT DISTINCT $valueCol AS v FROM $table),
       |hs AS MATERIALIZED (
       |  SELECT DISTINCT CAST(('0x' || substr(md5(CAST(v AS VARCHAR)), 1, 12)) AS BIGINT) AS h
       |  FROM vals),
       |sk AS (SELECT h FROM hs ORDER BY h LIMIT $k),
       |skA AS (SELECT h FROM hs WHERE h % 2 = 0 ORDER BY h LIMIT $k),
       |skB AS (SELECT h FROM hs WHERE h % 2 = 1 ORDER BY h LIMIT $k),
       |mg AS (SELECT h FROM (SELECT DISTINCT h FROM
       |        (SELECT h FROM skA UNION ALL SELECT h FROM skB))
       |       ORDER BY h LIMIT $k),
       |est AS (SELECT CAST(count(*) AS BIGINT) AS n_sketch, max(h) AS kth_h FROM sk),
       |estm AS (SELECT max(h) AS kth_m FROM mg),
       |ex AS (SELECT CAST(count(*) AS BIGINT) AS exact_distinct FROM vals)
       |SELECT n_sketch, kth_h,
       |  CASE WHEN n_sketch < $k THEN n_sketch
       |       ELSE (${k - 1} * ${HashSpace}) // greatest(kth_h, 1) END AS est_distinct,
       |  exact_distinct,
       |  (SELECT kth_m FROM estm) = kth_h AS merge_matches
       |FROM est CROSS JOIN ex""".stripMargin
}
