package graft.sketch

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BLOOM FILTER with a DuckDB-replayable hash family — the membership
  * sketch that completes the gated summary trio (CMS: frequency, KMV/HLL:
  * cardinality, Bloom: membership). Spark's built-in
  * `BloomFilterAggregate` (which [[graft.ops.BloomJoin]] uses for join
  * pruning, where only the PRUNING effect is observable) keeps its bit
  * layout engine-internal; here the filter is re-derived explicitly so
  * the bits themselves gate:
  *
  *   pos_i(v) = md5_48("<i>|" + v) mod m,   i = 0..k−1
  *
  * ([[Kmv.kmvHashCol]]'s 48-bit hash with the seed-prefix convention of
  * the LSH S-curve audit). The filter is REPRESENTED as its set-bit
  * position relation — semantically the same predicate as the packed
  * bitset, one row per set bit (≤ m rows), mergeable by plain DISTINCT
  * union (bit-OR ≡ set union), shardable like every other sketch here.
  * Pack to `m/64` int64 words at serve time if a byte-array artifact is
  * needed; the audit works on the set directly.
  *
  * The gate emits the standard acceptance audit: build over the key set,
  * probe with a DISJOINT key set, report
  * `(n_keys, n_set_bits, n_probes, n_false_pos)` — the measured false
  * positive rate beside the load factor that predicts it
  * (`fpr ≈ (n_set_bits/m)^k`; the spec pins the two against each other).
  * Scale shape: build = one distinct + a k-way position projection
  * (map-side combined distinct); probe = equi-join on position + a
  * per-probe count, `matched = k` ⟺ accepted. Never a broadcast of the
  * probed corpus; at 100 TB the position relation shards by range and
  * probes co-partition.
  */
object Bloom {

  /** The k positions of every key, ONE scan (explode of the k-hash
    * array — a k-way union would re-scan the input k times). Shared by
    * the batch build/probe and the streaming maintenance path
    * ([[graft.streaming.StreamingOps.streamingBloomPositions]]) so the
    * live filter can never de-synchronize from the batch/oracle hash
    * family. */
  def keyPositions(keys: DataFrame, mBits: Long,
      kHashes: Int): DataFrame =
    keys.select(col("v"), explode(array((0 until kHashes).map(i =>
      Kmv.kmvHashCol(concat(lit(s"$i|"), col("v").cast("string")))
        % mBits): _*)).as("pos"))

  /** Distinct set-bit positions of the filter over `keys(v)`. */
  def bloomPositions(keys: DataFrame, mBits: Long, kHashes: Int): DataFrame = {
    require(mBits >= 2 && kHashes >= 1)
    keyPositions(keys, mBits, kHashes).select(col("pos")).distinct()
  }

  /** Membership probe: `(v, accepted)` for every probe key — accepted ⟺
    * all k positions are set, i.e. NO position row misses the join
    * (duplicate positions from intra-key hash collisions both hit or
    * both miss, so a plain min-indicator is exact — no count-distinct,
    * whose two-distinct Expand was measured 10× the whole probe). */
  def bloomProbe(probes: DataFrame, positions: DataFrame,
      mBits: Long, kHashes: Int): DataFrame =
    keyPositions(probes, mBits, kHashes)
      .join(positions.withColumn("_set", lit(1L)), Seq("pos"), "left")
      .groupBy(col("v"))
      .agg((min(coalesce(col("_set"), lit(0L))) === 1L).as("accepted"))

  /** One-row acceptance audit: build over `keys`, probe with `probes`
    * (caller guarantees disjoint from `keys`, so every acceptance is a
    * false positive). */
  def bloomFprAudit(keys: DataFrame, probes: DataFrame,
      mBits: Long, kHashes: Int,
      precomputedPositions: Option[DataFrame] = None): DataFrame = {
    // the staged-artifact hook (the minhash precomputedPairs pattern):
    // a live deployment audits the POSITION RELATION IT ALREADY HOLDS
    // (e.g. the streaming sink's reconstruction), not a rebuild
    val pos = precomputedPositions.getOrElse(
      graft.Persisted.track(bloomPositions(keys, mBits, kHashes)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)))
    val fp = bloomProbe(probes, pos, mBits, kHashes)
      .agg(count(lit(1)).as("n_probes"),
        coalesce(sum(when(col("accepted"), 1L).otherwise(0L)), lit(0L))
          .as("n_false_pos"))
    // n_keys counts DISTINCT keys — the filter is built over distinct
    // values, so a non-distinct input relation must not overstate the
    // built key set in the audit row
    keys.select(col("v")).distinct().agg(count(lit(1)).as("n_keys"))
      .crossJoin(broadcast(pos.agg(count(lit(1)).as("n_set_bits"))))
      .crossJoin(broadcast(fp))
  }

  /** DuckDB twin of [[bloomFprAudit]]: identical hashes, positions, and
    * acceptance rule. `keysBody` / `probesBody` must emit a `v` column. */
  def bloomFprAuditSql(keysBody: String, probesBody: String,
      mBits: Long, kHashes: Int): String = {
    def posSelect(src: String, extra: String) = (0 until kHashes).map(i =>
      s"SELECT ${extra}CAST(('0x' || substr(md5('$i|' || CAST(v AS VARCHAR)), 1, 12)) AS BIGINT) % $mBits AS pos FROM $src")
      .mkString("\n  UNION ALL\n  ")
    s"""WITH ks AS ($keysBody),
       |pr AS ($probesBody),
       |pos AS MATERIALIZED (
       |  SELECT DISTINCT pos FROM (
       |  ${posSelect("ks", "")})),
       |pp AS (
       |  ${posSelect("pr", "v, ")}),
       |acc AS (
       |  SELECT pp.v,
       |    min(CASE WHEN pos.pos IS NOT NULL THEN 1 ELSE 0 END) = 1 AS accepted
       |  FROM pp LEFT JOIN pos ON pp.pos = pos.pos
       |  GROUP BY pp.v),
       |fp AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_probes,
       |    CAST(coalesce(sum(CASE WHEN accepted THEN 1 ELSE 0 END), 0) AS BIGINT)
       |      AS n_false_pos
       |  FROM acc)
       |SELECT (SELECT CAST(count(DISTINCT v) AS BIGINT) FROM ks) AS n_keys,
       |  (SELECT CAST(count(*) AS BIGINT) FROM pos) AS n_set_bits,
       |  n_probes, n_false_pos
       |FROM fp""".stripMargin
  }
}
