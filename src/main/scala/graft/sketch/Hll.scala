package graft.sketch

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** HYPERLOGLOG distinct-count sketch (Flajolet et al. 2007) with an
  * EXPLICIT register layout — the gateable form of the sketch whose
  * engine-internal variant (`approx_count_distinct`) the r4 lesson moved
  * to spec-only. Nothing here is engine-opaque: registers are derived
  * from the shared 48-bit md5 hash ([[Kmv.kmvHashCol]]) by integer
  * arithmetic both engines run identically —
  *
  *   bucket = h >> (48 − p)          (top p bits)
  *   w      = h & (2^(48−p) − 1)     (remaining 48−p bits)
  *   rho    = 48 − p + 1 − bitlen(w) (leading zeros + 1; w = 0 → 48−p+1)
  *
  * with `bitlen(w) = length(bin(w))` — both Spark's `bin` and DuckDB's
  * `bin` print the minimal binary string of a non-negative integer, so
  * the rank is exact in both. Register j = max rho over bucket j, with
  * EMPTY buckets materialized as 0 against a full m-row grid (the
  * estimator needs them).
  *
  * Estimator, exact integer arithmetic end to end:
  *   - `sum_pow = Σ_j 2^(rhoMax − M_j)` — the harmonic-mean sum scaled
  *     by `2^rhoMax` (≤ m·2^rhoMax = 2^49 for every p: int64-safe).
  *   - raw: `est = ⌊α_num·m³·2^rhoMax / (α_den·sum_pow)⌋` with the
  *     standard bias constant as the exact rational
  *     `α_m = 0.7213/(1+1.079/m) = 7213m / (10000m+10790)` — the
  *     numerator literal exceeds int64, so Spark computes it in
  *     DECIMAL and DuckDB in HUGEINT (`DECIMAL DIV ≡ HUGEINT //`, the
  *     KN-gate convention).
  *   - small-range (est ≤ 5m/2 and V = #zero-registers > 0): linear
  *     counting `m·ln(m/V)` via the house fixed-point log2 chain
  *     ([[graft.text.Vocabulary]]'s MantBits=30 / FracBits=20 op
  *     sequence, replicated here over the one-row estimate relation)
  *     times `ln 2` in Q30 — all int64 (max product ≈ 8.0·10^18 at
  *     p = 10, hence the p ≤ 10 guard).
  *   - the classic large-range correction (hash saturation near 2^32)
  *     does not apply: the hash space is 2^48 and collision handling is
  *     KMV's (~0.2% at 1M distinct, inside the sketch's 1.04/√m error).
  *
  * Scale shape: identical to KMV's — one content-keyed `distinct`
  * (map-side combined) + a 1024-key register agg; per-shard register
  * tables MERGE LOSSLESSLY by per-bucket `max` (max is associative and
  * duplicate-immune), so a 100 TB corpus sketches shard-by-shard and
  * max-merges m-row relations. The same property makes it the
  * streaming-maintainable distinct counter
  * ([[graft.streaming.StreamingOps.streamingHllRegisters]]): update-mode
  * `max(rho) group by bucket` holds EXACTLY m rows of state with no
  * dedup state at all. vs [[Kmv]]: KMV's bottom-k is the tighter
  * estimator per byte at equal gate-complexity; HLL's registers are
  * fixed-size (m bytes, not k hashes) and the merge is a max — the
  * industry-standard trade, now both gateable.
  */
object Hll {

  val HashBits: Int = 48

  /** Mirrors Vocabulary's fixed-point log2 parameters (MantBits /
    * FracBits) so every graft fixed-point log runs one op sequence. */
  private val MantBits = 30
  private val FracBits = 20

  /** ⌊ln(2)·2^30⌋ — Q30 ln 2, for converting the Q20 log2 to ln. */
  private val Ln2Q30 = 744261117L

  private def wBits(p: Int) = HashBits - p
  private def rhoMax(p: Int) = wBits(p) + 1

  private def checkP(p: Int): Unit =
    require(p >= 4 && p <= 10,
      s"p must be in [4, 10] (m = 2^p registers; the linear-counting " +
        s"branch is int64-only up to p = 10), got $p")

  /** `(…, bucket, rho)` projection of a 48-bit hash relation `h` —
    * non-`h` columns pass through (the grouped build's group key rides
    * along). Shared by the batch register builds (global and grouped)
    * and the streaming maintenance path
    * ([[graft.streaming.StreamingOps.streamingHllRegisters]]), so the
    * rho derivation exists exactly once. */
  def bucketRho(hashes: DataFrame, p: Int): DataFrame = {
    checkP(p)
    val w = wBits(p)
    val passThrough = hashes.columns.filterNot(_ == "h").toSeq
    require(!passThrough.contains("bucket") && !passThrough.contains("w"),
      "bucketRho pass-through columns may not be named 'bucket' or 'w'")
    hashes
      .select(passThrough.map(col) ++ Seq(
        shiftright(col("h"), w).as("bucket"),
        col("h").bitwiseAND(lit((1L << w) - 1)).as("w")): _*)
      .select(passThrough.map(col) ++ Seq(col("bucket"),
        when(col("w") === 0, lit(rhoMax(p).toLong))
          .otherwise(lit(rhoMax(p).toLong) - length(bin(col("w"))))
          .as("rho")): _*)
  }

  /** `(bucket, register)` — all `m = 2^p` rows, empty buckets as 0.
    * Input is a distinct-hash relation from [[Kmv.kmvHashes]]. */
  def hllRegisters(spark: SparkSession, hashes: DataFrame, p: Int): DataFrame = {
    checkP(p)
    val m = 1L << p
    val grid = spark.range(m).select(col("id").as("bucket"))
    val regs = bucketRho(hashes, p)
      .groupBy(col("bucket")).agg(max(col("rho")).as("register"))
    grid.join(regs, Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("register"), lit(0L)).as("register"))
  }

  /** Lossless shard merge: per-bucket max of register tables (each over
    * the same grid, so all are m rows). */
  def hllMerge(registerTables: Seq[DataFrame]): DataFrame =
    registerTables.reduce(_.unionByName(_))
      .groupBy(col("bucket")).agg(max(col("register")).as("register"))

  /** One-row `(n_zero, sum_pow, est_raw, est_distinct)` from a full
    * m-row register table. `est_distinct` applies the small-range
    * linear-counting branch; `est_raw` is the uncorrected harmonic-mean
    * estimate (kept beside it so the branch choice is auditable). */
  def hllEstimate(registers: DataFrame, p: Int): DataFrame =
    hllEstimateBy(registers, p, Nil)

  /** [[hllEstimate]] per group: `registers` carries the group columns
    * beside `(bucket, register)` (a full m-row grid PER GROUP — the
    * fixed-point chain below is row-wise, so grouping costs nothing
    * extra). One row per group — the dataset-card per-slice distinct
    * counter, m·groups total state. */
  def hllEstimateBy(registers: DataFrame, p: Int,
      groupCols: Seq[String]): DataFrame = {
    checkP(p)
    val m = 1L << p
    val rMax = rhoMax(p)
    val alphaNum = BigInt(7213) * m * m * m * (BigInt(1) << rMax)
    val alphaDen = 10000L * m + 10790L
    val aggs = Seq(
      sum(when(col("register") === 0, 1L).otherwise(0L)).as("n_zero"),
      sum(expr(s"shiftleft(CAST(1 AS BIGINT), CAST($rMax - register AS INT))"))
        .as("sum_pow"))
    val agg =
      if (groupCols.isEmpty) registers.agg(aggs.head, aggs.tail: _*)
      else registers.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    // raw harmonic-mean estimate: the numerator literal is ~2^82 at
    // p = 10, so DECIMAL (the smallest sufficient precision — the KN
    // DECIMAL lesson) with an integral DIV
    val withRaw = agg.withColumn("est_raw", expr(
      s"CAST(CAST('$alphaNum' AS DECIMAL(${alphaNum.toString.length},0)) DIV " +
        s"(CAST($alphaDen AS DECIMAL(10,0)) * CAST(sum_pow AS DECIMAL(16,0))) " +
        "AS BIGINT)"))
    // linear counting over the same one-row relation: the Vocabulary
    // log2 op sequence (exponent as indicator sum, FracBits squaring
    // rounds) on num = m, den = max(V, 1)
    var cur = withRaw
      .withColumn("_num", lit(m))
      .withColumn("_den", greatest(col("n_zero"), lit(1L)))
      .withColumn("_e", (1 to p).map(k =>
        when(shiftright(col("_num"), k) >= col("_den"), 1L).otherwise(0L))
        .reduce(_ + _))
      .withColumn("_m",
        expr(s"shiftleft(_num, $MantBits) DIV shiftleft(_den, CAST(_e AS INT))"))
      .withColumn("_frac", lit(0L))
    val two = lit(2L << MantBits)
    for (_ <- 1 to FracBits) {
      cur = cur
        .withColumn("_msq", shiftright(col("_m") * col("_m"), MantBits))
        .withColumn("_frac",
          col("_frac") * 2 + when(col("_msq") >= two, 1L).otherwise(0L))
        .withColumn("_m",
          when(col("_msq") >= two, shiftright(col("_msq"), 1)).otherwise(col("_msq")))
    }
    cur
      .withColumn("_lg", col("_e") * lit(1L << FracBits) + col("_frac"))
      // m · log2fp · ln2_Q30 ≤ 2^10 · 10·2^20 · 744261117 ≈ 8.0e18: int64
      .withColumn("_lc",
        expr(s"($m * _lg * $Ln2Q30) DIV ${1L << (FracBits + 30)}"))
      .withColumn("est_distinct",
        when(col("n_zero") > 0 && col("est_raw") * 2 <= 5 * m, col("_lc"))
          .otherwise(col("est_raw")))
      .select((groupCols.map(col) ++ Seq(col("n_zero"), col("sum_pow"),
        col("est_raw"), col("est_distinct"))): _*)
  }

  /** Grouped register build + estimate over a raw `(group, value)`
    * relation: per-group full-grid registers (m rows per group), then
    * [[hllEstimateBy]]. */
  def hllGroupedEstimates(spark: SparkSession, df: DataFrame,
      groupCol: String, valueCol: String, p: Int): DataFrame = {
    checkP(p)
    val m = 1L << p
    val hashes = df.select(col(groupCol).as("_g"), col(valueCol).as("_v"))
      .distinct()
      .select(col("_g"), Kmv.kmvHashCol(col("_v")).as("h"))
      .distinct()
    val regs = bucketRho(hashes, p)
      .groupBy(col("_g"), col("bucket")).agg(max(col("rho")).as("register"))
    val grid = df.select(col(groupCol).as("_g")).distinct()
      .crossJoin(broadcast(spark.range(m).select(col("id").as("bucket"))))
    hllEstimateBy(
      grid.join(regs, Seq("_g", "bucket"), "left")
        .select(col("_g"), col("bucket"),
          coalesce(col("register"), lit(0L)).as("register")),
      p, Seq("_g"))
      .withColumnRenamed("_g", groupCol)
  }

  private def hllESum(p: Int): String = (1 to p).map(k =>
    s"CASE WHEN (num >> $k) >= den THEN 1 ELSE 0 END").mkString(" + ")

  /** The FracBits square-and-truncate rounds as chained CTEs, carrying
    * `keep` columns through (shared by the global and grouped twins). */
  private def hllChainIters(keep: String): String =
    (1 to FracBits).map { i =>
      val q = i - 1
      s"""it$i AS (
         |  SELECT $keep, e,
         |    CASE WHEN ((m * m) >> $MantBits) >= (CAST(2 AS BIGINT) << $MantBits)
         |      THEN ((m * m) >> $MantBits) >> 1 ELSE (m * m) >> $MantBits END AS m,
         |    frac * 2 + CASE WHEN ((m * m) >> $MantBits) >= (CAST(2 AS BIGINT) << $MantBits)
         |      THEN 1 ELSE 0 END AS frac
         |  FROM it$q)""".stripMargin
    }.mkString(",\n")

  /** DuckDB twin of [[hllGroupedEstimates]] over a table — the grouped
    * gate's oracle: per-group distinct hashes, per-group full-grid
    * registers, the identical chain threaded with the group key, exact
    * beside the estimate. */
  def hllGroupedGateSql(table: String, groupCol: String, valueCol: String,
      p: Int): String = {
    checkP(p)
    val m = 1L << p
    val w = wBits(p)
    val rMax = rhoMax(p)
    val alphaNum = BigInt(7213) * m * m * m * (BigInt(1) << rMax)
    val alphaDen = 10000L * m + 10790L
    s"""WITH vals AS (SELECT DISTINCT $groupCol AS g, $valueCol AS v FROM $table),
       |hs AS MATERIALIZED (
       |  SELECT DISTINCT g,
       |    CAST(('0x' || substr(md5(CAST(v AS VARCHAR)), 1, 12)) AS BIGINT) AS h
       |  FROM vals),
       |grid AS (
       |  SELECT g, bucket FROM (SELECT DISTINCT g FROM vals)
       |  CROSS JOIN (SELECT range AS bucket FROM range(0, $m))),
       |regs AS (
       |  SELECT grid.g, grid.bucket, coalesce(r.mx, 0) AS register
       |  FROM grid LEFT JOIN (
       |    SELECT g, h >> $w AS bucket,
       |      max(CASE WHEN (h & ${(1L << w) - 1}) = 0 THEN $rMax
       |          ELSE $rMax - length(bin(h & ${(1L << w) - 1})) END) AS mx
       |    FROM hs GROUP BY 1, 2) r
       |  ON grid.g = r.g AND grid.bucket = r.bucket),
       |agg AS (
       |  SELECT g,
       |    CAST(sum(CASE WHEN register = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
       |    CAST(sum(CAST(1 AS BIGINT) << ($rMax - register)) AS BIGINT) AS sum_pow
       |  FROM regs GROUP BY g),
       |it0 AS (
       |  SELECT g, n_zero, sum_pow,
       |    CAST(CAST('$alphaNum' AS HUGEINT)
       |      // (CAST($alphaDen AS HUGEINT) * sum_pow) AS BIGINT) AS est_raw,
       |    (${hllESum(p)}) AS e,
       |    (num << $MantBits) // (den << (${hllESum(p)})) AS m,
       |    CAST(0 AS BIGINT) AS frac
       |  FROM (SELECT g, n_zero, sum_pow, CAST($m AS BIGINT) AS num,
       |          greatest(n_zero, 1) AS den FROM agg)),
       |${hllChainIters("g, n_zero, sum_pow, est_raw")},
       |est AS (
       |  SELECT g, n_zero, sum_pow, est_raw,
       |    CASE WHEN n_zero > 0 AND est_raw * 2 <= ${5 * m}
       |      THEN ($m * (e * (CAST(1 AS BIGINT) << $FracBits) + frac) * $Ln2Q30)
       |             // ${1L << (FracBits + 30)}
       |      ELSE est_raw END AS est_distinct
       |  FROM it$FracBits),
       |ex AS (SELECT g, CAST(count(*) AS BIGINT) AS exact_distinct
       |       FROM vals GROUP BY g)
       |SELECT est.g AS $groupCol, n_zero, sum_pow, est_raw, est_distinct,
       |  exact_distinct
       |FROM est JOIN ex ON est.g = ex.g""".stripMargin
  }

  /** DuckDB twin of the gate: identical hash, identical registers over
    * the full grid, identical integer estimator (raw branch in HUGEINT,
    * linear-counting branch through the same log2 op sequence), plus —
    * when `withMerge` — the parity-split max-merge witness
    * (`merge_matches` must be TRUE). `where` narrows the scanned rows
    * (the streaming gate's staged-subset filter).
    */
  def hllGateSql(table: String, valueCol: String, p: Int,
      where: String = "", withMerge: Boolean = true): String = {
    checkP(p)
    val m = 1L << p
    val w = wBits(p)
    val rMax = rhoMax(p)
    val alphaNum = BigInt(7213) * m * m * m * (BigInt(1) << rMax)
    val alphaDen = 10000L * m + 10790L
    val eSum = hllESum(p)
    val iters = hllChainIters("n_zero, sum_pow, est_raw")
    def regsFrom(src: String, name: String) =
      s"""$name AS (
         |  SELECT g.bucket, coalesce(r.mx, 0) AS register
         |  FROM grid g LEFT JOIN (
         |    SELECT h >> $w AS bucket,
         |      max(CASE WHEN (h & ${(1L << w) - 1}) = 0 THEN $rMax
         |          ELSE $rMax - length(bin(h & ${(1L << w) - 1})) END) AS mx
         |    FROM $src GROUP BY 1) r USING (bucket))""".stripMargin
    val whereSql = if (where.isEmpty) "" else s" WHERE $where"
    val mergeCtes = if (!withMerge) "" else
      s"""hsA AS (SELECT h FROM hs WHERE h % 2 = 0),
         |hsB AS (SELECT h FROM hs WHERE h % 2 = 1),
         |${regsFrom("hsA", "regsA")},
         |${regsFrom("hsB", "regsB")},
         |mrg AS (
         |  SELECT bucket, max(register) AS register
         |  FROM (SELECT * FROM regsA UNION ALL SELECT * FROM regsB)
         |  GROUP BY bucket),
         |mw AS (
         |  SELECT CAST(min(CASE WHEN a.register = b.register THEN 1 ELSE 0 END) AS BIGINT) = 1
         |    AS merge_matches
         |  FROM regs a JOIN mrg b USING (bucket)),
         |""".stripMargin
    val mergeSelect =
      if (withMerge) ",\n  (SELECT merge_matches FROM mw) AS merge_matches" else ""
    s"""WITH vals AS (SELECT DISTINCT $valueCol AS v FROM $table$whereSql),
       |hs AS MATERIALIZED (
       |  SELECT DISTINCT CAST(('0x' || substr(md5(CAST(v AS VARCHAR)), 1, 12)) AS BIGINT) AS h
       |  FROM vals),
       |grid AS (SELECT range AS bucket FROM range(0, $m)),
       |${regsFrom("hs", "regs")},
       |${mergeCtes}agg AS (
       |  SELECT CAST(sum(CASE WHEN register = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
       |    CAST(sum(CAST(1 AS BIGINT) << ($rMax - register)) AS BIGINT) AS sum_pow
       |  FROM regs),
       |it0 AS (
       |  SELECT n_zero, sum_pow,
       |    CAST(CAST('$alphaNum' AS HUGEINT)
       |      // (CAST($alphaDen AS HUGEINT) * sum_pow) AS BIGINT) AS est_raw,
       |    ($eSum) AS e,
       |    (num << $MantBits) // (den << ($eSum)) AS m,
       |    CAST(0 AS BIGINT) AS frac
       |  FROM (SELECT n_zero, sum_pow, CAST($m AS BIGINT) AS num,
       |          greatest(n_zero, 1) AS den FROM agg)),
       |$iters,
       |est AS (
       |  SELECT n_zero, sum_pow, est_raw,
       |    CASE WHEN n_zero > 0 AND est_raw * 2 <= ${5 * m}
       |      THEN ($m * (e * (CAST(1 AS BIGINT) << $FracBits) + frac) * $Ln2Q30)
       |             // ${1L << (FracBits + 30)}
       |      ELSE est_raw END AS est_distinct
       |  FROM it$FracBits),
       |ex AS (SELECT CAST(count(*) AS BIGINT) AS exact_distinct FROM vals)
       |SELECT n_zero, sum_pow, est_raw, est_distinct, exact_distinct$mergeSelect
       |FROM est CROSS JOIN ex""".stripMargin
  }
}
