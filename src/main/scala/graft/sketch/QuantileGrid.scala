package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fixed-grid histogram quantile sketch — the REPLAYABLE member of the
  * quantile-sketch family (Spark's `approx_percentile` / KLL and GK are
  * engine-opaque: their internal compaction decisions aren't stable
  * across engines, so they can never hash-match an external oracle; KLL
  * stays spec-only in [[graft.ApproxAggSpec]]). The trade: GK/KLL give
  * rank-error guarantees over UNKNOWN value domains in polylog space;
  * the fixed grid needs a known [lo, hi) domain and gives a VALUE-error
  * bound of one cell width — in exchange every step is integer
  * arithmetic, deterministic, and expressible identically in any SQL
  * dialect, which is what a correctness gate needs.
  *
  * Scale shape (same argument as [[CountMin]]): the only corpus-wide op
  * in [[sketch]] is `groupBy(bucket)` over ≤ `buckets` DISTINCT keys —
  * map-side partial aggregation collapses each task's stream to at most
  * `buckets` rows, so the shuffle carries `partitions × buckets` rows
  * regardless of corpus size. Quantile extraction then runs on the
  * ≤ `buckets`-row sketch: the partitionless window there is a
  * deliberate tiny global window (the [[graft.text.Chunking]] pattern),
  * never one over the corpus. The exact side of [[quantilesWithExact]]
  * exists to GRADE the sketch (the [[CountMin.heavyHitters]] est-beside-
  * exact convention); its distinct-value cumulative window is bounded by
  * the number of DISTINCT values, and production flows at 100 TB keep
  * only the sketch.
  */
object QuantileGrid {

  /** Histogram of `valueCol` over the fixed grid: `buckets` cells of
    * width `(hi - lo) / buckets` (must divide evenly), values clamped
    * into [lo, hi) so under/overflow land in the edge cells. The clamp
    * runs BEFORE the divide, keeping the numerator non-negative —
    * Spark's `DIV` truncates toward zero while DuckDB's `//` floors, and
    * they only agree on non-negative operands.
    */
  def sketch(df: DataFrame, valueCol: String, lo: Long, hi: Long,
      buckets: Int): DataFrame = {
    require(hi > lo && buckets > 0 && (hi - lo) % buckets == 0,
      s"grid [$lo, $hi) must split evenly into $buckets cells")
    val cell = (hi - lo) / buckets
    df.select(col(valueCol).cast("long").as("_v"))
      .select(expr(s"(least(greatest(_v, ${lo}L), ${hi - 1}L) - ${lo}L) DIV ${cell}L")
        .as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Quantile estimates from the sketch, with the exact rank-quantile
    * beside each (grading column — see object scaladoc). For each
    * percentile `p` in `qsPct`: target rank `ceil(p·N/100)` computed as
    * `(p·N + 99) DIV 100`; the estimate is the UPPER EDGE of the first
    * bucket whose cumulative count reaches the target (error ≤ one cell
    * width by construction); the exact value is the smallest `v` whose
    * cumulative count reaches the target — rank-based, so it is unique
    * under ties and deterministic in both engines.
    */
  def quantilesWithExact(df: DataFrame, valueCol: String, lo: Long, hi: Long,
      buckets: Int, qsPct: Seq[Int]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cell = (hi - lo) / buckets
    val sk = sketch(df, valueCol, lo, hi, buckets)
    // cumulative over the <=buckets-row sketch (tiny global window)
    val cum = sk.withColumn("cum",
      sum(col("cnt")).over(Window.orderBy(col("bucket"))))
    val n = sk.agg(sum(col("cnt")).as("n"))
    // distinct-value cumulative for the exact side (bounded by #distinct)
    val vcum = df.select(col(valueCol).cast("long").as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("c"))
      .withColumn("vcum", sum(col("c")).over(Window.orderBy(col("v"))))
    val targets = qsPct.map(_.toLong).toDF("q_pct")
      .crossJoin(broadcast(n))
      .withColumn("target", expr("(q_pct * n + 99L) DIV 100L"))
    val est = targets.join(broadcast(cum), col("cum") >= col("target"))
      .groupBy(col("q_pct"), col("target"))
      .agg(min(col("bucket")).as("_b"))
      .withColumn("est", lit(lo) + (col("_b") + 1L) * lit(cell))
    val exact = targets.join(broadcast(vcum), col("vcum") >= col("target"))
      .groupBy(col("q_pct"))
      .agg(min(col("v")).as("exact"))
    est.join(exact, Seq("q_pct"))
      .select(col("q_pct"), col("target"), col("est"), col("exact"))
      .orderBy(col("q_pct"))
  }

  /** DuckDB twin of [[quantilesWithExact]] over `documents.n_chars`. */
  def quantilesSql(lo: Long, hi: Long, buckets: Int, qsPct: Seq[Int]): String = {
    require(hi > lo && buckets > 0 && (hi - lo) % buckets == 0,
      s"grid [$lo, $hi) must split evenly into $buckets cells")
    val cell = (hi - lo) / buckets
    val qVals = qsPct.map(p => s"($p)").mkString(", ")
    s"""WITH sk AS MATERIALIZED (
       |  SELECT (least(greatest(n_chars, $lo), ${hi - 1}) - $lo) // $cell AS bucket,
       |    CAST(count(*) AS BIGINT) AS cnt
       |  FROM documents GROUP BY 1),
       |n AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM sk),
       |cum AS (
       |  SELECT bucket, CAST(sum(cnt) OVER (ORDER BY bucket) AS BIGINT) AS cum
       |  FROM sk),
       |vcum AS (
       |  SELECT v, CAST(sum(c) OVER (ORDER BY v) AS BIGINT) AS vcum
       |  FROM (SELECT n_chars AS v, count(*) AS c FROM documents GROUP BY 1)),
       |t AS (
       |  SELECT CAST(q_pct AS BIGINT) AS q_pct,
       |    (q_pct * n + 99) // 100 AS target
       |  FROM (VALUES $qVals) q(q_pct) CROSS JOIN n),
       |est AS (
       |  SELECT q_pct, target,
       |    CAST($lo + (min(bucket) + 1) * $cell AS BIGINT) AS est
       |  FROM t JOIN cum ON cum.cum >= t.target
       |  GROUP BY q_pct, target),
       |ex AS (
       |  SELECT q_pct, CAST(min(v) AS BIGINT) AS exact
       |  FROM t JOIN vcum ON vcum.vcum >= t.target
       |  GROUP BY q_pct)
       |SELECT e.q_pct, e.target, e.est, x.exact
       |FROM est e JOIN ex x USING (q_pct)
       |ORDER BY e.q_pct""".stripMargin
  }
}
