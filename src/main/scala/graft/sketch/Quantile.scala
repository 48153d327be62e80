package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fixed-grid quantile sketch: a bounded-cardinality histogram whose
  * quantile answers are DETERMINISTIC integers, bit-replayable by the
  * DuckDB oracle ([[QuantileOracle]]) — unlike engine-opaque mergeable
  * sketches (KLL/t-digest/GK with per-partition compaction order), where
  * the summary depends on partitioning and can only be compared
  * approximately. (A KLL treatment lives in the specs; this is the gated
  * path.)
  *
  * Scale shape: [[sketch]]'s only wide op is `groupBy(cell)` over at most
  * `maxValue / binWidth + 1` distinct keys — map-side partial
  * aggregation collapses each task's value stream into that bounded row
  * count, so the shuffle carries `partitions * cells` rows regardless of
  * corpus size (the same few KB at 100 TB as at 100 MB). [[quantiles]]
  * then runs entirely on the finished sketch: the partitionless window
  * and the non-equi cum>=target probe touch only `cells x |pcts|` rows,
  * both independent of data volume, so neither is a scale hazard (same
  * argument as the 256-row bucket-totals window in
  * [[graft.text.Chunking]]).
  *
  * Accuracy contract: the true q-quantile lies in `[est_lo, est_hi]`
  * (the chosen cell's inclusive value range, clamped to `maxValue`);
  * error is at most `binWidth - 1` in value space, and rank error is 0
  * (the cell is EXACTLY the one holding the ceil(q*n)-th value, because
  * per-cell counts are exact). Values above `maxValue` clamp into the
  * top cell — the standard fixed-grid tail concession; size `maxValue`
  * from domain knowledge (quality-signal distributions in an LLM
  * pipeline have known bounded ranges).
  */
object QuantileSketch {

  /** The grid-cell assignment — ONE definition for the global and
    * grouped sketches (the grid convention must never diverge between
    * them). Clamp before divide: Spark's `div` truncates toward zero
    * while DuckDB's `//` floors, and they only agree on non-negative
    * operands.
    */
  private def cellExpr(valueCol: String, binWidth: Long,
      maxValue: Long): Column = expr(
    s"least(greatest(CAST($valueCol AS BIGINT), 0L), ${maxValue}L) div ${binWidth}L")

  /** The integer-ceiling rank target `ceil(n * pct / 100)` — shared by
    * the global and grouped extractions for the same reason.
    */
  private val ceilTarget: Column = expr("(n * pct + 99L) div 100L")

  /** Cell-edge quantile reporting (est_lo/est_hi), shared likewise. */
  private def estCols(qcell: Column, binWidth: Long,
      maxValue: Long): Seq[Column] = Seq(
    (qcell * lit(binWidth)).as("est_lo"),
    least((qcell + 1) * lit(binWidth) - 1, lit(maxValue)).as("est_hi"))

  /** Histogram of `valueCol` (non-negative integers) in `binWidth`-wide
    * cells, values clamped to `[0, maxValue]`: one row per occupied cell,
    * `(cell BIGINT, cnt BIGINT)`. Pure integer arithmetic (`least`,
    * `greatest`, `div`) — both engines agree bit-for-bit.
    */
  def sketch(df: DataFrame, valueCol: String, binWidth: Long,
      maxValue: Long): DataFrame =
    df.select(cellExpr(valueCol, binWidth, maxValue).as("cell"))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("cnt"))

  /** Quantile extraction from a finished sketch: for each percentile
    * `pct` (integer 0..100), the first cell whose cumulative count
    * reaches `ceil(n * pct / 100)` (integer ceiling — no floating
    * point anywhere). Returns one row per pct:
    * `(pct, est_lo, est_hi, n)`, all BIGINT, ordered by pct.
    *
    * The non-equi join (`cum >= target`) is a broadcast nested loop by
    * construction — over `|pcts|` rows x the bounded sketch, which is
    * the intended shape: quantile extraction must never shuffle the
    * corpus, only the KB-scale summary.
    */
  def quantiles(sk: DataFrame, pcts: Seq[Int], binWidth: Long,
      maxValue: Long): DataFrame = {
    val spark = sk.sparkSession
    import spark.implicits._
    // total count rides the SAME partitionless window sort as the
    // cumulative sum (unbounded frame) — a separate sk.agg would rescan
    // the corpus to rebuild the sketch a second time
    val w = Window.orderBy("cell")
    val cum = sk
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("n", sum(col("cnt")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    val pctsDf = pcts.map(_.toLong).toDF("pct")
    pctsDf.join(broadcast(cum), col("cum") >= ceilTarget)
      .groupBy(col("pct"), col("n"))
      .agg(min(col("cell")).as("qcell"))
      .select(col("pct") +: estCols(col("qcell"), binWidth, maxValue) :+
        col("n"): _*)
      .orderBy(col("pct"))
  }

  /** Merge sketches built over disjoint corpus slices (same grid):
    * cell-wise count sum. EXACTLY equals sketching the union — per-cell
    * counts are exact, so unlike KLL/t-digest the merge is lossless and
    * order-independent, which is what makes the operator incremental at
    * 100 TB: sketch each ingest batch, merge the KB-scale summaries,
    * never rescan history.
    */
  def merge(sketches: DataFrame*): DataFrame =
    sketches.reduce(_ unionByName _)
      .groupBy(col("cell"))
      .agg(sum(col("cnt")).as("cnt"))

  /** End-to-end demonstration query over a corpus quality signal
    * (document length): sketch + quantiles in one call.
    */
  def valueQuantiles(df: DataFrame, valueCol: String, pcts: Seq[Int],
      binWidth: Long, maxValue: Long): DataFrame =
    quantiles(sketch(df, valueCol, binWidth, maxValue), pcts, binWidth, maxValue)

  /** Per-group quantiles from one grid pass — the dataset-card
    * companion ("p50/p99 length PER LANGUAGE/SOURCE", the skew question
    * a global percentile hides): [[sketch]] keyed by `grpCol`, so the
    * shuffle carries ≤ groups × cells rows; the cumulative window
    * partitions BY GROUP over the bounded sketch (never the corpus);
    * the |pcts|-row percentile relation broadcasts onto it. Same
    * integer-ceiling targets and cell-edge reporting as [[quantiles]].
    * Output: one row per (group, pct) — `(grp, pct, est_lo, est_hi, n)`.
    */
  def groupedQuantiles(df: DataFrame, grpCol: String, valueCol: String,
      pcts: Seq[Int], binWidth: Long, maxValue: Long): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sk = df.select(col(grpCol).as("grp"),
        cellExpr(valueCol, binWidth, maxValue).as("cell"))
      .groupBy(col("grp"), col("cell"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("grp")).orderBy(col("cell"))
    val cum = sk
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("n", sum(col("cnt")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    val pctsDf = pcts.map(_.toLong).toDF("pct")
    cum.join(broadcast(pctsDf), col("cum") >= ceilTarget)
      .groupBy(col("grp"), col("pct"), col("n"))
      .agg(min(col("cell")).as("qcell"))
      .select(col("grp").as(grpCol) +: col("pct") +:
        estCols(col("qcell"), binWidth, maxValue) :+ col("n"): _*)
  }

  /** Sketch-driven outlier gate: keep rows whose value lies within the
    * [loPct, hiPct] sketch-quantile band — winsorizing length/score
    * outliers (a standard curation rule) WITHOUT an exact global sort.
    * The kept band is [est_lo(loPct), est_hi(hiPct)] — cell edges, so
    * the cut is conservative by at most one grid cell on each side,
    * deterministic, and corpus-size-independent. Cost: the sketch's
    * bounded agg + a 1-row broadcast of the bounds + one scan predicate.
    */
  def clipByQuantiles(df: DataFrame, valueCol: String, loPct: Int,
      hiPct: Int, binWidth: Long, maxValue: Long): DataFrame = {
    require(loPct < hiPct)
    val bounds = valueQuantiles(df, valueCol, Seq(loPct, hiPct), binWidth, maxValue)
      .agg(
        min(when(col("pct") === loPct, col("est_lo"))).as("_graft_lo"),
        min(when(col("pct") === hiPct, col("est_hi"))).as("_graft_hi"))
    df.crossJoin(broadcast(bounds))
      .filter(col(valueCol).cast("long") >= col("_graft_lo") &&
        col(valueCol).cast("long") <= col("_graft_hi"))
      .drop("_graft_lo", "_graft_hi")
  }
}

/** DuckDB-SQL replay of [[QuantileSketch]]: identical integer grid
  * (`least/greatest` + `//`), identical cumulative window, identical
  * integer-ceiling rank target, identical cell-edge reporting.
  */
object QuantileOracle {

  /** Oracle for `x_sketch_quantile`: (pct, est_lo, est_hi, n) over
    * `documents.n_chars`.
    */
  def quantilesSql(pcts: Seq[Int], binWidth: Long, maxValue: Long): String = {
    val values = pcts.map(p => s"(${p}::BIGINT)").mkString(", ")
    s"""WITH cells AS (
       |  SELECT least(greatest(n_chars::BIGINT, 0), $maxValue) // $binWidth AS cell,
       |         count(*)::BIGINT AS cnt
       |  FROM documents GROUP BY 1),
       |cum AS (SELECT cell, sum(cnt) OVER (ORDER BY cell)::BIGINT AS cum FROM cells),
       |tot AS (SELECT sum(cnt)::BIGINT AS n FROM cells),
       |q AS (SELECT * FROM (VALUES $values) v(pct))
       |SELECT q.pct, min(c.cell) * $binWidth AS est_lo,
       |       least((min(c.cell) + 1) * $binWidth - 1, $maxValue) AS est_hi,
       |       t.n
       |FROM q CROSS JOIN tot t JOIN cum c ON c.cum >= (t.n * q.pct + 99) // 100
       |GROUP BY q.pct, t.n
       |ORDER BY q.pct""".stripMargin
  }

  /** Oracle for `x_sketch_quantile_grouped`: (grp, pct, est_lo, est_hi,
    * n) over `documents.n_chars` grouped by `grpCol`.
    */
  def groupedQuantilesSql(grpCol: String, pcts: Seq[Int], binWidth: Long,
      maxValue: Long): String = {
    val values = pcts.map(p => s"(${p}::BIGINT)").mkString(", ")
    s"""WITH cells AS (
       |  SELECT $grpCol AS grp,
       |         least(greatest(n_chars::BIGINT, 0), $maxValue) // $binWidth AS cell,
       |         count(*)::BIGINT AS cnt
       |  FROM documents GROUP BY 1, 2),
       |cum AS (
       |  SELECT grp, cell,
       |         sum(cnt) OVER (PARTITION BY grp ORDER BY cell)::BIGINT AS cum,
       |         sum(cnt) OVER (PARTITION BY grp)::BIGINT AS n
       |  FROM cells),
       |q AS (SELECT * FROM (VALUES $values) v(pct))
       |SELECT c.grp AS $grpCol, q.pct, min(c.cell) * $binWidth AS est_lo,
       |       least((min(c.cell) + 1) * $binWidth - 1, $maxValue) AS est_hi,
       |       c.n
       |FROM q JOIN cum c ON c.cum >= (c.n * q.pct + 99) // 100
       |GROUP BY c.grp, q.pct, c.n""".stripMargin
  }

  /** Oracle for `x_curate_outliers`: [[QuantileSketch.clipByQuantiles]]
    * over `documents.n_chars` — the quantile replay as a CTE, bounds
    * pivoted to one row, same band predicate.
    */
  def clipSql(loPct: Int, hiPct: Int, binWidth: Long, maxValue: Long): String =
    s"""WITH qb AS MATERIALIZED (
       |${quantilesSql(Seq(loPct, hiPct), binWidth, maxValue)}
       |),
       |b AS (SELECT min(CASE WHEN pct = $loPct THEN est_lo END) AS lo,
       |             min(CASE WHEN pct = $hiPct THEN est_hi END) AS hi FROM qb)
       |SELECT d.doc_id, CAST(d.n_chars AS BIGINT) AS n_chars
       |FROM documents d, b
       |WHERE d.n_chars >= b.lo AND d.n_chars <= b.hi""".stripMargin
}
