package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling: align an event stream onto a dense fixed-step
  * grid per key (gap filling), with empty buckets carrying zero counts and
  * a forward-filled "last observed" value — the shape dashboards, feature
  * pipelines and downstream ML joins expect (a missing hour must be an
  * explicit zero row, not an absent row).
  *
  * Scale shape: one aggregation onto the bucket grain, one tiny per-key
  * span aggregation whose `sequence` explode generates the grid (bounded
  * by each key's time span, never the cross product of keys × global
  * range), an equi-join of grid × buckets on (key, bucket), and one
  * per-key ordered window for the forward fill. Every stage shuffles on
  * the key — no global structure, no driver loops.
  */
object Resample {

  /** Hourly gap-fill + forward fill.
    * Output per (key, hour of its span): `n_events` (0 on gaps),
    * `value_cents` (that hour's sum, NULL on gaps), `ffill_cents` (most
    * recent non-null hourly sum at-or-before this hour).
    */
  def hourlyGapFill(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val hour = date_trunc("hour", col(tsCol))
    val hourly = events
      .groupBy(col(keyCol), hour.as("_graft_hour"))
      .agg(count(lit(1)).as("_graft_n"),
        sum(floor(col(valueCol) * 100 + 0.5)).as("_graft_cents"))
    val grid = hourly
      .groupBy(col(keyCol))
      .agg(min(col("_graft_hour")).as("_graft_lo"),
        max(col("_graft_hour")).as("_graft_hi"))
      .select(col(keyCol), explode(sequence(col("_graft_lo"), col("_graft_hi"),
        expr("INTERVAL 1 HOUR"))).as("_graft_hour"))
    val ffill = Window.partitionBy(col(keyCol)).orderBy(col("_graft_hour"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly, Seq(keyCol, "_graft_hour"), "left")
      .select(col(keyCol),
        col("_graft_hour").as("bucket_start"),
        coalesce(col("_graft_n"), lit(0L)).as("n_events"),
        col("_graft_cents").as("value_cents"),
        last(col("_graft_cents"), ignoreNulls = true).over(ffill)
          .as("ffill_cents"))
  }
}
