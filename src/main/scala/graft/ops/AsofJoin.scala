package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for each left row, the single most recent right
  * row (per key) at-or-before (or strictly before) the left timestamp.
  * The reference has no such operator; it is standard equipment for a
  * time-series analytics engine and a north-star extension here.
  *
  * Spark lacks a native as-of join, and the naive theta-join
  * (`l.key = r.key AND r.ts <= l.ts` + max-window) materializes every
  * qualifying (left, right) combination before reducing — quadratic per
  * key. This implementation is the scalable union-tag formulation:
  *
  *  1. union both sides, tagged, in one relation;
  *  2. one shuffle on the key, one per-partition sort by (ts, side);
  *  3. ONE `last(payload_struct, ignoreNulls)` running window carries the
  *     latest right row's payload forward onto each left row. All payload
  *     columns travel together inside a single never-null STRUCT (a
  *     struct of null fields is itself non-null), so the window always
  *     selects the MATCHED right row — a NULL payload column in the
  *     latest qualifying right row stays NULL in the output instead of
  *     being silently substituted by an older right row's value, and the
  *     output can never mix columns from different right rows.
  *
  * Cost: ONE shuffle + sort of |L| + |R| rows — no join blowup, AQE-
  * compatible, skew bounded by per-key sort. This is the plan a 100 TB
  * event table needs (a hash join would be fine; the quadratic
  * intermediate would not).
  *
  * Requirements: `right` must be unique per (keys, rightTime) — dedupe
  * first.
  */
object AsofJoin {

  /** @param keys      equi-join key columns (present on both sides)
    * @param leftTime  left timestamp column
    * @param rightTime right timestamp column
    * @param payload   right-side columns to carry onto left rows
    * @param strict    true = right.ts < left.ts; false = right.ts <= left.ts
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, payload: Seq[String],
      strict: Boolean = false): DataFrame =
    joinImpl(left, right, keys, leftTime, rightTime, payload, strict,
      forwardDir = false)

  /** Forward as-of: for each left row, the single EARLIEST right row (per
    * key) at-or-after (`strict = false`) or strictly after (`strict =
    * true`) the left timestamp — the mirror image of [[backward]] (same
    * one-shuffle union-tag plan, scanned in descending time order so the
    * running window carries the nearest FUTURE right row).
    */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, payload: Seq[String],
      strict: Boolean = false): DataFrame =
    joinImpl(left, right, keys, leftTime, rightTime, payload, strict,
      forwardDir = true)

  private def joinImpl(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, payload: Seq[String],
      strict: Boolean, forwardDir: Boolean): DataFrame = {
    val leftCols = left.columns.toSeq
    require(payload.nonEmpty, "as-of join needs at least one payload column")
    require(keys.forall(leftCols.contains) && leftCols.contains(leftTime),
      s"left side must contain $keys and $leftTime (has $leftCols)")
    require((keys :+ rightTime).forall(right.columns.contains) &&
      payload.forall(right.columns.contains),
      s"right side must contain $keys, $rightTime and $payload (has ${right.columns.toSeq})")
    val reserved = Seq("_graft_ts", "_graft_side", "_graft_p")
    require(!leftCols.exists(reserved.contains),
      s"left column names collide with as-of working columns: " +
        leftCols.filter(reserved.contains).mkString(", "))
    // at equal ts the window must see the right row first (inclusive) or
    // not at all (strict): side ordering flips accordingly. The same side
    // assignment serves both directions — the side column always sorts
    // ascending; only the TIME order reverses for forward.
    val (rightSide, leftSide) = if (strict) (1, 0) else (0, 1)

    // the whole right payload as ONE struct: non-null on right rows even
    // when every payload FIELD is null, null on left rows — so a single
    // last(ignoreNulls) picks the matched right row atomically
    val payloadType = org.apache.spark.sql.types.StructType(
      payload.map(c => right.schema(right.schema.fieldIndex(c)).copy(name = c)))
    val taggedRight = right.select(
      keys.map(col) ++
        Seq(col(rightTime).as("_graft_ts"), lit(rightSide).as("_graft_side")) ++
        leftCols.filterNot(keys.contains).map(c => lit(null).as(c)) ++
        Seq(struct(payload.map(c => col(c).as(c)): _*).as("_graft_p")): _*)
    val taggedLeft = left.select(
      keys.map(col) ++
        Seq(col(leftTime).as("_graft_ts"), lit(leftSide).as("_graft_side")) ++
        leftCols.filterNot(keys.contains).map(col) ++
        Seq(lit(null).cast(payloadType).as("_graft_p")): _*)

    val tsOrder = if (forwardDir) col("_graft_ts").desc else col("_graft_ts").asc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(tsOrder, col("_graft_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // strict mode: at equal ts left sorts first, so `currentRow` upper
    // bound already excludes same-ts right rows
    taggedRight.unionByName(taggedLeft)
      .withColumn("_graft_p", last(col("_graft_p"), ignoreNulls = true).over(w))
      .filter(col("_graft_side") === leftSide)
      .select(keys.map(col) ++
        leftCols.filterNot(keys.contains).map(col) ++
        payload.map(c => col(s"_graft_p.$c").as(s"asof_$c")): _*)
  }
}
