package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC ingest operators: change-stream compaction, MERGE-style upsert of
  * a change batch into a snapshot, and SCD2 history building — the
  * "keep the latest truth / keep the whole history" pair every
  * training-data pipeline needs once sources start shipping updates
  * rather than appends. (No reference counterpart — the reference's data
  * model is append-only occurrence snapshots; north-star surface like the
  * dedup/ANN families.)
  *
  * Scale shape: all three are ONE hash shuffle on the key followed by
  * window functions inside the partition — no join, no second exchange.
  * The union-tag upsert deliberately avoids the join formulation: a full
  * outer join of snapshot and batch shuffles BOTH relations AND loses the
  * multi-version-per-batch case, while union + row_number handles any mix
  * of versions in one pass (same plan family as [[AsofJoin]]). For small
  * change batches against a huge bucketed snapshot, the alternative that
  * skips re-shuffling the snapshot is writing the batch bucketed-aligned
  * and merging on read — a storage-layout decision ([[graft.Layout]]),
  * not a different operator.
  */
object Merge {

  /** CDC compaction: the latest surviving row per key — rank by
    * (version desc, tie desc), keep the winner, and drop keys whose
    * winning op is a delete. `isDelete` marks delete ops in the stream.
    */
  def compact(changes: DataFrame, keyCol: String, versionCol: String,
      tieCol: String, isDelete: Column): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(versionCol).desc, col(tieCol).desc)
    changes.withColumn("_graft_del", isDelete)
      .withColumn("_graft_rn", row_number().over(w))
      .filter(col("_graft_rn") === 1 && !col("_graft_del"))
      .drop("_graft_rn", "_graft_del")
  }

  /** MERGE INTO snapshot USING batch: snapshot rows (delete-free by
    * construction) and batch rows (which may carry deletes) are
    * union-tagged and compacted — the newest version wins per key,
    * inserts appear, deleted keys disappear. Exactly the union-window
    * plan: one shuffle total.
    */
  def upsert(snapshot: DataFrame, batch: DataFrame, keyCol: String,
      versionCol: String, tieCol: String, batchIsDelete: Column): DataFrame =
    compact(
      snapshot.withColumn("_graft_isdel", lit(false))
        .unionByName(batch.withColumn("_graft_isdel", batchIsDelete)),
      keyCol, versionCol, tieCol, col("_graft_isdel"))
      .drop("_graft_isdel")

  /** SCD2 history of one tracked attribute: consecutive duplicate states
    * collapse (change detection via `lag`), every surviving change opens
    * an interval `[valid_from, valid_to)` closed by the key's next
    * change; the open interval is flagged `is_current`. Both windows use
    * the same (key, version, tie) partitioning and ordering, and the
    * filter between them is narrow — the plan sorts once and never
    * re-shuffles.
    */
  def scd2(df: DataFrame, keyCol: String, versionCol: String, tieCol: String,
      attrCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(versionCol), col(tieCol))
    df.withColumn("_graft_prev", lag(col(attrCol), 1).over(w))
      .filter(col("_graft_prev").isNull || col("_graft_prev") =!= col(attrCol))
      .withColumn("valid_from", col(versionCol))
      .withColumn("valid_to", lead(col(versionCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("_graft_prev")
  }

  /** DuckDB twin of [[compact]] over `events` (key user_id, version ts,
    * tie event_id, deletes = error events).
    */
  def compactEventsSql(extraWhere: String = ""): String =
    s"""SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, event_type, value
       |FROM (SELECT *, row_number() OVER (
       |        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
       |      FROM events $extraWhere)
       |WHERE rn = 1 AND event_type <> 'error'""".stripMargin

  /** DuckDB twin of [[upsert]] over `events` split at `splitTs`: the
    * pre-split compacted snapshot union-tagged with the post-split batch,
    * re-ranked — mirroring the operator's two-relation construction.
    */
  def upsertEventsSql(splitTs: String): String =
    s"""WITH snap AS (
       |  SELECT user_id, event_id, ts, event_type, value, FALSE AS isdel
       |  FROM (SELECT *, row_number() OVER (
       |          PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
       |        FROM events WHERE ts < TIMESTAMP '$splitTs')
       |  WHERE rn = 1 AND event_type <> 'error'),
       |batch AS (
       |  SELECT user_id, event_id, ts, event_type, value,
       |         event_type = 'error' AS isdel
       |  FROM events WHERE ts >= TIMESTAMP '$splitTs'),
       |u AS (SELECT * FROM snap UNION ALL SELECT * FROM batch)
       |SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, event_type, value
       |FROM (SELECT *, row_number() OVER (
       |        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn FROM u)
       |WHERE rn = 1 AND NOT isdel""".stripMargin

  /** DuckDB twin of [[scd2]] over `events` tracking `event_type`. */
  def scd2EventsSql: String =
    s"""WITH s AS (
       |  SELECT user_id, event_id, ts, event_type,
       |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
       |  FROM events),
       |c AS (SELECT user_id, event_id, ts, event_type FROM s
       |      WHERE prev IS NULL OR prev <> event_type)
       |SELECT user_id, event_id, event_type, epoch_ms(ts) AS valid_from_ms,
       |  epoch_ms(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS valid_to_ms,
       |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
       |FROM c""".stripMargin

  /** Corpus snapshot diff — the dataset-version comparison a curation
    * pipeline audits releases with: keys present only in `newer` are
    * `added`, only in `older` are `removed`, present in both with a
    * different content hash are `changed` (identical rows drop out —
    * the diff is the small relation, not the corpus). One full-outer
    * equi-join on the key; content compares by md5 of the concatenated
    * `hashCols`, so the shuffle carries (key, 32-byte hash), never the
    * payload.
    */
  def snapshotDiff(older: DataFrame, newer: DataFrame, keyCol: String,
      hashCols: Seq[String]): DataFrame = {
    require(hashCols.nonEmpty)
    def hashed(df: DataFrame) = df.select(col(keyCol),
      md5(concat_ws("\u0001", hashCols.map(c => col(c).cast("string")): _*)
        .cast("binary")).as("_graft_h"))
    hashed(older).withColumnRenamed("_graft_h", "_graft_h_old")
      .join(hashed(newer).withColumnRenamed("_graft_h", "_graft_h_new"),
        Seq(keyCol), "full_outer")
      .withColumn("status",
        when(col("_graft_h_old").isNull, lit("added"))
          .when(col("_graft_h_new").isNull, lit("removed"))
          .when(col("_graft_h_old") =!= col("_graft_h_new"), lit("changed")))
      .filter(col("status").isNotNull)
      .select(col(keyCol), col("status"))
  }

  /** DuckDB twin of [[snapshotDiff]] for two relations `olderRel` /
    * `newerRel` exposing (keyCol, hashCols...): identical separator,
    * cast-to-string, and md5.
    */
  /** Right-to-erasure purge: drop every row whose key appears in the
    * delete list — ONE broadcast anti-join per relation (delete batches
    * are small; at 100 TB the rewrite cost is the data files, which a
    * deployment bounds by partitioning on the key's bucket and
    * rewriting only affected files — the [[compact]]-adjacent
    * maintenance shape).
    */
  def purgeKeys(df: DataFrame, keyCol: String, keys: DataFrame,
      keysCol: String): DataFrame =
    df.join(broadcast(keys.select(col(keysCol).as("_graft_k")).distinct()),
      col(keyCol) === col("_graft_k"), "left_anti")

  /** Purge-propagation audit across every relation a key reaches
    * (documents, embeddings, derived indexes — erasure must propagate
    * or the vector store resurrects deleted content): one row per
    * relation `(relation, rows_before, removed, rows_after)`, computed
    * with the same broadcast key join [[purgeKeys]] deletes with.
    */
  def purgeAudit(relations: Seq[(String, DataFrame, String)],
      keys: DataFrame, keysCol: String): DataFrame = {
    val ks = broadcast(keys.select(col(keysCol).as("_graft_k")).distinct())
    relations.map { case (name, df, kc) =>
      df.join(ks, col(kc) === col("_graft_k"), "left")
        .agg(count(lit(1)).as("rows_before"),
          count(col("_graft_k")).as("removed"))
        .select(lit(name).as("relation"), col("rows_before"), col("removed"),
          (col("rows_before") - col("removed")).as("rows_after"))
    }.reduce(_.unionByName(_))
  }

  def snapshotDiffSql(olderRel: String, newerRel: String, keyCol: String,
      hashCols: Seq[String]): String = {
    val h = s"md5(concat_ws(chr(1), ${hashCols.map(c => s"CAST($c AS VARCHAR)").mkString(", ")}))"
    s"""SELECT COALESCE(o.$keyCol, n.$keyCol) AS $keyCol,
       |  CASE WHEN o.$keyCol IS NULL THEN 'added'
       |       WHEN n.$keyCol IS NULL THEN 'removed'
       |       WHEN o.h <> n.h THEN 'changed' END AS status
       |FROM (SELECT $keyCol, $h AS h FROM $olderRel) o
       |FULL OUTER JOIN (SELECT $keyCol, $h AS h FROM $newerRel) n
       |  ON o.$keyCol = n.$keyCol
       |WHERE (o.$keyCol IS NULL OR n.$keyCol IS NULL OR o.h <> n.h)""".stripMargin
  }
}
