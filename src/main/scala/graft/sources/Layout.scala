package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Physical-layout helpers for the 100 TB deployment: bucket the big fact
  * relations by their join keys so the hot joins (occurrence existence
  * semi-join, shingle co-occurrence) read pre-partitioned data and skip
  * the shuffle on the large side entirely.
  *
  * Bucketing is the one optimization that cannot be retrofitted at query
  * time — it is decided when the table is written. The engine's join keys
  * are stable (taxonKey for occurrence, key for backbone), so dimension
  * and fact tables written through these helpers give every downstream
  * existence/lineage join a shuffle-free large side; AQE still picks the
  * small-side strategy.
  */
object Layout {

  /** Write the occurrence relation bucketed+sorted by taxonKey. */
  def writeBucketedOccurrence(occ: DataFrame, table: String,
      buckets: Int = 256): Unit =
    occ.write.mode("overwrite")
      .bucketBy(buckets, "taxonKey")
      .sortBy("taxonKey")
      .format("parquet")
      .saveAsTable(table)

  /** Write the backbone relation bucketed by key. */
  def writeBucketedBackbone(backbone: DataFrame, table: String,
      buckets: Int = 64): Unit =
    backbone.write.mode("overwrite")
      .bucketBy(buckets, "key")
      .sortBy("key")
      .format("parquet")
      .saveAsTable(table)

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
