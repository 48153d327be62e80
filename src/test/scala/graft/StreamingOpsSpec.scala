package graft

import graft.streaming.StreamingOps
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Structured Streaming forms must agree with their batch twins: stream
  * the events table from parquet with Trigger.AvailableNow into a memory
  * sink and compare against the batch aggregation of the same rows.
  */
class StreamingOpsSpec extends AnyFunSuite with SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private lazy val eventsMicros = {
    // re-write events with micros timestamps so readStream sees a plain
    // TIMESTAMP schema (the shipped file is TIMESTAMP(NANOS))
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_events_micros"
    DerivedModel.events(spark, dir).write.mode("overwrite").parquet(path)
    path
  }

  test("streaming windowed stats == batch windowed stats") {
    val batchDf = spark.read.parquet(eventsMicros)
    val expected = StreamingOps.windowedEventStats(batchDf)
      .collect().map(_.toSeq).toSet

    val sq = StreamingOps.streamingWindowedEventStats(spark, eventsMicros, batchDf)
      .writeStream
      .format("memory")
      .queryName("graft_win_test")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    sq.awaitTermination(120000)
    val got = spark.table("graft_win_test").collect().map(_.toSeq).toSet
    assert(got == expected,
      s"streaming (${got.size} rows) != batch (${expected.size} rows)")
    assert(got.nonEmpty)
  }

  test("streaming dedup drops replayed events, watermark-bounded state") {
    val batchDf = spark.read.parquet(eventsMicros)
    // replay the source twice (at-least-once delivery) into one stream dir
    val dupPath = s"${System.getProperty("java.io.tmpdir")}/graft_events_dup"
    batchDf.write.mode("overwrite").parquet(dupPath)
    batchDf.write.mode("append").parquet(dupPath)

    val sq = StreamingOps.streamingDedup(spark, dupPath, batchDf)
      .writeStream
      .format("memory")
      .queryName("graft_dedup_test")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    sq.awaitTermination(120000)
    val got = spark.table("graft_dedup_test").count()
    assert(got == batchDf.count(),
      s"doubled source must dedup back to ${batchDf.count()} events, got $got")
  }

  test("streaming parquet file sink + checkpoint persists the deduped stream") {
    val batchDf = spark.read.parquet(eventsMicros)
    val dupPath = s"${System.getProperty("java.io.tmpdir")}/graft_events_dup_sink"
    batchDf.write.mode("overwrite").parquet(dupPath)
    batchDf.write.mode("append").parquet(dupPath)
    // a DURABLE sink: exactly-once via the sink transaction log + the
    // checkpoint; the read-back must equal the batch dedup of the source
    val outRoot = s"${System.getProperty("java.io.tmpdir")}/graft_stream_sink"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(): Unit
    }
    rm(new java.io.File(outRoot))
    val sq = StreamingOps.streamingDedup(spark, dupPath, batchDf)
      .writeStream
      .format("parquet")
      .option("path", s"$outRoot/data")
      .option("checkpointLocation", s"$outRoot/ckpt")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    sq.awaitTermination(120000)
    val got = spark.read.parquet(s"$outRoot/data")
    assert(got.count() == batchDf.count(),
      "file sink must hold exactly the deduped event set")
    assert(got.select("event_id").distinct().count() == batchDf.count())
  }

  test("flatMapGroupsWithState running totals equal batch aggregation") {
    val batchDf = spark.read.parquet(eventsMicros)
    val sq = StreamingOps.statefulUserTotals(spark, eventsMicros, batchDf)
      .writeStream
      .format("memory")
      .queryName("graft_state_test")
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    sq.awaitTermination(120000)
    // keep the LAST update per user (multiple micro-batches emit multiple)
    val got = spark.sql(
      """SELECT user_id, max(n_events) AS n, max(value_cents) AS cents
        |FROM graft_state_test GROUP BY user_id""".stripMargin)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val expected = batchDf.groupBy("user_id")
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum(
          StreamingOps.valueCents(org.apache.spark.sql.functions.col("value"))).as("cents"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected)
  }

  test("transformWithState running totals equal batch aggregation") {
    val batchDf = spark.read.parquet(eventsMicros)
    // the new state API only runs on the RocksDB store; scope the provider
    // to this query and restore afterwards
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val sq = StreamingOps.transformWithStateTotals(spark, eventsMicros, batchDf)
        .writeStream
        .format("memory")
        .queryName("graft_tws_test")
        .outputMode("update")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      sq.awaitTermination(120000)
      val got = spark.sql(
        """SELECT user_id, max(n_events) AS n, max(value_cents) AS cents
          |FROM graft_tws_test GROUP BY user_id""".stripMargin)
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
      val expected = batchDf.groupBy("user_id")
        .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"),
          org.apache.spark.sql.functions.sum(
            StreamingOps.valueCents(org.apache.spark.sql.functions.col("value"))).as("cents"))
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
      assert(got == expected)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("stream-stream interval join equals the batch join") {
    val batchDf = spark.read.parquet(eventsMicros)
    val expected = StreamingOps.clickPurchaseJoinBatch(batchDf)
      .collect().map(_.toSeq).toSet
    val sq = StreamingOps.streamStreamJoin(spark, eventsMicros, batchDf)
      .writeStream
      .format("memory")
      .queryName("graft_ssj_test")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    sq.awaitTermination(120000)
    val got = spark.table("graft_ssj_test").collect().map(_.toSeq).toSet
    assert(got == expected,
      s"stream-stream join (${got.size} rows) != batch join (${expected.size} rows)")
    assert(got.nonEmpty)
  }

  test("streaming session_window produces sessions consistent with batch gap logic") {
    val batchDf = spark.read.parquet(eventsMicros)
    val sq = StreamingOps.streamingSessionize(spark, eventsMicros, batchDf, gap = "30 minutes")
      .writeStream
      .format("memory")
      .queryName("graft_sess_test")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    sq.awaitTermination(120000)
    val streamed = spark.table("graft_sess_test")
    val batch = StreamingOps.sessionize(batchDf, gapMillis = 30L * 60 * 1000)
    // session_window merges by gap exactly like the lag/cumsum batch form:
    // same number of sessions and same total event count per user
    val a = streamed.groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = batch.groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b, "sessions per user differ between streaming and batch")
  }
}
