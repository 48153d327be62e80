package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** Schema-adaptation guards for [[DerivedModel]]: the driver has shipped
  * `events.ts` as TIMESTAMP(NANOS) (read as long under
  * `nanosAsLong=true`), as TIMESTAMP_NTZ(micros), and could ship plain
  * TIMESTAMP — [[DerivedModel.events]] must normalize all three to a
  * TIMESTAMP column with identical instants (round 7 lost 18 queries to
  * exactly this: a regenerated testdata drop changed the physical type
  * and the unconditional nanos conversion failed analysis).
  */
class DerivedModelSpec extends AnyFunSuite with SparkTestBase {

  test("events normalizes long-nanos ts to the same instants as timestamps") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ev_schema").toString
    val microsOfRow = Seq(1700000000000000L, 1700000123456789L, 1700009999999999L)
    // long-nanos generation (what nanosAsLong=true yields for NANOS parquet)
    microsOfRow.zipWithIndex
      .map { case (us, i) => (i.toLong, us * 1000L, i.toLong, "click", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val viaNanos = DerivedModel.events(spark, dir)
    assert(viaNanos.schema("ts").dataType == TimestampType)
    val gotNanos = viaNanos.orderBy("event_id")
      .select(unix_micros(col("ts"))).collect().map(_.getLong(0)).toSeq
    assert(gotNanos == microsOfRow)

    // timestamp generation (covers both NTZ-cast and native TIMESTAMP:
    // under the UTC session the micros are identical)
    microsOfRow.zipWithIndex
      .map { case (us, i) => (i.toLong, us, i.toLong, "click", 1.0, "{}") }
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val viaTs = DerivedModel.events(spark, dir)
    assert(viaTs.schema("ts").dataType == TimestampType)
    val gotTs = viaTs.orderBy("event_id")
      .select(unix_micros(col("ts"))).collect().map(_.getLong(0)).toSeq
    assert(gotTs == microsOfRow)
  }

  test("live testdata events reads as TIMESTAMP at every sf") {
    Seq("sf0.001", "sf0.01").foreach { sf =>
      val ev = DerivedModel.events(spark, s"/root/testdata/$sf")
      assert(ev.schema("ts").dataType == TimestampType, sf)
      assert(ev.limit(1).count() == 1L, sf)
    }
  }
}
