package graft

import graft.sources.Layout
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed layout must remove the shuffle on the bucketed (big) side of
  * the existence join — the physical plan is the assertion.
  */
class LayoutSpec extends AnyFunSuite with SparkTestBase {

  test("bucketed occurrence join has no exchange on the bucketed side") {
    val dir = "/root/testdata/sf0.001"
    val occ = DerivedModel.occurrence(spark, dir)
    spark.sql("DROP TABLE IF EXISTS graft_occ_bucketed")
    val loc = java.nio.file.Paths.get(
      s"${System.getProperty("java.io.tmpdir")}/graft_warehouse/graft_occ_bucketed")
    if (java.nio.file.Files.exists(loc)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
    Layout.writeBucketedOccurrence(occ, "graft_occ_bucketed", buckets = 8)

    val bucketed = Layout.table(spark, "graft_occ_bucketed")
    // force a non-broadcast join so the shuffle question is real
    val keys = bucketed.select(col("taxonKey")).distinct()
    val joined = bucketed.hint("shuffle_hash")
      .join(keys.hint("shuffle_hash"), Seq("taxonKey"))
    val plan = joined.queryExecution.executedPlan.toString

    // the scan side that comes from the bucketed table must not shuffle:
    // exactly one Exchange (for the distinct/other side), not two
    val exchanges = "(?m)^.*Exchange hashpartitioning".r
      .findAllIn(plan).size
    assert(plan.contains("Bucketed: true"), s"scan not bucketed:\n$plan")
    assert(exchanges <= 1, s"expected <=1 exchange, got $exchanges:\n$plan")

    // and results are identical to the unbucketed relation
    assert(bucketed.count() == occ.count())
  }
}
