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

  test("k7_bucketed_join gate plan reads the bucketed fact without an exchange") {
    val dir = "/root/testdata/sf0.001"
    val joined = SparkEntry.queries("k7_bucketed_join")(spark, dir)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("Bucketed: true"), s"fact scan not bucketed:\n$plan")
    // dim side + the canonicalName re-aggregation may exchange; the
    // bucketed fact side must not (2 exchanges total, not 3)
    val exchanges = "(?m)^.*Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 2, s"expected <=2 exchanges, got $exchanges:\n$plan")
    assert(joined.limit(1).count() == 1)
  }

  test("zorder key interleaves bits; zorderBy sorts by it") {
    import spark.implicits._
    def morton(x: Long, y: Long): Long =
      (0 until 31).map(i => (((x >> i) & 1L) << (2 * i)) |
        (((y >> i) & 1L) << (2 * i + 1))).reduce(_ | _)
    val grid = for (x <- 0L until 8L; y <- 0L until 8L) yield (x, y)
    val df = grid.toDF("x", "y")
    val keys = df.select(col("x"), col("y"),
      Layout.zorderKey(col("x"), col("y")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    grid.foreach { case (x, y) =>
      assert(keys((x, y)) == morton(x, y), s"($x,$y)")
    }
    // quadrant locality: every key in the (0..3, 0..3) quadrant sorts
    // before any key in the (4..7, 4..7) quadrant
    val loQ = grid.filter(p => p._1 < 4 && p._2 < 4).map(keys).max
    val hiQ = grid.filter(p => p._1 >= 4 && p._2 >= 4).map(keys).min
    assert(loQ < hiQ, "z-curve must keep quadrants contiguous")
    val sorted = Layout.zorderBy(df, col("x"), col("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(sorted.toSeq == grid.sortBy(p => keys(p)).toSeq,
      "zorderBy must order rows by the morton key")
  }

  test("zone-map audit: clustered layout prunes to exact file granularity, " +
    "arrival order prunes nothing") {
    import spark.implicits._
    val docs = (0L until 1000L).map(i => (i, i)).toDF("doc_id", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("zonemap").toString
    val rows = graft.sources.Layout.zoneMapSkipAudit(
        docs, "doc_id", "n_chars", maxValue = 999L, rowsPerFile = 100L,
        lo = 250L, hi = 349L, outRoot = dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // clustered: value == position, so files hold [0,99],[100,199],… —
    // the [250,349] band touches exactly files 2 and 3
    assert(rows("clustered") == ((10L, 8L, 200L)), rows("clustered"))
    // arrival (md5 order): each 100-row file misses the 10%-wide band
    // with prob 0.9^100 ~ 2.7e-5 — no file skips, full scan
    val (af, askip, ascan) = rows("arrival")
    assert(af == 10L && askip == 0L && ascan == 1000L, rows("arrival"))
  }

  test("schemaEvolvedRead: merged relation holds both generations, old " +
      "rows surface the new column as NULL") {
    import spark.implicits._
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_evolve_spec_" +
      ProcessHandle.current().pid()
    val v1 = Seq((1L, "a"), (2L, "b")).toDF("id", "text")
    val v2 = Seq((3L, "c", "en"), (4L, "d", "de")).toDF("id", "text", "lang")
    val merged = Layout.schemaEvolvedRead(v1, v2, out)
    assert(merged.columns.sorted.toSeq == Seq("id", "lang", "text"),
      s"merged schema must union the generations: ${merged.columns.toSeq}")
    val rows = merged.collect()
      .map(r => r.getLong(r.fieldIndex("id")) ->
        Option(r.getAs[String]("lang"))).toMap
    assert(rows == Map(1L -> None, 2L -> None,
      3L -> Some("en"), 4L -> Some("de")), s"got $rows")
  }
}
