package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection utility: prints the formatted physical plan of selected
  * `SparkEntry.queries` (all of them with no args). Used to keep the
  * plans honest at scale: PushedFilters on scans, broadcast joins on
  * dimensions, WholeStageCodegen spans, exchange reuse.
  *
  * Usage: `runMain graft.Explain [sfDir] [query ...]`
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-explain")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach {
      case "entry" =>
        println(s"\n========== entry (smoke) ==========")
        println(s"entry rows = ${SparkEntry.entry(spark).count()}")
      case name =>
        println(s"\n========== $name ==========")
        try SparkEntry.queries(name)(spark, sfDir).explain("formatted")
        catch { case e: Throwable => println(s"failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
