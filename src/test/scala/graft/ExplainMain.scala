package graft

/** Dev tool (test scope): print the executed plan of one or more gated
  * queries without running them — the `.explain`-and-iterate loop the
  * plan audits grew out of.
  *
  *   sbt "Test/runMain graft.ExplainMain x_merge_purge x_dedup_winnow"
  */
object ExplainMain {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- args) {
      println(s"===== $q =====")
      println(SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}
