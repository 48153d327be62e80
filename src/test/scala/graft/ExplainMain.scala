package graft

/** Dev tool (test scope): print the executed plan of one or more gated
  * queries without running them — the `.explain`-and-iterate loop the
  * plan audits grew out of.
  *
  *   sbt "Test/runMain graft.ExplainMain x_merge_purge x_dedup_winnow"
  *
  * Special arg `ARRAY_WINDOWS`: sweep EVERY gated query and report each
  * logical Window whose child output carries an ArrayType column
  * (vector/code payload riding a rank shuffle — the r4 mistake). Some
  * hits are legitimate (the payload is needed right after the window and
  * moves exactly once either way, e.g. x_text_pack); the sweep exists so
  * new illegitimate ones get noticed — r11 it caught both recall audits
  * carrying the query vector through their Q·n ranking exchanges.
  */
object ExplainMain {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- args) {
      if (q == "ARRAY_WINDOWS") sweepArrayWindows(spark)
      else {
        println(s"===== $q =====")
        println(SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
          .queryExecution.executedPlan.toString.take(4000))
      }
    }
    spark.stop()
  }

  private def sweepArrayWindows(spark: org.apache.spark.sql.SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LW}
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, "/root/testdata/sf0.001").queryExecution.optimizedPlan
        plan.collect { case w: LW =>
          val arrs = w.child.output.filter(
            _.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType])
          if (arrs.nonEmpty)
            println(s"ARRAYWIN $name: ${arrs.map(_.name).mkString(",")}")
        }
      } catch { case e: Throwable =>
        println(s"ARRAYWIN_ERR $name: ${e.getMessage}")
      }
      Persisted.unpersistAll()
      spark.catalog.clearCache()
    }
    println("ARRAYWIN_DONE")
  }
}
