package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: print the executed plan of one gated query.
  *
  *   sbt "Test/runMain graft.PlanDump x_eval_pq_recall [sfDir] [grep]"
  *
  * With a third arg, prints only lines containing that substring
  * (e.g. "Exchange", "Window") — handy for auditing shuffle shapes
  * without scrolling a 200-line tree.
  *
  * Special name `ARRAY_WINDOWS`: sweep EVERY gated query and report
  * each logical Window whose child output carries an ArrayType column
  * (vector/code payload riding a rank shuffle — the r4 mistake). Some
  * hits are legitimate (ordered folds over the array itself); the
  * report exists so new illegitimate ones get noticed.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(
      throw new IllegalArgumentException("usage: PlanDump <query> [sfDir] [grep]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val needle = args.lift(2)
    if (name == "ARRAY_WINDOWS") { sweepArrayWindows(sfDir); return }
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val plan = SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.executedPlan.toString
    val out = needle match {
      case Some(n) => plan.split("\n").filter(_.contains(n)).mkString("\n")
      case None => plan
    }
    println(s"===PLAN $name===")
    println(out)
    println(s"===END $name===")
    spark.stop()
  }

  private def sweepArrayWindows(sfDir: String): Unit = {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LW}
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.optimizedPlan
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
    spark.stop()
  }
}
