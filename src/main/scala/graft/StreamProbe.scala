package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
/** Diagnostic: run one or more x_stream_* gates and print every
  * micro-batch's durationMs breakdown (walCommit / queryPlanning /
  * addBatch / ...) from the engine's own progress events. */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "5")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
        println(s"SQ START ${e.id} at ${System.currentTimeMillis()}")
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
        println(s"SQ PROGRESS batch=${e.progress.batchId} rows=${e.progress.numInputRows} durationMs=${e.progress.durationMs}")
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        println(s"SQ END ${e.id} at ${System.currentTimeMillis()}")
    })
    names.foreach { name =>
      (1 to 2).foreach { rep =>
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(name)(spark, sfDir).count()
        println(f"STREAMPROBE $name rep$rep total=${(System.nanoTime()-t0)/1e9}%.2f rows=$n")
        Persisted.unpersistAll(); spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
