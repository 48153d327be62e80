package graft
import org.apache.spark.sql.SparkSession
object Phases {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val b0 = SparkSession.builder().master("local[32]")
    val b1 = sys.env.get("GRAFT_EVLOG").fold(b0)(dir =>
      b0.config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", dir))
    val spark = b1
      .config("spark.sql.shuffle.partitions", "5")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      (1 to 2).foreach { rep =>
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force analysis+optimization+planning
        val t2 = System.nanoTime()
        val n = df.count()
        val t3 = System.nanoTime()
        println(f"PHASES $name rep$rep build=${(t1-t0)/1e9}%.2f plan=${(t2-t1)/1e9}%.2f exec=${(t3-t2)/1e9}%.2f rows=$n")
        Persisted.unpersistAll(); spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
