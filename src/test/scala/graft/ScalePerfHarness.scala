package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev harness (test scope, run by hand): measures the exact-O(n^2) vs
  * bucketed-LSH crossover for embedding near-dup pair generation at
  * corpus sizes the gated sf0.1 bench cannot reach. The corpus is the
  * sf0.1 embeddings table replicated `factor` times with deterministic
  * id offsets and per-copy perturbations large enough that copies are
  * NOT near-dups of each other (background), plus the usual planted
  * near-identical pairs (signal).
  *
  *   sbt "Test/runMain graft.ScalePerfHarness 100000"
  */
object ScalePerfHarness {

  def corpus(spark: SparkSession, count: Long): DataFrame = {
    // hash-derived uniform vectors: genuinely decorrelated background
    // (cosine ~ 0 +- d^-1/2, like real embedding corpora). Transforms of
    // a small base set (rotation blends, sign patterns) do NOT work —
    // they leave structured moderate/high similarities that change the
    // problem. No oracle runs here, so no cross-engine constraint.
    spark.range(count).select(col("id").as("vec_id"),
      expr("transform(sequence(0, 63), i -> " +
        "(CAST(pmod(xxhash64(id, i), 1000003) AS DOUBLE) / 500001.5) - 1.0)")
        .as("embedding"))
  }

  def main(args: Array[String]): Unit = {
    val count = args.headOption.map(_.toLong).getOrElse(100000L)
    val numTables = args.lift(1).map(_.toInt).getOrElse(8)
    val planesPerTable = args.lift(2).map(_.toInt).getOrElse(12)
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val secs = (for {s <- i.submissionTime; c <- i.completionTime} yield (c - s) / 1e3)
          .getOrElse(-1.0)
        val m = i.taskMetrics
        if (secs > 2.0) println(
          f"[stage] ${i.stageId}%4d $secs%7.1f s tasks=${i.numTasks}%4d " +
            f"cpu=${m.executorCpuTime / 1e9}%7.1f run=${m.executorRunTime / 1e3}%7.1f " +
            f"gc=${m.jvmGCTime / 1e3}%5.1f deser=${m.executorDeserializeTime / 1e3}%5.1f " +
            f"swMB=${m.shuffleWriteMetrics.bytesWritten / 1e6}%7.1f " +
            f"swT=${m.shuffleWriteMetrics.writeTime / 1e9}%5.1f")
      }
    })
    val docs = corpus(spark, count)
    val augmented = docs.unionByName(
      docs.filter(col("vec_id") % 50 === 0)
        .select((col("vec_id") + lit(1000000000L)).as("vec_id"),
          expr("transform(embedding, (x, i) -> x + (CAST((vec_id * 31 + CAST(i AS BIGINT)) % 7 AS DOUBLE) - 3.0) * 0.0001)")
            .as("embedding")))
      .persist()
    val n = augmented.count()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"[scale-harness] $name n=$n rows=$rows ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    time(s"bucket-only(t=$numTables,p=$planesPerTable)") {
      val planes = (0 until numTables).map(t =>
        graft.sim.Similarity.hyperplanes(64, planesPerTable, 42L + t))
      augmented.select(planes.map(p =>
        graft.sim.Similarity.lshBucket(col("embedding"), p)): _*).count()
    }
    // probes replicating lshCosinePairs internals, to localize cost
    locally {
      import graft.sim.{SimExpressions, Similarity}
      val normed = augmented.select(col("vec_id").as("_nid"),
        col("embedding").cast("array<double>").as("_nvec"),
        sqrt(SimExpressions.dot(col("embedding"), col("embedding"))).as("_nnorm"))
      val withBuckets = normed.select(
        Seq(col("_nid"), col("_nvec"), col("_nnorm")) ++
          (0 until numTables).map { t =>
            Similarity.lshBucket(col("_nvec"),
              Similarity.hyperplanes(64, planesPerTable, 42L + t)).as(s"_b$t")
          }: _*)
      val bucketed = withBuckets
        .select(col("_nid"), col("_nvec"), col("_nnorm"),
          explode(array((0 until numTables).map(t =>
            struct(lit(t).as("tbl"), col(s"_b$t").as("bucket"))): _*)).as("tb"))
        .select(col("_nid"), col("_nvec"), col("_nnorm"),
          col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
      time("probe:bucketed-compute") { bucketed.count() }
      time("probe:bucketed-shuffle") {
        bucketed.repartition(col("tbl"), col("bucket")).count()
      }
      val a = bucketed.select(col("tbl"), col("bucket"), col("_nid").as("id_a"))
      val bb = bucketed.select(col("tbl").as("tbl_b"), col("bucket").as("bucket_b"),
        col("_nid").as("id_b"))
      time("probe:skinny-pair-join") {
        a.join(bb, col("tbl") === col("tbl_b") && col("bucket") === col("bucket_b") &&
          col("id_a") < col("id_b")).count()
      }
    }
    time(s"lshCosinePairs(t=$numTables,p=$planesPerTable)") {
      graft.sim.Similarity.lshCosinePairs(augmented, "vec_id", "embedding",
        tau = 0.95, numTables = numTables, planesPerTable = planesPerTable).count()
    }
    Persisted.unpersistAll()
    time("cosineNearDupPairs(exact)") {
      graft.sim.Similarity.cosineNearDupPairs(augmented, "vec_id", "embedding",
        tau = 0.95).count()
    }
    spark.stop()
  }
}
