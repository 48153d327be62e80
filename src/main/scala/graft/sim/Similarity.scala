package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding similarity search (north-star extensions): brute-force cosine
  * top-k as the exact baseline, random-hyperplane LSH bucketing as the
  * scale path, and cosine near-duplicate pairs.
  *
  * All math is double-precision with a fixed left-to-right accumulation
  * order (`zip_with` + `aggregate` higher-order functions), so results are
  * bit-deterministic and reproducible in the DuckDB oracle.
  */
object Similarity {

  /** Cosine similarity of two `array<float|double>` columns, built on the
    * native codegen'd [[DotProductExpr]] (index-ascending accumulation —
    * bit-identical to the oracle's explicit left-associated sum).
    */
  def cosine(a: Column, b: Column): Column =
    SimExpressions.dot(a, b) /
      (sqrt(SimExpressions.dot(a, a)) * sqrt(SimExpressions.dot(b, b)))

  /** DuckDB twin of [[cosine]] for a known dimensionality: explicit
    * left-associated sum, 1-based list indexing — identical op order.
    */
  def cosineSql(a: String, b: String, dim: Int): String = {
    def dot(x: String, y: String) = (1 to dim)
      .map(i => s"CAST($x[$i] AS DOUBLE) * CAST($y[$i] AS DOUBLE)").mkString(" + ")
    s"(${dot(a, b)}) / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}))"
  }

  /** Exact top-k nearest neighbors of one query row (by id) against the
    * whole collection: broadcast the single query vector, scan-and-score,
    * total-order by (cosine desc, id) for determinism. The baseline every
    * ANN variant is measured against.
    */
  def bruteForceTopK(embeddings: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int): DataFrame = {
    val query = embeddings.filter(col(idCol) === queryId)
      .select(col(vecCol).as("_qvec"))
    embeddings
      .join(broadcast(query))
      .filter(col(idCol) =!= queryId)
      .select(col(idCol), cosine(col(vecCol), col("_qvec")).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** All pairs with cosine >= tau. NB: this is the exact O(n^2) formulation
    * (a cross join with an inequality filter) — correct at verification
    * scale; at 100 TB use [[lshCosinePairs]], which replaces the cross join
    * with an equi-join on hyperplane-sign buckets.
    */
  def cosineNearDupPairs(embeddings: DataFrame, idCol: String, vecCol: String,
      tau: Double): DataFrame = {
    // precompute each row's norm once (same doubles as computing it per
    // pair, so the oracle formula dot/(sqrt(na)*sqrt(nb)) is unchanged)
    val normed = embeddings.select(col(idCol).as("_nid"), col(vecCol).as("_nvec"),
      sqrt(SimExpressions.dot(col(vecCol), col(vecCol))).as("_nnorm"))
    val a = normed.select(col("_nid").as("id_a"), col("_nvec").as("_va"), col("_nnorm").as("_na"))
    val b = normed.select(col("_nid").as("id_b"), col("_nvec").as("_vb"), col("_nnorm").as("_nb"))
    val cosineExpr =
      SimExpressions.dot(col("_va"), col("_vb")) / (col("_na") * col("_nb"))
    // evaluate the threshold INSIDE the join condition: the nested-loop
    // join then only materializes matching pairs instead of copying both
    // vectors for every candidate combination (~3x at low parallelism)
    a.join(b, col("id_a") < col("id_b") && cosineExpr >= tau)
      .select(col("id_a"), col("id_b"), cosineExpr.as("cosine"))
  }

  /** Deterministic pseudo-random unit-free hyperplanes (fixed seed) for
    * sign-LSH. Generated driver-side once; shipped as literals.
    */
  def hyperplanes(dim: Int, count: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(count)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-LSH bucket id: one bit per hyperplane (sign of the dot product).
    * Vectors with high cosine land in the same bucket with high
    * probability; bucketing is a plain column, so candidate generation is
    * an equi-join — the scale path for near-neighbor search.
    */
  def lshBucket(vec: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val d = SimExpressions.dot(vec, array(p.map(lit): _*))
      when(d >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce((x, y) => x.bitwiseOR(y))

  /** IVF coarse quantizer: centroids are the k lowest-id vectors
    * (deterministic seeds — a real index would train them, e.g. k-means;
    * the partition/probe mechanics are identical), assignment is argmax
    * cosine with (sim desc, centroid id) tie-break. The cluster id is a
    * plain column, so probing is an equi-/semi-join — at scale the inverted
    * lists shard by cluster and only nProbe lists are scanned per query.
    */
  def ivfAssign(embeddings: DataFrame, idCol: String, vecCol: String,
      numClusters: Int): DataFrame = {
    val centroids = ivfCentroids(embeddings, idCol, vecCol, numClusters)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("_csim").desc, col("_cid"))
    embeddings
      .join(broadcast(centroids))
      .withColumn("_csim", cosine(col(vecCol), col("_cvec")))
      .withColumn("_crn", row_number().over(w))
      .filter(col("_crn") === 1)
      .select(col(idCol), col(vecCol), col("_cid").as("cluster"))
  }

  def ivfCentroids(embeddings: DataFrame, idCol: String, vecCol: String,
      numClusters: Int): DataFrame =
    embeddings.orderBy(col(idCol)).limit(numClusters)
      .select(col(idCol).as("_cid"), col(vecCol).as("_cvec"))

  /** ANN via IVF: rank the query's nProbe nearest clusters, score only
    * vectors assigned to them. Recall measured against [[bruteForceTopK]]
    * in the spec.
    */
  def ivfTopK(embeddings: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int, numClusters: Int = 16, nProbe: Int = 4): DataFrame = {
    val assigned = ivfAssign(embeddings, idCol, vecCol, numClusters)
    val query = embeddings.filter(col(idCol) === queryId)
      .select(col(vecCol).as("_qvec"))
    val probed = ivfCentroids(embeddings, idCol, vecCol, numClusters)
      .join(broadcast(query))
      .select(col("_cid"), cosine(col("_cvec"), col("_qvec")).as("_qsim"))
      .orderBy(col("_qsim").desc, col("_cid"))
      .limit(nProbe)
      .select(col("_cid").as("cluster"))
    assigned
      .join(broadcast(probed), Seq("cluster"), "left_semi")
      .join(broadcast(query))
      .filter(col(idCol) =!= queryId)
      .select(col(idCol), cosine(col(vecCol), col("_qvec")).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** ANN via sign-LSH: score only candidates sharing the query's bucket
    * (single probe), then exact-cosine rank. Recall < 1 by construction;
    * measured against [[bruteForceTopK]] in the spec.
    */
  def lshTopK(embeddings: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int, numPlanes: Int = 12, dim: Int = 64): DataFrame = {
    val planes = hyperplanes(dim, numPlanes)
    val bucketed = embeddings.withColumn("_bucket", lshBucket(col(vecCol), planes))
    val query = bucketed.filter(col(idCol) === queryId)
      .select(col("_bucket").as("_qbucket"), col(vecCol).as("_qvec"))
    bucketed
      .join(broadcast(query), col("_bucket") === col("_qbucket"))
      .filter(col(idCol) =!= queryId)
      .select(col(idCol), cosine(col(vecCol), col("_qvec")).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }
}
