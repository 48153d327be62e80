package graft.dedup

import graft.Persisted
import graft.text.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines (north-star
  * extensions): exact hash dedup, word-n-gram Jaccard, MinHash+LSH,
  * SimHash. All shuffle on *content-derived keys* (hash / n-gram / band
  * bucket), never on document ids, so they scale horizontally: at 100 TB
  * the only all-pairs work happens inside hash buckets, whose size is
  * bounded by collision probability, not corpus size.
  */
object Dedup {

  // ---------------- exact dedup (hash-groupBy) ----------------

  /** One row per distinct text: content hash, surviving (minimum) id,
    * duplicate count. A single hash-partitioned aggregation — the scalable
    * groupBy formulation of `dropDuplicates(text)` that also reports
    * multiplicity.
    */
  def exactDuplicateGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol).cast("binary")).as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Keep exactly the minimum-id row per distinct text (full-row dedup). */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(md5(col(textCol).cast("binary"))).orderBy(col(idCol))
    df.withColumn("_graft_rn", row_number().over(w))
      .filter(col("_graft_rn") === 1)
      .drop("_graft_rn")
  }

  // ---------------- word n-gram shingles ----------------

  /** Distinct word n-gram shingles of a text column (1-based `slice`). */
  def wordNgrams(c: Column, n: Int): Column = {
    val t = TextFunctions.tokens(c)
    when(size(t) < n, array().cast("array<string>"))
      .otherwise(array_distinct(transform(
        sequence(lit(1), size(t) - (n - 1)),
        i => concat_ws(" ", slice(t, i, lit(n))))))
  }

  /** Exploded (id, shingle) pairs, distinct per document. */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("_id"), explode(wordNgrams(col(textCol), n)).as("ngram"))

  /** Exact n-gram Jaccard similarity join: all pairs with
    * jaccard >= tau. The join key is the shingle (content), so co-occurring
    * documents meet without any all-pairs scan; `maxDf` optionally drops
    * shingles present in more than that many documents (stop-shingle guard
    * against quadratic blowup on boilerplate at scale).
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int, tau: Double, maxDf: Option[Int] = None): DataFrame = {
    // the shingle relation feeds both join sides and the per-doc counts —
    // without persist Spark recomputes the explode 4x (no exchange reuse
    // across mixed broadcast/shuffle strategies)
    val ng = Persisted.track(shingles(df, idCol, textCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val ngFiltered = maxDf match {
      case Some(m) =>
        val keep = ng.groupBy(col("ngram")).count().filter(col("count") <= m)
          .select(col("ngram"))
        Persisted.track(ng.join(keep, Seq("ngram"), "left_semi")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      case None => ng
    }
    // per-doc counts over the SAME (filtered) shingle universe as the
    // intersection, so Jaccard is exact over that universe — mixing the
    // unfiltered denominator with a filtered numerator would systematically
    // underestimate similarity
    val cnt = ngFiltered.groupBy(col("_id")).agg(count(lit(1)).as("n_shingles"))
    val a = ngFiltered.select(col("_id").as("id_a"), col("ngram"))
    val b = ngFiltered.select(col("_id").as("id_b"), col("ngram"))
    val inter = a.hint("shuffle_hash").join(b.hint("shuffle_hash"), Seq("ngram"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(cnt.select(col("_id").as("id_a"), col("n_shingles").as("n_a")), Seq("id_a"))
      .join(cnt.select(col("_id").as("id_b"), col("n_shingles").as("n_b")), Seq("id_b"))
      .withColumn("jaccard",
        col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")))
      .filter(col("jaccard") >= tau)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  // ---------------- MinHash + LSH ----------------

  /** MinHash signatures: per document, the element-wise minimum of
    * `numHashes` seeded xxhash64 values over its shingles. One shuffle
    * (groupBy id); signature width is a constant column count.
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, numHashes: Int = 32): DataFrame = {
    val ng = shingles(df, idCol, textCol, n)
    val aggs = (0 until numHashes).map(i =>
      min(xxhash64(lit(i), col("ngram"))).as(s"_h$i"))
    ng.groupBy(col("_id"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("_id"),
        array((0 until numHashes).map(i => col(s"_h$i")): _*).as("signature"))
  }

  /** LSH banding: hash `rowsPerBand`-sized signature slices into band
    * buckets; documents sharing any (band, bucket) become candidate pairs.
    * The pair join is an equi-join on (band, bucket) — no all-pairs work.
    */
  def lshCandidatePairs(signatures: DataFrame, numHashes: Int, rowsPerBand: Int): DataFrame = {
    val numBands = numHashes / rowsPerBand
    val bandEntries = (0 until numBands).map { bIdx =>
      struct(lit(bIdx).as("band"),
        xxhash64(lit(bIdx), slice(col("signature"), bIdx * rowsPerBand + 1, rowsPerBand))
          .as("bucket"))
    }
    val buckets = signatures
      .select(col("_id"), explode(array(bandEntries: _*)).as("bb"))
      .select(col("_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    buckets.as("x").join(buckets.as("y"), Seq("band", "bucket"))
      .select(col("x._id").as("id_a"), col("y._id").as("id_b"))
      .filter(col("id_a") < col("id_b"))
      .distinct()
  }

  /** Near-duplicate pairs: LSH candidates verified with *exact* n-gram
    * Jaccard (so precision is exact; recall is the LSH banding guarantee —
    * with 16 bands x 2 rows, a pair at jaccard 0.9 is missed with
    * probability (1-0.9^2)^16 ~ 3e-12).
    */
  def minhashNearDuplicates(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, tau: Double = 0.8,
      numHashes: Int = 32, rowsPerBand: Int = 2): DataFrame = {
    val ng = Persisted.track(shingles(df, idCol, textCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val aggs = (0 until numHashes).map(i =>
      min(xxhash64(lit(i), col("ngram"))).as(s"_h$i"))
    val sigs = ng.groupBy(col("_id"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("_id"),
        array((0 until numHashes).map(i => col(s"_h$i")): _*).as("signature"))
    val cand = lshCandidatePairs(sigs, numHashes, rowsPerBand)
    val cnt = ng.groupBy(col("_id")).agg(count(lit(1)).as("n_shingles"))
    // intersection sizes via an equi-join on (id, ngram): the second join
    // keys on BOTH the doc id and the shingle, so per candidate pair we
    // stream |shingles(a)| probe rows — never the |a| x |b| cross product a
    // join-on-id-then-filter shape would materialize
    val inter = cand
      .join(ng.select(col("_id").as("id_a"), col("ngram")), Seq("id_a"))
      .join(ng.select(col("_id").as("id_b"), col("ngram")), Seq("id_b", "ngram"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(cnt.select(col("_id").as("id_a"), col("n_shingles").as("n_a")), Seq("id_a"))
      .join(cnt.select(col("_id").as("id_b"), col("n_shingles").as("n_b")), Seq("id_b"))
      .withColumn("jaccard",
        col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")))
      .filter(col("jaccard") >= tau)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  // ---------------- duplicate groups (connected components) ----------------

  private def undirectedEdges(pairs: DataFrame, idA: String, idB: String): DataFrame =
    pairs.select(col(idA).as("src"), col(idB).as("dst"))
      .union(pairs.select(col(idB).as("src"), col(idA).as("dst")))
      .distinct()

  private def propagateOnce(labels: DataFrame, edges: DataFrame): DataFrame = {
    // min over {self} ∪ neighbors as ONE aggregation: the neighbor labels
    // (dst's label keyed by src) union the node's own row, then a single
    // min-groupBy — two shuffles per iteration instead of the three a
    // join + groupBy + left-join-back shape costs (iteration count times
    // stage latency is what label propagation pays at any scale)
    val nbr = edges
      .join(labels, edges("dst") === labels("_id"))
      .select(col("src").as("_id"), col("group_id"))
    nbr.unionByName(labels)
      .groupBy(col("_id")).agg(min(col("group_id")).as("group_id"))
  }

  /** Resolve near-dup *pairs* into duplicate *groups*: connected
    * components by min-label propagation (each node adopts the minimum
    * label among itself and its neighbors). Returns (_id, group_id) with
    * group_id = the component's minimum member id — the canonical
    * "survivor".
    *
    * This variant unrolls a FIXED number of iterations into one lazy plan
    * — a single Spark job, no driver-side actions. Exact when the
    * component graph diameter <= iterations; near-dup components are
    * shallow (pairs and small stars), so the default covers them with
    * slack. For graphs of unknown diameter use
    * [[duplicateGroupsConverged]].
    */
  def duplicateGroups(pairs: DataFrame, idA: String = "id_a", idB: String = "id_b",
      iterations: Int = 6): DataFrame = {
    // pairs may be an expensive upstream plan (e.g. the full MinHash
    // pipeline); undirectedEdges references it twice, and a lazy persist
    // would let the two union branches RACE to populate the cache —
    // computing the upstream twice concurrently. Materialize once, then
    // fan out from the cache.
    val p = Persisted.track(pairs
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    p.count()
    val edges = Persisted.track(undirectedEdges(p, idA, idB)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    var labels = edges.select(col("src").as("_id")).distinct()
      .withColumn("group_id", col("_id"))
    (0 until iterations).foreach(_ => labels = propagateOnce(labels, edges))
    labels
  }

  /** Convergence-checked label propagation for graphs of unknown diameter:
    * iterates until a fixpoint (checked with a limit-1 existence probe, no
    * data collected), up to `maxIterations`.
    */
  def duplicateGroupsConverged(pairs: DataFrame, idA: String = "id_a",
      idB: String = "id_b", maxIterations: Int = 20): DataFrame = {
    val p = Persisted.track(pairs
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val edges = Persisted.track(undirectedEdges(p, idA, idB)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    var labels = edges.select(col("src").as("_id")).distinct()
      .withColumn("group_id", col("_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIterations) {
      val updated = propagateOnce(labels, edges)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val changed = updated
        .join(labels.withColumnRenamed("group_id", "_old"), Seq("_id"))
        .filter(col("group_id") =!= col("_old")).limit(1).count()
      labels.unpersist(false) // superseded iteration state
      labels = updated
      converged = changed == 0
      iter += 1
    }
    Persisted.track(labels)
  }

  /** Adaptive connected components: the near-dup pair set is orders of
    * magnitude smaller than the corpus (it is the duplicates, not the
    * data), so when its materialized count fits comfortably on the driver
    * we solve components EXACTLY with an in-memory union-find and ship the
    * result back as a broadcastable relation — no iteration count to
    * tune, no per-iteration shuffle latency. Pair sets above the threshold
    * fall back to distributed label propagation. Both paths return
    * (_id, group_id = component minimum).
    */
  def duplicateGroupsAuto(pairs: DataFrame, idA: String = "id_a",
      idB: String = "id_b", maxDriverPairs: Long = 4L * 1000 * 1000,
      fallbackIterations: Int = 6): DataFrame = {
    val p = Persisted.track(pairs
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    if (p.count() <= maxDriverPairs) {
      val edges = p.select(col(idA).cast("long"), col(idB).cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val parent = scala.collection.mutable.LongMap.empty[Long]
      def find(x: Long): Long = {
        var root = x
        while (parent.getOrElse(root, root) != root) root = parent(root)
        var cur = x // path compression
        while (parent.getOrElse(cur, cur) != root) {
          val next = parent(cur); parent(cur) = root; cur = next
        }
        root
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { // union by MIN root: group id = component minimum
          if (ra < rb) parent(rb) = ra else parent(ra) = rb
        }
      }
      val nodes = edges.iterator.flatMap(e => Iterator(e._1, e._2)).toSeq.distinct
      val spark = pairs.sparkSession
      import spark.implicits._
      nodes.map(x => (x, find(x))).toDF("_id", "group_id")
    } else duplicateGroups(p, idA, idB, fallbackIterations)
  }

  /** End-to-end near-dup removal: MinHash near-dup pairs -> connected
    * components -> keep each group's minimum id. Returns the surviving
    * rows of `df`.
    */
  def nearDedup(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, tau: Double = 0.8): DataFrame = {
    val pairs = minhashNearDuplicates(df, idCol, textCol, n, tau)
    val groups = duplicateGroupsAuto(pairs)
    val losers = groups.filter(col("_id") =!= col("group_id"))
      .select(col("_id").as("_graft_loser"))
    // no broadcast hint: the loser set is the duplicate population, which
    // at scale can be a large fraction of the corpus — let AQE pick
    df.join(losers, df(idCol) === col("_graft_loser"), "left_anti")
  }

  // ---------------- SimHash ----------------

  /** 64-bit SimHash over distinct tokens: per bit, the sign of the sum of
    * +/-1 contributions from each token's xxhash64 bit. One groupBy with 64
    * integer sums — constant-width state, scan-speed at scale.
    */
  def simhash64(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.select(col(idCol).as("_id"),
      explode(array_distinct(TextFunctions.tokens(col(textCol)))).as("token"))
      .withColumn("_h", xxhash64(col("token")))
    val bitSums = (0 until 64).map(b =>
      sum(when(shiftright(col("_h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"_b$b"))
    val fingerprint = (0 until 64).map(b =>
      when(col(s"_b$b") > 0, shiftleft(lit(1L), b)).otherwise(lit(0L)))
      .reduce((x, y) => x.bitwiseOR(y))
    tok.groupBy(col("_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("_id"), fingerprint.as("simhash"))
  }

  /** [[simhash64]] as a single codegen'd scan-speed expression (see
    * [[SimHashExpr]]) — bit-identical output, no token shuffle.
    */
  def simhash64Fast(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("_id"),
      SimHashExpr.simhashCol(col(textCol)).as("simhash"))

  /** SimHash near-dup candidates: pairs within `maxHamming` bits. Pair
    * generation via byte-block banding (split the 64-bit hash into 8
    * bytes; pigeonhole: any pair within k bits shares >= 8-k exact byte
    * blocks) — an equi-join on (block index, block value), no all-pairs.
    */
  def simhashPairs(hashes: DataFrame, maxHamming: Int = 3): DataFrame = {
    val blocks = (0 until 8).map(i =>
      struct(lit(i).as("blk"),
        shiftright(col("simhash"), i * 8).bitwiseAND(0xFF).as("blkval")))
    val exploded = hashes.select(col("_id"), col("simhash"),
      explode(array(blocks: _*)).as("bb"))
      .select(col("_id"), col("simhash"), col("bb.blk").as("blk"), col("bb.blkval").as("blkval"))
    exploded.as("x").join(exploded.as("y"), Seq("blk", "blkval"))
      .select(col("x._id").as("id_a"), col("y._id").as("id_b"),
        col("x.simhash").as("sh_a"), col("y.simhash").as("sh_b"))
      .filter(col("id_a") < col("id_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }
}
