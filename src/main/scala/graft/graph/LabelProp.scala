package graft.graph

import graft.Persisted
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Community detection by synchronous label propagation (Raghavan et al.
  * 2007; the GraphX/GraphFrames `labelPropagation` operator) — the
  * corpus-clustering companion to [[PageRank]]: group documents/domains by
  * link structure so curation can sample, cap, or audit per community
  * rather than per row.
  *
  * Every step is integer arithmetic on node ids, so the gate replays
  * bit-for-bit in the DuckDB oracle:
  *
  *  - labels start as the node's own id;
  *  - one round re-labels every node with the most frequent label among
  *    its neighbors (edges symmetrized: a link relates both endpoints),
  *    ties broken by the SMALLEST label id — the deterministic variant of
  *    the usual random tie-break;
  *  - a node with no neighbors keeps its own label (unreachable on the
  *    planted 2-out-regular gate graph, but the left join keeps the
  *    operator total).
  *
  * Synchronous updates can oscillate on bipartite structures (the classic
  * LPA caveat; same period-2 note as the PageRank star gotcha) — a FIXED
  * iteration count makes the output deterministic either way, which is
  * what the gate needs; callers wanting convergence run more rounds and
  * compare consecutive label vectors.
  *
  * Scale design mirrors [[PageRank.pageRank]]: the symmetrized edge list
  * is repartitioned by the join key and persisted ONCE, so each round's
  * join reuses the cached partitioning and only the skinny (node, label)
  * relation shuffles; per round the wide ops are that join plus two
  * map-side-combinable aggregations ((node, label) counts, then per-node
  * argmax as ONE max-of-struct agg — not a window, so no per-node sort).
  * Label lineage is cut with `localCheckpoint` per round (plan growth is
  * the iterative failure mode, the PageRank lesson), the last round left
  * lazy for the caller to materialize.
  */
object LabelProp {

  /** Propagate `iters` rounds over `edges` (src, dst) for node set
    * `nodes` (one column `node`, ids unique and non-negative — the
    * argmax encodes "smallest label" as max(-label), which needs the
    * sign to be uniform). Returns (node, label).
    */
  def labelPropagate(nodes: DataFrame, edges: DataFrame,
      iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 64, "iters in [1, 64]")
    val sym = Persisted.track(
      edges.select(col("src"), col("dst"))
        .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
        .repartition(col("src"))
        .persist(StorageLevel.MEMORY_AND_DISK))
    var labels = nodes.select(col("node"), col("node").as("label"))
    for (it <- 1 to iters) {
      val contribs = sym
        .join(labels, sym("src") === labels("node"))
        .select(sym("dst").as("node"), col("label"))
      val counts = contribs
        .groupBy(col("node"), col("label"))
        .agg(count(lit(1)).as("_c"))
      // per-node argmax by (count desc, label asc) as one agg: struct
      // comparison is lexicographic, so max(struct(c, -label)) picks the
      // highest count, then the smallest label — map-side combinable,
      // no per-node sort, no window
      val winners = counts
        .groupBy(col("node"))
        .agg(max(struct(col("_c").as("c"), (-col("label")).as("nl")))
          .as("_m"))
        .select(col("node"), (-col("_m.nl")).as("label"))
      labels = nodes
        .join(winners, Seq("node"), "left")
        .select(col("node"), coalesce(col("label"), col("node")).as("label"))
      // lazy: lineage still cut per round, but materialization happens
      // inside the caller's one action instead of one driver job per
      // round (see PageRank — same r17 change, measured there)
      if (it < iters) labels = labels.localCheckpoint(false)
    }
    labels
  }

  /** DuckDB twin of [[labelPropagate]]: `iters` unrolled rounds, each a
    * MATERIALIZED count CTE plus max/argmin CTEs (the two-step max(c) →
    * min(label among maxima) states the tie-break without relying on
    * cross-engine struct-comparison semantics). Callers supply the
    * `nodes(node)` / `edges(src, dst)` CTE bodies.
    */
  def labelPropagateSql(nodesCte: String, edgesCte: String,
      iters: Int): String = {
    val iterCtes = (1 to iters).map { k =>
      val p = k - 1
      s"""c$k AS MATERIALIZED (
         |  SELECT s.dst AS node, l.label, CAST(count(*) AS BIGINT) AS c
         |  FROM sym s JOIN l$p l ON s.src = l.node
         |  GROUP BY s.dst, l.label),
         |m$k AS (SELECT node, max(c) AS mc FROM c$k GROUP BY node),
         |w$k AS (
         |  SELECT c.node, min(c.label) AS label
         |  FROM c$k c JOIN m$k m ON c.node = m.node AND c.c = m.mc
         |  GROUP BY c.node),
         |l$k AS MATERIALIZED (
         |  SELECT n.node, COALESCE(w.label, n.node) AS label
         |  FROM nodes n LEFT JOIN w$k w ON n.node = w.node)""".stripMargin
    }
    s"""WITH nodes AS MATERIALIZED ($nodesCte),
       |edges AS MATERIALIZED ($edgesCte),
       |sym AS MATERIALIZED (
       |  SELECT src, dst FROM edges
       |  UNION ALL SELECT dst AS src, src AS dst FROM edges),
       |l0 AS (SELECT node, node AS label FROM nodes),
       |${iterCtes.mkString(",\n")}
       |SELECT node, label FROM l$iters""".stripMargin
  }
}
