package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic derivations of the GBIF data model (FIXTURES.md §3) from
  * the driver's shared TPC-H-ish tables (TESTDATA.md), so every reference
  * operator can be exercised against `/root/testdata` *and* checked by the
  * driver's DuckDB oracle: each derivation here has a textually-equivalent
  * SQL CTE in [[DerivedSql]], built from integer arithmetic and one-decimal
  * doubles only, so Spark and DuckDB produce bit-identical values.
  *
  *  - occurrence <- lineitem x nation (taxonKey, lat/lon grid, country, rank)
  *  - backbone   <- part (key, unique-ish canonical name, rank/kingdom/
  *    status/acceptedKey/lineage/habitat from key arithmetic)
  *  - taxa       <- customer (input table with name/taxid/rank columns,
  *    nulls sprinkled to exercise the tri-state path)
  */
object DerivedModel {

  /** Zone used by derived-model queries (G2). */
  val Country = "NATION_7"

  /** Diamond |lon+90.05| + |lat-10.05| <= 30.001, centered where the
    * derived lon grid actually has data (the raw grid never wraps past
    * lon -18 at small SFs), so G1 selects thousands of rows at every SF.
    * Vertices chosen so no derived grid point (one-decimal lat/lon) lies
    * within 1e-3 of an edge — Spark's ray-cast and DuckDB's arithmetic
    * predicate can't disagree on any point (SURVEY.md §7.5.3 determinism
    * note).
    */
  val DiamondWkt: String =
    "POLYGON ((-60.049 10.05, -90.05 40.051, -120.051 10.05, -90.05 -19.951, -60.049 10.05))"
  val DiamondSqlPred: String =
    "abs(decimalLongitude + 90.05) + abs(decimalLatitude - 10.05) <= 30.001"

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The events table has shipped both TIMESTAMP(NANOS) parquet (which
    * Spark rejects by default — read via
    * `spark.sql.legacy.parquet.nanosAsLong=true` as a long, then convert
    * to a micros timestamp; lossless, the generator emits micro-precision
    * values) and TIMESTAMP(MICROS, isAdjustedToUTC=false) parquet, which
    * Spark reads as TIMESTAMP_NTZ — cast to TIMESTAMP (all graft sessions
    * pin `spark.sql.session.timeZone=UTC`, so the cast is value-preserving
    * and watermarks/window functions accept the column). Adapt on the
    * observed schema so both generations of `/root/testdata` work.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val df = table(spark, dir, "events")
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => df
      // a THIRD testdata schema generation (e.g. STRING or INT96) must
      // fail fast at the read site — a silent fall-through is exactly the
      // r7 regression mode where 18 downstream queries erred unnoticed
      case other => sys.error(
        s"events.ts has unexpected type $other (expected nanos-as-long, " +
          "TIMESTAMP_NTZ, or TIMESTAMP); update DerivedModel.events for " +
          "the new testdata schema generation")
    }
  }

  /** The embeddings table augmented with deterministically planted
    * near-duplicates: every 10th vector gets a copy (id + 1,000,000)
    * perturbed by at most 3e-3 per component. The raw table's pairs at
    * cosine >= 0.4 are just the tail of the random-pair distribution
    * (measured: min in-set 0.40002, max out-of-set 0.39989 — NO
    * similarity gap), which makes bucketed LSH information-theoretically
    * useless there: recall 1.0 at a no-gap threshold needs more
    * candidates than the exact join. Real embedding dedup runs at
    * tau >= 0.9 against corpora with true near-identical vectors — this
    * derivation reproduces that regime (planted pairs at cosine
    * >= 0.9998, background <= 0.61) so the LSH pair path can be gated
    * against the exact pair-set oracle, the same pattern as
    * MinHash ≡ exact Jaccard.
    *
    * Every arithmetic step (int modular arithmetic, exact small-integer
    * subtraction, one IEEE multiply, one IEEE add) is bit-reproducible in
    * DuckDB, so the oracle replays the augmentation exactly.
    */
  def embeddingsAugmented(spark: SparkSession, dir: String): DataFrame = {
    val base = table(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val planted = base.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + lit(1000000L)).as("vec_id"),
        expr("transform(embedding, (x, i) -> " +
          "x + (CAST((vec_id * 31 + CAST(i AS BIGINT)) % 7 AS DOUBLE) - 3.0) * 0.001)")
          .as("embedding"))
    base.unionByName(planted)
  }

  /** Documents with deterministically planted PII-shaped strings (the
    * synthetic corpus has none — a redaction query over it would be a
    * no-op masquerading as coverage). Email / US-phone / SSN shapes are
    * appended from pure integer-mod + lpad + concat arithmetic, so the
    * DuckDB oracle replays the planting exactly ([[DerivedSql
    * .documentsPii]]) and the redaction gate checks real rewrites.
    */
  def documentsWithPii(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents").select(col("doc_id"),
      concat(col("text"),
        when(col("doc_id") % 5 === 0,
          concat(lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com"))).otherwise(lit("")),
        when(col("doc_id") % 7 === 0,
          concat(lit(" call 415-555-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0"))).otherwise(lit("")),
        when(col("doc_id") % 11 === 0,
          concat(lit(" ssn "),
            ((col("doc_id") * 7) % 900 + 100).cast("string"), lit("-"),
            (col("doc_id") % 90 + 10).cast("string"), lit("-"),
            lpad(((col("doc_id") * 13) % 10000).cast("string"), 4, "0")))
          .otherwise(lit(""))).as("text"))

  /** Documents with deterministically planted page artifacts — the raw
    * corpus is punctuation-free word soup, so every C4/Gopher-style rule
    * would fire identically on all rows (a filter gate over it would be
    * degenerate). Terminal punctuation, boilerplate phrases and a code
    * fragment are appended from pure doc_id-mod arithmetic, so the DuckDB
    * oracle replays the planting exactly ([[DerivedSql
    * .documentsBoilerplate]]) and the rule gate checks real keep/drop
    * decisions (~25% of rows gain terminal punctuation; 13/17/23-mod
    * subsets gain boilerplate / lorem-ipsum / braces).
    */
  /** The planted marker phrases keyed by their id-moduli — the SINGLE
    * source for the fixture ([[documentsBoilerplate]]), its SQL twin
    * ([[DerivedSql.documentsBoilerplate]]), and the classifier class
    * split ([[boilerplateClassPred]] / [[DerivedSql
    * .boilerplateClassPred]]): the split and the planting must never
    * drift apart, or the classifier trains on a different universe than
    * the oracle replays.
    */
  val BoilerplateMarkers: Seq[(Int, String)] = Seq(
    17 -> " lorem ipsum dolor sit amet",
    13 -> " click here to subscribe now",
    23 -> " function f() { return 1; }")

  /** True for docs carrying at least one planted marker — the negative
    * (boilerplate) class of the supervised quality-classifier gates.
    */
  def boilerplateClassPred: org.apache.spark.sql.Column =
    BoilerplateMarkers.map { case (m, _) => col("doc_id") % m === 0 }
      .reduce(_ || _)

  def documentsBoilerplate(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents").select(col("doc_id"), col("lang"),
      col("source"),
      concat(
        col("text") +: BoilerplateMarkers.map { case (m, phrase) =>
          when(col("doc_id") % m === 0, lit(phrase)).otherwise(lit(""))
        } :+ when(col("doc_id") % 4 === 0, lit(".")).otherwise(lit("")): _*)
        .as("text"))

  /** A deterministically perturbed second corpus snapshot for the
    * release-diff gate: every 31st doc removed, every 13th survivor's
    * text modified, a shifted copy of every 41st doc added under a new
    * id — so the diff output exercises all three statuses from pure
    * id-mod arithmetic the oracle replays.
    */
  def documentsSnapshotV2(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    val kept = docs.filter(col("doc_id") % 31 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 13 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")).as("text"),
        col("lang"), col("source"))
    val added = docs.filter(col("doc_id") % 41 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"),
        col("lang"), col("source"))
    kept.unionByName(added)
  }

  /** Planted deterministic link graph over the document-id space (the
    * corpus carries no hyperlinks, so a graph-centrality gate needs a
    * planted one, like the PII / boilerplate fixtures): every doc has
    * out-degree exactly 2 via two affine maps mod n over the contiguous
    * 0..n-1 id domain — no dangling nodes, dup/self edges allowed (they
    * are legal multigraph edges and keep out-degrees uniform). n rides a
    * broadcast 1-row count relation, the established stats-crossJoin
    * shape.
    */
  def linkGraph(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents").select(col("doc_id"))
    val n = docs.agg(count(lit(1)).as("_graft_n"))
    val withN = docs.crossJoin(broadcast(n))
    withN.select(col("doc_id").as("src"),
        ((col("doc_id") * 7 + 13) % col("_graft_n")).as("dst"))
      .unionByName(withN.select(col("doc_id").as("src"),
        ((col("doc_id") * 31 + 5) % col("_graft_n")).as("dst")))
  }

  /** [[linkGraph]] plus deterministically planted triangle closures:
    * every 25th doc closes the 3-cycle (d, d+1, d+2) mod n. The affine
    * link graph alone is triangle-free (verified at both SFs — affine
    * maps rarely close 3-cycles), so the closures give
    * [[graft.graph.Triangles]] a non-degenerate count (n/25 triangles)
    * while keeping the relation replayable in SQL
    * ([[DerivedSql.triangleGraphEdgesBody]]). */
  def triangleGraph(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents").select(col("doc_id"))
    val n = docs.agg(count(lit(1)).as("_graft_n"))
    val withN = docs.crossJoin(broadcast(n))
    val every25 = withN.filter(col("doc_id") % 25 === 0)
    linkGraph(spark, dir)
      .unionByName(every25.select(col("doc_id").as("src"),
        ((col("doc_id") + 1) % col("_graft_n")).as("dst")))
      .unionByName(every25.select(col("doc_id").as("src"),
        ((col("doc_id") + 2) % col("_graft_n")).as("dst")))
      .unionByName(every25.select(
        ((col("doc_id") + 1) % col("_graft_n")).as("src"),
        ((col("doc_id") + 2) % col("_graft_n")).as("dst")))
  }

  def occurrence(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .join(broadcast(table(spark, dir, "nation")),
        expr("l_suppkey % 25") === col("n_nationkey"))
      .selectExpr(
        "l_partkey % 500 AS taxonKey",
        "CAST(l_orderkey % 1800 AS DOUBLE) / 10.0 - 90.0 AS decimalLatitude",
        "CAST((l_suppkey * 7 + l_linenumber * 131) % 3600 AS DOUBLE) / 10.0 - 180.0 AS decimalLongitude",
        "n_name AS countryCode",
        "CASE l_linenumber % 3 WHEN 0 THEN 'SPECIES' WHEN 1 THEN 'GENUS' ELSE 'FAMILY' END AS taxonRank")

  def backbone(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "part").selectExpr(
      "p_partkey AS key",
      "concat(p_name, ' ', CAST(p_partkey % 40 AS STRING)) AS canonicalName",
      "CASE p_partkey % 4 WHEN 0 THEN 'SPECIES' WHEN 1 THEN 'GENUS' WHEN 2 THEN 'FAMILY' ELSE 'ORDER' END AS rank",
      "CASE p_partkey % 2 WHEN 0 THEN 'Animalia' ELSE 'Plantae' END AS kingdom",
      "CASE WHEN p_partkey % 5 = 0 THEN 'SYNONYM' ELSE 'ACCEPTED' END AS taxonomicStatus",
      "CASE WHEN p_partkey % 5 = 0 THEN (p_partkey + 1) % 2000 END AS acceptedKey",
      "array(p_partkey % 100, p_partkey % 10) AS higherTaxonKeys",
      "CASE p_partkey % 3 WHEN 0 THEN 'TERRESTRIAL' WHEN 1 THEN 'FRESHWATER' ELSE 'MARINE' END AS habitat")

  def taxa(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "customer")
      .join(table(spark, dir, "part"),
        expr("(c_custkey * 7) % 2000") === col("p_partkey"), "left")
      .selectExpr(
        "c_custkey AS row_id",
        "CASE WHEN c_custkey % 10 = 0 THEN NULL ELSE concat(p_name, ' ', CAST(p_partkey % 40 AS STRING)) END AS name",
        "CASE WHEN c_custkey % 7 = 0 THEN CAST((c_custkey * 13) % 500 AS STRING) END AS taxid",
        "CASE WHEN c_custkey % 3 = 0 THEN (CASE p_partkey % 4 WHEN 0 THEN 'SPECIES' WHEN 1 THEN 'GENUS' WHEN 2 THEN 'FAMILY' ELSE 'ORDER' END) END AS rank")
}

/** DuckDB-dialect CTEs mirroring [[DerivedModel]] exactly. Compose with
  * [[DerivedSql.withCtes]]. The driver registers each parquet file as a
  * table named after it (lineitem, nation, part, customer, ...).
  */
object DerivedSql {

  val occurrence: String =
    """occurrence AS (
      |  SELECT l_partkey % 500 AS taxonKey,
      |         CAST(l_orderkey % 1800 AS DOUBLE) / 10.0 - 90.0 AS decimalLatitude,
      |         CAST((l_suppkey * 7 + l_linenumber * 131) % 3600 AS DOUBLE) / 10.0 - 180.0 AS decimalLongitude,
      |         n_name AS countryCode,
      |         CASE l_linenumber % 3 WHEN 0 THEN 'SPECIES' WHEN 1 THEN 'GENUS' ELSE 'FAMILY' END AS taxonRank
      |  FROM lineitem JOIN nation ON l_suppkey % 25 = n_nationkey)""".stripMargin

  val backbone: String =
    """backbone AS (
      |  SELECT p_partkey AS key,
      |         p_name || ' ' || CAST(p_partkey % 40 AS VARCHAR) AS canonicalName,
      |         CASE p_partkey % 4 WHEN 0 THEN 'SPECIES' WHEN 1 THEN 'GENUS' WHEN 2 THEN 'FAMILY' ELSE 'ORDER' END AS rank,
      |         CASE p_partkey % 2 WHEN 0 THEN 'Animalia' ELSE 'Plantae' END AS kingdom,
      |         CASE WHEN p_partkey % 5 = 0 THEN 'SYNONYM' ELSE 'ACCEPTED' END AS taxonomicStatus,
      |         CASE WHEN p_partkey % 5 = 0 THEN (p_partkey + 1) % 2000 END AS acceptedKey,
      |         CASE p_partkey % 3 WHEN 0 THEN 'TERRESTRIAL' WHEN 1 THEN 'FRESHWATER' ELSE 'MARINE' END AS habitat
      |  FROM part)""".stripMargin

  val taxa: String =
    """taxa AS (
      |  SELECT c_custkey AS row_id,
      |         CASE WHEN c_custkey % 10 = 0 THEN NULL ELSE p_name || ' ' || CAST(p_partkey % 40 AS VARCHAR) END AS name,
      |         CASE WHEN c_custkey % 7 = 0 THEN CAST((c_custkey * 13) % 500 AS VARCHAR) END AS taxid,
      |         CASE WHEN c_custkey % 3 = 0 THEN (CASE p_partkey % 4 WHEN 0 THEN 'SPECIES' WHEN 1 THEN 'GENUS' WHEN 2 THEN 'FAMILY' ELSE 'ORDER' END) END AS rank
      |  FROM customer LEFT JOIN part ON (c_custkey * 7) % 2000 = p_partkey)""".stripMargin

  /** Twin of [[DerivedModel.documentsWithPii]]. */
  val documentsPii: String =
    """documents_pii AS (
      |  SELECT doc_id,
      |    text ||
      |    CASE WHEN doc_id % 5 = 0
      |      THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
      |      ELSE '' END ||
      |    CASE WHEN doc_id % 7 = 0
      |      THEN ' call 415-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
      |      ELSE '' END ||
      |    CASE WHEN doc_id % 11 = 0
      |      THEN ' ssn ' || CAST((doc_id * 7) % 900 + 100 AS VARCHAR)
      |        || '-' || CAST(doc_id % 90 + 10 AS VARCHAR)
      |        || '-' || lpad(CAST((doc_id * 13) % 10000 AS VARCHAR), 4, '0')
      |      ELSE '' END AS text
      |  FROM documents)""".stripMargin

  /** Twin of [[DerivedModel.documentsBoilerplate]], generated from the
    * same [[DerivedModel.BoilerplateMarkers]] constant.
    */
  val documentsBoilerplate: String = {
    val markers = DerivedModel.BoilerplateMarkers.map { case (m, phrase) =>
      s"    CASE WHEN doc_id % $m = 0 THEN '${phrase.replace("'", "''")}' ELSE '' END ||"
    }.mkString("\n")
    s"""documents_boiler AS (
       |  SELECT doc_id, lang, source,
       |    text ||
       |$markers
       |    CASE WHEN doc_id % 4 = 0 THEN '.' ELSE '' END AS text
       |  FROM documents)""".stripMargin
  }

  /** SQL form of [[DerivedModel.boilerplateClassPred]]. */
  val boilerplateClassPred: String =
    DerivedModel.BoilerplateMarkers
      .map { case (m, _) => s"doc_id % $m = 0" }.mkString(" OR ")

  /** Twin of [[DerivedModel.documentsSnapshotV2]]. */
  val documentsSnapshotV2: String =
    """documents_v2 AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 13 = 0 THEN text || ' v2' ELSE text END AS text,
      |    lang, source
      |  FROM documents WHERE doc_id % 31 <> 0
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id, text, lang, source
      |  FROM documents WHERE doc_id % 41 = 0)""".stripMargin

  /** Twin of [[DerivedModel.linkGraph]] — a CTE BODY (no name) for
    * [[graft.graph.PageRank.pageRankSql]]'s `edgesCte` slot.
    */
  val linkGraphEdgesBody: String =
    """SELECT doc_id AS src, (doc_id * 7 + 13) % n AS dst
      |  FROM documents, (SELECT count(*) AS n FROM documents)
      |UNION ALL
      |SELECT doc_id AS src, (doc_id * 31 + 5) % n AS dst
      |  FROM documents, (SELECT count(*) AS n FROM documents)""".stripMargin

  /** Twin of [[DerivedModel.triangleGraph]]. */
  val triangleGraphEdgesBody: String =
    s"""$linkGraphEdgesBody
       |UNION ALL
       |SELECT doc_id AS src, (doc_id + 1) % n AS dst
       |  FROM documents, (SELECT count(*) AS n FROM documents) WHERE doc_id % 25 = 0
       |UNION ALL
       |SELECT doc_id AS src, (doc_id + 2) % n AS dst
       |  FROM documents, (SELECT count(*) AS n FROM documents) WHERE doc_id % 25 = 0
       |UNION ALL
       |SELECT (doc_id + 1) % n AS src, (doc_id + 2) % n AS dst
       |  FROM documents, (SELECT count(*) AS n FROM documents) WHERE doc_id % 25 = 0""".stripMargin

  /** Strict name resolution (J1 semantics, TaxonomyResolver scaladoc):
    * unique-candidate match with rank constraint, synonym chase, taxid
    * precedence. Depends on `taxa` + `backbone` CTEs. Emits CTE `resolved`
    * with (row_id, name, taxid, rank, resolved_taxid, resolved_rank).
    */
  val resolved: String =
    """cand AS (
      |  SELECT t.row_id, b.key, b.rank AS brank, b.taxonomicStatus AS bstatus, b.acceptedKey AS bacc
      |  FROM taxa t JOIN backbone b ON t.name = b.canonicalName
      |    AND (t.rank IS NULL OR t.rank = b.rank)
      |  WHERE t.taxid IS NULL AND t.name IS NOT NULL),
      |uniq AS (
      |  SELECT row_id, count(*) AS cnt, min(key) AS mkey, min(brank) AS mrank,
      |         min(bstatus) AS mstatus, min(bacc) AS macc
      |  FROM cand GROUP BY row_id),
      |resolved AS (
      |  SELECT t.row_id, t.name, t.taxid, t.rank,
      |         COALESCE(CAST(t.taxid AS BIGINT),
      |                  CASE WHEN u.cnt = 1 THEN
      |                    CASE WHEN u.mstatus = 'SYNONYM' THEN u.macc ELSE u.mkey END END) AS resolved_taxid,
      |         CASE WHEN t.taxid IS NOT NULL THEN t.rank
      |              WHEN u.cnt = 1 THEN u.mrank END AS resolved_rank
      |  FROM taxa t LEFT JOIN uniq u ON t.row_id = u.row_id)""".stripMargin

  def withCtes(ctes: String*)(body: String): String =
    "WITH " + ctes.mkString(",\n") + "\n" + body
}
