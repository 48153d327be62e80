package graft.ops

import graft.config.FilterConfig
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** J1 name-resolution join (SURVEY.md §2.3): the Spark-shaped version of
  * `GbifHelper.get_valid_taxid` (`gbif_helper.py:11-32`) + the per-row
  * normalization of `apply_gbif_filter.py:117-131` (P2/P3/P4) + the memo
  * cache C1 (`id_cache`) which becomes a `distinct()` on the join keys.
  *
  * Semantics preserved from the reference:
  *  - a pre-supplied taxid wins over the name and passes through
  *    *unvalidated* (`gbif_helper.py:12-13`, acknowledged TODO);
  *  - names match the backbone exactly (strict mode, `gbif_helper.py:18`);
  *    an ambiguous name — more than one candidate after the rank/kingdom
  *    constraints — resolves to null, like GBIF strict matching;
  *  - synonyms chase to `acceptedUsageKey` (`gbif_helper.py:22-24`);
  *  - the resolved rank is the *matched* backbone rank
  *    (`gbif_helper.py:25-29`); for taxid passthrough it is the caller's
  *    rank hint, unvalidated.
  *
  * Scale notes: the candidate join runs on `distinct (name, rank)` keys —
  * cardinality bounded by the backbone (~10^7 rows), not the input
  * (~10^11 rows at 100 TB). The backbone side is projected to 6 columns
  * before joining and broadcast when `broadcastDims` (default); with very
  * large backbones disable it and let AQE pick a shuffle join.
  */
object TaxonomyResolver {

  val TaxidCol = "_graft_taxid"
  val RankCol = "_graft_rank"
  private val NameKey = "_graft_name_key"
  private val RankKey = "_graft_rank_key"

  /** L1 (`util/taxid.pyc`, SURVEY.md §2.7): accept both bare numeric ids and
    * `PREFIX:ID` strings (e.g. `GBIF:2433670`); anything else → null.
    */
  private def parseTaxid(c: org.apache.spark.sql.Column) = {
    val digits = regexp_extract(trim(c), "^(?:[A-Za-z]+:)?([0-9]+)$", 1)
    when(digits =!= "", digits.cast("long"))
  }

  /** Adds `_graft_taxid` (long, null = unresolved) and `_graft_rank`
    * (string) to `input`, resolving via `backbone`.
    */
  def resolve(input: DataFrame, backbone: DataFrame, cfg: FilterConfig,
      broadcastDims: Boolean = true): DataFrame = {
    // P2 null-normalize + P3 rank-uppercase + L1 taxid parse
    val nameExpr = cfg.nameColumn.map(c => {
      val t = trim(col(c)); when(t =!= "", t)
    }).getOrElse(lit(null).cast("string"))
    val taxidExpr = cfg.taxidColumn.map(c => parseTaxid(col(c)))
      .getOrElse(lit(null).cast("long"))
    val rankExpr = cfg.rankColumn.map(c => upper(trim(col(c))))
      .orElse(cfg.taxaRank.map(r => lit(r.toUpperCase(java.util.Locale.ROOT)).cast("string")))
      .getOrElse(lit(null).cast("string"))

    val keyed = input
      .withColumn(NameKey, nameExpr)
      .withColumn("_graft_taxid_in", taxidExpr)
      .withColumn(RankKey, rankExpr)

    // C1: distinct lookup keys — the Spark version of `id_cache`
    // (`apply_gbif_filter.py:108,127-131`), without the str/int cache-miss
    // bug (SURVEY.md §7.5.4).
    val names = keyed
      .filter(col("_graft_taxid_in").isNull && col(NameKey).isNotNull)
      .select(NameKey, RankKey)
      .distinct()

    val bb0 = backbone.select(
      col("key"), col("canonicalName"), upper(col("rank")).as("_bb_rank"),
      col("kingdom"), col("taxonomicStatus"), col("acceptedKey"))
    val bb1 = cfg.taxaKingdom
      .map(k => bb0.filter(col("kingdom") === lit(k)))
      .getOrElse(bb0)
    val bb = if (broadcastDims) broadcast(bb1) else bb1

    // strict match: exact canonical name, rank constraint when hinted
    val cand = names.join(bb,
      col(NameKey) === col("canonicalName") &&
        (col(RankKey).isNull || col(RankKey) === col("_bb_rank")),
      "inner")

    // exactly-one-candidate = EXACT; synonym chases to acceptedKey
    val lookup = cand
      .groupBy(NameKey, RankKey)
      .agg(count(lit(1)).as("_cnt"),
        min(struct(col("key"), col("_bb_rank"), col("taxonomicStatus"),
          col("acceptedKey"))).as("_m"))
      .filter(col("_cnt") === 1)
      // fresh aliases: the lookup side derives from `keyed`, so reusing the
      // key names would make the join condition self-referential
      .select(col(NameKey).as("_lk_name"), col(RankKey).as("_lk_rank"),
        when(col("_m.taxonomicStatus") === "SYNONYM", col("_m.acceptedKey"))
          .otherwise(col("_m.key")).as("_graft_name_taxid"),
        col("_m._bb_rank").as("_graft_name_rank"))

    val lookupSide = if (broadcastDims) broadcast(lookup) else lookup
    keyed
      .join(lookupSide,
        col(NameKey) === col("_lk_name") && col(RankKey) <=> col("_lk_rank"),
        "left")
      .drop("_lk_name", "_lk_rank")
      // P4 precedence-coalesce (`apply_gbif_filter.py:123`): taxid wins
      .withColumn(TaxidCol, coalesce(col("_graft_taxid_in"), col("_graft_name_taxid")))
      .withColumn(RankCol,
        when(col("_graft_taxid_in").isNotNull, col(RankKey))
          .otherwise(col("_graft_name_rank")))
      .drop(NameKey, RankKey, "_graft_taxid_in", "_graft_name_taxid", "_graft_name_rank")
  }
}
