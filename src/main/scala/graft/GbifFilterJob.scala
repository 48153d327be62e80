package graft

import graft.config.FilterConfig
import graft.ops.{OccurrenceFilter, OutputShaper, RankResolver, TaxonomyResolver}
import org.apache.spark.sql.DataFrame

/** End-to-end pipeline — the declarative DAG replacing the reference's
  * row-at-a-time driver loop (`apply_gbif_filter.py:74-192`, SURVEY.md §3.1):
  *
  * {{{
  * scan → J1 broadcast name-resolution → J2 zone-existence join (G1/G2)
  *      → [J3/J4/A1 children resolution] → T1/T2 shaping → [F1] → sink
  * }}}
  *
  * The reference's per-row HTTP round-trips (`gbif_helper.py:17,35,86`)
  * become Spark stages; its memo caches become `distinct()`s on join keys;
  * Catalyst/AQE pick physical join strategies. One DataFrame in, one out —
  * sources and sinks stay at the edges (graft.sources.Sources).
  */
object GbifFilterJob {

  /** @param tagMode true = annotate (`--tag`), false = filter
    *                (`apply_gbif_filter.py:84-91`)
    */
  def run(input: DataFrame, backbone: DataFrame, occurrence: DataFrame,
      cfg0: FilterConfig, tagMode: Boolean): DataFrame = {
    val cfg = FilterConfig.normalized(cfg0)
    val inputCols = input.columns.toSeq
    val resolved = TaxonomyResolver.resolve(input, backbone, cfg)
    val tagged0 = OccurrenceFilter.tagExistsInZone(resolved, occurrence, cfg)
    val withChildren =
      if (cfg.resolveToRank.isDefined) {
        // children resolution references `tagged` twice (parent extraction
        // + final join); persist so the resolve/tag joins run once, not
        // twice — at scale this halves the input scans. Released by the
        // caller via graft.Persisted.unpersistAll() once materialized.
        val tagged = Persisted.track(tagged0
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
        RankResolver.resolveChildren(tagged, backbone, occurrence, cfg)
      } else tagged0
    OutputShaper.shape(withChildren, inputCols, cfg, tagMode)
  }
}
