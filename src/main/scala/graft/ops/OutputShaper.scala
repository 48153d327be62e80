package graft.ops

import graft.config.FilterConfig
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** T1 tag-append / T2 resolved-columns-append / F1 boolean-row-filter
  * (SURVEY.md §2.2/§2.6): output shaping of `apply_gbif_filter.py:175-192`.
  *
  * Column order preserved from the reference:
  *  - tag mode: input columns, then `gbif_filter_tag` inserted *before* the
  *    resolved-lists block (`apply_gbif_filter.py:184-185` — position
  *    `len(cols) - offset`, offset 2 when resolution ran, else 0);
  *  - filter mode: rows with tag exactly true survive (`None`/`False` both
  *    dropped — the `x == True` comparison at `apply_gbif_filter.py:189-190`);
  *    the tag column itself is not written (it was never inserted in filter
  *    mode), resolved lists are kept in both modes (T2).
  */
object OutputShaper {

  def shape(df: DataFrame, inputCols: Seq[String], cfg: FilterConfig,
      tagMode: Boolean): DataFrame = {
    val resolvedCols: Seq[String] = cfg.resolveToRank.toSeq.flatMap { t =>
      Seq(RankResolver.namesCol(t), RankResolver.idsCol(t))
    }.filter(df.columns.contains)
    if (tagMode) {
      val ordered = inputCols ++ Seq(OccurrenceFilter.TagCol) ++ resolvedCols
      df.select(ordered.map(col): _*)
    } else {
      df.filter(col(OccurrenceFilter.TagCol) <=> true) // F1 null-safe
        .select((inputCols ++ resolvedCols).map(col): _*)
    }
  }
}
