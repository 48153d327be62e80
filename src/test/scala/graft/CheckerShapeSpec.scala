package graft

import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** Output-shape guard over the WHOLE gated query surface: the driver's
  * pandas compare sorts rows by every column, which dies on top-level
  * ARRAY/MAP/STRUCT values (`TypeError: unhashable type`) — a gate that
  * returns one ships a permanently-red correctness row no matter how
  * right its values are (r10: x_embed_pool / x_embed_rproj /
  * x_search_index). List-valued results must serialize in the final
  * select (`array_join(...)` + an `array_to_string` oracle twin — the
  * a1_collect_children pattern). This spec turns that silent class of
  * failure into a compile-round failure. The SCHEMA checks are
  * analysis-only (none of the gated queries is collected), but
  * CONSTRUCTING several gates triggers their staged-fixture side
  * effects — parquet staging writes and the driver-side k-means / PQ
  * codebook training — so real staging work does run here.
  */
class CheckerShapeSpec extends AnyFunSuite with SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("no gated query returns a top-level array/map/struct column") {
    try {
      val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
        case (name, q) =>
          q(spark, dir).schema.fields.collect {
            case f if f.dataType.isInstanceOf[ArrayType] ||
              f.dataType.isInstanceOf[MapType] ||
              f.dataType.isInstanceOf[StructType] =>
              s"$name.${f.name}: ${f.dataType.simpleString}"
          }
      }
      assert(offenders.isEmpty,
        s"driver-unsortable output columns (serialize with array_join, " +
          s"oracle with array_to_string — see a1_collect_children): $offenders")
    } finally {
      // cleanup runs even when the assert fails — leaked persisted
      // intermediates would otherwise distort every later spec's timing
      Persisted.unpersistAll()
      spark.catalog.clearCache()
    }
  }
}
