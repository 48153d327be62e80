package graft

import graft.config.FilterConfig
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Golden end-to-end tests (SURVEY.md §5.2.1): re-creates the reference's
  * tag-mode and filter-mode scenarios against local fixtures.
  */
class GbifFilterJobSpec extends AnyFunSuite with SparkTestBase {

  private val cfg = FilterConfig(
    nameColumn = Some("name"),
    taxidColumn = Some("taxid"),
    rankColumn = Some("rank"),
    taxaKingdom = Some("Animalia"),
    geometry = Some(GbifFixtures.SquareWkt),
    country = Some("NO"),
    resolveToRank = Some("SPECIES"),
    habitat = Some("TERRESTRIAL"))

  private def tagMap(rows: Seq[Row], tagIdx: Int): Map[String, Any] =
    rows.map(r => r.getString(0) -> (if (r.isNullAt(tagIdx)) null else r.getBoolean(tagIdx))).toMap

  test("tag mode: tri-state tag + resolved lists, reference column order") {
    val out = GbifFilterJob.run(
      GbifFixtures.taxa(spark), GbifFixtures.backbone(spark),
      GbifFixtures.occurrence(spark), cfg, tagMode = true)

    // T1/T2 ordering: input cols, tag, then resolved names/ids
    assert(out.columns.toSeq == Seq("id", "name", "taxid", "rank",
      "gbif_filter_tag", "gbif_filter_resolved_species_names",
      "gbif_filter_resolved_species_ids"))

    val rows = out.collect().toSeq
    assert(rows.size == 7, "tag mode preserves row count")

    val tags = tagMap(rows, 4)
    assert(tags == Map(
      "r1" -> true,  // genus in zone
      "r2" -> true,  // synonym chased to 5, in zone
      "r3" -> true,  // homonym resolved by kingdom=Animalia -> 7, in zone
      "r4" -> null,  // unmatched name -> tri-state null
      "r5" -> false, // taxid passthrough 3, out of zone
      "r6" -> null,  // no name, no taxid
      "r7" -> false  // family 10 has no occurrence rows
    ))

    // J3/J4/A1: genus Lumbricus (1) resolves to terrestrial accepted
    // children in zone: only L. terrestris (2). MARINE (3) excluded by
    // habitat, SYNONYM (4) excluded by status.
    val r1 = rows.find(_.getString(0) == "r1").get
    assert(r1.getSeq[String](5) == Seq("Lumbricus terrestris"))
    assert(r1.getSeq[Long](6) == Seq(2L))

    // r2 resolved to SPECIES rank -> not FAMILY/GENUS -> no lists
    val r2 = rows.find(_.getString(0) == "r2").get
    assert(r2.isNullAt(5) && r2.isNullAt(6))
  }

  test("filter mode: only tag==true rows survive (F1 null-safe)") {
    val out = GbifFilterJob.run(
      GbifFixtures.taxa(spark), GbifFixtures.backbone(spark),
      GbifFixtures.occurrence(spark), cfg, tagMode = false)
    assert(out.columns.toSeq == Seq("id", "name", "taxid", "rank",
      "gbif_filter_resolved_species_names", "gbif_filter_resolved_species_ids"))
    assert(out.select("id").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("r1", "r2", "r3"))
  }

  test("ambiguous homonym without kingdom constraint resolves to null") {
    val noKingdom = cfg.copy(taxaKingdom = None)
    val out = GbifFilterJob.run(
      GbifFixtures.taxa(spark), GbifFixtures.backbone(spark),
      GbifFixtures.occurrence(spark), noKingdom, tagMode = true)
    val r3 = out.collect().find(_.getString(0) == "r3").get
    assert(r3.isNullAt(4), "ambiguous match must yield tri-state null")
  }

  test("boundary occurrence counts as in zone (boundary-inclusive G1)") {
    val genusOnly = cfg.copy(resolveToRank = None, country = None)
    val input = {
      import spark.implicits._
      Seq(("b1", "Aporrectodea", null, "GENUS"))
        .asInstanceOf[Seq[(String, String, String, String)]]
        .toDF("id", "name", "taxid", "rank")
    }
    val out = GbifFilterJob.run(input, GbifFixtures.backbone(spark),
      GbifFixtures.occurrence(spark), genusOnly, tagMode = true)
    val row = out.collect().head
    assert(row.getBoolean(out.columns.indexOf("gbif_filter_tag")),
      "occurrence at polygon vertex (0,0) must count as inside")
  }
}
