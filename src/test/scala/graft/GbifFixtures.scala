package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture dimension tables per FIXTURES.md §3 — the local stand-ins for
  * the GBIF REST relations. Covers: exact match, synonym chase, ambiguous
  * homonym split by kingdom, FAMILY/GENUS parents with mixed-status /
  * mixed-habitat children, in/out/boundary occurrences.
  */
object GbifFixtures {

  /** Unit square (lon-lat) zone used by most specs. */
  val SquareWkt = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"

  def backbone(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      // (key, canonicalName, rank, kingdom, status, acceptedKey, higherTaxonKeys, habitat)
      (1L, "Lumbricus", "GENUS", "Animalia", "ACCEPTED", None: Option[Long], Seq(10L), None: Option[String]),
      (2L, "Lumbricus terrestris", "SPECIES", "Animalia", "ACCEPTED", None: Option[Long], Seq(1L, 10L), Some("TERRESTRIAL")),
      (3L, "Lumbricus rubellus", "SPECIES", "Animalia", "ACCEPTED", None: Option[Long], Seq(1L, 10L), Some("MARINE")),
      (4L, "Allolobophora longa", "SPECIES", "Animalia", "SYNONYM", Some(5L), Seq(1L, 10L), Some("TERRESTRIAL")),
      (5L, "Aporrectodea longa", "SPECIES", "Animalia", "ACCEPTED", None: Option[Long], Seq(6L, 10L), Some("TERRESTRIAL")),
      (6L, "Aporrectodea", "GENUS", "Animalia", "ACCEPTED", None: Option[Long], Seq(10L), None),
      (7L, "Ambigua", "SPECIES", "Animalia", "ACCEPTED", None: Option[Long], Seq(10L), Some("TERRESTRIAL")),
      (8L, "Ambigua", "SPECIES", "Plantae", "ACCEPTED", None: Option[Long], Seq(20L), None),
      (9L, "Helodrilus longus", "SPECIES", "Animalia", "SYNONYM", Some(5L), Seq(10L), None),
      (10L, "Lumbricidae", "FAMILY", "Animalia", "ACCEPTED", None: Option[Long], Seq.empty[Long], None),
      (20L, "Plantaceae", "FAMILY", "Plantae", "ACCEPTED", None: Option[Long], Seq.empty[Long], None)
    ).toDF("key", "canonicalName", "rank", "kingdom", "taxonomicStatus",
      "acceptedKey", "higherTaxonKeys", "habitat")
  }

  def occurrence(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      // (taxonKey, decimalLatitude, decimalLongitude, countryCode, taxonRank)
      (1L, 5.0, 5.0, "NO", "GENUS"),     // genus Lumbricus in zone
      (2L, 5.0, 5.5, "NO", "SPECIES"),   // L. terrestris in zone
      (3L, 50.0, 50.0, "FR", "SPECIES"), // L. rubellus out of zone
      (5L, 1.0, 1.0, "NO", "SPECIES"),   // A. longa in zone
      (6L, 0.0, 0.0, "NO", "GENUS"),     // boundary vertex -> inclusive
      (7L, 5.0, 5.0, "NO", "SPECIES"),   // Ambigua (Animalia) in zone
      (2L, 90.0, 170.0, "SE", "SPECIES") // duplicate key, out of zone
    ).toDF("taxonKey", "decimalLatitude", "decimalLongitude", "countryCode", "taxonRank")
  }

  /** Reference-shaped input table: passenger column + name/taxid/rank. */
  def taxa(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("r1", "Lumbricus", null, "GENUS"),
      ("r2", "Helodrilus longus", null, null),   // synonym -> 5
      ("r3", "Ambigua", null, null),             // homonym: needs kingdom
      ("r4", "Nonexistent", null, null),         // no match -> tri-state null
      ("r5", null, "GBIF:3", null),              // taxid passthrough, out of zone
      ("r6", null, null, null),                  // nothing -> null
      ("r7", "Lumbricidae", null, "FAMILY")      // family, no own occurrence
    ).asInstanceOf[Seq[(String, String, String, String)]]
      .toDF("id", "name", "taxid", "rank")
  }
}
