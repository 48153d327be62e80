package graft

import graft.config.FilterConfig
import org.scalatest.funsuite.AnyFunSuite

class FilterConfigSpec extends AnyFunSuite {

  test("parses reference-style YAML incl. comments and quoted values") {
    val cfg = FilterConfig.fromYaml(
      """sep : ";" # The separator character in your csv file.
        |name_column : "taxa_to_filter" # comment
        |taxa_kingdom : "Animalia"
        |resolve_to_rank : "SPECIES" # One of SPECIES, GENUS (optional)
        |habitat : "TERRESTRIAL"
        |#country : "CA" # commented out
        |geometry : "POLYGON((-75.6 62.2,-78.8 60.6,-75.6 62.2))"
        |""".stripMargin)
    assert(cfg.sep == ";")
    assert(cfg.nameColumn.contains("taxa_to_filter"))
    assert(cfg.taxaKingdom.contains("Animalia"))
    assert(cfg.resolveToRank.contains("SPECIES"))
    assert(cfg.habitat.contains("TERRESTRIAL"))
    assert(cfg.country.isEmpty, "commented-out key must not parse")
    assert(cfg.geometry.exists(_.startsWith("POLYGON")))
  }

  test("multiline quoted polygon and tab separator escape") {
    val cfg = FilterConfig.fromYaml(
      """sep : "\t"
        |name_column : "genus_silva"
        |country : "NO"
        |geometry : "POLYGON((16.78 70.37,
        |2.54 62.14,
        |3.60 57.18,
        |16.78 70.37))" # trailing comment
        |""".stripMargin)
    assert(cfg.sep == "\t")
    assert(cfg.country.contains("NO"))
    val wkt = cfg.geometry.get
    assert(!wkt.contains("\n"))
    // parses as a valid closed ring
    val rings = graft.geo.PointInPolygon.parsePolygon(wkt)
    assert(rings.head.length == 8)
  }

  test("normalization: resolve_to_rank coerces, bad habitat drops") {
    val cfg = FilterConfig.normalized(FilterConfig(
      nameColumn = Some("n"),
      resolveToRank = Some("family"), // anything not GENUS -> SPECIES
      habitat = Some("AQUATIC"), // invalid -> dropped
      taxaRank = Some("genus")))
    assert(cfg.resolveToRank.contains("SPECIES"))
    assert(cfg.habitat.isEmpty)
    assert(cfg.taxaRank.contains("GENUS"))
  }

  test("requires a name or taxid column") {
    assertThrows[IllegalArgumentException](FilterConfig())
  }

  test("case normalization is locale-independent (Turkish-i regression)") {
    // under a tr-TR DEFAULT locale, "species".toUpperCase is "SPECİES"
    // (dotted capital İ) — every driver-side case map must use
    // Locale.ROOT or rank filters and habitat validation silently break
    // on a Turkish-locale JVM.
    // The default-locale mutation is JVM-GLOBAL: this is safe only
    // because `Test / testForkedParallel := false` (build.sbt) makes
    // suites run serially in the forked test JVM — no concurrent suite
    // can observe the tr-TR window.
    val saved = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(new java.util.Locale("tr", "TR"))
      assert("species".toUpperCase != "SPECIES",
        "precondition: tr locale must be in effect for this test")
      val cfg = FilterConfig.normalized(FilterConfig(
        nameColumn = Some("n"),
        resolveToRank = Some("species"),
        habitat = Some("terrestrial"),
        taxaRank = Some("species")))
      assert(cfg.resolveToRank.contains("SPECIES"))
      assert(cfg.habitat.contains("TERRESTRIAL"),
        "habitat must survive normalization under tr locale")
      assert(cfg.taxaRank.contains("SPECIES"))
      // WKT type detection must also be locale-independent
      val rings = graft.geo.PointInPolygon.parsePolygon(
        "polygon((0 0, 1 0, 1 1, 0 0))")
      assert(rings.head.length == 8)
    } finally java.util.Locale.setDefault(saved)
  }
}
