package graft.config

/** The query definition of the GBIF-filter pipeline.
  *
  * Mirrors the reference's YAML config schema (`apply_gbif_filter.py:40-71`,
  * SURVEY.md §1.3), with the documented bug fixes applied (SURVEY.md §7.5):
  *   - `geometry` always defaults to None (the reference raises a Box
  *     KeyError when only `country` is set, `apply_gbif_filter.py:43-44`);
  *   - when both `country` and `geometry` are set they are ANDed, which is
  *     what the reference's occurrence search actually does
  *     (`gbif_helper.py:86-88`).
  *
  * @param sep            CSV separator for input and output (`apply_gbif_filter.py:104,187`)
  * @param nameColumn     column holding scientific names (one of name/taxid required)
  * @param taxidColumn    column holding GBIF taxon keys; wins over name per row
  *                       (`apply_gbif_filter.py:117-123`)
  * @param rankColumn     optional per-row rank column (`apply_gbif_filter.py:49-51`)
  * @param taxaRank       optional global rank hint, used when rankColumn absent
  * @param taxaKingdom    optional kingdom constraint for name matching (`gbif_helper.py:18`)
  * @param country        optional ISO-3166-1 alpha-2 code (zone predicate, G2)
  * @param geometry       optional WKT POLYGON, lon-lat order, closed ring (G1)
  * @param resolveToRank  optional SPECIES|GENUS; other values coerce to SPECIES
  *                       (`apply_gbif_filter.py:58-64`)
  * @param habitat        optional TERRESTRIAL|FRESHWATER|MARINE; invalid drops
  *                       to None (`apply_gbif_filter.py:66-70`)
  */
final case class FilterConfig(
    sep: String = ",",
    nameColumn: Option[String] = None,
    taxidColumn: Option[String] = None,
    rankColumn: Option[String] = None,
    taxaRank: Option[String] = None,
    taxaKingdom: Option[String] = None,
    country: Option[String] = None,
    geometry: Option[String] = None,
    resolveToRank: Option[String] = None,
    habitat: Option[String] = None) {

  require(nameColumn.isDefined || taxidColumn.isDefined,
    "one of nameColumn/taxidColumn is required (apply_gbif_filter.py:53-56)")

  /** True when any zone predicate is configured. */
  def hasZone: Boolean = country.isDefined || geometry.isDefined
}

object FilterConfig {
  private val Habitats = Set("TERRESTRIAL", "FRESHWATER", "MARINE")

  /** Normalization matching `validate_config` (`apply_gbif_filter.py:40-71`):
    * resolve_to_rank coerces to SPECIES unless GENUS; habitat outside the
    * enum is dropped; ranks uppercased.
    */
  def normalized(cfg: FilterConfig): FilterConfig = cfg.copy(
    taxaRank = cfg.taxaRank.map(_.toUpperCase(java.util.Locale.ROOT)),
    resolveToRank = cfg.resolveToRank.map(_.toUpperCase(java.util.Locale.ROOT)).map {
      case "GENUS" => "GENUS"
      case _       => "SPECIES" // anything else coerces (apply_gbif_filter.py:60-64)
    },
    habitat = cfg.habitat.map(_.toUpperCase(java.util.Locale.ROOT)).filter(Habitats.contains))

  /** Minimal flat-YAML loader for reference-shaped config files
    * (`example/config.yml`, `test/config.yml`): flat `key : "value" #
    * comment` pairs, double-quoted values that may span lines (the test
    * config's Norway polygon), `\t`/`\n` escapes in quoted strings. No
    * external YAML dependency is available offline.
    */
  def fromYaml(yaml: String): FilterConfig = {
    val kv = scala.collection.mutable.Map.empty[String, String]
    var curKey: String = null
    var buf: StringBuilder = null
    var inQuote = false
    def unescape(s: String): String = s.replace("\\t", "\t").replace("\\n", "\n")
    for (line <- yaml.linesIterator) {
      if (inQuote) {
        val end = line.indexOf('"')
        if (end >= 0) {
          buf.append(" ").append(line.substring(0, end).trim)
          kv(curKey) = unescape(buf.toString)
          inQuote = false
        } else buf.append(" ").append(line.trim)
      } else {
        val i = line.indexOf(':')
        if (i > 0) {
          val k = line.substring(0, i).trim
          if (k.nonEmpty && !k.startsWith("#")) {
            val v = line.substring(i + 1).trim
            if (v.startsWith("\"")) {
              val rest = v.substring(1)
              val end = rest.indexOf('"')
              if (end >= 0) kv(k) = unescape(rest.substring(0, end))
              else { curKey = k; buf = new StringBuilder(rest.trim); inQuote = true }
            } else {
              val bare = v.takeWhile(_ != '#').trim
              if (bare.nonEmpty) kv(k) = bare
            }
          }
        }
      }
    }
    normalized(FilterConfig(
      sep = kv.getOrElse("sep", ","),
      nameColumn = kv.get("name_column"),
      taxidColumn = kv.get("taxid_column"),
      rankColumn = kv.get("rank_column"),
      taxaRank = kv.get("taxa_rank"),
      taxaKingdom = kv.get("taxa_kingdom"),
      country = kv.get("country"),
      geometry = kv.get("geometry"),
      resolveToRank = kv.get("resolve_to_rank"),
      habitat = kv.get("habitat")))
  }
}
