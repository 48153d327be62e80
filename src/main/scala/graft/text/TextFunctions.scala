package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines
  * (north-star extensions, SURVEY.md §7.6): language ID, quality scoring,
  * token counting, document fingerprinting. All pure `Column` expressions
  * (whole-stage codegen, no UDFs), each with a DuckDB-SQL twin generated
  * from the same definition so the driver oracle can replay it —
  * the `*Sql` methods must stay formula-identical to the Column versions.
  *
  * Scale notes: everything here is a narrow map over one string column —
  * no shuffle, no state; at 100 TB these run at scan speed and pipeline
  * into whatever agg/join follows.
  */
object TextFunctions {

  /** Marker stopwords per language for the n-gram/stopword heuristic
    * language ID. Order = tie-break priority.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and"),
    "de" -> Seq("der", "die", "und"),
    "es" -> Seq("el", "los", "que"),
    "fr" -> Seq("le", "les", "et"))

  /** Whitespace tokens (documents are single-space normalized word soup). */
  def tokens(c: Column): Column = split(trim(c), " ")

  /** Let-binding for Column expressions: evaluate `v` ONCE and pass it
    * to `body` as a bound lambda variable. Inside a higher-order-function
    * lambda, referencing an OUTER expression re-evaluates it per element
    * — `transform(sequence(1, size(t)), i -> ...slice(t, ...))` with
    * `t = split(text)` re-splits the document for every position,
    * turning a linear n-gram build QUADRATIC in document length
    * (measured: 99.8 s for one 40k-token doc; bound form 0.5 s, output
    * identical). Any lambda that closes over a non-trivial expression
    * must route it through here (or bind it as a projected column).
    */
  def bindOnce(v: Column)(body: Column => Column): Column =
    element_at(transform(array(v), body), 1)

  def tokenCount(c: Column): Column = size(tokens(c))
  def tokenCountSql(c: String): String = s"len(string_split(trim($c), ' '))"

  /** Occurrence-mass of marker words: sum of length deltas when removing
    * each padded marker — monotone in occurrence count, integer-exact, and
    * expressible identically in any SQL dialect with `replace`.
    */
  private def markerScore(c: Column, words: Seq[String]): Column = {
    val padded = concat(lit(" "), c, lit(" "))
    words.map { w =>
      length(padded) - length(call_function("replace", padded, lit(s" $w "), lit("")))
    }.reduce(_ + _)
  }

  private def markerScoreSql(c: String, words: Seq[String]): String = {
    val padded = s"(' ' || $c || ' ')"
    words.map(w => s"(length($padded) - length(replace($padded, ' $w ', '')))")
      .mkString(" + ")
  }

  /** Heuristic language ID: argmax of marker scores, first-listed wins
    * ties (deterministic).
    */
  def langId(c: Column): Column = {
    val scores = LangMarkers.map { case (lang, words) => lang -> markerScore(c, words) }
    scores.init.zipWithIndex.foldRight(lit(scores.last._1)) {
      case (((lang, score), i), elseCol) =>
        val laterScores = scores.drop(i + 1).map(_._2)
        when(laterScores.map(score >= _).reduce(_ && _), lit(lang)).otherwise(elseCol)
    }
  }

  def langIdSql(c: String): String = {
    val scores = LangMarkers.map { case (lang, words) => lang -> markerScoreSql(c, words) }
    val cases = scores.init.zipWithIndex.map { case ((lang, s), i) =>
      val later = scores.drop(i + 1).map(_._2)
      val cond = later.map(l => s"($s) >= ($l)").mkString(" AND ")
      s"WHEN $cond THEN '$lang'"
    }
    s"CASE ${cases.mkString(" ")} ELSE '${scores.last._1}' END"
  }

  /** Quality signals: word count, average word length, stopword ratio.
    * Ratios are double divisions of identical integers on both engines —
    * bit-deterministic.
    */
  def wordCount(c: Column): Column = tokenCount(c)
  def avgWordLen(c: Column): Column = {
    val spaces = length(c) - length(call_function("replace", c, lit(" "), lit("")))
    (length(c) - spaces).cast("double") / tokenCount(c)
  }
  def avgWordLenSql(c: String): String =
    s"CAST(length($c) - (length($c) - length(replace($c, ' ', ''))) AS DOUBLE) / ${tokenCountSql(c)}"

  def stopwordScore(c: Column): Column = markerScore(c, LangMarkers.head._2)
  def stopwordScoreSql(c: String): String = markerScoreSql(c, LangMarkers.head._2)

  /** Canonical document fingerprint: md5 of the sorted token multiset —
    * robust to token reordering, byte-stable across engines.
    */
  def fingerprint(c: Column): Column =
    md5(concat_ws(" ", array_sort(tokens(c))).cast("binary"))
  def fingerprintSql(c: String): String =
    s"md5(array_to_string(list_sort(string_split(trim($c), ' ')), ' '))"

  /** Canonical pre-dedup text normalization: ASCII-lowercase, strip
    * every character outside [a-z0-9 ], collapse whitespace runs, trim.
    * The case map is an explicit A-Z→a-z `translate` — NOT `lower()`,
    * whose Unicode special casings are engine-dependent (Java lowercases
    * U+0130 İ to TWO code points `i`+U+0307 where DuckDB/ICU yields one,
    * so `lower()`-based normalization diverges between the engine and
    * its oracle on such input; measured on an adversarial Unicode
    * corpus). `translate` is a code-point map with identical semantics
    * in both engines, and every non-ASCII character — upper or lower —
    * is stripped by the same regex class anyway, so the translate form
    * is engine-invariant on ARBITRARY input. The regexes use only
    * constructs with identical semantics in Java regex (Spark) and RE2
    * (DuckDB), so the oracle replays them exactly.
    */
  private val AsciiUpper = ('A' to 'Z').mkString
  private val AsciiLower = ('a' to 'z').mkString
  def normalize(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(translate(c, AsciiUpper, AsciiLower),
        "[^a-z0-9 ]", " "), " +", " "))
  def normalizeSql(c: String): String =
    s"trim(regexp_replace(regexp_replace(translate($c, '$AsciiUpper', '$AsciiLower'), " +
      "'[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"

  /** BPE-ish subword token count: the classic GPT-2-style pre-tokenizer
    * shape restricted to constructs whose semantics are identical in Java
    * regex (Spark) and RE2 (DuckDB): optional leading space + letter run /
    * digit run / other-symbol run.
    */
  val BpeishPattern = " ?[a-zA-Z]+| ?[0-9]+| ?[^ a-zA-Z0-9]+"
  def bpeishTokenCount(c: Column): Column =
    regexp_count(c, lit(BpeishPattern)).cast("long")
  def bpeishTokenCountSql(c: String): String =
    s"len(regexp_extract_all($c, '$BpeishPattern'))"

  /** PII redaction (email / US-phone / SSN shapes) as a chain of
    * `regexp_replace` built-ins — codegen'd, scan-speed, no UDF. The
    * patterns use only the Java-regex (Spark) / RE2 (DuckDB) common
    * subset — character classes, bounded repetition, `\b` word
    * boundaries — with identical leftmost-match semantics, so
    * [[redactSql]] replays byte-identically. Phone (3-3-4) is replaced
    * before SSN (3-2-4); with the `\b` anchors the two shapes are
    * disjoint, the ordering is belt and braces.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"
  val SsnRe = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"

  def redact(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, lit(EmailRe), lit("[EMAIL]")),
        lit(PhoneRe), lit("[PHONE]")),
      lit(SsnRe), lit("[SSN]"))

  def redactSql(c: String): String =
    s"regexp_replace(regexp_replace(regexp_replace($c, " +
      s"'$EmailRe', '[EMAIL]', 'g'), " +
      s"'$PhoneRe', '[PHONE]', 'g'), " +
      s"'$SsnRe', '[SSN]', 'g')"
}
