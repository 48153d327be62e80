package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ingest validation / quarantine — the contract boundary every
  * 100 TB pipeline needs in front of its operators. The adversarial
  * input sweeps (r13, `tools/make_adversarial_corpus.py` +
  * NOTES "hostile events/embeddings") measured what raw hostile rows do
  * to the board: NaN/±Inf/over-range values blow up exact-cents casts
  * (correctly, on BOTH engines — ANSI refuses), NULL keys/timestamps
  * make window and as-of ordering engine-dependent, zero-norm or
  * wrong-dimension embeddings kill every cosine-normalizing ANN gate
  * with DIVIDE_BY_ZERO. Rather than sprinkling per-operator guards
  * (which would silently define semantics for undefined input), the
  * engine's contract is: operators assume VALIDATED input, and this
  * module is the validator — explicit, oracle-replayable rules, rows
  * that fail are quarantined with their violation names so "why was
  * this row dropped" has an auditable answer (the same discipline as
  * the curation keep/drop gates).
  *
  * All rules are pure scan expressions (no shuffle, no state) and every
  * rule replays bit-identically in DuckDB: JSON validity via
  * [[JsonValidExpr]], a byte-exact replica of DuckDB's `json_valid`
  * (Spark's own JSON primitives diverge from it — see that scaladoc and
  * JsonValidSpec's measured truth table).
  */
object Validate {

  /** Exact-cents safety bound: |value| <= 1e12 keeps value*100 far from
    * the int64 edge with headroom for SUM over billions of rows.
    */
  val MaxAbsValue: Double = 1e12

  val MinTs = "1900-01-01"
  val MaxTs = "2200-01-01"

  /** Fixed-point safety bound for embedding components: quantization at
    * 2^20 and 64-dim int64 accumulation leave orders of magnitude of
    * headroom at 1e6.
    */
  val MaxAbsComponent: Float = 1e6f

  /** (rule_name, fires) — ordered; names are the quarantine audit
    * vocabulary and the oracle twin enumerates the same names.
    */
  def eventRules(): Seq[(String, Column)] = Seq(
    "null_event_id" -> col("event_id").isNull,
    "null_user_id" -> col("user_id").isNull,
    "null_ts" -> col("ts").isNull,
    "ts_out_of_range" -> (col("ts").isNotNull &&
      (col("ts") < lit(MinTs).cast("timestamp") ||
        col("ts") >= lit(MaxTs).cast("timestamp"))),
    "nonfinite_value" -> (col("value").isNotNull &&
      (isnan(col("value")) || col("value") === Double.PositiveInfinity ||
        col("value") === Double.NegativeInfinity)),
    "value_out_of_range" -> (col("value").isNotNull && !isnan(col("value")) &&
      col("value") =!= Double.PositiveInfinity &&
      col("value") =!= Double.NegativeInfinity &&
      abs(col("value")) > MaxAbsValue),
    // Validity is [[JsonValidExpr]] — a byte-exact replica of DuckDB's
    // json_valid, NOT a Spark JSON primitive: get_json_object conflates
    // malformed input with the valid JSON null root and (with
    // try_parse_json) inherits Jackson leniencies DuckDB rejects
    // (trailing U+0085/U+2028/U+2029, second roots, duplicate-key
    // rejection) — every divergence measured in the r15 probe and now
    // pinned row-by-row in JsonValidSpec (r13+r14 ADVICE class closed
    // for good, not re-guarded).
    "invalid_props_json" -> (col("props").isNotNull &&
      !JsonValidExpr.jsonValidCol(col("props"))))

  /** @param dim the corpus's one embedding dimensionality (similarity
    *            ops assume it; a mixed-dim corpus is two corpora)
    */
  def embeddingRules(embCol: String, dim: Int): Seq[(String, Column)] = Seq(
    "null_embedding" -> col(embCol).isNull,
    "wrong_dim" -> (col(embCol).isNotNull && size(col(embCol)) =!= dim),
    "null_component" -> (col(embCol).isNotNull &&
      exists(col(embCol), x => x.isNull)),
    "nonfinite_component" -> (col(embCol).isNotNull &&
      exists(col(embCol), x => x.isNotNull &&
        (isnan(x) || x === Float.PositiveInfinity || x === Float.NegativeInfinity))),
    // the fixed-point embedding ops quantize at 2^20 (RandomProjection,
    // pooling): components beyond this bound overflow their exact-int64
    // envelope (measured: a 1e38-component vector long-overflows rproj
    // on Spark and the pooling oracle's INT64 cast on DuckDB)
    "component_out_of_range" -> (col(embCol).isNotNull &&
      exists(col(embCol), x => x.isNotNull && !isnan(x) &&
        x =!= Float.PositiveInfinity && x =!= Float.NegativeInfinity &&
        abs(x) > MaxAbsComponent)),
    // exact test (no FP accumulation): the all-zero vector is the one
    // input whose cosine is undefined no matter the precision
    "zero_vector" -> (col(embCol).isNotNull &&
      size(col(embCol)) === dim &&
      !exists(col(embCol), x => x.isNull || x =!= lit(0.0f))))

  /** Documents: identity and text presence, plus a LENGTH CAP — every
    * production curation pipeline bounds document size (storage, task
    * balance, and pathological inputs; the hostile-doc sweep's single
    * 200k-char document was also what exposed the quadratic n-gram
    * lambda, fixed via [[graft.text.TextFunctions.bindOnce]]). The cap
    * is policy, so it is a parameter; `maxChars` compares code points
    * (`length`), identical in both engines.
    */
  def documentRules(maxChars: Int = 1000000): Seq[(String, Column)] = Seq(
    "null_doc_id" -> col("doc_id").isNull,
    "null_text" -> col("text").isNull,
    "text_too_long" -> (col("text").isNotNull && length(col("text")) > maxChars))

  /** `violations` array for a row (empty array = valid). */
  def violations(rules: Seq[(String, Column)]): Column =
    filter(array(rules.map { case (n, c) =>
      when(c, lit(n)).otherwise(lit(null).cast("string"))
    }: _*), x => x.isNotNull)

  /** One row per (row, violation): the quarantine audit relation. */
  def violationRows(df: DataFrame, idCol: String,
      rules: Seq[(String, Column)]): DataFrame =
    df.select(col(idCol), explode(violations(rules)).as("violation"))

  /** Rows passing every rule — the operators' input contract. */
  def valid(df: DataFrame, rules: Seq[(String, Column)]): DataFrame =
    df.filter(rules.map(r => !r._2).reduce(_ && _))

  /** Rows failing any rule, with the full violation list attached. */
  def quarantine(df: DataFrame, rules: Seq[(String, Column)]): DataFrame =
    df.withColumn("violations", violations(rules))
      .filter(size(col("violations")) > 0)

  // ---- planted corruption twins (fixture convention: deterministic ----
  // transforms of the real tables, so the validation gates exercise
  // every rule at every SF and both engines construct the same rows)

  /** Events with a deterministically corrupted twin appended: each twin
    * row (event_id + 10^9) violates exactly one rule class chosen by
    * event_id mod 6.
    */
  def eventsWithPlantedCorruption(events: DataFrame): DataFrame = {
    val m = col("event_id") % 6
    val twin = events.select(
      (col("event_id") + lit(1000000000L)).as("event_id"),
      when(m === 0, lit(null).cast("timestamp"))
        .when(m === 1, lit("2263-01-01").cast("timestamp"))
        .otherwise(col("ts")).as("ts"),
      when(m === 2, lit(null).cast("long")).otherwise(col("user_id")).as("user_id"),
      col("event_type"),
      when(m === 3, lit(Double.NaN))
        .when(m === 4, lit(1e18))
        .otherwise(col("value")).as("value"),
      when(m === 5, lit("{\"bad\":")).otherwise(col("props")).as("props"))
    events.unionByName(twin)
  }

  /** DuckDB twin of [[eventsWithPlantedCorruption]] as a CTE body over
    * `events`.
    */
  def eventsWithPlantedCorruptionSql: String =
    """SELECT * FROM events
      |UNION ALL
      |SELECT event_id + 1000000000,
      |  CASE WHEN event_id % 6 = 0 THEN NULL
      |       WHEN event_id % 6 = 1 THEN TIMESTAMP '2263-01-01'
      |       ELSE ts END,
      |  CASE WHEN event_id % 6 = 2 THEN NULL ELSE user_id END,
      |  event_type,
      |  CASE WHEN event_id % 6 = 3 THEN 'NaN'::DOUBLE
      |       WHEN event_id % 6 = 4 THEN 1e18
      |       ELSE value END,
      |  CASE WHEN event_id % 6 = 5 THEN '{"bad":' ELSE props END
      |FROM events""".stripMargin

  /** Embeddings with a corrupted twin: vec_id mod 6 selects the
    * violation (truncated dim / NaN component / +Inf component / null
    * component / all-zero vector / out-of-range component).
    */
  def embeddingsWithPlantedCorruption(emb: DataFrame, dim: Int): DataFrame = {
    val m = col("vec_id") % 6
    val twin = emb.select(
      (col("vec_id") + lit(1000000000L)).as("vec_id"),
      when(m === 0, slice(col("embedding"), 1, dim / 2))
        .when(m === 1, concat(array(lit(Float.NaN)),
          slice(col("embedding"), 2, dim - 1)))
        .when(m === 2, concat(array(lit(Float.PositiveInfinity)),
          slice(col("embedding"), 2, dim - 1)))
        .when(m === 3, concat(array(lit(null).cast("float")),
          slice(col("embedding"), 2, dim - 1)))
        .when(m === 4, array_repeat(lit(0.0f), dim))
        .otherwise(concat(array(lit(1e38f)),
          slice(col("embedding"), 2, dim - 1))).as("embedding"),
      col("label"))
    emb.unionByName(twin)
  }

  /** DuckDB twin of [[embeddingsWithPlantedCorruption]]. */
  def embeddingsWithPlantedCorruptionSql(dim: Int): String =
    s"""SELECT * FROM embeddings
       |UNION ALL
       |SELECT vec_id + 1000000000,
       |  CASE WHEN vec_id % 6 = 0 THEN embedding[1:${dim / 2}]
       |       WHEN vec_id % 6 = 1 THEN list_prepend('NaN'::FLOAT, embedding[2:$dim])
       |       WHEN vec_id % 6 = 2 THEN list_prepend('Infinity'::FLOAT, embedding[2:$dim])
       |       WHEN vec_id % 6 = 3 THEN list_prepend(NULL::FLOAT, embedding[2:$dim])
       |       WHEN vec_id % 6 = 4 THEN list_transform(range($dim), i -> 0.0::FLOAT)
       |       ELSE list_prepend(1e38::FLOAT, embedding[2:$dim]) END,
       |  label
       |FROM embeddings""".stripMargin

  /** Documents with a corrupted twin: doc_id mod 3 selects null id /
    * null text / an over-cap text (`capChars + 1` chars — keep the gate
    * cap SMALL so the planted relation stays tiny at every SF).
    */
  def documentsWithPlantedCorruption(docs: DataFrame, capChars: Int): DataFrame = {
    val m = col("doc_id") % 3
    val twin = docs.select(
      when(m === 0, lit(null).cast("long"))
        .otherwise(col("doc_id") + lit(1000000000L)).as("doc_id"),
      when(m === 1, lit(null).cast("string"))
        .when(m === 2, concat(lit("z"), expr(s"repeat('z', $capChars)")))
        .otherwise(col("text")).as("text"),
      col("lang"), col("source"), col("n_chars"))
    docs.unionByName(twin)
  }

  /** DuckDB twin of [[documentsWithPlantedCorruption]] over `table` (any
    * relation with the documents column set).
    */
  def documentsWithPlantedCorruptionSql(capChars: Int,
      table: String = "documents"): String =
    s"""SELECT * FROM $table
       |UNION ALL
       |SELECT CASE WHEN doc_id % 3 = 0 THEN NULL ELSE doc_id + 1000000000 END,
       |  CASE WHEN doc_id % 3 = 1 THEN NULL
       |       WHEN doc_id % 3 = 2 THEN 'z' || repeat('z', $capChars)
       |       ELSE text END,
       |  lang, source, n_chars
       |FROM $table""".stripMargin

  /** (rule_name, DuckDB predicate over a relation named `dc`) — SQL twin
    * of [[documentRules]], data-shaped like [[eventRuleSqlPreds]] so the
    * violation relation and the pipeline disposition ledger share one
    * predicate inventory.
    */
  def documentRuleSqlPreds(maxChars: Int): Seq[(String, String)] = Seq(
    "null_doc_id" -> "doc_id IS NULL",
    "null_text" -> "text IS NULL",
    "text_too_long" -> s"text IS NOT NULL AND length(text) > $maxChars")

  /** DuckDB twin of the document rules over a relation named `dc`. */
  def documentViolationsSql(maxChars: Int): String =
    documentRuleSqlPreds(maxChars).zipWithIndex.map { case ((n, p), i) =>
      val sel = if (i == 0) s"SELECT doc_id, '$n' AS violation FROM dc"
      else s"UNION ALL SELECT doc_id, '$n' FROM dc"
      s"$sel WHERE $p"
    }.mkString("\n")

  /** The rule-order violation LIST as one DuckDB expression (twin of
    * [[violations]]) — `list_filter` over CASE entries preserves rule
    * order exactly like the Spark array builder.
    */
  def violationListSql(preds: Seq[(String, String)]): String =
    preds.map { case (n, p) => s"CASE WHEN $p THEN '$n' END" }
      .mkString("list_filter([", ", ", "], x -> x IS NOT NULL)")

  /** (rule_name, DuckDB predicate over a relation named `ev`) — the SQL
    * twin of [[eventRules]], kept as data so BOTH the violation relation
    * ([[eventViolationsSql]]) and the per-rule audit counters
    * ([[eventAuditSql]]) derive from the one predicate inventory (a rule
    * added to [[eventRules]] without a twin here fails its gate, not
    * silently half of them).
    */
  def eventRuleSqlPreds: Seq[(String, String)] = Seq(
    "null_event_id" -> "event_id IS NULL",
    "null_user_id" -> "user_id IS NULL",
    "null_ts" -> "ts IS NULL",
    "ts_out_of_range" ->
      s"ts IS NOT NULL AND (ts < TIMESTAMP '$MinTs' OR ts >= TIMESTAMP '$MaxTs')",
    "nonfinite_value" ->
      "value IS NOT NULL AND (isnan(value) OR isinf(value))",
    "value_out_of_range" ->
      ("value IS NOT NULL AND NOT isnan(value) AND NOT isinf(value) " +
        s"AND abs(value) > ${MaxAbsValue}"),
    "invalid_props_json" -> "props IS NOT NULL AND NOT json_valid(props)")

  /** DuckDB twin of the event rules over a relation named `ev`. */
  def eventViolationsSql: String =
    eventRuleSqlPreds.zipWithIndex.map { case ((n, p), i) =>
      val sel = if (i == 0) s"SELECT event_id, '$n' AS violation FROM ev"
      else s"UNION ALL SELECT event_id, '$n' FROM ev"
      s"$sel\n  WHERE $p"
    }.mkString("\n")

  /** Per-rule quarantine counters as `observe()` metrics (see
    * [[graft.ops.Profile.observeAudit]]): row total, quarantined total,
    * and one violation counter per rule — all riding the task-completion
    * path of ONE materialization, the zero-extra-pass way a 100 TB
    * ingest reports what its validation gate dropped and why.
    */
  def quarantineAuditMetrics(rules: Seq[(String, Column)]): Seq[(String, Column)] =
    Seq[(String, Column)](
      "n_rows" -> count(lit(1)),
      "n_quarantined" -> count(when(size(violations(rules)) > 0, 1))) ++
      rules.map { case (n, c) => s"viol_$n" -> count(when(c, 1)) }

  /** DuckDB twin of [[quarantineAuditMetrics]] over a relation named
    * `ev` with the event rules.
    */
  def eventAuditSql: String = {
    val any = eventRuleSqlPreds.map { case (_, p) => s"($p)" }.mkString(" OR ")
    (s"SELECT 'n_rows' AS metric, count(*)::BIGINT AS value FROM ev\n" +
      s"UNION ALL SELECT 'n_quarantined', count(CASE WHEN $any THEN 1 END)::BIGINT FROM ev\n" +
      eventRuleSqlPreds.map { case (n, p) =>
        s"UNION ALL SELECT 'viol_$n', count(CASE WHEN $p THEN 1 END)::BIGINT FROM ev"
      }.mkString("\n"))
  }

  /** DuckDB twin of the embedding rules over a relation named `em`. */
  def embeddingViolationsSql(dim: Int): String =
    s"""SELECT vec_id, 'null_embedding' AS violation FROM em WHERE embedding IS NULL
       |UNION ALL SELECT vec_id, 'wrong_dim' FROM em
       |  WHERE embedding IS NOT NULL AND len(embedding) <> $dim
       |UNION ALL SELECT vec_id, 'null_component' FROM em
       |  WHERE embedding IS NOT NULL AND list_bool_or(list_transform(embedding, x -> x IS NULL))
       |UNION ALL SELECT vec_id, 'nonfinite_component' FROM em
       |  WHERE embedding IS NOT NULL AND list_bool_or(list_transform(embedding,
       |    x -> x IS NOT NULL AND (isnan(x) OR isinf(x))))
       |UNION ALL SELECT vec_id, 'component_out_of_range' FROM em
       |  WHERE embedding IS NOT NULL AND list_bool_or(list_transform(embedding,
       |    x -> x IS NOT NULL AND NOT isnan(x) AND NOT isinf(x)
       |      AND abs(x) > ${MaxAbsComponent}))
       |UNION ALL SELECT vec_id, 'zero_vector' FROM em
       |  WHERE embedding IS NOT NULL AND len(embedding) = $dim
       |    AND NOT coalesce(list_bool_or(list_transform(embedding,
       |      x -> x IS NULL OR x <> 0.0)), FALSE)""".stripMargin
}
