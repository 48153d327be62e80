package graft

import graft.ops.Validate
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the ingest-validation contract on exactly the hostile rows the
  * adversarial-input sweep used (NOTES r13): every rule fires on its
  * planted row and ONLY there, valid+quarantine partition the input,
  * and benign-but-unusual rows (empty/unicode event_type, negative
  * values, -0.0, denormals) pass.
  */
class ValidateSpec extends AnyFunSuite with SparkTestBase {

  private def eventsDf = {
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val ts = java.sql.Timestamp.valueOf("2024-01-15 00:00:00")
    def r(id: java.lang.Long, t: java.sql.Timestamp, u: java.lang.Long,
        et: String, v: java.lang.Double, p: String) = Row(id, t, u, et, v, p)
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        r(1L, ts, 1L, "click", 1.0, "{\"k\":1}"),             // valid
        r(2L, ts, 2L, "", -1.5, "{}"),                        // valid (benign-unusual)
        r(3L, ts, 3L, "клик", -0.0, "[]"),                    // valid
        r(null, ts, 4L, "click", 1.0, null),                  // null_event_id
        r(5L, null, 5L, "click", 1.0, null),                  // null_ts
        r(6L, java.sql.Timestamp.valueOf("2263-01-01 00:00:00"),
          6L, "click", 1.0, null),                            // ts_out_of_range
        r(7L, ts, null, "click", 1.0, null),                  // null_user_id
        r(8L, ts, 8L, "click", Double.NaN, null),             // nonfinite_value
        r(9L, ts, 9L, "click", Double.PositiveInfinity, null),// nonfinite_value
        r(10L, ts, 10L, "click", 1e18, null),                 // value_out_of_range
        r(11L, ts, 11L, "click", null, null),                 // valid (null value ok)
        r(12L, ts, 12L, "click", 1.0, "not json"),            // invalid_props_json
        r(13L, ts, 13L, "click", 1.0, "{\"a\":"),             // invalid_props_json
        // JSON null-root class (r13 ADVICE): a bare `null` document is
        // VALID JSON (json_valid('null') is true in DuckDB) even though
        // Spark's get_json_object(props,'$') returns SQL NULL for it —
        // incl. wrapped in the four RFC 8259 whitespace chars
        r(14L, ts, 14L, "click", 1.0, "null"),                // valid
        r(15L, ts, 15L, "click", 1.0, " null "),              // valid
        r(16L, ts, 16L, "click", 1.0, "\tnull\r\n"),          // valid
        r(17L, ts, 17L, "click", 1.0, "nullx"),               // invalid_props_json
        // Java-regex line terminators (NOT JSON whitespace): `$` would
        // match before a final U+0085/U+2028/U+2029 and wrongly
        // suppress the rule; the \A/\z anchors must NOT (r14 ADVICE)
        r(18L, ts, 18L, "click", 1.0, "null\u0085"),          // invalid_props_json
        r(19L, ts, 19L, "click", 1.0, " null \u2028"),        // invalid_props_json
        r(20L, ts, 20L, "click", 1.0, "null\u2029"))),        // invalid_props_json
      schema)
  }

  test("event rules fire exactly on their planted rows") {
    val rules = Validate.eventRules()
    val got = Validate.violationRows(eventsDf, "event_id", rules)
      .collect().map(r => (Option(r.get(0)), r.getString(1))).toSet
    assert(got == Set(
      (None, "null_event_id"), (Some(5L), "null_ts"),
      (Some(6L), "ts_out_of_range"), (Some(7L), "null_user_id"),
      (Some(8L), "nonfinite_value"), (Some(9L), "nonfinite_value"),
      (Some(10L), "value_out_of_range"), (Some(12L), "invalid_props_json"),
      (Some(13L), "invalid_props_json"), (Some(17L), "invalid_props_json"),
      (Some(18L), "invalid_props_json"), (Some(19L), "invalid_props_json"),
      (Some(20L), "invalid_props_json")))
  }

  test("valid and quarantine partition the events") {
    val rules = Validate.eventRules()
    val all = eventsDf.count()
    val v = Validate.valid(eventsDf, rules)
    val q = Validate.quarantine(eventsDf, rules)
    assert(v.count() + q.count() == all)
    assert(v.collect().map(_.get(0)).toSet ==
      Set(1L, 2L, 3L, 11L, 14L, 15L, 16L))
    // quarantine carries the violation names
    assert(q.filter(col("event_id") === 8L)
      .select(col("violations")(0)).head.getString(0) == "nonfinite_value")
  }

  test("embedding rules: dim, null/nonfinite/out-of-range components, zero vector") {
    import spark.implicits._
    val dim = 4
    val rows: Seq[(Long, Seq[java.lang.Float])] = Seq(
      1L -> Seq[java.lang.Float](1.0f, 0.5f, -0.25f, 1e-40f),   // valid (denormal ok)
      2L -> Seq[java.lang.Float](-0.0f, 1.0f, 0.0f, 0.0f),      // valid (-0.0 ok)
      3L -> Seq[java.lang.Float](1.0f, 2.0f),                   // wrong_dim
      4L -> Seq[java.lang.Float](Float.NaN, 1f, 1f, 1f),        // nonfinite_component
      5L -> Seq[java.lang.Float](Float.NegativeInfinity, 1f, 1f, 1f), // nonfinite
      6L -> Seq[java.lang.Float](null, 1f, 1f, 1f),             // null_component
      7L -> Seq[java.lang.Float](0.0f, -0.0f, 0.0f, 0.0f),      // zero_vector
      8L -> Seq[java.lang.Float](1e38f, 1f, 1f, 1f))            // component_out_of_range
    val df = rows.toDF("vec_id", "embedding")
    val rules = Validate.embeddingRules("embedding", dim)
    val got = Validate.violationRows(df, "vec_id", rules)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set(
      (3L, "wrong_dim"), (4L, "nonfinite_component"),
      (5L, "nonfinite_component"), (6L, "null_component"),
      (7L, "zero_vector"), (8L, "component_out_of_range")))
    assert(Validate.valid(df, rules).collect().map(_.getLong(0)).toSet == Set(1L, 2L))
  }

  test("document rules: null id/text and the length cap") {
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "fine short text"),
        Row(2L, ""),                 // empty text is VALID (curation's job)
        Row(null, "orphan"),         // null_doc_id
        Row(4L, null),               // null_text
        Row(5L, "x" * 101))),        // text_too_long at cap 100
      schema)
    val rules = Validate.documentRules(maxChars = 100)
    val got = Validate.violationRows(df, "doc_id", rules)
      .collect().map(r => (Option(r.get(0)), r.getString(1))).toSet
    assert(got == Set((None, "null_doc_id"), (Some(4L), "null_text"),
      (Some(5L), "text_too_long")))
    assert(Validate.valid(df, rules).collect().map(_.getLong(0)).toSet == Set(1L, 2L))
  }

  test("pipeline disposition ledger partitions the input; planted rows " +
      "are recovered in quarantine and never in the output") {
    // the x_pipeline_validate_curate contract: one disposition row per
    // input row (drops attributed to their stage, survivors to their
    // split), and every planted-corruption twin lands in quarantine —
    // none survives into a kept: split
    val sfDir = "/root/testdata/sf0.001"
    // the gate's input: boiler corpus + corruption twins (ids +1e9 or
    // null) + exact-duplicate twins (ids +2e9 for doc_id % 3 == 1)
    val nBoiler = DerivedModel.documentsBoilerplate(spark, sfDir).count()
    val nDupTwins = DerivedModel.documentsBoilerplate(spark, sfDir)
      .filter(col("doc_id") % 3 === 1).count()
    val out = SparkEntry.queries("x_pipeline_validate_curate")(spark, sfDir)
      .cache()
    assert(out.count() == 2 * nBoiler + nDupTwins,
      "ledger must have exactly one row per input row")
    // corruption twins are quarantined, always
    val corruptionDisp = out
      .filter(col("doc_id").isNull ||
        (col("doc_id") >= 1000000000L && col("doc_id") < 2000000000L))
      .select("disposition").distinct()
      .collect().map(_.getString(0))
    assert(corruptionDisp.nonEmpty &&
      corruptionDisp.forall(_.startsWith("quarantined:")),
      s"every corruption twin must be quarantined, got: ${corruptionDisp.toSeq}")
    // a duplicate twin can never out-survive its smaller-id original
    assert(out.filter(col("doc_id") >= 2000000000L &&
      col("disposition").startsWith("kept:")).count() == 0,
      "no duplicate twin may reach the output")
    // every stage carries attributable traffic
    for (d <- Seq("kept:", "rule_dropped", "dup_dropped", "quarantined:"))
      assert(out.filter(col("disposition").startsWith(d)).count() > 0,
        s"degenerate fixture: no rows with disposition $d")
    out.unpersist(): Unit
  }

  test("null embedding row fires null_embedding") {
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, null))), schema)
    val got = Validate.violationRows(df, "vec_id",
      Validate.embeddingRules("embedding", 4))
      .collect().map(_.getString(1)).toSeq
    assert(got == Seq("null_embedding"))
  }
}
