package graft

import graft.ops.JsonValidExpr
import org.apache.spark.sql.functions.col
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[graft.ops.JsonValidExpr]] row-by-row against MEASURED DuckDB
  * 1.0.0 `json_valid` ground truth (r15 session, `SELECT json_valid(?)`
  * per case) — the oracle predicate of the `invalid_props_json`
  * ingest-validation rule. Every case below was run against DuckDB
  * before its expectation was written down; none is an assumption.
  *
  * The table deliberately includes the rows on which Spark's own JSON
  * primitives DIVERGE from DuckDB (measured in the same session):
  * `get_json_object(p,'$')` accepts trailing U+2028/U+2029 and `{} {}`
  * and NULLs-out the valid bare `null` root; `try_parse_json` rejects
  * duplicate keys DuckDB accepts. Each is a quarantine misclassification
  * on exactly one engine unless validity is computed independently.
  */
class JsonValidSpec extends AnyFunSuite with SparkTestBase {

  private def v(s: String): Boolean =
    JsonValidExpr.isValid(UTF8String.fromString(s))

  // (name, document, duckdb json_valid)
  private val truth: Seq[(String, String, Boolean)] = Seq(
    // plain valid documents
    ("valid_obj", "{\"k\":1}", true),
    ("empty_obj", "{}", true),
    ("empty_arr", "[]", true),
    ("empty_obj_ws", "{ }", true),
    ("empty_arr_ws", "[ ]", true),
    ("nested", "{\"k\":\"v\",\"nested\":{\"deep\":{\"deeper\":[1,2,3]}}}", true),
    ("unicode", "{\"ключ\":\"значение\"}", true),
    ("bignum", "{\"a\":1e999}", true),
    ("anull", "{\"a\":null}", true),
    ("arr_null", "[null]", true),
    ("dup_keys", "{\"dup\":1,\"dup\":2}", true), // try_parse_json rejects; DuckDB accepts
    ("esc_quote", "{\"s\":\"with \\\"quote\"}", true),
    ("negzero", "{\"n\":-0.0}", true),
    // scalar roots (all valid JSON texts per RFC 8259)
    ("bare_null", "null", true),
    ("sp_null", " null ", true),
    ("ws_null", "\tnull\r\n", true),
    ("null_tab", "null\t", true),
    ("bare_num", "42", true),
    ("bare_str", "\"s\"", true),
    ("bare_true", "true", true),
    ("true_trailing_ws", "true \t\r\n", true),
    // whitespace is EXACTLY {space,\t,\n,\r}
    ("null_0085", "null" + 0x85.toChar, false),
    ("null_2028", " null " + 0x2028.toChar, false), // get_json_object accepts
    ("null_2029", "null" + 0x2029.toChar, false),   // get_json_object accepts
    ("vtab_after", "true" + 0x0b.toChar, false),
    ("formfeed_after", "true" + 0x0c.toChar, false),
    ("nbsp_before", 0xa0.toChar + "{}", false),
    ("bom", 0xfeff.toChar + "{}", false),
    ("only_ws", " \t\r\n ", false),
    ("empty_doc", "", false),
    // one root only
    ("two_objs", "{} {}", false), // get_json_object accepts
    ("two_nums", "1 2", false),
    ("nullx", "nullx", false),
    // malformed structure
    ("not_json", "not json at all", false),
    ("trunc_obj", "{\"a\":", false),
    ("single_quote", "{'a':1}", false),
    ("unquoted_key", "{a:1}", false),
    ("colon_missing", "{\"a\" 1}", false),
    ("comma_missing", "[1 2]", false),
    ("obj_key_nonstr", "{1:2}", false),
    ("obj_missing_val", "{\"a\":}", false),
    ("comment_line", "[1] // c", false),
    ("comment_block", "/*c*/[1]", false),
    ("true_case", "True", false),
    ("null_case", "NULL", false),
    // yyjson extension 1: ONE trailing comma before a close
    ("arr_trailing_comma", "[1,2,]", true),
    ("obj_trailing_comma", "{\"a\":1,}", true),
    ("arr_trailing_comma_ws", "[1, \t\r\n]", true),
    ("obj_trailing_comma_ws", "{\"a\":1 , }", true),
    ("arr_just_comma", "[,]", false),
    ("obj_just_comma", "{,}", false),
    ("arr_double_comma", "[1,,2]", false),
    ("arr_two_trailing", "[1,,]", false),
    ("obj_two_trailing", "{\"a\":1,,}", false),
    // yyjson extension 2: case-insensitive nan/inf(+inity), '-' only
    ("nan_mixed", "NaN", true),
    ("nan_lower", "nan", true),
    ("nan_odd_case", "nAn", true),
    ("neg_nan", "-NaN", true),
    ("neg_nan_lower", "-nan", true),
    ("inf_mixed", "Infinity", true),
    ("inf_lower", "infinity", true),
    ("inf_upper", "INFINITY", true),
    ("inf_short", "inf", true),
    ("inf_odd_case", "iNf", true),
    ("neg_inf", "-Infinity", true),
    ("neg_inf_short", "-inf", true),
    ("nan_in_arr", "[NaN]", true),
    ("inf_in_arr", "[inf]", true),
    ("arr_inf_trailing", "[inf,]", true),
    ("inf_in_obj", "{\"a\":-Infinity}", true),
    ("nan_trailing_ws", "NaN ", true),
    ("nanx", "NaNx", false),
    ("infinityx", "Infinityx", false),
    ("infin", "infin", false), // inity suffix is all-or-nothing
    ("plus_nan", "+NaN", false),
    ("plus_inf", "+inf", false),
    // numbers per RFC
    ("num_0", "0", true),
    ("num_neg0", "-0", true),
    ("num_0_0", "0.0", true),
    ("num_0e0", "0e0", true),
    ("num_exp_plus", "1e+10", true),
    ("num_big_exp", "1e99999999", true),
    ("num_plus", "+1", false),
    ("num_dot", "1.", false),
    ("num_dotlead", ".5", false),
    ("num_neg_dot", "-.5", false),
    ("num_exp_empty", "1e", false),
    ("num_dot_exp_empty", "1.5e", false),
    ("num_exp_plusminus", "1e+-1", false),
    ("num_leading_zero", "01", false),
    ("obj_leading_zero", "{\"a\":01}", false),
    ("num_00", "00", false),
    ("num_minus", "-", false),
    ("num_hex", "0x1", false),
    ("num_1edot", "1.e5", false),
    ("num_trail_junk", "1a", false),
    ("num_double_dot", "1.2.3", false),
    // strings
    ("esc_ok", "\"a\\n\\t\\u0041\"", true),
    ("esc_nul", "\"a\\u0000b\"", true),
    ("esc_solidus", "\"\\/\"", true),
    ("esc_bad", "\"\\x41\"", false),
    ("esc_upper_u", "\"\\U0041\"", false),
    ("esc_trunc_u", "\"\\u00\"", false),
    ("esc_u_nonhex", "\"\\u00g0\"", false),
    ("raw_ctrl_in_str", "\"a" + 0x01.toChar + "b\"", false),
    ("raw_tab_in_str", "\"a\tb\"", false),
    ("raw_del_in_str", "\"a" + 0x7f.toChar + "b\"", true), // 0x7F is NOT < 0x20
    ("raw_0085_in_str", "\"a" + 0x85.toChar + "b\"", true),
    ("raw_2028_in_str", "\"a" + 0x2028.toChar + "b\"", true),
    ("lone_hi_surrogate", "\"\\ud800\"", false),
    ("lo_then_hi", "\"\\ude00\\ud83d\"", false),
    ("surrogate_pair", "\"\\ud83d\\ude00\"", true),
    ("unterminated", "\"abc", false),
    // depth (DuckDB has no limit; validator must be iterative)
    ("deep_64", "[" * 64 + "1" + "]" * 64, true),
    ("deep_2000", "[" * 2000 + "1" + "]" * 2000, true),
    ("deep_mixed", "{\"a\":" * 100 + "1" + "}" * 100, true))

  test("interpreted eval matches the DuckDB truth table on every case") {
    val bad = truth.collect { case (name, doc, want) if v(doc) != want =>
      s"$name: got ${v(doc)}, duckdb says $want"
    }
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("codegen path agrees with interpreted eval on the full table") {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("name",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("doc",
        org.apache.spark.sql.types.StringType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        truth.map { case (n, d, _) => org.apache.spark.sql.Row(n, d) }),
      schema)
    val got = df.select(col("name"),
      JsonValidExpr.jsonValidCol(col("doc")).as("valid"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    val want = truth.map { case (n, _, e) => n -> e }.toMap
    val bad = want.keys.filter(k => got(k) != want(k))
    assert(bad.isEmpty, bad.map(k => s"$k: got ${got(k)}, want ${want(k)}")
      .mkString("; "))
  }

  test("NULL input stays NULL; invalid UTF-8 bytes are invalid " +
      "(engine-only: DuckDB cannot store invalid UTF-8 to compare)") {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc",
        org.apache.spark.sql.types.StringType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(org.apache.spark.sql.Row(null.asInstanceOf[String]))), schema)
    assert(df.select(JsonValidExpr.jsonValidCol(col("doc"))).head.isNullAt(0))
    // overlong 2-byte encoding of '/' (0xC0 0xAF), lone continuation,
    // encoded surrogate (0xED 0xA0 0x80), lead truncated at EOF
    def bytes(bs: Int*): UTF8String =
      UTF8String.fromBytes(bs.map(_.toByte).toArray)
    val q = '"'.toInt
    assert(!JsonValidExpr.isValid(bytes(q, 0xC0, 0xAF, q)))
    assert(!JsonValidExpr.isValid(bytes(q, 0x80, q)))
    assert(!JsonValidExpr.isValid(bytes(q, 0xED, 0xA0, 0x80, q)))
    assert(!JsonValidExpr.isValid(bytes(q, 0xE2, 0x80)))
    assert(!JsonValidExpr.isValid(bytes(q, 0xF5, 0x80, 0x80, 0x80, q)))
    // and the well-formed 4-byte astral char is fine raw
    assert(JsonValidExpr.isValid(bytes(q, 0xF0, 0x9F, 0x98, 0x80, q)))
  }
}
