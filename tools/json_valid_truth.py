#!/usr/bin/env python3
"""Regenerate the DuckDB `json_valid` ground truth that
graft.JsonValidSpec pins (r15): every (name, document) case below is
run through `SELECT json_valid(?)` on the checker's DuckDB and printed
as `DUCK <name> <True|False>`. JsonValidExpr (the Spark-side byte-exact
replica) must agree on every row; if a DuckDB upgrade shifts any of
these, JsonValidSpec's table and the expression must follow.

Usage: python3 tools/json_valid_truth.py
"""
import duckdb

CASES_RFC = [
    ("valid_obj", '{"k":1}'),
    ("empty_obj", "{}"),
    ("empty_arr", "[]"),
    ("nested", '{"k":"v","nested":{"deep":{"deeper":[1,2,3]}}}'),
    ("unicode", '{"ключ":"значение"}'),
    ("bignum", '{"a":1e999}'),
    ("anull", '{"a":null}'),
    ("dup", '{"dup":1,"dup":2}'),
    ("quote", '{"s":"with \\"quote"}'),
    ("negzero", '{"n":-0.0}'),
    ("not_json", "not json at all"),
    ("trunc", '{"a":'),
    ("bare_null", "null"),
    ("sp_null", " null "),
    ("ws_null", "\tnull\r\n"),
    ("nullx", "nullx"),
    ("null_0085", "null" + chr(0x85)),
    ("null_2028", " null " + chr(0x2028)),
    ("null_2029", "null" + chr(0x2029)),
    ("bare_num", "42"),
    ("bare_str", '"s"'),
    ("bare_true", "true"),
    ("trailing", "{} {}"),
    ("single_quote", "{'a':1}"),
    ("unquoted_key", "{a:1}"),
    ("trailing_comma", "[1,2,]"),
    ("nan_lit", "NaN"),
    ("leading_zero", '{"a":01}'),
    # number edges
    ("num_plus", "+1"),
    ("num_dot", "1."),
    ("num_dotlead", ".5"),
    ("num_0", "0"),
    ("num_neg0", "-0"),
    ("num_exp", "1e+10"),
    ("num_expempty", "1e"),
    ("num_01", "01"),
    ("num_minus", "-"),
    ("num_big_exp", "1e99999999"),
    ("inf_lit", "Infinity"),
    ("neg_inf", "-Infinity"),
    # string edges
    ("esc_ok", '"a\\n\\t\\u0041"'),
    ("esc_bad", '"\\x41"'),
    ("esc_trunc_u", '"\\u00"'),
    ("raw_ctrl", '"a' + chr(0x01) + 'b"'),
    ("raw_tab_in_str", '"a\tb"'),
    ("lone_hi_surrogate", '"\\ud800"'),
    ("surrogate_pair", '"\\ud83d\\ude00"'),
    ("lo_then_hi", '"\\ude00\\ud83d"'),
    ("unterminated", '"abc'),
    # structure edges
    ("colon_missing", '{"a" 1}'),
    ("comma_missing", "[1 2]"),
    ("obj_trailing_comma", '{"a":1,}'),
    ("deep_nest", "[" * 64 + "1" + "]" * 64),
    ("deeper_nest", "[" * 2000 + "1" + "]" * 2000),
    ("empty_str_doc", ""),
    ("only_ws", " \t\r\n "),
    ("two_roots", "1 2"),
    ("true_trailing_ws", "true \t\r\n"),
    ("arr_null", "[null]"),
]

CASES_EXT = [
    ("neg_nan", "-NaN"),
    ("nan_lower", "nan"),
    ("inf_lower", "infinity"),
    ("inf_short", "inf"),
    ("neg_inf_short", "-inf"),
    ("nan_in_arr", "[NaN]"),
    ("inf_in_obj", '{"a":-Infinity}'),
    ("nan_trailing", "NaN "),
    ("nanx", "NaNx"),
    ("infinity_x", "Infinityx"),
    ("arr_just_comma", "[,]"),
    ("obj_just_comma", "{,}"),
    ("arr_double_comma", "[1,,2]"),
    ("arr_two_trailing", "[1,,]"),
    ("obj_two_trailing", '{"a":1,,}'),
    ("comment_line", "[1] // c"),
    ("comment_block", "/*c*/[1]"),
    ("hex_num", "0x1"),
    ("num_1edot", "1.e5"),
    ("num_dot_exp", "1.5e"),
    ("esc_nul", '"a\\u0000b"'),
    ("esc_solidus", '"\\/"'),
    ("esc_upper_u", '"\\U0041"'),
    ("esc_u_nonhex", '"\\u00g0"'),
    ("bom", "﻿{}"),
    ("obj_key_nonstr", '{1:2}'),
    ("obj_missing_val", '{"a":}'),
    ("arr_trailing_after_comma_ws", "[1, \t\r\n]"),
    ("obj_trailing_comma_ws", '{"a":1 , }'),
    ("empty_arr_ws", "[ ]"),
    ("empty_obj_ws", "{ }"),
    ("str_del_char", '"a' + chr(0x7f) + 'b"'),
    ("str_u0085", '"a' + chr(0x85) + 'b"'),
    ("str_u2028", '"a' + chr(0x2028) + 'b"'),
    ("true_case", "True"),
    ("null_case", "NULL"),
    ("num_neg_dot", "-.5"),
    ("num_0e0", "0e0"),
    ("num_00", "00"),
    ("num_0_0", "0.0"),
    ("num_exp_plusminus", "1e+-1"),
    ("num_trail_junk", "1a"),
    ("num_1_2", "1.2.3"),
    ("deep_mixed", '{"a":' * 100 + '1' + '}' * 100),
]

con = duckdb.connect()
print("duckdb", duckdb.__version__)
for name, s in CASES_RFC + CASES_EXT:
    try:
        v = con.sql("select json_valid(?)", params=[s]).fetchone()[0]
    except Exception as e:
        v = "ERR:" + str(e)[:60]
    print("DUCK", name, v)
