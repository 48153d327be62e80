#!/usr/bin/env python3
"""Build an adversarial-Unicode `documents` table for the out-of-contract
robustness sweep: emoji (incl. ZWJ families + flags), CJK, combining
marks / Zalgo, RTL scripts, zero-width characters, fullwidth forms,
Turkish dotted/dotless i, and quoting/separator edge cases — the text
the ASCII-ish driver corpora never exercise.

Usage:
    python3 tools/make_adversarial_corpus.py [outDir]   # default /tmp/advcorpus

Copies every sf0.001 table, replaces documents.parquet with 600
adversarial docs (planted near-dup twins every 10th doc), then:

    sbt "runMain graft.Verify <outDir> /tmp/verify_adv"
    python3 tools/check_oracle.py <outDir> /tmp/verify_adv

This sweep is what surfaced (r13): lower()'s engine-dependent Unicode
special casings (U+0130), code-point-vs-byte divergence in the
rolling-hash / XXH64-replay oracles, and Spark-vs-DuckDB levenshtein
unit mismatch — all fixed so the full board now matches 214/214 on this
corpus. Keep it green when adding text operators.
"""
import random
import shutil
import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

SF_SRC = "/root/testdata/sf0.001"


def build(out_dir: str) -> None:
    random.seed(42)
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    for p in Path(SF_SRC).glob("*.parquet"):
        shutil.copy(p, out / p.name)
    emoji = ["😀", "🚀", "🧪", "🇹🇷", "👩‍👩‍👧‍👦", "🏳️‍🌈", "𝔘𝔫𝔦𝔠𝔬𝔡𝔢", "🀄", "𓀀"]
    cjk = ["汉字文本处理", "日本語のテキスト", "한국어 텍스트", "繁體字測試"]
    comb = ["áêïõù", "ñö", "Z͑ͫ̓a̒́l͕g͖o"]
    rtl = ["نص عربي للاختبار", "טקסט עברי לבדיקה", "مرحبا بالعالم"]
    zw = ["a​b‌c‍d", "‏‎etext"]
    misc = ["tab\tsep", 'quote"in', "comma,sep", "newline escape",
            "ß groß STRASSE", "İstanbul ılık", "ＦＵＬＬＷＩＤＴＨ ｔｅｘｔ",
            "½¾⅞ fractions", "math 𝕏𝕐ℤ symbols"]
    pools = [emoji, cjk, comb, rtl, zw, misc]
    docs = []
    for i in range(600):
        n = random.randint(5, 40)
        words = [random.choice(random.choice(pools)) for _ in range(n)]
        if i % 10 == 9 and docs:  # plant a near-dup twin of the previous doc
            words = docs[-1][1].split(" ")
            words[0] = random.choice(emoji)
        t = " ".join(words)
        docs.append((i, t, random.choice(["en", "zh", "ar", "und"]),
                     "adv", len(t)))
    tbl = pa.table({
        "doc_id": pa.array([d[0] for d in docs], pa.int64()),
        "text": pa.array([d[1] for d in docs], pa.string()),
        "lang": pa.array([d[2] for d in docs], pa.string()),
        "source": pa.array([d[3] for d in docs], pa.string()),
        "n_chars": pa.array([d[4] for d in docs], pa.int64()),
    })
    pq.write_table(tbl, out / "documents.parquet")
    print(f"wrote {len(docs)} adversarial docs to {out}/documents.parquet")


def build_hostile_tables(out_dir: str) -> None:
    """Append hostile rows to events (extreme/negative/NULL timestamps,
    NULL keys, NaN/Inf/1e18 values, invalid JSON props) and embeddings
    (zero vector, NaN/Inf/null/huge components, wrong dims) — the inputs
    behind graft.ops.Validate. Write the CLEANED twins (validator rules
    replayed in DuckDB) to <out>_clean: the full board must match there.
    """
    import datetime
    out = Path(out_dir)
    ep = datetime.datetime
    src = pq.read_table(out / "events.parquet")
    adv = {
        "event_id": [100001 + i for i in range(19)],
        "ts": [ep(1970, 1, 1), ep(1969, 12, 31, 23, 59, 59), ep(2262, 4, 11),
               ep(2024, 1, 15), ep(2024, 1, 15), ep(2024, 1, 15),
               ep(2024, 1, 16), ep(2024, 1, 16), ep(2024, 1, 17),
               ep(2024, 1, 17), ep(2024, 1, 18), None,
               ep(2024, 1, 19), ep(2024, 1, 19), ep(2024, 1, 19), ep(2024, 1, 19),
               ep(2024, 1, 20), ep(2024, 1, 20), ep(2024, 1, 20)],
        "user_id": [1, 2, 3, None, 4, 4, 5, 5, 6, 7, 8, 9, 10, 10, 10, 10,
                    11, 11, 11],
        "event_type": ["click", "purchase", "click", "click", None, "",
                       "клик", "click", "purchase", "click", "error", "click",
                       "click", "click", "click", "click",
                       "click", "click", "click"],
        "value": [float("nan"), float("inf"), -float("inf"), -1.5, None, 0.0,
                  -0.0, 1e18, 1e-300, 327.53, 5.0, 2.0, 1.0, 1.0, 1.0, 1.0,
                  1.0, 1.0, 1.0],
        # null/" null "/"\tnull\r\n"/nullx: the JSON null-root class
        # (r13 ADVICE) — bare `null` and its JSON-whitespace wrappings
        # are VALID documents (json_valid = true) and must be kept by
        # the validator, while `nullx` stays invalid.
        "props": ["not json at all", '{"a":', None,
                  '{"k":"v","nested":{"deep":{"deeper":[1,2,3]}}}',
                  '{"ключ":"значение"}', "{}", "[]", '{"a":1e999}',
                  '{"a":null}', '{"dup":1,"dup":2}', '{"s":"with \\"quote"}',
                  '{"n":-0.0}', "null", " null ", "\tnull\r\n", "nullx",
                  # Java-regex line terminators that are NOT JSON
                  # whitespace: json_valid is FALSE, and the Spark
                  # null-root guard must not swallow them (r14 ADVICE)
                  "null\u0085", " null \u2028", "null\u2029"],
    }
    advt = pa.table({k: pa.array(v, src.schema.field(k).type)
                     for k, v in adv.items()})
    pq.write_table(pa.concat_tables([src, advt]), out / "events.parquet")
    esrc = pq.read_table(out / "embeddings.parquet")
    nan, inf = float("nan"), float("inf")
    vecs = [[0.0] * 64, [nan] + [0.1] * 63, [inf] + [0.1] * 63, [-0.0] * 64,
            [1e38] * 64, [1e-40] * 64, [0.1] * 32, [0.1] * 65]
    eadv = pa.table({
        "vec_id": pa.array([9001 + i for i in range(len(vecs))], pa.int64()),
        "embedding": pa.array(vecs, esrc.schema.field("embedding").type),
        "label": pa.array([i % 3 for i in range(len(vecs))], pa.int32()),
    })
    pq.write_table(pa.concat_tables([esrc, eadv]), out / "embeddings.parquet")

    dsrc = pq.read_table(out / "documents.parquet")
    dadv = {
        "doc_id": [200001, 200002, 200003, 200004, None, 200006],
        "text": [None, "", " ", "\t\n\r", "normal text here", "word " * 40000],
        "lang": ["en", None, "en", "en", "en", "en"],
        "source": ["adv", "adv", None, "adv", "adv", "adv"],
        "n_chars": [None, 0, 1, 3, 16, 200000],
    }
    dadvt = pa.table({k: pa.array(v, dsrc.schema.field(k).type)
                      for k, v in dadv.items()})
    pq.write_table(pa.concat_tables([dsrc, dadvt]), out / "documents.parquet")

    import duckdb
    clean = Path(str(out) + "_clean")
    clean.mkdir(parents=True, exist_ok=True)
    for p2 in out.glob("*.parquet"):
        shutil.copy(p2, clean / p2.name)
    con = duckdb.connect()
    con.execute(f"""COPY (
      SELECT * FROM '{out}/events.parquet'
      WHERE event_id IS NOT NULL AND user_id IS NOT NULL AND ts IS NOT NULL
        AND ts >= TIMESTAMP '1900-01-01' AND ts < TIMESTAMP '2200-01-01'
        AND (value IS NULL OR (NOT isnan(value) AND NOT isinf(value)
             AND abs(value) <= 1e12))
        AND (props IS NULL OR json_valid(props))
    ) TO '{clean}/events.parquet' (FORMAT PARQUET)""")
    con.execute(f"""COPY (
      SELECT * FROM '{out}/embeddings.parquet'
      WHERE embedding IS NOT NULL AND len(embedding) = 64
        AND NOT coalesce(list_bool_or(list_transform(embedding,
              x -> x IS NULL OR isnan(x) OR isinf(x) OR abs(x) > 1e6)), FALSE)
        AND coalesce(list_bool_or(list_transform(embedding, x -> x <> 0.0)), FALSE)
    ) TO '{clean}/embeddings.parquet' (FORMAT PARQUET)""")
    con.execute(f"""COPY (
      SELECT * FROM '{out}/documents.parquet'
      WHERE doc_id IS NOT NULL AND text IS NOT NULL AND length(text) <= 1000000
    ) TO '{clean}/documents.parquet' (FORMAT PARQUET)""")
    print(f"hostile tables written; cleaned twins in {clean}")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/advcorpus"
    build(out)
    build_hostile_tables(out)
