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


if __name__ == "__main__":
    build(sys.argv[1] if len(sys.argv) > 1 else "/tmp/advcorpus")
