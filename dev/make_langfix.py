#!/usr/bin/env python3
"""Derive a CLASSIFIER-BOUNDED language-eval corpus from the sf0.1 fixture.

VERDICT r18 #3: the driver fixture's `lang` labels are uncorrelated with
token content (English-ish word soup for every label), so `t_eval_prf`'s
corpus readout is data-bounded — non-en recall is 0 by construction, not
by classifier failure. This builds a DERIVED corpus under target/langfix
(never under /root/testdata) whose labels DO correlate with genuine
function words: every doc keeps its original soup tokens, and after each
4th token one marker from ITS LABELED LANGUAGE's marker list is
interleaved (cycling deterministically through the list), so ~20% of
tokens are real de/es/fr/zh/en function words matching the label. The
text's structure (length class, per-doc vocabulary, source spread) is
preserved; only the language evidence is added.

MARKERS mirrors graft.operators.TextQueries.LangMarkers
(TextQueries.scala:39-44) — the point is to exercise THAT lexicon, so a
lexicon change should be mirrored here (a mismatch shows up as recall
collapse, not a silent pass).

Other tables are symlinked from sf0.1 so tools/oracle_check.py's
all-table view registration works against this directory.

Usage: python3 dev/make_langfix.py [outDir]   (default target/langfix)
"""
import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "target/langfix"

MARKERS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "for", "on"],
    "de": ["der", "die", "das", "und", "ist", "ein", "mit", "nicht", "auf", "sich"],
    "es": ["el", "los", "las", "por", "una", "con", "para", "como", "pero", "esta"],
    "fr": ["le", "les", "et", "une", "est", "dans", "pour", "pas", "vous", "sur"],
    "zh": ["的", "是", "了", "在", "和", "有", "不", "人", "这", "中"],
}


def enrich(text: str, lang: str) -> str:
    ms = MARKERS.get(lang)
    if not ms or not text:
        return text
    out = []
    for i, tok in enumerate(text.split(" ")):
        out.append(tok)
        if i % 4 == 3:
            out.append(ms[(i // 4) % len(ms)])
    return " ".join(out)


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT doc_id, text, lang, source FROM '{SRC}/documents.parquet' "
        "ORDER BY doc_id").fetchall()
    enriched = []
    for doc_id, text, lang, source in rows:
        et = enrich(text, lang)
        enriched.append(
            (doc_id, et, lang, source, len(et) if text is not None else None))
    con.execute(
        "CREATE TABLE docs (doc_id BIGINT, text VARCHAR, lang VARCHAR, "
        "source VARCHAR, n_chars BIGINT)")
    con.executemany("INSERT INTO docs VALUES (?, ?, ?, ?, ?)", enriched)
    con.sql(f"COPY docs TO '{OUT}/documents.parquet' (FORMAT PARQUET)")
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "embeddings"]:
        dst = f"{OUT}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SRC}/{t}.parquet", dst)
    n = con.sql(f"SELECT count(*) FROM '{OUT}/documents.parquet'").fetchone()[0]
    print(f"wrote {OUT}/documents.parquet ({n} docs, labels now correlate "
          "with marker content)")


if __name__ == "__main__":
    main()
