"""Build the sf10 TEXT rung: documents at 100x sf0.1 volume (500k docs),
for the corpus-scan scaling study only (VERDICT r7 item 7).

The text-bound family (clean_corpus, topk_ngrams, decontaminate, langid,
paragraph_dedup, fingerprint, token_stats, pii_scrub, repetition,
chunk_windows, minhash) reads ONLY the documents table, so this rung ships
documents alone — the other tables would be dead weight at 100 copies.

Same construction as tools/make_sf1.py (and for the same measured reason):
per-copy word SUFFIX, not rotation — a cyclic rotation preserves the
k-shingle window multiset, which turned every doc into a ~N-clique of >=0.8
near-dups at the 10x rung (37x measured blowup); suffixing every word with
the copy id preserves the dup structure bijectively WITHIN a copy while no
shingle matches ACROSS copies, which is what a naturally-100x corpus looks
like to MinHash/SimHash.

Output: /root/repo/.localdata/sf10_text/documents.parquet (gitignored).
Usage:  python tools/make_sf10_text.py
"""

from __future__ import annotations

import os

import duckdb

SRC = "/root/testdata/sf0.1"
DST = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".localdata", "sf10_text"
)
COPIES = 100


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    rp = f"read_parquet('{SRC}/documents.parquet')"
    D = con.sql(f"SELECT MAX(doc_id) + 1 FROM {rp}").fetchone()[0]
    con.sql(
        f"""COPY (
            SELECT doc_id + cp.c * {D} AS doc_id,
                   CASE WHEN cp.c = 0 THEN text ELSE
                     regexp_replace(text, '(\\S+)', '\\1q' || CAST(cp.c AS VARCHAR), 'g')
                   END AS text,
                   lang, source, n_chars
            FROM {rp} t, (SELECT UNNEST(range({COPIES})) AS c) cp
        ) TO '{DST}/documents.parquet' (FORMAT PARQUET)"""
    )
    n = con.sql(f"SELECT COUNT(*) FROM read_parquet('{DST}/documents.parquet')").fetchone()[0]
    print(f"documents: {n} rows -> {DST}")


if __name__ == "__main__":
    main()
