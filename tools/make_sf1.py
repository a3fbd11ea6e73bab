"""Build a local sf1 rung (10x sf0.1) for the scale study in COVERAGE.md.

The driver's seed-42 generator is not shipped with the repo, so sf1 is a
DETERMINISTIC 10-copy scale-up of sf0.1 that preserves the shapes that
matter for a scaling measurement:

- fact/dimension keys are shifted per copy by the source table's key range,
  so join fan-outs, key cardinality ratios, and groupby group counts scale
  linearly (copy i's orders reference copy i's customers, etc.);
- dates/values are untouched -> filter selectivities identical;
- document text gets a per-copy word SUFFIX (every word tagged with the
  copy id) so the near-dup cluster structure is preserved bijectively
  WITHIN a copy while no k-shingle matches ACROSS copies — each copy is a
  genuinely fresh corpus to MinHash, which is what a naturally-10x corpus
  looks like (a word ROTATION preserves the shingle window multiset and
  made every doc a ~10-clique of >=0.8 near-dups: 37x measured blowup);
- embeddings get a deterministic per-copy jitter for the same reason.

Output: /root/repo/.localdata/sf1/*.parquet (gitignored).
Usage:  python tools/make_sf1.py
"""

from __future__ import annotations

import os

import duckdb

SRC = "/root/testdata/sf0.1"
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".localdata", "sf1")
COPIES = 10


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    rp = lambda t: f"read_parquet('{SRC}/{t}.parquet')"

    def copy_static(t: str) -> None:
        con.sql(f"COPY (SELECT * FROM {rp(t)}) TO '{DST}/{t}.parquet' (FORMAT PARQUET)")

    for t in ("region", "nation"):
        copy_static(t)

    # key ranges (shift unit per copy = max key + 1)
    shifts = {}
    for t, k in (("customer", "c_custkey"), ("supplier", "s_suppkey"),
                 ("part", "p_partkey"), ("orders", "o_orderkey"),
                 ("events", "event_id"), ("documents", "doc_id"),
                 ("embeddings", "vec_id")):
        shifts[t] = con.sql(f"SELECT MAX({k}) + 1 FROM {rp(t)}").fetchone()[0]

    cte = f"(SELECT UNNEST(range({COPIES})) AS c) cp"

    def scale(t: str, select: str) -> None:
        con.sql(
            f"COPY (SELECT {select} FROM {rp(t)} t, {cte}) "
            f"TO '{DST}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.sql(f"SELECT COUNT(*) FROM read_parquet('{DST}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows")

    C, S, P, O = shifts["customer"], shifts["supplier"], shifts["part"], shifts["orders"]
    scale("customer", f"c_custkey + cp.c * {C} AS c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment")
    scale("supplier", f"s_suppkey + cp.c * {S} AS s_suppkey, s_name, s_nationkey, s_acctbal")
    scale("part", f"p_partkey + cp.c * {P} AS p_partkey, p_name, p_brand, p_type, p_size, p_retailprice")
    scale("orders",
          f"o_orderkey + cp.c * {O} AS o_orderkey, o_custkey + cp.c * {C} AS o_custkey, "
          "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority")
    scale("lineitem",
          f"l_orderkey + cp.c * {O} AS l_orderkey, l_partkey + cp.c * {P} AS l_partkey, "
          f"l_suppkey + cp.c * {S} AS l_suppkey, l_linenumber, l_quantity, l_extendedprice, "
          "l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate")
    E = shifts["events"]
    scale("events",
          f"event_id + cp.c * {E} AS event_id, ts, user_id + cp.c * 1000000 AS user_id, "
          "event_type, value, props")
    D = shifts["documents"]
    # Per-copy word SUFFIX, not rotation: a word-rotated copy shares all but
    # k-1 of its k-shingles with the original (a cyclic shift preserves the
    # window multiset), so rotation made every doc a ~10-clique of >=0.8
    # Jaccard near-dups and blew MinHash candidate pairs up ~50x instead of
    # 10x (measured: 37x runtime at the 10x rung). Suffixing EVERY word with
    # the copy id rewrites every shingle consistently INSIDE a copy (exact
    # and near dup structure within a copy is preserved bijectively) while
    # no shingle ever matches across copies — each copy is a genuinely fresh
    # corpus to MinHash/SimHash, which is what a naturally-10x corpus looks
    # like.
    scale("documents",
          f"doc_id + cp.c * {D} AS doc_id, "
          "CASE WHEN cp.c = 0 THEN text ELSE "
          "regexp_replace(text, '(\\S+)', '\\1q' || CAST(cp.c AS VARCHAR), 'g') END AS text, "
          "lang, source, n_chars")
    V = shifts["embeddings"]
    scale("embeddings",
          f"vec_id + cp.c * {V} AS vec_id, "
          "CASE WHEN cp.c = 0 THEN embedding ELSE "
          "list_transform(embedding, x -> CAST(x + (cp.c * 0.001) AS REAL)) END AS embedding, "
          "label")
    print(f"sf1 written to {DST}")


if __name__ == "__main__":
    main()
