"""Build the sf10 STRUCTURED rung (100x sf0.1) for the TPC-H/join family.

Same key-shifted-copies construction as tools/make_sf1.py, one rung up:
10 copies of .localdata/sf1 with per-copy key shifts, so copy i's orders
reference copy i's customers — join fan-outs, cardinality ratios and group
counts scale linearly while filter selectivities stay identical. Only the
7 structured tables (the text/embedding family has its own 100x rung in
make_sf10_text.py).

Output: /root/repo/.localdata/sf10_tpch/*.parquet (gitignored, ~1.7 GB).
Usage:  python tools/make_sf1.py && python tools/make_sf10_tpch.py
"""

from __future__ import annotations

import os

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(REPO, ".localdata", "sf1")
DST = os.path.join(REPO, ".localdata", "sf10_tpch")
COPIES = 10


def main() -> None:
    assert os.path.exists(os.path.join(SRC, "lineitem.parquet")), "run make_sf1.py first"
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    rp = lambda t: f"read_parquet('{SRC}/{t}.parquet')"

    for t in ("region", "nation"):
        con.sql(f"COPY (SELECT * FROM {rp(t)}) TO '{DST}/{t}.parquet' (FORMAT PARQUET)")

    shifts = {}
    for t, k in (("customer", "c_custkey"), ("supplier", "s_suppkey"),
                 ("part", "p_partkey"), ("orders", "o_orderkey")):
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
    print(f"sf10_tpch written to {DST}")


if __name__ == "__main__":
    main()
