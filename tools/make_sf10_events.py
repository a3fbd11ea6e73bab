"""Build the sf10 EVENTS rung (10x sf1) for the window/asof/resample family.

Same key-shifted-copies construction as make_sf10_tpch.py: 10 copies of
.localdata/sf1/events.parquet with per-copy event_id/user_id shifts and a
per-copy +31-day timestamp shift — so positional windows see 10x the rows,
time-based windows see 10x the history at the SAME density (window row
counts stay constant, group counts grow 10x: the healthy scale shape), and
per-user series grow in USER count, not per-user length.

Output: /root/repo/.localdata/sf10_tpch/events.parquet (joins the existing
structured rung so one directory serves the whole window family).
Usage:  python tools/make_sf1.py && python tools/make_sf10_tpch.py &&
        python tools/make_sf10_events.py
"""

from __future__ import annotations

import os

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(REPO, ".localdata", "sf1")
DST = os.path.join(REPO, ".localdata", "sf10_tpch")
COPIES = 10


def main() -> None:
    src = os.path.join(SRC, "events.parquet")
    assert os.path.exists(src), "run make_sf1.py first"
    assert os.path.exists(DST), "run make_sf10_tpch.py first"
    con = duckdb.connect()
    e_shift, u_shift = con.sql(
        f"SELECT MAX(event_id) + 1, MAX(user_id) + 1 FROM read_parquet('{src}')"
    ).fetchone()
    con.sql(
        f"""
        COPY (
            SELECT event_id + cp.c * {e_shift} AS event_id,
                   ts + INTERVAL (cp.c * 31) DAY AS ts,
                   user_id + cp.c * {u_shift} AS user_id,
                   event_type, value, props
            FROM read_parquet('{src}') t,
                 (SELECT UNNEST(range({COPIES})) AS c) cp
        ) TO '{DST}/events.parquet' (FORMAT PARQUET)
        """
    )
    n = con.sql(f"SELECT COUNT(*) FROM read_parquet('{DST}/events.parquet')").fetchone()[0]
    print(f"events: {n} rows -> {DST}/events.parquet")


if __name__ == "__main__":
    main()
