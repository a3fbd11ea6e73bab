"""Scale rung for the round-12 pairwise/grouped window machinery:
rolling corr/cov pairs (one block+halo pass of F.corr window aggregates),
expanding pairwise covariance (algebraic block carries), the frame-self
rolling corr matrix (k^2 aggregates + posexplode), groupby().ewm() and
groupby().rolling().apply() (grouped_pandas_transform: per-group exact
pandas, rejoin on position).

Protocol mirrors run_sf10_windows.py: events at sf1 (1M rows) and sf10
(10M rows), 2 timed runs per rung keep the min; ratio = sf10/sf1 — data
grows 10x, so <=~10x is scale-healthy. Freezes BASELINE_LOCAL_sf10_pairs.json.

Usage: python tools/make_sf1.py && python tools/make_sf10_tpch.py &&
       python tools/make_sf10_events.py && python tools/run_sf10_pairs.py
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
SF1 = os.path.join(REPO, ".localdata", "sf1")
SF10 = os.path.join(REPO, ".localdata", "sf10_tpch")


def _rolling_pair(mpd, sf):
    ev = mpd.read_parquet(f"{sf}/events.parquet").sort_values("event_id")
    x = ev["value"]
    r = x.rolling(7).corr(x.shift(1))
    return r.fillna(-9.0)._to_frame("c").sdf


def _expanding_pair(mpd, sf):
    ev = mpd.read_parquet(f"{sf}/events.parquet").sort_values("event_id")
    x = ev["value"]
    r = x.expanding(min_periods=3).cov(x.shift(2))
    return r.fillna(-9.0)._to_frame("c").sdf


def _rolling_matrix(mpd, sf):
    ev = mpd.read_parquet(f"{sf}/events.parquet").sort_values("event_id")
    d = ev[["value"]]
    d["v2"] = ev["value"] * 0.5 + ev["user_id"] % 7
    return d.rolling(7).corr()._frame.sdf


def _grouped_ewm(mpd, sf):
    ev = mpd.read_parquet(f"{sf}/events.parquet")
    return ev.groupby("event_type")[["value"]].ewm(alpha=0.3).mean()._frame.sdf


def _grouped_rolling_apply(mpd, sf):
    import numpy as np

    ev = mpd.read_parquet(f"{sf}/events.parquet")
    r = ev.groupby("event_type").rolling(5, min_periods=1)[["value"]].apply(np.nanmean, raw=True)
    return r._frame.sdf


QUERIES = {
    "rolling_pair_corr": _rolling_pair,
    "expanding_pair_cov": _expanding_pair,
    "rolling_matrix_corr": _rolling_matrix,
    "grouped_ewm_mean": _grouped_ewm,
    "grouped_rolling_apply": _grouped_rolling_apply,
}


def main() -> None:
    import modin_spark.pandas as mpd

    out: dict = {"queries": {}, "superlinear": []}
    for name, fn in QUERIES.items():
        row = {}
        for label, sf in (("sf1", SF1), ("sf10", SF10)):
            best = None
            for _ in range(2):
                t0 = time.time()
                n = fn(mpd, sf).count()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            row[label] = round(best, 3)
            row[f"{label}_rows"] = n
        row["ratio"] = round(row["sf10"] / row["sf1"], 2) if row["sf1"] else None
        out["queries"][name] = row
        if row["ratio"] and row["ratio"] > 12:
            out["superlinear"].append(name)
        print(f"{name:24s} sf1={row['sf1']:.2f}s sf10={row['sf10']:.2f}s ratio={row['ratio']}")
    with open(os.path.join(REPO, "BASELINE_LOCAL_sf10_pairs.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("superlinear:", out["superlinear"])


if __name__ == "__main__":
    main()
