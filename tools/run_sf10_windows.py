"""Run the window/asof/resample/rank family at the sf1 (10x) and sf10 (100x)
rungs and freeze BASELINE_LOCAL_sf10_windows.json.

VERDICT r10 item 7: TPC-H and text both have measured 100x rungs; the
window family (block+halo order machinery) only had sf0.1 numbers. Protocol
mirrors tools/run_sf10_tpch.py: 2 timed runs per query per rung, keep the
min (ASV convention), record the sf10/sf1 ratio. Data grows 10x between
rungs, so a scale-healthy query lands at <= ~10x; anything above ~12x is a
finding and gets its physical plan dumped.

Usage: python tools/make_sf1.py && python tools/make_sf10_tpch.py &&
       python tools/make_sf10_events.py && python tools/run_sf10_windows.py
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

WINDOW_FAMILY = [
    # positional windows over events (block+halo)
    "rolling_mean", "rolling_corr_pair", "ewm_mean", "expanding_median_p90",
    "win_weighted_var", "shift_diff", "pct_change_value",
    # time-based window / resample over events
    "rolling_time_sum", "resample_hourly", "resample_ffill", "resample_interp",
    # global rank / grouped cumulatives over orders
    "rank_min", "rank_frame", "cumsum_by_group",
    # ordered merges
    "asof_join", "asof_nearest",
]


def _ewm_mean_full(spark, sf):
    """Rung-local ewm variant over the FULL events table. The registry's
    ewm_mean caps at head(4000) so its DuckDB oracle (driver-side recursion)
    stays tractable — which makes its sf1==sf10 time pure fixed overhead.
    This variant measures the actual decay-truncation halo data path."""
    import __spark_entry__ as entry

    mpd = entry._mpd()
    ev = mpd.read_parquet(f"{sf}/events.parquet")
    ev2 = ev.sort_values("event_id").set_index("event_id")
    return ev2[["value"]].ewm(span=9).mean().reset_index().to_spark(ordered=False)


# rung-only overrides: same operator, uncapped data (the registry caps some
# inputs purely for oracle tractability, which defeats a scale rung)
OVERRIDES = {"ewm_mean": _ewm_mean_full}


def main() -> None:
    import __spark_entry__ as entry
    from modin_spark.session import get_spark

    spark = get_spark()
    qs = entry.queries()
    out: dict = {"queries": {}, "superlinear": []}

    for name in WINDOW_FAMILY:
        fn = OVERRIDES.get(name, qs[name])
        row: dict = {}
        for label, sf in (("sf1", SF1), ("sf10", SF10)):
            runs = []
            for _ in range(2):
                t0 = time.time()
                fn(spark, sf).count()
                runs.append(time.time() - t0)
            row[label] = round(min(runs), 3)
        row["ratio"] = round(row["sf10"] / max(row["sf1"], 1e-9), 2)
        out["queries"][name] = row
        flag = " <-- SUPERLINEAR" if row["ratio"] > 12 else ""
        print(f"{name}: sf1 {row['sf1']}s sf10 {row['sf10']}s ratio {row['ratio']}x{flag}")
        if row["ratio"] > 12:
            out["superlinear"].append(name)
            plan = fn(spark, SF10)._jdf.queryExecution().executedPlan().toString()
            with open(os.path.join(REPO, f"PLAN_sf10_{name}.txt"), "w") as f:
                f.write(plan)

    ratios = sorted(r["ratio"] for r in out["queries"].values())
    out["median_ratio"] = ratios[len(ratios) // 2]
    out["max_ratio"] = ratios[-1]
    with open(os.path.join(REPO, "BASELINE_LOCAL_sf10_windows.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"median_ratio": out["median_ratio"], "max_ratio": out["max_ratio"],
                      "superlinear": out["superlinear"]}))


if __name__ == "__main__":
    main()
