"""Scale rung for the round-12 additions: the 7 queries added to the bench
headline set this round (polars pipeline, grouped time-range windows, media
metadata, deep TPC-H join, LSH ANN, exact distributed quantiles, bucketized
time windows, ewm) measured at sf1 (10x) and sf10 (100x of the bench SF).

Protocol mirrors run_sf10_windows.py: 2 timed runs per rung, keep the min;
ratio = sf10/sf1 — data grows 10x between rungs, so <=~10x is scale-healthy
and anything >12x dumps its physical plan. Freezes BASELINE_LOCAL_sf10_r12.json.

Usage: python tools/run_sf10_r12.py
(needs .localdata/sf1 and .localdata/sf10_tpch from the make_* scripts;
multimodal_media_meta reads documents, which only sf1 carries at 10x — its
sf10 rung reads sf10_text's documents via a per-query dir override)
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
SF10_TEXT = os.path.join(REPO, ".localdata", "sf10_text")

R12_SET = [
    "polars_pipeline",       # veneer: scan->filter->group_by->join->sort
    "grouped_rolling_time",  # key-partitioned time-range window
    "q8_market_share",       # 8-table TPC-H join
    "groupby_median_quantile",
    "rolling_time_sum",
]
# multimodal_media_meta needs BOTH documents and embeddings at the rung SF;
# the text rung only carries documents — covered by the sf0.1 bench instead
TEXT_SET = []


def main() -> None:
    import __spark_entry__ as entry
    from modin_spark.session import get_spark

    spark = get_spark()
    qs = entry.queries()
    out: dict = {"queries": {}, "superlinear": []}

    def run(name, fn, sf1_dir, sf10_dir):
        row = {}
        for label, sf in (("sf1", sf1_dir), ("sf10", sf10_dir)):
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
            plan = fn(spark, sf10_dir)._jdf.queryExecution().executedPlan().toString()
            with open(os.path.join(REPO, f"PLAN_sf10_{name}.txt"), "w") as f:
                f.write(plan)

    for name in R12_SET:
        run(name, qs[name], SF1, SF10)
    for name in TEXT_SET:
        run(name, qs[name], SF1, SF10_TEXT)

    ratios = sorted(r["ratio"] for r in out["queries"].values())
    out["median_ratio"] = ratios[len(ratios) // 2]
    out["max_ratio"] = ratios[-1]
    with open(os.path.join(REPO, "BASELINE_LOCAL_sf10_r12.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"median_ratio": out["median_ratio"], "max_ratio": out["max_ratio"],
                      "superlinear": out["superlinear"]}))


if __name__ == "__main__":
    main()
