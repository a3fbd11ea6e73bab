"""Adversarial-TIE rung for the distributed order-statistic kernels.

The expanding rank/quantile kernels bucket rows by VALUE (ties are
indivisible — same value must share a bucket, the same hot-key bound as a
groupby). A constant or 90%-one-value column therefore funnels (almost)
the whole column into ONE stage-2 task. This rung proves the r14
degenerate-tie fast paths hold: the hot bucket is answered with O(n)
numpy (m==1: free; m<=64: chunked histogram; else vectorized
merge-count), never a per-row Python Fenwick sweep.

Columns at N rows (default 5M):
- uniform: continuous values, no ties (the balanced reference)
- constant: ONE value everywhere (worst case: one bucket holds all rows)
- zipf:    90% one value, the rest zipf-ish over 50 values (hot bucket
           with a few distinct values)

Pass criteria, per kernel: constant/zipf wall <= 1.3x uniform wall.

Usage: python tools/run_tie_rung.py [N]   (writes BASELINE_LOCAL_ties.json)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def make_cols(spark, n: int):
    # deterministic value shapes straight from a range scan — no RNG, no
    # driver-side data
    sdf = spark.range(n).selectExpr(
        "id",
        # uniform-ish continuous: golden-ratio low-discrepancy sequence
        "(id * 0.6180339887498949) % 1.0 as uniform",
        "1.0 as constant",
        # 90% the hot value, the rest spread over 50 values zipf-ish
        "CASE WHEN pmod(hash(id), 10) < 9 THEN 7.0"
        " ELSE cast(pmod(hash(id, 1), 50) as double) END as zipf",
    )
    path = os.path.join(REPO, ".localdata", "ties.parquet")
    sdf.write.mode("overwrite").parquet(path)
    return path


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    import modin_spark.pandas as mpd
    from modin_spark.session import get_spark

    spark = get_spark()
    path = make_cols(spark, n)

    results: dict[str, dict[str, float]] = {}
    for kernel, run in {
        "expanding_rank": lambda s: s.expanding(min_periods=1).rank(),
        "expanding_median": lambda s: s.expanding(min_periods=1).median(),
        "rank": lambda s: s.rank(method="min"),
    }.items():
        results[kernel] = {}
        for col in ("uniform", "constant", "zipf"):
            df = mpd.read_parquet(path)
            t0 = time.time()
            r = run(df[col])
            cnt = r._frame.sdf.where(r._expr.isNotNull()).count() if hasattr(r, "_expr") else len(r)
            dt = time.time() - t0
            results[kernel][col] = round(dt, 3)
            print(f"{kernel:18s} {col:9s} {dt:7.2f}s  (non-null {cnt})", flush=True)

    verdicts = {}
    ok = True
    for kernel, r in results.items():
        for col in ("constant", "zipf"):
            ratio = round(r[col] / r["uniform"], 2) if r["uniform"] > 0 else 0.0
            verdicts[f"{kernel}.{col}"] = ratio
            if ratio > 1.3 and r[col] - r["uniform"] > 2.0:
                ok = False
                print(f"FLAG {kernel}.{col}: {ratio}x uniform")
    out = {"n": n, "walls": results, "ratio_vs_uniform": verdicts, "pass": ok}
    with open(os.path.join(REPO, "BASELINE_LOCAL_ties.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
