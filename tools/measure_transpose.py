"""Measure the distributed-transpose width budget on this JVM (VERDICT r7
item 3): the map-collect plan's comment claims 20k transposed columns is
feasible; the shipped default is 10k.  Time the full T round at widths
5k/10k/15k/20k and report wall + the wide-projection build time so the
default can be set at the measured knee.

The input is a tall-narrow mixed-dtype frame (w rows x 4 cols) built from
lineitem — transposing it produces a 4 x w frame, exactly the shape the
budget guards.  Each width is timed as min of 2 runs (ASV protocol).

Usage: python tools/measure_transpose.py [widths...]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    widths = [int(w) for w in sys.argv[1:]] or [5_000, 10_000, 15_000, 20_000]
    os.environ["SPARK_GRAFT_TRANSPOSE_MAX_COLS"] = str(max(widths) + 1)

    import modin_spark.pandas as mpd
    from modin_spark.session import get_spark

    spark = get_spark()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    li = mpd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"))

    results = {}
    for w in widths:
        # mixed dtypes (bigint, double, string) so the measurement covers the
        # stringified melt + per-column retype probe, the expensive variant
        base = li[["l_orderkey", "l_quantity", "l_returnflag", "l_extendedprice"]].head(w)
        runs = []
        for _ in range(2):
            t0 = time.time()
            t = base.T
            t1 = time.time()
            n = len(t.columns)
            t._frame.sdf.count()
            runs.append((time.time() - t0, t1 - t0))
            assert n == w, (n, w)
        wall = min(r[0] for r in runs)
        build = min(r[1] for r in runs)
        results[w] = {"wall_s": round(wall, 2), "build_s": round(build, 2)}
        print(f"w={w}: wall {wall:.1f}s (build {build:.1f}s)", file=sys.stderr)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
