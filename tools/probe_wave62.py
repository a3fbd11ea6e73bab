"""Probe wave 62 (r15): CHAIN FUZZER — randomized 3-5 step pipelines
(filter/assign/rename/sort/groupby-transform/fillna/clip/head/reset_index
/melt/astype...) composed over a mixed-dtype frame, engine vs pandas at
the end of each chain. Single-op probes can't see cross-op interaction
bugs (lost metadata, stale order, alignment drift); chains can.

Usage: python tools/probe_wave62.py [--verbose] [--seed N] [--n N]
"""
import os
import sys
import warnings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
warnings.filterwarnings("ignore")

import numpy as np
import pandas as pd

import modin_spark.pandas as mpd

VERBOSE = "--verbose" in sys.argv
SEED = int(sys.argv[sys.argv.index("--seed") + 1]) if "--seed" in sys.argv else 62
N_CHAINS = int(sys.argv[sys.argv.index("--n") + 1]) if "--n" in sys.argv else 40
RESULTS = []


def base_frame():
    return pd.DataFrame({
        "g": ["a", "b", "a", "c", "b", "a", None, "c"],
        "x": [1.0, 2.5, np.nan, 4.0, 5.5, -1.0, 7.0, 0.0],
        "y": [10, 20, 30, 40, 50, 60, 70, 80],
        "s": ["foo", "bar", None, "baz", "qux", "foo", "bar", "fizz"],
        "t": pd.to_datetime([
            "2024-01-01", "2024-01-03", "2024-01-02", "2024-01-05",
            "2024-01-04", "2024-01-08", "2024-01-06", "2024-01-07"]),
    })


# each step: (name, fn) with fn(df) -> df, valid for BOTH pandas and engine
STEPS = [
    ("filter_x", lambda d: d[d.x > 0]),
    ("filter_notna", lambda d: d[d.x.notna()]),
    ("assign_z", lambda d: d.assign(z=d.x * 2 + 1)),
    ("assign_ratio", lambda d: d.assign(r=d.x / d.y)),
    ("rename_cols", lambda d: d.rename(columns={"x": "xx"}).rename(columns={"xx": "x"})),
    ("sort_x", lambda d: d.sort_values("x", na_position="first")),
    ("sort_two", lambda d: d.sort_values(["g", "y"], ascending=[True, False])),
    ("fillna_x", lambda d: d.fillna({"x": -9.0})),
    ("ffill", lambda d: d.ffill()),
    ("clip_x", lambda d: d.assign(x=d.x.clip(-0.5, 5.0))),
    ("head5", lambda d: d.head(5)),
    ("tail4", lambda d: d.tail(4)),
    ("reset_idx", lambda d: d.reset_index(drop=True)),
    ("drop_s", lambda d: d.drop(columns=["s"]) if "s" in d.columns else d),
    ("dedup_g", lambda d: d.drop_duplicates(subset=["g"])),
    ("str_upper", lambda d: d.assign(s=d.s.str.upper()) if "s" in d.columns else d),
    ("abs_x", lambda d: d.assign(x=d.x.abs())),
    ("cumsum_y", lambda d: d.assign(cy=d.y.cumsum())),
    ("rank_x", lambda d: d.assign(rk=d.x.rank(method="min"))),
    ("shift_y", lambda d: d.assign(sy=d.y.shift(1))),
    ("diff_y", lambda d: d.assign(dy=d.y.diff())),
    ("gb_transform", lambda d: d.assign(gm=d.groupby("g").y.transform("mean"))
        if "g" in d.columns else d),
    ("nlargest", lambda d: d.nlargest(4, "y")),
    ("set_reset", lambda d: d.set_index("y").reset_index()),
    ("astype_float", lambda d: d.assign(y=d.y.astype("float64"))),
    ("isin_filter", lambda d: d[d.g.isin(["a", "b"])] if "g" in d.columns else d),
    ("where_mask", lambda d: d.assign(x=d.x.where(d.x > 1))),
    ("dt_day", lambda d: d.assign(day=d.t.dt.day) if "t" in d.columns else d),
]


def run_chain(rng, steps_idx):
    p = base_frame()
    m = mpd.DataFrame(base_frame())
    applied = []
    for si in steps_idx:
        name, fn = STEPS[si]
        try:
            p2 = fn(p)
        except Exception:
            continue  # invalid for current shape; skip on both sides
        try:
            m2 = fn(m)
        except Exception as e:
            return applied + [name], f"engine raised {type(e).__name__}: {str(e)[:120]}"
        p, m = p2, m2
        applied.append(name)
        if len(p) == 0:
            break
    try:
        got = m.to_pandas().reset_index(drop=True)
        exp = p.reset_index(drop=True)
        pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                      check_index_type=False, check_column_type=False,
                                      check_freq=False)
        return applied, None
    except Exception as e:
        return applied, str(e).replace("\n", " | ")[:200]


rng = np.random.default_rng(SEED)
nfail = 0
for ci in range(N_CHAINS):
    k = int(rng.integers(3, 6))
    steps_idx = list(rng.integers(0, len(STEPS), k))
    applied, err = run_chain(rng, steps_idx)
    ok = err is None
    RESULTS.append(ok)
    if VERBOSE or not ok:
        print(("PASS " if ok else "FAIL ") + f"chain{ci}: {' -> '.join(applied)}"
              + ("" if ok else f"  :: {err}"))
    nfail += 0 if ok else 1

print(f"\n{len(RESULTS) - nfail}/{len(RESULTS)} chains passed, {nfail} failed")
sys.exit(0 if nfail == 0 else 1)
