"""Probe wave 40: groupby.apply label fidelity (func sees ORIGINAL row
labels; group_keys=False restores original order), nth indexer slices,
df.corrwith(Series), ewm(times=), expanding pairwise matrices.

Usage: python tools/probe_wave40.py [--verbose]
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
RESULTS = []


def _norm(x):
    if hasattr(x, "to_pandas"):
        x = x.to_pandas()
    return x


def probe(name, fn_p, fn_m):
    try:
        exp = fn_p()
        exp_exc = None
    except Exception as e:
        exp, exp_exc = None, type(e).__name__
    try:
        got = _norm(fn_m())
        got_exc = None
    except Exception as e:
        got, got_exc = None, type(e).__name__
    if exp_exc or got_exc:
        ok = exp_exc == got_exc
        detail = f"exc exp={exp_exc} got={got_exc}"
    else:
        try:
            if isinstance(exp, pd.DataFrame):
                pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                              check_index_type=False, check_column_type=False)
            elif isinstance(exp, pd.Series):
                pd.testing.assert_series_equal(got, exp, check_dtype=False,
                                               check_index_type=False, check_freq=False)
            else:
                assert got == exp or (pd.isna(got) and pd.isna(exp)), (got, exp)
            ok, detail = True, ""
        except Exception as e:
            ok, detail = False, str(e).replace("\n", " | ")[:260]
    RESULTS.append((name, ok, detail))
    if VERBOSE or not ok:
        print(("PASS " if ok else "FAIL ") + name + ("" if ok else "  :: " + detail))


def dfs():
    data = {"g": ["x", "y", "x", "y", "x"],
            "a": [1.0, 2.0, 3.0, 4.0, 5.0],
            "b": [10, 20, 30, 40, 50],
            "t": pd.date_range("2024-01-01", periods=5, freq="h")}
    return pd.DataFrame(data), mpd.DataFrame(data)


P, M = dfs()

# ---- groupby.apply label fidelity -----------------------------------------
probe("apply sees orig labels",
      lambda: P.groupby("g").apply(lambda d: d[["a"]]),
      lambda: M.groupby("g").apply(lambda d: d[["a"]]))
probe("apply transform labels named idx",
      lambda: P.set_index("t").groupby("g").apply(lambda d: d[["a"]] * 2),
      lambda: M.set_index("t").groupby("g").apply(lambda d: d[["a"]] * 2))
probe("group_keys=False restores order",
      lambda: P.groupby("g", group_keys=False).apply(lambda d: d[["a"]]),
      lambda: M.groupby("g", group_keys=False).apply(lambda d: d[["a"]]))
probe("group_keys=False head(1)",
      lambda: P.groupby("g", group_keys=False).apply(lambda d: d[["a", "b"]].head(1)),
      lambda: M.groupby("g", group_keys=False).apply(lambda d: d[["a", "b"]].head(1)))
probe("apply func uses index values",
      lambda: P.groupby("g").apply(lambda d: d["a"].sum() + d.index.max()),
      lambda: M.groupby("g").apply(lambda d: d["a"].sum() + d.index.max()))
probe("apply sorted-input rows",
      lambda: P.sort_values("a", ascending=False).groupby("g").apply(lambda d: d["a"].iloc[0]),
      lambda: M.sort_values("a", ascending=False).groupby("g").apply(lambda d: d["a"].iloc[0]))

# ---- nth indexer -----------------------------------------------------------
probe("nth[:2]", lambda: P.groupby("g").nth[:2], lambda: M.groupby("g").nth[:2])
probe("nth[1:]", lambda: P.groupby("g").nth[1:], lambda: M.groupby("g").nth[1:])
probe("nth[::2]", lambda: P.groupby("g").nth[::2], lambda: M.groupby("g").nth[::2])
probe("nth[-1:]", lambda: P.groupby("g").nth[-1:], lambda: M.groupby("g").nth[-1:])
probe("nth(1) still callable", lambda: P.groupby("g").nth(1), lambda: M.groupby("g").nth(1))

# ---- corrwith / pairwise ----------------------------------------------------
probe("df.corrwith(Series)", lambda: P[["a", "b"]].corrwith(P["b"]),
      lambda: M[["a", "b"]].corrwith(M["b"]))
probe("expanding corr matrix", lambda: P[["a", "b"]].expanding().corr(),
      lambda: M[["a", "b"]].expanding().corr())
probe("expanding cov matrix", lambda: P[["a", "b"]].expanding().cov(),
      lambda: M[["a", "b"]].expanding().cov())

# ---- ewm times --------------------------------------------------------------
_t_irregular = pd.DatetimeIndex(["2024-01-01 00:00", "2024-01-01 00:01",
                                 "2024-01-01 00:10", "2024-01-01 01:00",
                                 "2024-01-01 01:01"])
probe("ewm times mean",
      lambda: P["a"].ewm(halflife="10min", times=_t_irregular).mean(),
      lambda: M["a"].ewm(halflife="10min", times=_t_irregular).mean())
probe("ewm times sum adjust",
      lambda: P["a"].ewm(halflife="30min", times=_t_irregular).sum(),
      lambda: M["a"].ewm(halflife="30min", times=_t_irregular).sum())

# ---- Grouper / misc ---------------------------------------------------------
probe("Grouper freq sum",
      lambda: P.groupby(pd.Grouper(key="t", freq="2h"))["a"].sum(),
      lambda: M.groupby(mpd.Grouper(key="t", freq="2h"))["a"].sum())
probe("gb.ohlc",
      lambda: P.groupby("g")["a"].ohlc(),
      lambda: M.groupby("g")["a"].ohlc())

if __name__ == "__main__":
    n_ok = sum(1 for _, ok, _ in RESULTS if ok)
    print(f"\n{n_ok}/{len(RESULTS)} probes pass")
    sys.exit(0 if n_ok == len(RESULTS) else 1)
