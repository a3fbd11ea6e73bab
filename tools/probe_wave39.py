"""Probe wave 39: grouped-window index shapes, pairwise window corr/cov,
range-constructor free functions, Index-object set ops, and groupby tail
surface (sample/filter/corr/cov) — each diffed against pandas.

Usage: python tools/probe_wave39.py [--verbose]
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
                pd.testing.assert_frame_equal(
                    got, exp, check_dtype=False, check_index_type=False,
                    check_column_type=False, check_freq=False)
            elif isinstance(exp, pd.Series):
                pd.testing.assert_series_equal(
                    got, exp, check_dtype=False, check_index_type=False,
                    check_freq=False)
            elif isinstance(exp, pd.Index):
                pd.testing.assert_index_equal(
                    got, exp, check_exact=False, exact=False)
            elif isinstance(exp, np.ndarray):
                np.testing.assert_array_equal(np.asarray(got), exp)
            else:
                assert got == exp or (pd.isna(got) and pd.isna(exp)), (got, exp)
            ok, detail = True, ""
        except Exception as e:
            ok, detail = False, str(e).replace("\n", " | ")[:300]
    RESULTS.append((name, ok, detail))
    if VERBOSE or not ok:
        print(("PASS " if ok else "FAIL ") + name + ("" if ok else "  :: " + detail))


def dfs():
    data = {"g": ["x", "y", "x", "y", "x"],
            "a": [1.0, 2.0, 3.0, 4.0, 5.0],
            "b": [10, 20, 30, 40, 50]}
    return pd.DataFrame(data), mpd.DataFrame(data)


P, M = dfs()

# ---- grouped window index shapes -----------------------------------------
probe("gb.rolling.sum", lambda: P.groupby("g").rolling(2).sum(),
      lambda: M.groupby("g").rolling(2).sum())
probe("gb.rolling.mean min_periods", lambda: P.groupby("g").rolling(2, min_periods=1).mean(),
      lambda: M.groupby("g").rolling(2, min_periods=1).mean())
probe("gb.expanding.sum", lambda: P.groupby("g").expanding().sum(),
      lambda: M.groupby("g").expanding().sum())
probe("gb.ewm.mean", lambda: P.groupby("g").ewm(alpha=0.5).mean(),
      lambda: M.groupby("g").ewm(alpha=0.5).mean())
probe("gb[a].rolling.sum", lambda: P.groupby("g")["a"].rolling(2).sum(),
      lambda: M.groupby("g")["a"].rolling(2).sum())
probe("gb[a].ewm.mean", lambda: P.groupby("g")["a"].ewm(alpha=0.5).mean(),
      lambda: M.groupby("g")["a"].ewm(alpha=0.5).mean())
probe("gb.rolling.apply", lambda: P.groupby("g").rolling(2)[["a"]].apply(lambda s: s.max()),
      lambda: M.groupby("g").rolling(2)[["a"]].apply(lambda s: s.max()))

# ---- groupby corr/cov/sample/filter --------------------------------------
probe("gb.corr", lambda: P.groupby("g")[["a", "b"]].corr(),
      lambda: M.groupby("g")[["a", "b"]].corr())
probe("gb.cov", lambda: P.groupby("g")[["a", "b"]].cov(),
      lambda: M.groupby("g")[["a", "b"]].cov())
probe("gb.corrwith", lambda: P.groupby("g")[["a", "b"]].corrwith(P["a"]),
      lambda: M.groupby("g")[["a", "b"]].corrwith(M["a"]))
probe("gb.filter", lambda: P.groupby("g").filter(lambda x: x["a"].sum() > 4),
      lambda: M.groupby("g").filter(lambda x: x["a"].sum() > 4))
probe("gb.sample n=1 seeded", lambda: 1,
      lambda: len(M.groupby("g").sample(1, random_state=0).groupby("g").size().unique()))
probe("gb.take", lambda: P.groupby("g").take([0]),
      lambda: M.groupby("g").take([0]))

# ---- pairwise rolling corr/cov -------------------------------------------
probe("roll.corr(other)", lambda: P["a"].rolling(3).corr(P["b"]),
      lambda: M["a"].rolling(3).corr(M["b"]))
probe("roll.cov(other)", lambda: P["a"].rolling(3).cov(P["b"]),
      lambda: M["a"].rolling(3).cov(M["b"]))
probe("roll.corr frame-self", lambda: P[["a", "b"]].rolling(3).corr(),
      lambda: M[["a", "b"]].rolling(3).corr())
probe("expanding.corr(other)", lambda: P["a"].expanding().corr(P["b"]),
      lambda: M["a"].expanding().corr(M["b"]))
probe("ewm.corr(other)", lambda: P["a"].ewm(alpha=0.5).corr(P["b"]),
      lambda: M["a"].ewm(alpha=0.5).corr(M["b"]))
probe("ewm.cov(other)", lambda: P["a"].ewm(alpha=0.5).cov(P["b"]),
      lambda: M["a"].ewm(alpha=0.5).cov(M["b"]))

# ---- range constructors ---------------------------------------------------
probe("date_range freq=2D", lambda: pd.date_range("2024-01-01", periods=4, freq="2D"),
      lambda: mpd.date_range("2024-01-01", periods=4, freq="2D"))
probe("date_range tz", lambda: pd.date_range("2024-03-09", periods=3, freq="D", tz="America/New_York"),
      lambda: mpd.date_range("2024-03-09", periods=3, freq="D", tz="America/New_York"))
probe("bdate_range", lambda: pd.bdate_range("2024-01-05", periods=4),
      lambda: mpd.bdate_range("2024-01-05", periods=4))
probe("timedelta_range", lambda: pd.timedelta_range("1h", periods=4, freq="30min"),
      lambda: mpd.timedelta_range("1h", periods=4, freq="30min"))
probe("period_range", lambda: pd.period_range("2024-01", periods=3, freq="M"),
      lambda: mpd.period_range("2024-01", periods=3, freq="M"))
probe("interval_range", lambda: pd.interval_range(0.0, 2.0, periods=4),
      lambda: mpd.interval_range(0.0, 2.0, periods=4))

# ---- Index-object ops ------------------------------------------------------
probe("index.union", lambda: P.index.union(pd.Index([7, 9])),
      lambda: M.index.union(pd.Index([7, 9])))
probe("index.intersection", lambda: P.index.intersection(pd.Index([1, 3, 9])),
      lambda: M.index.intersection(pd.Index([1, 3, 9])))
probe("index.difference", lambda: P.index.difference(pd.Index([0])),
      lambda: M.index.difference(pd.Index([0])))
probe("columns.get_loc", lambda: P.columns.get_loc("a"),
      lambda: M.columns.get_loc("a"))
probe("index.map", lambda: P.set_index("g").index.map(str.upper),
      lambda: M.set_index("g").index.map(str.upper))
probe("set_index(Index)", lambda: P.set_index(pd.Index(list("vwxyz"))),
      lambda: M.set_index(pd.Index(list("vwxyz"))))

# ---- misc free functions ----------------------------------------------------
probe("json_normalize nested", lambda: pd.json_normalize(
          [{"a": 1, "b": {"c": 2, "d": {"e": 3}}}, {"a": 4, "b": {"c": 5, "d": {"e": 6}}}]),
      lambda: mpd.json_normalize(
          [{"a": 1, "b": {"c": 2, "d": {"e": 3}}}, {"a": 4, "b": {"c": 5, "d": {"e": 6}}}]))
probe("lreshape", lambda: pd.lreshape(
          pd.DataFrame({"h1": [1, 2], "h2": [3, 4], "t": ["a", "b"]}),
          {"h": ["h1", "h2"]}),
      lambda: mpd.lreshape(
          mpd.DataFrame({"h1": [1, 2], "h2": [3, 4], "t": ["a", "b"]}),
          {"h": ["h1", "h2"]}))
probe("pd.unique order", lambda: pd.unique(pd.Series([3, 1, 3, 2])),
      lambda: mpd.unique(mpd.Series([3, 1, 3, 2])))
probe("infer_freq", lambda: pd.infer_freq(pd.date_range("2024-01-01", periods=5, freq="2D")),
      lambda: mpd.infer_freq(pd.date_range("2024-01-01", periods=5, freq="2D")))

if __name__ == "__main__":
    n_ok = sum(1 for _, ok, _ in RESULTS if ok)
    print(f"\n{n_ok}/{len(RESULTS)} probes pass")
    sys.exit(0 if n_ok == len(RESULTS) else 1)
