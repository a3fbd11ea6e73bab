"""Probe wave 48 (r14): orc/feather round trips, rolling step=, shift freq,
resample agg dicts, df.round(dict)/astype(dict), query over index names,
drop with index=/columns= kwargs, take, itertuples/iterrows/items, assign
callables, T property, hasnans/is_monotonic, is_unique, rolling closed
combos on time windows, Series.where inplace, droplevel series, nsmallest
frames, swifter-style chained pipelines.

Usage: python tools/probe_wave48.py [--verbose]
"""
import os
import sys
import tempfile
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
                                              check_index_type=False, check_column_type=False,
                                              check_freq=False)
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


TMP = tempfile.mkdtemp(prefix="probe48_")
pf = pd.DataFrame({"a": [3, 1, 2, 4], "b": [1.5, None, 2.5, 0.5], "c": list("wxyz")})
mf = mpd.DataFrame(pf)

# ---- io formats -------------------------------------------------------------
orc = os.path.join(TMP, "t.orc")
probe("orc_roundtrip",
      lambda: pf.sort_values("a").reset_index(drop=True),
      lambda: (mf.to_orc(orc),
               mpd.read_orc(orc).sort_values("a").reset_index(drop=True))[1])
fea = os.path.join(TMP, "t.feather")
pf.to_feather(fea)
probe("read_feather",
      lambda: pd.read_feather(fea).sort_values("a").reset_index(drop=True),
      lambda: mpd.read_feather(fea).sort_values("a").reset_index(drop=True))

# ---- rolling step / time closed ----------------------------------------------
ps = pd.Series(np.arange(12, dtype=float))
ms = mpd.Series(ps)
probe("rolling_step", lambda: ps.rolling(3, step=2).sum(),
      lambda: ms.rolling(3, step=2).sum())
pts = pd.Series(np.arange(8, dtype=float),
                index=pd.date_range("2024-01-01", periods=8, freq="30min"))
mts = mpd.Series(pts)
for closed in ("right", "left", "both", "neither"):
    probe(f"rolling_time_closed_{closed}",
          lambda c=closed: pts.rolling("1h", closed=c).sum(),
          lambda c=closed: mts.rolling("1h", closed=c).sum())
probe("shift_freq",
      lambda: pts.shift(1, freq="30min"),
      lambda: mts.shift(1, freq="30min"))

# ---- resample agg dict / apply ---------------------------------------------------
ptf = pd.DataFrame({"v": np.arange(8, dtype=float), "w": np.arange(8) * 2.0},
                   index=pd.date_range("2024-01-01", periods=8, freq="45min"))
mtf = mpd.DataFrame(ptf)
probe("resample_agg_dict",
      lambda: ptf.resample("2h").agg({"v": "sum", "w": "max"}),
      lambda: mtf.resample("2h").agg({"v": "sum", "w": "max"}))
probe("resample_agg_list",
      lambda: ptf.resample("2h")["v"].agg(["sum", "mean"]),
      lambda: mtf.resample("2h")["v"].agg(["sum", "mean"]))

# ---- round/astype dicts --------------------------------------------------------------
probe("round_dict", lambda: pf.round({"b": 0}), lambda: mf.round({"b": 0}))
probe("astype_dict",
      lambda: pf.astype({"a": "float64"}).dtypes["a"].kind,
      lambda: mf.astype({"a": "float64"}).dtypes["a"].kind)

# ---- query/drop/take -------------------------------------------------------------------
pq = pf.set_index("c")
mq = mf.set_index("c")
probe("query_index_name", lambda: pq.query("c >= 'x'"), lambda: mq.query("c >= 'x'"))
probe("drop_index_kwarg", lambda: pq.drop(index=["w", "y"]),
      lambda: mq.drop(index=["w", "y"]))
probe("drop_columns_kwarg", lambda: pf.drop(columns=["b"]),
      lambda: mf.drop(columns=["b"]))
probe("frame_take", lambda: pf.take([2, 0]), lambda: mf.take([2, 0]))
probe("series_take", lambda: pf["a"].take([-1, 0]), lambda: mf["a"].take([-1, 0]))

# ---- iteration protocols -----------------------------------------------------------------
probe("itertuples",  # repr: NaN breaks raw tuple equality
      lambda: [repr(tuple(t)) for t in pf.head(2).itertuples()],
      lambda: [repr(tuple(t)) for t in mf.head(2).itertuples()])
probe("iterrows_labels", lambda: [i for i, _ in pf.iterrows()],
      lambda: [i for i, _ in mf.iterrows()])
probe("series_items", lambda: list(pf["a"].items()), lambda: list(mf["a"].items()))

# ---- assign callable / T ------------------------------------------------------------------
probe("assign_callable",
      lambda: pf.assign(d=lambda d: d["a"] * 10),
      lambda: mf.assign(d=lambda d: d["a"] * 10))
probe("T_roundtrip",
      lambda: pf[["a", "b"]].T.T,
      lambda: mf[["a", "b"]].T.T)

# ---- predicates ------------------------------------------------------------------------------
probe("hasnans", lambda: pf["b"].hasnans, lambda: mf["b"].hasnans)
probe("is_monotonic", lambda: pf["a"].sort_values().is_monotonic_increasing,
      lambda: mf["a"].sort_values().is_monotonic_increasing)
probe("is_unique", lambda: pf["a"].is_unique, lambda: mf["a"].is_unique)
probe("empty_prop", lambda: pf.head(0).empty, lambda: bool(mf.head(0).empty))

# ---- misc -------------------------------------------------------------------------------------
probe("nsmallest_frame_two_cols",
      lambda: pf.nsmallest(2, ["a", "b"]).reset_index(drop=True),
      lambda: mf.nsmallest(2, ["a", "b"]).reset_index(drop=True))
probe("series_droplevel",
      lambda: pf.set_index(["c", "a"])["b"].droplevel(1),
      lambda: mf.set_index(["c", "a"])["b"].droplevel(1))
probe("pipe_chain",
      lambda: pf.pipe(lambda d, k: d[d["a"] > k], 1)["a"].sum(),
      lambda: float(mf.pipe(lambda d, k: d[d["a"] > k], 1)["a"].sum()))
probe("rename_mapper_axis0",
      lambda: pq.rename(str.upper, axis=0),
      lambda: mq.rename(str.upper, axis=0))
probe("series_where_inplace",
      lambda: (lambda s: (s.where(s > 1, -1, inplace=True), s)[1])(pf["a"].copy()),
      lambda: (lambda s: (s.where(s > 1, -1, inplace=True), s)[1])(mf["a"].copy()))

n_fail = sum(1 for _, ok, _ in RESULTS if not ok)
print(f"\n{len(RESULTS)} probes, {n_fail} failures")
sys.exit(1 if n_fail else 0)
