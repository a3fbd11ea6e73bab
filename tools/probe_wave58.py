"""Probe wave 58 (r15): axis=1 transform family (rank/diff/shift/cumsum
across columns), describe(include=/exclude=/percentiles=), resample
origin=/offset= anchoring, MultiIndex-COLUMNS operations (tuple
selection, xs axis=1, swaplevel axis=1, sort_index axis=1, stack a
level), melt ignore_index=False / wide_to_long, and window agg lists.
Differential vs real pandas.

Usage: python tools/probe_wave58.py [--verbose]
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


# ------------------------------------------------- axis=1 transforms
pa = pd.DataFrame({"x": [3.0, 1.0, np.nan], "y": [1.0, 2.0, 2.0],
                   "z": [2.0, np.nan, 1.0]})
def MA():
    return mpd.DataFrame(pa)

probe("rank_axis1", lambda: pa.rank(axis=1), lambda: MA().rank(axis=1))
probe("diff_axis1", lambda: pa.diff(axis=1), lambda: MA().diff(axis=1))
probe("shift_axis1", lambda: pa.shift(1, axis=1), lambda: MA().shift(1, axis=1))
probe("cumsum_axis1", lambda: pa.cumsum(axis=1), lambda: MA().cumsum(axis=1))
probe("cummax_axis1", lambda: pa.cummax(axis=1), lambda: MA().cummax(axis=1))
probe("pct_change_axis1", lambda: pa.pct_change(axis=1, fill_method=None),
      lambda: MA().pct_change(axis=1, fill_method=None))

# ------------------------------------------------- describe variants
pdm = pd.DataFrame({"n": [1.0, 2.0, 3.0], "s": ["a", "b", "a"],
                    "t": pd.to_datetime(["2024-01-01", "2024-01-02", "2024-01-03"])})
def MD():
    return mpd.DataFrame(pdm)

probe("describe_include_all",
      lambda: pdm.describe(include="all").drop(index=["top", "freq"], errors="ignore"),
      lambda: MD().describe(include="all").drop(index=["top", "freq"], errors="ignore"))
probe("describe_include_object",
      lambda: pdm.describe(include=["object"]).drop(index=["top", "freq"], errors="ignore"),
      lambda: MD().describe(include=["object"]).drop(index=["top", "freq"], errors="ignore"))
probe("describe_exclude_number",
      lambda: pdm.describe(exclude=[np.number]).drop(index=["top", "freq"], errors="ignore"),
      lambda: MD().describe(exclude=[np.number]).drop(index=["top", "freq"], errors="ignore"))
probe("describe_percentiles",
      lambda: pdm.describe(percentiles=[0.1, 0.9]),
      lambda: MD().describe(percentiles=[0.1, 0.9]))

# ------------------------------------------------- resample origin/offset
pr = pd.DataFrame({
    "t": pd.to_datetime(["2024-01-01 00:13", "2024-01-01 00:47",
                         "2024-01-01 01:22", "2024-01-01 02:05"]),
    "v": [1.0, 2.0, 3.0, 4.0],
}).set_index("t")
def MR():
    return mpd.DataFrame(pr.reset_index()).set_index("t")

probe("resample_origin_start",
      lambda: pr.v.resample("45min", origin="start").sum(),
      lambda: MR().v.resample("45min", origin="start").sum())
probe("resample_offset",
      lambda: pr.v.resample("1h", offset="15min").sum(),
      lambda: MR().v.resample("1h", offset="15min").sum())
probe("resample_origin_epoch",
      lambda: pr.v.resample("45min", origin="epoch").sum(),
      lambda: MR().v.resample("45min", origin="epoch").sum())

# ------------------------------------------------- MultiIndex columns
mcols = pd.MultiIndex.from_product([["a", "b"], ["x", "y"]], names=["L0", "L1"])
pm = pd.DataFrame(np.arange(12.0).reshape(3, 4), columns=mcols)
def MM():
    return mpd.DataFrame(pm)

probe("micol_tuple_select",
      lambda: pm[("a", "x")],
      lambda: MM()[("a", "x")])
probe("micol_top_select",
      lambda: pm["a"],
      lambda: MM()["a"])
probe("micol_xs_level1",
      lambda: pm.xs("y", axis=1, level=1),
      lambda: MM().xs("y", axis=1, level=1))
probe("micol_swaplevel_axis1",
      lambda: pm.swaplevel(axis=1).columns.tolist(),
      lambda: MM().swaplevel(axis=1).columns.tolist())
probe("micol_sort_index_axis1",
      lambda: pm.sort_index(axis=1, level=1).columns.tolist(),
      lambda: MM().sort_index(axis=1, level=1).columns.tolist())
probe("micol_stack_level0",
      lambda: pm.stack(0),
      lambda: MM().stack(0))
probe("micol_sum",
      lambda: pm.sum(),
      lambda: MM().sum())
probe("micol_droplevel_axis1",
      lambda: pm.droplevel(0, axis=1),
      lambda: MM().droplevel(0, axis=1))

# ------------------------------------------------- melt / wide_to_long
pw = pd.DataFrame({"id": [1, 2], "A1": [10.0, 11.0], "A2": [20.0, 21.0],
                   "B1": [30.0, 31.0]})
# melting str+int columns gives pandas a MIXED object value column
# ([a, b, 1, 2]); Spark columns are uniformly typed so the engine's value
# column is the common string type — compare through str (documented
# mixed-object divergence, same class as astype(object) storage)
probe("melt_ignore_index_false",
      lambda: pd.DataFrame({"k": ["a", "b"], "v": [1, 2]}, index=["r1", "r2"])
              .melt(ignore_index=False).astype({"value": str}),
      lambda: mpd.DataFrame(pd.DataFrame({"k": ["a", "b"], "v": [1, 2]}, index=["r1", "r2"]))
              .melt(ignore_index=False).astype({"value": str}))
probe("wide_to_long_basic",
      lambda: pd.wide_to_long(pw, stubnames=["A", "B"], i="id", j="n").sort_index(),
      lambda: mpd.wide_to_long(mpd.DataFrame(pw), stubnames=["A", "B"], i="id", j="n").sort_index())

# ------------------------------------------------- window agg lists
ps = pd.Series([1.0, 2.0, 3.0, 4.0, 5.0])
probe("rolling_agg_list",
      lambda: ps.rolling(3).agg(["mean", "max"]),
      lambda: mpd.Series([1.0, 2.0, 3.0, 4.0, 5.0]).rolling(3).agg(["mean", "max"]))
probe("expanding_agg_dict_frame",
      lambda: pa.expanding().agg({"x": "sum", "y": "max"}),
      lambda: MA().expanding().agg({"x": "sum", "y": "max"}))
probe("ewm_agg_mean_std",
      lambda: ps.ewm(span=3).agg(["mean"]),
      lambda: mpd.Series([1.0, 2.0, 3.0, 4.0, 5.0]).ewm(span=3).agg(["mean"]))

npass = sum(1 for _, ok, _ in RESULTS if ok)
print(f"\n{npass}/{len(RESULTS)} passed, {len(RESULTS) - npass} failed")
sys.exit(0 if npass == len(RESULTS) else 1)
