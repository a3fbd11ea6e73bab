"""Probe wave 51 (r15): degenerate-input sweep — EMPTY frames/series
(groupby/rolling/concat/describe/merge on zero rows), ALL-NaN columns
(reductions, idxmax, rank, corr, cumsum), DUPLICATE labels (duplicate
column names through arithmetic/concat/getitem, duplicate index labels
through loc/reindex), PARTIAL-null multi-key groupby (one key null, the
other not, dropna both ways), and the timedelta family (datetime diff,
td reductions, abs, astype). Differential vs real pandas.

Usage: python tools/probe_wave51.py [--verbose]
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
            elif isinstance(exp, pd.Index):
                pd.testing.assert_index_equal(got, exp, exact=False)
            else:
                assert got == exp or (pd.isna(got) and pd.isna(exp)), (got, exp)
            ok, detail = True, ""
        except Exception as e:
            ok, detail = False, str(e).replace("\n", " | ")[:260]
    RESULTS.append((name, ok, detail))
    if VERBOSE or not ok:
        print(("PASS " if ok else "FAIL ") + name + ("" if ok else "  :: " + detail))


# ---------------------------------------------------------------- empties
pe = pd.DataFrame({"k": pd.Series([], dtype="object"),
                   "v": pd.Series([], dtype="float64")})
def ME():
    return mpd.DataFrame({"k": pd.Series([], dtype="object"),
                          "v": pd.Series([], dtype="float64")})

probe("empty_groupby_sum", lambda: pe.groupby("k").v.sum(),
      lambda: ME().groupby("k").v.sum())
probe("empty_groupby_agg_frame", lambda: pe.groupby("k").agg({"v": "mean"}),
      lambda: ME().groupby("k").agg({"v": "mean"}))
probe("empty_rolling_mean", lambda: pe.v.rolling(3).mean(),
      lambda: ME().v.rolling(3).mean())
probe("empty_describe", lambda: pe.describe(),
      lambda: ME().describe())
probe("empty_value_counts", lambda: pe.k.value_counts(),
      lambda: ME().k.value_counts())
probe("empty_drop_duplicates", lambda: pe.drop_duplicates(),
      lambda: ME().drop_duplicates())
probe("empty_sort_values", lambda: pe.sort_values("v"),
      lambda: ME().sort_values("v"))
probe("empty_merge_nonempty",
      lambda: pe.merge(pd.DataFrame({"k": ["a"], "w": [1]}), on="k"),
      lambda: ME().merge(mpd.DataFrame({"k": ["a"], "w": [1]}), on="k"))
probe("empty_concat_mixed",
      lambda: pd.concat([pe, pd.DataFrame({"k": ["a"], "v": [1.0]})], ignore_index=True),
      lambda: mpd.concat([ME(), mpd.DataFrame({"k": ["a"], "v": [1.0]})], ignore_index=True))
probe("empty_sum_axis0", lambda: pe.sum(numeric_only=True),
      lambda: ME().sum(numeric_only=True))
probe("empty_cumsum", lambda: pe.v.cumsum(), lambda: ME().v.cumsum())
probe("empty_rank", lambda: pe.v.rank(), lambda: ME().v.rank())
probe("empty_transpose", lambda: pe.T.shape, lambda: ME().T.shape)
probe("empty_quantile", lambda: pe.v.quantile(0.5), lambda: ME().v.quantile(0.5))
probe("empty_nunique", lambda: pe.nunique(), lambda: ME().nunique())

# ---------------------------------------------------------------- all-NaN
pn = pd.DataFrame({"a": [np.nan] * 5, "b": [1.0, 2.0, np.nan, 4.0, 5.0],
                   "g": ["x", "x", "y", "y", "y"]})
def MN():
    return mpd.DataFrame(pn)

probe("allnan_mean", lambda: pn.a.mean(), lambda: MN().a.mean())
probe("allnan_sum", lambda: pn.a.sum(), lambda: MN().a.sum())
probe("allnan_sum_minc", lambda: pn.a.sum(min_count=1), lambda: MN().a.sum(min_count=1))
probe("allnan_idxmax", lambda: pn.a.idxmax(), lambda: MN().a.idxmax())
probe("allnan_idxmax_skipna_false", lambda: pn.b.idxmax(skipna=False),
      lambda: MN().b.idxmax(skipna=False))
probe("allnan_rank", lambda: pn.a.rank(), lambda: MN().a.rank())
probe("allnan_cumsum", lambda: pn.a.cumsum(), lambda: MN().a.cumsum())
probe("allnan_cummax", lambda: pn.a.cummax(), lambda: MN().a.cummax())
probe("allnan_corr_pair", lambda: pn[["a", "b"]].corr().loc["a", "b"],
      lambda: MN()[["a", "b"]].corr().loc["a", "b"])
probe("allnan_std", lambda: pn.a.std(), lambda: MN().a.std())
probe("allnan_groupby_mean", lambda: pn.groupby("g").a.mean(),
      lambda: MN().groupby("g").a.mean())
probe("allnan_groupby_first", lambda: pn.groupby("g").a.first(),
      lambda: MN().groupby("g").a.first())
probe("allnan_dropna_frame", lambda: pn.dropna(), lambda: MN().dropna())
probe("allnan_quantile", lambda: pn.a.quantile(0.5), lambda: MN().a.quantile(0.5))
probe("allnan_mode", lambda: pn.a.mode(), lambda: MN().a.mode())
probe("allnan_diff", lambda: pn.a.diff(), lambda: MN().a.diff())

# ------------------------------------------------------- duplicate labels
pdup = pd.DataFrame([[1, 2, 3], [4, 5, 6]], columns=["x", "x", "y"])
def MD():
    return mpd.DataFrame([[1, 2, 3], [4, 5, 6]], columns=["x", "x", "y"])

probe("dupcol_getitem", lambda: pdup["x"], lambda: MD()["x"])
probe("dupcol_add_scalar", lambda: pdup + 1, lambda: MD() + 1)
probe("dupcol_sum", lambda: pdup.sum(), lambda: MD().sum())
probe("dupcol_rename", lambda: pdup.rename(columns={"y": "z"}),
      lambda: MD().rename(columns={"y": "z"}))
probe("dupcol_concat_axis0",
      lambda: pd.concat([pdup, pdup], ignore_index=True),
      lambda: mpd.concat([MD(), MD()], ignore_index=True))
probe("dupcol_drop", lambda: pdup.drop(columns="x"),
      lambda: MD().drop(columns="x"))
probe("dupcol_tpose_roundtrip", lambda: pdup.T.T, lambda: MD().T.T)

pdidx = pd.DataFrame({"v": [1, 2, 3, 4]}, index=["a", "b", "a", "c"])
def MI():
    return mpd.DataFrame({"v": [1, 2, 3, 4]}, index=["a", "b", "a", "c"])

probe("dupidx_loc_scalar", lambda: pdidx.loc["a"], lambda: MI().loc["a"])
probe("dupidx_loc_list", lambda: pdidx.loc[["a", "c"]], lambda: MI().loc[["a", "c"]])
probe("dupidx_reindex_raises", lambda: pdidx.reindex(["a", "b"]),
      lambda: MI().reindex(["a", "b"]))
probe("dupidx_sort_index", lambda: pdidx.sort_index(), lambda: MI().sort_index())
probe("dupidx_groupby_level", lambda: pdidx.groupby(level=0).sum(),
      lambda: MI().groupby(level=0).sum())
probe("dupidx_idxmax", lambda: pdidx.v.idxmax(), lambda: MI().v.idxmax())

# ------------------------------------- partial-null multi-key groupby
pm = pd.DataFrame({
    "k1": ["a", "a", None, "b", None, "b"],
    "k2": [1.0, np.nan, 2.0, np.nan, np.nan, 1.0],
    "v": [10, 20, 30, 40, 50, 60],
})
def MM():
    return mpd.DataFrame(pm)

probe("partialnull_agg_dropna_true",
      lambda: pm.groupby(["k1", "k2"]).v.sum(),
      lambda: MM().groupby(["k1", "k2"]).v.sum())
probe("partialnull_agg_dropna_false",
      lambda: pm.groupby(["k1", "k2"], dropna=False).v.sum().reset_index(),
      lambda: MM().groupby(["k1", "k2"], dropna=False).v.sum().reset_index())
probe("partialnull_transform_mean",
      lambda: pm.groupby(["k1", "k2"]).v.transform("mean"),
      lambda: MM().groupby(["k1", "k2"]).v.transform("mean"))
probe("partialnull_transform_dropna_false",
      lambda: pm.groupby(["k1", "k2"], dropna=False).v.transform("mean"),
      lambda: MM().groupby(["k1", "k2"], dropna=False).v.transform("mean"))
probe("partialnull_cumsum",
      lambda: pm.groupby(["k1", "k2"]).v.cumsum(),
      lambda: MM().groupby(["k1", "k2"]).v.cumsum())
probe("partialnull_rank",
      lambda: pm.groupby(["k1", "k2"]).v.rank(),
      lambda: MM().groupby(["k1", "k2"]).v.rank())
probe("partialnull_size",
      lambda: pm.groupby(["k1", "k2"]).size(),
      lambda: MM().groupby(["k1", "k2"]).size())
probe("partialnull_size_dropna_false",
      lambda: pm.groupby(["k1", "k2"], dropna=False).size().reset_index(name="n"),
      lambda: MM().groupby(["k1", "k2"], dropna=False).size().reset_index(name="n"))
probe("partialnull_ngroup",
      lambda: pm.groupby(["k1", "k2"]).ngroup(),
      lambda: MM().groupby(["k1", "k2"]).ngroup())
probe("partialnull_shift",
      lambda: pm.groupby(["k1", "k2"]).v.shift(1),
      lambda: MM().groupby(["k1", "k2"]).v.shift(1))

# ------------------------------------------------------- timedelta family
pt = pd.DataFrame({
    "t": pd.to_datetime(["2024-01-01", "2024-01-03", "2024-01-02", "2024-01-10"]),
    "v": [1.0, 2.0, 3.0, 4.0],
})
def MT():
    return mpd.DataFrame(pt)

probe("td_datetime_diff", lambda: pt.t.diff(), lambda: MT().t.diff())
probe("td_sub_datetimes", lambda: pt.t - pt.t.iloc[0],
      lambda: MT().t - pt.t.iloc[0])
probe("td_sum", lambda: (pt.t - pt.t.min()).sum(),
      lambda: (MT().t - pt.t.min()).sum())
probe("td_mean", lambda: (pt.t - pt.t.min()).mean(),
      lambda: (MT().t - pt.t.min()).mean())
probe("td_abs", lambda: (pt.t.diff()).abs(), lambda: (MT().t.diff()).abs())
probe("td_max", lambda: pt.t.diff().max(), lambda: MT().t.diff().max())
probe("td_astype_str", lambda: pt.t.diff().astype(str),
      lambda: MT().t.diff().astype(str))
probe("td_dt_days", lambda: (pt.t - pt.t.min()).dt.days,
      lambda: (MT().t - pt.t.min()).dt.days)
probe("td_total_seconds", lambda: (pt.t - pt.t.min()).dt.total_seconds(),
      lambda: (MT().t - pt.t.min()).dt.total_seconds())
probe("td_div_td", lambda: pt.t.diff() / pd.Timedelta("1 day"),
      lambda: MT().t.diff() / pd.Timedelta("1 day"))
probe("td_cumsum", lambda: pt.t.diff().cumsum(), lambda: MT().t.diff().cumsum())
probe("td_rank", lambda: pt.t.diff().rank(), lambda: MT().t.diff().rank())
probe("td_fillna_zero", lambda: pt.t.diff().fillna(pd.Timedelta(0)),
      lambda: MT().t.diff().fillna(pd.Timedelta(0)))
probe("td_sort", lambda: pt.t.diff().sort_values(),
      lambda: MT().t.diff().sort_values())

npass = sum(1 for _, ok, _ in RESULTS if ok)
print(f"\n{npass}/{len(RESULTS)} passed, {len(RESULTS) - npass} failed")
sys.exit(0 if npass == len(RESULTS) else 1)
