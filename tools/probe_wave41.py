"""Probe wave 41 (r14): differential sweep over the surfaces this round's
machinery changes touch — inf/NaN through the deterministic value buckets
(rank/sort/qcut/asof/searchsorted), groupby transforms on STRUCT-order
lineages (merge/concat outputs), tie-heavy expanding rank/quantile
interpolations, MultiIndex xs/swaplevel, where/mask callables, and
merge_asof tolerance+by+nearest combinations.

Usage: python tools/probe_wave41.py [--verbose]
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


rng = np.random.default_rng(41)
N = 80
inf_vals = rng.normal(size=N)
inf_vals[::9] = np.inf
inf_vals[3::11] = -np.inf
inf_vals[5::13] = np.nan
pv = pd.DataFrame({"v": inf_vals, "g": rng.integers(0, 4, N), "k": np.arange(N)})
mv = mpd.DataFrame(pv)

# ---- inf/NaN through value-bucketed machinery -----------------------------
for meth in ("average", "min", "max", "first", "dense"):
    probe(f"rank_{meth}_inf", lambda m=meth: pv["v"].rank(method=m),
          lambda m=meth: mv["v"].rank(method=m))
probe("rank_desc_inf", lambda: pv["v"].rank(ascending=False),
      lambda: mv["v"].rank(ascending=False))
probe("rank_natop_inf", lambda: pv["v"].rank(na_option="top"),
      lambda: mv["v"].rank(na_option="top"))
probe("rank_nabottom_pct_inf", lambda: pv["v"].rank(na_option="bottom", pct=True),
      lambda: mv["v"].rank(na_option="bottom", pct=True))
# tiebreak on k: order among equal v (the repeated +-inf rows) is
# unspecified — pandas' quicksort and the engine's range sort both pick one
probe("sort_values_inf_desc",
      lambda: pv.sort_values(["v", "k"], ascending=False).reset_index(drop=True),
      lambda: mv.sort_values(["v", "k"], ascending=False).reset_index(drop=True))
probe("nlargest_inf", lambda: pv.nlargest(7, "v").reset_index(drop=True),
      lambda: mv.nlargest(7, "v").reset_index(drop=True))
probe("nsmallest_inf", lambda: pv.nsmallest(7, "v").reset_index(drop=True),
      lambda: mv.nsmallest(7, "v").reset_index(drop=True))
probe("idxmax_inf", lambda: int(pv["v"].idxmax()), lambda: int(mv["v"].idxmax()))
probe("idxmin_inf", lambda: int(pv["v"].idxmin()), lambda: int(mv["v"].idxmin()))
probe("qcut_4_noinf",
      lambda: pd.qcut(pv["k"].astype(float), 4).astype(str),
      lambda: mpd.qcut(mv["k"].astype(float), 4).astype(str))
probe("cut_bins_inf",
      lambda: pd.cut(pv["v"], [-np.inf, -1, 0, 1, np.inf]).astype(str),
      lambda: mpd.cut(mv["v"], [-np.inf, -1, 0, 1, np.inf]).astype(str))
probe("searchsorted_inf",
      lambda: pv["v"].dropna().sort_values().searchsorted(0.5),
      lambda: mv["v"].dropna().sort_values().searchsorted(0.5))
probe("groupby_rank_inf",
      lambda: pv.groupby("g")["v"].rank(),
      lambda: mv.groupby("g")["v"].rank())
probe("cummax_inf", lambda: pv["v"].cummax(), lambda: mv["v"].cummax())
probe("clip_inf", lambda: pv["v"].clip(-2.0, 2.0), lambda: mv["v"].clip(-2.0, 2.0))

# ---- groupby transforms on STRUCT-order lineages ---------------------------
pl = pd.DataFrame({"k": list("babcacbab"), "x": range(9)})
pr = pd.DataFrame({"k": list("abc"), "y": [10, 20, 30]})
pm = pl.merge(pr, on="k")
ml = mpd.DataFrame(pl)
mm = ml.merge(mpd.DataFrame(pr), on="k")
probe("merged_gb_cumcount", lambda: pm.groupby("k").cumcount(),
      lambda: mm.groupby("k").cumcount())
probe("merged_gb_head", lambda: pm.groupby("k").head(2).reset_index(drop=True),
      lambda: mm.groupby("k").head(2).reset_index(drop=True))
probe("merged_gb_nth", lambda: pm.groupby("k").nth(1).reset_index(drop=True),
      lambda: mm.groupby("k").nth(1).reset_index(drop=True))
probe("merged_gb_rank", lambda: pm.groupby("k")["x"].rank(method="first"),
      lambda: mm.groupby("k")["x"].rank(method="first"))
probe("merged_gb_shift", lambda: pm.groupby("k")["x"].shift(1),
      lambda: mm.groupby("k")["x"].shift(1))
probe("merged_gb_ngroup_sorted", lambda: pm.groupby("k").ngroup(),
      lambda: mm.groupby("k").ngroup())
probe("merged_gb_transform_sum", lambda: pm.groupby("k")["x"].transform("sum"),
      lambda: mm.groupby("k")["x"].transform("sum"))
probe("merged_rank_frame", lambda: pm[["x", "y"]].rank(),
      lambda: mm[["x", "y"]].rank())
probe("merged_pos_tail", lambda: pm.tail(3).reset_index(drop=True),
      lambda: mm.tail(3).reset_index(drop=True))
pc = pd.concat([pl, pl.iloc[::-1]], ignore_index=True)
mc = mpd.concat([ml, ml.iloc[::-1]], ignore_index=True)
probe("concat_gb_cumsum", lambda: pc.groupby("k")["x"].cumsum(),
      lambda: mc.groupby("k")["x"].cumsum())
probe("concat_expanding_mean",
      lambda: pc["x"].expanding(2).mean(), lambda: mc["x"].expanding(2).mean())

# ---- tie-heavy expanding interpolations ------------------------------------
ties = np.where(rng.random(60) < 0.7, 5.0, rng.integers(0, 4, 60).astype(float))
pt = pd.Series(ties)
mt = mpd.Series(ties)
for interp in ("linear", "lower", "higher", "midpoint", "nearest"):
    probe(f"expq_{interp}_ties",
          lambda i=interp: pt.expanding(2).quantile(0.35, interpolation=i),
          lambda i=interp: mt.expanding(2).quantile(0.35, interpolation=i))
probe("exprank_pct_ties", lambda: pt.expanding(3).rank(pct=True),
      lambda: mt.expanding(3).rank(pct=True))
probe("expq_zero", lambda: pt.expanding(1).quantile(0.0),
      lambda: mt.expanding(1).quantile(0.0))
probe("expq_one", lambda: pt.expanding(1).quantile(1.0),
      lambda: mt.expanding(1).quantile(1.0))
neg = -pt
probe("expq_allneg_median", lambda: neg.expanding(1).median(),
      lambda: (-mt).expanding(1).median())

# ---- MultiIndex xs/swaplevel/reorder ----------------------------------------
pmi = pd.DataFrame({"v": range(8)},
                   index=pd.MultiIndex.from_product(
                       [["a", "b"], [1, 2], ["x", "y"]], names=["u", "w", "z"]))
mmi = mpd.DataFrame(pmi)
probe("xs_tuple2", lambda: pmi.xs(("a", 2)), lambda: mmi.xs(("a", 2)))
probe("xs_level1", lambda: pmi.xs(2, level="w"), lambda: mmi.xs(2, level="w"))
probe("xs_level1_keep", lambda: pmi.xs(2, level="w", drop_level=False),
      lambda: mmi.xs(2, level="w", drop_level=False))
probe("swaplevel02", lambda: pmi.swaplevel(0, 2).sort_index(),
      lambda: mmi.swaplevel(0, 2).sort_index())
probe("reorder_levels", lambda: pmi.reorder_levels([2, 0, 1]).sort_index(),
      lambda: mmi.reorder_levels([2, 0, 1]).sort_index())
probe("droplevel_name", lambda: pmi.droplevel("w"),
      lambda: mmi.droplevel("w"))

# ---- where/mask callables and alignments ------------------------------------
pw = pd.DataFrame({"a": range(6), "b": [3.0, None, 1.0, 4.0, None, 2.0]})
mw = mpd.DataFrame(pw)
probe("where_callable", lambda: pw.where(lambda d: d["a"] > 2, -1),
      lambda: mw.where(lambda d: d["a"] > 2, -1))
probe("mask_callable", lambda: pw.mask(lambda d: d["a"] % 2 == 0, 99),
      lambda: mw.mask(lambda d: d["a"] % 2 == 0, 99))
probe("series_where_other_series",
      lambda: pw["a"].where(pw["a"] > 2, pw["a"] * 10),
      lambda: mw["a"].where(mw["a"] > 2, mw["a"] * 10))
probe("combine_first_dtypes",
      lambda: pw["b"].combine_first(pw["a"].astype(float)),
      lambda: mw["b"].combine_first(mw["a"].astype(float)))
probe("update_series", lambda: (lambda s: (s.update(pd.Series([9.0], index=[1])), s)[1])(pw["b"].copy()),
      lambda: (lambda s: (s.update(mpd.Series([9.0], index=[1])), s)[1])(mw["b"].copy()))

# ---- merge_asof combinations -------------------------------------------------
pla = pd.DataFrame({"t": [1.0, 2.5, 4.0, 6.0, 8.5], "g": list("ababa"), "l": range(5)})
pra = pd.DataFrame({"t": [1.0, 3.0, 5.0, 9.0], "g": list("abab"), "r": range(4)})
mla, mra = mpd.DataFrame(pla), mpd.DataFrame(pra)
for d in ("backward", "forward", "nearest"):
    probe(f"asof_{d}_by",
          lambda d=d: pd.merge_asof(pla, pra, on="t", by="g", direction=d),
          lambda d=d: mpd.merge_asof(mla, mra, on="t", by="g", direction=d))
probe("asof_tol_noexact",
      lambda: pd.merge_asof(pla, pra, on="t", tolerance=1.5, allow_exact_matches=False),
      lambda: mpd.merge_asof(mla, mra, on="t", tolerance=1.5, allow_exact_matches=False))
probe("asof_nearest_noexact",
      lambda: pd.merge_asof(pla, pra, on="t", direction="nearest", allow_exact_matches=False),
      lambda: mpd.merge_asof(mla, mra, on="t", direction="nearest", allow_exact_matches=False))

# ---- misc API edges ----------------------------------------------------------
ps = pd.Series(["a-1", "b-22", None, "c-333"])
ms = mpd.Series(["a-1", "b-22", None, "c-333"])
probe("str_rsplit_expand", lambda: ps.str.rsplit("-", n=1, expand=True),
      lambda: ms.str.rsplit("-", n=1, expand=True))
probe("str_pad_both", lambda: ps.str.pad(6, side="both", fillchar="*"),
      lambda: ms.str.pad(6, side="both", fillchar="*"))
probe("str_slice_step", lambda: ps.str.slice(0, 4, 2), lambda: ms.str.slice(0, 4, 2))
pdt = pd.Series(pd.date_range("2024-02-25", periods=6, freq="11h"))
mdt = mpd.Series(pdt)
probe("dt_isocalendar_week", lambda: pdt.dt.isocalendar().week.astype("int64"),
      lambda: mdt.dt.isocalendar().week.astype("int64"))
probe("dt_days_in_month", lambda: pdt.dt.days_in_month,
      lambda: mdt.dt.days_in_month)
probe("dt_is_month_end", lambda: pdt.dt.is_month_end, lambda: mdt.dt.is_month_end)
probe("frame_rank_axis1", lambda: pw.rank(axis=1), lambda: mw.rank(axis=1))
probe("frame_pct_change_fill",
      lambda: pw[["a"]].astype(float).pct_change(periods=2),
      lambda: mw[["a"]].astype(float).pct_change(periods=2))
probe("duplicated_keep_false",
      lambda: pl.duplicated(subset=["k"], keep=False),
      lambda: ml.duplicated(subset=["k"], keep=False))
probe("value_counts_normalize_bins",
      lambda: pv["v"].value_counts(bins=3, normalize=True).sort_index().reset_index(drop=True),
      lambda: mv["v"].value_counts(bins=3, normalize=True).sort_index().reset_index(drop=True))

n_fail = sum(1 for _, ok, _ in RESULTS if not ok)
print(f"\n{len(RESULTS)} probes, {n_fail} failures")
sys.exit(1 if n_fail else 0)
