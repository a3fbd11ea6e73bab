"""Probe wave 42 (r14): API-corner differential sweep — resample
closed/label combos + ohlc/asfreq, groupby level=/as_index=False named
aggs, pivot_table margins + aggfunc lists, stack/unstack fill_value,
merge indicator/validate, reindex method/tolerance, eval/query locals and
backticks, nullable-Int64 arithmetic, categorical ops, timedelta
components, sample weights, rolling skew/kurt edges, crosstab normalize.

Usage: python tools/probe_wave42.py [--verbose]
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


rng = np.random.default_rng(42)

# ---- resample combos ---------------------------------------------------------
idx = pd.date_range("2024-01-01", periods=50, freq="37min")
pts = pd.DataFrame({"v": rng.normal(size=50), "q": rng.integers(1, 5, 50)}, index=idx)
mts = mpd.DataFrame(pts)
for closed in ("left", "right"):
    for label in ("left", "right"):
        probe(f"resample_2h_{closed}_{label}",
              lambda c=closed, l=label: pts.resample("2h", closed=c, label=l)["v"].sum(),
              lambda c=closed, l=label: mts.resample("2h", closed=c, label=l)["v"].sum())
probe("resample_ohlc", lambda: pts["v"].resample("3h").ohlc(),
      lambda: mts["v"].resample("3h").ohlc())
probe("resample_asfreq", lambda: pts.asfreq("2h"), lambda: mts.asfreq("2h"))
probe("resample_count_empty_bins", lambda: pts.resample("15min")["v"].count(),
      lambda: mts.resample("15min")["v"].count())

# ---- groupby shapes ----------------------------------------------------------
pg = pd.DataFrame({"a": list("xyxyxz"), "b": list("mmnnmm"), "v": range(6),
                   "w": [2.0, 1.0, 4.0, 3.0, 6.0, 5.0]})
mg = mpd.DataFrame(pg)
probe("gb_as_index_false_named",
      lambda: pg.groupby("a", as_index=False).agg(tot=("v", "sum"), mx=("w", "max")),
      lambda: mg.groupby("a", as_index=False).agg(tot=("v", "sum"), mx=("w", "max")))
pgi = pg.set_index(["a", "b"])
mgi = mg.set_index(["a", "b"])
probe("gb_level0", lambda: pgi.groupby(level=0)["v"].sum(),
      lambda: mgi.groupby(level=0)["v"].sum())
probe("gb_level_name", lambda: pgi.groupby(level="b")["w"].mean(),
      lambda: mgi.groupby(level="b")["w"].mean())
probe("gb_two_levels", lambda: pgi.groupby(level=["a", "b"])["v"].sum(),
      lambda: mgi.groupby(level=["a", "b"])["v"].sum())
probe("gb_agg_listfuncs", lambda: pg.groupby("a")["v"].agg(["sum", "mean", "max"]),
      lambda: mg.groupby("a")["v"].agg(["sum", "mean", "max"]))
probe("gb_agg_dict_list",
      lambda: pg.groupby("a").agg({"v": ["sum", "max"], "w": "mean"}),
      lambda: mg.groupby("a").agg({"v": ["sum", "max"], "w": "mean"}))
probe("gb_size_series", lambda: pg.groupby(["a", "b"]).size(),
      lambda: mg.groupby(["a", "b"]).size())

# ---- pivot_table / crosstab --------------------------------------------------
probe("pivot_margins",
      lambda: pd.pivot_table(pg, values="v", index="a", columns="b",
                             aggfunc="sum", margins=True, fill_value=0),
      lambda: mpd.pivot_table(mg, values="v", index="a", columns="b",
                              aggfunc="sum", margins=True, fill_value=0))
probe("pivot_aggfunc_list",
      lambda: pd.pivot_table(pg, values="v", index="a", aggfunc=["sum", "mean"]),
      lambda: mpd.pivot_table(mg, values="v", index="a", aggfunc=["sum", "mean"]))
probe("crosstab_normalize_all",
      lambda: pd.crosstab(pg["a"], pg["b"], normalize="all"),
      lambda: mpd.crosstab(mg["a"], mg["b"], normalize="all"))
probe("crosstab_normalize_index",
      lambda: pd.crosstab(pg["a"], pg["b"], normalize="index"),
      lambda: mpd.crosstab(mg["a"], mg["b"], normalize="index"))

# ---- stack/unstack -----------------------------------------------------------
probe("unstack_fill_value", lambda: pgi["v"].unstack(fill_value=-1),
      lambda: mgi["v"].unstack(fill_value=-1))
probe("unstack_level0", lambda: pgi["v"].unstack(level=0, fill_value=0),
      lambda: mgi["v"].unstack(level=0, fill_value=0))
pst = pd.DataFrame({("x", 1): [1, 2], ("x", 2): [3, 4], ("y", 1): [5, 6]})
probe("stack_mi_cols", lambda: pst.stack(future_stack=True),
      lambda: mpd.DataFrame(pst).stack(future_stack=True))

# ---- merge options -----------------------------------------------------------
pl = pd.DataFrame({"k": ["a", "b", "c"], "x": [1, 2, 3]})
pr = pd.DataFrame({"k": ["a", "a", "d"], "y": [9, 8, 7]})
ml, mr = mpd.DataFrame(pl), mpd.DataFrame(pr)
probe("merge_indicator",
      lambda: pl.merge(pr, on="k", how="outer", indicator=True)
               .sort_values(["k", "y"]).reset_index(drop=True).astype({"_merge": str}),
      lambda: ml.merge(mr, on="k", how="outer", indicator=True)
               .sort_values(["k", "y"]).reset_index(drop=True).astype({"_merge": str}))
probe("merge_validate_1m", lambda: pl.merge(pr, on="k", validate="one_to_many"),
      lambda: ml.merge(mr, on="k", validate="one_to_many"))
probe("merge_validate_11_raises",
      lambda: pl.merge(pr, on="k", validate="one_to_one"),
      lambda: ml.merge(mr, on="k", validate="one_to_one"))

# ---- reindex / align ---------------------------------------------------------
psr = pd.Series([1.0, 2.0, 3.0], index=[0, 2, 4])
msr = mpd.Series([1.0, 2.0, 3.0], index=[0, 2, 4])
probe("reindex_ffill", lambda: psr.reindex(range(6), method="ffill"),
      lambda: msr.reindex(range(6), method="ffill"))
probe("reindex_nearest", lambda: psr.reindex([1, 3], method="nearest"),
      lambda: msr.reindex([1, 3], method="nearest"))
probe("align_outer",
      lambda: pd.Series([1, 2], index=["a", "b"]).align(pd.Series([3], index=["b"]))[0],
      lambda: mpd.Series([1, 2], index=["a", "b"]).align(mpd.Series([3], index=["b"]))[0])

# ---- eval / query ------------------------------------------------------------
pq = pd.DataFrame({"a col": [1, 2, 3], "b": [4.0, 5.0, 6.0]})
mq = mpd.DataFrame(pq)
thresh = 1
probe("query_local_var", lambda: pq.query("b > @thresh + 3.5"),
      lambda: mq.query("b > @thresh + 3.5"))
probe("query_backtick", lambda: pq.query("`a col` >= 2"),
      lambda: mq.query("`a col` >= 2"))
probe("eval_assign", lambda: pq.eval("c = b * 2"), lambda: mq.eval("c = b * 2"))

# ---- nullable / categorical / timedelta ---------------------------------------
pn = pd.Series([1, None, 3], dtype="Int64")
mn = mpd.Series([1, None, 3], dtype="Int64")
probe("int64ext_add", lambda: pn + 1, lambda: mn + 1)
probe("int64ext_cumsum", lambda: pn.cumsum(), lambda: mn.cumsum())
probe("int64ext_mean", lambda: float(pn.mean()), lambda: float(mn.mean()))
pcat = pd.Series(pd.Categorical(["lo", "hi", "mid", "hi"],
                                categories=["lo", "mid", "hi"], ordered=True))
mcat = mpd.Series(pcat)
probe("cat_ordered_gt", lambda: pcat > "lo", lambda: mcat > "lo")
probe("cat_codes", lambda: pcat.cat.codes, lambda: mcat.cat.codes)
probe("cat_remove_unused",
      lambda: pcat[pcat != "mid"].cat.remove_unused_categories().cat.categories.tolist(),
      lambda: mcat[mcat != "mid"].cat.remove_unused_categories().cat.categories.tolist())
ptd = pd.Series(pd.to_timedelta(["1 days 2:03:04", "0 days 5:06:07.800", None]))
mtd = mpd.Series(ptd)
probe("td_total_seconds", lambda: ptd.dt.total_seconds(),
      lambda: mtd.dt.total_seconds())
probe("td_days_comp", lambda: ptd.dt.days, lambda: mtd.dt.days)
probe("td_seconds_comp", lambda: ptd.dt.seconds, lambda: mtd.dt.seconds)

# ---- misc --------------------------------------------------------------------
probe("sample_weights_det",
      lambda: pg.sample(n=3, random_state=7, weights="w")[["a"]].reset_index(drop=True).shape,
      lambda: tuple(mg.sample(n=3, random_state=7, weights="w")[["a"]].reset_index(drop=True).to_pandas().shape))
probe("rolling_skew", lambda: pts["v"].rolling(5).skew(),
      lambda: mts["v"].rolling(5).skew())
probe("rolling_kurt", lambda: pts["v"].rolling(6).kurt(),
      lambda: mts["v"].rolling(6).kurt())
probe("rolling_min_periods1_var", lambda: pts["v"].rolling(4, min_periods=2).var(),
      lambda: mts["v"].rolling(4, min_periods=2).var())
probe("insert_pop",
      lambda: (lambda d: (d.insert(1, "z", d["v"] * 2), d.pop("w"), d)[2])(pg.copy()),
      lambda: (lambda d: (d.insert(1, "z", d["v"] * 2), d.pop("w"), d)[2])(mg.copy()))
probe("explode_two_cols",
      lambda: pd.DataFrame({"a": [[1, 2], [3]], "b": [["x", "y"], ["z"]], "c": [9, 8]})
               .explode(["a", "b"]).reset_index(drop=True),
      lambda: mpd.DataFrame({"a": [[1, 2], [3]], "b": [["x", "y"], ["z"]], "c": [9, 8]})
               .explode(["a", "b"]).reset_index(drop=True))
probe("autocorr", lambda: round(pts["v"].autocorr(2), 9),
      lambda: round(mts["v"].autocorr(2), 9))
probe("str_findall_len", lambda: pd.Series(["aXbXc", "Xd", None]).str.findall("X").str.len(),
      lambda: mpd.Series(["aXbXc", "Xd", None]).str.findall("X").str.len())
probe("str_extract_two_groups",
      lambda: pd.Series(["a-1", "b-22", None]).str.extract(r"([a-z])-(\d+)"),
      lambda: mpd.Series(["a-1", "b-22", None]).str.extract(r"([a-z])-(\d+)"))

n_fail = sum(1 for _, ok, _ in RESULTS if not ok)
print(f"\n{len(RESULTS)} probes, {n_fail} failures")
sys.exit(1 if n_fail else 0)
