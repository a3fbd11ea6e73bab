"""Probe wave 52 (r15): relational edges — merge with NaN join keys
(pandas matches NaN to NaN in equi-joins!), indicator=/validate=,
pivot_table dropna + NaN group labels, categorical groupby
observed=False (empty categories emitted) + cat accessor tail, nullable
extension dtypes (Int64/boolean/Float64) through arithmetic, reductions
and groupby, where/mask dtype promotion, and map(na_action=).
Differential vs real pandas.

Usage: python tools/probe_wave52.py [--verbose]
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
                                              check_freq=False, check_categorical=False)
            elif isinstance(exp, pd.Series):
                pd.testing.assert_series_equal(got, exp, check_dtype=False,
                                               check_index_type=False, check_freq=False,
                                               check_categorical=False)
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


def srt(df, cols=None):
    cols = cols or list(df.columns)
    return df.sort_values(cols, na_position="last").reset_index(drop=True)


# ------------------------------------------------- merge with NaN keys
pl = pd.DataFrame({"k": [1.0, np.nan, 2.0, np.nan], "a": [1, 2, 3, 4]})
pr = pd.DataFrame({"k": [np.nan, 2.0, 3.0], "b": [10, 20, 30]})
def ML():
    return mpd.DataFrame(pl)
def MR():
    return mpd.DataFrame(pr)

probe("merge_nan_keys_inner",
      lambda: srt(pl.merge(pr, on="k")),
      lambda: srt(ML().merge(MR(), on="k").to_pandas()))
probe("merge_nan_keys_left",
      lambda: srt(pl.merge(pr, on="k", how="left"), ["k", "a"]),
      lambda: srt(ML().merge(MR(), on="k", how="left").to_pandas(), ["k", "a"]))
probe("merge_nan_keys_outer",
      lambda: srt(pl.merge(pr, on="k", how="outer"), ["k", "a"]),
      lambda: srt(ML().merge(MR(), on="k", how="outer").to_pandas(), ["k", "a"]))
probe("merge_indicator",
      lambda: srt(pl.merge(pr, on="k", how="outer", indicator=True).astype({"_merge": str}), ["k", "a"]),
      lambda: srt(ML().merge(MR(), on="k", how="outer", indicator=True).to_pandas().astype({"_merge": str}), ["k", "a"]))
probe("merge_indicator_name",
      lambda: srt(pl.merge(pr, on="k", indicator="src").astype({"src": str}), ["k", "a"]),
      lambda: srt(ML().merge(MR(), on="k", indicator="src").to_pandas().astype({"src": str}), ["k", "a"]))
probe("merge_validate_11_raises",
      lambda: pd.DataFrame({"k": [1, 1]}).merge(pd.DataFrame({"k": [1]}), on="k", validate="1:1"),
      lambda: mpd.DataFrame({"k": [1, 1]}).merge(mpd.DataFrame({"k": [1]}), on="k", validate="1:1"))
probe("merge_validate_m1_ok",
      lambda: pd.DataFrame({"k": [1, 1]}).merge(pd.DataFrame({"k": [1], "b": [9]}), on="k", validate="m:1"),
      lambda: mpd.DataFrame({"k": [1, 1]}).merge(mpd.DataFrame({"k": [1], "b": [9]}), on="k", validate="m:1").to_pandas())

# ------------------------------------------------- pivot_table dropna/NaN
pp = pd.DataFrame({
    "r": ["a", "a", None, "b", "b", "a"],
    "c": ["x", "y", "x", None, "y", "x"],
    "v": [1.0, 2.0, 3.0, 4.0, 5.0, np.nan],
})
def MP():
    return mpd.DataFrame(pp)

probe("pivot_table_default_nan_labels",
      lambda: pp.pivot_table(index="r", columns="c", values="v", aggfunc="sum"),
      lambda: MP().pivot_table(index="r", columns="c", values="v", aggfunc="sum"))
probe("pivot_table_dropna_false",
      lambda: pp.pivot_table(index="r", columns="c", values="v", aggfunc="sum", dropna=False),
      lambda: MP().pivot_table(index="r", columns="c", values="v", aggfunc="sum", dropna=False))
probe("pivot_table_fillvalue",
      lambda: pp.pivot_table(index="r", columns="c", values="v", aggfunc="count", fill_value=0),
      lambda: MP().pivot_table(index="r", columns="c", values="v", aggfunc="count", fill_value=0))
probe("crosstab_nan",
      lambda: pd.crosstab(pp.r, pp.c),
      lambda: mpd.crosstab(MP().r, MP().c))

# --------------------------------------- categorical observed=False, cat tail
pc = pd.DataFrame({
    "g": pd.Categorical(["a", "b", "a"], categories=["a", "b", "c"]),
    "v": [1.0, 2.0, 3.0],
})
def MC():
    return mpd.DataFrame({"v": [1.0, 2.0, 3.0]}).assign(
        g=mpd.Series(["a", "b", "a"]).astype(
            pd.CategoricalDtype(["a", "b", "c"])))[["g", "v"]]

probe("cat_groupby_observed_false",
      lambda: pc.groupby("g", observed=False).v.sum(),
      lambda: MC().groupby("g", observed=False).v.sum())
probe("cat_groupby_observed_true",
      lambda: pc.groupby("g", observed=True).v.sum(),
      lambda: MC().groupby("g", observed=True).v.sum())
probe("cat_value_counts_zero_cats",
      lambda: pc.g.value_counts(),
      lambda: MC().g.value_counts())
probe("cat_remove_unused",
      lambda: pc.g.cat.remove_unused_categories().cat.categories.tolist(),
      lambda: MC().g.cat.remove_unused_categories().cat.categories.tolist())
probe("cat_add_categories",
      lambda: pc.g.cat.add_categories(["d"]).cat.categories.tolist(),
      lambda: MC().g.cat.add_categories(["d"]).cat.categories.tolist())
probe("cat_codes_order",
      lambda: pc.g.cat.codes,
      lambda: MC().g.cat.codes)
probe("cat_rename_categories",
      lambda: pc.g.cat.rename_categories({"a": "A"}).astype(str),
      lambda: MC().g.cat.rename_categories({"a": "A"}).astype(str))
probe("cat_sort_respects_order",
      lambda: pd.Series(pd.Categorical(["b", "a", "c"], categories=["c", "b", "a"], ordered=True)).sort_values().astype(str).reset_index(drop=True),
      lambda: mpd.Series(["b", "a", "c"]).astype(pd.CategoricalDtype(["c", "b", "a"], ordered=True)).sort_values().astype(str).reset_index(drop=True))

# ------------------------------------------- nullable extension dtypes
pn = pd.DataFrame({
    "i": pd.array([1, None, 3], dtype="Int64"),
    "b": pd.array([True, None, False], dtype="boolean"),
    "f": pd.array([1.5, None, 2.5], dtype="Float64"),
    "g": ["x", "x", "y"],
})
def MNN():
    return mpd.DataFrame(pn)

probe("ext_int_add", lambda: pn.i + 1, lambda: MNN().i + 1)
probe("ext_int_sum", lambda: pn.i.sum(), lambda: MNN().i.sum())
probe("ext_int_mean", lambda: pn.i.mean(), lambda: MNN().i.mean())
probe("ext_bool_any", lambda: pn.b.any(), lambda: MNN().b.any())
probe("ext_bool_sum", lambda: pn.b.sum(), lambda: MNN().b.sum())
probe("ext_float_mul", lambda: pn.f * 2, lambda: MNN().f * 2)
probe("ext_int_isna", lambda: pn.i.isna(), lambda: MNN().i.isna())
probe("ext_int_fillna", lambda: pn.i.fillna(0), lambda: MNN().i.fillna(0))
probe("ext_groupby_sum", lambda: pn.groupby("g").i.sum(),
      lambda: MNN().groupby("g").i.sum())
probe("ext_int_cmp", lambda: pn.i > 1, lambda: MNN().i > 1)
probe("ext_int_astype_float", lambda: pn.i.astype("float64"),
      lambda: MNN().i.astype("float64"))
probe("ext_int_cumsum", lambda: pn.i.cumsum(), lambda: MNN().i.cumsum())

# ------------------------------------------------- where/mask promotion
pw = pd.DataFrame({"x": [1, 2, 3, 4], "y": [10.0, 20.0, 30.0, 40.0]})
def MW():
    return mpd.DataFrame(pw)

probe("where_int_to_float_promotion",
      lambda: pw.x.where(pw.x > 2),
      lambda: MW().x.where(MW().x > 2))
probe("where_other_scalar",
      lambda: pw.x.where(pw.x > 2, -1),
      lambda: MW().x.where(MW().x > 2, -1))
probe("mask_series_other",
      lambda: pw.x.mask(pw.x > 2, pw.y),
      lambda: MW().x.mask(MW().x > 2, MW().y))
probe("where_frame_cond",
      lambda: pw.where(pw > 2),
      lambda: MW().where(MW() > 2))
probe("where_nan_cond_is_false",
      lambda: pw.y.where(pd.Series([True, None, False, True])),
      lambda: MW().y.where(mpd.Series([True, None, False, True])))
probe("clip_nan_bound_series",
      lambda: pw.y.clip(lower=pd.Series([15.0, np.nan, 35.0, 5.0])),
      lambda: MW().y.clip(lower=mpd.Series([15.0, np.nan, 35.0, 5.0])))

# ------------------------------------------------- map na_action & misc
pm2 = pd.Series([1.0, np.nan, 3.0])
probe("map_na_action_ignore",
      lambda: pm2.map(lambda v: v * 10, na_action="ignore"),
      lambda: mpd.Series([1.0, np.nan, 3.0]).map(lambda v: v * 10, na_action="ignore"))
probe("map_dict_missing_to_nan",
      lambda: pm2.map({1.0: "one"}),
      lambda: mpd.Series([1.0, np.nan, 3.0]).map({1.0: "one"}))
probe("replace_dict_chain",
      lambda: pd.Series([1, 2, 3]).replace({1: 10, 2: 20}),
      lambda: mpd.Series([1, 2, 3]).replace({1: 10, 2: 20}))
probe("combine_min",
      lambda: pw.x.combine(pw.y, min),
      lambda: MW().x.combine(MW().y, min))

npass = sum(1 for _, ok, _ in RESULTS if ok)
print(f"\n{npass}/{len(RESULTS)} passed, {len(RESULTS) - npass} failed")
sys.exit(0 if npass == len(RESULTS) else 1)
