"""Probe wave 47 (r14): frame/series ALIGNMENT arithmetic — df.add(series,
axis=), fill_value flex ops, frame-frame ops with disjoint labels,
combine_first/update on frames, aligned setitem from a differently-indexed
Series, dot products, groupby observed=False on categoricals, NamedAgg,
agg with lambdas, transform string lists, Series.compare, rank on object
dtype, corr spearman/kendall fallbacks.

Usage: python tools/probe_wave47.py [--verbose]
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


pf = pd.DataFrame({"a": [1.0, 2.0, 3.0], "b": [10.0, None, 30.0]})
mf = mpd.DataFrame(pf)

# ---- frame/series arithmetic alignment ------------------------------------
srow = pd.Series({"a": 1.0, "b": 2.0, "z": 9.0})
probe("df_add_series_axis1",
      lambda: pf.add(srow, axis=1),
      lambda: mf.add(srow, axis=1))
scol = pd.Series([10.0, 20.0, 30.0])
probe("df_mul_series_axis0",
      lambda: pf.mul(scol, axis=0),
      lambda: mf.mul(mpd.Series(scol), axis=0))
probe("df_sub_fill_value",
      lambda: pf.sub(pf.iloc[::2] * 0, fill_value=100.0).sort_index(),
      lambda: mf.sub(mpd.DataFrame(pf.iloc[::2] * 0), fill_value=100.0).sort_index())
p2 = pd.DataFrame({"b": [5.0, 5.0, 5.0], "c": [1.0, 1.0, 1.0]})
probe("df_add_disjoint_cols",
      lambda: pf + p2,
      lambda: mf + mpd.DataFrame(p2))
probe("series_add_fill_value",
      lambda: pd.Series([1.0, 2.0], index=["x", "y"]).add(
          pd.Series([10.0], index=["y"]), fill_value=0),
      lambda: mpd.Series(pd.Series([1.0, 2.0], index=["x", "y"])).add(
          mpd.Series(pd.Series([10.0], index=["y"])), fill_value=0))

# ---- combine_first / update on frames ---------------------------------------
pa = pd.DataFrame({"x": [1.0, None], "y": [None, 4.0]})
pb = pd.DataFrame({"x": [9.0, 9.0], "z": [7.0, 7.0]})
probe("frame_combine_first",
      lambda: pa.combine_first(pb),
      lambda: mpd.DataFrame(pa).combine_first(mpd.DataFrame(pb)))
probe("frame_update",
      lambda: (lambda d: (d.update(pd.DataFrame({"x": [100.0]}, index=[1])), d)[1])(pa.copy()),
      lambda: (lambda d: (d.update(mpd.DataFrame(pd.DataFrame({"x": [100.0]}, index=[1]))), d)[1])(mpd.DataFrame(pa)))

# ---- aligned setitem -----------------------------------------------------------
probe("setitem_misaligned_series",
      lambda: (lambda d: (d.__setitem__("n", pd.Series([7.0], index=[2])), d)[1])(pf.copy()),
      lambda: (lambda d: (d.__setitem__("n", mpd.Series(pd.Series([7.0], index=[2]))), d)[1])(mpd.DataFrame(pf)))

# ---- dot ------------------------------------------------------------------------
probe("series_dot",
      lambda: float(pf["a"].dot(pf["a"])),
      lambda: float(mf["a"].dot(mf["a"])))
probe("frame_dot_series",
      lambda: pf.fillna(0).dot(pd.Series({"a": 2.0, "b": 0.5})),
      lambda: mf.fillna(0).dot(pd.Series({"a": 2.0, "b": 0.5})))

# ---- groupby observed / NamedAgg / lambdas -----------------------------------------
pg = pd.DataFrame({
    "k": pd.Categorical(["u", "v", "u"], categories=["u", "v", "w"]),
    "v": [1.0, 2.0, 3.0],
})
probe("gb_observed_false_sum",
      lambda: pg.groupby("k", observed=False)["v"].sum(),
      lambda: mpd.DataFrame(pg).groupby("k", observed=False)["v"].sum())
probe("gb_namedagg",
      lambda: pg.groupby("k", observed=True).agg(tot=pd.NamedAgg("v", "sum")),
      lambda: mpd.DataFrame(pg).groupby("k", observed=True).agg(tot=pd.NamedAgg("v", "sum")))
pl = pd.DataFrame({"g": list("aab"), "v": [1.0, 2.0, 3.0]})
ml = mpd.DataFrame(pl)
probe("gb_agg_lambda",
      lambda: pl.groupby("g")["v"].agg(lambda s: s.max() - s.min()),
      lambda: ml.groupby("g")["v"].agg(lambda s: s.max() - s.min()))
probe("gb_agg_mixed_list_lambda",
      lambda: pl.groupby("g")["v"].agg(["sum", lambda s: float(s.prod())]).rename(columns={"<lambda_0>": "f"}),
      lambda: ml.groupby("g")["v"].agg(["sum", lambda s: float(s.prod())]).rename(columns={"<lambda_0>": "f"}))
probe("gb_transform_strlist",
      lambda: pl.groupby("g")["v"].transform("mean"),
      lambda: ml.groupby("g")["v"].transform("mean"))

# ---- Series.compare / rank object / corr methods ------------------------------------
s1 = pd.Series([1.0, 2.0, 3.0])
s2 = pd.Series([1.0, 9.0, 3.0])
probe("series_compare",
      lambda: s1.compare(s2),
      lambda: mpd.Series(s1).compare(mpd.Series(s2)))
probe("rank_object",
      lambda: pd.Series(list("bca")).rank(),
      lambda: mpd.Series(list("bca")).rank())
pc = pd.DataFrame({"x": [1.0, 2.0, 3.0, 4.0], "y": [1.0, 3.0, 2.0, 4.0]})
# pandas needs SciPy (absent here) for spearman/kendall; the engine computes
# them natively — verify against closed-form values instead of pandas
probe("corr_spearman",
      lambda: 0.8,
      lambda: round(float(mpd.DataFrame(pc)["x"].corr(mpd.DataFrame(pc)["y"], method="spearman")), 9))
probe("corr_kendall",
      lambda: round(2.0 / 3.0, 9),
      lambda: round(float(mpd.DataFrame(pc)["x"].corr(mpd.DataFrame(pc)["y"], method="kendall")), 9))

# ---- misc alignment edges --------------------------------------------------------------
probe("series_sub_reversed_index",
      lambda: pd.Series([1.0, 2.0], index=["b", "a"]) - pd.Series([10.0, 20.0], index=["a", "b"]),
      lambda: mpd.Series(pd.Series([1.0, 2.0], index=["b", "a"])) -
              mpd.Series(pd.Series([10.0, 20.0], index=["a", "b"])))
probe("frame_radd_scalar", lambda: 10 + pf, lambda: 10 + mf)
probe("frame_rtruediv", lambda: (100 / pf).round(6), lambda: (100 / mf).round(6))
probe("frame_pow_series_axis0",
      lambda: pf.pow(pd.Series([1.0, 2.0, 0.5]), axis=0),
      lambda: mf.pow(mpd.Series(pd.Series([1.0, 2.0, 0.5])), axis=0))

n_fail = sum(1 for _, ok, _ in RESULTS if not ok)
print(f"\n{len(RESULTS)} probes, {n_fail} failures")
sys.exit(1 if n_fail else 0)
