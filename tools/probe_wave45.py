"""Probe wave 45 (r14): setitem/loc/iloc WRITES, merge on index / join(),
Series.str.cat, concat axis=1 with keys, df.where(axis=), interpolate
directions, shift with freq-less fill, rounding family, abs/neg dunders,
series between datetimes, rank(pct) grouped, numpy veneer reductions,
first/last offset selection, to_string/to_dict shapes.

Usage: python tools/probe_wave45.py [--verbose]
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


rng = np.random.default_rng(45)
pf = pd.DataFrame({"a": [3, 1, 2, 4], "b": [1.5, None, 2.5, 0.5], "c": list("wxyz")})

# ---- loc/iloc writes ----------------------------------------------------------
def _wp(fn):
    d = pf.copy()
    fn(d)
    return d


def _wm(fn):
    d = mpd.DataFrame(pf)
    fn(d)
    return d


probe("loc_write_cell",
      lambda: _wp(lambda d: d.loc.__setitem__((1, "a"), 99)),
      lambda: _wm(lambda d: d.loc.__setitem__((1, "a"), 99)))
probe("loc_write_row_mask",
      lambda: _wp(lambda d: d.loc.__setitem__((d["a"] > 2, "b"), -1.0)),
      lambda: _wm(lambda d: d.loc.__setitem__((d["a"] > 2, "b"), -1.0)))
probe("iloc_write_col",
      lambda: _wp(lambda d: d.iloc.__setitem__((slice(None), 0), [9, 8, 7, 6])),
      lambda: _wm(lambda d: d.iloc.__setitem__((slice(None), 0), [9, 8, 7, 6])))
probe("loc_enlarge_row",
      lambda: _wp(lambda d: d.loc.__setitem__(4, [5, 5.0, "v"])),
      lambda: _wm(lambda d: d.loc.__setitem__(4, [5, 5.0, "v"])))
probe("setitem_scalar_col",
      lambda: _wp(lambda d: d.__setitem__("z", 1.25)),
      lambda: _wm(lambda d: d.__setitem__("z", 1.25)))
probe("setitem_from_expr",
      lambda: _wp(lambda d: d.__setitem__("t", d["a"] * 2 + d["b"].fillna(0))),
      lambda: _wm(lambda d: d.__setitem__("t", d["a"] * 2 + d["b"].fillna(0))))

# ---- merge on index / join ------------------------------------------------------
pl = pd.DataFrame({"x": [1, 2, 3]}, index=pd.Index(["a", "b", "c"], name="k"))
pr = pd.DataFrame({"y": [10, 30]}, index=pd.Index(["a", "c"], name="k"))
ml = mpd.DataFrame(pl)
mr = mpd.DataFrame(pr)
probe("merge_index_index",
      lambda: pl.merge(pr, left_index=True, right_index=True, how="left"),
      lambda: ml.merge(mr, left_index=True, right_index=True, how="left"))
probe("join_default",
      lambda: pl.join(pr), lambda: ml.join(mr))
probe("join_how_inner_suffix",
      lambda: pl.rename(columns={"x": "y"}).join(pr, how="inner", lsuffix="_l", rsuffix="_r"),
      lambda: ml.rename(columns={"x": "y"}).join(mr, how="inner", lsuffix="_l", rsuffix="_r"))
probe("merge_col_vs_index",
      lambda: pl.reset_index().merge(pr, left_on="k", right_index=True),
      lambda: ml.reset_index().merge(mr, left_on="k", right_index=True))

# ---- str.cat / concat keys -------------------------------------------------------
ps = pd.Series(["a", None, "c"])
ms = mpd.Series(["a", None, "c"])
probe("str_cat_sep",
      lambda: ps.str.cat(pd.Series(["1", "2", "3"]), sep="-", na_rep="?"),
      lambda: ms.str.cat(mpd.Series(["1", "2", "3"]), sep="-", na_rep="?"))
probe("concat_axis1_keys",
      lambda: pd.concat([pf[["a"]], pf[["b"]]], axis=1, keys=["u", "v"]),
      lambda: mpd.concat([mpd.DataFrame(pf)[["a"]], mpd.DataFrame(pf)[["b"]]],
                         axis=1, keys=["u", "v"]))

# ---- where axis / interpolate direction -------------------------------------------
probe("where_other_frame",
      lambda: pf[["a", "b"]].where(pf[["a", "b"]] > 1, other=-pf[["a", "b"]]),
      lambda: mpd.DataFrame(pf)[["a", "b"]].where(
          mpd.DataFrame(pf)[["a", "b"]] > 1, other=-mpd.DataFrame(pf)[["a", "b"]]))
pi = pd.Series([1.0, None, None, 4.0, None])
mi = mpd.Series([1.0, None, None, 4.0, None])
probe("interpolate_limit_backward",
      lambda: pi.interpolate(limit=1, limit_direction="backward"),
      lambda: mi.interpolate(limit=1, limit_direction="backward"))
probe("interpolate_limit_both",
      lambda: pi.interpolate(limit=1, limit_direction="both"),
      lambda: mi.interpolate(limit=1, limit_direction="both"))
probe("interpolate_inside",
      lambda: pi.interpolate(limit_area="inside"),
      lambda: mi.interpolate(limit_area="inside"))

# ---- rounding / numeric dunders ----------------------------------------------------
pv = pd.Series([1.25, -2.5, 3.75, None])
mv = mpd.Series([1.25, -2.5, 3.75, None])
probe("round_1", lambda: pv.round(1), lambda: mv.round(1))
probe("abs_", lambda: pv.abs(), lambda: mv.abs())
probe("neg_", lambda: -pv, lambda: -mv)
probe("floordiv_neg", lambda: pd.Series([7, -7]) // 2, lambda: mpd.Series([7, -7]) // 2)
probe("mod_neg", lambda: pd.Series([7, -7]) % 3, lambda: mpd.Series([7, -7]) % 3)
probe("divmod_", lambda: divmod(pd.Series([7, -7]), 3)[1],
      lambda: divmod(mpd.Series([7, -7]), 3)[1])

# ---- datetime selection --------------------------------------------------------------
pts = pd.DataFrame({"v": range(10)},
                   index=pd.date_range("2024-01-01", periods=10, freq="7h"))
mts = mpd.DataFrame(pts)
probe("first_offset", lambda: pts.first("1D"), lambda: mts.first("1D"))
probe("last_offset", lambda: pts.last("1D"), lambda: mts.last("1D"))
probe("between_datetime",
      lambda: pts[(pts.index >= "2024-01-02") & (pts.index < "2024-01-03")],
      lambda: mts[(mts.index >= "2024-01-02") & (mts.index < "2024-01-03")])

# ---- grouped rank pct ------------------------------------------------------------------
pg = pd.DataFrame({"g": list("aabb"), "v": [1.0, 2.0, 2.0, 5.0]})
mg = mpd.DataFrame(pg)
probe("gb_rank_pct", lambda: pg.groupby("g")["v"].rank(pct=True),
      lambda: mg.groupby("g")["v"].rank(pct=True))
probe("gb_pct_change", lambda: pg.groupby("g")["v"].pct_change(),
      lambda: mg.groupby("g")["v"].pct_change())

# ---- numpy veneer reductions ------------------------------------------------------------
import modin_spark.numpy as mnp

arr = mnp.array(mpd.Series([1.0, 4.0, 9.0]))
probe("np_sqrt_sum", lambda: float(np.sqrt(np.array([1.0, 4.0, 9.0])).sum()),
      lambda: float(mnp.sqrt(arr).sum()))
probe("np_clip_mean", lambda: float(np.clip(np.array([1.0, 4.0, 9.0]), 2, 8).mean()),
      lambda: float(mnp.clip(arr, 2, 8).mean()))

# ---- to_dict shapes ----------------------------------------------------------------------
probe("to_dict_records",  # fillna first: dict == dict is False through NaN
      lambda: pf.head(2).fillna(-1).to_dict(orient="records"),
      lambda: mpd.DataFrame(pf).head(2).fillna(-1).to_dict(orient="records"))
probe("series_to_dict", lambda: pf["a"].to_dict(),
      lambda: mpd.DataFrame(pf)["a"].to_dict())

n_fail = sum(1 for _, ok, _ in RESULTS if not ok)
print(f"\n{len(RESULTS)} probes, {n_fail} failures")
sys.exit(1 if n_fail else 0)
