"""Probe wave 43 (r14): IO round trips (csv options, json orient), frame
boolean masks, get_dummies variants, interval/period accessors, groupby
resample, window time offsets, astype categories, nunique/dropna combos,
duplicated subsets, idxmax axis=1, clip with series bounds, rolling on
frames, dt floor/ceil/round, string get_dummies, explode edges.

Usage: python tools/probe_wave43.py [--verbose]
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


rng = np.random.default_rng(43)
TMP = tempfile.mkdtemp(prefix="probe43_")

# ---- csv / json io options -----------------------------------------------
pcsv = pd.DataFrame({"a": [1, 2, 3], "b": ["x;q", "y", None], "c": [1.5, None, 3.25]})
csv_path = os.path.join(TMP, "t.csv")
pcsv.to_csv(csv_path, index=False, sep=";", na_rep="NULL")
probe("read_csv_sep_narep",
      lambda: pd.read_csv(csv_path, sep=";", na_values=["NULL"]),
      lambda: mpd.read_csv(csv_path, sep=";", na_values=["NULL"]).sort_values("a").reset_index(drop=True))
csv2 = os.path.join(TMP, "t2.csv")
pcsv.to_csv(csv2, index=False)
probe("read_csv_usecols_dtype",
      lambda: pd.read_csv(csv2, usecols=["a", "c"], dtype={"a": "int64"}),
      lambda: mpd.read_csv(csv2, usecols=["a", "c"], dtype={"a": "int64"}).sort_values("a").reset_index(drop=True))
probe("read_csv_skiprows_nrows",
      lambda: pd.read_csv(csv2, skiprows=[1], nrows=2),
      lambda: mpd.read_csv(csv2, skiprows=[1], nrows=2).sort_values("a").reset_index(drop=True))
jsn = os.path.join(TMP, "t.json")
pcsv.to_json(jsn, orient="records", lines=True)
probe("read_json_lines",
      lambda: pd.read_json(jsn, orient="records", lines=True),
      lambda: mpd.read_json(jsn, orient="records", lines=True).sort_values("a").reset_index(drop=True))

# ---- frame masks / indexing ------------------------------------------------
pf = pd.DataFrame({"a": [1, 2, 3, 4], "b": [4.0, None, 6.0, 7.0], "c": list("wxyz")})
mf = mpd.DataFrame(pf)
probe("df_bool_frame_mask", lambda: pf[pf[["a", "b"]] > 2],
      lambda: mf[mf[["a", "b"]] > 2])
probe("df_isin_dict", lambda: pf.isin({"a": [1, 3], "c": ["z"]}),
      lambda: mf.isin({"a": [1, 3], "c": ["z"]}))
probe("df_idxmax_axis1", lambda: pf[["a", "b"]].idxmax(axis=1),
      lambda: mf[["a", "b"]].idxmax(axis=1))
probe("df_clip_series_axis0",
      lambda: pf[["a", "b"]].clip(lower=pd.Series([1.5, 0, 5, 5]), axis=0),
      lambda: mf[["a", "b"]].clip(lower=pd.Series([1.5, 0, 5, 5]), axis=0))
probe("duplicated_subset_last", lambda: pf.assign(a=[1, 1, 3, 3]).duplicated(subset="a", keep="last"),
      lambda: mf.assign(a=[1, 1, 3, 3]).duplicated(subset="a", keep="last"))
probe("nunique_dropna_false", lambda: pf.nunique(dropna=False),
      lambda: mf.nunique(dropna=False))
probe("count_axis1", lambda: pf.count(axis=1), lambda: mf.count(axis=1))

# ---- get_dummies -------------------------------------------------------------
probe("get_dummies_prefix_drop_first",
      lambda: pd.get_dummies(pf["c"], prefix="p", drop_first=True),
      lambda: mpd.get_dummies(mf["c"], prefix="p", drop_first=True))
# raw float categories: labels stay FLOATS (astype("object") would launder
# them through the engine's documented object->string storage mapping)
probe("get_dummies_dummy_na",
      lambda: pd.get_dummies(pf["b"], dummy_na=True).astype(int),
      lambda: mpd.get_dummies(mf["b"], dummy_na=True).astype(int))
probe("str_get_dummies", lambda: pd.Series(["a|b", "b", None]).str.get_dummies("|"),
      lambda: mpd.Series(["a|b", "b", None]).str.get_dummies("|"))

# ---- datetime floor/ceil/round -------------------------------------------------
pdt = pd.Series(pd.date_range("2024-03-01 01:23:45", periods=6, freq="200min"))
mdt = mpd.Series(pdt)
for fn in ("floor", "ceil", "round"):
    probe(f"dt_{fn}_h",
          lambda f=fn: getattr(pdt.dt, f)("h"),
          lambda f=fn: getattr(mdt.dt, f)("h"))
probe("dt_to_period_q", lambda: pdt.dt.to_period("Q").astype(str),
      lambda: mdt.dt.to_period("Q").astype(str))
probe("dt_weekday_name", lambda: pdt.dt.day_name(),
      lambda: mdt.dt.day_name())

# ---- groupby resample / rolling on frames ---------------------------------------
pts = pd.DataFrame({
    "g": list("abab") * 6,
    "v": rng.normal(size=24),
}, index=pd.date_range("2024-01-01", periods=24, freq="45min"))
mts = mpd.DataFrame(pts)
probe("groupby_resample_sum",
      lambda: pts.groupby("g").resample("2h")["v"].sum(),
      lambda: mts.groupby("g").resample("2h")["v"].sum())
probe("frame_rolling_sum", lambda: pts[["v"]].rolling(4, min_periods=1).sum(),
      lambda: mts[["v"]].rolling(4, min_periods=1).sum())
probe("rolling_time_offset_mean",
      lambda: pts["v"].rolling("90min").mean(),
      lambda: mts["v"].rolling("90min").mean())
probe("expanding_frame_max", lambda: pts[["v"]].expanding(2).max(),
      lambda: mts[["v"]].expanding(2).max())

# ---- astype / categories / interval ---------------------------------------------
probe("astype_category_codes",
      lambda: pf["c"].astype("category").cat.codes,
      lambda: mf["c"].astype("category").cat.codes)
probe("cut_retbins_codes",
      lambda: pd.cut(pf["a"], 2, labels=False),
      lambda: mpd.cut(mf["a"], 2, labels=False))
probe("between_inclusive_neither",
      lambda: pf["a"].between(1, 3, inclusive="neither"),
      lambda: mf["a"].between(1, 3, inclusive="neither"))

# ---- explode edges ---------------------------------------------------------------
pe = pd.DataFrame({"l": [[1, 2], [], None, [3]], "k": list("abcd")})
me = mpd.DataFrame(pe)
probe("explode_empty_and_null",
      lambda: pe.explode("l").reset_index(drop=True),
      lambda: me.explode("l").reset_index(drop=True))
probe("explode_ignore_index",
      lambda: pe.explode("l", ignore_index=True),
      lambda: me.explode("l", ignore_index=True))

# ---- misc -------------------------------------------------------------------------
probe("series_repeat", lambda: pf["c"].repeat(2).reset_index(drop=True),
      lambda: mf["c"].repeat(2).reset_index(drop=True))
probe("frame_mode", lambda: pd.DataFrame({"x": [1, 1, 2], "y": [3, 4, 4]}).mode(),
      lambda: mpd.DataFrame({"x": [1, 1, 2], "y": [3, 4, 4]}).mode())
probe("rank_axis0_na_keep_frame",
      lambda: pf[["a", "b"]].rank(na_option="top"),
      lambda: mf[["a", "b"]].rank(na_option="top"))
probe("cov_min_periods", lambda: pf[["a", "b"]].cov(min_periods=3),
      lambda: mf[["a", "b"]].cov(min_periods=3))
probe("kurt_series", lambda: round(float(pf["a"].kurt()), 10),
      lambda: round(float(mf["a"].kurt()), 10))
probe("all_any_axis1", lambda: (pf[["a", "b"]] > 1).all(axis=1),
      lambda: (mf[["a", "b"]] > 1).all(axis=1))
probe("first_valid_index", lambda: pf["b"].first_valid_index(),
      lambda: mf["b"].first_valid_index())
probe("last_valid_index", lambda: pf["b"].last_valid_index(),
      lambda: mf["b"].last_valid_index())
probe("truncate_rows", lambda: pf.truncate(before=1, after=2),
      lambda: mf.truncate(before=1, after=2))
probe("series_map_dict", lambda: pf["c"].map({"w": 1, "x": 2}),
      lambda: mf["c"].map({"w": 1, "x": 2}))
probe("series_map_na_action",
      lambda: pf["b"].map(lambda v: v * 2, na_action="ignore"),
      lambda: mf["b"].map(lambda v: v * 2, na_action="ignore"))

n_fail = sum(1 for _, ok, _ in RESULTS if not ok)
print(f"\n{len(RESULTS)} probes, {n_fail} failures")
sys.exit(1 if n_fail else 0)
