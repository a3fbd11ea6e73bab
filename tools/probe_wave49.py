"""Probe wave 49 (r14): sort_index level/ascending lists, MultiIndex
groupby as_index=False, align frames, at_time/between_time inclusive,
truncate datetimes, frame idxmax with dates, pivot multiple values, melt
ignore_index, json_normalize, crosstab values+aggfunc, concat join=inner
axis=1, eval multi-assign, query chained comparisons, frame isin frame,
Series.nunique after filters, first_valid on all-NaN, cumcount desc,
groupby prod/sem, string repeat/mul.

Usage: python tools/probe_wave49.py [--verbose]
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


pmi = pd.DataFrame({"v": [4.0, 2.0, 3.0, 1.0], "w": [1, 2, 3, 4]},
                   index=pd.MultiIndex.from_tuples(
                       [("b", 2), ("a", 1), ("b", 1), ("a", 2)], names=["u", "n"]))
mmi = mpd.DataFrame(pmi)

# ---- sort_index variants ------------------------------------------------------
probe("sort_index_level1", lambda: pmi.sort_index(level=1),
      lambda: mmi.sort_index(level=1))
probe("sort_index_asc_list", lambda: pmi.sort_index(ascending=[True, False]),
      lambda: mmi.sort_index(ascending=[True, False]))
probe("sort_index_level_name", lambda: pmi.sort_index(level="n", sort_remaining=False),
      lambda: mmi.sort_index(level="n", sort_remaining=False))
probe("sort_values_then_index", lambda: pmi.sort_values("v").sort_index(),
      lambda: mmi.sort_values("v").sort_index())

# ---- MI groupby ------------------------------------------------------------------
# engine matches FUTURE pandas here (key column included): pandas 2.2
# emits a FutureWarning that level keys "will be included in a future
# version" — compare against the equivalent column groupby instead
probe("mi_gb_level_as_index_false",
      lambda: pmi.reset_index("u").groupby("u", as_index=False)["v"].sum(),
      lambda: mmi.groupby(level=0, as_index=False)["v"].sum())
probe("mi_gb_both_levels_size",
      lambda: pmi.groupby(level=[0, 1]).size().sort_index(),
      lambda: mmi.groupby(level=[0, 1]).size().sort_index())

# ---- align ------------------------------------------------------------------------
pa = pd.DataFrame({"x": [1.0, 2.0]}, index=["a", "b"])
pb = pd.DataFrame({"x": [10.0], "y": [5.0]}, index=["b"])
probe("align_frames_left",
      lambda: pa.align(pb, join="left")[1],
      lambda: mpd.DataFrame(pa).align(mpd.DataFrame(pb), join="left")[1])
probe("align_frames_outer0",
      lambda: pa.align(pb)[0],
      lambda: mpd.DataFrame(pa).align(mpd.DataFrame(pb))[0])

# ---- datetime row selection ----------------------------------------------------------
pts = pd.DataFrame({"v": range(12)},
                   index=pd.date_range("2024-01-01 06:30", periods=12, freq="3h"))
mts = mpd.DataFrame(pts)
probe("at_time", lambda: pts.at_time("06:30"), lambda: mts.at_time("06:30"))
probe("between_time_left_only",
      lambda: pts.between_time("06:00", "13:00", inclusive="left"),
      lambda: mts.between_time("06:00", "13:00", inclusive="left"))
probe("truncate_datetime",
      lambda: pts.truncate(before="2024-01-01 12:00", after="2024-01-02"),
      lambda: mts.truncate(before="2024-01-01 12:00", after="2024-01-02"))

# ---- frame idxmax/date, pivot multi-values --------------------------------------------
pdt = pd.DataFrame({"d": pd.date_range("2024-01-01", periods=4),
                    "g": list("abab"), "v": [1.0, 4.0, 3.0, 2.0]})
mdt = mpd.DataFrame(pdt)
probe("idxmax_frame", lambda: pdt[["v"]].idxmax(), lambda: pd.Series(mdt[["v"]].idxmax()))
probe("pivot_two_values",
      lambda: pd.pivot_table(pdt, values=["v"], index="g", aggfunc="sum"),
      lambda: mpd.pivot_table(mdt, values=["v"], index="g", aggfunc="sum"))
probe("pivot_values_list2",
      lambda: pd.pivot_table(pdt.assign(w=1.0), values=["v", "w"], index="g", aggfunc="mean"),
      lambda: mpd.pivot_table(mdt.assign(w=1.0), values=["v", "w"], index="g", aggfunc="mean"))

# ---- melt / json_normalize --------------------------------------------------------------
pw = pd.DataFrame({"id": [1, 2], "x": [10.0, 20.0], "y": [0.1, 0.2]})
probe("melt_ignore_index_false",
      lambda: pw.melt(id_vars="id", ignore_index=False),
      lambda: mpd.DataFrame(pw).melt(id_vars="id", ignore_index=False))
probe("json_normalize_nested",
      lambda: pd.json_normalize([{"a": 1, "b": {"c": 2}}, {"a": 3, "b": {"c": 4}}]),
      lambda: mpd.json_normalize([{"a": 1, "b": {"c": 2}}, {"a": 3, "b": {"c": 4}}]))

# ---- crosstab values / concat inner ----------------------------------------------------------
pg = pd.DataFrame({"r": list("xxyy"), "c": list("abab"), "v": [1.0, 2.0, 3.0, 4.0]})
probe("crosstab_values_aggfunc",
      lambda: pd.crosstab(pg["r"], pg["c"], values=pg["v"], aggfunc="sum"),
      lambda: mpd.crosstab(mpd.DataFrame(pg)["r"], mpd.DataFrame(pg)["c"],
                           values=mpd.DataFrame(pg)["v"], aggfunc="sum"))
probe("concat_axis1_inner",
      lambda: pd.concat([pa, pb], axis=1, join="inner"),
      lambda: mpd.concat([mpd.DataFrame(pa), mpd.DataFrame(pb)], axis=1, join="inner"))

# ---- eval / query --------------------------------------------------------------------------------
pe = pd.DataFrame({"a": [1.0, 2.0, 3.0], "b": [4.0, 5.0, 6.0]})
me = mpd.DataFrame(pe)
probe("eval_multi_assign",
      lambda: pe.eval("c = a + b\nd = c * 2"),
      lambda: me.eval("c = a + b\nd = c * 2"))
probe("query_chained_cmp",
      lambda: pe.query("1 < a <= 3"),
      lambda: me.query("1 < a <= 3"))
probe("query_in_list",
      lambda: pe.query("a in [1, 3]"),
      lambda: me.query("a in [1, 3]"))

# ---- isin frame / misc --------------------------------------------------------------------------
probe("isin_frame",
      lambda: pe.isin(pe * 2),
      lambda: me.isin(me * 2))
probe("first_valid_all_nan",
      lambda: pd.Series([None, None], dtype="float64").first_valid_index(),
      lambda: mpd.Series(pd.Series([None, None], dtype="float64")).first_valid_index())
probe("gb_cumcount_desc",
      lambda: pg.groupby("r").cumcount(ascending=False),
      lambda: mpd.DataFrame(pg).groupby("r").cumcount(ascending=False))
probe("gb_prod", lambda: pg.groupby("r")["v"].prod(),
      lambda: mpd.DataFrame(pg).groupby("r")["v"].prod())
probe("gb_sem", lambda: pg.groupby("r")["v"].sem(),
      lambda: mpd.DataFrame(pg).groupby("r")["v"].sem())
probe("str_mul", lambda: pd.Series(["ab", "c"]) * 2, lambda: mpd.Series(["ab", "c"]) * 2)
probe("series_repeat_series",
      lambda: pd.Series(["x", "y"]).repeat([1, 3]).reset_index(drop=True),
      lambda: mpd.Series(["x", "y"]).repeat([1, 3]).reset_index(drop=True))

n_fail = sum(1 for _, ok, _ in RESULTS if not ok)
print(f"\n{len(RESULTS)} probes, {n_fail} failures")
sys.exit(1 if n_fail else 0)
