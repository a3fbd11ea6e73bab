"""Probe wave 46 (r14): df.apply(axis=1), Series.apply/map edge shapes,
factorize, searchsorted sides, argsort/argmax, nlargest keep=, sample
frac/replace shapes, string methods (zfill/translate/wrap/casefold/
removeprefix/removesuffix/title/capitalize), wide_to_long, cumprod
skipna, any/all on objects, dt.date/time extraction, weekofyear,
Series.round to even, mode dropna, value_counts sort stability, diff of
bools, idxmax skipna=False, memory shape probes.

Usage: python tools/probe_wave46.py [--verbose]
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


pf = pd.DataFrame({"a": [3, 1, 2, 4], "b": [1.5, None, 2.5, 0.5], "c": list("wxyz")})
mf = mpd.DataFrame(pf)

# ---- apply axis=1 / map -------------------------------------------------------
probe("apply_axis1_scalar",
      lambda: pf.apply(lambda r: r["a"] * 2 + (r["b"] or 0), axis=1),
      lambda: mf.apply(lambda r: r["a"] * 2 + (r["b"] or 0), axis=1))
probe("apply_axis1_series_result",
      lambda: pf[["a"]].apply(lambda r: pd.Series({"x": r["a"], "y": r["a"] ** 2}), axis=1),
      lambda: mf[["a"]].apply(lambda r: pd.Series({"x": r["a"], "y": r["a"] ** 2}), axis=1))
probe("series_apply_str", lambda: pf["c"].apply(lambda v: v.upper()),
      lambda: mf["c"].apply(lambda v: v.upper()))
probe("frame_map_elementwise",
      lambda: pf[["a"]].map(lambda v: v + 1),
      lambda: mf[["a"]].map(lambda v: v + 1))

# ---- factorize / searchsorted / arg* -------------------------------------------
probe("factorize_codes",
      lambda: pd.Series(list("baca")).factorize()[0].tolist(),
      lambda: list(mpd.Series(list("baca")).factorize()[0]))
probe("factorize_uniques",
      lambda: list(pd.Series(list("baca")).factorize()[1]),
      lambda: list(mpd.Series(list("baca")).factorize()[1]))
probe("searchsorted_right",
      lambda: int(pd.Series([1, 3, 5, 7]).searchsorted(5, side="right")),
      lambda: int(mpd.Series([1, 3, 5, 7]).searchsorted(5, side="right")))
probe("argmax_", lambda: int(pf["a"].argmax()), lambda: int(mf["a"].argmax()))
probe("argsort_", lambda: pf["a"].argsort(), lambda: mf["a"].argsort())

# ---- nlargest ties / sample shapes -----------------------------------------------
pt = pd.Series([3, 3, 2, 1, 3])
mt = mpd.Series([3, 3, 2, 1, 3])
probe("nlargest_keep_first", lambda: pt.nlargest(2), lambda: mt.nlargest(2))
probe("nlargest_keep_all",
      lambda: sorted(pt.nlargest(2, keep="all").tolist()),
      lambda: sorted(mt.nlargest(2, keep="all").to_pandas().tolist()))
probe("sample_frac_shape",
      lambda: pf.sample(frac=0.5, random_state=3).shape[0],
      lambda: int(mf.sample(frac=0.5, random_state=3).to_pandas().shape[0]))
probe("sample_replace_n",
      lambda: pf.sample(n=8, replace=True, random_state=3).shape[0],
      lambda: int(mf.sample(n=8, replace=True, random_state=3).to_pandas().shape[0]))

# ---- string methods ----------------------------------------------------------------
ps = pd.Series(["héLLo wOrld", "  padded  ", None, "x-1_y"])
ms = mpd.Series(["héLLo wOrld", "  padded  ", None, "x-1_y"])
for meth in ("title", "capitalize", "casefold", "swapcase"):
    probe(f"str_{meth}", lambda m=meth: getattr(ps.str, m)(),
          lambda m=meth: getattr(ms.str, m)())
probe("str_zfill", lambda: pd.Series(["5", "-3", None]).str.zfill(4),
      lambda: mpd.Series(["5", "-3", None]).str.zfill(4))
probe("str_removeprefix", lambda: ps.str.removeprefix("hé"),
      lambda: ms.str.removeprefix("hé"))
probe("str_removesuffix", lambda: ps.str.removesuffix("_y"),
      lambda: ms.str.removesuffix("_y"))
probe("str_normalize_nfc",
      lambda: pd.Series(["é", "a"]).str.normalize("NFC"),
      lambda: mpd.Series(["é", "a"]).str.normalize("NFC"))
probe("str_count_regex", lambda: ps.str.count(r"[lo]"),
      lambda: ms.str.count(r"[lo]"))
probe("str_index_exc",
      lambda: pd.Series(["ab"]).str.index("z"),
      lambda: mpd.Series(["ab"]).str.index("z"))

# ---- wide_to_long --------------------------------------------------------------------
pw = pd.DataFrame({"id": [1, 2], "A1970": [10, 20], "A1980": [11, 21],
                   "B1970": [1.0, 2.0], "B1980": [1.1, 2.1]})
probe("wide_to_long",
      lambda: pd.wide_to_long(pw, ["A", "B"], i="id", j="year").sort_index(),
      lambda: mpd.wide_to_long(mpd.DataFrame(pw), ["A", "B"], i="id", j="year").sort_index())

# ---- cumprod / any / diff bools --------------------------------------------------------
probe("cumprod_skipna_false",
      lambda: pd.Series([1.0, None, 2.0]).cumprod(skipna=False),
      lambda: mpd.Series([1.0, None, 2.0]).cumprod(skipna=False))
probe("any_object", lambda: bool(pd.Series(["", "x"]).any()),
      lambda: bool(mpd.Series(["", "x"]).any()))
probe("all_object", lambda: bool(pd.Series(["", "x"]).all()),
      lambda: bool(mpd.Series(["", "x"]).all()))
probe("diff_bool",
      lambda: pd.Series([True, False, True]).diff(),
      lambda: mpd.Series([True, False, True]).diff())

# ---- datetime extraction ------------------------------------------------------------------
pdt = pd.Series(pd.date_range("2024-12-28", periods=6, freq="26h"))
mdt = mpd.Series(pdt)
probe("dt_date_str", lambda: pdt.dt.date.astype(str), lambda: mdt.dt.date.astype(str))
probe("dt_time_str", lambda: pdt.dt.time.astype(str), lambda: mdt.dt.time.astype(str))
probe("dt_isocal_year",
      lambda: pdt.dt.isocalendar().year.astype("int64"),
      lambda: mdt.dt.isocalendar().year.astype("int64"))
probe("dt_quarter", lambda: pdt.dt.quarter, lambda: mdt.dt.quarter)

# ---- misc ----------------------------------------------------------------------------------
probe("round_half_even", lambda: pd.Series([0.5, 1.5, 2.5]).round(),
      lambda: mpd.Series([0.5, 1.5, 2.5]).round())
probe("mode_dropna_false",
      lambda: pd.Series([1.0, 1.0, None, None, 2.0]).mode(dropna=False),
      lambda: mpd.Series([1.0, 1.0, None, None, 2.0]).mode(dropna=False))
probe("idxmax_skipna_false",
      lambda: pd.Series([1.0, None, 3.0]).idxmax(skipna=False),
      lambda: mpd.Series([1.0, None, 3.0]).idxmax(skipna=False))
probe("value_counts_sort_stable",
      lambda: pf["c"].value_counts().sort_index(),
      lambda: mf["c"].value_counts().sort_index())
probe("pos_dunder", lambda: +pd.Series([1, -2]), lambda: +mpd.Series([1, -2]))
probe("invert_bool", lambda: ~pd.Series([True, False]), lambda: ~mpd.Series([True, False]))
probe("series_eq_index_name",
      lambda: pd.Series([1, 2], index=pd.Index(["a", "b"], name="i")).rename("v").reset_index(),
      lambda: mpd.Series(pd.Series([1, 2], index=pd.Index(["a", "b"], name="i"))).rename("v").reset_index())

n_fail = sum(1 for _, ok, _ in RESULTS if not ok)
print(f"\n{len(RESULTS)} probes, {n_fail} failures")
sys.exit(1 if n_fail else 0)
