"""Probe wave 56 (r15): conversion free functions (to_numeric/to_datetime/
to_timedelta with errors=/unit=/format=), range constructors (date_range
closed ends, timedelta_range, period_range), cut/qcut kwarg tail
(labels=False, retbins, duplicates='drop', right=False), merge
index/key mixes (left_index+right_on, suffix collisions on key columns),
Series.searchsorted/dot/autocorr/between, and constructor shapes
(from_dict orient=, from_records). Differential vs real pandas.

Usage: python tools/probe_wave56.py [--verbose]
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
            elif isinstance(exp, np.ndarray):
                np.testing.assert_array_equal(np.asarray(got), exp)
            elif isinstance(exp, tuple):
                assert len(exp) == len(got)
                for e_i, g_i in zip(exp, got):
                    if isinstance(e_i, pd.Series):
                        pd.testing.assert_series_equal(_norm(g_i), e_i, check_dtype=False,
                                                       check_index_type=False)
                    elif isinstance(e_i, np.ndarray):
                        np.testing.assert_allclose(np.asarray(g_i), e_i)
                    else:
                        assert g_i == e_i
            else:
                assert got == exp or (pd.isna(got) and pd.isna(exp)), (got, exp)
            ok, detail = True, ""
        except Exception as e:
            ok, detail = False, str(e).replace("\n", " | ")[:260]
    RESULTS.append((name, ok, detail))
    if VERBOSE or not ok:
        print(("PASS " if ok else "FAIL ") + name + ("" if ok else "  :: " + detail))


# ------------------------------------------------- conversion functions
probe("to_numeric_coerce",
      lambda: pd.to_numeric(pd.Series(["1", "x", "2.5", None]), errors="coerce"),
      lambda: mpd.to_numeric(mpd.Series(["1", "x", "2.5", None]), errors="coerce"))
probe("to_numeric_downcast",
      lambda: pd.to_numeric(pd.Series(["1", "2"]), downcast="integer"),
      lambda: mpd.to_numeric(mpd.Series(["1", "2"]), downcast="integer"))
probe("to_datetime_fmt",
      lambda: pd.to_datetime(pd.Series(["01/02/2024", "03/04/2024"]), format="%d/%m/%Y"),
      lambda: mpd.to_datetime(mpd.Series(["01/02/2024", "03/04/2024"]), format="%d/%m/%Y"))
probe("to_datetime_coerce",
      lambda: pd.to_datetime(pd.Series(["2024-01-01", "nope"]), errors="coerce"),
      lambda: mpd.to_datetime(mpd.Series(["2024-01-01", "nope"]), errors="coerce"))
probe("to_datetime_unit_s",
      lambda: pd.to_datetime(pd.Series([0, 86400]), unit="s"),
      lambda: mpd.to_datetime(mpd.Series([0, 86400]), unit="s"))
probe("to_timedelta_strings",
      lambda: pd.to_timedelta(pd.Series(["1 day", "2h", None])),
      lambda: mpd.to_timedelta(mpd.Series(["1 day", "2h", None])))
probe("to_timedelta_unit",
      lambda: pd.to_timedelta(pd.Series([1, 2]), unit="h"),
      lambda: mpd.to_timedelta(mpd.Series([1, 2]), unit="h"))

# ------------------------------------------------- range constructors
probe("date_range_periods",
      lambda: pd.Series(pd.date_range("2024-01-01", periods=4, freq="D")),
      lambda: mpd.Series(mpd.date_range("2024-01-01", periods=4, freq="D")))
probe("date_range_inclusive_left",
      lambda: pd.Series(pd.date_range("2024-01-01", "2024-01-04", inclusive="left")),
      lambda: mpd.Series(mpd.date_range("2024-01-01", "2024-01-04", inclusive="left")))
probe("timedelta_range",
      lambda: pd.Series(pd.timedelta_range("1h", periods=3, freq="30min")),
      lambda: mpd.Series(mpd.timedelta_range("1h", periods=3, freq="30min")))
probe("date_range_bme",
      lambda: pd.Series(pd.date_range("2024-01-15", periods=3, freq="ME")),
      lambda: mpd.Series(mpd.date_range("2024-01-15", periods=3, freq="ME")))

# ------------------------------------------------- cut/qcut kwargs
vals = [1.0, 7.0, 5.0, 4.0, 6.0, 3.0]
probe("cut_labels_false",
      lambda: pd.cut(pd.Series(vals), 3, labels=False),
      lambda: mpd.cut(mpd.Series(vals), 3, labels=False))
probe("cut_right_false",
      lambda: pd.cut(pd.Series(vals), [0, 3, 5, 8], right=False).astype(str),
      lambda: mpd.cut(mpd.Series(vals), [0, 3, 5, 8], right=False).astype(str))
probe("cut_custom_labels",
      lambda: pd.cut(pd.Series(vals), [0, 4, 8], labels=["lo", "hi"]).astype(str),
      lambda: mpd.cut(mpd.Series(vals), [0, 4, 8], labels=["lo", "hi"]).astype(str))
probe("qcut_labels_false",
      lambda: pd.qcut(pd.Series(vals), 3, labels=False),
      lambda: mpd.qcut(mpd.Series(vals), 3, labels=False))
probe("qcut_duplicates_drop",
      lambda: pd.qcut(pd.Series([1, 1, 1, 1, 2]), 3, labels=False, duplicates="drop"),
      lambda: mpd.qcut(mpd.Series([1, 1, 1, 1, 2]), 3, labels=False, duplicates="drop"))
probe("cut_retbins_bins",
      lambda: pd.cut(pd.Series(vals), 2, retbins=True)[1],
      lambda: mpd.cut(mpd.Series(vals), 2, retbins=True)[1])

# ------------------------------------------------- merge mixes
pl = pd.DataFrame({"k": ["a", "b", "c"], "v": [1, 2, 3]}).set_index("k")
pr = pd.DataFrame({"kk": ["a", "a", "c"], "w": [10, 20, 30]})
probe("merge_leftindex_righton",
      lambda: pl.merge(pr, left_index=True, right_on="kk").reset_index(drop=True),
      lambda: mpd.DataFrame(pl.reset_index()).set_index("k")
                 .merge(mpd.DataFrame(pr), left_index=True, right_on="kk").reset_index(drop=True))
probe("merge_key_suffix_collision",
      lambda: pd.DataFrame({"k": [1], "v": [1]}).merge(
          pd.DataFrame({"k": [1], "v": [2]}), on="k"),
      lambda: mpd.DataFrame({"k": [1], "v": [1]}).merge(
          mpd.DataFrame({"k": [1], "v": [2]}), on="k"))
probe("join_on_column",
      lambda: pd.DataFrame({"k": ["a", "b"], "v": [1, 2]}).join(
          pd.DataFrame({"w": [10, 20]}, index=["a", "b"]), on="k"),
      lambda: mpd.DataFrame({"k": ["a", "b"], "v": [1, 2]}).join(
          mpd.DataFrame({"w": [10, 20]}, index=["a", "b"]), on="k"))

# ------------------------------------------------- Series methods
s9 = pd.Series([1.0, 3.0, 5.0, 7.0])
probe("searchsorted_left",
      lambda: s9.searchsorted([0.0, 4.0, 9.0], side="left"),
      lambda: mpd.Series([1.0, 3.0, 5.0, 7.0]).searchsorted([0.0, 4.0, 9.0], side="left"))
probe("searchsorted_right",
      lambda: s9.searchsorted(3.0, side="right"),
      lambda: mpd.Series([1.0, 3.0, 5.0, 7.0]).searchsorted(3.0, side="right"))
probe("series_dot",
      lambda: s9.dot(s9),
      lambda: mpd.Series([1.0, 3.0, 5.0, 7.0]).dot(mpd.Series([1.0, 3.0, 5.0, 7.0])))
probe("series_autocorr",
      lambda: round(pd.Series([1.0, 2.0, 3.0, 5.0, 8.0]).autocorr(), 9),
      lambda: round(mpd.Series([1.0, 2.0, 3.0, 5.0, 8.0]).autocorr(), 9))
probe("series_between_inclusive",
      lambda: s9.between(3, 5, inclusive="left"),
      lambda: mpd.Series([1.0, 3.0, 5.0, 7.0]).between(3, 5, inclusive="left"))
probe("series_repeat",
      lambda: pd.Series([1, 2]).repeat([2, 3]).reset_index(drop=True),
      lambda: mpd.Series([1, 2]).repeat([2, 3]).reset_index(drop=True))

# ------------------------------------------------- constructors
probe("from_dict_orient_index",
      lambda: pd.DataFrame.from_dict({"r1": [1, 2], "r2": [3, 4]}, orient="index",
                                     columns=["a", "b"]),
      lambda: mpd.DataFrame.from_dict({"r1": [1, 2], "r2": [3, 4]}, orient="index",
                                      columns=["a", "b"]))
probe("from_records_list",
      lambda: pd.DataFrame.from_records([(1, "x"), (2, "y")], columns=["n", "s"]),
      lambda: mpd.DataFrame.from_records([(1, "x"), (2, "y")], columns=["n", "s"]))
probe("from_dict_orient_tight",
      lambda: pd.DataFrame.from_dict(
          {"index": [0, 1], "columns": ["a"], "data": [[1], [2]],
           "index_names": [None], "column_names": [None]}, orient="tight"),
      lambda: mpd.DataFrame.from_dict(
          {"index": [0, 1], "columns": ["a"], "data": [[1], [2]],
           "index_names": [None], "column_names": [None]}, orient="tight"))

npass = sum(1 for _, ok, _ in RESULTS if ok)
print(f"\n{npass}/{len(RESULTS)} passed, {len(RESULTS) - npass} failed")
sys.exit(0 if npass == len(RESULTS) else 1)
