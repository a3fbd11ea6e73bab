"""Probe wave 55 (r15): string regex tail (extractall, findall,
split/rsplit with n + expand, partition/rpartition, str.get_dummies,
extract with named groups), stack/unstack dropna + future_stack, concat
with keys= (hierarchical result), rolling closed= variants on count-based
and time-based windows, and groupby.transform with callables.
Differential vs real pandas.

Usage: python tools/probe_wave55.py [--verbose]
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


# ------------------------------------------------------- string regex tail
ps = pd.Series(["a1b2", "c3", None, "xy", "d4e5f6"])
def MS():
    return mpd.Series(["a1b2", "c3", None, "xy", "d4e5f6"])

probe("str_findall",
      lambda: ps.str.findall(r"\d"),
      lambda: MS().str.findall(r"\d"))
probe("str_extract_named_groups",
      lambda: ps.str.extract(r"(?P<letter>[a-z])(?P<num>\d)"),
      lambda: MS().str.extract(r"(?P<letter>[a-z])(?P<num>\d)"))
probe("str_extract_noexpand",
      lambda: ps.str.extract(r"(\d)", expand=False),
      lambda: MS().str.extract(r"(\d)", expand=False))
probe("str_split_n_expand",
      lambda: pd.Series(["a,b,c,d", "x,y", None]).str.split(",", n=2, expand=True),
      lambda: mpd.Series(["a,b,c,d", "x,y", None]).str.split(",", n=2, expand=True))
probe("str_rsplit_n",
      lambda: pd.Series(["a,b,c,d", "x,y", None]).str.rsplit(",", n=1),
      lambda: mpd.Series(["a,b,c,d", "x,y", None]).str.rsplit(",", n=1))
probe("str_partition",
      lambda: pd.Series(["a-b-c", "xy", None]).str.partition("-"),
      lambda: mpd.Series(["a-b-c", "xy", None]).str.partition("-"))
probe("str_rpartition",
      lambda: pd.Series(["a-b-c", "xy", None]).str.rpartition("-"),
      lambda: mpd.Series(["a-b-c", "xy", None]).str.rpartition("-"))
probe("str_get_dummies",
      lambda: pd.Series(["a|b", "b", None, "a|c"]).str.get_dummies("|").astype(int),
      lambda: mpd.Series(["a|b", "b", None, "a|c"]).str.get_dummies("|").astype(int))
probe("str_extractall",
      lambda: ps.str.extractall(r"(?P<d>\d)"),
      lambda: MS().str.extractall(r"(?P<d>\d)"))
probe("str_count_regex",
      lambda: ps.str.count(r"\d"),
      lambda: MS().str.count(r"\d"))
probe("str_replace_callable_absent_ok",
      lambda: ps.str.replace(r"\d", "#", regex=True),
      lambda: MS().str.replace(r"\d", "#", regex=True))
probe("str_slice_step",
      lambda: ps.str.slice(0, 4, 2),
      lambda: MS().str.slice(0, 4, 2))

# ------------------------------------------------- stack / concat keys
pf = pd.DataFrame({"x": [1.0, np.nan], "y": [3.0, 4.0]}, index=["r1", "r2"])
def MF():
    return mpd.DataFrame(pf)

probe("stack_dropna_default",
      lambda: pf.stack(),
      lambda: MF().stack())
probe("stack_dropna_false",
      lambda: pf.stack(dropna=False),
      lambda: MF().stack(dropna=False))
probe("unstack_back",
      lambda: pf.stack().unstack(),
      lambda: MF().stack().unstack())
probe("concat_keys_axis0",
      lambda: pd.concat([pf, pf * 2], keys=["one", "two"]),
      lambda: mpd.concat([MF(), MF() * 2], keys=["one", "two"]))
probe("concat_keys_names",
      lambda: pd.concat([pf, pf], keys=["p", "q"], names=["src", None]),
      lambda: mpd.concat([MF(), MF()], keys=["p", "q"], names=["src", None]))
probe("concat_axis1_keys",
      lambda: pd.concat([pf, pf * 2], axis=1, keys=["l", "r"]),
      lambda: mpd.concat([MF(), MF() * 2], axis=1, keys=["l", "r"]))

# ------------------------------------------------- rolling closed=
pr = pd.DataFrame({
    "t": pd.to_datetime(["2024-01-01 00:00", "2024-01-01 00:01",
                         "2024-01-01 00:03", "2024-01-01 00:06",
                         "2024-01-01 00:07"]),
    "v": [1.0, 2.0, 3.0, 4.0, 5.0],
}).set_index("t")
def MRR():
    return mpd.DataFrame(pr.reset_index()).set_index("t")

probe("rolling_time_closed_right",
      lambda: pr.v.rolling("3min", closed="right").sum(),
      lambda: MRR().v.rolling("3min", closed="right").sum())
probe("rolling_time_closed_left",
      lambda: pr.v.rolling("3min", closed="left").sum(),
      lambda: MRR().v.rolling("3min", closed="left").sum())
probe("rolling_time_closed_both",
      lambda: pr.v.rolling("3min", closed="both").sum(),
      lambda: MRR().v.rolling("3min", closed="both").sum())
probe("rolling_time_closed_neither",
      lambda: pr.v.rolling("3min", closed="neither").sum(),
      lambda: MRR().v.rolling("3min", closed="neither").sum())
probe("rolling_count_closed_both",
      lambda: pd.Series([1.0, 2.0, 3.0, 4.0]).rolling(2, closed="both").sum(),
      lambda: mpd.Series([1.0, 2.0, 3.0, 4.0]).rolling(2, closed="both").sum())

# ------------------------------------------------- groupby.transform callables
pg = pd.DataFrame({"g": ["a", "a", "b", "b", "b"], "v": [1.0, 2.0, 3.0, 4.0, 5.0]})
def MGG():
    return mpd.DataFrame(pg)

probe("gb_transform_lambda_demean",
      lambda: pg.groupby("g").v.transform(lambda s: s - s.mean()),
      lambda: MGG().groupby("g").v.transform(lambda s: s - s.mean()))
probe("gb_transform_np_func",
      lambda: pg.groupby("g").v.transform(np.cumsum),
      lambda: MGG().groupby("g").v.transform(np.cumsum))
probe("gb_transform_frame",
      lambda: pg.groupby("g").transform("max"),
      lambda: MGG().groupby("g").transform("max"))
probe("gb_agg_lambda",
      lambda: pg.groupby("g").v.agg(lambda s: s.max() - s.min()),
      lambda: MGG().groupby("g").v.agg(lambda s: s.max() - s.min()))

npass = sum(1 for _, ok, _ in RESULTS if ok)
print(f"\n{npass}/{len(RESULTS)} passed, {len(RESULTS) - npass} failed")
sys.exit(0 if npass == len(RESULTS) else 1)
