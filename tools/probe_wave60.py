"""Probe wave 60 (r15): replace() regex forms (dict-of-regex,
to_replace=regex + value, nested per-column dicts), frame named-agg
tuples (out=('col', 'fn')), merge_ordered fill_method, interpolate
method variants (nearest/quadratic/polynomial via index), first('3D')/
last('3D') offset slicing, Series.map(Series) lookup, take/get, and
iterrows/items shapes. Differential vs real pandas.

Usage: python tools/probe_wave60.py [--verbose]
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


# ------------------------------------------------- replace regex forms
ps = pd.Series(["cat hat", "bat", "dog", None])
def MS():
    return mpd.Series(["cat hat", "bat", "dog", None])

probe("replace_regex_value",
      lambda: ps.replace(r"^.at.*$", "MATCH", regex=True),
      lambda: MS().replace(r"^.at.*$", "MATCH", regex=True))
probe("replace_regex_dict",
      lambda: ps.replace({r"c.t": "C", r"d.g": "D"}, regex=True),
      lambda: MS().replace({r"c.t": "C", r"d.g": "D"}, regex=True))
probe("replace_list_to_list",
      lambda: pd.Series([1, 2, 3]).replace([1, 2], [10, 20]),
      lambda: mpd.Series([1, 2, 3]).replace([1, 2], [10, 20]))
probe("replace_scalar_all",
      lambda: pd.Series([1, 2, 1]).replace(1, 9),
      lambda: mpd.Series([1, 2, 1]).replace(1, 9))
pf = pd.DataFrame({"a": ["x1", "y2", "z3"], "b": [1, 2, 3]})
def MF():
    return mpd.DataFrame(pf)

probe("frame_replace_nested_dict",
      lambda: pf.replace({"a": {"x1": "X"}, "b": {2: 20}}),
      lambda: MF().replace({"a": {"x1": "X"}, "b": {2: 20}}))
probe("frame_replace_regex_kw",
      lambda: pf.replace(regex={r"[xyz]": "Q"}),
      lambda: MF().replace(regex={r"[xyz]": "Q"}))

# ------------------------------------------------- frame named aggs
pg = pd.DataFrame({"g": ["a", "a", "b"], "v": [1.0, 3.0, 5.0], "w": [2.0, 4.0, 6.0]})
def MG():
    return mpd.DataFrame(pg)

probe("frame_agg_named_tuples",
      lambda: pg.groupby("g").agg(lo=("v", "min"), hi=("w", "max")),
      lambda: MG().groupby("g").agg(lo=("v", "min"), hi=("w", "max")))
probe("series_gb_agg_list",
      lambda: pg.groupby("g").v.agg(["min", "max"]),
      lambda: MG().groupby("g").v.agg(["min", "max"]))
probe("frame_agg_no_group",
      lambda: pg[["v", "w"]].agg(x=("v", "sum")),
      lambda: MG()[["v", "w"]].agg(x=("v", "sum")))

# ------------------------------------------------- merge_ordered
pl = pd.DataFrame({"k": [1, 3, 5], "a": ["x", "y", "z"]})
pr = pd.DataFrame({"k": [2, 3, 6], "b": [10.0, 20.0, 30.0]})
probe("merge_ordered_basic",
      lambda: pd.merge_ordered(pl, pr, on="k"),
      lambda: mpd.merge_ordered(mpd.DataFrame(pl), mpd.DataFrame(pr), on="k"))
probe("merge_ordered_ffill",
      lambda: pd.merge_ordered(pl, pr, on="k", fill_method="ffill"),
      lambda: mpd.merge_ordered(mpd.DataFrame(pl), mpd.DataFrame(pr), on="k", fill_method="ffill"))

# ------------------------------------------------- interpolate methods
pi = pd.Series([1.0, np.nan, np.nan, 10.0, np.nan, 5.0])
def MI():
    return mpd.Series([1.0, np.nan, np.nan, 10.0, np.nan, 5.0])

probe("interpolate_linear", lambda: pi.interpolate(),
      lambda: MI().interpolate())
probe("interpolate_nearest", lambda: pi.interpolate(method="nearest"),
      lambda: MI().interpolate(method="nearest"))
probe("interpolate_limit", lambda: pi.interpolate(limit=1),
      lambda: MI().interpolate(limit=1))
pti = pd.Series([1.0, np.nan, 4.0],
                index=pd.to_datetime(["2024-01-01", "2024-01-02", "2024-01-04"]))
probe("interpolate_time",
      lambda: pti.interpolate(method="time"),
      lambda: mpd.Series(pti).interpolate(method="time"))

# ------------------------------------------------- first/last offsets
pt = pd.DataFrame({"v": range(6)},
                  index=pd.date_range("2024-01-01", periods=6, freq="D").rename("t"))
def MT():
    return mpd.DataFrame(pt.reset_index().rename(columns={"index": "t"})).set_index("t")

probe("first_3d",
      lambda: pt.first("3D"),
      lambda: MT().first("3D"))
probe("last_2d",
      lambda: pt.last("2D"),
      lambda: MT().last("2D"))

# ------------------------------------------------- map / take / get
probe("map_series_lookup",
      lambda: pd.Series(["a", "b", "c"]).map(pd.Series({"a": 1, "b": 2})),
      lambda: mpd.Series(["a", "b", "c"]).map(pd.Series({"a": 1, "b": 2})))
probe("take_positions",
      lambda: pf.take([2, 0]),
      lambda: MF().take([2, 0]))
probe("take_negative",
      lambda: pf.take([-1, -3]),
      lambda: MF().take([-1, -3]))
probe("frame_get_default",
      lambda: pf.get("nope", "fallback"),
      lambda: MF().get("nope", "fallback"))
probe("series_get_idx",
      lambda: pd.Series([1, 2], index=["x", "y"]).get("y"),
      lambda: mpd.Series([1, 2], index=["x", "y"]).get("y"))

# ------------------------------------------------- iterrows/items
probe("iterrows_shape",
      lambda: [(i, r.tolist()) for i, r in pf.iterrows()],
      lambda: [(i, r.tolist()) for i, r in MF().iterrows()])
probe("items_labels",
      lambda: [k for k, _ in pf.items()],
      lambda: [k for k, _ in MF().items()])

npass = sum(1 for _, ok, _ in RESULTS if ok)
print(f"\n{npass}/{len(RESULTS)} passed, {len(RESULTS) - npass} failed")
sys.exit(0 if npass == len(RESULTS) else 1)
