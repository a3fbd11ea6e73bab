"""Probe wave 61 (r15): dropna(axis=1/thresh/how/subset), clip with
axis=/per-column Series bounds, where(cond, other=frame), set_index
(append=True, drop=False), reset_index(level=subset), rename(level=),
add_prefix/add_suffix(axis=), sort_values(key=) on frames, pivot with
values list, resample(on=), count(axis=1), dropna subset on rows.
Differential vs real pandas.

Usage: python tools/probe_wave61.py [--verbose]
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


# ------------------------------------------------- dropna variants
pn = pd.DataFrame({"a": [1.0, np.nan, 3.0], "b": [np.nan, np.nan, np.nan],
                   "c": [1.0, 2.0, np.nan]})
def MN():
    return mpd.DataFrame(pn)

probe("dropna_axis1_any", lambda: pn.dropna(axis=1),
      lambda: MN().dropna(axis=1))
probe("dropna_axis1_all", lambda: pn.dropna(axis=1, how="all"),
      lambda: MN().dropna(axis=1, how="all"))
probe("dropna_thresh_rows", lambda: pn.dropna(thresh=2),
      lambda: MN().dropna(thresh=2))
probe("dropna_axis1_thresh", lambda: pn.dropna(axis=1, thresh=2),
      lambda: MN().dropna(axis=1, thresh=2))
probe("dropna_subset", lambda: pn.dropna(subset=["a"]),
      lambda: MN().dropna(subset=["a"]))
probe("count_axis1", lambda: pn.count(axis=1),
      lambda: MN().count(axis=1))

# ------------------------------------------------- clip variants
pc = pd.DataFrame({"x": [1.0, 5.0, 9.0], "y": [2.0, 6.0, 10.0]})
def MC():
    return mpd.DataFrame(pc)

probe("clip_scalar_frame", lambda: pc.clip(2, 8), lambda: MC().clip(2, 8))
probe("clip_axis1_per_column",
      lambda: pc.clip(lower=pd.Series({"x": 2.0, "y": 7.0}), axis=1),
      lambda: MC().clip(lower=pd.Series({"x": 2.0, "y": 7.0}), axis=1))
probe("clip_axis0_per_row",
      lambda: pc.clip(lower=pd.Series([3.0, 5.0, 11.0]), axis=0),
      lambda: MC().clip(lower=pd.Series([3.0, 5.0, 11.0]), axis=0))

# ------------------------------------------------- where other=frame
probe("where_other_frame",
      lambda: pc.where(pc > 4, other=-pc),
      lambda: MC().where(MC() > 4, other=-MC()))
probe("mask_other_scalar_frame",
      lambda: pc.mask(pc > 4, other=0),
      lambda: MC().mask(MC() > 4, other=0))

# ------------------------------------------------- set_index / reset_index
pi = pd.DataFrame({"k1": ["a", "b", "c"], "k2": [1, 2, 3], "v": [10.0, 20.0, 30.0]})
def MI():
    return mpd.DataFrame(pi)

probe("set_index_drop_false",
      lambda: pi.set_index("k1", drop=False),
      lambda: MI().set_index("k1", drop=False))
probe("set_index_append",
      lambda: pi.set_index("k1").set_index("k2", append=True),
      lambda: MI().set_index("k1").set_index("k2", append=True))
probe("reset_index_level_subset",
      lambda: pi.set_index(["k1", "k2"]).reset_index(level="k2"),
      lambda: MI().set_index(["k1", "k2"]).reset_index(level="k2"))
probe("reset_index_level_pos",
      lambda: pi.set_index(["k1", "k2"]).reset_index(level=0),
      lambda: MI().set_index(["k1", "k2"]).reset_index(level=0))

# ------------------------------------------------- rename / prefix
mcols = pd.MultiIndex.from_product([["a", "b"], ["x", "y"]], names=["L0", "L1"])
pmc = pd.DataFrame(np.arange(8.0).reshape(2, 4), columns=mcols)
probe("rename_level_columns",
      lambda: pmc.rename(columns={"x": "X"}, level=1).columns.tolist(),
      lambda: mpd.DataFrame(pmc).rename(columns={"x": "X"}, level=1).columns.tolist())
probe("add_prefix",
      lambda: pc.add_prefix("p_"),
      lambda: MC().add_prefix("p_"))
probe("add_suffix_axis0",
      lambda: pd.Series([1, 2], index=["a", "b"]).add_suffix("_s"),
      lambda: mpd.Series([1, 2], index=["a", "b"]).add_suffix("_s"))

# ------------------------------------------------- sort_values key=
probe("sort_values_key_frame",
      lambda: pd.DataFrame({"s": ["Bob", "alice", "Carl"]}).sort_values("s", key=lambda c: c.str.lower()),
      lambda: mpd.DataFrame({"s": ["Bob", "alice", "Carl"]}).sort_values("s", key=lambda c: c.str.lower()))
probe("sort_values_mixed_ascending",
      lambda: pi.sort_values(["k1", "k2"], ascending=[False, True]),
      lambda: MI().sort_values(["k1", "k2"], ascending=[False, True]))

# ------------------------------------------------- pivot values list
pp = pd.DataFrame({"r": ["a", "a", "b", "b"], "c": ["x", "y", "x", "y"],
                   "v1": [1.0, 2.0, 3.0, 4.0], "v2": [5.0, 6.0, 7.0, 8.0]})
probe("pivot_values_list",
      lambda: pp.pivot(index="r", columns="c", values=["v1", "v2"]),
      lambda: mpd.DataFrame(pp).pivot(index="r", columns="c", values=["v1", "v2"]))
probe("pivot_no_values",
      lambda: pp.pivot(index="r", columns="c"),
      lambda: mpd.DataFrame(pp).pivot(index="r", columns="c"))

# ------------------------------------------------- resample on=
pr = pd.DataFrame({
    "t": pd.to_datetime(["2024-01-01 00:10", "2024-01-01 00:40",
                         "2024-01-01 01:20", "2024-01-01 02:20"]),
    "v": [1.0, 2.0, 3.0, 4.0],
})
probe("resample_on_column",
      lambda: pr.resample("1h", on="t").v.sum(),
      lambda: mpd.DataFrame(pr).resample("1h", on="t").v.sum())
probe("asfreq_fill_value",
      lambda: pr.set_index("t").resample("30min").asfreq(fill_value=0.0),
      lambda: mpd.DataFrame(pr).set_index("t").resample("30min").asfreq(fill_value=0.0))

npass = sum(1 for _, ok, _ in RESULTS if ok)
print(f"\n{npass}/{len(RESULTS)} passed, {len(RESULTS) - npass} failed")
sys.exit(0 if npass == len(RESULTS) else 1)
