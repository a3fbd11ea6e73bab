"""Probe wave 59 (r15): quantile interpolation= variants (lower/higher/
nearest/midpoint across Series/frame/groupby), ddof= on std/var/sem
(0 and 2, incl. rolling/expanding/groupby), groupby introspection
(ngroups/groups/indices/dtypes/pipe), nunique(axis=1), mode(dropna=
False), first/last_valid_index, frame isin(dict), sample(weights=
column-name / axis=1). Differential vs real pandas.

Usage: python tools/probe_wave59.py [--verbose]
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
            elif isinstance(exp, dict):
                assert {k: list(v) if hasattr(v, "__iter__") and not isinstance(v, str) else v
                        for k, v in got.items()} == \
                       {k: list(v) if hasattr(v, "__iter__") and not isinstance(v, str) else v
                        for k, v in exp.items()}, (got, exp)
            else:
                assert got == exp or (pd.isna(got) and pd.isna(exp)), (got, exp)
            ok, detail = True, ""
        except Exception as e:
            ok, detail = False, str(e).replace("\n", " | ")[:260]
    RESULTS.append((name, ok, detail))
    if VERBOSE or not ok:
        print(("PASS " if ok else "FAIL ") + name + ("" if ok else "  :: " + detail))


vals = [1.0, 3.0, 4.0, 8.0, 9.0]
sv = pd.Series(vals)
def MV():
    return mpd.Series(vals)

# ------------------------------------------------- quantile interpolation
for interp in ["linear", "lower", "higher", "nearest", "midpoint"]:
    probe(f"series_quantile_{interp}",
          lambda i=interp: sv.quantile(0.35, interpolation=i),
          lambda i=interp: MV().quantile(0.35, interpolation=i))
pq = pd.DataFrame({"a": vals, "b": [2.0, 7.0, 1.0, 5.0, 6.0]})
def MQ():
    return mpd.DataFrame(pq)

probe("frame_quantile_lower",
      lambda: pq.quantile(0.4, interpolation="lower"),
      lambda: MQ().quantile(0.4, interpolation="lower"))
probe("frame_quantile_list",
      lambda: pq.quantile([0.25, 0.75]),
      lambda: MQ().quantile([0.25, 0.75]))
pg = pd.DataFrame({"g": ["x", "x", "x", "y", "y"], "v": vals})
def MG():
    return mpd.DataFrame(pg)

probe("groupby_quantile_higher",
      lambda: pg.groupby("g").v.quantile(0.5, interpolation="higher"),
      lambda: MG().groupby("g").v.quantile(0.5, interpolation="higher"))

# ------------------------------------------------- ddof variants
probe("std_ddof0", lambda: sv.std(ddof=0), lambda: MV().std(ddof=0))
probe("var_ddof2", lambda: sv.var(ddof=2), lambda: MV().var(ddof=2))
probe("sem_ddof0", lambda: sv.sem(ddof=0), lambda: MV().sem(ddof=0))
probe("groupby_std_ddof0",
      lambda: pg.groupby("g").v.std(ddof=0),
      lambda: MG().groupby("g").v.std(ddof=0))
probe("rolling_std_ddof0",
      lambda: sv.rolling(3).std(ddof=0),
      lambda: MV().rolling(3).std(ddof=0))
probe("expanding_var_ddof0",
      lambda: sv.expanding().var(ddof=0),
      lambda: MV().expanding().var(ddof=0))
probe("frame_std_ddof0",
      lambda: pq.std(ddof=0),
      lambda: MQ().std(ddof=0))

# ------------------------------------------------- groupby introspection
probe("groupby_ngroups",
      lambda: pg.groupby("g").ngroups,
      lambda: MG().groupby("g").ngroups)
probe("groupby_groups_keys",
      lambda: sorted(pg.groupby("g").groups.keys()),
      lambda: sorted(MG().groupby("g").groups.keys()))
probe("groupby_indices",
      lambda: {k: list(v) for k, v in pg.groupby("g").indices.items()},
      lambda: {k: list(v) for k, v in MG().groupby("g").indices.items()})
probe("groupby_pipe",
      lambda: pg.groupby("g").pipe(lambda g: g.v.sum()),
      lambda: MG().groupby("g").pipe(lambda g: g.v.sum()))
probe("groupby_dtypes_shape",
      lambda: pg.groupby("g").size().index.name,
      lambda: MG().groupby("g").size().index.name)

# ------------------------------------------------- frame misc
pn = pd.DataFrame({"a": [1.0, 1.0, np.nan], "b": [1.0, 2.0, np.nan],
                   "c": ["u", "u", None]})
def MN():
    return mpd.DataFrame(pn)

probe("nunique_axis1",
      lambda: pn.nunique(axis=1),
      lambda: MN().nunique(axis=1))
probe("nunique_axis1_dropna_false",
      lambda: pn.nunique(axis=1, dropna=False),
      lambda: MN().nunique(axis=1, dropna=False))
probe("mode_dropna_false",
      lambda: pn.a.mode(dropna=False),
      lambda: MN().a.mode(dropna=False))
probe("first_valid_index",
      lambda: pd.Series([np.nan, np.nan, 5.0, 1.0]).first_valid_index(),
      lambda: mpd.Series([np.nan, np.nan, 5.0, 1.0]).first_valid_index())
probe("last_valid_index",
      lambda: pd.Series([2.0, np.nan, 5.0, np.nan]).last_valid_index(),
      lambda: mpd.Series([2.0, np.nan, 5.0, np.nan]).last_valid_index())
probe("frame_isin_dict",
      lambda: pn.isin({"a": [1.0], "c": ["u"]}),
      lambda: MN().isin({"a": [1.0], "c": ["u"]}))
probe("frame_isin_list",
      lambda: pn[["a", "b"]].isin([1.0, 2.0]),
      lambda: MN()[["a", "b"]].isin([1.0, 2.0]))

# ------------------------------------------------- sample shapes
probe("sample_weights_colname_deterministic",
      lambda: pq.sample(n=2, weights="b", random_state=7).shape,
      lambda: MQ().sample(n=2, weights="b", random_state=7).shape)
probe("sample_axis1",
      lambda: sorted(pq.sample(n=1, axis=1, random_state=3).columns),
      lambda: sorted(MQ().sample(n=1, axis=1, random_state=3).columns.tolist()))
probe("sample_frac_all",
      lambda: pq.sample(frac=1.0, random_state=5).shape,
      lambda: MQ().sample(frac=1.0, random_state=5).shape)

npass = sum(1 for _, ok, _ in RESULTS if ok)
print(f"\n{npass}/{len(RESULTS)} passed, {len(RESULTS) - npass} failed")
sys.exit(0 if npass == len(RESULTS) else 1)
