"""Probe wave 54 (r15): query/eval corners (@locals, backtick columns,
in/not-in, chained comparisons, boolean ops), axis=1 reductions with NaN
(sum/mean/min/idxmax/any/count across columns), duplicated/drop_duplicates
with NaN in subset + keep=False, nlargest/nsmallest keep='all',
multi-column explode, insert/pop, get_dummies prefix/drop_first/dtype,
and DataFrame.agg named/list/dict shapes. Differential vs real pandas.

Usage: python tools/probe_wave54.py [--verbose]
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


# ----------------------------------------------------- query/eval corners
pq = pd.DataFrame({"a": [1, 2, 3, 4], "b x": [10, 20, 30, 40],
                   "c": ["u", "v", "u", "w"]})
def MQ():
    return mpd.DataFrame(pq)

lim = 2
probe("query_at_local",
      lambda: pq.query("a > @lim"),
      lambda: MQ().query("a > @lim"))
probe("query_backtick_col",
      lambda: pq.query("`b x` >= 20"),
      lambda: MQ().query("`b x` >= 20"))
probe("query_in_list",
      lambda: pq.query("c in ['u', 'w']"),
      lambda: MQ().query("c in ['u', 'w']"))
probe("query_not_in",
      lambda: pq.query("c not in ['u']"),
      lambda: MQ().query("c not in ['u']"))
probe("query_chained_cmp",
      lambda: pq.query("1 < a <= 3"),
      lambda: MQ().query("1 < a <= 3"))
probe("query_and_or_not",
      lambda: pq.query("(a > 1 and c == 'u') or not (a < 4)"),
      lambda: MQ().query("(a > 1 and c == 'u') or not (a < 4)"))
probe("eval_assign",
      lambda: pq.eval("d = a * 2"),
      lambda: MQ().eval("d = a * 2"))
probe("eval_expr_series",
      lambda: pq.eval("a + `b x`"),
      lambda: MQ().eval("a + `b x`"))
probe("query_index_name",
      lambda: pq.rename_axis("ix").query("ix >= 2"),
      lambda: MQ().rename_axis("ix").query("ix >= 2"))

# ----------------------------------------------------- axis=1 reductions
pr = pd.DataFrame({"x": [1.0, np.nan, 3.0], "y": [np.nan, np.nan, 1.0],
                   "z": [2.0, 5.0, np.nan]})
def MRX():
    return mpd.DataFrame(pr)

probe("axis1_sum", lambda: pr.sum(axis=1), lambda: MRX().sum(axis=1))
probe("axis1_sum_skipna_false", lambda: pr.sum(axis=1, skipna=False),
      lambda: MRX().sum(axis=1, skipna=False))
probe("axis1_mean", lambda: pr.mean(axis=1), lambda: MRX().mean(axis=1))
probe("axis1_min", lambda: pr.min(axis=1), lambda: MRX().min(axis=1))
probe("axis1_count", lambda: pr.count(axis=1), lambda: MRX().count(axis=1))
probe("axis1_idxmax", lambda: pr.idxmax(axis=1), lambda: MRX().idxmax(axis=1))
probe("axis1_any", lambda: (pr > 2).any(axis=1), lambda: (MRX() > 2).any(axis=1))
probe("axis1_all", lambda: (pr > 0).all(axis=1), lambda: (MRX() > 0).all(axis=1))
probe("axis1_std", lambda: pr.std(axis=1), lambda: MRX().std(axis=1))
probe("axis1_median", lambda: pr.median(axis=1), lambda: MRX().median(axis=1))

# --------------------------------------------- duplicated with NaN subset
pdup = pd.DataFrame({"k": [1.0, np.nan, 1.0, np.nan, 2.0],
                     "w": ["a", "b", "a", "c", "a"]})
def MDUP():
    return mpd.DataFrame(pdup)

probe("duplicated_nan_key",
      lambda: pdup.duplicated(subset="k"),
      lambda: MDUP().duplicated(subset="k"))
probe("duplicated_keep_false",
      lambda: pdup.duplicated(subset="k", keep=False),
      lambda: MDUP().duplicated(subset="k", keep=False))
probe("duplicated_keep_last",
      lambda: pdup.duplicated(subset=["k", "w"], keep="last"),
      lambda: MDUP().duplicated(subset=["k", "w"], keep="last"))
probe("drop_dup_nan_subset",
      lambda: pdup.drop_duplicates(subset="k").reset_index(drop=True),
      lambda: MDUP().drop_duplicates(subset="k").reset_index(drop=True))

# --------------------------------------------- nlargest/nsmallest keep=
pn = pd.DataFrame({"v": [5.0, 3.0, 5.0, 1.0, 3.0], "t": list("abcde")})
def MNL():
    return mpd.DataFrame(pn)

probe("nlargest_keep_all",
      lambda: pn.nlargest(2, "v", keep="all").reset_index(drop=True),
      lambda: MNL().nlargest(2, "v", keep="all").reset_index(drop=True))
probe("nsmallest_keep_all",
      lambda: pn.nsmallest(2, "v", keep="all").reset_index(drop=True),
      lambda: MNL().nsmallest(2, "v", keep="all").reset_index(drop=True))
probe("series_nlargest_keep_last",
      lambda: pn.v.nlargest(2, keep="last").reset_index(drop=True),
      lambda: MNL().v.nlargest(2, keep="last").reset_index(drop=True))

# --------------------------------------------- explode multi-column
pe = pd.DataFrame({"a": [[1, 2], [3], []], "b": [["x", "y"], ["z"], []],
                   "s": [10, 20, 30]})
def MEX():
    return mpd.DataFrame(pe)

probe("explode_multi_col",
      lambda: pe.explode(["a", "b"]).reset_index(drop=True),
      lambda: MEX().explode(["a", "b"]).reset_index(drop=True))
probe("explode_empty_list_nan",
      lambda: pe.explode("a").reset_index(drop=True)[["a", "s"]],
      lambda: MEX().explode("a").reset_index(drop=True)[["a", "s"]])
probe("explode_ignore_index",
      lambda: pe.explode("a", ignore_index=True)[["a", "s"]],
      lambda: MEX().explode("a", ignore_index=True)[["a", "s"]])

# --------------------------------------------- insert / pop
probe("insert_middle",
      lambda: (lambda d: (d.insert(1, "n", d.a * 2), d)[1])(pq.copy()),
      lambda: (lambda d: (d.insert(1, "n", d.a * 2), d)[1])(MQ()))
probe("pop_column",
      lambda: (lambda d: (d.pop("c"), d)[1])(pq.copy()),
      lambda: (lambda d: (d.pop("c"), d)[1])(MQ()))
probe("pop_returns_series",
      lambda: pq.copy().pop("c"),
      lambda: MQ().pop("c"))
probe("insert_duplicate_raises",
      lambda: (lambda d: d.insert(0, "a", [0, 0, 0, 0]))(pq.copy()),
      lambda: (lambda d: d.insert(0, "a", [0, 0, 0, 0]))(MQ()))

# --------------------------------------------- get_dummies variants
pg = pd.DataFrame({"c": ["u", "v", None, "u"], "d": ["p", "q", "p", None]})
def MG():
    return mpd.DataFrame(pg)

probe("get_dummies_basic",
      lambda: pd.get_dummies(pg).astype(int),
      lambda: mpd.get_dummies(MG()).astype(int))
probe("get_dummies_dummy_na",
      lambda: pd.get_dummies(pg, dummy_na=True).astype(int),
      lambda: mpd.get_dummies(MG(), dummy_na=True).astype(int))
probe("get_dummies_drop_first",
      lambda: pd.get_dummies(pg, drop_first=True).astype(int),
      lambda: mpd.get_dummies(MG(), drop_first=True).astype(int))
probe("get_dummies_prefix_sep",
      lambda: pd.get_dummies(pg, prefix={"c": "C", "d": "D"}, prefix_sep="~").astype(int),
      lambda: mpd.get_dummies(MG(), prefix={"c": "C", "d": "D"}, prefix_sep="~").astype(int))

# --------------------------------------------- frame agg shapes
probe("agg_list_per_col",
      lambda: pq[["a", "b x"]].agg(["sum", "mean"]),
      lambda: MQ()[["a", "b x"]].agg(["sum", "mean"]))
probe("agg_dict_mixed",
      lambda: pq.agg({"a": "sum", "b x": ["min", "max"]}),
      lambda: MQ().agg({"a": "sum", "b x": ["min", "max"]}))
probe("agg_named_kwargs_series",
      lambda: pq.a.agg(total="sum", hi="max"),
      lambda: MQ().a.agg(total="sum", hi="max"))

npass = sum(1 for _, ok, _ in RESULTS if ok)
print(f"\n{npass}/{len(RESULTS)} passed, {len(RESULTS) - npass} failed")
sys.exit(0 if npass == len(RESULTS) else 1)
