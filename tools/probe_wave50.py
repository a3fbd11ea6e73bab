"""Probe wave 50 (r15): computed-NaN propagation — NaN produced ENGINE-side
(0/0) is Spark NaN, not NULL, so every op whose missing-handling keys off
isNull is suspect: merge keys, duplicated/drop_duplicates, unique/nunique,
value_counts(dropna=False), mode, isna-filters, fillna, sort placement,
set_index+groupby(level), pivot_table index, stack/unstack, idxmax/idxmin,
explode on empty lists, describe, rank na_option, rolling over NaN runs,
where/mask with NaN cond.

Usage: python tools/probe_wave50.py [--verbose]
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


# engine-side computed NaN: k = a/b with a 0/0 row (Spark NaN, not NULL)
pbase = pd.DataFrame({"a": [1.0, 2.0, 0.0, 4.0, 0.0], "b": [1.0, 1.0, 0.0, 2.0, 0.0],
                      "x": [1, 2, 3, 4, 5]})
def P():
    p = pbase.copy()
    p["k"] = p.a / p.b
    return p
def M():
    m = mpd.DataFrame(pbase)
    m["k"] = m.a / m.b
    return m

probe("nan_duplicated", lambda: P().k.duplicated(), lambda: M().k.duplicated())
probe("nan_drop_duplicates", lambda: P().drop_duplicates("k").reset_index(drop=True),
      lambda: M().drop_duplicates("k").reset_index(drop=True))
probe("nan_nunique", lambda: P().k.nunique(), lambda: M().k.nunique())
probe("nan_nunique_keepna", lambda: P().k.nunique(dropna=False),
      lambda: M().k.nunique(dropna=False))
probe("nan_unique_len", lambda: len(P().k.unique()), lambda: len(M().k.unique()))
probe("nan_value_counts", lambda: P().k.value_counts().sort_index(),
      lambda: M().k.value_counts().sort_index())
probe("nan_value_counts_keepna",
      lambda: P().k.value_counts(dropna=False).reset_index(drop=True),
      lambda: M().k.value_counts(dropna=False).reset_index(drop=True))
probe("nan_mode", lambda: P().k.mode(), lambda: M().k.mode())
probe("nan_isna_filter", lambda: P()[P().k.isna()].x.reset_index(drop=True),
      lambda: M()[M().k.isna()].x.reset_index(drop=True))
probe("nan_fillna", lambda: P().k.fillna(-1.0), lambda: M().k.fillna(-1.0))
probe("nan_dropna_frame", lambda: P().dropna().reset_index(drop=True),
      lambda: M().dropna().reset_index(drop=True))
probe("nan_sort_last", lambda: P().sort_values("k").x.reset_index(drop=True),
      lambda: M().sort_values("k").x.reset_index(drop=True))
probe("nan_sort_first", lambda: P().sort_values("k", na_position="first").x.reset_index(drop=True),
      lambda: M().sort_values("k", na_position="first").x.reset_index(drop=True))
probe("nan_count", lambda: P().k.count(), lambda: M().k.count())
probe("nan_mean_skip", lambda: P().k.mean(), lambda: M().k.mean())
probe("nan_describe_count", lambda: float(P().k.describe()["count"]),
      lambda: float(_norm(M().k.describe())["count"]))
probe("nan_idxmax", lambda: P().k.idxmax(), lambda: M().k.idxmax())
probe("nan_rank_keep", lambda: P().k.rank(), lambda: M().k.rank())
probe("nan_rank_top", lambda: P().k.rank(na_option="top"), lambda: M().k.rank(na_option="top"))
probe("nan_merge_key",
      lambda: pd.merge(P()[["k", "x"]], P()[["k"]].assign(y=1).drop_duplicates(), on="k", how="left").x.sum(),
      lambda: mpd.merge(M()[["k", "x"]], M()[["k"]].assign(y=1).drop_duplicates(), on="k", how="left").x.sum())
probe("nan_set_index_groupby_level",
      lambda: P().set_index("k").groupby(level=0).x.sum(),
      lambda: M().set_index("k").groupby(level=0).x.sum())
probe("nan_pivot_table",
      lambda: P().pivot_table(index="k", values="x", aggfunc="sum").reset_index(),
      lambda: M().pivot_table(index="k", values="x", aggfunc="sum").reset_index())
probe("nan_where_cond",
      lambda: P().x.where(P().k > 1.5),
      lambda: M().x.where(M().k > 1.5))
probe("nan_mask_cond",
      lambda: P().x.mask(P().k > 1.5, -9),
      lambda: M().x.mask(M().k > 1.5, -9))
probe("nan_cumsum_skip", lambda: P().k.cumsum(), lambda: M().k.cumsum())
probe("nan_rolling_minp", lambda: P().k.rolling(2, min_periods=1).sum(),
      lambda: M().k.rolling(2, min_periods=1).sum())
probe("nan_shift_fill", lambda: P().k.shift(1, fill_value=0.0),
      lambda: M().k.shift(1, fill_value=0.0))
probe("nan_clip", lambda: P().k.clip(0.5, 3.0), lambda: M().k.clip(0.5, 3.0))
probe("nan_astype_str", lambda: P().k.astype(str).str.slice(0, 3),
      lambda: M().k.astype(str).str.slice(0, 3))
probe("nan_eq_self", lambda: (P().k == P().k), lambda: (M().k == M().k))
probe("nan_ne", lambda: (P().k != 1.0), lambda: (M().k != 1.0))
probe("nan_isin_computed", lambda: P().k.isin([np.nan]), lambda: M().k.isin([np.nan]))
probe("nan_first_valid", lambda: P().k.first_valid_index(), lambda: M().k.first_valid_index())
probe("nan_last_valid", lambda: P().k.last_valid_index(), lambda: M().k.last_valid_index())
probe("nan_interpolate", lambda: P().k.interpolate(), lambda: M().k.interpolate())
probe("nan_ffill", lambda: P().k.ffill(), lambda: M().k.ffill())
probe("nan_diff", lambda: P().k.diff(), lambda: M().k.diff())
probe("nan_pct_change", lambda: P().k.pct_change(fill_method=None),
      lambda: M().k.pct_change(fill_method=None))
probe("nan_max_skipna_false", lambda: P().k.max(skipna=False), lambda: M().k.max(skipna=False))
probe("nan_any", lambda: P().k.isna().any(), lambda: bool(M().k.isna().any()))
probe("nan_explode_empty",
      lambda: pd.Series([[1, 2], [], [3]]).explode().reset_index(drop=True),
      lambda: mpd.Series(pd.Series([[1, 2], [], [3]])).explode().reset_index(drop=True))
probe("nan_stack",
      lambda: P()[["a", "k"]].stack().reset_index(drop=True),
      lambda: M()[["a", "k"]].stack().reset_index(drop=True))
probe("nan_transpose_roundtrip",
      lambda: P()[["a", "k"]].T.T.reset_index(drop=True),
      lambda: M()[["a", "k"]].T.T.reset_index(drop=True))

n_fail = sum(1 for _, ok, _ in RESULTS if not ok)
print(f"\n{len(RESULTS) - n_fail}/{len(RESULTS)} passed, {n_fail} failed")
sys.exit(1 if n_fail else 0)
