"""Probe wave 37: interactions of round-12 machinery — constructor-built
Series through downstream ops, extension dtypes through joins/groupby/sort,
concat label preservation with indexed parts, enlargement edge cases.

Usage: python tools/probe_wave37.py
"""
import os
import sys
import warnings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
warnings.filterwarnings("ignore")

import numpy as np
import pandas as pd

import modin_spark.pandas as mpd

RESULTS = []


def probe(name):
    def deco(fn):
        try:
            exp = fn(pd)
        except Exception as e:
            exp = f"RAISE:{type(e).__name__}"
        try:
            got = fn(mpd)
            if hasattr(got, "to_pandas"):
                got = got.to_pandas()
        except Exception as e:
            got = f"RAISE:{type(e).__name__}"
        ok = False
        try:
            if isinstance(exp, str) or isinstance(got, str):
                ok = isinstance(exp, str) and isinstance(got, str) and exp == got
            elif isinstance(exp, pd.DataFrame):
                pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                              check_index_type=False,
                                              check_column_type=False,
                                              check_categorical=False, check_freq=False)
                ok = True
            elif isinstance(exp, pd.Series):
                pd.testing.assert_series_equal(got, exp, check_dtype=False,
                                               check_index_type=False,
                                               check_categorical=False, check_freq=False)
                ok = True
            else:
                try:
                    ok = bool(exp == got) or bool(pd.isna(exp) and pd.isna(got))
                except (ValueError, TypeError):
                    ok = False
        except (AssertionError, ValueError, TypeError):
            ok = False
        RESULTS.append((name, ok))
        print(f"{'PASS' if ok else 'DIFF'} {name}")
        if not ok:
            print(f"  exp: {str(exp)[:160]}")
            print(f"  got: {str(got)[:160]}")
        return fn
    return deco


@probe("series_groupby_self")
def _(l):
    s = l.Series([1, 2, 3, 4], index=["a", "b", "a", "b"])
    return s.groupby(level=0).sum()


@probe("series_value_counts_after_ctor")
def _(l):
    return l.Series(["x", "y", "x"], name="v").value_counts()


@probe("series_reset_index_named")
def _(l):
    s = l.Series([1, 2], index=l.Index(["a", "b"], name="k") if hasattr(l, "Index") else ["a", "b"], name="v")
    return s.reset_index()


@probe("series_to_frame_unnamed")
def _(l):
    return l.Series([1, 2]).to_frame()


@probe("series_rank_after_ctor")
def _(l):
    return l.Series([3, 1, 2]).rank()


@probe("series_cumsum_custom_index")
def _(l):
    return l.Series([1, 2, 3], index=[10, 20, 30]).cumsum()


@probe("ext_dtype_through_sort")
def _(l):
    s = l.Series(pd.array([3, None, 1], dtype="Int64"))
    return s.sort_values()


@probe("ext_dtype_groupby_mean")
def _(l):
    d = l.DataFrame({"k": ["a", "a", "b"], "v": pd.array([1, None, 3], dtype="Int64")})
    return d.groupby("k")["v"].mean()


@probe("ext_dtype_merge_suffix")
def _(l):
    a = l.DataFrame({"k": [1, 2], "v": pd.array([1, None], dtype="Int64")})
    b = l.DataFrame({"k": [1, 2], "v": [5.0, 6.0]})
    return a.merge(b, on="k", suffixes=("_l", "_r")).sort_values("k").reset_index(drop=True)


@probe("concat_series_indexed_parts")
def _(l):
    s1 = l.Series([1, 2], index=["a", "b"], name="v")
    s2 = l.Series([3], index=["c"], name="v")
    return l.concat([s1, s2])


@probe("concat_series_mixed_default_and_indexed")
def _(l):
    s1 = l.Series([1, 2], name="v")
    s2 = l.Series([3], index=["c"], name="v")
    return l.concat([s1, s2])


@probe("concat_frames_keeps_labels")
def _(l):
    a = l.DataFrame({"x": [1, 2]}, index=["p", "q"])
    b = l.DataFrame({"x": [3]}, index=["r"])
    return l.concat([a, b])


@probe("loc_enlarge_multi_col")
def _(l):
    d = l.DataFrame({"a": [1.0], "b": [2.0]}, index=["x"])
    d.loc["y", ["a", "b"]] = [5.0, 6.0]
    return d


@probe("loc_setitem_ext_col")
def _(l):
    d = l.DataFrame({"a": pd.array([1, None], dtype="Int64")}, index=["x", "y"])
    d.loc["y", "a"] = 7
    return d


@probe("cut_labels_false_codes")
def _(l):
    return l.cut(l.Series([1.0, 5.0, 9.0]), 3, labels=False)


@probe("qcut_drop_retbins")
def _(l):
    r, b = l.qcut(l.Series([1, 1, 1, 2, 3]), 3, duplicates="drop", retbins=True, labels=False)
    return list(np.round(b, 4))


@probe("series_compare")
def _(l):
    a = l.Series([1, 2, 3], name="v")
    b = l.Series([1, 9, 3], name="v")
    return a.compare(b)


@probe("series_update")
def _(l):
    s = l.Series([1.0, 2.0, 3.0])
    s.update(l.Series([9.0], index=[1]))
    return s


@probe("mask_where_on_ctor_series")
def _(l):
    s = l.Series([1, 2, 3, 4])
    return s.where(s > 2, -1)


@probe("df_from_series_list_roundtrip")
def _(l):
    rows = [l.Series([1, 2], index=["a", "b"], name="r1"),
            l.Series([3, 4], index=["a", "b"], name="r2")]
    return l.DataFrame(rows)


@probe("series_astype_after_ctor")
def _(l):
    return l.Series(["1", "2"]).astype(int) * 2


@probe("series_dropna_name")
def _(l):
    return l.Series([1.0, np.nan, 3.0], name="z").dropna()


@probe("series_between_inclusive")
def _(l):
    s = l.Series([1, 2, 3, 4])
    return s.between(2, 3, inclusive="left")


@probe("dup_index_reindex_raises")
def _(l):
    s = l.Series([1, 2], index=["a", "a"])
    try:
        return s.reindex(["a", "b"])
    except Exception as e:
        return f"RAISE:{type(e).__name__}"


@probe("series_idxmax_custom_index")
def _(l):
    return l.Series([1, 9, 2], index=["p", "q", "r"]).idxmax()


@probe("frame_sum_empty_after_filter")
def _(l):
    d = l.DataFrame({"a": [1.0, 2.0]})
    return d[d["a"] > 99]["a"].sum()


if __name__ == "__main__":
    n_ok = sum(1 for _, ok in RESULTS if ok)
    print(f"\n{n_ok}/{len(RESULTS)} probes pass")
