"""Probe wave 52 (round 12): Series.agg(dict), DataFrame.transform(dict),
row-apply returning a Series per row (expands to its index as columns),
SeriesGroupBy.describe flat stat columns, groupby.value_counts(normalize)."""

import pandas as pd
import pytest

import modin_spark.pandas as mpd


def _pair():
    d = {"g": ["x", "y", "x", "y"], "a": [1.0, 2.0, 3.0, 4.0], "b": [10, 20, 30, 40]}
    return pd.DataFrame(d), mpd.DataFrame(d)


def _eqf(got, exp):
    pd.testing.assert_frame_equal(got.to_pandas() if hasattr(got, "to_pandas") else got,
                                  exp, check_dtype=False, check_index_type=False,
                                  check_column_type=False)


def _eqs(got, exp):
    pd.testing.assert_series_equal(got.to_pandas() if hasattr(got, "to_pandas") else got,
                                   exp, check_dtype=False, check_index_type=False)


def test_series_agg_dict():
    P, M = _pair()
    _eqs(M["a"].agg({"s": "sum", "m": "mean"}), P["a"].agg({"s": "sum", "m": "mean"}))


def test_frame_transform_dict():
    P, M = _pair()
    _eqf(M[["a", "b"]].transform({"a": "sqrt", "b": "abs"}),
         P[["a", "b"]].transform({"a": "sqrt", "b": "abs"}))


def test_apply_axis1_series_result():
    P, M = _pair()
    f = lambda r: pd.Series({"s": r.a + r.b, "d": r.b - r.a})
    _eqf(M[["a", "b"]].apply(f, axis=1), P[["a", "b"]].apply(f, axis=1))
    # scalar and expand forms still work
    _eqs(M[["a", "b"]].apply(lambda r: r.a + r.b, axis=1),
         P[["a", "b"]].apply(lambda r: r.a + r.b, axis=1))


def test_series_groupby_describe_flat():
    P, M = _pair()
    _eqf(M.groupby("g")["a"].describe(), P.groupby("g")["a"].describe())
    _eqf(M.groupby("g").describe(), P.groupby("g").describe())


def test_groupby_value_counts_normalize():
    P, M = _pair()
    _eqs(M.groupby("g")["b"].value_counts(normalize=True),
         P.groupby("g")["b"].value_counts(normalize=True))
    _eqs(M.groupby("g")["b"].value_counts(), P.groupby("g")["b"].value_counts())
