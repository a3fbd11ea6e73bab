"""Probe wave 41 (round 12): resample.apply(callable) with grid fill,
series-resampler transform shape, nlargest/nsmallest keep='all' ordering,
categorical groupby CategoricalIndex materialization, sort_values(key=),
at_time/between_time/first/last sweep confirmations."""

import numpy as np
import pandas as pd
import pytest

import modin_spark.pandas as mpd


def _eqs(got, exp):
    pd.testing.assert_series_equal(got.to_pandas(), exp, check_dtype=False,
                                   check_index_type=False, check_freq=False)


def _eqf(got, exp):
    pd.testing.assert_frame_equal(got.to_pandas(), exp, check_dtype=False,
                                  check_index_type=False, check_column_type=False,
                                  check_freq=False)


def _ts_pair():
    d = {"a": [1.0, 2.0, 3.0, 4.0],
         "t": pd.date_range("2024-01-01 09:00", periods=4, freq="7h")}
    return pd.DataFrame(d), mpd.DataFrame(d)


def test_resample_apply_callable():
    P, M = _ts_pair()
    _eqs(M.set_index("t")["a"].resample("1D").apply(lambda s: s.max() - s.min()),
         P.set_index("t")["a"].resample("1D").apply(lambda s: s.max() - s.min()))
    # empty grid buckets get func(empty series)
    _eqs(M.set_index("t")["a"].resample("5h").apply(lambda s: s.sum() if len(s) else -1.0),
         P.set_index("t")["a"].resample("5h").apply(lambda s: s.sum() if len(s) else -1.0))
    _eqf(M.set_index("t").resample("1D").apply(lambda s: s.max() - s.min()),
         P.set_index("t").resample("1D").apply(lambda s: s.max() - s.min()))


def test_resample_transform_series_shape():
    P, M = _ts_pair()
    _eqs(M.set_index("t")["a"].resample("1D").transform("mean"),
         P.set_index("t")["a"].resample("1D").transform("mean"))


def test_topk_keep_all_ordering():
    P = pd.DataFrame({"a": [1.0, 2.0, 3.0, 4.0], "b": [1, 2, 2, 0]})
    M = mpd.DataFrame({"a": [1.0, 2.0, 3.0, 4.0], "b": [1, 2, 2, 0]})
    for n, cols in [(2, "b"), (2, "a"), (3, ["b", "a"])]:
        _eqf(M.nlargest(n, cols, keep="all"), P.nlargest(n, cols, keep="all"))
        _eqf(M.nsmallest(n, cols, keep="all"), P.nsmallest(n, cols, keep="all"))


def test_categorical_groupby_index_dtype():
    P = pd.DataFrame({"g": ["x", "y", "x", "y"], "a": [1.0, 2.0, 3.0, 4.0]})
    P["c"] = pd.Categorical(P.g, categories=["x", "y", "z"])
    M = mpd.DataFrame({"g": ["x", "y", "x", "y"], "a": [1.0, 2.0, 3.0, 4.0]})
    M["c"] = pd.Categorical(P.g, categories=["x", "y", "z"])
    exp = P.groupby("c", observed=False)["a"].sum()
    got = M.groupby("c", observed=False)["a"].sum().to_pandas()
    pd.testing.assert_series_equal(got, exp, check_dtype=False)
    assert isinstance(got.index.dtype, pd.CategoricalDtype)


def test_sort_values_key_and_time_selectors():
    d = {"g": ["x", "y", "x", "y"], "a": [1.0, 2.0, 3.0, 4.0],
         "s": ["bbb", "a", "cc", "dddd"],
         "t": pd.date_range("2024-01-01 09:00", periods=4, freq="7h")}
    P, M = pd.DataFrame(d), mpd.DataFrame(d)
    _eqf(M.sort_values("s", key=lambda s: s.str.len()),
         P.sort_values("s", key=lambda s: s.str.len()))
    _eqf(M.set_index("t").at_time("09:00"), P.set_index("t").at_time("09:00"))
    _eqf(M.set_index("t").between_time("08:00", "17:00"),
         P.set_index("t").between_time("08:00", "17:00"))
    _eqf(M.set_index("t").first("1D"), P.set_index("t").first("1D"))
    _eqf(M.set_index("t").last("1D"), P.set_index("t").last("1D"))
