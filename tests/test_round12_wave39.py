"""Probe wave 39 (round 12): grouped-window index shapes (ewm/rolling.apply/
take), groupby corr/cov/corrwith MultiIndex results, pairwise window
corr/cov (incl. the frame-self matrix and ewm pairs), and set_index with
array-like keys. (tools/probe_wave39.py, 35 green)."""

import numpy as np
import pandas as pd
import pytest

import modin_spark.pandas as mpd


def _data():
    return {"g": ["x", "y", "x", "y", "x"],
            "a": [1.0, 2.0, 3.0, 4.0, 5.0],
            "b": [10, 20, 30, 40, 50]}


def _pair():
    d = _data()
    return pd.DataFrame(d), mpd.DataFrame(d)


def _eq_frame(got, exp):
    pd.testing.assert_frame_equal(
        got.to_pandas() if hasattr(got, "to_pandas") else got, exp,
        check_dtype=False, check_index_type=False, check_column_type=False)


def _eq_series(got, exp):
    pd.testing.assert_series_equal(
        got.to_pandas() if hasattr(got, "to_pandas") else got, exp,
        check_dtype=False, check_index_type=False)


def test_grouped_ewm_index_shape():
    P, M = _pair()
    _eq_frame(M.groupby("g").ewm(alpha=0.5).mean(),
              P.groupby("g").ewm(alpha=0.5).mean())
    _eq_series(M.groupby("g")["a"].ewm(alpha=0.5).mean(),
               P.groupby("g")["a"].ewm(alpha=0.5).mean())


def test_grouped_rolling_apply():
    P, M = _pair()
    _eq_frame(M.groupby("g").rolling(2)[["a"]].apply(lambda s: s.max()),
              P.groupby("g").rolling(2)[["a"]].apply(lambda s: s.max()))
    _eq_frame(M.groupby("g").rolling(2, min_periods=1).apply(np.nanmean, raw=True),
              P.groupby("g").rolling(2, min_periods=1)[["a", "b"]].apply(np.nanmean, raw=True))


def test_groupby_corr_cov_multiindex():
    P, M = _pair()
    _eq_frame(M.groupby("g")[["a", "b"]].corr(), P.groupby("g")[["a", "b"]].corr())
    _eq_frame(M.groupby("g")[["a", "b"]].cov(), P.groupby("g")[["a", "b"]].cov())


def test_groupby_corrwith():
    P, M = _pair()
    _eq_frame(M.groupby("g")[["a", "b"]].corrwith(M["a"]),
              P.groupby("g")[["a", "b"]].corrwith(P["a"]))


def test_groupby_apply_frame_result_keeps_inner_index():
    P, M = _pair()
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        exp = P.groupby("g").apply(lambda d: d[["a"]].describe())
    _eq_frame(M.groupby("g").apply(lambda d: d[["a"]].describe()), exp)


def test_groupby_take_shape():
    P, M = _pair()
    _eq_frame(M.groupby("g").take([0]), P.groupby("g").take([0]))
    _eq_frame(M.groupby("g").take([-1]), P.groupby("g").take([-1]))
    _eq_series(M.groupby("g")["a"].take([0]), P.groupby("g")["a"].take([0]))


def test_rolling_pair_name_rule():
    P, M = _pair()
    for stat in ("corr", "cov"):
        _eq_series(getattr(M["a"].rolling(3), stat)(M["b"]),
                   getattr(P["a"].rolling(3), stat)(P["b"]))
        _eq_series(getattr(M["a"].expanding(), stat)(M["b"]),
                   getattr(P["a"].expanding(), stat)(P["b"]))


def test_rolling_pairwise_frame_matrix():
    P, M = _pair()
    _eq_frame(M[["a", "b"]].rolling(3).corr(), P[["a", "b"]].rolling(3).corr())
    _eq_frame(M[["a", "b"]].rolling(3).cov(), P[["a", "b"]].rolling(3).cov())


def test_rolling_frame_vs_series():
    P, M = _pair()
    _eq_frame(M[["a", "b"]].rolling(3).corr(M["a"]),
              P[["a", "b"]].rolling(3).corr(P["a"]))


def test_ewm_pair_corr_cov():
    P, M = _pair()
    _eq_series(M["a"].ewm(alpha=0.5).corr(M["b"]), P["a"].ewm(alpha=0.5).corr(P["b"]))
    _eq_series(M["a"].ewm(alpha=0.5).cov(M["b"]), P["a"].ewm(alpha=0.5).cov(P["b"]))
    # adjust=False path and min_periods gating
    _eq_series(M["a"].ewm(span=3, adjust=False, min_periods=3).cov(M["b"]),
               P["a"].ewm(span=3, adjust=False, min_periods=3).cov(P["b"]))


def test_set_index_arraylike():
    P, M = _pair()
    idx = pd.Index(list("vwxyz"), name="L")
    _eq_frame(M.set_index(idx), P.set_index(idx))
    _eq_frame(M.set_index(np.array([5, 4, 3, 2, 1])), P.set_index(np.array([5, 4, 3, 2, 1])))
    # mixed label + array -> MultiIndex, array level named from the series
    s = pd.Series(list("pqrst"), name="S")
    _eq_frame(M.set_index(["g", s]), P.set_index(["g", s]))


def test_range_constructors_and_index_ops():
    pd.testing.assert_index_equal(mpd.date_range("2024-01-01", periods=4, freq="2D"),
                                  pd.date_range("2024-01-01", periods=4, freq="2D"))
    pd.testing.assert_index_equal(mpd.timedelta_range("1h", periods=4, freq="30min"),
                                  pd.timedelta_range("1h", periods=4, freq="30min"))
    P, M = _pair()
    pd.testing.assert_index_equal(M.index.union(pd.Index([7, 9])),
                                  P.index.union(pd.Index([7, 9])))
    assert M.columns.get_loc("a") == P.columns.get_loc("a")
