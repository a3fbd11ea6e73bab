"""Probe wave 40 (round 12): groupby.apply label fidelity (func sees the
group's ORIGINAL row labels in frame order; scalar results -> group-keyed
Series; group_keys=False drops key levels and restores original order),
nth indexer slices, df.corrwith(Series), ewm(times=), expanding pairwise
matrices, Grouper(freq=). (tools/probe_wave40.py, 18 green)."""

import numpy as np
import pandas as pd
import pytest

import modin_spark.pandas as mpd


def _pair():
    d = {"g": ["x", "y", "x", "y", "x"],
         "a": [1.0, 2.0, 3.0, 4.0, 5.0],
         "b": [10, 20, 30, 40, 50],
         "t": pd.date_range("2024-01-01", periods=5, freq="h")}
    return pd.DataFrame(d), mpd.DataFrame(d)


def _eqf(got, exp):
    pd.testing.assert_frame_equal(got.to_pandas(), exp, check_dtype=False,
                                  check_index_type=False, check_column_type=False,
                                  check_freq=False)


def _eqs(got, exp):
    pd.testing.assert_series_equal(got.to_pandas(), exp, check_dtype=False,
                                   check_index_type=False, check_freq=False)


def test_apply_sees_original_labels():
    P, M = _pair()
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        _eqf(M.groupby("g").apply(lambda d: d[["a"]]),
             P.groupby("g").apply(lambda d: d[["a"]]))
        exp = P.set_index("t").groupby("g").apply(lambda d: d[["a"]] * 2)
    _eqf(M.set_index("t").groupby("g").apply(lambda d: d[["a"]] * 2), exp)
    # func receives rows in FRAME order, not label order
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        exp2 = P.sort_values("a", ascending=False).groupby("g").apply(lambda d: d["a"].iloc[0])
    _eqs(M.sort_values("a", ascending=False).groupby("g").apply(lambda d: d["a"].iloc[0]), exp2)


def test_apply_scalar_returns_series():
    P, M = _pair()
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        exp = P.groupby("g").apply(lambda d: d["a"].sum() + d.index.max())
    _eqs(M.groupby("g").apply(lambda d: d["a"].sum() + d.index.max()), exp)


def test_group_keys_false():
    P, M = _pair()
    _eqf(M.groupby("g", group_keys=False).apply(lambda d: d[["a"]]),
         P.groupby("g", group_keys=False).apply(lambda d: d[["a"]]))
    _eqf(M.groupby("g", group_keys=False).apply(lambda d: d[["a", "b"]].head(1)),
         P.groupby("g", group_keys=False).apply(lambda d: d[["a", "b"]].head(1)))
    _eqs(M.groupby("g", group_keys=False)["a"].apply(lambda s: s * 2),
         P.groupby("g", group_keys=False)["a"].apply(lambda s: s * 2))


def test_series_groupby_apply_shapes():
    P, M = _pair()
    for f in (lambda s: s.sum(), lambda s: s * 2, lambda s: s.describe()[:2]):
        _eqs(M.groupby("g")["a"].apply(f), P.groupby("g")["a"].apply(f))


def test_nth_indexer():
    P, M = _pair()
    for sl in (slice(None, 2), slice(1, None), slice(None, None, 2), slice(-1, None)):
        _eqf(M.groupby("g").nth[sl], P.groupby("g").nth[sl])
    _eqf(M.groupby("g").nth(1), P.groupby("g").nth(1))
    _eqf(M.groupby("g").nth([0, -1]), P.groupby("g").nth([0, -1]))


def test_corrwith_series_operand():
    P, M = _pair()
    _eqs(M[["a", "b"]].corrwith(M["b"]), P[["a", "b"]].corrwith(P["b"]))


def test_expanding_pairwise_matrix():
    P, M = _pair()
    _eqf(M[["a", "b"]].expanding().corr(), P[["a", "b"]].expanding().corr())
    _eqf(M[["a", "b"]].expanding().cov(), P[["a", "b"]].expanding().cov())


def test_ewm_times():
    t = pd.DatetimeIndex(["2024-01-01 00:00", "2024-01-01 00:01",
                          "2024-01-01 00:10", "2024-01-01 01:00",
                          "2024-01-01 01:01"])
    P, M = _pair()
    _eqs(M["a"].ewm(halflife="10min", times=t).mean(),
         P["a"].ewm(halflife="10min", times=t).mean())
    _eqs(M["a"].ewm(halflife="30min", times=t).sum(),
         P["a"].ewm(halflife="30min", times=t).sum())


def test_grouper_freq():
    P, M = _pair()
    _eqs(M.groupby(mpd.Grouper(key="t", freq="2h"))["a"].sum(),
         P.groupby(pd.Grouper(key="t", freq="2h"))["a"].sum())
