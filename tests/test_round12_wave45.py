"""Probe wave 45 (round 12): MultiIndex-column frames from mixed dict agg
specs — 2-level labels throughout (pandas promotes EVERY output to (column,
agg) when any spec value is a list), reductions return MultiIndex-ed Series,
stack sorts a non-uniform inner level, pivot_table margins row is last and
keeps the columns name."""

import numpy as np
import pandas as pd
import pytest

import modin_spark.pandas as mpd


def _pair():
    d = {"g": ["x", "y", "x", "y"], "h": ["p", "p", "q", "q"],
         "a": [1.0, 2.0, 3.0, 4.0], "b": [10, 20, 30, 40]}
    return pd.DataFrame(d), mpd.DataFrame(d)


def _eqf(got, exp):
    pd.testing.assert_frame_equal(got.to_pandas() if hasattr(got, "to_pandas") else got,
                                  exp, check_dtype=False, check_index_type=False,
                                  check_column_type=False)


def _eqs(got, exp):
    pd.testing.assert_series_equal(got.to_pandas() if hasattr(got, "to_pandas") else got,
                                   exp, check_dtype=False, check_index_type=False)


def test_mixed_dict_agg_multiindex_columns():
    P, M = _pair()
    exp = P.groupby("g").agg({"a": ["sum", "mean"], "b": "max"})
    got = M.groupby("g").agg({"a": ["sum", "mean"], "b": "max"})
    _eqf(got, exp)
    assert isinstance(got.to_pandas().columns, pd.MultiIndex)
    # level-0 selection, xs, droplevel, swaplevel, sort all flow from it
    _eqf(got["a"], exp["a"])
    _eqf(got.xs("sum", level=1, axis=1), exp.xs("sum", level=1, axis=1))
    _eqf(got.droplevel(1, axis=1), exp.droplevel(1, axis=1))
    _eqf(got.sort_index(axis=1), exp.sort_index(axis=1))


def test_mi_column_reduce_and_stack():
    P, M = _pair()
    exp = P.groupby("g").agg({"a": ["sum", "mean"], "b": "max"})
    got = M.groupby("g").agg({"a": ["sum", "mean"], "b": "max"})
    _eqs(got.sum(), exp.sum())
    _eqf(got.stack(), exp.stack())
    # uniform grid keeps appearance order
    _eqf(M.groupby("g").agg({"a": ["sum", "mean"]}).stack(),
         P.groupby("g").agg({"a": ["sum", "mean"]}).stack())


def test_pivot_table_margins_row_last():
    P, M = _pair()
    _eqf(M.pivot_table(index="g", columns="h", values="a", aggfunc="sum", margins=True),
         P.pivot_table(index="g", columns="h", values="a", aggfunc="sum", margins=True))
