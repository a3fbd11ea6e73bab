"""Probe wave 22 (round 11): compare column-drop + original labels,
get_dummies bare-Series naming, str.cat null propagation, sum min_count,
all/any bool_only. Each diverged from pandas before the fix
(tools/probe_wave22.py swept 37 green cases; these are the fixed five)."""

import numpy as np
import pandas as pd
import pytest

import modin_spark.pandas as mpd


@pytest.fixture()
def pdf():
    return pd.DataFrame({"a": [3, 1, 2, 5, 4], "b": [1.5, np.nan, 2.5, 0.5, 3.5],
                         "k": list("xyxyx"), "s": ["ab", "cd", None, "ef", "gh"]})


def test_compare_drops_equal_columns_and_keeps_labels(pdf):
    m = mpd.from_pandas(pdf)
    want = pdf.compare(pdf.assign(a=[3, 9, 2, 5, 4]))
    got = m.compare(m.assign(a=[3, 9, 2, 5, 4])).to_pandas()
    assert list(got.columns) == list(want.columns) == [("a", "self"), ("a", "other")]
    assert list(got.index) == list(want.index) == [1]
    assert got.values.astype(float).tolist() == want.values.astype(float).tolist()


def test_compare_keep_shape_keep_equal(pdf):
    m = mpd.from_pandas(pdf)
    want = pdf.compare(pdf.assign(a=[3, 9, 2, 5, 4]), keep_shape=True, keep_equal=True)
    got = m.compare(m.assign(a=[3, 9, 2, 5, 4]), keep_shape=True, keep_equal=True).to_pandas()
    assert list(got.columns) == list(want.columns)
    assert got.fillna(-9).values.tolist() == want.fillna(-9).values.tolist()


def test_get_dummies_bare_series_unprefixed(pdf):
    m = mpd.from_pandas(pdf)
    assert sorted(mpd.get_dummies(m.k).columns) == sorted(pd.get_dummies(pdf.k).columns)
    assert sorted(mpd.get_dummies(m.k, drop_first=True).columns) == \
        sorted(pd.get_dummies(pdf.k, drop_first=True).columns)
    # explicit prefix still applies
    assert sorted(mpd.get_dummies(m.k, prefix="K").columns) == \
        sorted(pd.get_dummies(pdf.k, prefix="K").columns)


def test_str_cat_null_propagates(pdf):
    m = mpd.from_pandas(pdf)
    want = pdf.s.str.cat(pdf.k, sep="_").tolist()
    got = m.s.str.cat(m.k, sep="_").to_pandas().tolist()
    assert got[0] == want[0] and pd.isna(got[2]) and pd.isna(want[2])


def test_sum_min_count():
    m = mpd.from_pandas(pd.DataFrame({"x": [np.nan, np.nan]}))
    assert np.isnan(m.x.sum(min_count=1))
    assert m.x.sum() == 0.0  # pandas: all-NaN sum with default min_count=0
    m2 = mpd.from_pandas(pd.DataFrame({"x": [1.0, np.nan]}))
    assert m2.x.sum(min_count=1) == 1.0
    assert np.isnan(m2.x.sum(min_count=2))


def test_all_any_bool_only(pdf):
    p = pdf.assign(f=[True, True, False, True, True])
    m = mpd.from_pandas(p)
    assert m.all(bool_only=True).tolist() == p.all(bool_only=True).tolist()
    assert m.any(bool_only=True).tolist() == p.any(bool_only=True).tolist()
