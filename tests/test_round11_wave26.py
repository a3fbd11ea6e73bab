"""Probe wave 26 (round 11): crosstab values/aggfunc + margins-last row,
groupby.transform length-preserving names, concat axis=1 keys/ignore_index,
Series/frame rename callable index mapper. (tools/probe_wave26.py, 29
green)."""

import numpy as np
import pandas as pd
import pytest

import modin_spark.pandas as mpd


@pytest.fixture()
def pdf():
    return pd.DataFrame({"a": [3, 1, 2, 5, 4], "b": [1.5, np.nan, 2.5, 0.5, 3.5],
                         "k": list("xyxyx"), "g": list("mmnnm")})


def test_crosstab_margins_all_row_last(pdf):
    m = mpd.from_pandas(pdf)
    want = pd.crosstab(pdf.k, pdf.g, margins=True)
    got = mpd.crosstab(m.k, m.g, margins=True).to_pandas()
    assert list(got.index) == list(want.index)  # [... , 'All'] LAST
    assert got.values.tolist() == want.values.tolist()


def test_crosstab_values_aggfunc(pdf):
    m = mpd.from_pandas(pdf)
    want = pd.crosstab(pdf.k, pdf.g, values=pdf.a, aggfunc="sum")
    got = mpd.crosstab(m.k, m.g, values=m.a, aggfunc="sum").to_pandas()
    assert got.fillna(-1).values.tolist() == want.fillna(-1).values.tolist()
    want2 = pd.crosstab(pdf.k, pdf.g, values=pdf.a, aggfunc="sum", margins=True)
    got2 = mpd.crosstab(m.k, m.g, values=m.a, aggfunc="sum", margins=True).to_pandas()
    assert got2.fillna(-1).values.tolist() == want2.fillna(-1).values.tolist()


def test_groupby_transform_rank_and_cums(pdf):
    m = mpd.from_pandas(pdf)
    for fn in ("rank", "cumsum", "cummax"):
        want = pdf.groupby("k")["a"].transform(fn).tolist()
        got = m.groupby("k")["a"].transform(fn).to_pandas().tolist()
        assert got == want, fn


def test_concat_axis1_keys_and_ignore_index(pdf):
    m = mpd.from_pandas(pdf)
    want = pd.concat([pdf[["a"]], pdf[["a"]]], axis=1, keys=["l", "r"])
    got = mpd.concat([m[["a"]], m[["a"]]], axis=1, keys=["l", "r"])
    assert [tuple(c) for c in got.columns] == [tuple(c) for c in want.columns]
    want2 = pd.concat([pdf[["a"]], pdf[["b"]]], axis=1, ignore_index=True)
    got2 = mpd.concat([m[["a"]], m[["b"]]], axis=1, ignore_index=True)
    assert list(got2.columns) == list(want2.columns) == [0, 1]


def test_rename_callable_index(pdf):
    p = pdf.set_index("k")
    m = mpd.from_pandas(p)
    want = p.a.rename(lambda x: x.upper())
    got = m.a.rename(lambda x: x.upper()).to_pandas()
    assert list(got.index) == list(want.index)
    wf = p.rename(index=str.upper)
    gf = m.rename(index=str.upper).to_pandas()
    assert list(gf.index) == list(wf.index)
