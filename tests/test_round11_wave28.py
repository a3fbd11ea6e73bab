"""Probe wave 28 (round 11): exact with-replacement sampling, isin(Series)
mask materialization, row-axis sum skipna poisoning.
(tools/probe_wave28.py, 28 green)."""

import numpy as np
import pandas as pd
import pytest

import modin_spark.pandas as mpd


@pytest.fixture()
def pdf():
    return pd.DataFrame({"a": [3, 1, 2, 5, 4], "b": [1.5, np.nan, 2.5, 0.5, 3.5],
                         "k": list("xyxyx")})


def test_sample_replace_exact_count(pdf):
    m = mpd.from_pandas(pdf)
    got = m.sample(frac=2.0, replace=True, random_state=3).to_pandas()
    assert got.shape == (10, 3)              # EXACT, like pandas
    assert set(got.a) <= set(pdf.a)          # values drawn from the frame
    got2 = m.sample(n=7, replace=True, random_state=1).to_pandas()
    assert got2.shape == (7, 3)
    # deterministic for a fixed seed
    got3 = m.sample(n=7, replace=True, random_state=1).to_pandas()
    assert got2.a.tolist() == got3.a.tolist()


def test_isin_series_materializes(pdf):
    m = mpd.from_pandas(pdf)
    want = pdf.a.isin(pdf.a.head(2)).tolist()
    got = m.a.isin(m.a.head(2)).to_pandas().tolist()
    assert got == want
    # and still works as a filter (the join-based path)
    assert sorted(m[m.a.isin(m.a.head(2))].to_pandas().a) == sorted(pdf[pdf.a.isin(pdf.a.head(2))].a)


def test_row_sum_skipna_false(pdf):
    m = mpd.from_pandas(pdf)
    want = pdf[["a", "b"]].sum(axis=1, skipna=False).fillna(-9).tolist()
    got = m[["a", "b"]].sum(axis=1, skipna=False).to_pandas().fillna(-9).tolist()
    assert got == want
    # default skipna=True unchanged
    assert (m[["a", "b"]].sum(axis=1).to_pandas().tolist()
            == pdf[["a", "b"]].sum(axis=1).tolist())
