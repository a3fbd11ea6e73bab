"""Probe wave 29 (round 11): Series.asof key-collision fix, join(list),
mode(dropna=False), legacy (name, fn) tuple-list groupby agg, raw-pandas
Series operands in frame flex ops. (tools/probe_wave29.py, 21 green +
1 documented duplicate-label alignment divergence)."""

import numpy as np
import pandas as pd
import pytest

import modin_spark.pandas as mpd


@pytest.fixture()
def pdf():
    return pd.DataFrame({"a": [3, 1, 2, 5, 4], "b": [1.5, np.nan, 2.5, 0.5, 3.5],
                         "k": list("xyxyx"),
                         "t": pd.date_range("2024-01-01", periods=5, freq="D")})


def test_series_asof_scalar_and_list(pdf):
    p = pdf.set_index("t")
    m = mpd.from_pandas(p)
    w = pd.Timestamp("2024-01-03 12:00")
    assert m.a.asof(w) == p.a.asof(w)
    want = p.a.asof([w, pd.Timestamp("2024-01-05")]).tolist()
    got = m.a.asof([w, pd.Timestamp("2024-01-05")]).to_pandas().tolist()
    assert got == want


def test_join_list_of_frames(pdf):
    m = mpd.from_pandas(pdf)
    want = pdf[["a"]].join([pdf[["b"]], pdf[["k"]]])
    got = m[["a"]].join([m[["b"]], m[["k"]]]).to_pandas()
    assert list(got.columns) == list(want.columns)
    assert got["k"].tolist() == want["k"].tolist()


def test_mode_dropna_false():
    p = pd.DataFrame({"x": [1.0, np.nan, np.nan]})
    m = mpd.from_pandas(p)
    want = p.mode(dropna=False).x.fillna(-9).tolist()
    got = m.mode(dropna=False).to_pandas().x.fillna(-9).tolist()
    assert got == want
    assert m.mode().to_pandas().x.tolist() == p.mode().x.tolist()


def test_groupby_agg_tuple_list(pdf):
    m = mpd.from_pandas(pdf)
    want = pdf.groupby("k")["a"].agg([("lo", "min"), ("hi", "max")])
    got = m.groupby("k")["a"].agg([("lo", "min"), ("hi", "max")]).to_pandas()
    assert list(got.columns) == list(want.columns) == ["lo", "hi"]
    assert got.sort_index().values.tolist() == want.sort_index().values.tolist()


def test_flex_op_raw_pandas_series(pdf):
    m = mpd.from_pandas(pdf)
    want = pdf[["a", "b"]].sub(pd.Series({"a": 1.0, "b": 2.0}), axis=1).fillna(-9)
    got = m[["a", "b"]].sub(pd.Series({"a": 1.0, "b": 2.0}), axis=1).to_pandas().fillna(-9)
    assert got.values.round(6).tolist() == want.values.round(6).tolist()
    want0 = pdf[["a", "b"]].add(pdf.a, axis=0).fillna(-9)
    got0 = m[["a", "b"]].add(m.a, axis=0).to_pandas().fillna(-9)
    assert got0.values.round(6).tolist() == want0.values.round(6).tolist()
