"""Probe wave 27 (round 11): narrowed groupby.apply (only selected columns
reach func; scalar results), str.replace callable, shift(freq=), multi-day
resample start_day anchoring, MultiIndex loc partial tuple / tuple lists.
(tools/probe_wave27.py, 27 green)."""

import numpy as np
import pandas as pd
import pytest

import modin_spark.pandas as mpd


@pytest.fixture()
def pdf():
    return pd.DataFrame({"a": [3, 1, 2, 5, 4], "b": [1.0, 2, 3, 4, 5],
                         "k": list("xyxyx"), "g": list("mmnnm"),
                         "s": ["a1b2", "c33", None, "d4", "e5f6"],
                         "t": pd.date_range("2024-01-01", periods=5, freq="D")})


def test_groupby_apply_narrowed_and_scalar(pdf):
    m = mpd.from_pandas(pdf)
    want = pdf.groupby("k")[["a"]].apply(lambda d: d - d.mean())
    got = m.groupby("k")[["a"]].apply(lambda d: d - d.mean()).to_pandas()
    assert sorted(got.a.round(6)) == sorted(want.a.round(6))
    want2 = pdf.groupby("k")["a"].apply(lambda s: s.max() - s.min()).to_dict()
    got2 = m.groupby("k")["a"].apply(lambda s: s.max() - s.min()).to_pandas().to_dict()
    assert got2 == want2


def test_str_replace_callable(pdf):
    m = mpd.from_pandas(pdf)
    want = pdf.s.str.replace(r"\d", lambda mo: "#", regex=True).tolist()
    got = m.s.str.replace(r"\d", lambda mo: "#", regex=True).to_pandas().tolist()
    assert all((a == b) or (pd.isna(a) and pd.isna(b)) for a, b in zip(got, want))


def test_shift_freq_moves_index(pdf):
    p = pdf.set_index("t")
    m = mpd.from_pandas(p)
    want = p.shift(2, freq="D")
    got = m.shift(2, freq="D").to_pandas()
    assert list(got.index.astype(str)) == list(want.index.astype(str))
    assert got.a.tolist() == want.a.tolist()


@pytest.mark.parametrize("kw", [{}, {"label": "right"}, {"closed": "right"},
                                {"closed": "right", "label": "right"}])
def test_resample_multiday_start_day_anchor(pdf, kw):
    p = pdf.set_index("t")
    m = mpd.from_pandas(p)
    want = {str(k): v for k, v in p.resample("2D", **kw)["a"].sum().to_dict().items()}
    got = {str(k): v for k, v in m.resample("2D", **kw)["a"].sum().to_pandas().to_dict().items()}
    assert got == want


def test_mi_loc_partial_tuple_and_tuple_list(pdf):
    p = pdf.set_index(["k", "g"]).sort_index()
    m = mpd.from_pandas(p)
    want = p.loc[("x",)]
    got = m.loc[("x",)].to_pandas()
    assert sorted(got.a) == sorted(want.a)
    assert got.index.name == want.index.name == "g"
    want2 = p.loc[[("x", "m")]]
    got2 = m.loc[[("x", "m")]].to_pandas()
    assert sorted(got2.a) == sorted(want2.a)
