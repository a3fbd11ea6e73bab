"""Probe wave 31 (round 11): groupby.nth list/negative, rolling ddof,
frame clip bounds, pairwise replace, Categorical setitem, all-NaN idxmax.
(tools/probe_wave31.py, 23 green + 1 documented categorical divergence)."""

import numpy as np
import pandas as pd
import pytest

import modin_spark.pandas as mpd


@pytest.fixture()
def pdf():
    return pd.DataFrame({"a": [3, 1, 2, 5, 4], "b": [1.5, np.nan, 2.5, 0.5, 3.5],
                         "k": list("xyxyz")})


def test_groupby_nth_list_and_negative(pdf):
    m = mpd.from_pandas(pdf)
    want = pdf.groupby("k").nth([0, 1]).a.tolist()
    got = m.groupby("k").nth([0, 1]).to_pandas().a.tolist()
    assert sorted(got) == sorted(want)
    want2 = pdf.groupby("k").nth(-1).a.tolist()
    got2 = m.groupby("k").nth(-1).to_pandas().a.tolist()
    assert sorted(got2) == sorted(want2)


def test_rolling_var_ddof0_and_sem(pdf):
    m = mpd.from_pandas(pdf)
    want = pdf.a.rolling(3).var(ddof=0).fillna(-9).round(6).tolist()
    got = m.a.rolling(3).var(ddof=0).to_pandas().fillna(-9).round(6).tolist()
    assert got == want
    want2 = pdf.a.rolling(3).sem().fillna(-9).round(6).tolist()
    got2 = m.a.rolling(3).sem().to_pandas().fillna(-9).round(6).tolist()
    assert got2 == want2


def test_clip_frame_bounds(pdf):
    m = mpd.from_pandas(pdf)
    want = pdf[["a"]].clip(lower=pdf[["a"]] * 0 + 2).a.tolist()
    got = m[["a"]].clip(lower=mpd.from_pandas(pdf)[["a"]] * 0 + 2).to_pandas().a.tolist()
    assert got == want


def test_replace_pairwise_lists(pdf):
    m = mpd.from_pandas(pdf)
    want = pdf.replace([1, 2], [10, 20]).a.tolist()
    got = m.replace([1, 2], [10, 20]).to_pandas().a.tolist()
    assert got == want


def test_assign_categorical(pdf):
    m = mpd.from_pandas(pdf)
    want = pdf.assign(c=pd.Categorical(pdf.k)).groupby("c", observed=True)["a"].sum().to_dict()
    got = m.assign(c=pd.Categorical(pdf.k)).groupby("c", observed=True)["a"].sum().to_pandas().to_dict()
    assert {str(k): v for k, v in got.items()} == {str(k): v for k, v in want.items()}


def test_idxmax_all_nan_is_nan():
    m = mpd.from_pandas(pd.DataFrame({"x": [np.nan, np.nan]}))
    assert np.isnan(m.x.idxmax()) and np.isnan(m.x.idxmin())


def test_groupby_observed_false_unobserved_categories(pdf):
    m = mpd.from_pandas(pdf)
    cat = pd.Categorical(pdf.k, categories=list("xyzw"))
    pc = pdf.assign(c=cat)
    mc = m.assign(c=pd.Categorical(pdf.k, categories=list("xyzw")))
    for fn in ("count", "sum", "mean"):
        want = getattr(pc.groupby("c", observed=False)["a"], fn)().to_dict()
        got = getattr(mc.groupby("c", observed=False)["a"], fn)().to_pandas().to_dict()
        norm = lambda d: {str(k): (None if pd.isna(v) else v) for k, v in d.items()}
        assert norm(got) == norm(want), fn
    # observed=True unchanged
    assert mc.groupby("c", observed=True)["a"].count().to_pandas().to_dict() == \
        {"x": 2, "y": 2, "z": 1}
