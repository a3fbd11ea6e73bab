"""Probe wave 30 (round 11): cross-lineage alignment by TRUE labels (setitem
from a sorted/filtered series), flat-columns xs(axis=1), loc[callable],
Series loc/iloc writes. Wave 29/30 found two real alignment bugs: the
default-index index-merge cross join and fresh-position (not label)
alignment in align_keyed. (tools/probe_wave30.py, 21 green)."""

import numpy as np
import pandas as pd
import pytest

import modin_spark.pandas as mpd


@pytest.fixture()
def pdf():
    return pd.DataFrame({"a": [3, 1, 2, 5, 4], "b": [1.5, np.nan, 2.5, 0.5, 3.5],
                         "k": list("xyxyz")})


def test_setitem_from_sorted_series_aligns_by_label(pdf):
    p = pdf.copy()
    m = mpd.from_pandas(pdf)
    p["z"] = p.sort_values("a").a
    m["z"] = m.sort_values("a").a
    assert m.to_pandas().z.tolist() == p.z.tolist() == pdf.a.tolist()


def test_setitem_from_filtered_series_aligns_by_label(pdf):
    p = pdf.copy()
    m = mpd.from_pandas(pdf)
    p["z"] = p[p.a > 2].a
    m["z"] = m[m.a > 2].a
    assert m.to_pandas().z.fillna(-9).tolist() == p.z.fillna(-9).tolist()


def test_setitem_from_sorted_unrelated_lineage(pdf):
    # a COPY (different lineage/epoch) sorted then assigned: label join
    p = pdf.copy()
    m = mpd.from_pandas(pdf)
    other = mpd.from_pandas(pdf).sort_values("a", ascending=False)
    p["z"] = pdf.copy().sort_values("a", ascending=False).a
    m["z"] = other.a
    assert m.to_pandas().z.tolist() == p.z.tolist()


def test_xs_axis1_flat(pdf):
    m = mpd.from_pandas(pdf)
    assert m[["a", "b"]].xs("a", axis=1).to_pandas().tolist() == pdf[["a", "b"]].xs("a", axis=1).tolist()


def test_loc_callable(pdf):
    m = mpd.from_pandas(pdf)
    want = pdf[pdf.a > 1].sort_values("a").loc[lambda d: d.b.notna()].a.tolist()
    got = m[m.a > 1].sort_values("a").loc[lambda d: d.b.notna()].to_pandas().a.tolist()
    assert got == want


def test_series_loc_iloc_setitem(pdf):
    ps = pdf.a.copy()
    ms = mpd.from_pandas(pdf).a
    ps.iloc[1] = 99
    ms.iloc[1] = 99
    assert ms.to_pandas().tolist() == ps.tolist()
    ps.loc[0] = -5
    ms.loc[0] = -5
    assert ms.to_pandas().tolist() == ps.tolist()
