"""Probe wave 19 (round 11): grouped rolling on=/closed=, query local_dict,
json_normalize ragged lists, numpy concatenate/vstack, scipy-gated
interpolate methods. Every case either diverged from pandas or raised
before the fix."""

import numpy as np
import pandas as pd
import pytest

import modin_spark.pandas as mpd
import modin_spark.numpy as mnp


@pytest.fixture()
def panel():
    return pd.DataFrame({
        "k": ["a"] * 5 + ["b"] * 5,
        "t": pd.date_range("2024-01-01", periods=10, freq="h"),
        "v": np.arange(10.0),
        "w": np.arange(10.0) ** 2,
    })


def _eq_ser(got, want):
    pd.testing.assert_series_equal(got, want, check_dtype=False,
                                   check_index_type=False, check_names=False)


def test_groupby_rolling_on_offset_series(panel):
    m = mpd.from_pandas(panel)
    rp = panel.groupby("k").rolling("2h", on="t")["v"].sum()
    rm = m.groupby("k").rolling("2h", on="t")["v"].sum().to_pandas()
    _eq_ser(rm, rp)
    assert [tuple(x) for x in rm.index] == [tuple(x) for x in rp.index]


def test_groupby_rolling_on_offset_frame_keeps_on_column(panel):
    m = mpd.from_pandas(panel)
    rp = panel.groupby("k").rolling("2h", on="t").sum()
    rm = m.groupby("k").rolling("2h", on="t").sum().to_pandas()
    assert list(rm.columns) == list(rp.columns)  # 't' stays a column
    assert rm["v"].tolist() == rp["v"].tolist()
    assert rm["w"].tolist() == rp["w"].tolist()


def test_groupby_rolling_closed(panel):
    m = mpd.from_pandas(panel)
    rp = panel.groupby("k").rolling(2, closed="left")["v"].sum()
    rm = m.groupby("k").rolling(2, closed="left")["v"].sum().to_pandas()
    _eq_ser(rm.reset_index(drop=True), rp.reset_index(drop=True))


@pytest.mark.parametrize("closed", ["right", "both", "left", "neither"])
def test_groupby_rolling_offset_closed_all(panel, closed):
    m = mpd.from_pandas(panel)
    rp = panel.groupby("k").rolling("3h", on="t", closed=closed)["v"].mean()
    rm = m.groupby("k").rolling("3h", on="t", closed=closed)["v"].mean().to_pandas()
    _eq_ser(rm.reset_index(drop=True), rp.reset_index(drop=True))


def test_groupby_rolling_offset_datetime_index(panel):
    pi = panel.set_index("t")
    m = mpd.from_pandas(pi)
    rp = pi.groupby("k").rolling("2h")["v"].sum()
    rm = m.groupby("k").rolling("2h")["v"].sum().to_pandas()
    _eq_ser(rm, rp)


def test_query_local_dict():
    p = pd.DataFrame({"a": [1.0, 2, 3], "b": list("vwx")})
    m = mpd.from_pandas(p)
    want = p.query("b in @names", local_dict={"names": ["v", "x"]})
    got = m.query("b in @names", local_dict={"names": ["v", "x"]}).to_pandas()
    assert got["b"].tolist() == want["b"].tolist()
    # caller-frame @vars still work without local_dict
    lim = 1
    assert m.query("a > @lim").to_pandas()["a"].tolist() == p.query("a > @lim")["a"].tolist()


def test_json_normalize_ragged_list_column():
    data = [{"id": 1, "info": {"x": 10, "y": {"z": 5}}, "tags": [1, 2]},
            {"id": 2, "info": {"x": 20, "y": {"z": 7}}}]
    want = pd.json_normalize(data)
    got = mpd.json_normalize(data)
    assert list(got.columns) == list(want.columns)
    gp = got.to_pandas()
    assert gp["info.y.z"].tolist() == want["info.y.z"].tolist()
    assert list(gp["tags"].iloc[0]) == [1, 2] and gp["tags"].iloc[1] is None


def test_numpy_concatenate_and_vstack():
    assert mnp.concatenate([mnp.array([1, 2]), mnp.array([3, 4])])._to_numpy().tolist() == [1, 2, 3, 4]
    a2, b2 = mnp.array([[1, 2], [3, 4]]), mnp.array([[5, 6]])
    assert mnp.concatenate([a2, b2], axis=0)._to_numpy().tolist() == [[1, 2], [3, 4], [5, 6]]
    c2 = mnp.array([[7], [8]])
    assert mnp.concatenate([a2, c2], axis=1)._to_numpy().tolist() == [[1, 2, 7], [3, 4, 8]]
    assert mnp.concatenate([a2, mnp.array([9, 10])], axis=None)._to_numpy().tolist() == [1, 2, 3, 4, 9, 10]
    assert mnp.vstack([mnp.array([[1, 2]]), mnp.array([[3, 4]])])._to_numpy().tolist() == [[1, 2], [3, 4]]
    with pytest.raises(ValueError):
        mnp.concatenate([mnp.array([1, 2]), mnp.array([3])], axis=1)


def test_interpolate_scipy_methods_raise_importerror():
    # pandas itself needs SciPy (absent here) for these — we mirror the error
    m = mpd.from_pandas(pd.DataFrame({"a": [1.0, None, 3.0]}))
    for method in ("nearest", "polynomial", "cubic"):
        with pytest.raises(ImportError):
            m.a.interpolate(method=method)
