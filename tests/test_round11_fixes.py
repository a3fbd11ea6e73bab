"""Round-11 fixes: the five round-10 ADVICE defects plus the verdict's
"What's wrong" list. Every case diverged from real pandas (or was a silent
data-loss path) before the fix."""

import numpy as np
import pandas as pd
import pytest

import modin_spark.pandas as mpd


def eq_frame(got, want, reset=True):
    if reset:
        got, want = got.reset_index(drop=True), want.reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_index_type=False)


# ------------------------------------------------------------- ADVICE r10

def test_groupby_callable_agg_fractional_group_not_truncated():
    # ADVICE medium: a callable returning int on the sampled group but a
    # fractional float elsewhere must not be silently int-truncated
    p = pd.DataFrame({"k": ["a", "a", "b", "b"], "v": [2, 2, 3, 4]})
    m = mpd.from_pandas(p)

    def f(s):
        return s.mean()

    rp = p.groupby("k").agg(m=("v", f)).reset_index()
    rm = m.groupby("k").agg(m=("v", f)).reset_index().to_pandas()
    rm = rm.sort_values("k").reset_index(drop=True)
    rp = rp.sort_values("k").reset_index(drop=True)
    np.testing.assert_allclose(rm["m"].astype(float), rp["m"].astype(float))
    assert rm["m"].dtype.kind == "f"


def test_groupby_callable_agg_all_integral_stays_int():
    p = pd.DataFrame({"k": ["a", "a", "b"], "v": [1, 3, 5]})
    m = mpd.from_pandas(p)
    rp = p.groupby("k").agg(m=("v", lambda s: s.max())).reset_index()
    rm = m.groupby("k").agg(m=("v", lambda s: s.max())).reset_index().to_pandas()
    assert rm["m"].dtype.kind in "il"
    assert sorted(rm["m"]) == sorted(rp["m"])


def test_iloc_setitem_list_values_per_row():
    # ADVICE low: pandas assigns list values elementwise
    p = pd.DataFrame({"a": [1, 2, 3, 4], "b": [5, 6, 7, 8]})
    m = mpd.from_pandas(p)
    p.iloc[[0, 1], 0] = [10, 20]
    m.iloc[[0, 1], 0] = [10, 20]
    eq_frame(m.to_pandas(), p)


def test_iloc_setitem_2d_values():
    p = pd.DataFrame({"a": [1, 2, 3], "b": [4, 5, 6]})
    m = mpd.from_pandas(p)
    p.iloc[[0, 2], [0, 1]] = [[10, 40], [30, 60]]
    m.iloc[[0, 2], [0, 1]] = [[10, 40], [30, 60]]
    eq_frame(m.to_pandas(), p)


def test_iloc_setitem_per_column_broadcast():
    p = pd.DataFrame({"a": [1, 2, 3], "b": [4, 5, 6]})
    m = mpd.from_pandas(p)
    p.iloc[[0, 1], [0, 1]] = [100, 200]
    m.iloc[[0, 1], [0, 1]] = [100, 200]
    eq_frame(m.to_pandas(), p)


def test_iloc_setitem_shape_mismatch_raises():
    m = mpd.from_pandas(pd.DataFrame({"a": [1, 2, 3]}))
    with pytest.raises(ValueError):
        m.iloc[[0, 1], 0] = [1, 2, 3]


def test_native_max_rows_zero_disables_empty_frames(monkeypatch):
    # ADVICE low: MAX_ROWS=0 must be a hard off switch even for len-0 frames
    monkeypatch.setenv("MODIN_SPARK_NATIVE_MAX_ROWS", "0")
    m = mpd.from_pandas(pd.DataFrame({"a": pd.Series([], dtype="int64")}))
    assert m._frame.native_pdf is None


def test_reset_index_level0_when_index_column_exists():
    # ADVICE low: pandas names the new column level_0 when "index" is taken
    p = pd.DataFrame({"index": [10, 20, 30], "v": [1, 2, 3]})
    m = mpd.from_pandas(p)
    rp = p.reset_index()
    rm = m.reset_index().to_pandas()
    assert list(rm.columns) == list(rp.columns) == ["level_0", "index", "v"]
    eq_frame(rm, rp)
    # named-index path unaffected
    p2 = p.set_index("v")
    m2 = mpd.from_pandas(p2)
    assert list(m2.reset_index().to_pandas().columns) == list(p2.reset_index().columns)


def test_series_unique_docstring_visible():
    # VERDICT wrong #3: the order-contract note must render in help()
    doc = mpd.Series.unique.__doc__
    assert doc and "FIRST-APPEARANCE" in doc
