"""Round-9 probe wave 16 regressions (tools/probe_wave16.py): each case
diverged or errored vs real pandas before the fix."""

import numpy as np
import pandas as pd
import pytest

import modin_spark.pandas as mpd

PDF = pd.DataFrame(
    {
        "a": [3, 1, 2, 1, 3, 2],
        "b": ["x", "y", "x", "z", "y", "x"],
        "c": [1.5, 2.5, None, 4.5, 5.5, 6.5],
        "d": [10, 20, 30, 40, 50, 60],
    }
)


def both():
    return mpd.DataFrame(PDF.copy()), PDF.copy()


def eq_ser(got, want):
    pd.testing.assert_series_equal(
        got.reset_index(drop=True), want.reset_index(drop=True),
        check_dtype=False, check_index_type=False, check_names=False,
        check_categorical=False,
    )


def test_cat_remove_categories_and_ordered():
    m, p = both()
    sm = m["b"].astype("category").cat.remove_categories(["z"]).fillna("-").to_pandas()
    sp = (p["b"].astype("category").cat.add_categories(["-"])
          .cat.remove_categories(["z"]).fillna("-").astype(str))
    assert list(sm) == list(sp)
    assert m["b"].astype("category").cat.as_ordered().min() == "x"
    sm2 = m["b"].astype("category").cat.set_categories(["x", "y"]).fillna("-").to_pandas()
    assert sorted(sm2) == sorted(["x", "y", "x", "-", "y", "x"])


def test_nullable_int64_astype():
    m, p = both()
    sm = m.assign(e=[1, None, 3, None, 5, 6])["e"].astype("Int64").fillna(-1).astype("int64")
    sp = p.assign(e=[1, None, 3, None, 5, 6])["e"].astype("Int64").fillna(-1).astype("int64")
    assert list(sm.to_pandas()) == list(sp)


def test_describe_percentiles():
    m, p = both()
    gm = m[["d"]].describe(percentiles=[0.1, 0.9])
    gp = p[["d"]].describe(percentiles=[0.1, 0.9])
    assert list(gm.index) == list(gp.index)
    assert np.allclose(gm["d"].values, gp["d"].values)


def test_row_wise_skipna_and_prod():
    m, p = both()
    eq_ser(m[["c", "d"]].mean(axis=1, skipna=False).to_pandas(),
           p[["c", "d"]].mean(axis=1, skipna=False))
    eq_ser(m[["a", "d"]].prod(axis=1).to_pandas(), p[["a", "d"]].prod(axis=1))


def test_round_series_decimals():
    m, p = both()
    dec = pd.Series([1, -1], index=["c", "d"])
    gm = m[["c", "d"]].round(dec).to_pandas()
    gp = p[["c", "d"]].round(dec)
    pd.testing.assert_frame_equal(gm.reset_index(drop=True), gp.reset_index(drop=True),
                                  check_dtype=False)


def test_merge_named_series_rhs():
    m, p = both()
    gm = (m.set_index("b").merge(m.groupby("b")["d"].sum().rename("t"),
                                 left_index=True, right_index=True)
          .reset_index().to_pandas().sort_values(["b", "d"]).reset_index(drop=True))
    gp = (p.set_index("b").merge(p.groupby("b")["d"].sum().rename("t"),
                                 left_index=True, right_index=True)
          .reset_index().sort_values(["b", "d"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(gm, gp, check_dtype=False, check_index_type=False)
    with pytest.raises(ValueError):
        m.merge(m["d"].rename(None), left_index=True, right_index=True)


def test_explode_non_array_column_is_identity():
    m, p = both()
    gm = m.assign(l=[None] * 6).explode("l")[["l", "d"]].fillna(-1).to_pandas()
    gp = p.assign(l=[None] * 6).explode("l")[["l", "d"]].fillna(-1)
    assert gm["d"].tolist() == gp["d"].tolist()
