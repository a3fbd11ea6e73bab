"""Round-9 probe wave 14 regressions (tools/probe_wave14.py): each case
diverged or errored vs real pandas before the fix."""

import os
import tempfile

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


def eq_pd(got, want):
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True),
        check_dtype=False, check_index_type=False, check_column_type=False,
    )


def test_getitem_pd_index_and_bool_array():
    m, p = both()
    eq_pd(m[m.columns].to_pandas(), p[p.columns])
    mask = np.array([True, False, True, False, True, False])
    eq_pd(m[mask].to_pandas().reset_index(drop=True), p[mask].reset_index(drop=True))


@pytest.mark.parametrize("meth,args,kwargs", [
    ("fillna", (-1,), {}),
    ("drop", (), {"columns": ["b"]}),
    ("rename", (), {"columns": {"d": "dd"}}),
    ("sort_values", ("d",), {"ascending": False}),
    ("replace", ({"x": "xx"},), {}),
    ("dropna", (), {"subset": ["c"]}),
    ("set_index", ("b",), {}),
])
def test_inplace_variants(meth, args, kwargs):
    m, p = both()
    mm, pp = m[m.columns], p.copy()
    assert getattr(mm, meth)(*args, **kwargs, inplace=True) is None
    assert getattr(pp, meth)(*args, **kwargs, inplace=True) is None
    gm, gp = mm, pp
    if meth == "set_index":
        gm, gp = mm.reset_index(), pp.reset_index()
    key = "dd" if meth == "rename" else "d"
    eq_pd(gm.to_pandas().sort_values(key).reset_index(drop=True),
          gp.sort_values(key).reset_index(drop=True))


def test_series_inplace():
    m, p = both()
    sm, sp = m["c"], p["c"].copy()
    assert sm.fillna(-1, inplace=True) is None
    sp.fillna(-1, inplace=True)
    assert sm.to_pandas().tolist() == sp.tolist()


def test_replace_scalar_dict_keeps_numeric_dtypes():
    m, p = both()
    gm = m.replace({"x": "xx"}).to_pandas()
    gp = p.replace({"x": "xx"})
    eq_pd(gm.sort_values("d").reset_index(drop=True), gp.sort_values("d").reset_index(drop=True))
    assert gm["a"].dtype.kind in "if" and gm["d"].dtype.kind in "if"


def test_read_csv_names_header0_and_usecols_callable(tmp_path):
    path = str(tmp_path / "t.csv")
    PDF.to_csv(path, index=False)
    gm = mpd.read_csv(path, header=0, names=["w", "x", "y", "z"]).to_pandas()
    gp = pd.read_csv(path, header=0, names=["w", "x", "y", "z"])
    eq_pd(gm, gp)
    gm2 = mpd.read_csv(path, usecols=lambda c: c in ("a", "d")).to_pandas()
    gp2 = pd.read_csv(path, usecols=lambda c: c in ("a", "d"))
    eq_pd(gm2, gp2)


def test_to_csv_na_rep(tmp_path):
    import glob

    path = str(tmp_path / "o.csv")
    m, _ = both()
    m.to_csv(path, index=False, na_rep="NA")
    files = sorted(glob.glob(os.path.join(path, "part-*"))) if os.path.isdir(path) else [path]
    back = pd.concat([pd.read_csv(f) for f in files], ignore_index=True)
    assert back["c"].isna().sum() == 1  # "NA" token read back as NaN


def test_groupby_mixed_series_and_label_keys():
    m, p = both()
    gm = m.groupby([m["a"] > 1, "b"])["d"].sum().reset_index(drop=True).sort_values().to_pandas()
    gp = p.groupby([p["a"] > 1, "b"])["d"].sum().reset_index(drop=True).sort_values()
    assert list(gm) == list(gp)


def test_seriesgroupby_agg_positional_args():
    m, p = both()
    gm = m.groupby("b")["d"].agg(lambda s, k: s.max() + k, 5).reset_index().to_pandas()
    gp = p.groupby("b")["d"].agg(lambda s, k: s.max() + k, 5).reset_index()
    eq_pd(gm.sort_values("b").reset_index(drop=True), gp.sort_values("b").reset_index(drop=True))


def test_wide_to_long_carried_columns_and_int_j():
    m, p = both()
    gm = mpd.wide_to_long(m.rename(columns={"a": "v1", "d": "v2"}).assign(id=list(range(6))),
                          ["v"], i="id", j="n").reset_index()[["id", "n", "b", "c", "v"]].to_pandas()
    gp = pd.wide_to_long(p.rename(columns={"a": "v1", "d": "v2"}).assign(id=range(6)),
                         ["v"], i="id", j="n").reset_index()[["id", "n", "b", "c", "v"]]
    eq_pd(gm.sort_values(["id", "n"]).reset_index(drop=True),
          gp.sort_values(["id", "n"]).reset_index(drop=True))


def test_series_resample_origin_start():
    m, p = both()
    t = pd.date_range("2024-01-01 00:30", periods=6, freq="50min")
    sm = m.assign(t=t).set_index("t")["d"].resample("2h", origin="start").sum().to_pandas()
    sp = p.assign(t=t).set_index("t")["d"].resample("2h", origin="start").sum()
    assert list(sm) == list(sp)
    # Series.resample returns a Series (not a 1-col frame)
    sm2 = m.assign(t=t).set_index("t")["d"].resample("2h").sum()
    assert not hasattr(sm2, "columns")


def test_groupby_ngroup_kwarg_alias():
    # wave-13 follow-through: both orders on the same tiny distinct
    m, p = both()
    for asc in (True, False):
        gm = m.groupby("b").ngroup(ascending=asc).sort_values().to_pandas()
        gp = p.groupby("b").ngroup(ascending=asc).sort_values()
        assert list(gm) == list(gp)
