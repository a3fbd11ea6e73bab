"""Round-10 probe wave 17 regressions (tools/probe_wave17.py): each case
diverged or errored vs real pandas before the fix."""

import tempfile

import numpy as np
import pandas as pd
import pytest

import modin_spark.pandas as mpd

P = pd.DataFrame({"a": [1, 2, 3, 4, 5, 6], "b": [10., 20., 30., 40., 50., 60.],
                  "k": list("xyxyxy"), "w": [0, 0, 1, 1, 2, 2]})


def M():
    return mpd.from_pandas(P.copy())


def test_sample_weights_column_name(spark):
    # zero-weight rows must never be drawn; n rows come back
    got = M().sample(n=3, weights="w", random_state=1).to_pandas()
    assert len(got) == 3 and set(got["a"]) <= {3, 4, 5, 6}


def test_sample_weights_cross_frame_series(spark):
    w = M()["w"]  # a DIFFERENT frame: label alignment required
    got = M().sample(n=2, weights=w, random_state=2).to_pandas()
    assert len(got) == 2 and set(got["a"]) <= {3, 4, 5, 6}


def test_merge_asof_left_by_right_by(spark):
    L = pd.DataFrame({"t": [1, 2, 3, 4], "g": ["a", "a", "b", "b"], "lv": [1, 2, 3, 4]})
    R = pd.DataFrame({"t2": [1, 3], "g2": ["a", "b"], "rv": [10, 30]})
    want = pd.merge_asof(L, R, left_on="t", right_on="t2", left_by="g", right_by="g2")
    got = mpd.merge_asof(mpd.from_pandas(L), mpd.from_pandas(R),
                         left_on="t", right_on="t2",
                         left_by="g", right_by="g2").to_pandas()
    pd.testing.assert_frame_equal(
        got[list(want.columns)].reset_index(drop=True), want, check_dtype=False)


def test_read_csv_chunksize_iterator(spark):
    with tempfile.NamedTemporaryFile("w", suffix=".csv", delete=False) as f:
        P.to_csv(f.name, index=False)
        path = f.name
    chunks = list(mpd.read_csv(path, chunksize=4))
    assert [len(c.to_pandas()) for c in chunks] == [4, 2]
    # chunk labels continue across chunks like pandas
    assert list(chunks[1].to_pandas().index) == [4, 5]


def test_read_json_inline_and_orient(spark):
    s = P.to_json(orient="records")
    want = pd.read_json(__import__("io").StringIO(s), orient="records")
    got = mpd.read_json(s, orient="records").to_pandas()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_query_engine_kwarg(spark):
    want = P.query("a > 2 and k == 'x'", engine="python")
    got = M().query("a > 2 and k == 'x'", engine="python").to_pandas()
    assert list(got["a"]) == list(want["a"])


def test_cut_interval_categorical_dtype(spark):
    p = pd.DataFrame({"a": [1.0, 2.0, 5.0, 8.0]})
    m = mpd.from_pandas(p)
    rp = pd.cut(p["a"], [0, 3, 6, 9])
    rm = mpd.cut(m["a"], [0, 3, 6, 9]).to_pandas()
    assert rp.dtype == rm.dtype and list(rp) == list(rm)
    rp2, rm2 = pd.cut(p["a"], 3), mpd.cut(m["a"], 3).to_pandas()
    assert str(rm2.dtype) == "category" and rm2.cat.ordered
    assert list(rp2.cat.codes) == list(rm2.cat.codes)
    # labels= keeps the given labels (no categorical coercion of strings)
    rm3 = mpd.cut(m["a"], [0, 3, 6, 9], labels=["lo", "mid", "hi"]).to_pandas()
    assert list(rm3) == list(pd.cut(p["a"], [0, 3, 6, 9], labels=["lo", "mid", "hi"]).astype(str))


def test_rolling_step(spark):
    p = pd.DataFrame({"b": [1., 2., 3., 4., 5.]})
    m = mpd.from_pandas(p)
    for w, s in [(2, 2), (3, 2), (2, 3)]:
        want = p["b"].rolling(w, step=s).sum()
        got = m["b"].rolling(w, step=s).sum().to_pandas()
        assert list(got.fillna(-9)) == list(want.fillna(-9)), (w, s)
    want = p.rolling(3, step=2).mean()
    got = m.rolling(3, step=2).mean().to_pandas()
    assert got.fillna(-9).values.tolist() == want.fillna(-9).values.tolist()


def test_frame_mode_returns_engine_frame(spark):
    p = pd.DataFrame({"k": ["u", "u", "v"], "a": [1.0, 1.0, 2.0]})
    m = mpd.from_pandas(p)
    got = m.mode()
    assert hasattr(got, "_frame"), "mode must return an engine DataFrame"
    gp = got.to_pandas()
    ep = p.mode()
    assert gp.fillna(-9).values.tolist() == ep.fillna(-9).values.tolist()


def test_groupby_engine_kwarg_ignored(spark):
    p = pd.DataFrame({"a": [1, 1, 2], "b": [3, 4, 5]})
    m = mpd.from_pandas(p)
    want = p.groupby("a").agg(s=("b", "sum"))
    got = m.groupby("a").agg(s=("b", "sum"), engine="numba").to_pandas()
    assert list(got["s"]) == list(want["s"])
    got2 = m.groupby("a")["b"].agg("sum", engine="numba").to_pandas()
    assert list(got2) == list(p.groupby("a")["b"].agg("sum"))


def test_reindex_default_index(spark):
    # reindex(index=) on a default RangeIndex: labels are positions
    pf = pd.DataFrame({"a": [10, 20, 30]})
    mf = mpd.from_pandas(pf)
    rp = pf.reindex(index=[2, 0, 7], fill_value=0)
    rm = mf.reindex(index=[2, 0, 7], fill_value=0).to_pandas()
    assert rm.values.tolist() == rp.values.tolist()
    assert list(rm.index) == list(rp.index)
    # survives a filter (original labels, not renumbered)
    pff, mff = pf[pf.a > 10], mf[mf.a > 10]
    rp2 = pff.reindex(index=[1, 5])
    rm2 = mff.reindex(index=[1, 5]).to_pandas()
    assert rm2.fillna(-9).values.tolist() == rp2.fillna(-9).values.tolist()
    # Series path
    s = pd.Series([3.0, 1.0, None, 5.0], name="v")
    ms = mpd.from_pandas(s.to_frame())["v"]
    assert list(ms.reindex([0, 1, 9]).to_pandas().fillna(-9)) == list(s.reindex([0, 1, 9]).fillna(-9))


def test_iloc_setitem(spark):
    p = pd.DataFrame({"a": [1, 2, 3, 4], "b": [10., 20., 30., 40.]})
    m = mpd.from_pandas(p.copy())
    pc = p.copy()
    m.iloc[0, 1] = -1.0
    pc.iloc[0, 1] = -1.0
    assert m.to_pandas().values.tolist() == pc.values.tolist()
    m2, p2 = mpd.from_pandas(p.copy()), p.copy()
    m2.iloc[1:3, 0] = 99
    p2.iloc[1:3, 0] = 99
    assert m2.to_pandas().values.tolist() == p2.values.tolist()
    m3, p3 = mpd.from_pandas(p.copy()), p.copy()
    m3.iloc[-1, 1] = 0.5
    p3.iloc[-1, 1] = 0.5
    assert m3.to_pandas().values.tolist() == p3.values.tolist()


def test_str_center_wrap_get_dummies(spark):
    s = pd.Series(["a1_x", "b22_y", None], name="s")
    m = mpd.from_pandas(s.to_frame())["s"]
    assert list(m.str.center(8, "*").to_pandas().fillna("-")) == list(s.str.center(8, "*").fillna("-"))
    assert list(m.str.wrap(2).to_pandas().fillna("-")) == list(s.str.wrap(2).fillna("-"))
    assert m.str.get_dummies("_").to_pandas().values.tolist() == s.str.get_dummies("_").values.tolist()
    # mixed words + long words
    s2 = pd.Series(["aa bb ccccc d"], name="s")
    m2 = mpd.from_pandas(s2.to_frame())["s"]
    assert list(m2.str.wrap(4).to_pandas()) == list(s2.str.wrap(4))


def test_groupby_window_pandas_shape(spark):
    # round 10: grouped window results carry the (key, label) MultiIndex in
    # group-major order; the series-groupby form returns a Series
    P = pd.DataFrame({"b": [1., 2., 3., 4., 5., 6.], "k": list("xyxyxy")})
    m = mpd.from_pandas(P)
    got = m.groupby("k")["b"].rolling(2).sum().to_pandas()
    want = P.groupby("k")["b"].rolling(2).sum()
    assert isinstance(got, pd.Series)
    assert got.index.tolist() == want.index.tolist()
    assert list(got.fillna(-9)) == list(want.fillna(-9))
    g2 = m.groupby("k").expanding().mean().to_pandas()
    w2 = P.groupby("k").expanding().mean()
    assert g2.index.tolist() == w2.index.tolist()
    assert np.allclose(g2.values, w2.values, equal_nan=True)
    # filtered source keeps ORIGINAL labels in the label level
    mf, pf = m[m["b"] > 1], P[P["b"] > 1]
    g3 = mf.groupby("k")["b"].rolling(2).sum().to_pandas()
    w3 = pf.groupby("k")["b"].rolling(2).sum()
    assert g3.index.tolist() == w3.index.tolist()


def test_pivot_table_aggfunc_list_no_columns(spark):
    P = pd.DataFrame({"b": [1., 2., 3., 4., 5., 6.], "k": list("xyxyxy")})
    m = mpd.from_pandas(P)
    got = m.pivot_table(values="b", index="k", aggfunc=["sum", "mean"]).to_pandas()
    want = P.pivot_table(values="b", index="k", aggfunc=["sum", "mean"])
    assert got.values.tolist() == want.values.tolist()
    assert [tuple(c) for c in got.columns] == [tuple(c) for c in want.columns]


def test_read_csv_skiprows_list(spark):
    import tempfile

    P = pd.DataFrame({"a": [1, 2, 3], "b": [1.5, 2.5, 3.5]})
    with tempfile.NamedTemporaryFile("w", suffix=".csv", delete=False) as f:
        P.to_csv(f.name, index=False)
        path = f.name
    got = mpd.read_csv(path, skiprows=[1]).to_pandas()
    want = pd.read_csv(path, skiprows=[1])
    assert got.values.tolist() == want.values.tolist()
    assert list(got.columns) == list(want.columns)


def test_concat_axis1_outer_align_order(spark):
    P = pd.DataFrame({"a": [1, 2, 3], "c": [1.5, None, 3.5]})
    m = mpd.from_pandas(P)
    got = mpd.concat([m[["a"]].head(2), m[["c"]]], axis=1).to_pandas()
    want = pd.concat([P[["a"]].head(2), P[["c"]]], axis=1)
    assert got.fillna(-9).values.tolist() == want.fillna(-9).values.tolist()


def test_rename_index_dict(spark):
    P = pd.DataFrame({"a": [1, 2, 3]})
    m = mpd.from_pandas(P)
    got = m.rename(index={0: 99}).to_pandas()
    want = P.rename(index={0: 99})
    assert got.index.tolist() == want.index.tolist() == [99, 1, 2]
    # labeled index
    P2 = P.set_index(pd.Index(["x", "y", "z"]))
    m2 = mpd.from_pandas(P2.reset_index()).set_index("index")
    got2 = m2.rename(index={"y": "Y"}).to_pandas()
    assert sorted(got2.index.tolist()) == sorted(P2.rename(index={"y": "Y"}).index.tolist())


def test_set_index_append_default(spark):
    P = pd.DataFrame({"a": [1, 2, 3], "b": list("xyz")})
    m = mpd.from_pandas(P)
    got = m.set_index("b", append=True).to_pandas()
    want = P.set_index("b", append=True)
    assert got.index.nlevels == want.index.nlevels == 2
    assert got.index.tolist() == want.index.tolist()


def test_astype_str_renders_missing(spark):
    P = pd.DataFrame({"c": [1.5, None, 3.5],
                      "t": pd.to_datetime(["2024-01-01", None, "2024-01-03"])})
    m = mpd.from_pandas(P)
    assert list(m["c"].astype(str).to_pandas()) == list(P["c"].astype(str))
    got_t = list(m["t"].astype(str).to_pandas())
    want_t = list(P["t"].astype(str))
    assert got_t == want_t


def test_groupby_callable_agg_dtype(spark):
    P = pd.DataFrame({"a": [1, 2, 3, 4], "b": list("xyxy")})
    m = mpd.from_pandas(P)
    got = m.groupby("b").agg(x=("a", lambda s: s.max() - s.min())).to_pandas()
    want = P.groupby("b").agg(x=("a", lambda s: s.max() - s.min()))
    assert got["x"].tolist() == want["x"].tolist()
    assert got["x"].dtype == want["x"].dtype == "int64"
    got2 = m.groupby("b").agg(y=("a", lambda s: float(s.mean()))).to_pandas()
    assert got2["y"].dtype.kind == "f"


def test_sort_preserves_labels_and_sort_index_restores(spark):
    p = pd.DataFrame({"a": [3, 1, 2], "b": list("xyz")})
    m = mpd.from_pandas(p)
    # pandas keeps the PERMUTED labels through sort_values
    assert m.sort_values("a").to_pandas().index.tolist() == p.sort_values("a").index.tolist()
    # sort_index restores label order, both directions
    for asc in (True, False):
        want = p.sort_values("a").sort_index(ascending=asc)
        got = m.sort_values("a").sort_index(ascending=asc).to_pandas()
        assert got.values.tolist() == want.values.tolist()
        assert got.index.tolist() == want.index.tolist()
    # gapped labels after a filter survive the sort
    pf, mf = p[p.a > 1].sort_values("a"), m[m.a > 1].sort_values("a")
    assert mf.to_pandas().index.tolist() == pf.index.tolist()
    # TakeOrdered fusion (nlargest/head-after-sort) keeps them too
    assert m.nlargest(2, "a").to_pandas().index.tolist() == p.nlargest(2, "a").index.tolist()
    assert (m.sort_values("a").head(2).to_pandas().index.tolist()
            == p.sort_values("a").head(2).index.tolist())
    # Series path
    assert m["a"].sort_values().to_pandas().index.tolist() == p["a"].sort_values().index.tolist()


def test_label_ops_after_sort(spark):
    # labels_col consumption: drop(index=) / reindex / reset_index after a
    # sort act on the PERMUTED pandas labels, not fresh positions
    p = pd.DataFrame({"a": [3, 1, 2]})
    m = mpd.from_pandas(p)
    ps, ms = p.sort_values("a"), m.sort_values("a")
    assert (ms.drop(index=0).to_pandas().values.tolist()
            == ps.drop(index=0).values.tolist())
    assert (ms.reindex(index=[2, 0]).to_pandas().values.tolist()
            == ps.reindex(index=[2, 0]).values.tolist())
    assert (ms.reset_index().to_pandas()["index"].tolist()
            == ps.reset_index()["index"].tolist())


def test_read_xml_etree_fallback(spark):
    import tempfile

    xml = ('<?xml version="1.0"?><data><row><a>1</a><b>x</b></row>'
           '<row><a>2</a><b>y</b></row></data>')
    with tempfile.NamedTemporaryFile("w", suffix=".xml", delete=False) as f:
        f.write(xml)
        path = f.name
    got = mpd.read_xml(path).to_pandas()
    want = pd.read_xml(path, parser="etree")
    assert got.values.tolist() == want.values.tolist()
    assert list(got.columns) == list(want.columns)


def test_loc_pandas_scalar_shapes(spark):
    p = pd.DataFrame({"a": [3, 1, 2], "b": list("xyz")})
    m = mpd.from_pandas(p)
    # scalar row -> row Series; scalar/scalar -> scalar; after sort/filter
    # the TRUE labels are used
    assert m.loc[1].tolist() == p.loc[1].tolist()
    assert m.loc[1, "a"] == p.loc[1, "a"] == 1
    assert m.sort_values("a").loc[0].tolist() == p.sort_values("a").loc[0].tolist()
    assert m[m.a > 1].loc[2].tolist() == p[p.a > 1].loc[2].tolist()
    assert (m[m.a > 1].loc[[0, 2]].to_pandas().values.tolist()
            == p[p.a > 1].loc[[0, 2]].values.tolist())
    ix, pix = m.set_index("b"), p.set_index("b")
    assert ix.loc["y"].tolist() == pix.loc["y"].tolist()
    assert ix.loc["y", "a"] == pix.loc["y", "a"] == 1
    # duplicate labels keep a Series result
    pd2 = pd.DataFrame({"k": ["u", "u"], "a": [1, 2]})
    m2 = mpd.from_pandas(pd2).set_index("k")
    r = m2.loc["u", "a"]
    assert sorted(r.to_pandas().tolist()) == [1, 2]
    # missing label raises
    with pytest.raises(KeyError):
        m.loc[99]
    # Series scalar lookups
    s, sp = m["a"], p["a"]
    assert s.loc[2] == sp.loc[2] and s.iloc[1] == sp.iloc[1]
