"""Round-5 behavior-probe fixes: pandas semantics the merge/align/groupby
paths were missing (NaN-key merges, outer alignment of binary operands,
fill_value flex arithmetic, groupby identity elements, tuple agg labels).

Reference behaviors: modin defers all of these to pandas itself
(/root/reference/modin/pandas/dataframe.py merge/add; pandas-tests
merge_asof/test_merge.py cover NaN-key matching), so pandas IS the spec.
"""

import numpy as np
import pandas as pd
import pytest

import modin_spark.pandas as mpd

L = pd.DataFrame({"k": [1, 2, 2, np.nan, 5], "j": list("abcde"), "v": [1.0, 2, 3, 4, 5]})
R = pd.DataFrame({"k": [1, 2, np.nan, 4], "j": list("abxz"), "w": [10.0, 20, 30, 40]})


def _norm(df):
    df = df.reset_index(drop=True)
    df.columns = [str(c) for c in df.columns]
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), na_position="last", kind="mergesort").reset_index(drop=True)


def _check(got, exp):
    if hasattr(got, "to_pandas"):
        got = got.to_pandas()
    pd.testing.assert_frame_equal(
        _norm(got), _norm(exp), check_dtype=False, atol=1e-9, check_column_type=False
    )


@pytest.mark.parametrize("how", ["inner", "left", "right", "outer"])
def test_merge_nan_keys_match(spark, how):
    """pandas merge treats NaN as a joinable key value (NaN == NaN)."""
    ml, mr = mpd.from_pandas(L), mpd.from_pandas(R)
    _check(ml.merge(mr, on="k", how=how), L.merge(R, on="k", how=how))


def test_merge_outer_sorts_keys(spark):
    """outer merge sorts keys lexicographically even with sort=False."""
    ml, mr = mpd.from_pandas(L), mpd.from_pandas(R)
    got = ml.merge(mr, on="k", how="outer").to_pandas()
    exp = L.merge(R, on="k", how="outer")
    # row ORDER comparison (not just set equality)
    assert got["k"].fillna(-1).tolist() == exp["k"].fillna(-1).tolist()


def test_merge_suffix_none(spark):
    ml, mr = mpd.from_pandas(L), mpd.from_pandas(R)
    got = ml.merge(mr, on="k", suffixes=(None, "_R"))
    assert list(got.columns) == ["k", "j", "v", "j_R", "w"]


def test_merge_indicator_values(spark):
    ml, mr = mpd.from_pandas(L), mpd.from_pandas(R)
    got = ml.merge(mr, on="k", how="outer", indicator=True).to_pandas()
    exp = L.merge(R, on="k", how="outer", indicator=True)
    # the indicator column is a Categorical on both sides (pandas dtype)
    assert isinstance(got["_merge"].dtype, pd.CategoricalDtype)
    _check(got, exp)


def test_series_binary_outer_aligns(spark):
    s1 = pd.Series([1.0, 2, 3], index=["a", "b", "c"])
    s2 = pd.Series([10.0, 20], index=["b", "d"])
    fa = mpd.from_pandas(s1.to_frame("x"))["x"]
    fb = mpd.from_pandas(s2.to_frame("x"))["x"]
    got = (fa + fb).to_pandas()
    exp = s1 + s2
    assert got.index.tolist() == exp.index.tolist()
    pd.testing.assert_series_equal(got, exp, check_names=False, check_dtype=False)


@pytest.mark.parametrize("op", ["add", "sub", "mul", "truediv", "floordiv", "mod", "pow",
                                "radd", "rsub", "rmul", "rtruediv", "rfloordiv"])
def test_series_flex_fill_value(spark, op):
    s1 = pd.Series([1.0, np.nan, 3], index=["a", "b", "c"])
    s2 = pd.Series([10.0, 20], index=["b", "d"])
    fa = mpd.from_pandas(s1.to_frame("x"))["x"]
    fb = mpd.from_pandas(s2.to_frame("x"))["x"]
    got = getattr(fa, op)(fb, fill_value=2.0).to_pandas()
    exp = getattr(s1, op)(s2, fill_value=2.0)
    pd.testing.assert_series_equal(got, exp, check_names=False, check_dtype=False)


def test_groupby_allnan_sum_prod_identity(spark):
    g = pd.DataFrame({"h": [1, 1, 2], "v": [1.0, 2, 3]})
    mg = mpd.from_pandas(g).assign(v2=np.nan)
    pg = g.assign(v2=np.nan)
    got = mg.groupby("h").v2.sum().to_pandas().tolist()
    assert got == pg.groupby("h").v2.sum().tolist() == [0.0, 0.0]
    got_p = mg.groupby("h").v2.prod().to_pandas().tolist()
    assert got_p == pg.groupby("h").v2.prod().tolist() == [1.0, 1.0]


def test_groupby_agg_callable_frame(spark):
    g = pd.DataFrame({"h": [1, 1, 2], "v": [1.0, 2, 3], "w": [5.0, 6, 7]})
    mg = mpd.from_pandas(g)
    got = mg.groupby("h")[["v", "w"]].agg(lambda s: s.max() - s.min()).to_pandas().reset_index()
    exp = g.groupby("h")[["v", "w"]].agg(lambda s: s.max() - s.min()).reset_index()
    _check(got, exp)


def test_groupby_dict_list_as_index_false_multiindex_cols(spark):
    g = pd.DataFrame({"g": ["a", "a", "b"], "v": [1.0, 2, 3]})
    mg = mpd.from_pandas(g)
    got = mg.groupby("g", as_index=False).agg({"v": ["sum", "count"]}).to_pandas()
    exp = g.groupby("g", as_index=False).agg({"v": ["sum", "count"]})
    assert isinstance(got.columns, pd.MultiIndex)
    assert got.columns.tolist() == exp.columns.tolist()
    _check(got, exp)


def test_assign_nan_scalar_is_missing(spark):
    g = pd.DataFrame({"v": [1.0, 2]})
    mg = mpd.from_pandas(g).assign(z=np.nan)
    assert mg["z"].isna().to_pandas().all()
    # fillna sees it as missing (Spark double NaN would not)
    assert mg["z"].fillna(7.0).to_pandas().tolist() == [7.0, 7.0]


def test_rank_dense_and_pct(spark):
    s = pd.Series([3.0, 1.0, 3.0, np.nan, 2.0, 1.0])
    ms = mpd.from_pandas(s.to_frame("x"))["x"]
    for kw in [dict(method="dense"), dict(method="dense", pct=True),
               dict(method="dense", ascending=False),
               dict(method="dense", na_option="bottom")]:
        got = ms.rank(**kw).to_pandas()
        exp = s.rank(**kw)
        pd.testing.assert_series_equal(got, exp, check_names=False, check_dtype=False)


def test_resample_emits_empty_buckets(spark):
    idx = pd.to_datetime(["2024-01-01 00:00", "2024-01-01 03:30"])
    rs = pd.DataFrame({"v": [1.0, 2.0]}, index=idx)
    mr = mpd.from_pandas(rs)
    for agg in ["sum", "count", "mean", "min"]:
        got = getattr(mr.resample("h"), agg)().to_pandas()
        exp = getattr(rs.resample("h"), agg)()
        pd.testing.assert_frame_equal(got, exp, check_dtype=False, check_freq=False,
                                      check_names=False)


def test_series_reductions_skipna_false(spark):
    s = pd.Series([1.0, np.nan, 3.0])
    ms = mpd.from_pandas(s.to_frame("x"))["x"]
    assert np.isnan(ms.sum(skipna=False)) and s.sum(skipna=False) != s.sum(skipna=False)
    assert np.isnan(ms.mean(skipna=False))
    assert np.isnan(ms.max(skipna=False))
    assert ms.sum() == s.sum()
    allnan = pd.Series([np.nan, np.nan])
    mn = mpd.from_pandas(allnan.to_frame("x"))["x"]
    assert mn.prod() == allnan.prod() == 1.0
    assert mn.sum() == allnan.sum() == 0.0


def test_drop_duplicates_keep_false(spark):
    D = pd.DataFrame({"a": [1, 2, 2, 3, 2], "b": ["x", "y", "y", "z", "q"], "v": [1.0, 2, 2, np.nan, 5]})
    got = mpd.from_pandas(D).drop_duplicates(subset=["a", "b"], keep=False).to_pandas()
    exp = D.drop_duplicates(subset=["a", "b"], keep=False)
    _check(got, exp)


def test_clip_preserves_nan(spark):
    D = pd.DataFrame({"a": [1, 2, 3], "v": [1.0, np.nan, 5.0]})
    got = mpd.from_pandas(D).clip(lower=1.5, upper=2.5).to_pandas()
    exp = D.clip(lower=1.5, upper=2.5)
    _check(got, exp)
    s = pd.Series([1.0, np.nan, 5.0])
    gs = mpd.from_pandas(s.to_frame("x"))["x"].clip(1.5, 2.5).to_pandas()
    pd.testing.assert_series_equal(gs, s.clip(1.5, 2.5), check_names=False, check_dtype=False)


def test_nunique_axis1_cross_dtype(spark):
    D = pd.DataFrame({"a": [1, 2, 3], "v": [1.0, 2.0, 4.0]})
    got = mpd.from_pandas(D).nunique(axis=1).to_pandas().tolist()
    assert got == D.nunique(axis=1).tolist() == [1, 1, 2]


def test_melt_mixed_numeric_widens(spark):
    D = pd.DataFrame({"b": ["x", "y"], "a": [1, 2], "v": [1.5, np.nan]})
    got = mpd.from_pandas(D).melt(id_vars=["b"], value_vars=["a", "v"]).to_pandas()
    exp = D.melt(id_vars=["b"], value_vars=["a", "v"])
    _check(got, exp)


def test_stack_flat_returns_series(spark):
    p = pd.DataFrame({"x": [1.0, np.nan], "y": [3.0, 4.0]}, index=["r1", "r2"])
    got = mpd.from_pandas(p).stack().to_pandas()
    pd.testing.assert_series_equal(got, p.stack(), check_dtype=False, check_names=False)


def test_replace_nested_dict(spark):
    D = pd.DataFrame({"b": ["x", "y", "z"], "a": [1, 2, 3]})
    got = mpd.from_pandas(D).replace({"b": {"x": "X", "y": "Y"}}).to_pandas()
    _check(got, D.replace({"b": {"x": "X", "y": "Y"}}))


def test_where_unrelated_lineage_cond(spark):
    D = pd.DataFrame({"a": [1, 2, 3], "v": [1.0, 2, 3]})
    m1, m2 = mpd.from_pandas(D), mpd.from_pandas(D)
    got = m1.where(m2 > 1, -1).to_pandas()
    _check(got, D.where(D > 1, -1))
    got2 = m1.mask(m2 > 1, 0).to_pandas()
    _check(got2, D.mask(D > 1, 0))


def test_frame_flex_fill_and_reversed(spark):
    D = pd.DataFrame({"a": [1.0, 2, np.nan], "b": [10.0, 20, 30]})
    m = mpd.from_pandas(D)
    _check(m.add(1, fill_value=0).to_pandas(), D.add(1, fill_value=0))
    _check(m.div(m * 2, fill_value=1).to_pandas(), D.div(D * 2, fill_value=1))
    _check((m ** 2).to_pandas(), D ** 2)
    _check((10 - m).to_pandas(), 10 - D)
    _check((m % 3).to_pandas(), D % 3)
    _check(m.rsub(1).to_pandas(), D.rsub(1))
    _check(m.rtruediv(1).to_pandas(), D.rtruediv(1))


def test_fillna_series_lookup_alignment(spark):
    D = pd.DataFrame({"a": [1.0, 2, np.nan]}, index=["x", "y", "z"])
    S = pd.Series([100.0, 200, 300], index=["x", "y", "z"])
    got = mpd.from_pandas(D)["a"].fillna(mpd.from_pandas(S.to_frame("s"))["s"]).to_pandas()
    exp = D["a"].fillna(S)
    # lookup semantics: self's rows only, no union with the filler's index
    pd.testing.assert_series_equal(got, exp, check_names=False, check_dtype=False)


def test_rename_callable(spark):
    D = pd.DataFrame({"a": [1], "b": [2]})
    assert list(mpd.from_pandas(D).rename(columns=str.upper).columns) == ["A", "B"]


def test_cut_right_false_labels(spark):
    V = pd.Series([1.0, 5.0, 9.0])
    got = mpd.cut(mpd.from_pandas(V.to_frame("v"))["v"], bins=[0, 5, 10], right=False).astype(str).to_pandas()
    exp = pd.cut(V, bins=[0, 5, 10], right=False).astype(str)
    assert got.tolist() == exp.tolist()


def test_str_partition_frame_and_index_raises(spark):
    T = pd.Series(["hello", "spark", None])
    mt = mpd.from_pandas(T.to_frame("t"))["t"]
    _check(mt.str.partition("l").to_pandas(), T.str.partition("l"))
    _check(mt.str.rpartition("l").to_pandas(), T.str.rpartition("l"))
    with pytest.raises(ValueError):
        mt.dropna().str.index("l")  # 'spark' has no 'l'
    ok = mpd.from_pandas(pd.Series(["la", "al"]).to_frame("t"))["t"]
    assert ok.str.index("l").to_pandas().tolist() == [0, 1]


def test_groupby_external_series_key(spark):
    G = pd.DataFrame({"v": [1.0, 2, 3, 4]})
    KEY = pd.Series(["a", "b", "a", "b"])
    mg = mpd.from_pandas(G)
    mk = mpd.from_pandas(KEY.to_frame("k"))["k"]
    got = mg.groupby(mk).v.sum().to_pandas()
    exp = G.groupby(KEY).v.sum()
    assert got.sort_index().tolist() == exp.sort_index().tolist()


def test_pivot_table_aggfunc_list(spark):
    P = pd.DataFrame({"k": ["a", "a", "b"], "c": ["u", "v", "u"], "x": [1.0, 2, 3]})
    got = mpd.from_pandas(P).pivot_table(values="x", index="k", columns="c",
                                         aggfunc=["sum", "count"]).to_pandas()
    exp = P.pivot_table(values="x", index="k", columns="c", aggfunc=["sum", "count"])
    assert got.columns.tolist() == exp.columns.tolist()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, check_names=False)


def test_interpolate_limit(spark):
    s = pd.Series([1.0, np.nan, np.nan, np.nan, 5.0])
    got = mpd.from_pandas(s.to_frame("x"))["x"].interpolate(limit=1).to_pandas()
    pd.testing.assert_series_equal(got, s.interpolate(limit=1), check_names=False, check_dtype=False)


def test_ffill_bfill_axis1(spark):
    F2 = pd.DataFrame({"a": [1.0, np.nan], "b": [np.nan, np.nan], "c": [3.0, 4.0]})
    m = mpd.from_pandas(F2)
    _check(m.ffill(axis=1).to_pandas(), F2.ffill(axis=1))
    _check(m.bfill(axis=1).to_pandas(), F2.bfill(axis=1))
    _check(m.ffill(axis=1, limit=1).to_pandas(), F2.ffill(axis=1, limit=1))


def test_query_at_vars_backticks_in_index(spark):
    D = pd.DataFrame({"a": [1, 2, 3], "b name": [4.0, 5, 6], "s": ["x", "yy", "zzz"]})
    m = mpd.from_pandas(D)
    thr = 1
    _check(m.query("a > @thr").to_pandas(), D.query("a > @thr"))
    _check(m.query("`b name` > 4.5").to_pandas(), D.query("`b name` > 4.5"))
    _check(m.query("s in ['x', 'yy']").to_pandas(), D.query("s in ['x', 'yy']"))
    _check(m.query("s.str.len() > 1").to_pandas(), D.query("s.str.len() > 1"))
    got = m.set_index("a").query("index >= 2").reset_index().to_pandas()
    _check(got, D.set_index("a").query("index >= 2").reset_index())


def test_to_datetime_unit(spark):
    s = pd.Series([1700000000])
    got = mpd.to_datetime(mpd.from_pandas(s.to_frame("x"))["x"], unit="s").to_pandas()
    pd.testing.assert_series_equal(got, pd.to_datetime(s, unit="s"), check_names=False)


def test_categorical_ordered_comparison(spark):
    C = pd.Series(["lo", "hi", "mid", "hi"])
    dt = pd.CategoricalDtype(["lo", "mid", "hi"], ordered=True)
    got = (mpd.from_pandas(C.to_frame("c"))["c"].astype(dt) < "hi").to_pandas()
    assert got.tolist() == (C.astype(dt) < "hi").tolist()
    with pytest.raises(TypeError):
        mpd.from_pandas(C.to_frame("c"))["c"].astype(dt) < "nope"


def test_loc_enlargement_and_full_slice_set(spark):
    d = mpd.from_pandas(pd.DataFrame({"a": [1.0]}, index=["x"]))
    d.loc["y"] = [2.0]
    got = d.reset_index().to_pandas()
    exp = pd.DataFrame({"a": [1.0]}, index=["x"])
    exp.loc["y"] = [2.0]
    _check(got, exp.reset_index())
    D = pd.DataFrame({"a": [1, 2]})
    m = mpd.from_pandas(D)
    m.loc[:, "z"] = 7
    D.loc[:, "z"] = 7
    _check(m.to_pandas(), D)


def test_str_extract_groups(spark):
    S2 = pd.Series(["a1b2", "c3", "no"])
    ms = mpd.from_pandas(S2.to_frame("s"))["s"]
    got1 = ms.str.extract(r"(\d)", expand=False).to_pandas()
    pd.testing.assert_series_equal(got1, S2.str.extract(r"(\d)", expand=False),
                                   check_names=False, check_dtype=False)
    got2 = ms.str.extract(r"([a-z])(\d)").to_pandas()
    pd.testing.assert_frame_equal(got2, S2.str.extract(r"([a-z])(\d)"),
                                  check_dtype=False, check_column_type=False)
    gotn = ms.str.extract(r"(?P<ch>[a-z])(?P<num>\d)").to_pandas()
    assert list(gotn.columns) == ["ch", "num"]


def test_at_preserves_int_dtype(spark):
    D = pd.DataFrame({"a": [1, 2], "b": [1.5, 2.5], "s": ["x", "yy"]})
    got = mpd.from_pandas(D).set_index("s").at["yy", "a"]
    assert got == 2 and not isinstance(got, float)


def test_dt_floor_ceil_round_multiples(spark):
    T = pd.Series(pd.to_datetime(["2024-01-01 05:36:07.123", "2024-02-02 23:59:59.999"]))
    mt = mpd.from_pandas(T.to_frame("t"))["t"]
    for op in ["floor", "ceil", "round"]:
        for freq in ["h", "15min", "2h", "30s"]:
            got = getattr(mt.dt, op)(freq).to_pandas()
            exp = getattr(T.dt, op)(freq)
            pd.testing.assert_series_equal(got, exp, check_names=False), (op, freq)


def test_timedelta_sum_and_datetime_diff(spark):
    TD = pd.Series(pd.to_timedelta(["1 days 02:00:00", "0 days 00:30:00"]))
    mtd = mpd.from_pandas(TD.to_frame("d"))["d"]
    assert mtd.sum() == TD.sum()
    assert isinstance(mtd.sum(), pd.Timedelta)
    T = pd.Series(pd.to_datetime(["2024-01-01 05:00:00", "2024-01-02 06:30:00"]))
    mt = mpd.from_pandas(T.to_frame("t"))["t"]
    got = mt.diff().dt.total_seconds().to_pandas()
    pd.testing.assert_series_equal(got, T.diff().dt.total_seconds(), check_names=False, check_dtype=False)


def test_persist_roundtrip(spark):
    m = mpd.from_pandas(pd.DataFrame({"a": [1, 2, 3]})).persist()
    assert m.to_pandas().shape[0] == 3
    m.unpersist()


def test_csv_dialect_and_kwargs(spark, tmp_path):
    p = tmp_path / "q.csv"
    p.write_text('a,b,c\n1,"x,y",2.5\n2,"he said ""hi""",3.5\n')
    _check(mpd.read_csv(str(p)).to_pandas(), pd.read_csv(p))
    p2 = tmp_path / "t.csv"
    p2.write_text("a,b\n1,MISSING\n2,ok\n")
    _check(mpd.read_csv(str(p2), na_values=["MISSING"]).to_pandas(),
           pd.read_csv(p2, na_values=["MISSING"]))
    p3 = tmp_path / "th.csv"
    p3.write_text('a,b\n"1,234",x\n"5,678",y\n')
    _check(mpd.read_csv(str(p3), thousands=",").to_pandas(),
           pd.read_csv(p3, thousands=","))


def test_to_csv_to_json_roundtrip(spark, tmp_path):
    D = pd.DataFrame({"a": [1.0, np.nan], "s": ['say "hi"', "x,y"]})
    out = str(tmp_path / "rt")
    mpd.from_pandas(D).to_csv(out, index=False)
    _check(mpd.read_csv(out).to_pandas(), D)
    outj = str(tmp_path / "rtj")
    mpd.from_pandas(D[["a"]]).to_json(outj, orient="records", lines=True)
    _check(mpd.read_json(outj, lines=True).to_pandas(), D[["a"]])
