"""Round-12 fixes: ADVICE defects + probe-wave-33 items, differential vs
pandas (reference test model: modin's test_series/test_indexing suites)."""
import warnings

import numpy as np
import pandas as pd
import pytest

import modin_spark.pandas as mpd
import modin_spark.numpy as mnp

warnings.filterwarnings("ignore")


def eq_series(m, p):
    g = m.to_pandas() if hasattr(m, "to_pandas") else m
    pd.testing.assert_series_equal(g, p, check_dtype=False, check_index_type=False,
                                   check_freq=False, check_categorical=False)


# ---------------------------------------------------------------- ADVICE #1
def test_sum_identity_all_nan():
    assert mpd.Series([np.nan, np.nan]).sum() == 0.0
    assert mpd.Series([], dtype="float64").sum() == 0.0
    assert mpd.Series([], dtype="int64").sum() == 0
    # skipna=False still poisons
    assert np.isnan(mpd.Series([np.nan, 1.0]).sum(skipna=False))
    # distributed path (past the native threshold)
    assert mpd.Series([np.nan] * 50_000).sum() == 0.0
    # prod identity unchanged
    assert mpd.Series([np.nan, np.nan]).prod() == 1.0


# ---------------------------------------------------------------- ADVICE #2
def test_to_datetime_dayfirst_shapes():
    vals = ["15/01/20", "5/3/99", "15/01/2020 10:30", "15.01.2020",
            "2020-01-15", "15/01/2020 10:30:45", "3-4-2021", "01/02/2020",
            "bogus", None]
    got = mpd.to_datetime(mpd.Series(vals), dayfirst=True).to_pandas()
    exp = pd.to_datetime(pd.Series(vals), dayfirst=True, errors="coerce")
    eq_series(got, exp)


# ---------------------------------------------------------------- ADVICE #3
def test_loc_assign_elementwise_and_enlarge():
    def mk(lib):
        return lib.DataFrame({"a": [1.0, 2.0, 3.0], "b": [4.0, 5.0, 6.0]},
                             index=["x", "y", "z"])

    p, m = mk(pd), mk(mpd)
    p.loc[["x", "z"], "a"] = [7.0, 8.0]
    m.loc[["x", "z"], "a"] = [7.0, 8.0]
    pd.testing.assert_frame_equal(m.to_pandas(), p, check_dtype=False)

    p, m = mk(pd), mk(mpd)
    p.loc["w", "a"] = 5.0  # enlargement
    m.loc["w", "a"] = 5.0
    pd.testing.assert_frame_equal(m.to_pandas(), p, check_dtype=False)

    p, m = mk(pd), mk(mpd)
    p.loc[["x", "y"], ["a", "b"]] = [[10.0, 11.0], [12.0, 13.0]]
    m.loc[["x", "y"], ["a", "b"]] = [[10.0, 11.0], [12.0, 13.0]]
    pd.testing.assert_frame_equal(m.to_pandas(), p, check_dtype=False)

    m = mk(mpd)
    with pytest.raises(KeyError):
        m.loc[["x", "nope"], "a"] = 1.0


def test_loc_assign_default_index_enlarge():
    p = pd.DataFrame({"a": [1.0, 2.0]})
    m = mpd.DataFrame({"a": [1.0, 2.0]})
    p.loc[2, "a"] = 9.0
    m.loc[2, "a"] = 9.0
    pd.testing.assert_frame_equal(m.to_pandas(), p, check_dtype=False)


# ---------------------------------------------------------------- ADVICE #4
def test_loc_short_tuple_column_split_on_deep_multiindex():
    pdf = pd.DataFrame({"l1": ["a", "a", "b"], "l2": [1, 2, 1],
                        "l3": ["p", "q", "r"], "v": [10, 20, 30],
                        "w": [1, 2, 3]}).set_index(["l1", "l2", "l3"])
    mdf = mpd.DataFrame(pdf.reset_index()).set_index(["l1", "l2", "l3"])
    eq_series(mdf.loc["a", "v"], pdf.loc["a", "v"])
    # partial tuples still resolve as row keys
    pd.testing.assert_frame_equal(mdf.loc[("a", 1)].to_pandas(),
                                  pdf.loc[("a", 1)], check_dtype=False)


# ---------------------------------------------------------------- ADVICE #5
def test_str_cat_sep_none():
    p = pd.Series(["a", "b"]).str.cat(pd.Series(["x", "y"]), sep=None)
    m = mpd.Series(["a", "b"]).str.cat(mpd.Series(["x", "y"]), sep=None)
    eq_series(m, p)


# ------------------------------------------------------- Series constructor
def test_series_public_constructor():
    eq_series(mpd.Series([3, 1, 2]), pd.Series([3, 1, 2]))
    eq_series(mpd.Series({"a": 1, "b": 2}), pd.Series({"a": 1, "b": 2}))
    eq_series(mpd.Series(np.array([1.5, 2.5]), name="n"),
              pd.Series(np.array([1.5, 2.5]), name="n"))
    eq_series(mpd.Series([1, 2], index=["a", "b"], dtype="float64"),
              pd.Series([1, 2], index=["a", "b"], dtype="float64"))
    s = mpd.Series(pd.Series([1, 2], name="z"))
    assert s.name == "z"
    # unnamed survives ops without picking up a positional label
    out = mpd.Series([3, 1, 2]).sort_values()
    assert out.name is None
    eq_series(out, pd.Series([3, 1, 2]).sort_values())


def test_concat_all_series_returns_series():
    g = mpd.concat([mpd.Series([1, 2], name="s"), mpd.Series([3], name="s")])
    e = pd.concat([pd.Series([1, 2], name="s"), pd.Series([3], name="s")])
    eq_series(g, e)
    # differing names -> name None
    g2 = mpd.concat([mpd.Series([1], name="a"), mpd.Series([2], name="b")])
    assert g2.name is None


def test_dataframe_from_modin_series_and_dtype():
    pd.testing.assert_frame_equal(
        mpd.DataFrame(mpd.Series([1, 2, 3], name="c")).to_pandas(),
        pd.DataFrame(pd.Series([1, 2, 3], name="c")), check_dtype=False)
    pd.testing.assert_frame_equal(
        mpd.DataFrame({"a": [1, 0]}, dtype=bool).to_pandas(),
        pd.DataFrame({"a": [1, 0]}, dtype=bool), check_dtype=False)


# -------------------------------------------------------- pd.NA comparisons
def test_nullable_ext_comparisons_keep_na():
    ps = pd.Series(pd.array([1, None, 3], dtype="Int64"))
    ms = mpd.Series(ps)
    for op in ("gt", "lt", "ge", "le", "eq", "ne"):
        e = getattr(ps, op)(1)
        g = getattr(ms, op)(1).to_pandas()
        pd.testing.assert_series_equal(g, e)
    # frame-ingested column keeps the dtype and the NA mask semantics
    pdf = pd.DataFrame({"a": pd.array([1, None, 3], dtype="Int64")})
    mdf = mpd.from_pandas(pdf)
    pd.testing.assert_series_equal((mdf["a"] > 1).to_pandas(), pdf["a"] > 1)
    assert str(mdf.to_pandas().dtypes["a"]) == "Int64"
    # mask indexing treats NA as False (pandas semantics)
    assert mdf[mdf["a"] > 1].to_pandas()["a"].tolist() == [3]


# ------------------------------------------------- categorical on ingest
def test_categorical_retention_from_pandas():
    pdf = pd.DataFrame({"c": pd.Categorical(["a", "b", "a"],
                                            categories=["a", "b", "z"]),
                        "v": [1, 2, 3]})
    mdf = mpd.from_pandas(pdf)
    eq_series(mdf.groupby("c", observed=False)["v"].sum(),
              pdf.groupby("c", observed=False)["v"].sum())
    assert str(mdf.to_pandas().dtypes["c"]) == "category"
    # ordered categorical comparison compares category ORDER
    pdo = pd.DataFrame({"c": pd.Categorical(
        ["lo", "hi", "mid"], categories=["lo", "mid", "hi"], ordered=True)})
    mdo = mpd.from_pandas(pdo)
    assert (mdo[mdo["c"] > "lo"].to_pandas()["c"].tolist()
            == pdo[pdo["c"] > "lo"]["c"].tolist())


# --------------------------------------------- dup-label binaries (native)
def test_duplicate_label_identical_sequence_positional(monkeypatch):
    # the positional fast path applies to driver-resident (native) series;
    # the suite globally disables native mode, so re-enable it here
    monkeypatch.setenv("MODIN_SPARK_NATIVE_MAX_ROWS", "5000")
    pe = pd.Series([1, 2, 3], index=["a", "a", "b"]) + \
        pd.Series([10, 20, 30], index=["a", "a", "b"])
    me = mpd.Series([1, 2, 3], index=["a", "a", "b"]) + \
        mpd.Series([10, 20, 30], index=["a", "a", "b"])
    eq_series(me, pe)
    # non-identical dup indexes: pandas cartesians per label
    pe2 = pd.Series([1, 2, 3], index=["a", "a", "b"]) + \
        pd.Series([10, 20, 30], index=["a", "b", "a"])
    me2 = mpd.Series([1, 2, 3], index=["a", "a", "b"]) + \
        mpd.Series([10, 20, 30], index=["a", "b", "a"])
    eq_series(me2, pe2)


# ---------------------------------------------------------- np.where 1-arg
def test_np_where_nonzero_form():
    g = mnp.where(mpd.Series([True, False, True, True]))
    e = np.where(np.array([True, False, True, True]))
    assert len(g) == 1 and list(g[0]) == list(e[0])
    a = mnp.array([[1, 0], [0, 2]])
    g2 = mnp.where(a != 0)
    e2 = np.where(np.array([[1, 0], [0, 2]]) != 0)
    assert list(g2[0]) == list(e2[0]) and list(g2[1]) == list(e2[1])


# ------------------------------------------------------- cut/qcut precision
def test_cut_qcut_label_precision():
    ps = pd.Series([1, 5, 9])
    ms = mpd.Series([1, 5, 9])
    assert [str(x) for x in mpd.cut(ms, 3).to_pandas()] == \
        [str(x) for x in pd.cut(ps, 3)]
    ps4 = pd.Series([1, 2, 3, 4])
    ms4 = mpd.Series([1, 2, 3, 4])
    assert [str(x) for x in mpd.qcut(ms4, 2).to_pandas()] == \
        [str(x) for x in pd.qcut(ps4, 2)]
    # include_lowest widens the displayed first edge only
    assert [str(x) for x in mpd.cut(ms4, [1, 2, 4], include_lowest=True).to_pandas()] == \
        [str(x) for x in pd.cut(ps4, [1, 2, 4], include_lowest=True)]


# ---------------------------------------------------------- wave 36 fixes
def test_groupby_resample_on_and_grid():
    ev = pd.DataFrame({
        "g": ["a", "a", "b", "b", "a", "b"],
        "t": pd.to_datetime(["2024-01-01 00:10", "2024-01-01 01:20",
                             "2024-01-01 00:40", "2024-01-01 02:05",
                             "2024-01-01 02:30", "2024-01-01 02:55"]),
        "v": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]})
    e = ev.groupby("g").resample("1h", on="t")["v"].sum()
    g = mpd.DataFrame(ev).groupby("g").resample("1h", on="t")["v"].sum()
    eq_series(g, e)
    # non-hour rule with explicit epoch origin
    e2 = ev.groupby("g").resample("90min", on="t", origin="epoch")["v"].sum()
    g2 = mpd.DataFrame(ev).groupby("g").resample("90min", on="t", origin="epoch")["v"].sum()
    eq_series(g2, e2)


def test_update_filter_func_and_errors():
    p = pd.DataFrame({"a": [1.0, 2.0, 3.0]})
    m = mpd.DataFrame({"a": [1.0, 2.0, 3.0]})
    o_p = pd.DataFrame({"a": [9.0, 9.0, 9.0]})
    o_m = mpd.DataFrame({"a": [9.0, 9.0, 9.0]})
    p.update(o_p, filter_func=lambda x: x > 1.5)
    m.update(o_m, filter_func=lambda x: x > 1.5)
    pd.testing.assert_frame_equal(m.to_pandas(), p, check_dtype=False)
    m2 = mpd.DataFrame({"a": [1.0, np.nan]})
    with pytest.raises(ValueError):
        m2.update(mpd.DataFrame({"a": [9.0, 8.0]}), errors="raise")


def test_qcut_retbins():
    g, gb = mpd.qcut(mpd.Series([1, 2, 3, 4]), 2, retbins=True)
    e, eb = pd.qcut(pd.Series([1, 2, 3, 4]), 2, retbins=True)
    assert list(np.round(gb, 6)) == list(np.round(eb, 6))
    assert [str(x) for x in g.to_pandas()] == [str(x) for x in e]


def test_read_csv_dtype_backend(tmp_path):
    p = str(tmp_path / "nb.csv")
    pd.DataFrame({"a": [1, None], "b": ["x", "y"]}).to_csv(p, index=False)
    out = mpd.read_csv(p, dtype_backend="numpy_nullable")
    exp = pd.read_csv(p, dtype_backend="numpy_nullable")
    assert str(out.dtypes["a"]) == str(exp.dtypes["a"]) == "Float64"
    pd.testing.assert_frame_equal(out.to_pandas(), exp, check_dtype=False)


# ---------------------------------------------------------- wave 37 fixes
def test_series_update_after_native_combine():
    s = mpd.Series([1.0, 2.0, 3.0])
    s.update(mpd.Series([9.0], index=[1]))
    p = pd.Series([1.0, 2.0, 3.0])
    p.update(pd.Series([9.0], index=[1]))
    eq_series(s, p)


def test_series_name_retention_through_ops():
    # unnamed series must not pick up positional/placeholder labels
    assert mpd.Series([3, 1, 2]).rank().name is None
    assert mpd.Series([1, 2], index=[10, 20]).cumsum().name is None
    assert mpd.Series([1.0, None, 3.0], name="z").dropna().name == "z"
    assert mpd.Series([1, 1, 2], name="x").drop_duplicates().name == "x"
    assert mpd.Series([1, 1, 2], name="x").duplicated().name == "x"
    assert mpd.Series([1, 1, 2], name="x").mode().name == "x"
    s = mpd.Series([1, 2, 3, 4], index=["a", "b", "a", "b"])
    g = s.groupby(level=0).sum().to_pandas()
    pgs = pd.Series([1, 2, 3, 4], index=["a", "b", "a", "b"]).groupby(level=0).sum()
    pd.testing.assert_series_equal(g, pgs, check_dtype=False)


def test_series_compare_flat_columns():
    a = mpd.Series([1, 2, 3], name="v")
    b = mpd.Series([1, 9, 3], name="v")
    got = a.compare(b).to_pandas()
    exp = pd.Series([1, 2, 3], name="v").compare(pd.Series([1, 9, 3], name="v"))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, check_index_type=False)


def test_reindex_duplicate_labels_raises():
    s = mpd.DataFrame({"v": [1, 2]}, index=["a", "a"])
    with pytest.raises(ValueError):
        s.reindex(["a", "b"])
    # non-duplicate reindex still works (incl. a single null label)
    ok = mpd.DataFrame({"v": [1, 2]}, index=["a", "b"]).reindex(["b", "c"]).to_pandas()
    exp = pd.DataFrame({"v": [1, 2]}, index=["a", "b"]).reindex(["b", "c"])
    pd.testing.assert_frame_equal(ok, exp, check_dtype=False)


# ---------------------------------------------------------- wave 38 fixes
def test_sequence_operand_aligns_positionally():
    s = mpd.Series([2.0, 1.0, np.nan, 4.0], index=["a", "b", "c", "d"], name="v")
    p = pd.Series([2.0, 1.0, np.nan, 4.0], index=["a", "b", "c", "d"], name="v")
    eq_series(s.add([1.0, 1.0, 1.0, 1.0]), p.add([1.0, 1.0, 1.0, 1.0]))
    eq_series(s > [1, 1, 1, 5], p > [1, 1, 1, 5])
    eq_series(s.radd(np.array([1.0, 2.0, 3.0, 4.0])),
              p.radd(np.array([1.0, 2.0, 3.0, 4.0])))


def test_take_keeps_original_positional_labels():
    d = {"g": ["x", "y", "x"], "a": [1.0, 2.0, 3.0]}
    m, p = mpd.DataFrame(d), pd.DataFrame(d)
    pd.testing.assert_frame_equal(m.take([0, 2]).to_pandas(), p.take([0, 2]),
                                  check_dtype=False)
    pd.testing.assert_frame_equal(m.iloc[[2, 0]].to_pandas(), p.iloc[[2, 0]],
                                  check_dtype=False)


def test_frame_interpolate_keeps_nonnumeric_columns():
    d = {"g": ["x", "y", "x", "y"], "a": [1.0, 2.0, np.nan, 4.0], "b": [10, 20, 30, 40]}
    m, p = mpd.DataFrame(d), pd.DataFrame(d)
    pd.testing.assert_frame_equal(m.interpolate().to_pandas(), p.interpolate(),
                                  check_dtype=False)
    assert list(m.interpolate().columns) == ["g", "a", "b"]


def test_misc_wave38_parity():
    s = mpd.Series([2.0, 1.0, np.nan, 4.0], index=["a", "b", "c", "d"], name="v")
    p = pd.Series([2.0, 1.0, np.nan, 4.0], index=["a", "b", "c", "d"], name="v")
    eq_series(s.argsort(), p.argsort())
    d = {"g": ["x", "y", "x", "y"], "a": [1.0, 2.0, np.nan, 4.0]}
    m, pf = mpd.DataFrame(d), pd.DataFrame(d)
    eq_series(m.duplicated(subset=["g"]), pf.duplicated(subset=["g"]))
    eq_series(m.idxmax(numeric_only=True), pf.idxmax(numeric_only=True))


def test_asfreq_anchors_at_first_index_value():
    idx = pd.date_range("2024-01-01 09:00", periods=6, freq="7h")
    m = mpd.DataFrame({"v": [1.0, 2.0, np.nan, 4.0, 5.0, 6.0]}, index=idx)
    p = pd.DataFrame({"v": [1.0, 2.0, np.nan, 4.0, 5.0, 6.0]}, index=idx)
    pd.testing.assert_frame_equal(m.asfreq("12h").to_pandas(), p.asfreq("12h"),
                                  check_dtype=False, check_freq=False)
    pd.testing.assert_frame_equal(m.asfreq("12h", method="ffill").to_pandas(),
                                  p.asfreq("12h", method="ffill"),
                                  check_dtype=False, check_freq=False)


def test_series_shift_freq_moves_index():
    idx = pd.date_range("2024-01-01", periods=3, freq="h")
    m = mpd.Series([1.0, 2.0, 3.0], index=idx, name="v")
    p = pd.Series([1.0, 2.0, 3.0], index=idx, name="v")
    eq_series(m.shift(2, freq="h"), p.shift(2, freq="h"))


def test_istitle_letter_runs():
    vals = ["  Quux  ", "quux", "Quux Bar", "QUux", "  a", "A", "a B",
            "Ab Cd-Ef", "123", "", "He2Llo", None, "Aa Bb  Cc", "aA"]
    eq_series(mpd.Series(vals).str.istitle(), pd.Series(vals).str.istitle())


def test_groupby_result_names():
    d = {"k": ["a", "b", "a"], "v": [1.0, 2.0, 3.0]}
    m, p = mpd.DataFrame(d), pd.DataFrame(d)
    eq_series(m.groupby("k").size(), p.groupby("k").size())
    assert m.groupby("k").size().name is None
    eq_series(m.groupby("k").cumcount(), p.groupby("k").cumcount())
    eq_series(m.groupby("k").ngroup(), p.groupby("k").ngroup())
    eq_series(m.groupby("k").value_counts(), p.groupby("k").value_counts())
    assert m.groupby("k").value_counts().name == "count"


def test_resample_nondivisor_start_day_anchor():
    idx = pd.date_range("2024-01-01 09:00", periods=6, freq="7h")
    m = mpd.Series([1.0, 2.0, np.nan, 4.0, 5.0, 6.0], index=idx, name="v")
    p = pd.Series([1.0, 2.0, np.nan, 4.0, 5.0, 6.0], index=idx, name="v")
    eq_series(m.resample("5h").sum(), p.resample("5h").sum())
    eq_series(m.resample("5h").ffill(), p.resample("5h").ffill())
    eq_series(m.resample("90min").mean(), p.resample("90min").mean())


def test_series_resample_fill_returns_series():
    idx = pd.date_range("2024-01-01", periods=4, freq="3h")
    m = mpd.Series([1.0, 2.0, 3.0, 4.0], index=idx, name="v")
    p = pd.Series([1.0, 2.0, 3.0, 4.0], index=idx, name="v")
    eq_series(m.resample("1h").asfreq(), p.resample("1h").asfreq())
    eq_series(m.resample("1h").nearest(), p.resample("1h").nearest())
    eq_series(m.resample("2h").size(), p.resample("2h").size())


def test_frame_binary_column_union_and_list_operand():
    a = {"a": [1.0, 2.0], "b": [3.0, 4.0]}
    b = {"b": [10.0, 20.0], "c": [5.0, 6.0]}
    m = mpd.DataFrame(a) + mpd.DataFrame(b)
    p = pd.DataFrame(a) + pd.DataFrame(b)
    pd.testing.assert_frame_equal(m.to_pandas(), p, check_dtype=False)
    m2 = mpd.DataFrame(a).add(mpd.DataFrame(b), fill_value=0)
    p2 = pd.DataFrame(a).add(pd.DataFrame(b), fill_value=0)
    pd.testing.assert_frame_equal(m2.to_pandas(), p2, check_dtype=False)
    # list operand: per-column broadcast / row-aligned with axis=0
    pd.testing.assert_frame_equal((mpd.DataFrame(a) + [10.0, 100.0]).to_pandas(),
                                  pd.DataFrame(a) + [10.0, 100.0], check_dtype=False)
    pd.testing.assert_frame_equal(mpd.DataFrame(a).add([10.0, 100.0], axis=0).to_pandas(),
                                  pd.DataFrame(a).add([10.0, 100.0], axis=0),
                                  check_dtype=False)


def test_duplicate_column_labels_concat_melt():
    def mk(lib):
        d = lib.DataFrame({"a": [1, 2], "b": [3, 4], "c": [5, 6]})
        d.columns = ["x", "x", "y"]
        return d

    e = pd.concat([mk(pd), mk(pd)], ignore_index=True)
    g = mpd.concat([mk(mpd), mk(mpd)], ignore_index=True).to_pandas()
    pd.testing.assert_frame_equal(g, e, check_dtype=False)
    pd.testing.assert_frame_equal(mk(mpd).melt().to_pandas(), mk(pd).melt(),
                                  check_dtype=False)


def test_delitem():
    d = mpd.DataFrame({"a": [1.0], "b": [2.0]})
    del d["a"]
    assert list(d.columns) == ["b"]
    with pytest.raises(KeyError):
        del d["zz"]


def test_one_sided_index_merge_keeps_other_index():
    L = {"k": [1, 2, 3], "v": [10.0, 20.0, 30.0]}
    e = pd.DataFrame(L).merge(pd.DataFrame({"w": [100.0]}, index=[2]),
                              left_on="k", right_index=True)
    g = mpd.DataFrame(L).merge(mpd.DataFrame({"w": [100.0]}, index=[2]),
                               left_on="k", right_index=True).to_pandas()
    pd.testing.assert_frame_equal(g, e, check_dtype=False)
    e2 = pd.DataFrame({"v": [1.0]}, index=[5]).merge(
        pd.DataFrame({"k": [5, 6], "w": [9.0, 8.0]}), left_index=True, right_on="k")
    g2 = mpd.DataFrame({"v": [1.0]}, index=[5]).merge(
        mpd.DataFrame({"k": [5, 6], "w": [9.0, 8.0]}), left_index=True, right_on="k").to_pandas()
    pd.testing.assert_frame_equal(g2, e2, check_dtype=False)


def test_value_counts_bins_and_mask_callable():
    s = mpd.Series([3.0, 1.0, np.nan, 2.0, 1.0], name="v")
    p = pd.Series([3.0, 1.0, np.nan, 2.0, 1.0], name="v")
    g, e = s.value_counts(bins=2).to_pandas(), p.value_counts(bins=2)
    assert g.name == e.name == "count"
    assert [str(x) for x in g.index] == [str(x) for x in e.index]
    assert g.tolist() == e.tolist()
    eq_series(s.mask(lambda x: x > 2, -1.0), p.mask(lambda x: x > 2, -1.0))
