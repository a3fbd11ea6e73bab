"""Round-14 fixes: ADVICE r13 punch list, differential vs pandas
(reference test model: modin's test_series / test_groupby suites)."""
import warnings

import numpy as np
import pandas as pd
import pytest

import modin_spark.pandas as mpd

warnings.filterwarnings("ignore")


def eq_series(m, p):
    g = m.to_pandas() if hasattr(m, "to_pandas") else m
    pd.testing.assert_series_equal(g, p, check_dtype=False, check_index_type=False,
                                   check_freq=False, check_categorical=False)


def eq_frame(m, p):
    g = m.to_pandas() if hasattr(m, "to_pandas") else m
    pd.testing.assert_frame_equal(g, p, check_dtype=False, check_index_type=False,
                                  check_freq=False, check_categorical=False)


# ---------------------------------------------------------- ADVICE high #1
def test_rank_with_infinities():
    """order_bucket_expr must bucket +/-inf at the extremes, not wrap the
    long cast negative (log2(inf)=inf -> floor overflow -> Long.MAX wrap)."""
    vals = [1.0, float("inf"), 3.0, float("-inf"), 2.0]
    ps = pd.Series(vals)
    ms = mpd.Series(vals)
    eq_series(ms.rank(), ps.rank())
    eq_series(ms.rank(method="min"), ps.rank(method="min"))
    # with NaN too: NaN keeps rank NaN and sorts past +inf
    vals2 = [5.0, float("-inf"), float("nan"), float("inf"), 0.0, -2.5]
    eq_series(mpd.Series(vals2).rank(), pd.Series(vals2).rank())


def test_sort_values_with_infinities():
    vals = [1.0, float("inf"), 3.0, float("-inf"), 2.0, float("nan")]
    p = pd.DataFrame({"v": vals, "k": list("abcdef")})
    m = mpd.DataFrame({"v": vals, "k": list("abcdef")})
    eq_frame(m.sort_values("v").reset_index(drop=True),
             p.sort_values("v").reset_index(drop=True))


def test_asof_merge_with_infinities():
    left = pd.DataFrame({"t": [-np.inf, 1.0, 2.0, np.inf], "l": [0, 1, 2, 3]})
    right = pd.DataFrame({"t": [-np.inf, 1.5, np.inf], "r": [10, 20, 30]})
    exp = pd.merge_asof(left, right, on="t")
    got = mpd.merge_asof(mpd.DataFrame(left), mpd.DataFrame(right), on="t")
    eq_frame(got, exp)


# ---------------------------------------------------------- ADVICE high #2
def test_ngroup_sort_false_after_merge():
    """ngroup(sort=False) on a merge output: ORDER_COL is a struct there —
    the bucket must come from the leading integral leaf, not cast-to-long."""
    pl = pd.DataFrame({"k": ["b", "a", "b", "c", "a"], "x": [1, 2, 3, 4, 5]})
    pr = pd.DataFrame({"k": ["a", "b", "c"], "y": [10, 20, 30]})
    pm = pl.merge(pr, on="k")
    ml = mpd.DataFrame(pl)
    mr = mpd.DataFrame(pr)
    mm = ml.merge(mr, on="k")
    eq_series(mm.groupby("k", sort=False).ngroup(),
              pm.groupby("k", sort=False).ngroup())
    # and after concat (another struct-order lineage)
    pc = pd.concat([pl, pl], ignore_index=True)
    mc = mpd.concat([ml, ml], ignore_index=True)
    eq_series(mc.groupby("k", sort=False).ngroup(),
              pc.groupby("k", sort=False).ngroup())


# ----------------------------------------------------------- ADVICE low #1
def test_xs_single_level_drop_level_false():
    """Verified against pandas 2.2: single-level xs returns the row as a
    Series for BOTH drop_level settings (the flag only affects MultiIndex),
    so the early return must not change shape on drop_level=False."""
    p = pd.DataFrame({"a": [1, 2, 3], "b": [4.0, 5.0, 6.0]},
                     index=pd.Index(["x", "y", "z"], name="idx"))
    m = mpd.DataFrame(p)
    eq_series(m.xs("y", drop_level=False), p.xs("y", drop_level=False))
    eq_series(m.xs("y"), p.xs("y"))
    # MultiIndex: drop_level=False keeps every level
    pm = pd.DataFrame({"v": [1, 2, 3, 4]},
                      index=pd.MultiIndex.from_product(
                          [["a", "b"], [1, 2]], names=["u", "w"]))
    mm = mpd.DataFrame(pm)
    eq_frame(mm.xs("a", level="u", drop_level=False),
             pm.xs("a", level="u", drop_level=False))


# ----------------------------------------------------------- ADVICE low #2
def test_expanding_quantile_survives_empty_cogroup():
    """stage1's empty frame must carry every q_schema column (incl __loev__)."""
    n = 400
    rng = np.random.default_rng(7)
    vals = rng.normal(size=n)
    ps = pd.Series(vals)
    ms = mpd.Series(vals)
    eq_series(ms.expanding(min_periods=3).quantile(0.25),
              ps.expanding(min_periods=3).quantile(0.25))


# ----------------------------------------------------------- ADVICE low #3
def test_scalar_str_comparison_explicit_op_tokens():
    s = mpd.Series([1, 2, 3])
    eq_series(s == "x", pd.Series([False, False, False]))
    eq_series(s != "x", pd.Series([True, True, True]))
    eq_series(s.eq("x"), pd.Series([False, False, False]))
    eq_series(s.ne("x"), pd.Series([True, True, True]))
    for bad in (lambda: s < "x", lambda: s.le("x"), lambda: s > "x",
                lambda: s.ge("x")):
        with pytest.raises(TypeError):
            bad()


# -------------------------------------------------------- VERDICT r13 #4
def test_expanding_rank_quantile_degenerate_ties():
    """Constant and 90%-one-value columns funnel into one value bucket —
    the degenerate-tie fast paths must stay pandas-exact (m==1 short
    circuit, m<=64 histogram, vectorized merge-count)."""
    n = 4000
    rng = np.random.default_rng(11)
    shapes = {
        "constant": np.full(n, 7.0),
        "hot90": np.where(rng.random(n) < 0.9, 7.0,
                          rng.integers(0, 50, n).astype(float)),
        "fewvals": rng.integers(0, 5, n).astype(float),
        "diverse": rng.normal(size=n),
    }
    for name, vals in shapes.items():
        ps = pd.Series(vals)
        ms = mpd.Series(vals)
        for m in ("average", "min", "max"):
            eq_series(ms.expanding(min_periods=2).rank(method=m),
                      ps.expanding(min_periods=2).rank(method=m))
        eq_series(ms.expanding(min_periods=1).median(),
                  ps.expanding(min_periods=1).median())
        eq_series(ms.expanding(min_periods=1).quantile(0.9),
                  ps.expanding(min_periods=1).quantile(0.9))


# -------------------------------------------------------- probe wave 41
def test_pct_change_zero_denominator():
    p = pd.DataFrame({"a": [0.0, 1.0, 2.0, 3.0, 4.0, 5.0]})
    m = mpd.DataFrame(p)
    eq_frame(m.pct_change(periods=2), p.pct_change(periods=2))  # 2/0 -> inf
    ps = pd.Series([0.0, 0.0, 3.0, -1.0])
    ms = mpd.Series([0.0, 0.0, 3.0, -1.0])
    eq_series(ms.pct_change(), ps.pct_change())  # 0/0 -> nan stays nan


def test_cut_inf_edges_and_nan_render():
    vals = [0.5, -0.5, np.inf, np.nan, 2.0, -3.0]
    ps = pd.Series(vals)
    ms = mpd.Series(vals)
    eq_series(ms.cut_result.astype(str) if hasattr(ms, "cut_result") else
              mpd.cut(ms, [-np.inf, -1, 0, 1, np.inf]).astype(str),
              pd.cut(ps, [-np.inf, -1, 0, 1, np.inf]).astype(str))
    # int edges stay int-rendered when ALL edges are ints
    eq_series(mpd.cut(mpd.Series([1.0, 5.0, 9.0]), [0, 4, 10]).astype(str),
              pd.cut(pd.Series([1.0, 5.0, 9.0]), [0, 4, 10]).astype(str))


def test_value_counts_int_bins_rejects_inf():
    s = mpd.Series([1.0, np.inf, 2.0])
    with pytest.raises(ValueError):
        s.value_counts(bins=3)
    # finite data still bins fine
    r = mpd.Series([1.0, 1.5, 9.0]).value_counts(bins=2)
    assert int(r.to_pandas().sum()) == 3


def test_xs_partial_tuple_key():
    pmi = pd.DataFrame({"v": range(8)},
                       index=pd.MultiIndex.from_product(
                           [["a", "b"], [1, 2], ["x", "y"]], names=["u", "w", "z"]))
    mmi = mpd.DataFrame(pmi)
    eq_frame(mmi.xs(("a", 2)), pmi.xs(("a", 2)))
    eq_frame(mmi.xs(("b",)), pmi.xs(("b",)))
    eq_series(mmi.xs(("a", 1, "y")), pmi.xs(("a", 1, "y")))
    with pytest.raises(KeyError):
        mmi.xs(("a", 1, "y", "extra"))


# -------------------------------------------------------- probe wave 42
def test_unstack_duplicate_entries_raises():
    p = pd.DataFrame({"a": list("xyxyxz"), "b": list("mmnnmm"), "v": range(6)})
    m = mpd.DataFrame(p)
    pgi, mgi = p.set_index(["a", "b"]), m.set_index(["a", "b"])
    with pytest.raises(ValueError):
        mgi["v"].unstack(fill_value=-1)  # (x, m) appears twice
    # unique pairs still unstack
    p2 = p.drop_duplicates(["a", "b"]).set_index(["a", "b"])
    m2 = mpd.DataFrame(p.drop_duplicates(["a", "b"])).set_index(["a", "b"])
    eq_frame(m2["v"].unstack(fill_value=-1), p2["v"].unstack(fill_value=-1))


def test_stack_mi_cols_default_index():
    p = pd.DataFrame({("x", 1): [1, 2], ("x", 2): [3, 4], ("y", 1): [5, 6]})
    m = mpd.DataFrame(p)
    eq_frame(m.stack(future_stack=True), p.stack(future_stack=True))


def test_reindex_method_keeps_index_name():
    ps = pd.Series([1.0, 2.0, 3.0], index=[0, 2, 4])
    ms = mpd.Series([1.0, 2.0, 3.0], index=[0, 2, 4])
    eq_series(ms.reindex(range(6), method="ffill"),
              ps.reindex(range(6), method="ffill"))
    pn = pd.Series([1.0, 2.0], index=pd.Index([0, 2], name="t"))
    mn = mpd.Series([1.0, 2.0], index=pd.Index([0, 2], name="t"))
    eq_series(mn.reindex([0, 1, 2], method="nearest"),
              pn.reindex([0, 1, 2], method="nearest"))


def test_str_len_on_list_column():
    ps = pd.Series(["aXbXc", "Xd", None])
    ms = mpd.Series(["aXbXc", "Xd", None])
    eq_series(ms.str.findall("X").str.len(), ps.str.findall("X").str.len())
    eq_series(ms.str.split("X").str.len(), ps.str.split("X").str.len())
    eq_series(ms.str.len(), ps.str.len())  # plain strings still char-count


def test_categorical_dtype_survives_boolean_filter():
    pcat = pd.Series(pd.Categorical(["lo", "hi", "mid", "hi"],
                                    categories=["lo", "mid", "hi"], ordered=True))
    mcat = mpd.Series(pcat)
    exp = pcat[pcat != "mid"].cat.remove_unused_categories()
    got = mcat[mcat != "mid"].cat.remove_unused_categories()
    assert got.cat.categories.tolist() == exp.cat.categories.tolist()
    eq_series(got, exp)


# -------------------------------------------------------- probe wave 43
def test_nunique_dropna_false_frame():
    p = pd.DataFrame({"a": [1, 2, 3, 4], "b": [4.0, None, 6.0, 7.0], "c": list("wxyz")})
    m = mpd.DataFrame(p)
    eq_series(pd.Series(m.nunique(dropna=False)), p.nunique(dropna=False))
    eq_series(pd.Series(m.nunique()), p.nunique())


def test_get_dummies_series_float_and_na():
    p = pd.Series([4.0, None, 6.0, 7.0])
    m = mpd.Series([4.0, None, 6.0, 7.0])
    eq_frame(mpd.get_dummies(m, dummy_na=True).astype(int),
             pd.get_dummies(p, dummy_na=True).astype(int))
    eq_frame(mpd.get_dummies(m).astype(int), pd.get_dummies(p).astype(int))


def test_groupby_resample_unnamed_index_level():
    idx = pd.date_range("2024-01-01", periods=12, freq="45min")
    p = pd.DataFrame({"g": list("ab") * 6, "v": range(12)}, index=idx)
    m = mpd.DataFrame(p)
    eq_series(m.groupby("g").resample("2h")["v"].sum(),
              p.groupby("g").resample("2h")["v"].sum())


def test_cat_codes_unnamed():
    p = pd.Series(list("aba"), name="c").astype("category")
    m = mpd.Series(pd.Series(list("aba"), name="c")).astype("category")
    assert m.cat.codes.name is None
    eq_series(m.cat.codes, p.cat.codes)


def test_cov_min_periods():
    p = pd.DataFrame({"a": [1.0, 2, 3, 4], "b": [4.0, None, 6.0, 7.0]})
    m = mpd.DataFrame(p)
    pd.testing.assert_frame_equal(m.cov(min_periods=3), p.cov(min_periods=3),
                                  check_dtype=False)
    pd.testing.assert_frame_equal(m.cov(min_periods=4), p.cov(min_periods=4),
                                  check_dtype=False)


# -------------------------------------------------------- probe wave 44
def test_groupby_apply_group_keys_false_after_selection():
    p = pd.DataFrame({"g": list("aabbc"), "v": [1.0, 2.0, 3.0, 4.0, 5.0]})
    m = mpd.DataFrame(p)
    eq_frame(m.groupby("g", group_keys=False)[["v"]].apply(lambda d: d - d.mean()),
             p.groupby("g", group_keys=False)[["v"]].apply(lambda d: d - d.mean()))


def test_astype_errors_ignore():
    s = mpd.Series(list("wxyz"))
    out = s.astype(int, errors="ignore")
    assert out.to_pandas().tolist() == list("wxyz")
    ok = mpd.Series(["1", "2"]).astype(int, errors="ignore")
    assert ok.to_pandas().tolist() == [1, 2]


def test_period_plus_int():
    pper = pd.Series(pd.date_range("2024-01-15", periods=4, freq="ME"))
    mper = mpd.Series(pper)
    eq_series((mper.dt.to_period("M") + 1).astype(str),
              (pper.dt.to_period("M") + 1).astype(str))
    eq_series((mper.dt.to_period("M") - 2).astype(str),
              (pper.dt.to_period("M") - 2).astype(str))
    eq_series((mper.dt.to_period("Q") + 3).astype(str),
              (pper.dt.to_period("Q") + 3).astype(str))
    eq_series((mper.dt.to_period("Y") + 1).astype(str),
              (pper.dt.to_period("Y") + 1).astype(str))
    eq_series((mper.dt.to_period("D") + 10).astype(str),
              (pper.dt.to_period("D") + 10).astype(str))


# -------------------------------------------------------- probe wave 45
def test_str_cat_na_rep_and_list():
    ps = pd.Series(["a", None, "c"])
    ms = mpd.Series(["a", None, "c"])
    eq_series(ms.str.cat(mpd.Series(["1", "2", "3"]), sep="-", na_rep="?"),
              ps.str.cat(pd.Series(["1", "2", "3"]), sep="-", na_rep="?"))
    eq_series(ms.str.cat(mpd.Series(["1", None, "3"]), sep="-"),
              ps.str.cat(pd.Series(["1", None, "3"]), sep="-"))


def test_interpolate_limit_area():
    vals = [None, 1.0, None, None, 4.0, None]
    ps = pd.Series(vals)
    ms = mpd.Series(vals)
    eq_series(ms.interpolate(limit_area="inside"), ps.interpolate(limit_area="inside"))
    eq_series(ms.interpolate(limit_direction="both", limit_area="outside"),
              ps.interpolate(limit_direction="both", limit_area="outside"))
    eq_series(ms.interpolate(), ps.interpolate())


# -------------------------------------------------------- probe wave 46
def test_value_counts_named_count():
    p = pd.Series(list("xxy"), name="c")
    m = mpd.Series(p)
    pd.testing.assert_series_equal(m.value_counts().to_pandas(), p.value_counts(),
                                   check_dtype=False, check_index_type=False)
    pd.testing.assert_series_equal(
        m.value_counts(normalize=True).to_pandas(), p.value_counts(normalize=True),
        check_dtype=False, check_index_type=False)


def test_sample_frac_exact_count():
    p = pd.DataFrame({"a": range(10)})
    m = mpd.DataFrame(p)
    assert len(m.sample(frac=0.5, random_state=1).to_pandas()) == 5
    assert len(m.sample(frac=0.31, random_state=1).to_pandas()) == round(0.31 * 10)
    with pytest.raises(ValueError):
        m.sample(frac=1.5)


def test_diff_bool_xor():
    p = pd.Series([True, False, True, True])
    m = mpd.Series([True, False, True, True])
    eq_series(m.diff(), p.diff())


def test_idxmax_idxmin_skipna_false():
    p = pd.Series([1.0, None, 3.0])
    m = mpd.Series([1.0, None, 3.0])
    assert np.isnan(m.idxmax(skipna=False)) and np.isnan(m.idxmin(skipna=False))
    assert m.idxmax() == p.idxmax() and m.idxmin() == p.idxmin()


def test_mode_dropna_false():
    vals = [1.0, 1.0, None, None, 2.0]
    eq_series(mpd.Series(vals).mode(dropna=False), pd.Series(vals).mode(dropna=False))
    eq_series(mpd.Series(vals).mode(), pd.Series(vals).mode())


def test_str_normalize_and_pos():
    import unicodedata
    raw = ["é", "a", None]  # NFD e-acute
    eq_series(mpd.Series(raw).str.normalize("NFC"), pd.Series(raw).str.normalize("NFC"))
    eq_series(+mpd.Series([1, -2]), +pd.Series([1, -2]))


# -------------------------------------------------------- probe wave 47
def test_df_add_series_axis1_union_columns():
    p = pd.DataFrame({"a": [1.0, 2.0], "b": [10.0, None]})
    m = mpd.DataFrame(p)
    srow = pd.Series({"a": 1.0, "b": 2.0, "z": 9.0})
    eq_frame(m.add(srow, axis=1), p.add(srow, axis=1))


def test_combine_first_mixed_default_and_real_index():
    pa = pd.DataFrame({"x": [1.0, None], "y": [None, 4.0]})
    upd = pd.DataFrame({"x": [100.0]}, index=[1])
    got = mpd.DataFrame(upd).combine_first(mpd.DataFrame(pa))
    eq_frame(got, upd.combine_first(pa))
    # update (in place) rides the same alignment
    d = mpd.DataFrame(pa)
    d.update(mpd.DataFrame(upd))
    e = pa.copy()
    e.update(upd)
    eq_frame(d, e)


def test_groupby_observed_plumbing():
    pg = pd.DataFrame({"k": pd.Categorical(["u", "v", "u"], categories=["u", "v", "w"]),
                       "v": [1.0, 2.0, 3.0]})
    mg = mpd.DataFrame(pg)
    eq_frame(mg.groupby("k", observed=True).agg(tot=("v", "sum")),
             pg.groupby("k", observed=True).agg(tot=("v", "sum")))
    eq_frame(mg.groupby("k", observed=False).agg(tot=("v", "sum")),
             pg.groupby("k", observed=False).agg(tot=("v", "sum")))
    eq_series(mg.groupby("k", observed=False)["v"].sum(),
              pg.groupby("k", observed=False)["v"].sum())
    eq_series(mg.groupby("k", observed=True)["v"].sum(),
              pg.groupby("k", observed=True)["v"].sum())


# ------------------------------------------------------- surface parity
def test_full_public_method_surface():
    """Every public pandas DataFrame/Series attribute exists on the engine
    classes (the .sparse accessor raises pandas' own message — storage is
    always dense)."""
    pub = lambda cls: {n for n in dir(cls) if not n.startswith("_")}
    assert not (pub(pd.DataFrame) - pub(mpd.DataFrame))
    assert not (pub(pd.Series) - pub(mpd.Series))
    with pytest.raises(AttributeError):
        mpd.Series([1]).sparse


def test_groupby_attribute_column_access():
    g = mpd.DataFrame({"k": [1, 1, 2], "v": [2.0, 3.0, 4.0]}).groupby("k")
    eq_series(g.v.sum(),
              pd.DataFrame({"k": [1, 1, 2], "v": [2.0, 3.0, 4.0]}).groupby("k").v.sum())
    with pytest.raises(AttributeError):
        g.not_a_column


def test_rolling_introspection_attrs():
    r = mpd.Series([1.0, 2.0]).rolling(3, min_periods=2, center=True)
    assert (r.window, r.min_periods, r.center, r.closed) == (3, 2, True, None)
    assert "upper" in dir(mpd.Series(["a"]).str)


# -------------------------------------------------------- probe wave 48
def test_rename_mapper_axis():
    p = pd.DataFrame({"a": [1, 2]}, index=pd.Index(["x", "y"], name="i"))
    m = mpd.DataFrame(p)
    eq_frame(m.rename(str.upper, axis=0), p.rename(str.upper, axis=0))
    eq_frame(m.rename(str.upper, axis=1), p.rename(str.upper, axis=1))
    eq_frame(m.rename({"x": "z"}), p.rename({"x": "z"}))  # default axis=index
    eq_frame(m.rename(columns={"a": "b"}), p.rename(columns={"a": "b"}))


def test_transpose_roundtrip_typed_labels(spark):
    import os
    old = os.environ.get("MODIN_SPARK_NATIVE_MAX_ROWS")
    os.environ["MODIN_SPARK_NATIVE_MAX_ROWS"] = "0"  # force distributed
    try:
        p = pd.DataFrame({"a": [3.0, 1.0, 2.0], "b": [1.5, 2.5, 0.5]})
        m = mpd.DataFrame(p)
        eq_frame(m.T.T, p.T.T)  # int labels survive the round trip
        assert m.T.T.to_pandas().index.dtype.kind in "iu"
    finally:
        if old is None:
            os.environ.pop("MODIN_SPARK_NATIVE_MAX_ROWS", None)
        else:
            os.environ["MODIN_SPARK_NATIVE_MAX_ROWS"] = old


def test_rolling_step_and_unnamed_result():
    ps = pd.Series(np.arange(12, dtype=float))
    ms = mpd.Series(ps)
    eq_series(ms.rolling(3, step=2).sum(), ps.rolling(3, step=2).sum())
    assert ms.rolling(3, step=2).sum().name is None


def test_resample_agg_list_spec():
    ptf = pd.DataFrame({"v": np.arange(8, dtype=float), "w": np.arange(8) * 2.0},
                       index=pd.date_range("2024-01-01", periods=8, freq="45min"))
    mtf = mpd.DataFrame(ptf)
    eq_frame(mtf.resample("2h")["v"].agg(["sum", "mean"]),
             ptf.resample("2h")["v"].agg(["sum", "mean"]))
    eq_frame(mtf.resample("2h").agg({"v": "sum", "w": "max"}),
             ptf.resample("2h").agg({"v": "sum", "w": "max"}))


# -------------------------------------------------------- probe wave 49
def test_query_chained_comparisons():
    p = pd.DataFrame({"a": [1.0, 2.0, 3.0], "b": [4.0, 5.0, 6.0]})
    m = mpd.DataFrame(p)
    eq_frame(m.query("1 < a <= 3"), p.query("1 < a <= 3"))
    eq_frame(m.query("1 <= a < 3 and b > 4"), p.query("1 <= a < 3 and b > 4"))
    eq_frame(m.query("a in [1, 3]"), p.query("a in [1, 3]"))  # untouched


def test_isin_frame_operand():
    p = pd.DataFrame({"a": [1.0, 2.0, 3.0], "b": [4.0, 5.0, 6.0]})
    m = mpd.DataFrame(p)
    eq_frame(m.isin(m * 2), p.isin(p * 2))
    eq_frame(m.isin(p * 2), p.isin(p * 2))  # raw pandas operand


def test_string_mul_repeats():
    eq_series(mpd.Series(["ab", "c", None]) * 2, pd.Series(["ab", "c", None]) * 2)
    eq_series(3 * mpd.Series(["x"]), 3 * pd.Series(["x"]))
    # numeric mul unaffected
    eq_series(mpd.Series([2, 3]) * 2, pd.Series([2, 3]) * 2)


def test_repeat_per_row_counts():
    eq_series(mpd.Series(["x", "y", "z"]).repeat([1, 3, 0]).reset_index(drop=True),
              pd.Series(["x", "y", "z"]).repeat([1, 3, 0]).reset_index(drop=True))
