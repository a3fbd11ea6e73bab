"""Round-4 API-gap fills, differential vs pandas.

Covers: rank(axis=1, pct=True), Series.agg with callables / numpy reducers,
groupby.expanding() holistic tail (median/quantile/sem/skew/kurt),
DataFrame rolling.agg(list) with 2-level columns, and
interpolate(method='index'/'time').
"""

import numpy as np
import pandas as pd
import pytest

import modin_spark.pandas as mpd

_PDF = pd.DataFrame(
    {
        "k": ["a", "a", "b", "b", "a", "b"],
        "x": [1.0, None, 3.0, 4.0, 5.0, 6.0],
        "y": [2.0, 3.0, None, 1.0, 4.0, 2.0],
    }
)


@pytest.fixture()
def m(spark):
    return mpd.from_pandas(_PDF)


def test_rank_axis1_pct(m):
    got = m[["x", "y"]].rank(axis=1, pct=True).to_pandas().reset_index(drop=True)
    exp = _PDF[["x", "y"]].rank(axis=1, pct=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_series_agg_callable(m):
    s = m["x"]
    assert abs(s.agg(lambda v: v.max() - v.min()) - 5.0) < 1e-9
    assert abs(s.agg(np.mean) - _PDF.x.mean()) < 1e-9
    got = s.agg(["sum", "mean"]).astype(float)
    exp = _PDF.x.agg(["sum", "mean"]).astype(float)
    pd.testing.assert_series_equal(got, exp, check_names=False)


@pytest.mark.parametrize("agg", ["median", "sem", "skew", "kurt"])
def test_groupby_expanding_holistic(m, agg):
    got = getattr(m.groupby("k").expanding(), agg)().to_pandas().reset_index(drop=True)
    exp = (
        getattr(_PDF.groupby("k").expanding(), agg)(numeric_only=True)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.sort_index(axis=1), exp.sort_index(axis=1), check_dtype=False, atol=1e-9
    )


def test_groupby_expanding_quantile(m):
    got = m.groupby("k").expanding().quantile(0.25).to_pandas().reset_index(drop=True)
    exp = (
        _PDF.groupby("k")
        .expanding()
        .quantile(0.25, numeric_only=True)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.sort_index(axis=1), exp.sort_index(axis=1), check_dtype=False, atol=1e-9
    )


def test_rolling_agg_list_frame(m):
    got = m[["x", "y"]].rolling(2).agg(["sum", "mean"]).to_pandas().reset_index(drop=True)
    exp = _PDF[["x", "y"]].rolling(2).agg(["sum", "mean"])
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_interpolate_index(spark):
    p = pd.DataFrame({"ix": [0.0, 1.0, 5.0, 10.0], "v": [1.0, None, None, 10.0]})
    m2 = mpd.from_pandas(p).set_index("ix")
    got = m2.interpolate(method="index").to_pandas()
    exp = p.set_index("ix").interpolate(method="index")
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_interpolate_time(spark):
    p = pd.DataFrame(
        {"t": pd.date_range("2024-01-01", periods=5, freq="h"), "v": [1.0, None, None, 4.0, None]}
    )
    m2 = mpd.from_pandas(p).set_index("t")
    got = m2.interpolate(method="time").to_pandas()
    exp = p.set_index("t").interpolate(method="time")
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_corr_kendall(spark):
    """corr(method='kendall') — reference parity is a pandas default
    (ref aggregations.py:60); here a size-guarded driver fallback over an
    inlined exact tau-b kernel (no scipy in this environment)."""
    p = pd.DataFrame(
        {"x": [1.0, 2.0, 3.0, 5.0, 4.0], "y": [2.0, 1.0, 4.0, 3.0, 5.0], "z": [1.0, 1.0, 2.0, 2.0, 3.0]}
    )
    m = mpd.from_pandas(p)
    got = m.corr(method="kendall")
    # brute-force tau-b for the x,y pair: 7 concordant, 3 discordant, no ties
    assert abs(got.loc["x", "y"] - 0.4) < 1e-12
    assert abs(m.x.corr(m.y, method="kendall") - 0.4) < 1e-12
    # tie-corrected pair vs hand computation: z has ties
    import itertools

    def brute(a, b):
        con = dis = 0
        for i, j in itertools.combinations(range(len(a)), 2):
            s = (a[i] - a[j]) * (b[i] - b[j])
            con += s > 0
            dis += s < 0
        tot = len(a) * (len(a) - 1) // 2
        xt = sum(c * (c - 1) // 2 for c in pd.Series(a).value_counts())
        yt = sum(c * (c - 1) // 2 for c in pd.Series(b).value_counts())
        return (con - dis) / (np.sqrt(tot - xt) * np.sqrt(tot - yt))

    assert abs(got.loc["x", "z"] - brute(p.x.tolist(), p.z.tolist())) < 1e-12


def test_read_table_tsv(spark, tmp_path):
    """pandas read_table = TSV reader (was shadowed by the catalog-table
    reader of the same name); both routes must work."""
    p = pd.DataFrame({"a": [1, 2], "b": ["x", "y"]})
    f = str(tmp_path / "t.tsv")
    p.to_csv(f, sep="\t", index=False)
    got = mpd.read_table(f).to_pandas()
    pd.testing.assert_frame_equal(got, p, check_dtype=False)


def test_fillna_method_limit_inplace(spark):
    p = pd.DataFrame({"a": [5.0, None, None, 3.0, None], "b": [None, 2.0, None, None, 6.0]})
    m = mpd.from_pandas(p)
    for meth in ["ffill", "bfill"]:
        for lim in [None, 1]:
            got = m.fillna(method=meth, limit=lim).to_pandas().reset_index(drop=True)
            exp = p.fillna(method=meth, limit=lim)
            pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    m2 = mpd.from_pandas(p)
    assert m2.fillna(0, inplace=True) is None
    assert m2.to_pandas().isna().sum().sum() == 0


def test_dropna_axis1(spark):
    p = pd.DataFrame({"x": [1.0, None], "y": [1.0, 2.0], "z": [None, None]})
    m = mpd.from_pandas(p)
    got = m.dropna(axis=1).to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, p.dropna(axis=1), check_dtype=False)
    got_all = m.dropna(axis=1, how="all").to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(got_all, p.dropna(axis=1, how="all"), check_dtype=False)


def test_inplace_sort_dedup(spark):
    p = pd.DataFrame({"a": [3, 1, 2, 1], "b": list("wxyz")})
    m = mpd.from_pandas(p)
    assert m.sort_values("a", inplace=True) is None
    assert m.to_pandas().a.tolist() == [1, 1, 2, 3]
    m2 = mpd.from_pandas(p)
    assert m2.drop_duplicates(subset=["a"], inplace=True) is None
    assert len(m2) == 3


def test_value_counts_dropna_bins(spark):
    p = pd.DataFrame({"a": [1.0, 1.0, None, 2.0], "b": [1.0, 2.0, 3.0, 10.0]})
    m = mpd.from_pandas(p)
    assert m.value_counts(subset=["a"], dropna=False).sum() == 4
    assert m.value_counts(subset=["a"]).sum() == 3
    got = m["b"].value_counts(bins=3).to_pandas()
    exp = p["b"].value_counts(bins=3)
    assert sorted(got.tolist()) == sorted(exp.tolist())


@pytest.mark.parametrize("interp", ["lower", "higher", "nearest", "midpoint"])
def test_quantile_interpolation(spark, interp):
    p = pd.DataFrame({"b": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0], "c": [10.0, 30.0, 20.0, 50.0, 40.0, 60.0]})
    m = mpd.from_pandas(p)
    got = m.quantile([0.25, 0.4, 0.75], interpolation=interp)
    exp = p.quantile([0.25, 0.4, 0.75], interpolation=interp)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_pivot_table_margins_fill(spark):
    p = pd.DataFrame({"g": list("xxyyzz"), "c": ["a", "b", "a", "b", "a", "b"],
                      "v": [1.0, 2.0, 3.0, 4.0, 5.0, None]})
    m = mpd.from_pandas(p)
    got = m.pivot_table(values="v", index="g", columns="c", aggfunc="sum",
                        margins=True, fill_value=0).to_pandas().sort_index().astype(float)
    exp = p.pivot_table(values="v", index="g", columns="c", aggfunc="sum",
                        margins=True, fill_value=0).sort_index().astype(float)
    exp.index = [str(i) for i in exp.index]
    exp.columns = list(exp.columns)
    pd.testing.assert_frame_equal(got, exp, check_names=False)


def test_melt_mixed_types(spark):
    p = pd.DataFrame({"a": [1.0, 2.0], "k": ["x", "y"]})
    m = mpd.from_pandas(p)
    got = m.melt().to_pandas()
    exp = p.melt()
    assert len(got) == len(exp)
    assert sorted(got["variable"].tolist()) == sorted(exp["variable"].tolist())
    assert sorted(map(str, got["value"].tolist())) == sorted(map(str, exp["value"].tolist()))


def test_series_kwargs_batch(spark):
    ps = pd.Series([5.0, None, None, 3.0, None, 1.0], name="v")
    m = mpd.from_pandas(ps.to_frame()).v
    for lim in [None, 1]:
        got = m.ffill(limit=lim).to_pandas().reset_index(drop=True)
        pd.testing.assert_series_equal(got, ps.ffill(limit=lim), check_names=False)
        got = m.bfill(limit=lim).to_pandas().reset_index(drop=True)
        pd.testing.assert_series_equal(got, ps.bfill(limit=lim), check_names=False)

    s2 = pd.Series([3.0, 1.0, 2.0], name="v")
    m2 = mpd.from_pandas(s2.to_frame()).v
    assert m2.sort_values(key=lambda s: -s).to_pandas().tolist() == [3.0, 2.0, 1.0]
    for interp in ["lower", "higher", "nearest", "midpoint"]:
        assert abs(m2.quantile(0.4, interpolation=interp) - s2.quantile(0.4, interpolation=interp)) < 1e-12

    s3 = pd.Series([1.0, 2.0, 2.0, 3.0], name="v")
    m3 = mpd.from_pandas(s3.to_frame()).v
    assert sorted(m3.nlargest(2, keep="all").to_pandas().tolist()) == sorted(s3.nlargest(2, keep="all").tolist())

    s4 = pd.Series(["a", None, "b"], name="v")
    m4 = mpd.from_pandas(s4.to_frame()).v
    got = m4.map(lambda x: str(x).upper(), na_action="ignore").to_pandas().tolist()
    assert got == s4.map(lambda x: str(x).upper(), na_action="ignore").tolist()


def test_groupby_ewm(spark):
    p = pd.DataFrame({"k": list("xxyyxy"), "v": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]})
    m = mpd.from_pandas(p)
    got = m.groupby("k").ewm(alpha=0.5).mean().to_pandas()
    exp = p.groupby("k").ewm(alpha=0.5).mean().reset_index(drop=True)
    assert np.allclose(sorted(got["v"]), sorted(exp["v"]))
    got = m.groupby("k").ewm(span=3).std().to_pandas()
    exp = p.groupby("k").ewm(span=3).std().reset_index(drop=True)
    assert np.allclose(sorted(got["v"].dropna()), sorted(exp["v"].dropna()))


@pytest.mark.parametrize("na", ["top", "bottom"])
def test_rank_na_option(spark, na):
    ps = pd.Series([3.0, None, 1.0, 2.0, None], name="v")
    m = mpd.from_pandas(ps.to_frame()).v
    for asc in [True, False]:
        for meth in ["average", "min", "max", "first"]:
            got = m.rank(method=meth, ascending=asc, na_option=na).to_pandas().reset_index(drop=True)
            exp = ps.rank(method=meth, ascending=asc, na_option=na)
            pd.testing.assert_series_equal(got, exp, check_names=False)


def test_columns_axis_level_ops(spark):
    """droplevel/swaplevel on the columns axis are pure metadata relabels
    (droplevel(axis=1) previously silently no-opped)."""
    p = pd.DataFrame({"k": list("xxyy"), "a": [1.0, 2.0, 3.0, 4.0], "b": [5.0, 6.0, 7.0, 8.0]})
    m = mpd.from_pandas(p)
    g = m.groupby("k").agg(["sum", "mean"])
    assert list(g.droplevel(1, axis=1).to_pandas().columns) == ["a", "a", "b", "b"]
    assert list(g.swaplevel(axis=1).to_pandas().columns) == [
        ("sum", "a"), ("mean", "a"), ("sum", "b"), ("mean", "b")]


def test_columns_axis_sort_xs_rename(spark):
    p = pd.DataFrame({"k": list("xxyy"), "a": [1.0, 2.0, 3.0, 4.0], "b": [5.0, 6.0, 7.0, 8.0]})
    m = mpd.from_pandas(p)
    g = m.groupby("k").agg(["sum", "mean"])
    gp = p.groupby("k").agg(["sum", "mean"])
    assert list(g.sort_index(axis=1).to_pandas().columns) == list(gp.sort_index(axis=1).columns)
    assert list(g.xs("sum", axis=1, level=1).to_pandas().columns) == list(gp.xs("sum", axis=1, level=1).columns)
    assert list(g.rename(columns={"a": "A"}).to_pandas().columns) == list(gp.rename(columns={"a": "A"}).columns)
    assert list(m[["b", "a"]].sort_index(axis=1).to_pandas().columns) == ["a", "b"]


def test_index_level_kwargs(spark):
    p = pd.DataFrame({"k": ["x", "x", "y", "z"], "a": [1.0, 2.0, None, 4.0], "b": [5, 6, 7, 8]})
    m = mpd.from_pandas(p)
    got = m.set_index("k").set_index("b", append=True).to_pandas()
    pd.testing.assert_frame_equal(got, p.set_index("k").set_index("b", append=True), check_dtype=False)
    got = m.set_index(["k", "b"]).reset_index(level=0).to_pandas()
    pd.testing.assert_frame_equal(got, p.set_index(["k", "b"]).reset_index(level=0), check_dtype=False)
    assert int(m["a"].nunique(dropna=False)) == p.a.nunique(dropna=False)
    assert m.count(axis=1).to_pandas().tolist() == p.count(axis=1).tolist()


def test_str_edge_kwargs(spark):
    """split(n=)/rsplit(n=) split-count semantics (Spark limit = n+1),
    contains(na=), slice(step=) incl. negative start."""
    p = pd.DataFrame({"s": ["a_b", "c_d_e", None, "f", "abcdefg"]})
    m = mpd.from_pandas(p)

    def norm(lst):
        return [list(x) if x is not None and not isinstance(x, float) else None for x in lst]

    assert norm(m.s.str.split("_", n=1).to_pandas()) == norm(p.s.str.split("_", n=1))
    assert norm(m.s.str.rsplit("_", n=1).to_pandas()) == norm(p.s.str.rsplit("_", n=1))
    assert m.s.str.contains("A_", case=False, na=False).to_pandas().tolist() == \
        p.s.str.contains("A_", case=False, na=False).tolist()
    for args in [(0, 6, 2), (-4, None, 2), (1, None, 3)]:
        got = m.s.str.slice(*args).to_pandas().tolist()
        exp = [e if isinstance(e, str) else None for e in p.s.str.slice(*args)]
        assert got == exp, (args, got, exp)


def test_bool_series_numeric_reduce(spark):
    """pandas numeric-aggregates booleans as 0/1 — Spark refuses sum(bool),
    so the reduce path casts."""
    p = pd.Series([True, False, True, None], name="v")
    m = mpd.from_pandas(p.to_frame()).v
    assert int(m.sum()) == 2
    assert abs(float(m.mean()) - p.mean()) < 1e-12


def test_resample_closed_label_offset(spark):
    idx = pd.date_range("2024-01-01", periods=20, freq="45min")
    p = pd.DataFrame({"t": idx, "v": np.arange(20.0)})
    m = mpd.from_pandas(p).set_index("t")
    pp = p.set_index("t")
    for kw in [{"closed": "right"}, {"label": "right"}, {"offset": "30min"},
               {"closed": "right", "label": "right"}]:
        got = m.resample("2h", **kw).sum().to_pandas().sort_index()
        exp = pp.resample("2h", **kw).sum()
        # spark emits only observed buckets; every emitted bucket must match
        pd.testing.assert_frame_equal(
            got, exp[exp.index.isin(got.index)], check_dtype=False, check_freq=False)


def test_groupby_attr_and_reset_index_naming(spark):
    p = pd.DataFrame({"v": np.arange(6.0), "k": ["a", "b"] * 3})
    m = mpd.from_pandas(p)
    got = m.groupby("k").v.sum().reset_index().to_pandas()
    pd.testing.assert_frame_equal(got, p.groupby("k").v.sum().reset_index(), check_dtype=False)


def test_bool_frame_reduce_and_row_anyall(spark):
    p = pd.DataFrame({"v": np.arange(6.0)})
    m = mpd.from_pandas(p)
    assert int((m[["v"]] > 2).sum()["v"]) == 3
    assert (m[["v"]] > 2).any(axis=1).to_pandas().tolist() == (p[["v"]] > 2).any(axis=1).tolist()
    assert (m[["v"]] > 2).all(axis=1).to_pandas().tolist() == (p[["v"]] > 2).all(axis=1).tolist()


def test_resample_column_selection(spark):
    idx = pd.date_range("2024-01-01", periods=12, freq="30min")
    p = pd.DataFrame({"t": idx, "v": np.arange(12.0), "w": np.arange(12.0) * 2})
    m = mpd.from_pandas(p).set_index("t")
    got = m.resample("2h").v.sum().to_pandas()
    exp = p.set_index("t").resample("2h").v.sum()
    assert sorted(got.tolist()) == sorted(exp.tolist())
    got2 = m.resample("2h")[["v", "w"]].mean().to_pandas().sort_index()
    exp2 = p.set_index("t").resample("2h")[["v", "w"]].mean()
    pd.testing.assert_frame_equal(got2, exp2, check_dtype=False, check_freq=False)


def test_mode_ties(spark):
    p = pd.DataFrame({"k": ["u", "u", "v", "v"], "a": [1.0, 1.0, 2.0, None]})
    m = mpd.from_pandas(p)
    pd.testing.assert_frame_equal(m[["k"]].mode().to_pandas(), p[["k"]].mode())
    got, exp = m.mode().to_pandas(), p.mode()
    pd.testing.assert_frame_equal(got.astype(object).where(got.notna(), None),
                                  exp.astype(object).where(exp.notna(), None))


def test_rename_multiindex_tuple_and_level(spark):
    p = pd.DataFrame({"k": list("xxyy"), "a": [1.0, 2.0, 3.0, 4.0]})
    m = mpd.from_pandas(p)
    g = m.groupby("k").agg(["sum", "mean"])
    # per-level value mapping (pandas semantics)
    gp = p.groupby("k").agg(["sum", "mean"])
    assert list(g.rename(columns={"a": "A"}).to_pandas().columns) == \
        list(gp.rename(columns={"a": "A"}).columns)
    # whole-tuple rename flattens (engine extension used by entry queries)
    flat = g.rename(columns={("a", "sum"): "s", ("a", "mean"): "m"})
    assert list(flat.to_pandas().columns) == ["s", "m"]


def test_groupby_size_noindex_and_min_count(spark):
    p = pd.DataFrame({"a": [3.0, None, 1.0, 2.0], "k": ["u", "u", "v", "v"]})
    m = mpd.from_pandas(p)
    got = m.groupby("k", as_index=False).size().to_pandas()
    pd.testing.assert_frame_equal(got, p.groupby("k", as_index=False).size(), check_dtype=False)
    got = m.groupby("k").a.sum(min_count=2).to_pandas().sort_values().reset_index(drop=True)
    exp = p.groupby("k").a.sum(min_count=2).sort_values().reset_index(drop=True)
    pd.testing.assert_series_equal(got, exp, check_dtype=False, check_names=False)


def test_pivot_float_keys_and_crosstab_margins(spark):
    L = pd.DataFrame({"t": [1.0, 2.0, 5.0, 9.0], "k": ["a", "a", "b", "b"], "lv": [10, 20, 30, 40]})
    m = mpd.from_pandas(L)
    got = m.pivot_table(values="lv", index=["k"], columns="t", aggfunc="sum").to_pandas().sort_index()
    exp = L.pivot_table(values="lv", index=["k"], columns="t", aggfunc="sum").sort_index()
    # r9: pivot keys stay TYPED (float labels, not '1.0' strings) — pandas exact
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, check_names=False)

    C = pd.DataFrame({"k": ["a", "a", "b", "b", "a"], "c": ["x", "y", "x", "x", "y"]})
    mc = mpd.from_pandas(C)
    got = mpd.crosstab(mc.k, mc.c, margins=True).to_pandas().sort_index()
    exp = pd.crosstab(C.k, C.c, margins=True).sort_index()
    assert got.values.tolist() == exp.values.tolist()
    got = mpd.crosstab(mc.k, mc.c, normalize=True).to_pandas().sort_index()
    exp = pd.crosstab(C.k, C.c, normalize=True).sort_index()
    assert np.allclose(got.values, exp.values)


def test_merge_asof_shared_column_suffixes(spark):
    L = pd.DataFrame({"t": [1.0, 2.0, 5.0, 9.0], "k": ["a", "a", "b", "b"], "lv": [10, 20, 30, 40]})
    R = pd.DataFrame({"t": [1.5, 4.0, 8.0], "k": ["a", "b", "b"], "rv": [1, 2, 3]})
    got = mpd.merge_asof(mpd.from_pandas(L), mpd.from_pandas(R), on="t",
                         direction="forward").to_pandas().reset_index(drop=True)
    exp = pd.merge_asof(L, R, on="t", direction="forward")
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_read_csv_kwargs(spark, tmp_path):
    """usecols/nrows/skiprows/parse_dates/index_col/dtype/sep-sniffing were
    silently swallowed by **kw."""
    p = pd.DataFrame({"a": [1, 2, 3, 4], "b": ["x", "y", "", "w"],
                      "t": pd.date_range("2024-01-01", periods=4)})
    f = str(tmp_path / "t.csv")
    p.to_csv(f, index=False)
    assert list(mpd.read_csv(f, usecols=["a", "b"]).columns) == ["a", "b"]
    assert len(mpd.read_csv(f, nrows=2)) == 2
    assert mpd.read_csv(f, skiprows=2, names=["a", "b", "t"]).to_pandas().a.tolist() == [2, 3, 4]
    assert len(mpd.read_csv(f, skiprows=1, header=None)) == len(pd.read_csv(f, skiprows=1, header=None))
    assert str(mpd.read_csv(f, parse_dates=["t"]).dtypes["t"]).startswith("datetime")
    assert mpd.read_csv(f, index_col="a").to_pandas().index.name == "a"
    assert str(mpd.read_csv(f, dtype={"a": "float"}).dtypes["a"]).startswith("float")
    assert len(mpd.read_csv(f, sep=None)) == 4


def test_iloc_order_negatives_and_loc_setitem(spark):
    p = pd.DataFrame({"a": [1.0, 2.0, 3.0, 4.0], "b": list("wxyz")})
    m = mpd.from_pandas(p)
    # request-order and negative positions
    assert m.iloc[[2, 0]].to_pandas().a.tolist() == p.iloc[[2, 0]].a.tolist()
    assert m.iloc[[-1, 0]].to_pandas().a.tolist() == p.iloc[[-1, 0]].a.tolist()
    # negative slices
    assert m.iloc[-2:].to_pandas().a.tolist() == p.iloc[-2:].a.tolist()
    assert m.iloc[:-1].to_pandas().a.tolist() == p.iloc[:-1].a.tolist()
    # the masked-update idiom
    m2 = mpd.from_pandas(p)
    m2.loc[m2.a > 2, "a"] = 0.0
    p2 = p.copy()
    p2.loc[p2.a > 2, "a"] = 0.0
    assert m2.to_pandas().a.tolist() == p2.a.tolist()


def test_divmod_and_str_wrap(spark):
    s = pd.Series([7.0, None, 3.0], name="v")
    m = mpd.from_pandas(s.to_frame()).v
    q, r = divmod(m, 2)
    eq, er = divmod(s, 2)
    pd.testing.assert_series_equal(q.to_pandas().reset_index(drop=True), eq,
                                   check_dtype=False, check_names=False)
    pd.testing.assert_series_equal(r.to_pandas().reset_index(drop=True), er,
                                   check_dtype=False, check_names=False)
    w = mpd.from_pandas(pd.Series(["a b c d e"], name="v").to_frame()).v
    assert w.str.wrap(3).to_pandas().tolist() == pd.Series(["a b c d e"]).str.wrap(3).tolist()


def test_grouped_rank_nulls_pct_change_pad(spark):
    p = pd.DataFrame({"k": ["u", "u", "v", "v", "u"], "x": [1.0, None, 3.0, 4.0, 5.0]})
    m = mpd.from_pandas(p)
    for meth in ["dense", "min", "first", "average"]:
        got = m.groupby("k").x.rank(method=meth).to_pandas().tolist()
        exp = p.groupby("k").x.rank(method=meth).tolist()
        assert all((np.isnan(g) and np.isnan(e)) or g == e for g, e in zip(got, exp)), meth
    got = m.groupby("k").x.pct_change().to_pandas().tolist()
    exp = p.groupby("k").x.pct_change().tolist()
    assert all((np.isnan(g) and np.isnan(e)) or abs(g - e) < 1e-12 for g, e in zip(got, exp))
    # rolling attribute narrowing
    p2 = p.assign(i=[1, 2, 3, 4, 5])
    m2 = mpd.from_pandas(p2)
    got = m2.rolling(2, on="i").x.sum().to_pandas().reset_index(drop=True)
    exp = p2.rolling(2, on="i").x.sum().reset_index(drop=True)
    pd.testing.assert_series_equal(got, exp, check_dtype=False, check_names=False)


def test_pct_change_pads_missing(spark):
    s = pd.Series([1.0, None, 3.0, None, 6.0], name="v")
    m = mpd.from_pandas(s.to_frame()).v
    for per in [1, 2]:
        got = m.pct_change(per).to_pandas().tolist()
        exp = s.pct_change(per).tolist()
        assert all((np.isnan(g) and np.isnan(e)) or abs(g - e) < 1e-12
                   for g, e in zip(got, exp)), per


def test_dt_isocalendar(spark):
    p = pd.DataFrame({"t": pd.to_datetime(["2024-01-01", "2023-12-31", "2024-02-29", "2021-01-03"])})
    m = mpd.from_pandas(p)
    got = m.t.dt.isocalendar().to_pandas().reset_index(drop=True)
    exp = p.t.dt.isocalendar().astype("int64").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_binary_series_axis0_unrelated_lineage(spark):
    a = pd.DataFrame({"x": [1.0, None, 3.0], "y": [4.0, 5.0, 6.0]})
    ma = mpd.from_pandas(a)
    s = mpd.from_pandas(pd.DataFrame({"s": [1.0, 2.0, 3.0]})).s
    got = ma.mul(s, axis=0).to_pandas().reset_index(drop=True)
    exp = a.mul(pd.Series([1.0, 2.0, 3.0]), axis=0)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_describe_object_and_include_all(spark):
    p = pd.DataFrame({"s": ["apple", "Banana", None, "apple"], "v": [1.0, 2.0, 3.0, 4.0]})
    m = mpd.from_pandas(p)
    pd.testing.assert_frame_equal(m[["s"]].describe(), p[["s"]].describe(), check_dtype=False)
    got, exp = m.describe(include="all"), p.describe(include="all")
    assert got.shape == exp.shape and list(got.index) == list(exp.index)
    pd.testing.assert_frame_equal(m.describe(), p.describe(), check_dtype=False)


def test_empty_frame_construction(spark):
    """Empty pandas frames build with an explicit schema (Spark can't infer
    from zero rows)."""
    empty = pd.DataFrame({"a": pd.Series([], dtype="float64")})
    me = mpd.from_pandas(empty)
    assert len(me) == 0
    v = me.a.mean()
    assert v is None or (isinstance(v, float) and np.isnan(v))
    eg = mpd.from_pandas(pd.DataFrame({"k": pd.Series([], dtype="object"),
                                       "v": pd.Series([], dtype="float64")}))
    assert len(eg.groupby("k").sum()) == 0
    assert len(mpd.concat([me, mpd.from_pandas(pd.DataFrame({"a": [1.0]}))])) == 1


def test_str_sweep_fixes(spark):
    """title (boundary after any non-letter), swapcase, rfind miss=-1,
    center extra-pad-left, zfill no-truncate, translate 1:1 maps,
    pad(side='both')."""
    s = pd.Series(["Hello World", "  spam ", None, "a_b-c", "123", "", "ümlaut"], name="v")
    m = mpd.from_pandas(s.to_frame()).v
    for name, kw in [("title", {}), ("swapcase", {}), ("rfind", {"sub": "o"}),
                     ("center", {"width": 15}), ("zfill", {"width": 8}),
                     ("translate", {"table": {108: 76}}),
                     ("pad", {"width": 15, "side": "both"})]:
        got = getattr(m.str, name)(**kw).to_pandas().tolist()
        exp = getattr(s.str, name)(**kw).tolist()
        for g, e in zip(got, exp):
            assert (g == e) or (pd.isna(g) and pd.isna(e)), (name, got, exp)


def test_dt_nat_predicates_and_time_micros(spark):
    s = pd.Series(pd.to_datetime(
        ["2024-02-29 13:45:56.123456", "2023-01-01 00:00:00.000001",
         "2024-12-31 23:59:59.500000", None, "2021-07-04 12:00:00.000000"],
        format="mixed"), name="t")
    m = mpd.from_pandas(s.to_frame()).t
    for name in ["is_month_start", "is_month_end", "is_quarter_start", "is_quarter_end",
                 "is_year_start", "is_year_end", "is_leap_year", "time"]:
        got = getattr(m.dt, name).to_pandas().tolist()
        exp = getattr(s.dt, name).tolist()
        for g, e in zip(got, exp):
            assert (str(g) == str(e)) or (pd.isna(g) and pd.isna(e)), name


def test_rolling_count_min_periods_gate(spark):
    """pandas gates rolling.count on window ROW coverage, not non-null
    observations (count itself is the observation for count)."""
    s = pd.Series([1.0, np.nan, 3.0, 4.0, np.nan, 6.0], name="v")
    m = mpd.from_pandas(s.to_frame()).v
    for mp in [None, 2]:
        got = m.rolling(5, min_periods=mp).count().to_pandas().reset_index(drop=True)
        exp = s.rolling(5, min_periods=mp).count()
        pd.testing.assert_series_equal(got, exp, check_dtype=False, check_names=False)


def test_expanding_count_min_periods_gate(spark):
    s = pd.Series([1.0, np.nan, 3.0], name="v")
    m = mpd.from_pandas(s.to_frame()).v
    for mp in [1, 3]:
        got = m.expanding(mp).count().to_pandas().reset_index(drop=True)
        exp = s.expanding(mp).count()
        pd.testing.assert_series_equal(got, exp, check_dtype=False, check_names=False)
