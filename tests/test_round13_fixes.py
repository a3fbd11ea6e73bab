"""Round-13 fixes: VERDICT r12 punch list, differential vs pandas
(reference test model: modin's test_series suite)."""
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


# ------------------------------------------------------------- VERDICT #1
def test_add_does_not_poison_native_frames(monkeypatch):
    """spark_type probes inside dunders must not force JVM ingestion of a
    pristine deferred-native frame (that killed the duplicate-label
    positional fast path in _combine)."""
    monkeypatch.setenv("MODIN_SPARK_NATIVE_MAX_ROWS", "5000")
    s1 = mpd.Series([1, 2, 3], index=["a", "a", "b"])
    s2 = mpd.Series([10, 20, 30], index=["a", "a", "b"])
    assert s1._frame._sdf is None and s2._frame._sdf is None
    r = s1 + s2
    # the probe and the add itself leave both operands pristine
    assert s1._frame._sdf is None and s2._frame._sdf is None
    eq_series(r, pd.Series([11, 22, 33], index=["a", "a", "b"]))
    # string + string concatenates without materializing either side
    t1 = mpd.Series(["x", "y"])
    t2 = mpd.Series(["1", "2"])
    r2 = t1 + t2
    assert t1._frame._sdf is None and t2._frame._sdf is None
    eq_series(r2, pd.Series(["x1", "y2"]))
    # dtype / spark_type probes are themselves non-poisoning, including on
    # a DERIVED expression over a pristine frame
    s3 = mpd.Series([1.5, 2.5])
    assert s3.dtype.kind == "f"
    assert s3._frame._sdf is None
    d = (s3 * 2).dtype
    assert d.kind == "f" and s3._frame._sdf is None


def test_first_frame_of_process_is_deferred(monkeypatch):
    """from_pandas defers even when it is what spins the session up — the
    gate that eagerly ingested the first frame of a process is gone."""
    monkeypatch.setenv("MODIN_SPARK_NATIVE_MAX_ROWS", "5000")
    s = mpd.Series([1, 2, 3], index=["a", "a", "b"])
    assert s._frame._sdf is None and s._native_col == 0


def test_all_binaries_duplicate_label_positional(monkeypatch):
    monkeypatch.setenv("MODIN_SPARK_NATIVE_MAX_ROWS", "5000")
    import operator as op

    for f in (op.add, op.sub, op.mul, op.truediv, op.floordiv, op.mod, op.pow):
        pa = pd.Series([1.0, 2.0, 3.0], index=["a", "a", "b"])
        pb = pd.Series([10.0, 20.0, 30.0], index=["a", "a", "b"])
        eq_series(f(mpd.Series(pa), mpd.Series(pb)), f(pa, pb))


# ------------------------------------------------------------- VERDICT #6
def test_plot_accessor_presence():
    """df.plot / Series.plot delegate to pandas' PlotAccessor on driver-side
    data (reference parity: modin default-to-pandas plotting). matplotlib is
    not installed here, so assert the accessor exists and is the pandas one
    (rendering would require a backend at call time, exactly like pandas)."""
    from pandas.plotting import PlotAccessor

    df = mpd.DataFrame({"a": [1, 2, 3], "b": [3, 2, 1]})
    assert isinstance(df.plot, PlotAccessor)
    assert isinstance(df["a"].plot, PlotAccessor)
    assert callable(df.hist) and callable(df.boxplot)
    # module-level pandas.plotting passthrough
    assert hasattr(mpd.plotting, "scatter_matrix")


# ------------------------------------------------------------- VERDICT #8
def test_comparison_operators_raise_on_different_labels(monkeypatch):
    monkeypatch.setenv("MODIN_SPARK_NATIVE_MAX_ROWS", "5000")
    s1 = mpd.Series([1, 2, 3], index=["a", "b", "c"])
    s2 = mpd.Series([1, 2, 3], index=["a", "b", "z"])
    with pytest.raises(ValueError, match="identically-labeled"):
        s1 == s2
    with pytest.raises(ValueError, match="identically-labeled"):
        s1 < s2
    # identical labels still compare fine
    s3 = mpd.Series([1, 9, 3], index=["a", "b", "c"])
    eq_series(s1 == s3, pd.Series([True, False, True], index=["a", "b", "c"]))
    # flex methods ALIGN (pandas contract: .eq never raises on labels)
    got = s1.eq(s2)
    assert len(got.to_pandas()) == 4


# -------------------------------------------------- exact expanding rank
def test_expanding_rank_distributed_exact():
    """expanding().rank() rides the value-bucket × pos-block exact path
    (core.windows.expanding_rank) — differential vs pandas across methods,
    direction, pct, NaNs, ties."""
    rng = np.random.default_rng(3)
    x = np.round(rng.normal(50, 5, 4000), 1)
    x[rng.random(4000) < 0.04] = np.nan
    pdf = pd.DataFrame({"a": x, "b": rng.integers(0, 9, 4000).astype(float)})
    mdf = mpd.DataFrame(pdf)
    for method in ("average", "min", "max"):
        e = pdf["a"].expanding(2).rank(method=method)
        g = mdf["a"].expanding(2).rank(method=method)
        eq_series(g, e)
    eq_series(mdf["b"].expanding(1).rank(ascending=False, pct=True),
              pdf["b"].expanding(1).rank(ascending=False, pct=True))
    # frame form: both numeric columns in one call
    ef = pdf.expanding(3).rank()
    gf = mdf.expanding(3).rank().to_pandas()
    pd.testing.assert_frame_equal(gf, ef, check_dtype=False)


def test_expanding_quantile_distributed_exact():
    """expanding().median()/quantile() ride the distributed selection path
    (core.windows.expanding_quantile) — NaN rows still report the running
    prefix quantile (pandas), all interpolations, min_periods gate."""
    rng = np.random.default_rng(7)
    x = np.round(rng.normal(10, 2, 3000), 2)
    x[rng.random(3000) < 0.04] = np.nan
    x[0] = np.nan
    pdf = pd.DataFrame({"a": x})
    mdf = mpd.DataFrame(pdf)
    eq_series(mdf["a"].expanding(2).median(), pdf["a"].expanding(2).median())
    for q, interp in ((0.25, "linear"), (0.9, "lower"), (0.5, "midpoint"),
                      (0.35, "nearest"), (0.75, "higher")):
        e = pdf["a"].expanding(3).quantile(q, interpolation=interp)
        g = mdf["a"].expanding(3).quantile(q, interpolation=interp)
        eq_series(g, e)
    # frame form
    pdf2 = pd.DataFrame({"a": x[:500], "b": rng.integers(0, 40, 500).astype(float)})
    mdf2 = mpd.DataFrame(pdf2)
    pd.testing.assert_frame_equal(mdf2.expanding(2).median().to_pandas(),
                                  pdf2.expanding(2).median(), check_dtype=False)


# --------------------------------------------- branch-deterministic positions
def test_global_position_no_row_loss_at_scale():
    """with_global_position must key its offsets join on a DETERMINISTIC
    bucket of the stored ORDER value: spark_partition_id over an N-less
    range shuffle gets AQE-coalesced differently per branch and the inner
    join then silently drops rows (reproduced at 300k rows pre-fix)."""
    n = 300_000
    pdf = pd.DataFrame({"x": np.arange(n, dtype="float64")})
    mdf = mpd.DataFrame(pdf)
    fr = mdf["x"]._to_frame("x").ensure_order().with_global_position("__pos__")
    lp = fr.sdf.toPandas()
    assert len(lp) == n
    assert sorted(lp["__pos__"].tolist()) == list(range(n))


def test_rank_no_row_loss_local_relation():
    """df.rank's partition-prefix-sum scheme must survive a local-relation
    source at multi-batch size (the AQE pid-mismatch trigger)."""
    n = 300_000
    rng = np.random.default_rng(1)
    pdf = pd.DataFrame({"a": rng.integers(0, 1000, n).astype(float)})
    mdf = mpd.DataFrame(pdf)
    got = mdf["a"].rank(method="min").to_pandas()
    exp = pdf["a"].rank(method="min")
    assert len(got) == n
    assert np.allclose(got.values, exp.values)


def test_asof_no_stale_matches_at_scale():
    """merge_asof (no by) block ids must be a deterministic function of the
    key — range-shuffle pids re-sample boundaries per plan branch and rows
    near block edges then read a misaligned carry (observed: ~5 stale
    matches per boundary at 300k rows pre-fix)."""
    rng = np.random.default_rng(2)
    n = 120_000
    l = pd.DataFrame({"t": np.sort(rng.integers(0, 10**9, n)), "v": rng.normal(size=n)})
    r = pd.DataFrame({"t": np.sort(rng.integers(0, 10**9, n // 10)), "w": rng.normal(size=n // 10)})
    ml, mr = mpd.DataFrame(l), mpd.DataFrame(r)
    for d in ("backward", "forward"):
        g = mpd.merge_asof(ml, mr, on="t", direction=d).to_pandas()
        e = pd.merge_asof(l, r, on="t", direction=d)
        assert len(g) == len(e)
        assert np.allclose(g["w"].fillna(-9).values, e["w"].fillna(-9).values)


def test_string_rank_deterministic_bucket():
    """String rank/ngroup ride the byte-prefix deterministic bucket (no
    range-shuffle pid dependence); heavy shared prefixes exercise the
    common-prefix hot-bucket path."""
    rng = np.random.default_rng(6)
    words = ["apple", "banana", "cherry", "date", "elder", "fig", "grape", "kiwi"]
    ss = [words[i] + str(j) for i, j in
          zip(rng.integers(0, 8, 50_000), rng.integers(0, 1000, 50_000))]
    pdf = pd.DataFrame({"s": ss})
    mdf = mpd.DataFrame(pdf)
    eq_series(mdf["s"].rank(method="min"), pdf["s"].rank(method="min"))
    eq_series(mdf["s"].rank(method="dense", ascending=False),
              pdf["s"].rank(method="dense", ascending=False))


def test_frame_comparison_operator_label_check(monkeypatch):
    monkeypatch.setenv("MODIN_SPARK_NATIVE_MAX_ROWS", "5000")
    p1 = pd.DataFrame({"a": [1, 2], "b": [3, 4]})
    p2 = pd.DataFrame({"a": [1, 9], "c": [3, 4]})
    m1, m2 = mpd.DataFrame(p1), mpd.DataFrame(p2)
    with pytest.raises(ValueError, match="identically-labeled"):
        m1 == m2
    with pytest.raises(ValueError, match="identically-labeled"):
        m1 < m2
    # flex methods align (pandas contract)
    assert m1.eq(m2).to_pandas().shape == (2, 3)
    # identical labels compare fine
    p3 = pd.DataFrame({"a": [1, 9], "b": [3, 0]})
    got = (m1 == mpd.DataFrame(p3)).to_pandas()
    pd.testing.assert_frame_equal(got, p1 == p3, check_dtype=False)


def test_scalar_comparison_type_rules():
    s = mpd.Series([1, 2, 3])
    with pytest.raises(TypeError):
        s < "x"
    with pytest.raises(TypeError):
        s.ge("x")
    eq_series(s == "1", pd.Series([False] * 3))
    eq_series(s != "1", pd.Series([True] * 3))
    # datetimes keep pandas' parse-the-string behavior
    d = pd.Series(pd.to_datetime(["2020-01-01", "2021-06-01"]))
    eq_series(mpd.Series(d) > "2020-06-01", d > "2020-06-01")


def test_expanding_order_stat_name_preserved():
    """rank/quantile/median results keep the source series name (None
    included) — the 1-col frame round trip must not leak the positional
    placeholder label."""
    s = pd.Series([3.0, 1.0, 2.0, np.nan])
    m = mpd.Series(s)
    pd.testing.assert_series_equal(m.expanding(1).rank().to_pandas(),
                                   s.expanding(1).rank(), check_dtype=False)
    pd.testing.assert_series_equal(m.expanding(2).median().to_pandas(),
                                   s.expanding(2).median(), check_dtype=False)
    nm = pd.Series([2.0, 1.0], name="zz")
    assert mpd.Series(nm).expanding(1).rank().to_pandas().name == "zz"


def test_expanding_rank_window_float64_contract():
    """pandas WINDOW rank runs on float64: int64 beyond 2^53 tie in
    expanding().rank() (unlike Series.rank, which stays dtype-exact) —
    the distributed kernel must match the window contract, not be
    stricter than pandas."""
    base = 1 << 55
    s = pd.Series(np.array([base, base + 1, base], dtype="int64"))
    m = mpd.Series(s)
    eq_series(m.expanding(1).rank(), s.expanding(1).rank())
    # Series.rank (non-window) distinguishes them exactly
    eq_series(m.rank(), s.rank())


def test_frame_boolean_mask_getitem():
    """df[bool_frame] masks ELEMENTWISE (== df.where) — the key previously
    fell into label matching, where `label == frame` is truthy, and the
    whole frame came back unmasked."""
    p = pd.DataFrame({"a": [1, 2, 3], "b": [4.0, 5.0, 6.0]}, index=list("xyz"))
    m = mpd.DataFrame(p)
    pd.testing.assert_frame_equal((m[m > 2]).to_pandas(), p[p > 2], check_dtype=False)
    pd.testing.assert_frame_equal((m[p > 2]).to_pandas(), p[p > 2], check_dtype=False)


def test_xs_scalar_returns_row_series():
    p = pd.DataFrame({"a": [1, 2, 3], "b": [4.0, 5.0, 6.0]}, index=list("xyz"))
    m = mpd.DataFrame(p)
    g = m.xs("y")
    g = g.to_pandas() if hasattr(g, "to_pandas") else g
    pd.testing.assert_series_equal(g, p.xs("y"), check_dtype=False)
    # MultiIndex partial key keeps the frame form
    pm = pd.DataFrame({"v": [1, 2, 3, 4]},
                      index=pd.MultiIndex.from_product([["a", "b"], [1, 2]]))
    mm = mpd.DataFrame(pm)
    pd.testing.assert_frame_equal(mm.xs("a").to_pandas(), pm.xs("a"), check_dtype=False)


def test_astype_nan_to_int_raises_natively(monkeypatch):
    monkeypatch.setenv("MODIN_SPARK_NATIVE_MAX_ROWS", "5000")
    sn = pd.Series([1.5, np.nan])
    with pytest.raises(Exception, match="[Cc]annot convert|IntCasting"):
        mpd.Series(sn).astype("int64")
    assert mpd.Series(pd.Series([1.0, 2.0])).astype("int8").to_pandas().dtype == "int8"


def test_merge_suffix_collision_raises():
    """pandas: suffixing must not CREATE a duplicate label (left holds
    both 'v' and 'v_x', right holds 'v')."""
    l = pd.DataFrame({"k": [1], "v": [2], "v_x": [3]})
    r = pd.DataFrame({"k": [1], "v": [9]})
    with pytest.raises(pd.errors.MergeError):
        mpd.DataFrame(l).merge(mpd.DataFrame(r), on="k")
    # plain overlap still suffixes normally
    l2 = pd.DataFrame({"k": [1], "v": [2]})
    pd.testing.assert_frame_equal(
        mpd.DataFrame(l2).merge(mpd.DataFrame(r), on="k").to_pandas(),
        l2.merge(r, on="k"), check_dtype=False)


def test_to_period_astype_str_renders_nat():
    d = pd.Series(pd.to_datetime(["2020-01-31", "2021-02-28", None]))
    md = mpd.Series(d)
    eq_series(md.dt.to_period("M").astype(str), d.dt.to_period("M").astype(str))


def test_clip_series_bounds_both_axes():
    p = pd.DataFrame({"a": [2.0, 1.0, 3.0], "b": [5.0, 0.0, 7.0]})
    m = mpd.DataFrame(p)
    lo = pd.Series([2.0, 2.0, 2.0])
    pd.testing.assert_frame_equal(m.clip(lower=lo, axis=0).to_pandas(),
                                  p.clip(lower=lo, axis=0), check_dtype=False)
    lb = pd.Series({"a": 2.0, "b": 6.0})
    pd.testing.assert_frame_equal(m.clip(lower=lb, axis=1).to_pandas(),
                                  p.clip(lower=lb, axis=1), check_dtype=False)
    pd.testing.assert_frame_equal(m.clip(1.5, 5.0).to_pandas(),
                                  p.clip(1.5, 5.0), check_dtype=False)


def test_corrwith_accepts_pandas_operands():
    p = pd.DataFrame({"a": [2.0, 1.0, 3.0], "b": [5.0, 0.0, 7.0]})
    m = mpd.DataFrame(p)
    g = m.corrwith(pd.Series([1.0, 2.0, 3.0]))
    g = g.to_pandas() if hasattr(g, "to_pandas") else g
    pd.testing.assert_series_equal(g.sort_index(),
                                   p.corrwith(pd.Series([1.0, 2.0, 3.0])).sort_index(),
                                   check_dtype=False)


def test_series_combine_label_alignment():
    """Series.combine aligns by LABEL with the union index (the old path
    dropped indexes and compared positionally)."""
    s = pd.Series([1.0, 2.0, np.nan, 4.0], index=list("abcd"))
    o = pd.Series([10.0, 20.0], index=list("bz"))
    eq_series(mpd.Series(s).combine(mpd.Series(o), max, fill_value=0),
              s.combine(o, max, fill_value=0))
    p2, q2 = pd.Series([1.0, 5.0]), pd.Series([3.0, 2.0])
    eq_series(mpd.Series(p2).combine(mpd.Series(q2), min), p2.combine(q2, min))
