"""Property-based differential testing vs pandas (SURVEY §5: the reference's
test strategy is massive parametrized differential comparison; hypothesis
generates the frames here). Bounded examples + fixed seed: deterministic and
fast enough for CI — the goal is hitting odd shapes (empty groups, all-NaN
columns, single rows, duplicate keys), not volume."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@st.composite
def frames(draw, min_rows=1, max_rows=40):
    n = draw(st.integers(min_rows, max_rows))
    ints = draw(st.lists(st.integers(-50, 50), min_size=n, max_size=n))
    floats = draw(
        st.lists(
            st.one_of(st.floats(-100, 100, allow_nan=False), st.just(float("nan"))),
            min_size=n, max_size=n,
        )
    )
    keys = draw(st.lists(st.sampled_from(["p", "q", "r"]), min_size=n, max_size=n))
    return pd.DataFrame({"i": ints, "f": floats, "k": keys})


def _mpd(pdf):
    import modin_spark.pandas as mpd

    return mpd.from_pandas(pdf)


@given(pdf=frames())
@settings(**SETTINGS)
def test_prop_filter_project(spark, pdf):
    m = _mpd(pdf)
    got = m[m.i > 0][["i", "k"]].to_pandas()
    # r9: filtered default index keeps ORIGINAL pandas labels (no reset)
    ref = pdf[pdf.i > 0][["i", "k"]]
    pd.testing.assert_frame_equal(got, ref, check_dtype=False, check_index_type=False)


@given(pdf=frames())
@settings(**SETTINGS)
def test_prop_groupby_sum_count(spark, pdf):
    m = _mpd(pdf)
    got = m.groupby("k").agg(s=("i", "sum"), c=("f", "count")).to_pandas().sort_index()
    ref = pdf.groupby("k").agg(s=("i", "sum"), c=("f", "count")).sort_index()
    pd.testing.assert_frame_equal(got, ref, check_dtype=False)


@given(pdf=frames())
@settings(**SETTINGS)
def test_prop_sort_head(spark, pdf):
    m = _mpd(pdf)
    got = m.sort_values(["i", "k"]).head(7).to_pandas()[["i", "k"]]
    # round 10: sorted frames keep pandas' PERMUTED labels (labels_col stash)
    ref = pdf.sort_values(["i", "k"], kind="stable").head(7)[["i", "k"]]
    pd.testing.assert_frame_equal(got, ref, check_dtype=False, check_index_type=False)


@given(pdf=frames(min_rows=2))
@settings(**SETTINGS)
def test_prop_cumsum_shift(spark, pdf):
    m = _mpd(pdf)
    np.testing.assert_allclose(
        m.f.cumsum().to_pandas().to_numpy(), pdf.f.cumsum().to_numpy(), equal_nan=True
    )
    np.testing.assert_allclose(
        m.i.shift(1).to_pandas().to_numpy(),
        pdf.i.shift(1).to_numpy(),
        equal_nan=True,
    )


@given(pdf=frames())
@settings(**SETTINGS)
def test_prop_fillna_dropna(spark, pdf):
    m = _mpd(pdf)
    got = m[["f"]].fillna(0.0).to_pandas()
    ref = pdf[["f"]].fillna(0.0).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, ref, check_dtype=False)
    gd = m.dropna(subset=["f"]).to_pandas()[["i", "k"]]
    # r9: dropna keeps ORIGINAL pandas labels
    rd = pdf.dropna(subset=["f"])[["i", "k"]]
    pd.testing.assert_frame_equal(gd, rd, check_dtype=False, check_index_type=False)


@given(pdf=frames(min_rows=3), w=st.integers(2, 6), mp=st.integers(1, 3))
@settings(**SETTINGS)
def test_prop_rolling_center(spark, pdf, w, mp):
    m = _mpd(pdf)
    got = m.f.rolling(w, center=True, min_periods=min(mp, w)).sum().to_pandas()
    ref = pdf.f.rolling(w, center=True, min_periods=min(mp, w)).sum().reset_index(drop=True)
    pd.testing.assert_series_equal(got, ref, check_dtype=False, check_names=False)


@given(pdf=frames(min_rows=2))
@settings(**SETTINGS)
def test_prop_apply_axis0_transform(spark, pdf):
    num = pdf[["i", "f"]]
    got = _mpd(num).apply(lambda s: s - s.mean()).to_pandas()
    ref = num.apply(lambda s: s - s.mean())
    pd.testing.assert_frame_equal(got, ref, check_dtype=False)


@given(pdf=frames(min_rows=1, max_rows=12))
@settings(**SETTINGS)
def test_prop_transpose_roundtrip(spark, pdf):
    num = pdf[["i", "f"]]
    got = _mpd(num).T.to_pandas()
    # r9: transposed column labels keep their native type (ints), pandas-exact
    ref = num.T
    pd.testing.assert_frame_equal(got, ref, check_dtype=False, check_names=False,
                                  check_index_type=False)


@given(pdf=frames(min_rows=2))
@settings(**SETTINGS)
def test_prop_series_division(spark, pdf):
    m = _mpd(pdf)
    got = (m.f / m.i).to_pandas()
    ref = (pdf.f / pdf.i).reset_index(drop=True)
    pd.testing.assert_series_equal(got, ref, check_dtype=False, check_names=False)


@given(pdf=frames(min_rows=2))
@settings(**SETTINGS)
def test_prop_apply_axis0_value_counts(spark, pdf):
    # shape-changing apply (r7): per-column value_counts align on the
    # union index exactly like pandas
    num = pdf[["i", "f"]].fillna(0)
    got = _mpd(num).apply(lambda s: s.value_counts()).to_pandas()
    ref = num.apply(lambda s: s.value_counts())
    got.index = [str(x) for x in got.index]
    ref.index = [str(x) for x in ref.index]
    # our labels stringify; compare as sets of (label, col) -> value
    assert sorted(got.index) == sorted(ref.index)
    for c in ref.columns:
        g = got[c].dropna().sort_index()
        r = ref[c].dropna().sort_index()
        np.testing.assert_allclose(g.to_numpy(dtype=float), r.to_numpy(dtype=float))


@given(pdf=frames(min_rows=1, max_rows=15))
@settings(**SETTINGS)
def test_prop_transpose_dup_and_keyed_index(spark, pdf):
    # transpose with a DUPLICATE-prone index column (r7 position-keyed path)
    num = pdf[["i", "f"]].copy()
    num.index = pd.Index([f"r{v % 3}" for v in range(len(num))])
    got = _mpd(num.reset_index().set_index("index")[["i", "f"]]).T.to_pandas()
    ref = num.T
    assert [str(c) for c in got.columns] == [str(c) for c in ref.columns]
    gv = got.to_numpy(dtype=float)
    rv = ref.to_numpy(dtype=float)
    np.testing.assert_allclose(gv, rv, equal_nan=True)
