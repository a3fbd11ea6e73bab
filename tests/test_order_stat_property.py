"""Property-based tests for the r14 vectorized order-statistic kernels:
the pure-numpy merge-count helper (exhaustive vs brute force over random
tie structures) and the distributed expanding rank/quantile against
pandas on hypothesis-generated value shapes (constants, heavy ties,
NaN runs, signed extremes)."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from modin_spark.core.windows import _count_smaller_before

SETTINGS = dict(
    max_examples=25,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@given(st.lists(st.integers(0, 7), min_size=0, max_size=120))
@settings(**SETTINGS)
def test_count_smaller_before_matches_bruteforce(vals):
    keys = np.asarray(vals, dtype="int64")
    m = int(keys.max()) + 1 if len(keys) else 1
    got = _count_smaller_before(keys, m)
    exp = np.array([(keys[:j] < keys[j]).sum() for j in range(len(keys))],
                   dtype="int64")
    assert (got == exp).all()


@st.composite
def tie_series(draw, max_rows=60):
    n = draw(st.integers(3, max_rows))
    kind = draw(st.sampled_from(["constant", "few", "many", "nan_mix"]))
    if kind == "constant":
        vals = [5.0] * n
    elif kind == "few":
        vals = draw(st.lists(st.sampled_from([0.0, 1.0, 2.0]), min_size=n, max_size=n))
    elif kind == "many":
        vals = draw(st.lists(st.floats(-1e6, 1e6, allow_nan=False,
                                       allow_infinity=False),
                             min_size=n, max_size=n))
    else:
        vals = draw(st.lists(st.one_of(st.sampled_from([1.0, 2.0]),
                                       st.just(float("nan"))),
                             min_size=n, max_size=n))
    return pd.Series(vals)


@given(tie_series(), st.sampled_from(["average", "min", "max"]))
@settings(max_examples=10, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
def test_expanding_rank_property(ps, method):
    import modin_spark.pandas as mpd

    ms = mpd.Series(ps)
    exp = ps.expanding(min_periods=2).rank(method=method)
    got = ms.expanding(min_periods=2).rank(method=method).to_pandas()
    pd.testing.assert_series_equal(got, exp, check_dtype=False,
                                   check_index_type=False)


@given(tie_series(), st.sampled_from([0.0, 0.25, 0.5, 0.9, 1.0]))
@settings(max_examples=10, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
def test_expanding_quantile_property(ps, q):
    import modin_spark.pandas as mpd

    ms = mpd.Series(ps)
    exp = ps.expanding(min_periods=1).quantile(q)
    got = ms.expanding(min_periods=1).quantile(q).to_pandas()
    pd.testing.assert_series_equal(got, exp, check_dtype=False,
                                   check_index_type=False)
