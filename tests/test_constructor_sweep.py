"""Constructor + first-op differential sweep over the public API.

Round-11 lesson: the presence test proved blind to a Series constructor that
only accepted internal (frame, expr, refs) arguments. This sweep CALLS every
data-accepting public callable in ``modin_spark.pandas`` the way the first
line of real user code would — build from data, run one op — and compares
the result against pandas (reference test strategy:
modin/pandas/test/test_general.py, which exercises the same toplevel API).

Callables not probed here (read_* I/O, options, ExcelWriter/HDFStore
handles) are covered by tests/test_io.py and tests/test_api_presence.py.
"""
import warnings

import numpy as np
import pandas as pd
import pytest

import modin_spark.pandas as mpd

warnings.filterwarnings("ignore")


def _mat(x):
    """Materialize any modin_spark result to a comparable pandas object."""
    if hasattr(x, "to_pandas"):
        return x.to_pandas()
    if isinstance(x, tuple):
        return tuple(_mat(v) for v in x)
    if isinstance(x, list):
        return [_mat(v) for v in x]
    return x


def _eq(a, b):
    a, b = _mat(a), _mat(b)
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(_eq(x, y) for x, y in zip(a, b))
    if isinstance(a, pd.DataFrame) and isinstance(b, pd.DataFrame):
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                          check_index_type=False,
                                          check_column_type=False,
                                          check_categorical=False)
            return True
        except AssertionError:
            return False
    if isinstance(a, pd.Series) and isinstance(b, pd.Series):
        try:
            pd.testing.assert_series_equal(a, b, check_dtype=False,
                                           check_index_type=False,
                                           check_names=True,
                                           check_categorical=False,
                                           check_freq=False)
            return True
        except AssertionError:
            return False
    if isinstance(a, (pd.Index, np.ndarray)) or isinstance(b, (pd.Index, np.ndarray)):
        return list(np.asarray(a)) == list(np.asarray(b))
    if (isinstance(a, float) and isinstance(b, float)
            and np.isnan(a) and np.isnan(b)):
        return True
    return a == b


# Each probe: name -> fn(lib) building from raw data and running one op.
# `lib` is pandas or modin_spark.pandas; the results must match.
PROBES = {
    "Series_list": lambda l: l.Series([3, 1, 2]).sort_values(),
    "Series_index_dtype_name": lambda l: l.Series(
        [1, 2], index=["a", "b"], dtype="float64", name="x") * 2,
    "Series_dict": lambda l: l.Series({"a": 1, "b": 2}).sum(),
    "Series_ndarray": lambda l: l.Series(np.arange(4)).mean(),
    "Series_pdSeries": lambda l: l.Series(pd.Series([1, 2], name="z")).name,
    "Series_scalar_index": lambda l: l.Series(9, index=range(3)).sum(),
    "DataFrame_dict": lambda l: l.DataFrame({"a": [1, 2], "b": [3, 4]}).sum(),
    "DataFrame_records": lambda l: l.DataFrame(
        [[1, 2], [3, 4]], columns=["a", "b"], index=["r", "s"]).T.columns.tolist(),
    "DataFrame_own_series": lambda l: l.DataFrame(l.Series([1, 2], name="c")).shape,
    "DataFrame_series_dict": lambda l: l.DataFrame(
        {"a": l.Series([1, 2]), "b": [3, 4]}).sum(),
    "Index_list": lambda l: list(l.Index(["b", "a"])),
    "MultiIndex_from_tuples": lambda l: list(
        l.MultiIndex.from_tuples([("a", 1), ("b", 2)])),
    "RangeIndex": lambda l: list(l.RangeIndex(3)),
    "CategoricalIndex": lambda l: list(l.CategoricalIndex(["a", "b", "a"])),
    "DatetimeIndex": lambda l: list(l.DatetimeIndex(["2024-01-01", "2024-01-02"])),
    "TimedeltaIndex": lambda l: list(l.TimedeltaIndex(["1 day"])),
    "Categorical": lambda l: list(l.Categorical(["a", "b", "a"]).categories),
    "array": lambda l: list(l.array([1, 2, None], dtype="Int64")),
    "concat_series": lambda l: l.concat(
        [l.Series([1, 2], name="s"), l.Series([3], name="s")], ignore_index=True),
    "concat_frames": lambda l: l.concat(
        [l.DataFrame({"a": [1]}), l.DataFrame({"a": [2]})], ignore_index=True),
    "crosstab": lambda l: l.crosstab(
        l.Series(["x", "x", "y"], name="r"), l.Series([1, 2, 1], name="c")),
    "cut": lambda l: list(l.cut(l.Series([1, 5, 9]), bins=3).to_pandas()
                          if hasattr(l.cut(l.Series([1, 5, 9]), bins=3), "to_pandas")
                          else l.cut(l.Series([1, 5, 9]), bins=3)),
    "qcut": lambda l: list(map(str, _mat(l.qcut(l.Series([1, 2, 3, 4]), 2)))),
    "date_range": lambda l: list(l.date_range("2024-01-01", periods=3)),
    "bdate_range": lambda l: list(l.bdate_range("2024-01-05", periods=3)),
    "timedelta_range": lambda l: list(l.timedelta_range("1 day", periods=2)),
    "period_range": lambda l: list(l.period_range("2024-01", periods=2, freq="M")),
    "interval_range": lambda l: list(l.interval_range(0, 3)),
    "eval": lambda l: l.eval("1 + 2"),
    "factorize": lambda l: tuple(map(list, map(np.asarray, l.factorize(
        pd.array(["b", "a", "b"]))))),
    "get_dummies_series": lambda l: l.get_dummies(l.Series(["a", "b", "a"])),
    "from_dummies": lambda l: l.from_dummies(
        l.DataFrame({"c_a": [1, 0], "c_b": [0, 1]}, dtype=bool), sep="_"),
    "isna_scalar": lambda l: l.isna(np.nan),
    "isna_series": lambda l: l.isna(l.Series([1.0, np.nan])),
    "notna_series": lambda l: l.notna(l.Series([1.0, np.nan])),
    "json_normalize": lambda l: l.json_normalize(
        [{"a": 1, "b": {"c": 2}}, {"a": 3, "b": {"c": 4}}]),
    "melt": lambda l: l.melt(l.DataFrame({"id": [1], "x": [2], "y": [3]}),
                             id_vars="id").sort_values("variable").reset_index(drop=True),
    "merge": lambda l: l.merge(l.DataFrame({"k": [1, 2], "a": [9, 8]}),
                               l.DataFrame({"k": [1], "b": [7]}), on="k", how="inner"),
    "merge_asof": lambda l: l.merge_asof(
        l.DataFrame({"t": [1, 5], "a": [1, 2]}),
        l.DataFrame({"t": [2], "b": [9]}), on="t"),
    "merge_ordered": lambda l: l.merge_ordered(
        l.DataFrame({"k": [1, 3], "a": [1, 2]}),
        l.DataFrame({"k": [2], "b": [9]}), on="k"),
    "pivot": lambda l: l.pivot(l.DataFrame(
        {"i": [1, 1], "c": ["x", "y"], "v": [5, 6]}), index="i", columns="c", values="v"),
    "pivot_table": lambda l: l.pivot_table(l.DataFrame(
        {"g": ["a", "a", "b"], "v": [1.0, 2.0, 3.0]}), index="g", values="v", aggfunc="mean"),
    "to_datetime_list": lambda l: list(l.to_datetime(["2024-01-01", "2024-06-02"])),
    "to_datetime_series": lambda l: l.to_datetime(l.Series(["2024-01-01"])),
    "to_numeric_series": lambda l: l.to_numeric(l.Series(["1", "2.5"])),
    "to_timedelta": lambda l: list(l.to_timedelta(["1 day", "2 hours"])),
    "unique": lambda l: sorted(l.unique(l.Series([2, 1, 2]))),
    "value_counts_toplevel": lambda l: sorted(
        np.asarray(_mat(l.value_counts(l.Series(["a", "b", "a"]))))),
    "wide_to_long": lambda l: l.wide_to_long(
        l.DataFrame({"id": [1, 2], "x2020": [1, 2], "x2021": [3, 4]}),
        stubnames="x", i="id", j="year").sort_index(),
    "lreshape": lambda l: l.lreshape(
        l.DataFrame({"h1": [1], "h2": [2]}), {"h": ["h1", "h2"]}).sort_values(
        "h").reset_index(drop=True),
    "Timestamp": lambda l: l.Timestamp("2024-01-01").year,
    "Timedelta": lambda l: l.Timedelta("1 day").days,
    "Period": lambda l: l.Period("2024-01", freq="M").month,
    "Interval": lambda l: l.Interval(0, 1).length,
    "DateOffset": lambda l: (pd.Timestamp("2024-01-31") + l.DateOffset(months=1)).day,
    "NamedAgg": lambda l: l.NamedAgg(column="a", aggfunc="sum").column,
    "Grouper_groupby": lambda l: l.DataFrame(
        {"t": pd.date_range("2024-01-01", periods=4, freq="12h"), "v": [1, 2, 3, 4]}
    ).groupby(l.Grouper(key="t", freq="D"))["v"].sum(),
    "NA_NaT": lambda l: (l.NA is pd.NA, l.NaT is pd.NaT),
    "IndexSlice": lambda l: l.IndexSlice["a", :],
    "from_pandas": lambda l: (l.from_pandas(pd.DataFrame({"a": [1, 2]}))
                              if hasattr(l, "from_pandas")
                              else pd.DataFrame({"a": [1, 2]})).sum(),
    "from_arrow": lambda l: _from_arrow(l),
    "infer_freq": lambda l: l.infer_freq(pd.date_range("2024-01-01", periods=4)),
}


def _from_arrow(l):
    import pyarrow as pa

    t = pa.table({"a": [1, 2]})
    if hasattr(l, "from_arrow"):
        return l.from_arrow(t).sum()
    return pd.DataFrame({"a": [1, 2]}).sum()


@pytest.mark.parametrize("name", sorted(PROBES))
def test_constructor_first_op(name):
    fn = PROBES[name]
    exp = fn(pd) if name not in ("from_pandas", "from_arrow") else fn(pd)
    got = fn(mpd)
    assert _eq(got, exp), f"{name}: modin_spark={_mat(got)!r} pandas={_mat(exp)!r}"
