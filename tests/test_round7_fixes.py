"""Regression tests for the round-7 ADVICE defects (excel fixes live in
test_excel.py): str.extract alternation-group NULLs and exact big-int
scalars through the non-numeric apply(axis=0) reduction decode."""

import numpy as np
import pandas as pd

import modin_spark.pandas as mpd


def S(ps):
    return mpd.from_pandas(ps.to_frame("v")).v


def test_extract_alternation_groups_nan(spark):
    # (a)|(b): the losing branch's group must be NaN, not '' (pandas parity)
    vals = ["apple", "berry", "cherry"]
    ps = pd.Series(vals)
    ms = S(ps)
    pat = r"(ap\w+)|(be\w+)"
    exp = ps.str.extract(pat)
    got = ms.str.extract(pat).to_pandas()
    got.columns = exp.columns
    pd.testing.assert_frame_equal(got, exp)


def test_extract_nested_alternation(spark):
    ps = pd.Series(["x=1", "y=2", "z"])
    ms = S(ps)
    pat = r"(?:(x)=(\d)|(y)=(\d))"
    exp = ps.str.extract(pat)
    got = ms.str.extract(pat).to_pandas()
    got.columns = exp.columns
    pd.testing.assert_frame_equal(got, exp)


def test_extract_optional_still_works(spark):
    # the pre-round-7 cases must keep working after the parse-tree rewrite
    ps = pd.Series(["ab1", "ab", "zz"])
    ms = S(ps)
    pat = r"(a)(b)(\d)?"
    exp = ps.str.extract(pat)
    got = ms.str.extract(pat).to_pandas()
    got.columns = exp.columns
    pd.testing.assert_frame_equal(got, exp)


def test_apply_axis0_bigint_exact(spark):
    # reduction scalars decode via int(v) first — exact past 2^53
    big = 2**60
    pdf = pd.DataFrame({"a": [big, big + 1, big + 2], "s": ["x", "y", "z"]})
    mdf = mpd.from_pandas(pdf)
    got = mdf.apply(lambda s: s.iloc[0] if s.dtype == object else int(s.sum()))
    exp = pdf.apply(lambda s: s.iloc[0] if s.dtype == object else int(s.sum()))
    if hasattr(got, "to_pandas"):
        got = got.to_pandas()
    assert got["a"] == exp["a"] == 3 * big + 3
    assert got["s"] == "x"
