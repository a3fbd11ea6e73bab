"""Probe wave 15: accessor tail, ufunc protocol, agg/transform/filter vs pandas.

Same protocol as waves 10-14. Divergences become fixes plus regression
tests in tests/test_round9_wave15.py.

Usage: python tools/probe_wave15.py
"""

from __future__ import annotations

import os
import sys
import traceback

import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import modin_spark.pandas as mpd  # noqa: E402

PDF = pd.DataFrame(
    {
        "a": [3, 1, 2, 1, 3, 2],
        "b": ["x", "y", "x", "z", "y", "x"],
        "c": [1.5, 2.5, None, 4.5, 5.5, 6.5],
        "d": [10, 20, 30, 40, 50, 60],
        "s": ["Foo bar", None, "qux1 Quux", "corge", "grault g7", "garply"],
    }
)


def cmp(name: str, fn):
    try:
        got = fn(mpd.DataFrame(PDF.copy()))
        want = fn(PDF.copy())
        if isinstance(want, pd.DataFrame):
            got = got.to_pandas() if hasattr(got, "to_pandas") else got
            try:
                pd.testing.assert_frame_equal(
                    got.reset_index(drop=True), want.reset_index(drop=True),
                    check_dtype=False, check_index_type=False, check_column_type=False,
                )
                print(f"OK       {name}")
            except AssertionError as e:
                print(f"DIVERGE  {name}: {str(e).splitlines()[-1][:160]}")
        elif isinstance(want, pd.Series):
            got = got.to_pandas() if hasattr(got, "to_pandas") else got
            try:
                pd.testing.assert_series_equal(
                    got.reset_index(drop=True), want.reset_index(drop=True),
                    check_dtype=False, check_index_type=False, check_names=False,
                )
                print(f"OK       {name}")
            except AssertionError as e:
                print(f"DIVERGE  {name}: {str(e).splitlines()[-1][:160]}")
        else:
            g = got if not hasattr(got, "to_pandas") else got.to_pandas()
            if (isinstance(want, float) and np.isnan(want) and isinstance(g, float) and np.isnan(g)) or g == want:
                print(f"OK       {name}")
            else:
                print(f"DIVERGE  {name}: got {g!r} want {want!r}")
    except Exception as e:
        tb = traceback.format_exc().splitlines()
        print(f"ERROR    {name}: {type(e).__name__}: {str(e)[:140]} @ {tb[-3].strip()[:100]}")


def srt(df):
    return df.sort_values(list(df.columns)).reset_index(drop=True)


cmp("str.count(pat)", lambda df: df["s"].str.count(r"[aeiou]"))
cmp("str.title", lambda df: df["s"].str.title())
cmp("str.swapcase", lambda df: df["s"].str.swapcase())
cmp("str.isdigit", lambda df: df["s"].str.isdigit())
cmp("str.isalpha", lambda df: df["s"].str.isalpha())
cmp("str.zfill", lambda df: df["b"].str.zfill(4))
cmp("str.match", lambda df: df["s"].str.match(r"[A-Z]"))
cmp("str.fullmatch", lambda df: df["b"].str.fullmatch("x"))
cmp("str.contains(case=False,na=False)", lambda df: df["s"].str.contains("FOO", case=False, na=False))
cmp("str.startswith(tuple)", lambda df: df["s"].str.startswith(("Fo", "qu"), na=False))
cmp("str.slice(step)", lambda df: df["s"].str.slice(0, 6, 2))
cmp("str.upper nan passthru", lambda df: df["s"].str.upper())
cmp("dt.days_in_month", lambda df: df.assign(t=pd.date_range("2024-01-31", periods=6, freq="ME"))["t"].dt.days_in_month)
cmp("dt.is_month_end", lambda df: df.assign(t=pd.date_range("2024-01-30", periods=6, freq="D"))["t"].dt.is_month_end)
cmp("dt.dayofyear", lambda df: df.assign(t=pd.date_range("2024-02-28", periods=6, freq="D"))["t"].dt.dayofyear)
cmp("dt.normalize", lambda df: df.assign(t=pd.date_range("2024-01-01 07:30", periods=6, freq="11h"))["t"].dt.normalize())
cmp("dt.strftime", lambda df: df.assign(t=pd.date_range("2024-01-05", periods=6, freq="D"))["t"].dt.strftime("%Y/%m/%d"))
cmp("np.sqrt(series)", lambda df: np.sqrt(df["d"]))
cmp("np.log1p(series)", lambda df: np.log1p(df["c"]))
cmp("np.abs(frame)", lambda df: np.abs(df[["c", "d"]] * -1).pipe(srt))
cmp("df.agg(dict)", lambda df: df.agg({"d": "sum", "c": "mean"}).sort_index())
cmp("df.agg(list)", lambda df: df[["c", "d"]].agg(["sum", "min"]).reset_index(drop=True).pipe(srt))
cmp("series.agg(list)", lambda df: df["d"].agg(["min", "max"]).reset_index(drop=True))
cmp("df.transform(lambda)", lambda df: df[["c", "d"]].transform(lambda x: x * 2).pipe(srt))
cmp("series.transform", lambda df: df["d"].transform(lambda x: x + 1))
cmp("groupby.agg(np.sum)", lambda df: df.groupby("b")["d"].agg(np.sum).reset_index().pipe(srt))
cmp("groupby.agg(np.mean named)", lambda df: df.groupby("b").agg(m=("d", np.mean)).reset_index().pipe(srt))
cmp("df.filter(items=)", lambda df: df.filter(items=["a", "d"]).pipe(srt))
cmp("df.filter(like=)", lambda df: df.filter(like="s").pipe(srt))
cmp("df.filter(regex=)", lambda df: df.filter(regex="^[ab]$").pipe(srt))
cmp("min(axis=1,skipna)", lambda df: df[["c", "d"]].min(axis=1))
cmp("reindex(index,fill)", lambda df: df.set_index("a")[["d"]].groupby(level=0).sum().reindex([1, 2, 3, 4], fill_value=0).reset_index().pipe(srt))
cmp("series.reindex", lambda df: df.set_index("b")["d"].groupby(level=0).sum().reindex(["x", "y", "zz"]).fillna(-1).reset_index(drop=True))
cmp("combine_first(disjoint)", lambda df: df[["c"]].combine_first(df[["d"]]).pipe(srt))
cmp("df.pop", lambda df: (lambda x: (x.pop("b"), x)[1])(df[["b", "d"]]).pipe(srt))
cmp("df.insert(loc)", lambda df: (lambda x: (x.insert(1, "e", x["d"] * 2), x)[1])(df[["a", "d"]]).pipe(srt))
cmp("take(axis=1)", lambda df: df.take([2, 0], axis=1).pipe(srt))
cmp("rename_axis+reset", lambda df: df.set_index("b").rename_axis("rows").reset_index().pipe(srt))
cmp("duplicated(float nan)", lambda df: df.assign(e=[1.0, None, 1.0, None, 2.0, 3.0])["e"].duplicated().reset_index(drop=True))
cmp("to_dict(records)", lambda df: df.head(2)[["a", "d"]].to_dict(orient="records") == [{"a": 3, "d": 10}, {"a": 1, "d": 20}])
cmp("itertuples(name=None)", lambda df: list(df.head(2)[["a"]].itertuples(index=False, name=None)) == [(3,), (1,)])
print("probe wave 15 complete")
