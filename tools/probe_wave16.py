"""Probe wave 16: categoricals, nullable dtypes, reduction edges vs pandas.

Same protocol as waves 10-15. Divergences become fixes plus regression
tests in tests/test_round9_wave16.py.

Usage: python tools/probe_wave16.py
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
                    check_categorical=False,
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
                    check_categorical=False,
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


cmp("astype(category,CategoricalDtype)", lambda df: df["b"].astype(pd.CategoricalDtype(["x", "y", "z", "w"])).astype(str))
cmp("cat.rename_categories", lambda df: df["b"].astype("category").cat.rename_categories({"x": "X"}).astype(str))
# fillna BEFORE astype(str): pandas astype(str) stringifies NaN to 'nan'
# (ours keeps NULL — declared astype-str-of-null divergence)
cmp("cat.add_remove", lambda df: df["b"].astype("category").cat.add_categories(["w", "-"]).cat.remove_categories(["z"]).fillna("-").astype(str))
cmp("cat.as_ordered min", lambda df: df["b"].astype("category").cat.as_ordered().min())
cmp("astype(Int64 nullable)", lambda df: df.assign(e=[1, None, 3, None, 5, 6])["e"].astype("Int64").fillna(-1).astype("int64"))
cmp("astype(boolean nullable)", lambda df: df.assign(e=[True, None, False, True, None, False])["e"].astype("boolean").fillna(False).astype(bool))
cmp("describe(percentiles=)", lambda df: df[["d"]].describe(percentiles=[0.1, 0.9]).reset_index().pipe(srt))
cmp("value_counts(sort=False)", lambda df: df["b"].value_counts(sort=False).sort_index().reset_index(drop=True))
cmp("mean(skipna=False)", lambda df: float("nan") if np.isnan(df["c"].mean(skipna=False)) else df["c"].mean(skipna=False))
cmp("df.mean(axis=1,skipna=False)", lambda df: df[["c", "d"]].mean(axis=1, skipna=False))
cmp("prod(axis=1)", lambda df: df[["a", "d"]].prod(axis=1))
cmp("cumsum(axis=1) nan", lambda df: df[["c", "d"]].cumsum(axis=1).pipe(srt))
cmp("idxmax(axis=1) ties", lambda df: df.assign(e=lambda x: x["d"])[["d", "e"]].idxmax(axis=1))
cmp("round(Series)", lambda df: df[["c", "d"]].round(pd.Series([1, -1], index=["c", "d"])).pipe(srt))
cmp("rank(strings)", lambda df: df["b"].rank(method="average"))
cmp("sort_values(key=) frame", lambda df: df.sort_values("b", key=lambda s: s.str.upper()).reset_index(drop=True))
cmp("merge(suffixes=(None,_y))", lambda df: df.merge(df[["b", "d"]], on="b", suffixes=(None, "_y")).pipe(srt))
cmp("merge(on index names)", lambda df: df.set_index("b").merge(df.groupby("b")["d"].sum().rename("t"), left_index=True, right_index=True).reset_index().pipe(srt))
cmp("explode(list of None)", lambda df: df.assign(l=[None] * 6).explode("l")[["l", "d"]].fillna(-1).pipe(srt))
cmp("groupby(observed=) cat", lambda df: df.assign(k=df["b"].astype("category") if isinstance(df, pd.DataFrame) else df["b"].astype("category")).groupby("k", observed=True)["d"].sum().reset_index(drop=True).sort_values().reset_index(drop=True))
cmp("clip(bounds as series)", lambda df: df["d"].clip(lower=df["a"] * 10).reset_index(drop=True))
cmp("duplicated(subset str)", lambda df: df.duplicated(subset="b").reset_index(drop=True))
cmp("between(datetime)", lambda df: df.assign(t=pd.date_range("2024-01-01", periods=6, freq="D"))["t"].between("2024-01-02", "2024-01-04"))
cmp("quantile(interp=midpoint)", lambda df: float(df["d"].quantile(0.4, interpolation="midpoint")))
cmp("sample(frac=1,seed) size", lambda df: len(df.sample(frac=1.0, random_state=1)))
cmp("nunique frame", lambda df: df.nunique().sort_index())
cmp("df.eval(func calls)", lambda df: df.eval("e = sqrt(d) + abs(c)").fillna(-1).pipe(srt))
cmp("series.pow(fill_value)", lambda df: df["c"].pow(2, fill_value=1))
cmp("series.ne(fill_value)", lambda df: df["c"].ne(2.5))
cmp("df.ne(frame)", lambda df: (df[["d"]].ne(df[["d"]] * 2)).pipe(srt))
cmp("any(axis=1,bool_only)", lambda df: (df[["a", "d"]] > 55).any(axis=1))
cmp("df.cummin(axis=0) nan", lambda df: df[["c"]].cummin())
cmp("shift(freq rows)", lambda df: df["d"].shift(-2, fill_value=0))
cmp("align(join=inner)", lambda df: df[["c", "d"]].align(df[["d"]], join="inner", axis=1)[0].pipe(srt))
cmp("combine_first overlap", lambda df: df.assign(c2=[None, 1.0, None, 2.0, None, 3.0])[["c2"]].rename(columns={"c2": "c"}).combine_first(df[["c"]]).pipe(srt))
print("probe wave 16 complete")
