"""Probe wave 10: kwarg long-tail differential sweep vs real pandas.

Each probe builds the same small frame in pandas and modin_spark, runs one
operation with a not-yet-swept kwarg, and compares results exactly
(sorted where order is unspecified). Prints one line per probe:
OK / DIVERGE / ERROR. Divergences become fixes + regression tests in
tests/test_round9_fixes.py.

Usage: python tools/probe_wave10.py
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
        "a": [3, 1, 2, 1, 3, None],
        "b": ["x", "y", "x", "z", "y", "x"],
        "c": [1.5, 2.5, 3.5, 4.5, 5.5, 6.5],
        "d": [10, 20, 30, 40, 50, 60],
    }
)


def cmp(name: str, fn):
    try:
        got = fn(mpd.DataFrame(PDF.copy()))
        want = fn(PDF.copy())
        if isinstance(want, pd.DataFrame):
            got = got.to_pandas() if hasattr(got, "to_pandas") else got
            gs = got.reset_index(drop=True)
            ws = want.reset_index(drop=True)
            try:
                pd.testing.assert_frame_equal(gs, ws, check_dtype=False, check_index_type=False)
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


cmp("sort_values(key=)", lambda df: df.sort_values("b", key=lambda s: s.str.upper()).reset_index(drop=True))
cmp("value_counts(normalize)", lambda df: df["b"].value_counts(normalize=True).sort_index())
cmp("value_counts(bins)", lambda df: df["c"].value_counts(bins=3).sort_index().reset_index(drop=True))
cmp("rank(pct=True)", lambda df: df["d"].rank(pct=True))
cmp("nunique(dropna=False)", lambda df: int(df["a"].nunique(dropna=False)))
cmp("drop_duplicates(ignore_index)", lambda df: df[["b"]].drop_duplicates(ignore_index=True).sort_values("b").reset_index(drop=True))
cmp("set_index(append=True)", lambda df: df.set_index("b").set_index("a", append=True).reset_index().pipe(srt))
cmp("reset_index(names=)", lambda df: df.set_index("b").reset_index(names="bee").pipe(srt))
cmp("astype(errors=ignore)", lambda df: df[["b"]].astype(int, errors="ignore").pipe(srt))
cmp("groupby(as_index=False)", lambda df: df.groupby("b", as_index=False).agg(s=("d", "sum")).pipe(srt))
cmp("cut(labels=False,right=False)", lambda df: pd.cut(df["c"], 3, labels=False, right=False) if isinstance(df, pd.DataFrame) else mpd.cut(df["c"], 3, labels=False, right=False))
cmp("quantile(interpolation=lower)", lambda df: float(df["d"].quantile(0.4, interpolation="lower")))
cmp("quantile(interp=nearest)", lambda df: float(df["d"].quantile(0.35, interpolation="nearest")))
cmp("idxmax(axis=1)", lambda df: df[["c", "d"]].idxmax(axis=1))
cmp("clip(lower=Series)", lambda df: df[["c"]].clip(lower=df["c"].median()).pipe(srt))
cmp("corr(min_periods)", lambda df: float(df["c"].corr(df["d"], min_periods=3)))
cmp("replace(regex=True)", lambda df: df[["b"]].replace({"^x$": "XX"}, regex=True).pipe(srt))
cmp("add_prefix", lambda df: df[["d"]].add_prefix("p_").pipe(srt))
cmp("nsmallest(keep=all)", lambda df: df.nsmallest(2, "a", keep="all").reset_index(drop=True).pipe(srt))
cmp("split(expand=True)", lambda df: df["b"].str.cat(df["b"], sep="-").str.split("-", expand=True))
cmp("merge(suffixes)", lambda df: df.merge(df, on="b", suffixes=("_L", "_R")).pipe(srt))
cmp("concat(keys=)", lambda df: (pd if isinstance(df, pd.DataFrame) else mpd).concat([df[["d"]], df[["d"]]], keys=["u", "v"]).reset_index(level=0, names="src").pipe(srt))
cmp("insert(allow_duplicates)", lambda df: (lambda d: (d.insert(1, "d", d["d"] * 0 + 7, allow_duplicates=True), d)[1])(df[["d"]].copy()).pipe(lambda x: x.reset_index(drop=True)))
cmp("count(axis=1)", lambda df: df.count(axis=1))
cmp("mean(numeric_only)", lambda df: df.mean(numeric_only=True).sort_index())
cmp("to_datetime(errors=coerce)", lambda df: (pd if isinstance(df, pd.DataFrame) else mpd).to_datetime(df["b"].radd("2021-01-0").where(df["d"] < 40, "oops"), errors="coerce", format="mixed"))
cmp("sample(weights zero)", lambda df: df.assign(w=[0, 0, 0, 0, 0, 1]).sample(n=1, weights="w", random_state=1)[["b"]].reset_index(drop=True))
cmp("duplicated(keep=False)", lambda df: df[["b"]].duplicated(keep=False).sort_values().reset_index(drop=True))
cmp("sort_index(desc level)", lambda df: df.set_index(["b", "a"]).sort_index(ascending=[False, True], level=[0, 1]).reset_index().pipe(srt))
cmp("shift(fill+periods)", lambda df: df[["d"]].shift(2, fill_value=-1).pipe(lambda x: x.reset_index(drop=True)))
print("probe wave 10 complete")
