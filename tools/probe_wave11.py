"""Probe wave 11: reshape/join/groupby kwarg long tail vs real pandas.

Same protocol as wave 10 (tools/probe_wave10.py): identical input, one
not-yet-swept kwarg per probe, exact comparison. Divergences become fixes
plus regression tests in tests/test_round9_fixes.py.

Usage: python tools/probe_wave11.py
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
            try:
                pd.testing.assert_frame_equal(
                    got.reset_index(drop=True), want.reset_index(drop=True),
                    check_dtype=False, check_index_type=False,
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


cmp("unstack(fill_value=)", lambda df: df.groupby(["b", "a"])["d"].sum().unstack(fill_value=-1).reset_index().pipe(srt))
cmp("stack(level=0 of 2)", lambda df: df.set_index(["b", "a"]).groupby(level=[0, 1]).sum().unstack(0).stack(0, future_stack=True).reset_index().fillna(-9).pipe(srt))
cmp("swaplevel", lambda df: df.set_index(["b", "a"]).swaplevel().reset_index().pipe(srt))
cmp("droplevel", lambda df: df.set_index(["b", "a"]).droplevel("b").reset_index().pipe(srt))
cmp("reorder_levels", lambda df: df.set_index(["b", "a"]).reorder_levels([1, 0]).reset_index().pipe(srt))
cmp("explode(multi-col)", lambda df: df.assign(l1=[[1, 2]] * 6, l2=[[3, 4]] * 6).explode(["l1", "l2"]).reset_index(drop=True)[["l1", "l2", "d"]].pipe(srt))
cmp("Series.repeat", lambda df: df["b"].repeat(2).reset_index(drop=True))
cmp("concat(axis=1,join=inner)", lambda df: (pd if isinstance(df, pd.DataFrame) else mpd).concat([df[["d"]].head(4), df[["c"]].head(3)], axis=1, join="inner").pipe(srt))
cmp("join(how=cross)", lambda df: df[["b"]].head(2).join(df[["d"]].head(2), how="cross").pipe(srt))
cmp("merge(left_on,right_index)", lambda df: df.merge(df.set_index("b")[["d"]].groupby(level=0).sum(), left_on="b", right_index=True, suffixes=("", "_sum")).pipe(srt))
# known-exact divergence: a perfectly linear series has autocorr EXACTLY 1;
# pandas' two-pass kernel reports 0.9999999999999999 (FP accumulation) while
# the Spark corr aggregate returns the exact value — ours is the right one
cmp("Series.autocorr", lambda df: round(float(df["c"].autocorr(1)), 9))
cmp("groupby.agg(lambda)", lambda df: df.groupby("b")["d"].agg(lambda s: s.max() - s.min()).reset_index().pipe(srt))
cmp("groupby.agg(named tuple mix)", lambda df: df.groupby("b").agg(mx=("d", "max"), spread=("d", lambda s: s.max() - s.min())).reset_index().pipe(srt))
cmp("pivot(columns only)", lambda df: df.head(3).pivot(columns="b", values="d").fillna(-1).reset_index(drop=True).pipe(srt))
cmp("eval(multi-assign)", lambda df: df.eval("e = c + d\nf = c * 2").pipe(srt))
cmp("rank(method=first)", lambda df: df["c"].rank(method="first"))
cmp("cumsum(skipna=False)", lambda df: df.assign(c2=[1.0, None, 2.0, None, 3.0, 4.0])["c2"].cumsum(skipna=False))
cmp("groupby.cumcount(desc)", lambda df: df.groupby("b").cumcount(ascending=False).sort_values().reset_index(drop=True))
cmp("Series.where(other=series)", lambda df: df["c"].where(df["a"] > 1, df["d"]))
cmp("df.dot(series)", lambda df: df[["c", "d"]].dot(pd.Series([2.0, 0.5], index=["c", "d"])))
cmp("idxmin(skipna)", lambda df: df.assign(c2=[1.0, None, 2.0, None, 3.0, 0.5])[["c2"]].idxmin())
cmp("kurt(frame)", lambda df: df[["c", "d"]].kurt().sort_index())
cmp("mad-like abs demean", lambda df: (df["c"] - df["c"].mean()).abs().mean())
cmp("all(axis=1)", lambda df: (df[["a", "d"]] > 0).all(axis=1))
cmp("any(axis=None-ish)", lambda df: bool((df[["a", "d"]] > 55).any().any()))
cmp("round(decimals=-1)", lambda df: df[["d"]].round(-1).pipe(srt))
cmp("take(negative)", lambda df: df.take([-1, 0, 2]).reset_index(drop=True).pipe(srt))
cmp("truncate(before,after)", lambda df: df.truncate(before=1, after=4).reset_index(drop=True).pipe(srt))
cmp("combine(func)", lambda df: df[["c"]].combine(df[["c"]] * 2, lambda s1, s2: s1 + s2).pipe(srt))
cmp("groupby(sort=False) order", lambda df: df.groupby("b", sort=False)["d"].sum().reset_index())
print("probe wave 11 complete")
