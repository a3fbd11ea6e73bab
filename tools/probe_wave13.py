"""Probe wave 13: remaining API/kwarg edges vs real pandas.

Same protocol as waves 10-12. Divergences become fixes plus regression
tests in tests/test_round9_wave13.py.

Usage: python tools/probe_wave13.py
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
        "s": ["foo bar", "baz", "qux quux", "corge", "grault g", "garply"],
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


cmp("between(inclusive=left)", lambda df: df["d"].between(20, 50, inclusive="left"))
cmp("between(inclusive=neither)", lambda df: df["d"].between(20, 50, inclusive="neither"))
cmp("nlargest(multi-col)", lambda df: df.nlargest(3, ["a", "d"]).reset_index(drop=True).pipe(srt))
cmp("sort_values(na_position=first)", lambda df: df.sort_values("c", na_position="first").reset_index(drop=True))
cmp("merge(sort=True)", lambda df: df.merge(df.groupby("b", as_index=False)["d"].sum().rename(columns={"d": "t"}), on="b", sort=True).pipe(srt))
cmp("concat(axis=0,join=inner)", lambda df: (pd if isinstance(df, pd.DataFrame) else mpd).concat([df[["a", "d"]], df[["d", "c"]]], join="inner").reset_index(drop=True).pipe(srt))
cmp("concat(series axis=1)", lambda df: (pd if isinstance(df, pd.DataFrame) else mpd).concat([df["a"], df["d"]], axis=1).pipe(srt))
cmp("value_counts(dropna=False)", lambda df: df["c"].value_counts(dropna=False).reset_index(drop=True))
cmp("duplicated(subset,keep=last)", lambda df: df.duplicated(subset=["b"], keep="last").reset_index(drop=True))
cmp("groupby.transform(size)", lambda df: df.groupby("b")["d"].transform("size").sort_values().reset_index(drop=True))
cmp("groupby.ngroup(ascending=False)", lambda df: df.groupby("b").ngroup(ascending=False).sort_values().reset_index(drop=True))
cmp("dt.round(15min)", lambda df: df.assign(t=pd.date_range("2024-01-01 00:07", periods=6, freq="37min"))["t"].dt.round("15min"))
cmp("dt.floor(h)", lambda df: df.assign(t=pd.date_range("2024-01-01 00:07", periods=6, freq="37min"))["t"].dt.floor("h"))
cmp("str.extract(named groups)", lambda df: df["s"].str.extract(r"(?P<w1>\w+) (?P<w2>\w+)").fillna("-").pipe(srt))
cmp("str.slice_replace", lambda df: df["s"].str.slice_replace(1, 3, "XX"))
cmp("str.removeprefix", lambda df: df["s"].str.removeprefix("ba"))
cmp("str.pad(center)", lambda df: df["b"].str.pad(5, side="both", fillchar="*"))
cmp("str.rsplit(expand)", lambda df: df["s"].str.rsplit(" ", n=1, expand=True).fillna("-").pipe(srt))
cmp("str.partition", lambda df: df["s"].str.partition(" ").fillna("-").pipe(srt))
cmp("crosstab(normalize=index)", lambda df: (pd if isinstance(df, pd.DataFrame) else mpd).crosstab(df["b"], df["a"], normalize="index").reset_index().pipe(srt))
# NaN-free input: pandas' masked cov kernel silently IGNORES ddof when any
# NaN is present (pandas 2.2.2); ours honors it uniformly — known-exact
# divergence, parity asserted on the NaN-free path
cmp("cov(ddof=0)", lambda df: df[["a", "d"]].astype(float).cov(ddof=0).reset_index(drop=True).pipe(srt))
cmp("quantile(list)", lambda df: df[["c", "d"]].quantile([0.25, 0.75]).reset_index(drop=True))
cmp("series.quantile(list)", lambda df: df["d"].quantile([0.25, 0.75]).reset_index(drop=True))
cmp("rank(na_option=top)", lambda df: df["c"].rank(na_option="top"))
cmp("rank(na_option=bottom)", lambda df: df["c"].rank(na_option="bottom"))
cmp("explode(empty list->nan)", lambda df: df.assign(l=[[1], [], [2, 3], None, [4], [5]]).explode("l")[["l", "d"]].fillna(-1).reset_index(drop=True).pipe(srt))
cmp("add(frame,fill_value)", lambda df: df[["c", "d"]].add(df[["c"]], fill_value=0).pipe(srt))
cmp("series.combine(fill_value)", lambda df: df["c"].combine(df["d"], lambda x, y: x + y, fill_value=0))
cmp("melt(ignore_index=False)", lambda df: df[["a", "d"]].melt(ignore_index=False).reset_index()[["variable", "value"]].pipe(srt))
cmp("sort_index(axis=1)", lambda df: df[["d", "a", "c"]].sort_index(axis=1).pipe(srt))
cmp("set_axis(axis=1)", lambda df: df[["a", "d"]].set_axis(["p", "q"], axis=1).pipe(srt))
cmp("series.mode", lambda df: df.assign(e=[1, 2, 2, 3, 3, 4])["e"].mode().reset_index(drop=True))
cmp("series.searchsorted(list)", lambda df: list(df["d"].searchsorted([15, 35])))
cmp("last_valid_index(after filter)", lambda df: df[df["a"] > 1]["c"].last_valid_index())
cmp("idxmax ties first", lambda df: df.assign(e=[1, 5, 5, 2, 5, 1])["e"].idxmax())
cmp("join(on=key)", lambda df: df.join(df.groupby("b")["d"].sum().rename("t"), on="b").pipe(srt))
cmp("groupby.agg(dict list values)", lambda df: df.groupby("b").agg({"d": ["sum", "max"], "c": "mean"}).reset_index().pipe(lambda x: x.set_axis(["b", "ds", "dm", "cm"], axis=1)).pipe(srt))
cmp("df.abs", lambda df: (df[["c", "d"]] * -1).abs().pipe(srt))
cmp("series.round(1)", lambda df: (df["c"] * 1.234).round(1))
cmp("tz_localize(None)", lambda df: df.assign(t=pd.date_range("2024-01-01", periods=6, freq="D", tz="UTC"))["t"].dt.tz_localize(None))
print("probe wave 13 complete")
