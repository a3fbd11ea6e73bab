"""Probe wave 25 (round 11): to_dict/from_records orients, tz localize/
convert, stack/unstack kwargs, pivot multi-values, merge on index+column,
Series.explode, groupby agg exotic combos."""
import warnings; warnings.filterwarnings("ignore")
import os
os.environ["MODIN_SPARK_NATIVE_MAX_ROWS"] = "0"
import numpy as np, pandas as pd
import modin_spark.pandas as mpd

results = {"OK": 0, "DIFF": 0, "FAIL": 0}

def probe(name, fn_p, fn_m, norm=None):
    try:
        want = fn_p()
    except Exception as e:
        print(f"SKIP  {name}: pandas itself: {type(e).__name__} {str(e)[:60]}")
        return
    try:
        got = fn_m()
        if norm:
            want, got = norm(want), norm(got)
        same = got == want or str(got) == str(want)
        if not same and isinstance(want, list) and isinstance(got, list) and len(want) == len(got):
            same = all((x == y) or (pd.isna(x) and pd.isna(y)) for x, y in zip(want, got))
        if same:
            results["OK"] += 1; print(f"OK    {name}")
        else:
            results["DIFF"] += 1; print(f"DIFF  {name}: pandas={str(want)[:80]} engine={str(got)[:80]}")
    except Exception as e:
        results["FAIL"] += 1
        print(f"FAIL  {name}: {type(e).__name__}: {str(e)[:110]}")

P = pd.DataFrame({"a": [3, 1, 2, 5, 4], "b": [1.5, np.nan, 2.5, 0.5, 3.5],
                  "k": list("xyxyx"), "g": list("mmnnm"),
                  "t": pd.date_range("2024-01-01", periods=5, freq="h")})
def M(): return mpd.from_pandas(P)

# --- to_dict orients
probe("to_dict records", lambda: P[["a","k"]].to_dict("records"), lambda: M()[["a","k"]].to_dict("records"))
probe("to_dict list", lambda: P[["a"]].to_dict("list"), lambda: M()[["a"]].to_dict("list"))
probe("to_dict index", lambda: P[["a"]].to_dict("index"), lambda: M()[["a"]].to_dict("index"))
probe("series.to_dict", lambda: P.a.to_dict(), lambda: M().a.to_dict())
probe("to_records", lambda: [tuple(r)[1:] for r in P[["a","k"]].to_records()][:2],
      lambda: [tuple(r)[1:] for r in M()[["a","k"]].to_records()][:2])
# --- from_records / from_dict
probe("from_records", lambda: pd.DataFrame.from_records([(1, "a"), (2, "b")], columns=["x", "y"]).x.tolist(),
      lambda: mpd.DataFrame.from_records([(1, "a"), (2, "b")], columns=["x", "y"]).to_pandas().x.tolist()
      if hasattr(mpd.DataFrame, "from_records") else "ABSENT")
probe("from_dict orient=index", lambda: pd.DataFrame.from_dict({"r1": [1, 2]}, orient="index").loc["r1"].tolist(),
      lambda: mpd.DataFrame.from_dict({"r1": [1, 2]}, orient="index").to_pandas().loc["r1"].tolist()
      if hasattr(mpd.DataFrame, "from_dict") else "ABSENT")
# --- tz
probe("tz_localize + convert", lambda: P.t.dt.tz_localize("UTC").dt.tz_convert("US/Eastern").astype(str).tolist(),
      lambda: M().t.dt.tz_localize("UTC").dt.tz_convert("US/Eastern").astype(str).to_pandas().tolist())
probe("tz_localize None roundtrip", lambda: P.t.dt.tz_localize("UTC").dt.tz_localize(None).astype(str).tolist(),
      lambda: M().t.dt.tz_localize("UTC").dt.tz_localize(None).astype(str).to_pandas().tolist())
# --- stack/unstack kwargs
PMI = P.set_index(["k", "g"])
probe("unstack fill_value", lambda: PMI["a"].groupby(level=[0,1]).sum().unstack(fill_value=-1).values.tolist(),
      lambda: mpd.from_pandas(PMI)["a"].groupby(level=[0,1]).sum().unstack(fill_value=-1).to_pandas().values.tolist())
probe("stack dropna=False shape", lambda: P[["a","b"]].stack(dropna=False).shape,
      lambda: M()[["a","b"]].stack(dropna=False).shape)
# --- pivot multi values
probe("pivot_table two values", lambda: pd.pivot_table(P, values=["a","b"], index="k", aggfunc="sum").values.round(3).tolist(),
      lambda: mpd.pivot_table(M(), values=["a","b"], index="k", aggfunc="sum").to_pandas().values.round(3).tolist())
probe("pivot_table fill_value", lambda: pd.pivot_table(P, values="a", index="k", columns="g", aggfunc="sum", fill_value=0).values.tolist(),
      lambda: mpd.pivot_table(M(), values="a", index="k", columns="g", aggfunc="sum", fill_value=0).to_pandas().values.tolist())
# --- merge on index + column
probe("merge left_on right_index", lambda: P.merge(P.set_index("k")[["a"]].groupby(level=0).sum(), left_on="k", right_index=True, suffixes=("", "_sum"))["a_sum"].tolist(),
      lambda: M().merge(mpd.from_pandas(P.set_index("k")[["a"]].groupby(level=0).sum()), left_on="k", right_index=True, suffixes=("", "_sum")).to_pandas()["a_sum"].tolist())
probe("merge left_index right_on", lambda: P.set_index("k").merge(P[["k","a"]], left_index=True, right_on="k", suffixes=("_l","")).shape,
      lambda: mpd.from_pandas(P.set_index("k")).merge(M()[["k","a"]], left_index=True, right_on="k", suffixes=("_l","")).shape)
# --- Series.explode / groupby combos
probe("series.explode", lambda: pd.Series([[1,2],[3]]).explode().tolist(),
      lambda: mpd.from_pandas(pd.DataFrame({"x":[[1,2],[3]]})).x.explode().to_pandas().tolist())
probe("groupby agg dict multi-fn", lambda: P.groupby("k").agg({"a": ["min","max"], "b": "mean"}).values.round(3).tolist(),
      lambda: M().groupby("k").agg({"a": ["min","max"], "b": "mean"}).to_pandas().values.round(3).tolist())
probe("groupby two keys size", lambda: P.groupby(["k","g"]).size().to_dict(),
      lambda: M().groupby(["k","g"]).size().to_pandas().to_dict(), norm=lambda d: {tuple(map(str,k)): v for k,v in d.items()})
probe("groupby agg string fn on str col", lambda: P.groupby("k")["s" if "s" in P else "g"].agg("max").tolist() if False else P.groupby("k")["g"].agg("max").tolist(),
      lambda: M().groupby("k")["g"].agg("max").to_pandas().tolist())
probe("groupby idxmin", lambda: P.groupby("k")["b"].idxmin().tolist(),
      lambda: M().groupby("k")["b"].idxmin().to_pandas().tolist())
# --- df ops
probe("df.T roundtrip small", lambda: P[["a","b"]].T.T.b.fillna(-9).tolist(),
      lambda: M()[["a","b"]].T.T.to_pandas().b.fillna(-9).tolist())
probe("df.melt value_vars", lambda: P.melt(id_vars="k", value_vars=["a"]).value.tolist(),
      lambda: M().melt(id_vars="k", value_vars=["a"]).to_pandas().value.tolist())
probe("df.nunique axis=1", lambda: P[["a","b"]].nunique(axis=1).tolist(),
      lambda: M()[["a","b"]].nunique(axis=1).to_pandas().tolist())
probe("df.eq frame", lambda: P[["a"]].eq(P[["a"]]).a.tolist(), lambda: M()[["a"]].eq(M()[["a"]]).to_pandas().a.tolist())
probe("df.rank axis=1", lambda: P[["a","b"]].rank(axis=1).fillna(-9).values.tolist(),
      lambda: M()[["a","b"]].rank(axis=1).to_pandas().fillna(-9).values.tolist())
probe("df.diff axis=1", lambda: P[["a","b"]].diff(axis=1).fillna(-9).values.tolist(),
      lambda: M()[["a","b"]].diff(axis=1).to_pandas().fillna(-9).values.tolist())
probe("series.between_time", lambda: P.set_index("t").a.between_time("01:00", "03:00").tolist(),
      lambda: mpd.from_pandas(P.set_index("t")).a.between_time("01:00", "03:00").to_pandas().tolist())
probe("df.asfreq 2h", lambda: P.set_index("t").asfreq("2h").a.tolist(),
      lambda: mpd.from_pandas(P.set_index("t")).asfreq("2h").to_pandas().a.tolist())

print(f"\nTOTALS {results}")
