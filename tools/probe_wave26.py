"""Probe wave 26 (round 11): crosstab normalize/margins, dropna kwargs,
update/combine, groupby.transform names, concat axis=1 keys, series tails."""
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
                  "k": list("xyxyx"), "g": list("mmnnm")})
def M(): return mpd.from_pandas(P)

# --- crosstab
probe("crosstab normalize=index", lambda: pd.crosstab(P.k, P.g, normalize="index").values.round(4).tolist(),
      lambda: mpd.crosstab(M().k, M().g, normalize="index").to_pandas().values.round(4).tolist())
probe("crosstab normalize=columns", lambda: pd.crosstab(P.k, P.g, normalize="columns").values.round(4).tolist(),
      lambda: mpd.crosstab(M().k, M().g, normalize="columns").to_pandas().values.round(4).tolist())
probe("crosstab margins", lambda: pd.crosstab(P.k, P.g, margins=True).values.tolist(),
      lambda: mpd.crosstab(M().k, M().g, margins=True).to_pandas().values.tolist())
probe("crosstab values aggfunc", lambda: pd.crosstab(P.k, P.g, values=P.a, aggfunc="sum").fillna(-1).values.tolist(),
      lambda: mpd.crosstab(M().k, M().g, values=M().a, aggfunc="sum").to_pandas().fillna(-1).values.tolist())
# --- dropna kwargs
probe("dropna axis=1", lambda: list(P.dropna(axis=1).columns), lambda: list(M().dropna(axis=1).columns))
probe("dropna thresh", lambda: P.dropna(thresh=4).shape, lambda: M().dropna(thresh=4).shape)
probe("dropna subset", lambda: P.dropna(subset=["b"]).a.tolist(), lambda: M().dropna(subset=["b"]).to_pandas().a.tolist())
probe("dropna how=all", lambda: P.assign(z=np.nan).dropna(how="all").shape,
      lambda: M().assign(z=np.nan).dropna(how="all").shape)
# --- update / combine
probe("df.update", lambda: (lambda p: (p.update(pd.DataFrame({"b": [9.0, 9.0, 9.0, 9.0, 9.0]})), p.b.tolist())[1])(P.copy()),
      lambda: (lambda m: (m.update(mpd.from_pandas(pd.DataFrame({"b": [9.0]*5}))), m.to_pandas().b.tolist())[1])(M()))
probe("series.combine max", lambda: P.a.combine(P.a.shift(1).fillna(0).astype(int), max).tolist(),
      lambda: M().a.combine(M().a.shift(1).fillna(0).astype(int), max).to_pandas().tolist())
# --- groupby.transform variants
probe("groupby.transform 'mean'", lambda: P.groupby("k")["a"].transform("mean").tolist(),
      lambda: M().groupby("k")["a"].transform("mean").to_pandas().tolist())
probe("groupby.transform 'rank'", lambda: P.groupby("k")["a"].transform("rank").tolist(),
      lambda: M().groupby("k")["a"].transform("rank").to_pandas().tolist())
probe("groupby.transform callable", lambda: P.groupby("k")["a"].transform(lambda s: s - s.mean()).round(4).tolist(),
      lambda: M().groupby("k")["a"].transform(lambda s: s - s.mean()).to_pandas().round(4).tolist())
probe("groupby.frame transform 'max'", lambda: P.groupby("k")[["a","b"]].transform("max").fillna(-9).values.tolist(),
      lambda: M().groupby("k")[["a","b"]].transform("max").to_pandas().fillna(-9).values.tolist())
# --- concat axis=1 keys
probe("concat axis=1 keys", lambda: [tuple(c) for c in pd.concat([P[["a"]], P[["a"]]], axis=1, keys=["l","r"]).columns],
      lambda: [tuple(c) for c in mpd.concat([M()[["a"]], M()[["a"]]], axis=1, keys=["l","r"]).columns])
probe("concat ignore_index axis=1", lambda: list(pd.concat([P[["a"]], P[["b"]]], axis=1, ignore_index=True).columns),
      lambda: list(mpd.concat([M()[["a"]], M()[["b"]]], axis=1, ignore_index=True).columns))
# --- series tails
probe("series.rename callable", lambda: P.set_index("k").a.rename(lambda x: x.upper()).index.tolist(),
      lambda: mpd.from_pandas(P.set_index("k")).a.rename(lambda x: x.upper()).to_pandas().index.tolist())
probe("series.quantile list", lambda: P.a.quantile([0.25, 0.75]).tolist(),
      lambda: list(M().a.quantile([0.25, 0.75])))
probe("series.searchsorted side=right", lambda: int(P.a.sort_values().searchsorted(3, side="right")),
      lambda: int(M().a.sort_values().searchsorted(3, side="right")))
probe("sort_values na_position=first", lambda: P.sort_values("b", na_position="first").a.tolist(),
      lambda: M().sort_values("b", na_position="first").to_pandas().a.tolist())
probe("series.mode", lambda: pd.Series([1, 1, 2, 2, 3]).mode().tolist(),
      lambda: mpd.from_pandas(pd.DataFrame({"x": [1, 1, 2, 2, 3]})).x.mode().to_pandas().tolist())
probe("interpolate limit_direction=both", lambda: pd.Series([np.nan, 1.0, np.nan, 3.0, np.nan]).interpolate(limit_direction="both").tolist(),
      lambda: mpd.from_pandas(pd.DataFrame({"x": [np.nan, 1.0, np.nan, 3.0, np.nan]})).x.interpolate(limit_direction="both").to_pandas().tolist())
probe("expanding.corr pair", lambda: P.a.expanding(3).corr(P.b.fillna(1.0)).fillna(-9).round(4).tolist(),
      lambda: M().a.expanding(3).corr(M().b.fillna(1.0)).to_pandas().fillna(-9).round(4).tolist())
probe("groupby.ohlc", lambda: P.groupby("k")["a"].ohlc().values.tolist(),
      lambda: M().groupby("k")["a"].ohlc().to_pandas().values.tolist())
probe("pd.unique order", lambda: list(pd.unique(P.k)), lambda: list(mpd.unique(M().k)) if hasattr(mpd, "unique") else "ABSENT")
probe("pd.isna frame", lambda: pd.isna(P[["b"]]).b.tolist(), lambda: mpd.isna(M()[["b"]]).to_pandas().b.tolist() if hasattr(mpd, "isna") else "ABSENT")
probe("df.melt var_name", lambda: pd.melt(P, id_vars="k", value_vars=["a"], var_name="V").V.tolist(),
      lambda: mpd.melt(M(), id_vars="k", value_vars=["a"], var_name="V").to_pandas().V.tolist())
probe("df.mask other=frame", lambda: P[["a"]].mask(P[["a"]] > 2, P[["a"]] * 10).a.tolist(),
      lambda: M()[["a"]].mask(M()[["a"]] > 2, M()[["a"]] * 10).to_pandas().a.tolist())
probe("rolling min_periods=1 sum", lambda: P.b.rolling(3, min_periods=1).sum().fillna(-9).tolist(),
      lambda: M().b.rolling(3, min_periods=1).sum().to_pandas().fillna(-9).tolist())

print(f"\nTOTALS {results}")
