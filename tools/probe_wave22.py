"""Probe wave 22 (round 11): Index set ops, join kwargs, get_dummies kwargs,
rank variants, iteration protocols, pop/insert, sample weights, quantile
interpolation, cumcount, str.cat, argsort. Prints OK/DIFF/FAIL per case."""
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
                  "k": list("xyxyx"), "s": ["ab", "cd", None, "ef", "gh"]})
def M(): return mpd.from_pandas(P)

# --- Index set ops (materialized pandas Index — must round-trip)
probe("index union", lambda: list(P.set_index("a").index.union([7, 8])),
      lambda: list(mpd.from_pandas(P.set_index("a")).index.union([7, 8])))
probe("index intersection", lambda: list(P.set_index("a").index.intersection([1, 2, 9])),
      lambda: list(mpd.from_pandas(P.set_index("a")).index.intersection([1, 2, 9])))
# --- join kwargs
probe("df.join on=", lambda: P.join(P.set_index("k")[["a"]].groupby(level=0).sum().rename(columns={"a": "asum"}), on="k").asum.tolist(),
      lambda: M().join(mpd.from_pandas(P.set_index("k")[["a"]].groupby(level=0).sum().rename(columns={"a": "asum"})), on="k").to_pandas().asum.tolist())
probe("df.join lsuffix", lambda: list(P[["a"]].join(P[["a"]], lsuffix="_l", rsuffix="_r").columns),
      lambda: list(M()[["a"]].join(M()[["a"]], lsuffix="_l", rsuffix="_r").columns))
# --- get_dummies kwargs
probe("get_dummies prefix", lambda: sorted(pd.get_dummies(P.k, prefix="K").columns),
      lambda: sorted(mpd.get_dummies(M().k, prefix="K").columns))
probe("get_dummies drop_first", lambda: sorted(pd.get_dummies(P.k, drop_first=True).columns),
      lambda: sorted(mpd.get_dummies(M().k, drop_first=True).columns))
probe("get_dummies dummy_na", lambda: int(pd.get_dummies(P.s, dummy_na=True).shape[1]),
      lambda: int(mpd.get_dummies(M().s, dummy_na=True).shape[1]))
# --- rank variants
probe("rank dense", lambda: P.a.rank(method="dense").tolist(), lambda: M().a.rank(method="dense").to_pandas().tolist())
probe("rank first desc", lambda: P.a.rank(method="first", ascending=False).tolist(),
      lambda: M().a.rank(method="first", ascending=False).to_pandas().tolist())
probe("rank na_option=bottom", lambda: P.b.rank(na_option="bottom").tolist(),
      lambda: M().b.rank(na_option="bottom").to_pandas().tolist())
# --- iteration protocols (driver-side by definition)
probe("itertuples", lambda: [t.a for t in P.itertuples()][:3], lambda: [t.a for t in M().itertuples()][:3])
probe("iterrows", lambda: [r["a"] for _, r in P.iterrows()][:3], lambda: [r["a"] for _, r in M().iterrows()][:3])
probe("series.items", lambda: list(P.a.items())[:2], lambda: list(M().a.items())[:2])
probe("df.items", lambda: [k for k, _ in P.items()], lambda: [k for k, _ in M().items()])
# --- pop / insert
probe("df.pop", lambda: (lambda p: (p.pop("k").tolist(), list(p.columns)))(P.copy()),
      lambda: (lambda m: (m.pop("k").to_pandas().tolist(), list(m.columns)))(M()))
probe("df.insert middle", lambda: (lambda p: (p.insert(1, "z", p.a * 2), p.z.tolist(), list(p.columns))[1:])(P.copy()),
      lambda: (lambda m: (m.insert(1, "z", m.a * 2), m.to_pandas().z.tolist(), list(m.columns))[1:])(M()))
# --- sample / quantile
probe("df.sample n seeded shape", lambda: P.sample(n=3, random_state=1).shape, lambda: M().sample(n=3, random_state=1).shape)
probe("quantile interpolation=nearest", lambda: float(P.a.quantile(0.4, interpolation="nearest")),
      lambda: float(M().a.quantile(0.4, interpolation="nearest")))
probe("quantile midpoint", lambda: float(P.a.quantile(0.5, interpolation="midpoint")),
      lambda: float(M().a.quantile(0.5, interpolation="midpoint")))
probe("df.quantile list", lambda: P[["a","b"]].quantile([0.25, 0.75]).values.round(4).tolist(),
      lambda: np.asarray(M()[["a","b"]].quantile([0.25, 0.75]).values).round(4).tolist())  # engine quantile(list) returns a driver pandas frame (k rows), like agg(dict)
# --- groupby tails
probe("groupby.cumcount", lambda: P.groupby("k").cumcount().tolist(),
      lambda: M().groupby("k").cumcount().to_pandas().tolist())
probe("groupby.cumcount ascending=False", lambda: P.groupby("k").cumcount(ascending=False).tolist(),
      lambda: M().groupby("k").cumcount(ascending=False).to_pandas().tolist())
probe("groupby.agg as_index=False named", lambda: P.groupby("k", as_index=False).agg(m=("a","max")).values.tolist(),
      lambda: M().groupby("k", as_index=False).agg(m=("a","max")).to_pandas().values.tolist())
probe("groupby.pipe", lambda: P.groupby("k").pipe(lambda g: g["a"].sum()).tolist(),
      lambda: M().groupby("k").pipe(lambda g: g["a"].sum()).to_pandas().tolist())
# --- str.cat / argsort / factorize
probe("str.cat sep", lambda: P.s.str.cat(P.k, sep="_").tolist(),
      lambda: M().s.str.cat(M().k, sep="_").to_pandas().tolist())
probe("series.argsort", lambda: P.a.argsort().tolist(), lambda: M().a.argsort().to_pandas().tolist())
probe("factorize sort", lambda: pd.factorize(P.k, sort=True)[0].tolist(),
      lambda: mpd.factorize(M().k, sort=True)[0].tolist(),
      norm=lambda x: list(x))
# --- round dict / skipna
probe("df.round dict", lambda: P.round({"b": 0}).b.fillna(-9).tolist(),
      lambda: M().round({"b": 0}).to_pandas().b.fillna(-9).tolist())
probe("idxmin skipna", lambda: P.b.idxmin(), lambda: M().b.idxmin())
probe("sum min_count", lambda: pd.Series([np.nan]).sum(min_count=1),
      lambda: mpd.from_pandas(pd.DataFrame({"x": [np.nan]})).x.sum(min_count=1), norm=lambda v: str(v))
probe("df.count axis=1", lambda: P.count(axis=1).tolist(), lambda: M().count(axis=1).to_pandas().tolist())
probe("df.compare", lambda: P.compare(P.assign(a=[3,9,2,5,4])).values.tolist(),
      lambda: M().compare(M().assign(a=[3,9,2,5,4])).to_pandas().values.tolist())
probe("series.pct_change fill_method=None", lambda: P.b.pct_change(fill_method=None).fillna(-9).round(4).tolist(),
      lambda: M().b.pct_change(fill_method=None).to_pandas().fillna(-9).round(4).tolist())
probe("series.nunique dropna=False", lambda: P.b.nunique(dropna=False), lambda: M().b.nunique(dropna=False))
probe("df.all bool_only", lambda: P.assign(f=[True]*5).all(bool_only=True).tolist(),
      lambda: M().assign(f=[True]*5).all(bool_only=True).tolist())
probe("series.value_counts bins", lambda: P.a.value_counts(bins=2).tolist(),
      lambda: M().a.value_counts(bins=2).to_pandas().tolist())
probe("df.memory_usage runs", lambda: True, lambda: bool(M().memory_usage() is not None))

print(f"\nTOTALS {results}")
