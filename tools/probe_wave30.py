"""Probe wave 30 (round 11): cross-lineage alignment edges — index merges
how=right/outer, setitem from filtered frames, combine_first shapes,
duplicated keep=False, sort_index level, xs axis=1, insert Series."""
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

P = pd.DataFrame({"a": [3, 1, 2, 5, 4], "b": [1.5, np.nan, 2.5, 0.5, 3.5], "k": list("xyxyz")})
def M(): return mpd.from_pandas(P)

# index merges, all hows, default + labeled
probe("index merge how=outer unequal", lambda: P[["a"]].head(3).merge(P[["b"]], left_index=True, right_index=True, how="outer").fillna(-9).values.tolist(),
      lambda: M()[["a"]].head(3).merge(M()[["b"]], left_index=True, right_index=True, how="outer").to_pandas().fillna(-9).values.tolist())
probe("index merge how=right", lambda: P[["a"]].head(2).merge(P[["b"]], left_index=True, right_index=True, how="right").fillna(-9).values.tolist(),
      lambda: M()[["a"]].head(2).merge(M()[["b"]], left_index=True, right_index=True, how="right").to_pandas().fillna(-9).values.tolist())
probe("labeled index merge inner", lambda: P.set_index("k")[["a"]].merge(P.set_index("k")[["b"]], left_index=True, right_index=True).shape,
      lambda: mpd.from_pandas(P.set_index("k"))[["a"]].merge(mpd.from_pandas(P.set_index("k"))[["b"]], left_index=True, right_index=True).shape)
# setitem from filtered frames
probe("setitem from filtered other", lambda: (lambda p: (p.__setitem__("z", p[p.a > 2].a), p.z.fillna(-9).tolist())[1])(P.copy()),
      lambda: (lambda m: (m.__setitem__("z", m[m.a > 2].a), m.to_pandas().z.fillna(-9).tolist())[1])(M()))
probe("setitem from sorted other", lambda: (lambda p: (p.__setitem__("z", p.sort_values("a").a), p.z.tolist())[1])(P.copy()),
      lambda: (lambda m: (m.__setitem__("z", m.sort_values("a").a), m.to_pandas().z.tolist())[1])(M()))
# combine_first shapes
probe("combine_first extra col", lambda: P[["a"]].combine_first(P[["a","b"]]).fillna(-9).values.tolist(),
      lambda: M()[["a"]].combine_first(M()[["a","b"]]).to_pandas().fillna(-9).values.tolist())
probe("combine_first fills nan", lambda: P[["b"]].combine_first(P[["b"]].fillna(7.0)).b.tolist(),
      lambda: M()[["b"]].combine_first(M()[["b"]].fillna(7.0)).to_pandas().b.tolist())
# duplicated / drop_duplicates
probe("duplicated keep=False", lambda: P.assign(a=[1,1,2,3,3]).duplicated(subset=["a"], keep=False).tolist(),
      lambda: M().assign(a=[1,1,2,3,3]).duplicated(subset=["a"], keep=False).to_pandas().tolist())
probe("drop_duplicates keep=False", lambda: P.assign(a=[1,1,2,3,3]).drop_duplicates(subset=["a"], keep=False).a.tolist(),
      lambda: M().assign(a=[1,1,2,3,3]).drop_duplicates(subset=["a"], keep=False).to_pandas().a.tolist())
probe("drop_duplicates keep=last order", lambda: P.assign(a=[1,1,2,3,3]).drop_duplicates(subset=["a"], keep="last").a.tolist(),
      lambda: M().assign(a=[1,1,2,3,3]).drop_duplicates(subset=["a"], keep="last").to_pandas().a.tolist())
# sort_index / xs
PMI = P.set_index(["k", "a"])
probe("sort_index level=1", lambda: PMI.sort_index(level=1).b.fillna(-9).tolist(),
      lambda: mpd.from_pandas(PMI).sort_index(level=1).to_pandas().b.fillna(-9).tolist())
probe("xs axis=1", lambda: P[["a","b"]].xs("a", axis=1).tolist(),
      lambda: M()[["a","b"]].xs("a", axis=1).to_pandas().tolist())
probe("xs drop_level=False", lambda: PMI.xs("x", level=0, drop_level=False).index.nlevels,
      lambda: mpd.from_pandas(PMI).xs("x", level=0, drop_level=False).to_pandas().index.nlevels)
# insert engine series / filtered
probe("insert series", lambda: (lambda p: (p.insert(0, "z", p.b * 2), p.z.fillna(-9).tolist())[1])(P.copy()),
      lambda: (lambda m: (m.insert(0, "z", m.b * 2), m.to_pandas().z.fillna(-9).tolist())[1])(M()))
# where cond from other frame lineage
probe("where cond other lineage", lambda: P.a.where(P.copy().a > 2, -1).tolist(),
      lambda: M().a.where(mpd.from_pandas(P).a > 2, -1).to_pandas().tolist())
# chained ops stability
probe("filter-sort-filter order", lambda: P[P.a > 1].sort_values("a")[lambda d: d.b.notna()].a.tolist() if False else P[P.a > 1].sort_values("a").loc[lambda d: d.b.notna()].a.tolist(),
      lambda: M()[M().a > 1].sort_values("a").loc[lambda d: d.b.notna()].to_pandas().a.tolist())
probe("T single row", lambda: P[["a","b"]].head(1).T[0].fillna(-9).tolist(),
      lambda: M()[["a","b"]].head(1).T[0].to_pandas().fillna(-9).tolist())
probe("double transpose filtered", lambda: P[P.a > 2][["a","b"]].T.T.a.tolist(),
      lambda: M()[M().a > 2][["a","b"]].T.T.to_pandas().a.tolist())
probe("series.iloc setitem", lambda: (lambda s: (s.__setitem__(0, 99) if False else None, s)[1])(P.a.copy()).tolist() if False else (lambda s: (s.iloc.__setitem__(1, 99), s.tolist())[1])(P.a.copy()),
      lambda: (lambda s: (s.iloc.__setitem__(1, 99), s.to_pandas().tolist())[1])(M().a))
probe("neg mask combo", lambda: P[~(P.a > 2) & P.b.notna()].a.tolist(),
      lambda: M()[~(M().a > 2) & M().b.notna()].to_pandas().a.tolist())
probe("between + isin chained", lambda: P[P.a.between(1, 4) & P.k.isin(["x","z"])].a.tolist(),
      lambda: M()[M().a.between(1, 4) & M().k.isin(["x","z"])].to_pandas().a.tolist())

print(f"\nTOTALS {results}")
