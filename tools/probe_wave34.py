"""Probe wave 34 (round 11 closer): to_csv kwargs, read_json orients,
groupby.describe, expanding.rank, str second tail, window min_periods=0."""
import warnings; warnings.filterwarnings("ignore")
import os, tempfile
os.environ["MODIN_SPARK_NATIVE_MAX_ROWS"] = "0"
import numpy as np, pandas as pd
import modin_spark.pandas as mpd

results = {"OK": 0, "DIFF": 0, "FAIL": 0}

def probe(name, fn_p, fn_m, norm=None):
    try:
        want = fn_p()
    except Exception as e:
        print(f"SKIP  {name}: pandas: {type(e).__name__}"); return
    try:
        got = fn_m()
        if norm: want, got = norm(want), norm(got)
        same = got == want or str(got) == str(want)
        if not same and isinstance(want, list) and isinstance(got, list) and len(want) == len(got):
            same = all((x == y) or (pd.isna(x) and pd.isna(y)) for x, y in zip(want, got))
        results["OK" if same else "DIFF"] += 1
        print(("OK    " if same else "DIFF  ") + name + ("" if same else f": {str(want)[:70]} vs {str(got)[:70]}"))
    except Exception as e:
        results["FAIL"] += 1
        print(f"FAIL  {name}: {type(e).__name__}: {str(e)[:100]}")

P = pd.DataFrame({"a": [3, 1, 2, 5, 4], "b": [1.5, np.nan, 2.5, 0.5, 3.5], "k": list("xyxyz"),
                  "s": ["a,b", 'say "hi"', None, "d", "e"]})
def M(): return mpd.from_pandas(P)
d = tempfile.mkdtemp()

# distributed csv write is part-file UNORDERED (pandas single-file keeps
# order); the VALUES round-trip — compare as sets
probe("to_csv quoting roundtrip (unordered parts)", lambda: True,
      lambda: (M().to_csv(f"{d}/q.csv", index=False),
               sorted(mpd.read_csv(f"{d}/q.csv").to_pandas()["s"].fillna("-").tolist())
               == sorted(P["s"].fillna("-").tolist()))[1])
probe("to_csv na_rep", lambda: True,
      lambda: (M()[["b"]].to_csv(f"{d}/n.csv", index=False, na_rep="NULL"),
               any("NULL" in open(f"{d}/n.csv/" + f).read()
                   for f in __import__("os").listdir(f"{d}/n.csv") if f.endswith(".csv")))[1])
probe("read_json orient=split", lambda: pd.read_json('{"columns":["a"],"index":[0,1],"data":[[1],[2]]}', orient="split").a.tolist(),
      lambda: mpd.read_json('{"columns":["a"],"index":[0,1],"data":[[1],[2]]}', orient="split").to_pandas().a.tolist())
probe("groupby.describe shape", lambda: P.groupby("k")["a"].describe().shape,
      lambda: M().groupby("k")["a"].describe().shape)
probe("expanding.rank", lambda: P.a.expanding(1).rank().tolist(),
      lambda: M().a.expanding(1).rank().to_pandas().tolist())
probe("rolling min_periods=0", lambda: P.a.rolling(3, min_periods=0).sum().tolist(),
      lambda: M().a.rolling(3, min_periods=0).sum().to_pandas().tolist())
probe("str.count overlapping-free", lambda: pd.Series(["aaa"]).str.count("aa").tolist(),
      lambda: mpd.from_pandas(pd.DataFrame({"x": ["aaa"]})).x.str.count("aa").to_pandas().tolist())
probe("str.rjust", lambda: P.k.str.rjust(3, "_").tolist(), lambda: M().k.str.rjust(3, "_").to_pandas().tolist())
probe("str.swapcase", lambda: pd.Series(["aB"]).str.swapcase().tolist(),
      lambda: mpd.from_pandas(pd.DataFrame({"x": ["aB"]})).x.str.swapcase().to_pandas().tolist())
probe("str.isnumeric", lambda: pd.Series(["12", "a2"]).str.isnumeric().tolist(),
      lambda: mpd.from_pandas(pd.DataFrame({"x": ["12", "a2"]})).x.str.isnumeric().to_pandas().tolist())
probe("series.describe str", lambda: list(P.k.describe().index),
      lambda: list(M().k.describe().index))
probe("df.describe include=object", lambda: P.describe(include="object").shape,
      lambda: M().describe(include="object").shape)
probe("rank axis=0 frame na_option keep", lambda: P[["a","b"]].rank().fillna(-9).values.tolist(),
      lambda: M()[["a","b"]].rank().to_pandas().fillna(-9).values.tolist())
probe("cummax datetime", lambda: P.assign(t=pd.date_range("2024-01-03", periods=5)).t.cummax().astype(str).tolist(),
      lambda: M().assign(t=pd.date_range("2024-01-03", periods=5)).t.cummax().astype(str).to_pandas().tolist())
probe("series.add_prefix", lambda: list(P.a.add_prefix("i").index)[:2],
      lambda: list(M().a.add_prefix("i").to_pandas().index)[:2])
probe("df.equals true/false", lambda: (P.equals(P.copy()), P.equals(P.assign(a=0))),
      lambda: (M().equals(mpd.from_pandas(P)), M().equals(M().assign(a=0))))

print(f"\nTOTALS {results}")
