"""Probe wave 35 (round 11): IO edges — read_csv comment/quotechar/encoding,
read_parquet dir globbing, to_json orients, read_orc roundtrip, json lines
nested structs; plus df.convert misc."""
import warnings; warnings.filterwarnings("ignore")
import os, tempfile, glob
os.environ["MODIN_SPARK_NATIVE_MAX_ROWS"] = "0"
import numpy as np, pandas as pd
import modin_spark.pandas as mpd

results = {"OK": 0, "DIFF": 0, "FAIL": 0}

def probe(name, fn_p, fn_m, norm=None):
    try:
        want = fn_p()
    except Exception as e:
        print(f"SKIP  {name}: pandas: {type(e).__name__} {str(e)[:50]}"); return
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

d = tempfile.mkdtemp()
P = pd.DataFrame({"a": [3, 1, 2], "b": [1.5, np.nan, 2.5], "k": list("xyz")})
def M(): return mpd.from_pandas(P)

with open(f"{d}/c1.csv", "w") as f:
    f.write("# a comment\na,b\n1,2\n# mid comment\n3,4\n")
probe("read_csv comment=#", lambda: pd.read_csv(f"{d}/c1.csv", comment="#").a.tolist(),
      lambda: mpd.read_csv(f"{d}/c1.csv", comment="#").to_pandas().a.sort_values().tolist(),
      norm=sorted)
with open(f"{d}/c2.csv", "w") as f:
    f.write("a;b\n'x;y';2\n'z';4\n")
probe("read_csv quotechar'", lambda: pd.read_csv(f"{d}/c2.csv", sep=";", quotechar="'").a.tolist(),
      lambda: mpd.read_csv(f"{d}/c2.csv", sep=";", quotechar="'").to_pandas().a.sort_values().tolist(),
      norm=sorted)
with open(f"{d}/c3.csv", "wb") as f:
    f.write("a,b\nü,2\n".encode("latin-1"))
probe("read_csv encoding latin-1", lambda: pd.read_csv(f"{d}/c3.csv", encoding="latin-1").a.tolist(),
      lambda: mpd.read_csv(f"{d}/c3.csv", encoding="latin-1").to_pandas().a.tolist())
# parquet dir + glob
P.to_parquet(f"{d}/p1.parquet"); P.to_parquet(f"{d}/p2.parquet")
probe("read_parquet list of paths", lambda: 6,
      lambda: len(mpd.read_parquet([f"{d}/p1.parquet", f"{d}/p2.parquet"])))
# to_json orients
probe("to_json records str", lambda: pd.DataFrame({"a": [1]}).to_json(orient="records"),
      lambda: mpd.from_pandas(pd.DataFrame({"a": [1]})).to_json(orient="records"))
# orc roundtrip
probe("to_orc read_orc roundtrip", lambda: sorted(P.a.tolist()),
      lambda: (M().to_orc(f"{d}/o.orc"), sorted(mpd.read_orc(f"{d}/o.orc").to_pandas().a.tolist()))[1])
# json lines nested
with open(f"{d}/n.jsonl", "w") as f:
    f.write('{"id": 1, "meta": {"x": 10}}\n{"id": 2, "meta": {"x": 20}}\n')
probe("read_json lines nested struct", lambda: [10, 20],
      lambda: sorted(mpd.read_json(f"{d}/n.jsonl", lines=True).to_pandas()["meta"].map(lambda m: m["x"] if isinstance(m, dict) else m.x).tolist()))
# feather roundtrip
probe("to_feather roundtrip", lambda: sorted(P.a.tolist()),
      lambda: (M().to_feather(f"{d}/f.feather"), sorted(mpd.read_feather(f"{d}/f.feather").to_pandas().a.tolist()))[1])
# misc
probe("df.nbytes-ish memory_usage sum>0", lambda: True, lambda: bool(M().memory_usage().sum() > 0))
probe("df.ndim/size/shape", lambda: (P.ndim, P.size, P.shape), lambda: (M().ndim, M().size, M().shape))
probe("df.keys", lambda: list(P.keys()), lambda: list(M().keys()))
probe("df.bool single", lambda: bool(pd.DataFrame({"x": [True]}).x.iloc[0]),
      lambda: bool(mpd.from_pandas(pd.DataFrame({"x": [True]})).x.iloc[0]))
probe("series.tolist alias", lambda: P.a.tolist(), lambda: M().a.tolist())
probe("df.to_numpy shape", lambda: P[["a"]].to_numpy().shape, lambda: M()[["a"]].to_numpy().shape)
probe("df.itertuples name=None", lambda: [t for t in P[["a"]].itertuples(index=False, name=None)][:2],
      lambda: [t for t in M()[["a"]].itertuples(index=False, name=None)][:2])

print(f"\nTOTALS {results}")
