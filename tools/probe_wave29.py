"""Probe wave 29 (round 11): Series.at/iat writes, alignment on disjoint
labels, corr methods, join lists, concat Series axis=1, asof scalar,
first/last offsets, argmax/argmin, df.add(series, axis=0)."""
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
                  "k": list("xyxyx"),
                  "t": pd.date_range("2024-01-01", periods=5, freq="D")})
def M(): return mpd.from_pandas(P)

probe("series.at read", lambda: P.set_index("k").a.at["y"] if False else P.a.at[2], lambda: M().a.at[2])
probe("series.iat read", lambda: P.a.iat[3], lambda: M().a.iat[3])
# DOCUMENTED divergence: pandas special-cases binaries whose two
# DUPLICATE-label index sequences are identical (positional add); the
# engine label-aligns. Unique-label alignment (the next probe family)
# is exact.
probe("series add disjoint dup-label index (known: identical-sequence special case)", lambda: (P.set_index("k").a.head(3) + P.set_index("k").a.tail(3)).fillna(-9).sort_index().tolist(),
      lambda: (mpd.from_pandas(P.set_index("k")).a.head(3) + mpd.from_pandas(P.set_index("k")).a.tail(3)).to_pandas().fillna(-9).sort_index().tolist())
probe("df.corr spearman", lambda: P[["a","b"]].corr(method="spearman").values.round(5).tolist(),
      lambda: np.asarray(M()[["a","b"]].corr(method="spearman").values).round(5).tolist())
probe("df.corr kendall", lambda: P[["a","b"]].corr(method="kendall").values.round(5).tolist(),
      lambda: np.asarray(M()[["a","b"]].corr(method="kendall").values).round(5).tolist())
probe("series.cov", lambda: round(P.a.cov(P.b.fillna(2.0)), 6), lambda: round(M().a.cov(M().b.fillna(2.0)), 6))
probe("df.join list of frames", lambda: list(P[["a"]].join([P[["b"]], P[["k"]]]).columns),
      lambda: list(M()[["a"]].join([M()[["b"]], M()[["k"]]]).columns))
probe("concat two Series axis=1", lambda: list(pd.concat([P.a, P.b], axis=1).columns),
      lambda: list(mpd.concat([M().a, M().b], axis=1).columns))
probe("series.asof scalar", lambda: P.set_index("t").a.asof(pd.Timestamp("2024-01-03 12:00")),
      lambda: mpd.from_pandas(P.set_index("t")).a.asof(pd.Timestamp("2024-01-03 12:00")))
probe("df.first 3D", lambda: P.set_index("t").first("3D").a.tolist(),
      lambda: mpd.from_pandas(P.set_index("t")).first("3D").to_pandas().a.tolist())
probe("df.last 2D", lambda: P.set_index("t").last("2D").a.tolist(),
      lambda: mpd.from_pandas(P.set_index("t")).last("2D").to_pandas().a.tolist())
probe("series.argmax", lambda: int(P.a.argmax()), lambda: int(M().a.argmax()))
probe("series.argmin", lambda: int(P.a.argmin()), lambda: int(M().a.argmin()))
probe("df.add series axis=0", lambda: P[["a","b"]].add(P.a, axis=0).fillna(-9).values.round(3).tolist(),
      lambda: M()[["a","b"]].add(M().a, axis=0).to_pandas().fillna(-9).values.round(3).tolist())
probe("df.sub series axis=1", lambda: P[["a","b"]].sub(pd.Series({"a": 1.0, "b": 2.0}), axis=1).fillna(-9).values.round(3).tolist(),
      lambda: M()[["a","b"]].sub(pd.Series({"a": 1.0, "b": 2.0}), axis=1).to_pandas().fillna(-9).values.round(3).tolist())
probe("idxmax ties first", lambda: P.assign(z=[1,5,5,2,0]).z.idxmax(), lambda: M().assign(z=[1,5,5,2,0]).z.idxmax())
probe("df.mode dropna=False", lambda: pd.DataFrame({"x": [1.0, np.nan, np.nan]}).mode(dropna=False).x.fillna(-9).tolist(),
      lambda: mpd.from_pandas(pd.DataFrame({"x": [1.0, np.nan, np.nan]})).mode(dropna=False).to_pandas().x.fillna(-9).tolist())
probe("groupby agg tuple list", lambda: P.groupby("k")["a"].agg([("lo","min"),("hi","max")]).values.tolist(),
      lambda: M().groupby("k")["a"].agg([("lo","min"),("hi","max")]).to_pandas().values.tolist())
probe("get_dummies frame columns subset", lambda: sorted(pd.get_dummies(P[["k","a"]], columns=["k"]).columns.astype(str)),
      lambda: sorted(str(c) for c in mpd.get_dummies(M()[["k","a"]], columns=["k"]).columns))
probe("df.at_time", lambda: P.set_index(pd.date_range('2024-01-01', periods=5, freq='12h')).at_time("00:00").a.tolist(),
      lambda: mpd.from_pandas(P.set_index(pd.date_range('2024-01-01', periods=5, freq='12h'))).at_time("00:00").to_pandas().a.tolist())
probe("series.head neg", lambda: P.a.head(-1).tolist(), lambda: M().a.head(-1).to_pandas().tolist())
probe("series.rank pct dense", lambda: P.a.rank(method="dense", pct=True).tolist(),
      lambda: M().a.rank(method="dense", pct=True).to_pandas().tolist())
probe("df.asfreq upsample ffill", lambda: P.set_index("t").asfreq("12h", method="ffill").a.tolist(),
      lambda: mpd.from_pandas(P.set_index("t")).asfreq("12h", method="ffill").to_pandas().a.tolist())

print(f"\nTOTALS {results}")
