"""Probe wave 23 (round 11): timedelta/datetime arithmetic, dt rounding,
to_datetime kwargs, rolling/expanding.apply, groupby.resample, convert_dtypes,
IO kwarg round-trips. Prints OK/DIFF/FAIL per case."""
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

P = pd.DataFrame({"a": [3.0, 1.0, 2.0, 5.0, 4.0],
                  "k": list("xyxyx"),
                  "t": pd.date_range("2024-01-01 00:17", periods=5, freq="7h13min"),
                  "t2": pd.date_range("2024-02-01", periods=5, freq="D")})
def M(): return mpd.from_pandas(P)

# --- datetime/timedelta arithmetic
probe("ts - ts timedelta days", lambda: (P.t2 - P.t).dt.days.tolist(),
      lambda: (M().t2 - M().t).dt.days.to_pandas().tolist())
probe("ts + timedelta", lambda: (P.t + pd.Timedelta("36h")).astype(str).tolist(),
      lambda: (M().t + pd.Timedelta("36h")).astype(str).to_pandas().tolist())
probe("ts - DateOffset months", lambda: (P.t - pd.DateOffset(months=1)).astype(str).tolist(),
      lambda: (M().t - pd.DateOffset(months=1)).astype(str).to_pandas().tolist())
probe("td total_seconds", lambda: (P.t2 - P.t).dt.total_seconds().tolist(),
      lambda: (M().t2 - M().t).dt.total_seconds().to_pandas().tolist())
probe("td / td ratio", lambda: ((P.t2 - P.t) / pd.Timedelta("1h")).round(4).tolist(),
      lambda: ((M().t2 - M().t) / pd.Timedelta("1h")).round(4).to_pandas().tolist())
# --- dt rounding
probe("dt.floor h", lambda: P.t.dt.floor("h").astype(str).tolist(),
      lambda: M().t.dt.floor("h").astype(str).to_pandas().tolist())
probe("dt.ceil 30min", lambda: P.t.dt.ceil("30min").astype(str).tolist(),
      lambda: M().t.dt.ceil("30min").astype(str).to_pandas().tolist())
probe("dt.round h", lambda: P.t.dt.round("h").astype(str).tolist(),
      lambda: M().t.dt.round("h").astype(str).to_pandas().tolist())
probe("dt.normalize", lambda: P.t.dt.normalize().astype(str).tolist(),
      lambda: M().t.dt.normalize().astype(str).to_pandas().tolist())
# --- to_datetime kwargs
probe("to_datetime format", lambda: pd.to_datetime(pd.Series(["01/02/2024"]), format="%d/%m/%Y").astype(str).tolist(),
      lambda: mpd.to_datetime(mpd.from_pandas(pd.DataFrame({"x": ["01/02/2024"]})).x, format="%d/%m/%Y").astype(str).to_pandas().tolist())
probe("to_datetime errors=coerce", lambda: pd.to_datetime(pd.Series(["2024-01-01", "junk"]), errors="coerce").isna().tolist(),
      lambda: mpd.to_datetime(mpd.from_pandas(pd.DataFrame({"x": ["2024-01-01", "junk"]})).x, errors="coerce").isna().to_pandas().tolist())
probe("to_datetime unit=s", lambda: pd.to_datetime(pd.Series([1700000000]), unit="s").astype(str).tolist(),
      lambda: mpd.to_datetime(mpd.from_pandas(pd.DataFrame({"x": [1700000000]})).x, unit="s").astype(str).to_pandas().tolist())
# --- rolling/expanding apply
probe("rolling.apply", lambda: P.a.rolling(2).apply(lambda s: s.iloc[-1] - s.iloc[0]).fillna(-9).tolist(),
      lambda: M().a.rolling(2).apply(lambda s: s.iloc[-1] - s.iloc[0]).to_pandas().fillna(-9).tolist())
probe("expanding.apply", lambda: P.a.expanding(2).apply(lambda s: s.max() - s.min()).fillna(-9).tolist(),
      lambda: M().a.expanding(2).apply(lambda s: s.max() - s.min()).to_pandas().fillna(-9).tolist())
# --- groupby.resample
probe("groupby.resample sum", lambda: P.set_index("t").groupby("k").resample("12h")["a"].sum().to_dict(),
      lambda: mpd.from_pandas(P.set_index("t")).groupby("k").resample("12h")["a"].sum().to_pandas().to_dict(),
      norm=lambda d: {tuple(str(x) for x in k): v for k, v in d.items()})
# --- convert_dtypes / string dtype
probe("convert_dtypes int", lambda: str(pd.DataFrame({"x": [1, 2]}).convert_dtypes().x.dtype),
      lambda: str(mpd.from_pandas(pd.DataFrame({"x": [1, 2]})).convert_dtypes().to_pandas().x.dtype))
probe("astype string dtype", lambda: str(P.k.astype("string").dtype),
      lambda: str(M().k.astype("string").to_pandas().dtype))
# --- IO kwargs roundtrips
import tempfile, os as _os
d = tempfile.mkdtemp()
probe("to_csv sep + read back", lambda: True,
      lambda: (M().to_csv(f"{d}/o.csv", sep=";", index=False),
               mpd.read_csv(f"{d}/o.csv", sep=";").shape == P.shape)[1])
probe("read_parquet columns prune", lambda: ["a"],
      lambda: (P.to_parquet(f"{d}/p.parquet"), list(mpd.read_parquet(f"{d}/p.parquet", columns=["a"]).columns))[1])
probe("to_json lines roundtrip", lambda: True,
      lambda: (M()[["a","k"]].to_json(f"{d}/j.json", orient="records", lines=True),
               mpd.read_json(f"{d}/j.json", lines=True).shape == (5, 2))[1])
# --- misc long tail
probe("series.convert int div", lambda: (P.a // 2).tolist(), lambda: (M().a // 2).to_pandas().tolist())
probe("series rmod", lambda: (7 % P.a).tolist(), lambda: (7 % M().a).to_pandas().tolist())
probe("df.rpow", lambda: (2 ** P[["a"]]).a.tolist(), lambda: (2 ** M()[["a"]]).to_pandas().a.tolist())
probe("series.divmod", lambda: [list(x) for x in zip(*P.a.divmod(2))],
      lambda: [list(x) for x in zip(*[list(s.to_pandas()) for s in M().a.divmod(2)])] if hasattr(M().a, "divmod") else "ABSENT",
      norm=str)
probe("df.align outer", lambda: [x.shape for x in P[["a"]].align(P[["a","k"]].head(3), join="outer")],
      lambda: [x.shape for x in M()[["a"]].align(M()[["a","k"]].head(3), join="outer")])
probe("series.nsmallest", lambda: P.a.nsmallest(2).tolist(), lambda: M().a.nsmallest(2).to_pandas().tolist())
probe("series.truncate", lambda: P.a.truncate(1, 3).tolist(), lambda: M().a.truncate(1, 3).to_pandas().tolist())
probe("df.select_dtypes exclude", lambda: list(P.select_dtypes(exclude="object").columns),
      lambda: list(M().select_dtypes(exclude="object").columns))
probe("series.str slice step", lambda: P.k.str[::-1].tolist(), lambda: M().k.str[::-1].to_pandas().tolist())
probe("df.assign callable", lambda: P.assign(c=lambda d: d.a * 3).c.tolist(),
      lambda: M().assign(c=lambda d: d.a * 3).to_pandas().c.tolist())
probe("series.cumsum skipna", lambda: pd.Series([1.0, np.nan, 2.0]).cumsum().fillna(-9).tolist(),
      lambda: mpd.from_pandas(pd.DataFrame({"x": [1.0, np.nan, 2.0]})).x.cumsum().to_pandas().fillna(-9).tolist())
probe("series.is_unique", lambda: P.a.is_unique, lambda: M().a.is_unique)
probe("series.dt.strftime", lambda: P.t.dt.strftime("%Y/%m/%d %H").tolist(),
      lambda: M().t.dt.strftime("%Y/%m/%d %H").to_pandas().tolist())

print(f"\nTOTALS {results}")
