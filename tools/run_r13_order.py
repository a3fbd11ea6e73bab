"""Scale rung for the round-13 order-statistic machinery: exact expanding
rank/quantile, df.rank, merge_asof — same op at 1M vs 5M rows (synthetic,
seeded). Sublinear-or-linear growth = the decomposition holds; superlinear
growth = a hidden whole-prefix or per-boundary cost. Writes
BASELINE_LOCAL_r13_order.json.
"""
import json
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

import modin_spark.pandas as mpd  # noqa: E402
from modin_spark.core import windows as win  # noqa: E402
from modin_spark.pandas.dataframe import DataFrame as MDF  # noqa: E402
from modin_spark.session import get_spark  # noqa: E402

spark = get_spark()
rng = np.random.default_rng(13)
out = {}

# warm-up: first execution of each kernel pays JIT/codegen/python-worker
# spinup that would otherwise land on the 1M leg and fake a sublinear ratio
_w = mpd.DataFrame(pd.DataFrame({"x": rng.normal(size=200_000)}))
_wf = _w["x"]._to_frame("x")
MDF(_frame=win.expanding_rank(_wf, [0])).to_spark(ordered=False).count()
MDF(_frame=win.expanding_quantile(_wf, [0], 0.5)).to_spark(ordered=False).count()
_w["x"].rank()._to_frame().to_spark(ordered=False).count()
_l = pd.DataFrame({"t": np.arange(100_000), "v": np.zeros(100_000)})
mpd.merge_asof(mpd.DataFrame(_l), mpd.DataFrame(_l.rename(columns={"v": "w"})), on="t"
               ).to_spark(ordered=False).count()

for n in (1_000_000, 5_000_000):
    tag = f"n{n//1_000_000}m"
    x = rng.normal(100, 10, n)
    mdf = mpd.DataFrame(pd.DataFrame({"x": x}))
    fr = mdf["x"]._to_frame("x")

    t0 = time.time()
    MDF(_frame=win.expanding_rank(fr, [0], method="average", pct=True)).to_spark(
        ordered=False).count()
    out[f"expanding_rank_{tag}"] = round(time.time() - t0, 2)

    t0 = time.time()
    MDF(_frame=win.expanding_quantile(fr, [0], 0.5)).to_spark(ordered=False).count()
    out[f"expanding_median_{tag}"] = round(time.time() - t0, 2)

    t0 = time.time()
    mdf["x"].rank(method="average")._to_frame().to_spark(ordered=False).count()
    out[f"rank_{tag}"] = round(time.time() - t0, 2)

    l = pd.DataFrame({"t": np.sort(rng.integers(0, 10**12, n)), "v": rng.normal(size=n)})
    r = pd.DataFrame({"t": np.sort(rng.integers(0, 10**12, n // 10)),
                      "w": rng.normal(size=n // 10)})
    ml, mr = mpd.DataFrame(l), mpd.DataFrame(r)
    t0 = time.time()
    mpd.merge_asof(ml, mr, on="t").to_spark(ordered=False).count()
    out[f"asof_{tag}"] = round(time.time() - t0, 2)
    print(tag, {k: v for k, v in out.items() if k.endswith(tag)}, flush=True)

ratios = {}
for op in ("expanding_rank", "expanding_median", "rank", "asof"):
    a, b = out[f"{op}_n1m"], out[f"{op}_n5m"]
    ratios[op] = round(b / a, 2) if a > 0 else None
out["ratios_5x_data"] = ratios
json.dump(out, open("/root/repo/BASELINE_LOCAL_r13_order.json", "w"), indent=1)
print(json.dumps(out))
