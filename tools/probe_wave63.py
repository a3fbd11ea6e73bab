"""Probe wave 63 (r15): the groupby-window family — groupby.rolling
(sum/mean/min_periods/window>group), groupby.expanding, groupby.ewm,
groupby.resample (agg dicts, size, multiple cols), groupby.apply result
shapes (scalar/Series/frame, group_keys=), groupby.head/tail negatives,
groupby.nth slices/dropna, and groupby with pd.Grouper(freq=).
Differential vs real pandas.

Usage: python tools/probe_wave63.py [--verbose]
"""
import os
import sys
import warnings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
warnings.filterwarnings("ignore")

import numpy as np
import pandas as pd

import modin_spark.pandas as mpd

VERBOSE = "--verbose" in sys.argv
RESULTS = []


def _norm(x):
    if hasattr(x, "to_pandas"):
        x = x.to_pandas()
    return x


def probe(name, fn_p, fn_m):
    try:
        exp = fn_p()
        exp_exc = None
    except Exception as e:
        exp, exp_exc = None, type(e).__name__
    try:
        got = _norm(fn_m())
        got_exc = None
    except Exception as e:
        got, got_exc = None, type(e).__name__
    if exp_exc or got_exc:
        ok = exp_exc == got_exc
        detail = f"exc exp={exp_exc} got={got_exc}"
    else:
        try:
            if isinstance(exp, pd.DataFrame):
                pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                              check_index_type=False, check_column_type=False,
                                              check_freq=False)
            elif isinstance(exp, pd.Series):
                pd.testing.assert_series_equal(got, exp, check_dtype=False,
                                               check_index_type=False, check_freq=False)
            else:
                assert got == exp or (pd.isna(got) and pd.isna(exp)), (got, exp)
            ok, detail = True, ""
        except Exception as e:
            ok, detail = False, str(e).replace("\n", " | ")[:260]
    RESULTS.append((name, ok, detail))
    if VERBOSE or not ok:
        print(("PASS " if ok else "FAIL ") + name + ("" if ok else "  :: " + detail))


pg = pd.DataFrame({
    "g": ["a", "a", "a", "b", "b", "c"],
    "v": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0],
    "w": [10.0, 20.0, 30.0, 40.0, 50.0, 60.0],
})
def MG():
    return mpd.DataFrame(pg)


# ------------------------------------------------- groupby.rolling
probe("gb_rolling_sum",
      lambda: pg.groupby("g").v.rolling(2).sum(),
      lambda: MG().groupby("g").v.rolling(2).sum())
probe("gb_rolling_minp1",
      lambda: pg.groupby("g").v.rolling(2, min_periods=1).mean(),
      lambda: MG().groupby("g").v.rolling(2, min_periods=1).mean())
probe("gb_rolling_window_gt_group",
      lambda: pg.groupby("g").v.rolling(5, min_periods=1).max(),
      lambda: MG().groupby("g").v.rolling(5, min_periods=1).max())
probe("gb_rolling_frame",
      lambda: pg.groupby("g")[["v", "w"]].rolling(2).sum(),
      lambda: MG().groupby("g")[["v", "w"]].rolling(2).sum())

# ------------------------------------------------- groupby.expanding / ewm
probe("gb_expanding_mean",
      lambda: pg.groupby("g").v.expanding().mean(),
      lambda: MG().groupby("g").v.expanding().mean())
probe("gb_expanding_count",
      lambda: pg.groupby("g").v.expanding().count(),
      lambda: MG().groupby("g").v.expanding().count())
probe("gb_ewm_mean",
      lambda: pg.groupby("g").v.ewm(alpha=0.5).mean(),
      lambda: MG().groupby("g").v.ewm(alpha=0.5).mean())

# ------------------------------------------------- groupby.apply shapes
probe("gb_apply_scalar",
      lambda: pg.groupby("g").apply(lambda d: d.v.sum(), include_groups=False),
      lambda: MG().groupby("g").apply(lambda d: d.v.sum(), include_groups=False))
probe("gb_apply_series",
      lambda: pg.groupby("g").apply(lambda d: d.v.describe()[["count", "mean"]],
                                    include_groups=False),
      lambda: MG().groupby("g").apply(lambda d: d.v.describe()[["count", "mean"]],
                                      include_groups=False))
probe("gb_apply_frame_groupkeys_false",
      lambda: pg.groupby("g", group_keys=False).apply(
          lambda d: d.assign(z=d.v * 2), include_groups=False),
      lambda: MG().groupby("g", group_keys=False).apply(
          lambda d: d.assign(z=d.v * 2), include_groups=False))

# ------------------------------------------------- head/tail/nth
probe("gb_head_negative",
      lambda: pg.groupby("g").head(-1),
      lambda: MG().groupby("g").head(-1))
probe("gb_tail_negative",
      lambda: pg.groupby("g").tail(-1),
      lambda: MG().groupby("g").tail(-1))
probe("gb_nth_list",
      lambda: pg.groupby("g").nth([0, 2]),
      lambda: MG().groupby("g").nth([0, 2]))
probe("gb_nth_negative",
      lambda: pg.groupby("g").nth(-1),
      lambda: MG().groupby("g").nth(-1))

# ------------------------------------------------- groupby.resample / Grouper
pt = pd.DataFrame({
    "t": pd.to_datetime(["2024-01-01 00:10", "2024-01-01 00:40",
                         "2024-01-01 01:10", "2024-01-01 00:20",
                         "2024-01-01 01:40", "2024-01-01 02:20"]),
    "g": ["a", "a", "a", "b", "b", "b"],
    "v": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0],
})
def MT():
    return mpd.DataFrame(pt)

probe("gb_resample_sum",
      lambda: pt.set_index("t").groupby("g").resample("1h").v.sum(),
      lambda: MT().set_index("t").groupby("g").resample("1h").v.sum())
probe("gb_resample_agg_dict",
      lambda: pt.set_index("t").groupby("g").resample("1h").agg({"v": "max"}),
      lambda: MT().set_index("t").groupby("g").resample("1h").agg({"v": "max"}))
probe("grouper_freq",
      lambda: pt.groupby([pd.Grouper(key="t", freq="1h"), "g"]).v.sum(),
      lambda: MT().groupby([pd.Grouper(key="t", freq="1h"), "g"]).v.sum())
probe("grouper_freq_only",
      lambda: pt.groupby(pd.Grouper(key="t", freq="1h")).v.sum(),
      lambda: MT().groupby(pd.Grouper(key="t", freq="1h")).v.sum())

# ------------------------------------------------- misc groupby kwargs
probe("gb_sum_min_count",
      lambda: pd.DataFrame({"g": ["a", "b"], "v": [np.nan, 1.0]}).groupby("g").v.sum(min_count=1),
      lambda: mpd.DataFrame(pd.DataFrame({"g": ["a", "b"], "v": [np.nan, 1.0]})).groupby("g").v.sum(min_count=1))
probe("gb_cumcount_desc",
      lambda: pg.groupby("g").cumcount(ascending=False),
      lambda: MG().groupby("g").cumcount(ascending=False))
probe("gb_rank_pct",
      lambda: pg.groupby("g").v.rank(pct=True),
      lambda: MG().groupby("g").v.rank(pct=True))
probe("gb_value_counts",
      lambda: pg.groupby("g").v.value_counts(),
      lambda: MG().groupby("g").v.value_counts())
probe("gb_value_counts_normalize",
      lambda: pg.groupby("g").v.value_counts(normalize=True),
      lambda: MG().groupby("g").v.value_counts(normalize=True))

npass = sum(1 for _, ok, _ in RESULTS if ok)
print(f"\n{npass}/{len(RESULTS)} passed, {len(RESULTS) - npass} failed")
sys.exit(0 if npass == len(RESULTS) else 1)
