"""Order-dependent operators: cumulative ops, shift/diff, rolling/expanding,
rank.

These are the ops Spark makes easy to get wrong at scale: the naive plan is
``Window.orderBy(order)`` with no partitionBy — a single-task global window.
Everything here instead uses the block-partitioned two-pass scheme:

    1. attach a contiguous global position (range-repartition + local rank +
       tiny offset join — see SparkFrame.with_global_position),
    2. split into fixed-size blocks (position // B),
    3. compute within-block results with a *partitioned* window,
    4. combine with per-block carry-ins from a (#blocks)-row prefix pass.

This is the same decomposition the reference uses across its row partitions
for Fold ops (/root/reference/modin/core/dataframe/algebra/fold.py:28 applied
per axis partition), expressed as two Spark stages. #blocks rows is tiny, so
the prefix pass is negligible; every heavy stage is shuffle-parallel.
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from modin_spark.core.frame import ORDER_COL, SparkFrame, fresh_names

BLOCK = 1 << 16  # rows per block: bounds window-state size per task
_POS = "__pos__"
_BLK = "__blk__"


def _with_blocks(frame: SparkFrame) -> SparkFrame:
    fr = frame.ensure_order().with_global_position(_POS)
    return fr._same_rows(fr.sdf.withColumn(_BLK, (F.col(_POS) / F.lit(BLOCK)).cast("long")))


def _drop_aux(fr: SparkFrame) -> SparkFrame:
    return fr._same_rows(fr.sdf.drop(_POS, _BLK))


# ---------------------------------------------------------------------------
# cumulative ops
# ---------------------------------------------------------------------------

def cum_op(frame: SparkFrame, positions: Sequence[int], op: str, skipna: bool = True) -> SparkFrame:
    """cumsum/cumprod/cummax/cummin. Order contract: frame order, shape-preserved.

    pandas semantics: NaN rows stay NaN but do not reset the accumulator.
    """
    fr = _with_blocks(frame)
    w_in = Window.partitionBy(_BLK).orderBy(_POS).rowsBetween(Window.unboundedPreceding, 0)
    w_carry = Window.orderBy(_BLK).rowsBetween(Window.unboundedPreceding, -1)

    combine = {
        "cumsum": (F.sum, lambda within, carry: within + F.coalesce(carry, F.lit(0))),
        "cumprod": (F.product, lambda within, carry: within * F.coalesce(carry, F.lit(1))),
        "cummax": (F.max, lambda within, carry: F.greatest(within, carry)),
        "cummin": (F.min, lambda within, carry: F.least(within, carry)),
    }
    agg_fn, merge_fn = combine[op]
    carry_agg = {"cumsum": F.sum, "cumprod": F.product, "cummax": F.max, "cummin": F.min}[op]

    phys = [frame.data_cols[i] for i in positions]
    sdf = fr.sdf
    within_cols = fresh_names(len(phys))
    for p, wc in zip(phys, within_cols):
        sdf = sdf.withColumn(wc, agg_fn(F.col(p)).over(w_in))

    # per-block totals -> prefix carry (tiny: #blocks rows, single light task)
    totals = sdf.groupBy(_BLK).agg(*[agg_fn(F.col(p)).alias(f"__t_{wc}") for p, wc in zip(phys, within_cols)])
    carry_sel = [F.col(_BLK).alias("__blk2__")]
    for wc in within_cols:
        carry_sel.append(carry_agg(F.col(f"__t_{wc}")).over(w_carry).alias(f"__carry_{wc}"))
    carries = totals.select(*carry_sel)
    sdf = sdf.join(F.broadcast(carries), sdf[_BLK] == carries["__blk2__"], "left").drop("__blk2__")

    labels, exprs = [], []
    for i, (p, wc) in enumerate(zip(phys, within_cols)):
        pos = positions[i]
        merged = merge_fn(F.col(wc), F.col(f"__carry_{wc}"))
        merged = F.coalesce(merged, F.col(f"__carry_{wc}"), F.col(wc))
        out = F.when(F.col(p).isNull(), F.lit(None)).otherwise(merged) if skipna else merged
        labels.append(frame.columns[pos])
        exprs.append(out)
    out_fr = fr._same_rows(sdf).project(labels, exprs)
    return _drop_aux(out_fr)


# ---------------------------------------------------------------------------
# shift / diff
# ---------------------------------------------------------------------------

def shift(frame: SparkFrame, positions: Sequence[int], periods: int = 1, fill_value=None) -> SparkFrame:
    """Shift values by ``periods`` along frame order.

    Plan: global-position self-equijoin on pos == pos + k — two range
    shuffles, no global window; correct for any |k|.
    """
    frame = frame.ensure_order()
    fr = frame.with_global_position(_POS)
    phys = [frame.data_cols[i] for i in positions]
    right = fr.sdf.select(
        (F.col(_POS) + F.lit(periods)).alias("__pos_r__"),
        *[F.col(p).alias(f"__sh_{p}") for p in phys],
    )
    joined = fr.sdf.join(right, fr.sdf[_POS] == right["__pos_r__"], "left")
    labels, exprs = [], []
    for i, p in zip(positions, phys):
        e = F.col(f"__sh_{p}")
        if fill_value is not None:
            # fill only the positions the shift vacated (no matching row),
            # not pre-existing NaNs that were shifted into range — pandas
            # preserves those
            e = F.when(F.col("__pos_r__").isNull(), F.lit(fill_value)).otherwise(e)
        labels.append(frame.columns[i])
        exprs.append(e)
    out = fr._same_rows(joined).project(labels, exprs)
    return out._same_rows(out.sdf.drop(_POS, "__pos_r__"))


def diff(frame: SparkFrame, positions: Sequence[int], periods: int = 1) -> SparkFrame:
    shifted = shift(frame, positions, periods)
    labels, exprs = [], []
    for out_pos, orig_pos in enumerate(positions):
        cur = F.col(frame.data_cols[orig_pos])
        prev = F.col(shifted.data_cols[out_pos])
        labels.append(frame.columns[orig_pos])
        exprs.append(cur.cast("double") - prev.cast("double"))
    return shifted._same_rows(shifted.sdf).project(labels, exprs)


def pct_change(frame: SparkFrame, positions: Sequence[int], periods: int = 1) -> SparkFrame:
    """pandas ``pct_change`` — cur/prev - 1 along frame order (same
    position-equijoin plan as shift; no global window)."""
    shifted = shift(frame, positions, periods)
    labels, exprs = [], []
    for out_pos, orig_pos in enumerate(positions):
        cur = F.col(frame.data_cols[orig_pos])
        prev = F.col(shifted.data_cols[out_pos])
        labels.append(frame.columns[orig_pos])
        exprs.append(cur.cast("double") / prev.cast("double") - 1)
    return shifted._same_rows(shifted.sdf).project(labels, exprs)


def interpolate_linear(frame: SparkFrame, positions: Sequence[int]) -> SparkFrame:
    """pandas ``interpolate(method="linear")`` along frame order.

    Needs, per null cell, the nearest non-null (value, position) before and
    after. Both are ffill/bfill of a (value, pos) struct — computed with the
    same two-pass block scheme as ffill: within-block window + per-block
    carry joined broadcast-side. Leading NaNs stay NaN; trailing NaNs extend
    the last value (pandas limit_direction='forward' default).
    """
    fr = _with_blocks(frame)
    phys = [frame.data_cols[i] for i in positions]
    labels = [frame.columns[i] for i in positions]
    w_f = Window.partitionBy(_BLK).orderBy(_POS).rowsBetween(Window.unboundedPreceding, 0)
    w_b = Window.partitionBy(_BLK).orderBy(_POS).rowsBetween(0, Window.unboundedFollowing)
    w_cf = Window.orderBy(_BLK).rowsBetween(Window.unboundedPreceding, -1)
    w_cb = Window.orderBy(_BLK).rowsBetween(1, Window.unboundedFollowing)

    sdf = fr.sdf
    prev_c, next_c = fresh_names(len(phys)), fresh_names(len(phys))
    for p, pc, nc in zip(phys, prev_c, next_c):
        sv = F.when(F.col(p).isNotNull(), F.struct(F.col(_POS).alias("p"), F.col(p).cast("double").alias("v")))
        sdf = sdf.withColumn(pc, F.last(sv, ignorenulls=True).over(w_f))
        sdf = sdf.withColumn(nc, F.first(sv, ignorenulls=True).over(w_b))
    blk = sdf.groupBy(_BLK).agg(
        *[F.max_by(F.col(pc), F.when(F.col(pc).isNotNull(), F.col(_POS))).alias(f"__l_{pc}") for pc in prev_c],
        *[F.min_by(F.col(nc), F.when(F.col(nc).isNotNull(), F.col(_POS))).alias(f"__f_{nc}") for nc in next_c],
    )
    carries = blk.select(
        F.col(_BLK).alias("__blk2__"),
        *[F.last(F.col(f"__l_{pc}"), ignorenulls=True).over(w_cf).alias(f"__cp_{pc}") for pc in prev_c],
        *[F.first(F.col(f"__f_{nc}"), ignorenulls=True).over(w_cb).alias(f"__cn_{nc}") for nc in next_c],
    )
    sdf = sdf.join(F.broadcast(carries), sdf[_BLK] == carries["__blk2__"], "left").drop("__blk2__")

    exprs = []
    for p, pc, nc in zip(phys, prev_c, next_c):
        prev = F.coalesce(F.col(pc), F.col(f"__cp_{pc}"))
        nxt = F.coalesce(F.col(nc), F.col(f"__cn_{nc}"))
        frac = (F.col(_POS) - prev["p"]).cast("double") / (nxt["p"] - prev["p"]).cast("double")
        interp = prev["v"] + (nxt["v"] - prev["v"]) * frac
        e = (
            F.when(F.col(p).isNotNull(), F.col(p).cast("double"))
            .when(prev.isNull(), F.lit(None))          # leading NaNs
            .when(nxt.isNull(), prev["v"])             # trailing: extend last
            .otherwise(interp)
        )
        exprs.append(e)
    out = fr._same_rows(sdf).project(labels, exprs)
    return _drop_aux(out)


# ---------------------------------------------------------------------------
# rolling / expanding
# ---------------------------------------------------------------------------

_ROLL_AGGS = {
    "sum": F.sum,
    "mean": F.avg,
    "min": F.min,
    "max": F.max,
    "count": F.count,
    "std": F.stddev_samp,
    "var": F.var_samp,
    "median": F.median,
    "sem": lambda c: F.stddev_samp(c) / F.sqrt(F.count(c)),
    "skew": F.skewness,
    "kurt": F.kurtosis,
}


def rolling_quantile(frame, positions, window, q, min_periods=None, group_phys=None):
    """rolling(w).quantile(q) — F.percentile over the row window."""
    return rolling_agg(frame, positions, window, "quantile", min_periods, group_phys, q=q)


def rolling_apply(frame, positions, window, func, min_periods=None):
    """rolling(w).apply(func) — collect_list over the block-halo window, then
    one Arrow-vectorized pandas_udf over the window arrays (the documented
    slow path; every built-in agg should use rolling_agg instead)."""
    import numpy as np
    from pyspark.sql import types as T

    if min_periods is None:
        min_periods = window

    @F.pandas_udf(T.DoubleType())
    def _apply(arrs: pd.Series) -> pd.Series:
        out = []
        for a in arrs:
            v = np.asarray([x for x in a if x is not None], dtype="float64")
            out.append(float(func(v)) if v.size >= min_periods else float("nan"))
        return pd.Series(out, dtype="float64")

    frame2 = frame.ensure_order()
    phys = [frame2.data_cols[i] for i in positions]
    labels = [frame2.columns[i] for i in positions]
    fr = _with_blocks(frame2)
    base = fr.sdf.withColumn("__halo__", F.lit(0))
    halo = (
        fr.sdf.where((F.col(_POS) % BLOCK) >= (BLOCK - (window - 1)))
        .withColumn(_BLK, F.col(_BLK) + 1)
        .withColumn("__halo__", F.lit(1))
    )
    sdf = base.unionByName(halo)
    w = Window.partitionBy(_BLK).orderBy(_POS).rowsBetween(-(window - 1), 0)
    out_phys = fresh_names(len(phys))
    for p, op_ in zip(phys, out_phys):
        arr = F.collect_list(F.col(p)).over(w)
        pos_cnt = F.count(F.lit(1)).over(w)
        sdf = sdf.withColumn(op_, F.when(pos_cnt >= 1, _apply(arr)))
    sdf = sdf.where(F.col("__halo__") == 0).drop("__halo__")
    out = fr._same_rows(sdf).project(labels, [F.col(op_) for op_ in out_phys])
    return _drop_aux(out)


def rolling_agg(
    frame: SparkFrame,
    positions: Sequence[int],
    window: int,
    agg: str,
    min_periods: int | None = None,
    group_phys: list[str] | None = None,
    q: float | None = None,
) -> SparkFrame:
    """Fixed-size rolling window along frame order (pandas ``rolling(w).agg()``).

    Without groups: block windows with a (w-1)-row halo copied into the next
    block, so every window is computed locally within a bounded partition —
    the scale-safe alternative to one global ordered window.
    With groups (``groupby().rolling()``): a plain key-partitioned window.
    """
    if min_periods is None:
        min_periods = window
    fn = (lambda c: F.percentile(c, F.lit(q))) if agg == "quantile" else _ROLL_AGGS[agg]
    frame = frame.ensure_order()
    phys = [frame.data_cols[i] for i in positions]
    labels = [frame.columns[i] for i in positions]

    if group_phys:
        w = Window.partitionBy(*group_phys).orderBy(ORDER_COL).rowsBetween(-(window - 1), 0)
        exprs = [
            F.when(F.count(F.col(p)).over(w) >= min_periods, fn(F.col(p)).over(w)).otherwise(F.lit(None))
            for p in phys
        ]
        return frame.project(labels, exprs)

    fr = _with_blocks(frame)
    base = fr.sdf.withColumn("__halo__", F.lit(0))
    halo = (
        fr.sdf.where((F.col(_POS) % BLOCK) >= (BLOCK - (window - 1)))
        .withColumn(_BLK, F.col(_BLK) + 1)
        .withColumn("__halo__", F.lit(1))
    )
    sdf = base.unionByName(halo)
    w = Window.partitionBy(_BLK).orderBy(_POS).rowsBetween(-(window - 1), 0)
    out_phys = fresh_names(len(phys))
    for p, op_ in zip(phys, out_phys):
        val = fn(F.col(p)).over(w)
        cnt_window = F.count(F.lit(1)).over(w)  # positions available (for head-of-frame)
        nonnull = F.count(F.col(p)).over(w)
        # pandas: need min_periods non-null observations inside the window
        sdf = sdf.withColumn(op_, F.when(nonnull >= min_periods, val).otherwise(F.lit(None)))
    sdf = sdf.where(F.col("__halo__") == 0).drop("__halo__")
    out = fr._same_rows(sdf).project(labels, [F.col(op_) for op_ in out_phys])
    return _drop_aux(out)


def expanding_agg(frame: SparkFrame, positions: Sequence[int], agg, min_periods: int = 1) -> SparkFrame:
    """pandas ``expanding().agg()`` — cumulative aggregate with min_periods.

    sum/min/max/mean/count/var/std decompose into the cum_op two-pass scheme;
    built here from cumsum-style primitives to stay shuffle-parallel.

    ``agg`` may be a single name or a list of names; a list is computed in ONE
    block pass (one sort, one carry broadcast) — output columns are
    ``{label}_{agg}`` per (column, agg) pair.
    """
    aggs = [agg] if isinstance(agg, str) else list(agg)
    multi = not isinstance(agg, str)
    fr = _with_blocks(frame)
    phys = [frame.data_cols[i] for i in positions]
    labels = [frame.columns[i] for i in positions]
    w_in = Window.partitionBy(_BLK).orderBy(_POS).rowsBetween(Window.unboundedPreceding, 0)
    w_carry = Window.orderBy(_BLK).rowsBetween(Window.unboundedPreceding, -1)

    sdf = fr.sdf
    # per-row within-block partials for count/sum/sumsq/min/max
    aux = {}
    for p in phys:
        c = F.col(p)
        aux[p] = {
            "n": F.count(c).over(w_in),
            "s": F.sum(c).over(w_in),
            "s2": F.sum(c * c).over(w_in),
            "mn": F.min(c).over(w_in),
            "mx": F.max(c).over(w_in),
        }
    tot = sdf.groupBy(_BLK).agg(
        *[F.count(F.col(p)).alias(f"__n_{p}") for p in phys],
        *[F.sum(F.col(p)).alias(f"__s_{p}") for p in phys],
        *[F.sum(F.col(p) * F.col(p)).alias(f"__s2_{p}") for p in phys],
        *[F.min(F.col(p)).alias(f"__mn_{p}") for p in phys],
        *[F.max(F.col(p)).alias(f"__mx_{p}") for p in phys],
    )
    carry = tot.select(
        F.col(_BLK).alias("__blk2__"),
        *[F.coalesce(F.sum(F.col(f"__n_{p}")).over(w_carry), F.lit(0)).alias(f"__cn_{p}") for p in phys],
        *[F.coalesce(F.sum(F.col(f"__s_{p}")).over(w_carry), F.lit(0)).alias(f"__cs_{p}") for p in phys],
        *[F.coalesce(F.sum(F.col(f"__s2_{p}")).over(w_carry), F.lit(0)).alias(f"__cs2_{p}") for p in phys],
        *[F.min(F.col(f"__mn_{p}")).over(w_carry).alias(f"__cmn_{p}") for p in phys],
        *[F.max(F.col(f"__mx_{p}")).over(w_carry).alias(f"__cmx_{p}") for p in phys],
    )
    sdf = sdf.join(F.broadcast(carry), sdf[_BLK] == carry["__blk2__"], "left").drop("__blk2__")

    exprs = []
    out_labels = []
    for p, lbl in zip(phys, labels):
        a = aux[p]
        n = a["n"] + F.coalesce(F.col(f"__cn_{p}"), F.lit(0))
        s = F.coalesce(a["s"], F.lit(0)) + F.coalesce(F.col(f"__cs_{p}"), F.lit(0))
        s2 = F.coalesce(a["s2"], F.lit(0)) + F.coalesce(F.col(f"__cs2_{p}"), F.lit(0))
        mn = F.least(a["mn"], F.col(f"__cmn_{p}"))
        mn = F.coalesce(mn, a["mn"], F.col(f"__cmn_{p}"))
        mx = F.greatest(a["mx"], F.col(f"__cmx_{p}"))
        mx = F.coalesce(mx, a["mx"], F.col(f"__cmx_{p}"))
        for a_name in aggs:
            if a_name == "sum":
                e = s
            elif a_name == "count":
                e = n
            elif a_name == "mean":
                e = s / n
            elif a_name == "min":
                e = mn
            elif a_name == "max":
                e = mx
            elif a_name in ("var", "std"):
                var = (s2 - (s * s) / n) / (n - 1)
                e = F.sqrt(var) if a_name == "std" else var
            else:
                raise NotImplementedError(f"expanding {a_name}")
            exprs.append(F.when(n >= min_periods, e).otherwise(F.lit(None)))
            out_labels.append(f"{lbl}_{a_name}" if multi else lbl)
    out = fr._same_rows(sdf).project(out_labels, exprs)
    return _drop_aux(out)


# ---------------------------------------------------------------------------
# ffill / bfill
# ---------------------------------------------------------------------------

def ffill(frame: SparkFrame, positions: Sequence[int]) -> SparkFrame:
    """Forward-fill along frame order. Two-pass block scheme: last non-null
    within block + carry of each block's last non-null from preceding blocks."""
    fr = _with_blocks(frame)
    phys = [frame.data_cols[i] for i in positions]
    labels = [frame.columns[i] for i in positions]
    w_in = Window.partitionBy(_BLK).orderBy(_POS).rowsBetween(Window.unboundedPreceding, 0)
    w_carry = Window.orderBy(_BLK).rowsBetween(Window.unboundedPreceding, -1)

    sdf = fr.sdf
    within = fresh_names(len(phys))
    for p, wc in zip(phys, within):
        sdf = sdf.withColumn(wc, F.last(F.col(p), ignorenulls=True).over(w_in))
    blk_last = sdf.groupBy(_BLK).agg(
        *[F.max_by(F.col(wc), F.when(F.col(wc).isNotNull(), F.col(_POS))).alias(f"__bl_{wc}") for wc in within]
    )
    carries = blk_last.select(
        F.col(_BLK).alias("__blk2__"),
        *[F.last(F.col(f"__bl_{wc}"), ignorenulls=True).over(w_carry).alias(f"__cr_{wc}") for wc in within],
    )
    sdf = sdf.join(F.broadcast(carries), sdf[_BLK] == carries["__blk2__"], "left").drop("__blk2__")
    exprs = [F.coalesce(F.col(wc), F.col(f"__cr_{wc}")) for wc in within]
    out = fr._same_rows(sdf).project(labels, exprs)
    return _drop_aux(out)


def bfill(frame: SparkFrame, positions: Sequence[int]) -> SparkFrame:
    """Backward-fill: mirror of ffill with following-windows."""
    fr = _with_blocks(frame)
    phys = [frame.data_cols[i] for i in positions]
    labels = [frame.columns[i] for i in positions]
    w_in = Window.partitionBy(_BLK).orderBy(_POS).rowsBetween(0, Window.unboundedFollowing)
    w_carry = Window.orderBy(_BLK).rowsBetween(1, Window.unboundedFollowing)

    sdf = fr.sdf
    within = fresh_names(len(phys))
    for p, wc in zip(phys, within):
        sdf = sdf.withColumn(wc, F.first(F.col(p), ignorenulls=True).over(w_in))
    blk_first = sdf.groupBy(_BLK).agg(
        *[F.min_by(F.col(wc), F.when(F.col(wc).isNotNull(), F.col(_POS))).alias(f"__bf_{wc}") for wc in within]
    )
    carries = blk_first.select(
        F.col(_BLK).alias("__blk2__"),
        *[F.first(F.col(f"__bf_{wc}"), ignorenulls=True).over(w_carry).alias(f"__cr_{wc}") for wc in within],
    )
    sdf = sdf.join(F.broadcast(carries), sdf[_BLK] == carries["__blk2__"], "left").drop("__blk2__")
    exprs = [F.coalesce(F.col(wc), F.col(f"__cr_{wc}")) for wc in within]
    out = fr._same_rows(sdf).project(labels, exprs)
    return _drop_aux(out)


# ---------------------------------------------------------------------------
# rank
# ---------------------------------------------------------------------------

def rank(
    frame: SparkFrame,
    positions: Sequence[int],
    method: str = "average",
    ascending: bool = True,
    pct: bool = False,
) -> SparkFrame:
    """pandas ``rank``. Scale-safe: sort by value (range shuffle) -> global
    position -> per-value group stats joined back; no global window.
    """
    frame = frame.ensure_order()
    out_labels = [frame.columns[i] for i in positions]
    out_cols = []
    for i in positions:
        p = frame.data_cols[i]
        # single-column frame carrying the original ORDER as a payload column
        tmp = frame.select_positions([i])
        tmp = tmp._same_rows(tmp.sdf.withColumn("__orig__", F.col(ORDER_COL)))
        # rows with null values get no rank (pandas NaN), excluded up front
        tmp = tmp.filter(F.col(p).isNotNull())
        sorted_fr = tmp.sort_by([F.col(p)], [ascending]).with_global_position(_POS)
        if method == "first":
            ranked = sorted_fr.sdf.withColumn("__rank__", (F.col(_POS) + 1).cast("double"))
        else:
            # per-value min/max position via a value-partitioned window (one
            # hash shuffle on the value) instead of groupBy + join-back
            w_v = Window.partitionBy(F.col(p))
            if method == "average":
                r = (F.min(_POS).over(w_v) + F.max(_POS).over(w_v)) / 2 + 1
            elif method == "min":
                r = F.min(_POS).over(w_v) + 1
            elif method == "max":
                r = F.max(_POS).over(w_v) + 1
            else:
                raise NotImplementedError(f"rank method {method!r}")
            ranked = sorted_fr.sdf.withColumn("__rank__", r.cast("double"))
        if pct:
            nn = tmp.sdf.count()
            ranked = ranked.withColumn("__rank__", F.col("__rank__") / F.lit(nn))
        out_cols.append(ranked.select(F.col("__orig__"), F.col("__rank__")))
    # join rank columns back on the original ORDER values
    sdf = frame.sdf
    rank_phys = fresh_names(len(out_cols))
    for rp, kc in zip(rank_phys, out_cols):
        kc2 = kc.withColumnRenamed("__orig__", "__ro__").withColumnRenamed("__rank__", rp)
        sdf = sdf.join(kc2, sdf[ORDER_COL] == kc2["__ro__"], "left").drop("__ro__")
    return frame._same_rows(sdf).project(out_labels, [F.col(rp) for rp in rank_phys])
