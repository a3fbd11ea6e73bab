"""loc / iloc indexers (reference: /root/reference/modin/pandas/indexing.py).

iloc positional semantics use the scale-safe global-position machinery in
SparkFrame (range repartition + partition offsets), never a collect.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from modin_spark.pandas.series import Series


class ILocIndexer:
    def __init__(self, df):
        self._df = df

    def __setitem__(self, key, value):
        """Positional assignment ``df.iloc[rows, cols] = v``: a conditional
        projection keyed on the blocked global position — no materialize,
        no shuffle beyond the position derivation (same machinery as slicing)."""
        if not isinstance(key, tuple) or len(key) != 2:
            raise NotImplementedError("iloc assignment needs (row, col)")
        row_key, col_key = key
        fr = self._df._frame
        if isinstance(col_key, slice):
            col_pos = list(range(len(fr.columns)))[col_key]
        elif isinstance(col_key, int):
            col_pos = [col_key]
        else:
            col_pos = [int(c) for c in col_key]
        n = None
        if isinstance(row_key, int):
            keys = [row_key]
        elif isinstance(row_key, slice):
            n = fr.count_rows()
            keys = list(range(*row_key.indices(n)))
        elif getattr(row_key, "dtype", None) is not None and str(row_key.dtype) == "bool":
            keys = [i for i, flag in enumerate(row_key) if flag]
        else:
            keys = [int(i) for i in row_key]
        if any(i < 0 for i in keys):
            n = fr.count_rows() if n is None else n
            keys = [i if i >= 0 else n + i for i in keys]
        pos_fr = fr.ensure_order().with_global_position("__isp__")
        cond = F.col("__isp__").isin(keys)
        colset = set(col_pos)
        labels = list(fr.columns)

        # pandas assigns list/array values ELEMENTWISE: a 1-D value of
        # len(keys) maps per-row (single column), of len(col_pos) maps
        # per-column; 2-D maps (row, col). Per-row values become a
        # when-chain keyed on the blocked global position — fine for the
        # small explicit key lists iloc assignment implies.
        arr = None
        if isinstance(value, (list, tuple, np.ndarray, pd.Series)):
            arr = np.asarray(value.values if isinstance(value, pd.Series) else value)
            if len(keys) > 10_000 and arr.ndim >= 1 and arr.shape[0] == len(keys) and (
                arr.ndim == 2 or len(col_pos) == 1
            ):
                raise NotImplementedError(
                    "iloc assignment with per-row array values is capped at "
                    "10k rows (builds a literal when-chain); use a join-based "
                    "update for larger assignments"
                )

        def _value_expr(ci: int, base):
            """Expression for selected column index ci (position in col_pos)."""
            if arr is None:
                return F.when(cond, F.lit(value)).otherwise(base)
            if arr.ndim == 2:
                if arr.shape != (len(keys), len(col_pos)):
                    raise ValueError(
                        f"shape mismatch: value {arr.shape} vs "
                        f"({len(keys)}, {len(col_pos)}) selection"
                    )
                expr = base
                for k, v in zip(keys, arr[:, ci]):
                    expr = F.when(F.col("__isp__") == int(k), F.lit(v.item() if hasattr(v, "item") else v)).otherwise(expr)
                return expr
            # 1-D: per-row when it matches the row selection and there is a
            # single target column; per-column when it matches col_pos
            if len(col_pos) == 1 and arr.shape[0] == len(keys):
                expr = base
                for k, v in zip(keys, arr):
                    expr = F.when(F.col("__isp__") == int(k), F.lit(v.item() if hasattr(v, "item") else v)).otherwise(expr)
                return expr
            if arr.shape[0] == len(col_pos):
                v = arr[ci]
                return F.when(cond, F.lit(v.item() if hasattr(v, "item") else v)).otherwise(base)
            raise ValueError(
                f"could not broadcast input array of length {arr.shape[0]} "
                f"onto ({len(keys)}, {len(col_pos)}) selection"
            )

        exprs = []
        for i in range(len(labels)):
            base = F.col(pos_fr.data_cols[i])
            exprs.append(_value_expr(col_pos.index(i), base) if i in colset else base)
        self._df._frame = pos_fr.project(labels, exprs)

    def __getitem__(self, key):
        from modin_spark.pandas.dataframe import DataFrame

        row_key, col_key = key if isinstance(key, tuple) else (key, slice(None))
        fr = self._df._frame

        if isinstance(col_key, slice):
            col_pos = list(range(len(fr.columns)))[col_key]
        elif isinstance(col_key, int):
            col_pos = [col_key]
        else:
            col_pos = list(col_key)

        if isinstance(row_key, slice) and (row_key.step or 1) < 0:
            # negative step (e.g. [::-1]): resolve to an explicit position
            # list against the row count, then the ordered take path
            n = fr.count_rows()
            return self[(list(range(*row_key.indices(n))), col_key) if isinstance(key, tuple)
                        else list(range(*row_key.indices(n)))]
        if isinstance(row_key, slice):
            if (row_key.start is not None and row_key.start < 0) or \
               (row_key.stop is not None and row_key.stop < 0):
                # negative bounds resolve against the row count (one count job)
                n = fr.count_rows()
                start, stop, step = row_key.indices(n)
            else:
                start, stop, step = row_key.indices(1 << 62)
            out = fr.slice_positions(start, stop, step) if (start, stop, step) != (0, 1 << 62, 1) else fr
        elif isinstance(row_key, int):
            n = fr.count_rows()
            i = row_key if row_key >= 0 else n + row_key
            out = fr.slice_positions(i, i + 1)
            row = out.select_positions(col_pos).to_pandas()
            if isinstance(col_key, int):
                return row.iloc[0, 0]
            return row.iloc[0]
        elif isinstance(row_key, (list, np.ndarray, pd.Index)):
            from modin_spark.core.frame import ORDER_COL

            if getattr(row_key, "dtype", None) is not None and str(row_key.dtype) == "bool":
                # boolean positional mask: keep rows whose position is True
                keys = [i for i, flag in enumerate(row_key) if flag]
            else:
                keys = [int(i) for i in row_key]
            if any(i < 0 for i in keys):
                n = fr.count_rows()
                keys = [i if i >= 0 else n + i for i in keys]
            base = fr.ensure_order()
            if not fr.index_cols:
                # default index: pandas iloc KEEPS the original labels —
                # stash them as a column before the order re-key below
                base = base.with_pandas_labels("__il__")
            pos_fr = base.with_global_position("__pos__")
            kept = pos_fr.sdf.where(F.col("__pos__").isin(keys))
            # pandas returns rows in REQUEST order — re-key the frame order
            # by each row's rank in the request list (a literal array lookup)
            arr = F.array(*[F.lit(i) for i in keys])
            kept = kept.withColumn(ORDER_COL, F.array_position(arr, F.col("__pos__"))).drop("__pos__")
            out = pos_fr._subset_rows(kept)
            if not fr.index_cols:
                # surfaced labels ride as an int64 index (pandas keeps the
                # pre-take labels, which are no longer positional)
                out = out._same_rows(out.sdf, index_cols=["__il__"], index_names=[None])
        else:
            raise NotImplementedError(type(row_key))

        out = out.select_positions(col_pos)
        if isinstance(col_key, int):
            return Series._from_frame(out)
        return DataFrame(_frame=out)


class LocIndexer:
    def __init__(self, df):
        self._df = df

    def __setitem__(self, key, value):
        """The pandas masked-update idiom ``df.loc[mask, col] = v`` compiles
        to a conditional projection (no shuffle, no materialize);
        ``df.loc[new_label] = [...]`` appends the row (enlargement);
        ``df.loc[:, col] = v`` routes to plain column assignment."""
        import pandas as _pd

        if not isinstance(key, tuple):
            # row enlargement / row overwrite by scalar label
            fr = self._df._frame
            vals = list(value) if isinstance(value, (list, tuple)) else [value] * len(fr.columns)
            row = _pd.DataFrame([vals], columns=list(fr.columns),
                                index=_pd.Index([key], name=fr.index_names[0] if fr.index_cols else None))
            from modin_spark.pandas.io import from_pandas
            from modin_spark.pandas import concat

            if fr.index_cols:
                # drop an existing row with this label, then append (pandas
                # overwrites in place; for an overwrite the row moves to the
                # end — documented divergence)
                from modin_spark.pandas.dataframe import DataFrame

                existing = DataFrame(
                    _frame=fr.filter(~F.col(fr.index_cols[0]).eqNullSafe(F.lit(key)))
                )
                appended = concat([existing, from_pandas(row)])
            else:
                appended = concat([self._df, from_pandas(row.reset_index(drop=True))], ignore_index=True)
            self._df._frame = appended._frame
            return
        row_key, col_key = key
        if isinstance(row_key, slice) and row_key == slice(None):
            # full-row slice: ordinary column assignment
            self._df[col_key] = value
            return
        if not isinstance(row_key, Series):
            # label-keyed update (r11, hardened r12): df.loc[label, col] = v,
            # df.loc[[l1, l2], col] = [v1, v2] (elementwise by label),
            # df.loc[new_label, col] = v (pandas enlargement). On a default
            # positional index the condition keys on the TRUE pandas labels
            # (ORDER values / post-sort labels_col stash via
            # with_pandas_labels), never fresh positions.
            fr = self._df._frame
            if isinstance(row_key, slice):
                raise NotImplementedError("loc assignment with a label slice")
            scalar_row = not isinstance(row_key, (list, np.ndarray, pd.Index))
            labels_key = [row_key] if scalar_row else [k for k in row_key]
            if fr.index_cols:
                work = fr
                lbl = F.col(fr.index_cols[0])
            else:
                work = fr.with_pandas_labels("__ll__")
                lbl = F.col("__ll__")
                labels_key = [int(k) for k in labels_key]
            # existence check (one bounded-distinct job): pandas ENLARGES on
            # a missing scalar label and raises KeyError for a list key with
            # missing labels — a silent no-op would drop the write
            matched = {
                r["__k__"]
                for r in work.sdf.where(lbl.isin(labels_key))
                .select(lbl.alias("__k__")).distinct().collect()
            }
            missing = [k for k in labels_key if k not in matched]
            cols = col_key if isinstance(col_key, list) else [col_key]
            if missing:
                if not scalar_row:
                    raise KeyError(f"{missing} not in index")
                # scalar enlargement: append a row that is NaN everywhere
                # except the assigned column(s)
                import numpy as _np

                from modin_spark.pandas import concat
                from modin_spark.pandas.io import from_pandas

                if not fr.index_cols and int(row_key) != fr.count_rows():
                    # gap label ([0,1] -> [0,1,5]): pandas enlarges anyway —
                    # materialize the positional labels as an index level
                    # first, then the labeled append below applies
                    from modin_spark.core.frame import fresh_names as _fnm

                    lc = _fnm(1)[0]
                    base = fr.with_pandas_labels(lc)
                    fr = base._same_rows(base.sdf, index_cols=[lc], index_names=[None])
                    self._df._frame = fr
                row = _pd.DataFrame(
                    [[_np.nan] * len(fr.columns)], columns=list(fr.columns),
                    index=_pd.Index([row_key],
                                    name=fr.index_names[0] if fr.index_cols else None))
                vlist = (list(value)
                         if isinstance(value, (list, tuple, np.ndarray)) and len(cols) > 1
                         else [value] * len(cols))
                for c, v in zip(cols, vlist):
                    row[c] = v
                if fr.index_cols:
                    appended = concat([self._df, from_pandas(row)])
                else:
                    appended = concat(
                        [self._df, from_pandas(row.reset_index(drop=True))],
                        ignore_index=True)
                self._df._frame = appended._frame
                return
            colset = set(fr.positions_of(cols))
            pos_to_col = dict(zip(fr.positions_of(cols), cols))
            is_listy = isinstance(value, (list, tuple, np.ndarray))
            val2d = None
            if is_listy and len(value) and isinstance(value[0], (list, tuple, np.ndarray)):
                val2d = [list(r) for r in value]  # (rows x cols) block
                if len(val2d) != len(labels_key) or any(len(r) != len(cols) for r in val2d):
                    raise ValueError("shape mismatch in loc assignment")
            elif is_listy and not scalar_row and len(labels_key) > 1:
                if len(value) != len(labels_key):
                    raise ValueError("shape mismatch in loc assignment")
            elif is_listy and scalar_row and isinstance(col_key, list):
                if len(value) != len(cols):
                    raise ValueError("shape mismatch in loc assignment")

            def _assigned(pos, base):
                ci = cols.index(pos_to_col[pos])
                if val2d is not None:
                    e = base
                    for k, r in zip(labels_key, val2d):
                        e = F.when(lbl.eqNullSafe(F.lit(k)), F.lit(r[ci])).otherwise(e)
                    return e
                if is_listy and not scalar_row and len(labels_key) > 1:
                    e = base
                    for k, v in zip(labels_key, value):
                        e = F.when(lbl.eqNullSafe(F.lit(k)), F.lit(v)).otherwise(e)
                    return e
                v = value[ci] if (is_listy and scalar_row and isinstance(col_key, list)) else (
                    value[0] if is_listy else value)
                return F.when(lbl.isin(labels_key), F.lit(v)).otherwise(base)

            out_labels = list(fr.columns)
            exprs = []
            for i in range(len(out_labels)):
                base = F.col(work.data_cols[i])
                exprs.append(_assigned(i, base) if i in colset else base)
            self._df._frame = work.project(out_labels, exprs)
            return
        cols = col_key if isinstance(col_key, list) else [col_key]
        for c in cols:
            cur = self._df[c]
            self._df[c] = cur.mask(row_key, value)

    def __getitem__(self, key):
        from modin_spark.pandas.dataframe import DataFrame

        if callable(key):
            # pandas: loc[callable] applies it to the frame first
            key = key(self._df)
        elif isinstance(key, tuple) and len(key) == 2 and callable(key[0]):
            key = (key[0](self._df), key[1])
        fr = self._df._frame
        # pd.IndexSlice row keys: a full-depth tuple with slice/list elements
        # compiles to one conjunctive filter over the level columns (all
        # levels stay in the result index, pandas semantics)
        rk = key[0] if (isinstance(key, tuple) and len(key) == 2
                        and isinstance(key[0], tuple)) else key
        if (isinstance(rk, tuple) and len(fr.index_cols) > 1
                and len(rk) == len(fr.index_cols)
                and any(isinstance(k, (slice, list)) for k in rk)
                and all(not isinstance(k, Series) for k in rk)):
            cond = None
            for c, k in zip(fr.index_cols, rk):
                if isinstance(k, slice):
                    if k.start is None and k.stop is None:
                        continue
                    e = F.lit(True)
                    if k.start is not None:
                        e = e & (F.col(c) >= F.lit(k.start))
                    if k.stop is not None:
                        e = e & (F.col(c) <= F.lit(k.stop))
                elif isinstance(k, list):
                    e = F.col(c).isin(k)
                else:
                    e = F.col(c) == F.lit(k)
                cond = e if cond is None else (cond & e)
            from modin_spark.pandas.dataframe import DataFrame as _DF

            filtered = _DF(_frame=fr if cond is None else fr.filter(cond))
            if rk is not key and not (isinstance(key[1], slice) and key[1] == slice(None)):
                if isinstance(key[1], (list, slice)):
                    return filtered.loc[:, key[1]]
                return filtered[key[1]]  # scalar column -> Series
            return filtered
        # full-depth MultiIndex row label: loc[(k1, k2)] on a 2-level index
        # (reference keeps the whole MultiIndex in pandas partitions; here the
        # levels are ordinary key columns, so the lookup is a conjunctive
        # filter that pushes down to the scan)
        if (
            isinstance(key, tuple)
            and len(fr.index_cols) > 1
            and len(key) <= len(fr.index_cols)
            and all(not isinstance(k, (slice, list, Series)) for k in key)
            # pandas disambiguation: a SHORT tuple whose trailing element is
            # a column label is a (row indexer, column indexer) pair, not a
            # partial row key over the leading index levels
            and not (len(key) < len(fr.index_cols) and key[-1] in set(fr.columns))
        ):
            cond = None
            for c, v in zip(fr.index_cols, key):
                e = F.col(c) == F.lit(v)
                cond = e if cond is None else (cond & e)
            out = fr.filter(cond)
            if len(key) == len(fr.index_cols):
                # pandas: a UNIQUE full-depth match is the ROW as a Series
                # (point lookup — inherently a driver materialization, same
                # eager contract as .at); duplicate matches stay a frame
                pdf = DataFrame(_frame=out._same_rows(
                    out.sdf, index_cols=[], index_names=[None])).to_pandas()
                if len(pdf) == 1:
                    row = pdf.iloc[0]
                    row.name = key
                    return row
                if len(pdf) == 0:
                    raise KeyError(key)
                out = out._same_rows(out.sdf, index_cols=[], index_names=[None])
            else:
                # PARTIAL tuple: the matched leading levels drop out of the
                # index, the remaining levels stay (pandas partial indexing)
                rest = len(key)
                out = out._same_rows(out.sdf,
                                     index_cols=list(fr.index_cols[rest:]),
                                     index_names=list(fr.index_names[rest:]))
            return DataFrame(_frame=out)
        if (
            isinstance(key, list)
            and len(fr.index_cols) > 1
            and key
            and all(isinstance(k, tuple) and len(k) == len(fr.index_cols) for k in key)
        ):
            # list of full-depth tuples: OR of conjunctive filters (a k-term
            # pushdown-friendly predicate, k = len(key) — driver-provided)
            cond = None
            for tup in key:
                e = None
                for c, v in zip(fr.index_cols, tup):
                    t = F.col(c) == F.lit(v)
                    e = t if e is None else (e & t)
                cond = e if cond is None else (cond | e)
            return DataFrame(_frame=fr.filter(cond))
        row_key, col_key = key if isinstance(key, tuple) else (key, slice(None))

        if isinstance(col_key, slice) and col_key == slice(None):
            col_pos = list(range(len(fr.columns)))
        elif isinstance(col_key, list):
            col_pos = fr.positions_of(col_key)
        elif not isinstance(col_key, slice):
            col_pos = fr.positions_of([col_key])
        else:
            # label slice over columns: loc[:, "a":"c"] — inclusive bounds
            cols = list(fr.columns)
            lo = cols.index(col_key.start) if col_key.start is not None else 0
            hi = cols.index(col_key.stop) + 1 if col_key.stop is not None else len(cols)
            col_pos = list(range(lo, hi))

        if isinstance(row_key, Series):  # boolean mask
            filtered = self._df[row_key]
            out = filtered._frame.select_positions(col_pos)
        elif isinstance(row_key, slice) and row_key == slice(None):
            out = fr.select_positions(col_pos)
        elif isinstance(row_key, (list, np.ndarray)) and len(row_key) and all(
                isinstance(v, (bool, np.bool_)) for v in row_key):
            # boolean mask list: positional filter (pandas loc[[True, ...]])
            pos_fr = fr.with_global_position("__pos__")
            keep = [i for i, flag in enumerate(row_key) if flag]
            out = fr._subset_rows(
                pos_fr.sdf.where(F.col("__pos__").isin(keep)).drop("__pos__")
            ).select_positions(col_pos)
        elif isinstance(row_key, list):
            from modin_spark.core.frame import ORDER_COL as _OC

            # pandas loc[list] returns rows in the ORDER OF THE KEYS
            karr = F.array(*[F.lit(v) for v in row_key])
            if not fr.index_cols:
                # default index: true pandas labels (gaps after filters, the
                # labels_col stash after sorts, positions for scan lineage).
                # The permuted labels stay stashed for display/chaining.
                from modin_spark.core.frame import fresh_names as _fnames

                lc = _fnames(1)[0]
                pos_fr = fr.with_pandas_labels(lc)
                sdf = pos_fr.sdf.where(F.col(lc).isin(row_key)).withColumn(
                    _OC, F.array_position(karr, F.col(lc)))
                out = fr._subset_rows(sdf, has_order=True).select_positions(col_pos)
                out.order_is_position = False
                out.labels_col = lc
            else:
                fr2 = fr.ensure_order()
                cond = F.col(fr2.index_cols[0]).isin(row_key)
                sdf = fr2.sdf.where(cond).withColumn(
                    _OC, F.struct(F.array_position(karr, F.col(fr2.index_cols[0])),
                                  F.col(_OC)))
                out = fr2._subset_rows(sdf, has_order=True).select_positions(col_pos)
        elif isinstance(row_key, slice):
            # label slice: inclusive both ends; datetime indexes accept
            # pandas partial-string bounds ("2024-01" spans the whole month)
            import pandas as pd
            from pyspark.sql import types as T

            if not fr.index_cols:
                start = int(row_key.start) if row_key.start is not None else 0
                stop = int(row_key.stop) + 1 if row_key.stop is not None else (1 << 62)
                out = fr.slice_positions(start, stop, row_key.step or 1).select_positions(col_pos)
            else:
                c = F.col(fr.index_cols[0])
                is_ts = isinstance(
                    fr.schema_map[fr.index_cols[0]],
                    (T.TimestampType, T.TimestampNTZType, T.DateType),
                )

                def bound(v, end):
                    if is_ts and isinstance(v, str):
                        p = pd.Period(v)
                        return (p.end_time if end else p.start_time).to_pydatetime()
                    return v

                cond = F.lit(True)
                if row_key.start is not None:
                    cond = cond & (c >= F.lit(bound(row_key.start, False)))
                if row_key.stop is not None:
                    cond = cond & (c <= F.lit(bound(row_key.stop, True)))
                out = fr.filter(cond).select_positions(col_pos)
        else:
            if not fr.index_cols:
                # default index: scalar LABEL lookup (pandas labels survive
                # filters and sorts via order_is_position / labels_col)
                pos_fr = fr.with_pandas_labels("__pos__")
                out = fr._subset_rows(
                    pos_fr.sdf.where(F.col("__pos__") == int(row_key)).drop("__pos__")
                ).select_positions(col_pos)
                if not isinstance(col_key, (slice, list)):
                    s = Series._from_frame(out)
                    vals = s.head(2).to_pandas()
                    if len(vals) == 0:
                        raise KeyError(row_key)
                    if len(vals) == 1:
                        return vals.iloc[0]
                    return s
                if isinstance(col_key, slice) and col_key == slice(None):
                    # pandas: loc[scalar] yields the ROW as a Series indexed
                    # by the column labels (driver row by definition)
                    row = out.to_pandas()
                    if len(row) == 0:
                        raise KeyError(row_key)
                    if len(row) == 1:
                        return row.iloc[0]
                from modin_spark.pandas.dataframe import DataFrame as _DF

                return _DF(_frame=out)
            cond = F.col(fr.index_cols[0]) == F.lit(row_key)
            out = fr.filter(cond)
            if len(fr.index_cols) > 1:
                # partial key on a MultiIndex: matched level drops (pandas)
                out = out._same_rows(out.sdf, index_cols=fr.index_cols[1:],
                                     index_names=fr.index_names[1:])
            out = out.select_positions(col_pos)

        scalar_row = not isinstance(row_key, (slice, list, Series, tuple))
        if not isinstance(col_key, (slice, list)):
            s = Series._from_frame(out)
            if scalar_row:
                # pandas: loc[scalar, scalar] is a SCALAR for a unique label,
                # a Series for duplicate labels (driver cell by definition)
                vals = s.head(2).to_pandas()
                if len(vals) == 0:
                    raise KeyError(row_key)
                if len(vals) == 1:
                    return vals.iloc[0]
            return s
        if scalar_row and isinstance(col_key, slice) and col_key == slice(None):
            # pandas: loc[scalar] yields the row as a column-indexed Series
            row = DataFrame(_frame=out).head(2).to_pandas()
            if len(row) == 0:
                raise KeyError(row_key)
            if len(row) == 1:
                return row.iloc[0]
        return DataFrame(_frame=out)


class _SeriesLocWrapper:
    """Series.loc / Series.iloc: route through the frame indexers on the
    1-column projection, unwrap 1-column results back to Series/scalar."""

    def __init__(self, s, positional: bool):
        self._s = s
        self._positional = positional

    def __setitem__(self, key, value):
        # in-place series write: run the frame-level conditional projection
        # on the 1-column view, then rebind this series to the result
        df = self._s.to_frame("__s__")
        if self._positional:
            df.iloc[key if isinstance(key, tuple) else (key, 0)] = value
        else:
            df.loc[key if isinstance(key, tuple) else (key, "__s__")] = value
        nf = df._frame
        self._s._frame = nf
        self._s._expr = F.col(nf.data_cols[0])
        self._s._refs = set(nf.data_cols)

    def __getitem__(self, key):
        from modin_spark.pandas.dataframe import DataFrame

        df = self._s.to_frame("__s__")
        idx = df.iloc if self._positional else df.loc
        if isinstance(key, tuple):
            res = idx[key]
        elif self._positional:
            # scalar position -> scalar cell; everything else -> frame route
            res = idx[key, 0] if isinstance(key, int) else idx[key]
        else:
            res = idx[key, :]
        if isinstance(res, DataFrame):
            if len(res._frame.columns) == 1:
                out = res["__s__"]
                # scalar label lookup -> scalar (pandas); missing -> KeyError
                if not self._positional and not isinstance(key, (slice, list, Series)):
                    vals = out.head(2).to_pandas()
                    if len(vals) == 1:
                        return vals.iloc[0]
                    if len(vals) == 0:
                        raise KeyError(key)
                return out.rename(self._s._name)
            return res
        if isinstance(res, Series):
            scalar_key = not isinstance(key, (slice, list, tuple))
            if scalar_key:
                vals = res.to_pandas()
                if len(vals) == 1:
                    return vals.iloc[0]
            return res.rename(self._s._name)
        if isinstance(res, pd.Series):
            # the frame indexer now returns a pandas ROW Series for unique
            # scalar labels — for the 1-column wrapper that row holds one
            # cell, the scalar
            return res.iloc[0] if len(res) == 1 else res
        return res
