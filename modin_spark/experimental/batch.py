"""Batch pipeline API — parity with the reference's experimental batch
pipelining surface (/root/reference/modin/experimental/batch/pipeline.py:30
``PandasQuery``, :88 ``PandasQueryPipeline``).

Spark-first re-expression: every query is a whole-row-partition pandas
function, so each node is ONE ``mapInPandas`` pass (Arrow-batched, the
batches of a partition coalesced to honor the reference's per-partition
contract); ``fan_out`` replicates a single-partition frame across
``num_partitions`` tasks with the partition id and reduces the concatenated
results; outputs stay lazy Spark plans until materialized. Output schemas
are inferred by running the user function on a driver-side sample — the
same sampling contract the groupby.apply machinery uses.
"""

from __future__ import annotations

import warnings
from typing import Callable, Optional

import pandas as pd


class PandasQuery:
    """One node of a batch pipeline (ref pipeline.py:30). ``func`` takes a
    pandas DataFrame (one row partition) and returns a pandas DataFrame."""

    def __init__(
        self,
        func: Callable,
        is_output: bool = False,
        repartition_after: bool = False,
        fan_out: bool = False,
        pass_partition_id: bool = False,
        reduce_fn: Optional[Callable] = None,
        output_id: Optional[int] = None,
    ):
        if fan_out and reduce_fn is None:
            raise ValueError("`fan_out` requires a `reduce_fn`.")
        self.func = func
        self.is_output = is_output
        self.repartition_after = repartition_after
        self.fan_out = fan_out
        self.pass_partition_id = pass_partition_id
        self.reduce_fn = reduce_fn
        self.output_id = output_id


class PandasQueryPipeline:
    """Row-parallel batch pipeline (ref pipeline.py:88). Queries are applied
    along the row axis, partition-wise, one ``mapInPandas`` stage each."""

    def __init__(self, df, num_partitions: Optional[int] = None):
        from modin_spark.session import get_spark

        self.df = df
        self.num_partitions = num_partitions or get_spark().sparkContext.defaultParallelism
        self.query_list: list[PandasQuery] = []
        self.is_output_id_specified = False

    def update_df(self, df):
        """Swap the input frame (ref pipeline.py:125); queries are reusable."""
        self.df = df

    def add_query(
        self,
        func: Callable,
        is_output: bool = False,
        repartition_after: bool = False,
        fan_out: bool = False,
        pass_partition_id: bool = False,
        reduce_fn: Optional[Callable] = None,
        output_id: Optional[int] = None,
    ):
        if not is_output and output_id is not None:
            raise ValueError("Output ID cannot be specified for non-output node.")
        if is_output:
            has_outputs = any(q.is_output for q in self.query_list)
            if output_id is None and self.is_output_id_specified:
                raise ValueError("Output ID must be specified for all nodes.")
            if output_id is not None and has_outputs and not self.is_output_id_specified:
                raise ValueError("Output ID must be specified for all nodes.")
            if output_id is not None:
                self.is_output_id_specified = True
        self.query_list.append(
            PandasQuery(func, is_output, repartition_after, fan_out, pass_partition_id, reduce_fn, output_id)
        )

    # ------------------------------------------------------------------ exec
    @staticmethod
    def _schema_of(pdf: pd.DataFrame):
        from pyspark.sql import types as T

        from modin_spark.core.frame import pandas_dtype_to_spark

        return T.StructType([T.StructField(str(c), pandas_dtype_to_spark(pdf[c].dtype)) for c in pdf.columns])

    @staticmethod
    def _map_partitions(sdf, func, schema, pass_pid: bool):
        """One mapInPandas stage; a partition's Arrow batches are coalesced
        so ``func`` sees the whole row partition (the reference contract)."""

        def gen(batches):
            from pyspark import TaskContext

            parts = list(batches)
            if not parts:
                return
            pdf = pd.concat(parts, ignore_index=True) if len(parts) > 1 else parts[0]
            out = func(pdf, TaskContext.get().partitionId()) if pass_pid else func(pdf)
            yield out.reset_index(drop=True)

        return sdf.mapInPandas(gen, schema)

    def compute_batch(
        self,
        postprocessor: Optional[Callable] = None,
        pass_partition_id: bool = False,
        pass_output_id: bool = False,
    ):
        """Run the pipeline; returns ``{output_id: DataFrame}`` when ids are
        specified, else a list of DataFrames (ref pipeline.py:288)."""
        from modin_spark.pandas.io import from_pandas, from_spark
        from modin_spark.session import get_spark

        outputs = [q for q in self.query_list if q.is_output]
        if not outputs:
            warnings.warn(
                "No outputs to compute. Returning an empty list. Please specify outputs "
                "by calling `add_query` with `is_output=True`."
            )
            return []
        if pass_output_id and not self.is_output_id_specified:
            raise ValueError(
                "`pass_output_id` is set to True, but output ids have not been specified. "
                "To pass output ids, please specify them using the `output_id` kwarg with pipeline.add_query"
            )

        spark = get_spark()
        cur = self.df.to_spark(ordered=True) if hasattr(self.df, "to_spark") else self.df
        sample = cur.limit(100).toPandas()
        outs: dict | list = {} if self.is_output_id_specified else []
        for q in self.query_list:
            if q.fan_out:
                # single-partition contract (ref: fan_out requires 1 input
                # partition): materialize, replicate across tasks with the
                # partition id, reduce the concatenated results once.
                pdf = cur.toPandas()
                bpdf = spark.sparkContext.broadcast(pdf)
                sample_out = q.func(pdf.copy(), 0)
                schema = self._schema_of(sample_out)
                ids = spark.range(self.num_partitions).repartition(self.num_partitions, "id")

                def fan(batches, _f=q.func, _b=bpdf):
                    for b in batches:
                        for i in b["id"]:
                            yield _f(_b.value.copy(), int(i)).reset_index(drop=True)

                fanned = ids.mapInPandas(fan, schema).toPandas()
                reduced = q.reduce_fn(fanned.reset_index(drop=True))
                cur = from_pandas(pd.DataFrame(reduced)).to_spark(ordered=False)
                sample = cur.limit(100).toPandas()
            else:
                sample = (q.func(sample.copy(), 0) if q.pass_partition_id else q.func(sample.copy())).reset_index(drop=True)
                cur = self._map_partitions(cur, q.func, self._schema_of(sample), q.pass_partition_id)
            if q.repartition_after:
                cur = cur.repartition(self.num_partitions)
            if q.is_output:
                out_sdf = cur
                if postprocessor is not None:
                    extra = []
                    if pass_output_id:
                        extra.append(q.output_id)
                    if pass_partition_id:
                        post = lambda pdf, pid, _p=postprocessor, _e=tuple(extra): _p(pdf, *_e, pid)
                        psample = postprocessor(sample.copy(), *extra, 0)
                        out_sdf = self._map_partitions(out_sdf, post, self._schema_of(psample), True)
                    else:
                        post = lambda pdf, _p=postprocessor, _e=tuple(extra): _p(pdf, *_e)
                        psample = postprocessor(sample.copy(), *extra)
                        out_sdf = self._map_partitions(out_sdf, post, self._schema_of(psample), False)
                res = from_spark(out_sdf)
                if self.is_output_id_specified:
                    outs[q.output_id] = res
                else:
                    outs.append(res)
        return outs
