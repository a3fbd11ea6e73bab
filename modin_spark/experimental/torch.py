"""Torch-style batched iteration over an engine DataFrame (reference:
modin/experimental/torch/datasets.py:24 ``ModinDataLoader``).

Spark shape: the default sequential pass streams rows from
``toLocalIterator`` in frame order — one partition in flight on the driver
at a time, so a huge frame iterates in bounded memory instead of the
reference's full iloc materialization. A custom torch ``Sampler`` (random
access) falls back to iloc batch lookups (a row-position join per batch);
torch itself is optional and only consulted when a sampler is passed.
"""

from __future__ import annotations

import math
from typing import Hashable, Sequence

import numpy as np

from modin_spark.core.frame import ORDER_COL


class ModinDataLoader:
    """Batch a DataFrame's rows as numpy arrays (torch-DataLoader-shaped)."""

    def __init__(self, df, batch_size: int, features: Sequence[Hashable] = (),
                 sampler=None) -> None:
        if features:
            df = df[list(features)]
        self._df = df
        self._batch_size = batch_size
        self._len = len(df)
        if sampler is not None and isinstance(sampler, type):
            sampler = sampler(df)
        self._sampler = sampler

    def __len__(self):
        n = len(self._sampler) if self._sampler is not None else self._len
        return math.ceil(n / self._batch_size)

    def _iter_sequential(self):
        fr = self._df._frame.ensure_order()
        sdf = fr.sdf.orderBy(ORDER_COL).select(*fr.data_cols)
        rows = []
        # toLocalIterator: one partition resident on the driver at a time —
        # bounded memory at any frame size (a full collect would not be)
        for row in sdf.toLocalIterator(prefetchPartitions=True):
            rows.append(tuple(row))
            if len(rows) == self._batch_size:
                yield np.array(rows)
                rows = []
        if rows:
            yield np.array(rows)

    def __iter__(self):
        if self._sampler is None:
            yield from self._iter_sequential()
            return
        idx_buffer = []
        n = len(self._sampler)
        for cnt, idx in enumerate(self._sampler):
            idx_buffer.append(idx)
            if cnt % self._batch_size == self._batch_size - 1 or cnt == n - 1:
                yield self._df.iloc[idx_buffer].to_numpy()
                idx_buffer = []
