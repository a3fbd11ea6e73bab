"""sklearn-adjacent helpers (reference: modin/experimental/sklearn/
model_selection/train_test_split.py:18 — a POSITIONAL head/tail split, not
sklearn's shuffled split).

Spark shape: both halves are iloc slices of one ordered plan — the
positional filter composes with the scan, no shuffle, no driver collect.
"""

from __future__ import annotations


def train_test_split(df, **options):
    """Split ``df`` into a leading train slice and trailing test slice.

    ``train_size`` (default 0.75) is the leading fraction, exactly the
    reference semantics (contiguous rows, no shuffling — callers wanting a
    randomized split sample/shuffle first).
    """
    train_size = options.get("train_size", 0.75)
    n = len(df)
    cut = int(n * train_size)
    train = df.iloc[:cut]
    test = df.iloc[cut:]
    return train, test
