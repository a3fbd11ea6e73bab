"""Randomized-workflow differential testing (fuzzydata-style).

The reference CI runs fuzzydata: generate random multi-step dataframe
workflows and cross-check engines (ref modin/experimental/fuzzydata/,
.github/workflows/fuzzydata-test.yml).  Same idea here: seeded random
chains of filter / assign / groupby-agg / merge / sort / dedup / fillna
steps executed by BOTH pandas and modin_spark, compared order-insensitively
at every chain end.  Seeds are fixed — failures reproduce exactly.
"""

import numpy as np
import pandas as pd
import pytest

import modin_spark.pandas as mpd

N_WORKFLOWS = 24
MAX_STEPS = 4


def _base(rng):
    n = int(rng.integers(5, 60))
    return pd.DataFrame(
        {
            "a": rng.integers(-20, 20, n),
            "b": np.where(rng.random(n) < 0.2, np.nan, rng.random(n) * 10),
            "k": rng.choice(list("uvw"), n),
            # ~10% NaN keys: exercises pandas' NaN-matches-NaN merge
            # semantics and NaN-group handling through every chain
            "g": np.where(rng.random(n) < 0.1, np.nan, rng.integers(0, 4, n).astype(float)),
        }
    )


def _dim(rng):
    return pd.DataFrame({"g": [0.0, 1, 2, 3, np.nan], "label": list("ABCDE")})


# each step: (name, pandas_fn, modin_fn) — same signature, returns the frame
def _steps(rng):
    thr = float(rng.uniform(-15, 15))
    q = float(rng.uniform(2, 8))
    agg = rng.choice(["sum", "mean", "min", "max", "count"])
    asc = bool(rng.integers(0, 2))

    def filter_a(df):
        return df[df.a > thr]

    def assign_expr(df):
        out = df.copy() if isinstance(df, pd.DataFrame) else df
        out["c"] = out.a * 2 + 1
        return out

    def fill_b(df):
        out = df.copy() if isinstance(df, pd.DataFrame) else df
        out["b"] = out.b.fillna(q)
        return out

    def group_agg(df):
        cols = [c for c in ["a", "b", "c"] if c in list(df.columns)]
        if not cols or "g" not in list(df.columns):
            return df
        return df.groupby("g").agg({c: agg for c in cols}).reset_index()

    def sort_head(df):
        cols = [c for c in ["a", "g"] if c in list(df.columns)]
        if not cols:
            return df
        return df.sort_values(cols, ascending=asc).head(10)

    def dedup(df):
        sub = [c for c in ["k", "g"] if c in list(df.columns)]
        return df.drop_duplicates(subset=sub) if sub else df

    def merge_dim(df):
        if "g" not in list(df.columns):
            return df
        dim = _dim(rng)
        dimf = dim if isinstance(df, pd.DataFrame) else mpd.from_pandas(dim)
        return df.merge(dimf, on="g", how="left")

    def cum_a(df):
        if "a" not in list(df.columns):
            return df
        out = df.copy() if isinstance(df, pd.DataFrame) else df
        out["a_cum"] = out.a.cumsum()
        return out

    def shift_a(df):
        if "a" not in list(df.columns):
            return df
        out = df.copy() if isinstance(df, pd.DataFrame) else df
        out["a_prev"] = out.a.shift(1)
        return out

    def rank_a(df):
        if "a" not in list(df.columns):
            return df
        out = df.copy() if isinstance(df, pd.DataFrame) else df
        out["a_rank"] = out.a.rank(method="min")
        return out

    def subset_binary(df):
        # r12: binary operands with DIFFERING row sets outer-align; the
        # assignment then reindexes to the frame's own labels
        if "a" not in list(df.columns):
            return df
        out = df.copy() if isinstance(df, pd.DataFrame) else df
        out["a2"] = out.a + out[out.a > 0].a
        return out

    def where_flip(df):
        if "a" not in list(df.columns):
            return df
        out = df.copy() if isinstance(df, pd.DataFrame) else df
        out["a"] = out.a.where(out.a > 0, -out.a)
        return out

    def roll_b(df):
        if "b" not in list(df.columns):
            return df
        out = df.copy() if isinstance(df, pd.DataFrame) else df
        out["b_roll"] = out.b.rolling(3, min_periods=1).mean()
        return out

    def concat_self(df):
        if isinstance(df, pd.DataFrame):
            return pd.concat([df, df.head(3)], ignore_index=True)
        return mpd.concat([df, df.head(3)], ignore_index=True)

    def set_reset(df):
        if "k" not in list(df.columns):
            return df
        return df.set_index("k").reset_index()

    def rename_cols(df):
        return df.rename(columns={"a": "A"}).rename(columns={"A": "a"})

    def tail_sort(df):
        cols = [c for c in ["b", "a"] if c in list(df.columns)]
        if not cols:
            return df
        # kind='mergesort': a STABLE tie order — pandas' default quicksort
        # picks an arbitrary tie subset at the tail cut; the engine is
        # always stable (ORDER tiebreak), so pin pandas to the same contract
        return df.sort_values(cols[0], na_position="first", kind="mergesort").tail(12)

    pool = [filter_a, assign_expr, fill_b, group_agg, sort_head, dedup, merge_dim,
            cum_a, shift_a, rank_a, subset_binary, where_flip, roll_b,
            concat_self, set_reset, rename_cols, tail_sort]
    k = int(rng.integers(2, MAX_STEPS + 1))
    return [pool[i] for i in rng.integers(0, len(pool), k)]


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df.reset_index(drop=True)
    out = out[sorted(out.columns)]
    return out.sort_values(list(out.columns), na_position="last").reset_index(drop=True)


@pytest.mark.parametrize("seed", range(N_WORKFLOWS))
def test_random_workflow(spark, seed):
    rng = np.random.default_rng(1000 + seed)
    pdf = _base(rng)
    steps = _steps(rng)

    p = pdf
    m = mpd.from_pandas(pdf)
    for fn in steps:
        p = fn(p)
        m = fn(m)
    got = _normalize(m.to_pandas())
    exp = _normalize(p)
    # count aggs come back int64 vs float after NaN paths — compare loosely
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, atol=1e-9, check_column_type=False)
