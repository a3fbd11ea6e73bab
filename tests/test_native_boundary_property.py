"""Native fast-path THRESHOLD-BOUNDARY property test (round 11, verdict
next-#6): randomized op chains (seed 42) run twice — native path enabled
(frames at/below MODIN_SPARK_NATIVE_MAX_ROWS stay driver-pandas) and hard
disabled (everything through Spark) — and the results must be identical at
4999 / 5000 / 5001 rows. The sf0.01 oracle never exercises this fork
(it runs above the threshold), so a silent native-vs-Spark divergence
would otherwise be invisible."""

import os

import numpy as np
import pandas as pd
import pytest

import modin_spark.pandas as mpd

THRESHOLD = 5000


def _mkpdf(n: int, seed: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "a": rng.integers(-50, 50, n),
            "b": rng.random(n) * 100,
            "c": np.where(rng.random(n) < 0.2, np.nan, rng.random(n) * 10),
            "k": rng.choice(list("pqrs"), n),
        }
    )


# each step: (name, fn) — fn maps an engine-or-pandas frame to the next one;
# all steps are closed over both pandas and modin_spark frames
STEPS = [
    ("filter_gt", lambda df: df[df["a"] > 0]),
    ("head", lambda df: df.head(1234)),
    ("tail", lambda df: df.tail(987)),
    ("assign_arith", lambda df: df.assign(d=df["bb" if "bb" in df.columns else "b"] * 2 + 1)),
    ("fillna", lambda df: df.fillna(0.5)),
    ("sort_values", lambda df: df.sort_values(["a", "bb" if "bb" in df.columns else "b"])),
    ("rename", lambda df: df.rename(columns={"b": "bb"}) if "b" in df.columns else df),
    ("drop_col", lambda df: df.drop(columns=["c"]) if "c" in df.columns else df),
    ("abs_num", lambda df: df.assign(a=df["a"].abs())),
    ("reset_index", lambda df: df.reset_index(drop=True)),
    ("round2", lambda df: df.round(2)),
    ("dropna", lambda df: df.dropna()),
]


def _run_chain(pdf: pd.DataFrame, chain, engine: bool):
    df = mpd.from_pandas(pdf) if engine else pdf.copy()
    for _, fn in chain:
        df = fn(df)
    out = df.to_pandas() if engine else df
    return out.reset_index(drop=True)


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    # dtype-insensitive but value-exact: engine long/double vs pandas widths
    out = df.copy()
    for c in out.columns:
        if out[c].dtype.kind in "iuf":
            out[c] = out[c].astype("float64")
    return out


@pytest.mark.parametrize("n", [THRESHOLD - 1, THRESHOLD, THRESHOLD + 1])
def test_native_vs_spark_chains_identical_at_boundary(n, spark, monkeypatch):
    rng = np.random.default_rng(42)
    for trial in range(6):
        pdf = _mkpdf(n, seed=100 + trial)
        idx = rng.choice(len(STEPS), size=4, replace=False)
        chain = [STEPS[i] for i in idx]
        names = [s[0] for s in chain]

        monkeypatch.setenv("MODIN_SPARK_NATIVE_MAX_ROWS", str(THRESHOLD))
        got_native = _run_chain(pdf, chain, engine=True)
        monkeypatch.setenv("MODIN_SPARK_NATIVE_MAX_ROWS", "0")
        got_spark = _run_chain(pdf, chain, engine=True)
        want = _run_chain(pdf, chain, engine=False)

        for label, got in (("native", got_native), ("spark", got_spark)):
            try:
                pd.testing.assert_frame_equal(
                    _norm(got), _norm(want), check_dtype=False, check_index_type=False
                )
            except AssertionError as e:
                raise AssertionError(
                    f"{label} path diverged at n={n}, trial={trial}, chain={names}: {e}"
                ) from e


def test_threshold_is_exact(spark, monkeypatch):
    # a frame of exactly THRESHOLD rows defers; THRESHOLD+1 ingests
    monkeypatch.setenv("MODIN_SPARK_NATIVE_MAX_ROWS", str(THRESHOLD))
    at = mpd.from_pandas(_mkpdf(THRESHOLD, 1))
    assert at._frame._sdf is None and at._frame.native_pdf is not None
    over = mpd.from_pandas(_mkpdf(THRESHOLD + 1, 1))
    assert over._frame.native_pdf is None
