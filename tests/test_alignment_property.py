"""Alignment property test (round 11): randomized chains of
filter/sort/head/tail on one side, then a cross-frame Series assignment,
binary op, or mask — always compared against real pandas. Locks in the
r11 label-based `align_keyed` semantics (seed 42, 8 trials per shape)."""

import numpy as np
import pandas as pd
import pytest

import modin_spark.pandas as mpd

STEPS = [
    ("sort_a", lambda d: d.sort_values("a")),
    ("sort_b_desc", lambda d: d.sort_values("b", ascending=False)),
    ("filter", lambda d: d[d["a"] % 3 != 0]),
    ("head", lambda d: d.head(40)),
    ("tail", lambda d: d.tail(35)),
    ("identity", lambda d: d),
]


def _mk(n, seed):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({"a": rng.permutation(n), "b": rng.random(n) * 10})


@pytest.mark.parametrize("trial", range(8))
def test_cross_frame_assignment_matches_pandas(trial, spark):
    rng = np.random.default_rng(42 + trial)
    pdf = _mk(60, seed=trial)
    m = mpd.from_pandas(pdf)
    # derive the value side through a random chain
    idx = rng.choice(len(STEPS), size=2, replace=True)
    chain = [STEPS[i] for i in idx]
    p_src, m_src = pdf.copy(), mpd.from_pandas(pdf)
    for _, fn in chain:
        p_src, m_src = fn(p_src), fn(m_src)

    p_out = pdf.copy()
    p_out["z"] = p_src["b"] * 2
    m_out = mpd.from_pandas(pdf)
    m_out["z"] = m_src["b"] * 2
    got = m_out.to_pandas()["z"].fillna(-9).tolist()
    want = p_out["z"].fillna(-9).tolist()
    assert got == want, [s[0] for s in chain]


@pytest.mark.parametrize("trial", range(4))
def test_cross_frame_mask_matches_pandas(trial, spark):
    pdf = _mk(50, seed=100 + trial)
    m = mpd.from_pandas(pdf)
    p_src = pdf.sort_values("a").head(30)
    m_src = mpd.from_pandas(pdf).sort_values("a").head(30)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        want = pdf[(p_src["b"] > 5).reindex(pdf.index, fill_value=False)]
    got = m[m_src["b"] > 5].to_pandas()
    assert sorted(got["a"].tolist()) == sorted(want["a"].tolist())


@pytest.mark.parametrize("trial", range(8))
def test_same_lineage_subset_binary_outer_aligns(trial, spark):
    """r12 continuation: binary operands derived from the SAME frame through
    DIFFERENT row-subset chains must outer-align like pandas (the rebase
    fast path now requires lineage-id equality)."""
    rng = np.random.default_rng(1000 + trial)
    pdf = _mk(50, seed=500 + trial)
    m = mpd.from_pandas(pdf)
    i1, i2 = rng.choice(len(STEPS), size=2, replace=True)
    p1, m1 = STEPS[i1][1](pdf), STEPS[i1][1](m)
    p2, m2 = STEPS[i2][1](pdf), STEPS[i2][1](m)
    want = (p1["b"] + p2["b"]).sort_index()
    got = (m1["b"] + m2["b"]).to_pandas().sort_index()
    assert got.fillna(-9).tolist() == want.fillna(-9).tolist(), (STEPS[i1][0], STEPS[i2][0])


@pytest.mark.parametrize("trial", range(4))
def test_subset_flex_fill_value_matches_pandas(trial, spark):
    pdf = _mk(40, seed=900 + trial)
    m = mpd.from_pandas(pdf)
    p_sub = pdf[pdf["a"] % 2 == 0]
    m_sub = m[m["a"] % 2 == 0]
    want = pdf["b"].add(p_sub["b"], fill_value=100).sort_index()
    got = m["b"].add(m_sub["b"], fill_value=100).to_pandas().sort_index()
    assert np.allclose(got.to_numpy(), want.to_numpy(), equal_nan=True)
