"""String-chain differential fuzz (round-12 continuation): seeded random
chains of str accessor / concat / reorder / dedup steps vs pandas.  The
hunt that seeded this file found: ``+`` on string Series compiled to
numeric plus (all-null), ``.str[i]`` on split() lists applied substring
instead of element_at, and the whole-row dedup fast path dropping the
post-sort label stash."""

import numpy as np
import pandas as pd
import pytest

import modin_spark.pandas as mpd


def _base(rng):
    n = int(rng.integers(4, 40))
    words = ["alpha", "Beta b", "GAMMA-x", "d e f", "", "  pad  ", "q_r", "s.t.u"]
    vals = [None if rng.random() < 0.15
            else words[int(rng.integers(0, len(words)))] + str(int(rng.integers(0, 99)))
            for _ in range(n)]
    return pd.Series(vals)


STEPS = [
    ("upper", lambda s: s.str.upper()),
    ("strip", lambda s: s.str.strip()),
    ("title", lambda s: s.str.title()),
    ("slice", lambda s: s.str.slice(1, 6)),
    ("replace", lambda s: s.str.replace(r"\d+", "#", regex=True)),
    ("pad", lambda s: s.str.pad(8, "left", ".")),
    ("cat_suffix", lambda s: s + "_z"),
    ("split_first", lambda s: s.str.split(" ").str[0]),
    ("fillna", lambda s: s.fillna("NA")),
    ("dropna", lambda s: s.dropna()),
    ("head", lambda s: s.head(12)),
    ("sortv", lambda s: s.sort_values(kind="mergesort")),
    ("dedup", lambda s: s.drop_duplicates()),
    ("mask_len", lambda s: s.mask(s.str.len() > 7, "LONG")),
]


@pytest.mark.parametrize("seed", [500, 508, 510, 516, 524, 532, 547, 561, 575, 589, 601, 613])
def test_string_chain(spark, seed):
    rng = np.random.default_rng(seed)
    ps = _base(rng)
    ms = mpd.Series(ps)
    chain = [STEPS[i] for i in rng.integers(0, len(STEPS), int(rng.integers(2, 5)))]
    p, m = ps, ms
    for _, fn in chain:
        p, m = fn(p), fn(m)
    pd.testing.assert_series_equal(m.to_pandas().sort_index(), p.sort_index(),
                                   check_dtype=False, check_index_type=False,
                                   check_names=False)


def test_string_plus_is_concat(spark):
    ps = pd.Series(["aa", None, "bb"])
    ms = mpd.Series(ps)
    assert (ms + "_z").to_pandas().tolist()[::2] == ["aa_z", "bb_z"]
    assert ("z_" + ms).to_pandas().tolist()[::2] == ["z_aa", "z_bb"]
    assert (ms + mpd.Series(["X", "Y", "Z"])).to_pandas().tolist()[::2] == ["aaX", "bbZ"]
    # numeric + stays arithmetic
    assert (mpd.Series([1, 2]) + mpd.Series([3, 4])).to_pandas().tolist() == [4, 6]


def test_str_getitem_on_lists(spark):
    ps = pd.Series(["a b c", "x y", None])
    ms = mpd.Series(ps)
    for i in (0, -1, 5):
        got = ms.str.split(" ").str[i].to_pandas().fillna("<NA>").tolist()
        exp = ps.str.split(" ").str[i].fillna("<NA>").tolist()
        assert got == exp, i


def test_dedup_after_sort_keeps_labels(spark):
    ps = pd.Series(["b1", "a2", None, "a2"])
    ms = mpd.Series(ps)
    for keep in ("first", "last"):
        exp = ps.dropna().sort_values(kind="mergesort").drop_duplicates(keep=keep)
        got = ms.dropna().sort_values(kind="mergesort").drop_duplicates(keep=keep).to_pandas()
        assert got.index.tolist() == exp.index.tolist()
        assert got.tolist() == exp.tolist()
