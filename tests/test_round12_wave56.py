"""Probe wave 56 (round 12): the categorical accessor honors the DECLARED
CategoricalDtype carried from ingest (storage stays plain string; the
category set/order ride the wrapper): categories/ordered/codes use the
declared order, add/remove/reorder/rename/set_categories update the carried
dtype, and to_pandas round-trips category dtype."""

import pandas as pd
import pytest

import modin_spark.pandas as mpd


@pytest.fixture()
def pair():
    cs = pd.Series(pd.Categorical(["a", "b", "a"], categories=["a", "b", "c"]))
    return cs, mpd.Series(cs)


def test_declared_categories_and_codes(pair):
    cs, M = pair
    assert list(M.cat.categories) == list(cs.cat.categories)
    assert M.cat.codes.to_pandas().tolist() == cs.cat.codes.tolist()
    assert str(M.to_pandas().dtype) == str(cs.dtype)


def test_category_set_mutations(pair):
    cs, M = pair
    assert (list(M.cat.add_categories(["d"]).cat.categories)
            == list(cs.cat.add_categories(["d"]).cat.categories))
    assert (list(M.cat.remove_unused_categories().cat.categories)
            == list(cs.cat.remove_unused_categories().cat.categories))
    assert (list(M.cat.rename_categories({"a": "A"}).cat.categories)
            == list(cs.cat.rename_categories({"a": "A"}).cat.categories))
    assert (list(M.cat.set_categories(["b", "a"]).cat.categories)
            == list(cs.cat.set_categories(["b", "a"]).cat.categories))


def test_ordering_mutations(pair):
    cs, M = pair
    assert M.cat.as_ordered().cat.ordered is True
    assert M.cat.as_ordered().cat.as_unordered().cat.ordered is False
    ro = M.cat.reorder_categories(["c", "b", "a"])
    assert list(ro.cat.categories) == ["c", "b", "a"]
    assert (ro.cat.codes.to_pandas().tolist()
            == cs.cat.reorder_categories(["c", "b", "a"]).cat.codes.tolist())
