"""Guards on the __spark_entry__ driver contract: every oracle key has a
query, the scored 50-entry prefix stays oracle-dense, and names stay unique
(the driver's correctness gate scores a prefix of queries() — see
COVERAGE.md 'Driver-gate rotation')."""

import __spark_entry__ as entry


def test_oracle_keys_subset_of_queries():
    q = entry.queries()
    o = entry.oracle_sql()
    assert set(o) <= set(q), set(o) - set(q)


def test_query_names_unique_and_callable():
    q = entry.queries()
    assert len(q) == len(set(q))
    assert all(callable(f) for f in q.values())


def test_scored_prefix_is_oracle_dense():
    """At most 5 of the first 50 entries may lack an oracle (the rows-only
    pipeline ops) — the driver's scored slots are too scarce to spend on
    more."""
    q = list(entry.queries())
    o = set(entry.oracle_sql())
    no_oracle_in_prefix = [k for k in q[:50] if k not in o]
    assert len(no_oracle_in_prefix) <= 5, no_oracle_in_prefix
