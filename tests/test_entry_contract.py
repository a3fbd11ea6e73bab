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
    """r7: every rows-only query has been promoted to a full oracle row
    (md5-mode minhash/simhash replay, pinned-quantizer ANN) — the scored
    prefix must stay 100% oracle-backed."""
    q = list(entry.queries())
    o = set(entry.oracle_sql())
    no_oracle_in_prefix = [k for k in q[:50] if k not in o]
    assert len(no_oracle_in_prefix) == 0, no_oracle_in_prefix


def test_every_query_has_oracle():
    """The whole registry is oracle-backed as of r7."""
    q = set(entry.queries())
    o = set(entry.oracle_sql())
    assert q <= o, sorted(q - o)
