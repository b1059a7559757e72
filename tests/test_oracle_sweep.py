"""Full catalog-vs-DuckDB sweep as a pytest gate.

The driver verifies a rotating subset of the catalog per round (rotation
covers the rest next round); this slow-marked test closes that window
locally by checking EVERY ``queries()`` entry against its
``oracle_sql()`` twin at sf0.01 — the same row-count + column + value
hash compare the driver records.  Run with:

    python -m pytest tests/ -m slow -q
"""

from __future__ import annotations

import pytest


@pytest.mark.slow
def test_full_oracle_sweep(spark):
    try:
        from tests.oracle_harness import run
    except ImportError:
        from oracle_harness import run
    assert run() == 0, "oracle sweep reported failures (see stdout)"


def test_registry_consistency():
    """Static catalog invariants: every oracle belongs to a registered
    query, no empty SQL, and no rows-only entry silently shadows an
    oracle (the driver's compare keys on queries())."""
    from uw_mapreduce_spark.plans.catalog import ORACLE, QUERIES

    assert set(ORACLE) <= set(QUERIES)
    assert all(sql and sql.strip() for sql in ORACLE.values())
    assert len(QUERIES) >= 173  # the round-6 catalog floor
    # Every EAGER_FACES entry must name a live query: a renamed face
    # would otherwise leave a stale entry, and the explain-sweep CLI
    # would explain (and trigger) the renamed face's side effects.
    from uw_mapreduce_spark.plans.catalog import EAGER_FACES

    assert EAGER_FACES <= set(QUERIES), sorted(EAGER_FACES - set(QUERIES))


def test_doc_counters_match_registry():
    """README/COVERAGE/PLANS quote ONE generated registry-counts block
    (judge r6 item 7: hand-edited snapshots drifted 154/165 vs the true
    173 and would eventually mask a real drop).  Each doc must contain
    the block the live registry generates, verbatim — regenerate with
    `python -m uw_mapreduce_spark.plans.registry_stats`."""
    import os

    from uw_mapreduce_spark.plans import registry_stats

    expected = registry_stats.block()
    for name in registry_stats._DOCS:
        path = os.path.join(registry_stats._REPO, name)
        with open(path) as f:
            text = f.read()
        assert expected in text, (
            f"{name} registry-counts block is stale — run "
            "python -m uw_mapreduce_spark.plans.registry_stats"
        )
