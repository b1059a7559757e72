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
