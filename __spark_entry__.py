"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference's sliding-window
aggregation, SURVEY.md §0, on the events table at sf0.001).
``queries()``/``oracle_sql()`` expose the engine's full catalog —
reference operators (SURVEY.md §2.1), the general analytics surface
(§2.2), and the LLM-pipeline extensions — from
``uw_mapreduce_spark.plans.catalog``.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
from collections.abc import Callable

# Make the engine importable regardless of the caller's cwd.
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

from pyspark.sql import DataFrame, SparkSession

from uw_mapreduce_spark.plans.catalog import ORACLE, QUERIES
from uw_mapreduce_spark.plans.reference_pipeline import sliding_events
from uw_mapreduce_spark.session import apply_runtime_confs


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    apply_runtime_confs(spark)
    return sliding_events(spark, "/root/testdata/sf0.001", window=91)


def _last_verified_round() -> tuple[dict[str, int], dict[str, int]]:
    """Per query: (a) highest round with a CLEAN driver row (no error, no
    explicit check failure) and (b) highest round with a clean HASH row
    (full value-hash oracle comparison, not just a rows-only check), from
    the CORRECTNESS_r*.json files committed alongside this file.  A row
    that errored or failed a match does NOT count as verified — the query
    keeps priority 0 so it re-runs next round instead of rotating to the
    back of the queue.  Queries with no clean row anywhere map to 0."""
    last: dict[str, int] = {}
    last_hash: dict[str, int] = {}
    for path in glob.glob(os.path.join(_HERE, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            err = row.get("err")
            checks = [row.get(k) for k in ("rows_match", "schema_match", "hash_match")]
            clean = (err is None or err == "no_oracle") and not any(
                c is False for c in checks
            )
            if clean:
                last[name] = max(last.get(name, 0), rnd)
                if row.get("hash_match") is True:
                    last_hash[name] = max(last_hash.get(name, 0), rnd)
    return last, last_hash


#: Round-10 registrations: sort behind the 3-query round-9 backlog
#: (`knn_graph_persistence_audit`, `shapley_attribution_events`,
#: `streaming_ivm_rollup_events` — VERDICT r9 item 1) so the backlog
#: drains first; all 10 never-verified queries fit this round's slots.
_DEFER_FIRST_SLOT = frozenset(
    {
        "degree_assortativity_suppliers_capped",
        "modularity_nations_suppliers_capped",
        "bernoulli_sample_gate_events",
        "stratified_sample_gate_documents",
        "kvtext_sliding_16_golden",
        "kvtext_sliding_79_golden",
        "streaming_debounce_replay_events",
    }
)


def _rotated_names() -> list[str]:
    """Catalog keys ordered least-recently-verified first.

    The driver verifies the first N registrations each round; with more
    catalog entries than slots, a fixed order starves the tail (round 2
    left 18 queries without a row).  Ordering by last-verified round
    (never-verified first; ties keep catalog order, which is stable) is
    a deterministic round-robin: every query regains a green row within
    ceil(len(catalog)/N) rounds, with no driver cooperation needed.

    Oracle upgrades reset priority: a query that now has a full value-hash
    oracle but whose only clean driver rows were rows-only (its oracle was
    added/ported after its last run) is treated as never-verified, so the
    strengthened check actually executes instead of rotating behind
    newly-registered queries (judge round-5 item 1).

    Queries in ``_DEFER_FIRST_SLOT`` (this round's new registrations)
    sort AFTER every other never-verified query: round 8 left a
    51-query never-verified backlog against 50 driver slots, and a new
    registration's catalog position can otherwise out-rank the backlog
    (judge round-8 item 1 — the slots must drain the backlog first).
    The set is re-pointed at each round's additions and is harmless
    once its members have rows."""
    last, last_hash = _last_verified_round()

    def key_round(n: str) -> int:
        if n in ORACLE and last_hash.get(n, 0) == 0:
            return 0  # oracle added/upgraded since last clean row: re-check now
        return last.get(n, 0)

    names = list(QUERIES)
    pos = {n: i for i, n in enumerate(names)}
    return sorted(
        names, key=lambda n: (key_round(n), n in _DEFER_FIRST_SLOT, pos[n])
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            apply_runtime_confs(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(QUERIES[name]) for name in _rotated_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every hash-checkable query; entries
    without one (sampling, LSH, heuristics, mapInPandas plumbing) get
    the driver's rows-only check."""
    return dict(ORACLE)
