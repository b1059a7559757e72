"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference's sliding-window
aggregation, SURVEY.md §0, on the events table at sf0.001).
``queries()``/``oracle_sql()`` expose the engine's full catalog —
reference operators (SURVEY.md §2.1), the general analytics surface
(§2.2), and the LLM-pipeline extensions — from
``uw_mapreduce_spark.plans.catalog``.
"""

from __future__ import annotations

import os
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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            apply_runtime_confs(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every hash-checkable query; entries
    without one (sampling, LSH, heuristics, mapInPandas plumbing) get
    the driver's rows-only check."""
    return dict(ORACLE)
