"""Vectorized UDAFs (series→scalar pandas_udf used inside
``groupBy().agg()`` — Spark's Arrow grouped-agg path).

NOTE: deliberately NO ``from __future__ import annotations`` here —
pandas_udf resolves the type hints at definition time, and PEP-563
stringified hints make it raise UNSUPPORTED_SIGNATURE (same pitfall
documented at `plans/catalog_llm.pandas_udf_norm_embeddings`).

The exact-integer recipe applies to aggregates too: compute in integer
micro-units with explicit tie semantics, and a Python aggregate becomes
value-hash checkable against a SQL oracle.
"""

import pandas as pd

from pyspark.sql.functions import pandas_udf


@pandas_udf("long")
def median_micro(v: pd.Series) -> int:
    """Exact median of an integer micro-unit column with
    floor((m1+m2)/2) even-count semantics (m1/m2 = the two middle order
    statistics) — deterministic integers, no float interpolation."""
    s = v.sort_values().reset_index(drop=True)
    n = len(s)
    m1 = int(s[(n + 1) // 2 - 1])
    m2 = int(s[(n + 2) // 2 - 1])
    return (m1 + m2) // 2


@pandas_udf("long")
def n_rows(v: pd.Series) -> int:
    """Row count as a pandas UDAF — Spark refuses to mix grouped-agg
    pandas UDFs with built-in aggregates in one agg(), so companions
    ride the same Arrow path."""
    return len(v)
