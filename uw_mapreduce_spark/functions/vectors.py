"""Vector math over array<float> embedding columns — pure Catalyst
expressions (no Python UDFs): `zip_with` + `aggregate` stay inside
whole-stage codegen and cost nothing to ship to executors.

The reference has no vector support (SURVEY.md §2.2); this is part of
the LLM-data-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.column import Column


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ accumulated in double (exact for float inputs)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
