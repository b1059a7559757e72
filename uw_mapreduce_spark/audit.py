"""Pipeline audit counters via ``Observation`` — per-gate row accounting
with ZERO extra actions.

The operational problem: a curation pipeline (dedup gate → quality
gate → language gate → budget) must report how many rows each gate
dropped.  Counting per stage with ``.count()`` re-executes the prefix
of the pipeline once per gate — at 100 TB that multiplies the whole
job by the gate count.  Spark's ``Observation`` API attaches metric
expressions to a point IN the plan; they are collected as a side
effect of the ONE real action, so the audit is free.

Usage::

    audit = PipelineAudit()
    df = audit.gate(df, "min_length", F.length("text") >= 200)
    df = audit.gate(df, "lang", F.col("lang") == "en")
    df.write.parquet(...)        # the one action
    audit.report()               # {'min_length': {'rows_in': ..,
                                 #  'rows_kept': ..}, 'lang': {...}}

Each gate gets its own ``Observation`` (the API binds one observe
point per object).  ``report()`` blocks until the metrics exist, so
call it after the action completes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


class PipelineAudit:
    def __init__(self) -> None:
        self._gates: list[tuple[str, Observation]] = []

    def gate(self, df: DataFrame, name: str, keep: Column) -> DataFrame:
        """Filter ``df`` by ``keep``, recording rows_in / rows_kept for
        this gate as observed metrics on the pre-filter point."""
        obs = Observation(name)
        observed = df.observe(
            obs,
            F.count(F.lit(1)).alias("rows_in"),
            F.sum(F.when(keep, 1).otherwise(0)).cast("long").alias("rows_kept"),
        )
        self._gates.append((name, obs))
        return observed.where(keep)

    def report(self) -> dict[str, dict[str, int]]:
        """Metrics per gate (valid after the pipeline's action ran):
        {gate: {rows_in, rows_kept, rows_dropped}}."""
        out: dict[str, dict[str, int]] = {}
        for name, obs in self._gates:
            m = obs.get
            kept = int(m["rows_kept"] or 0)
            out[name] = {
                "rows_in": int(m["rows_in"]),
                "rows_kept": kept,
                "rows_dropped": int(m["rows_in"]) - kept,
            }
        return out
