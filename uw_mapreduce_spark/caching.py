"""Cache-lifecycle helpers.

Multi-pass operators (scalable windowing, similarity joins) persist an
intermediate frame that several downstream subtrees read.  Naked
``persist()`` has two operational problems observed in this engine:

- inside one action, AQE launches the consuming subtrees concurrently
  and they race the cache, recomputing the intermediate up to N times;
- CacheManager entries are never GC'd, so repeated operator invocations
  in a long session accumulate storage until eviction pressure.

``materialize_and_release`` solves both: it eagerly materializes the
*result* with ``localCheckpoint`` (truncating lineage, so every
downstream reference reads one stored copy), then unpersists the
intermediate(s) immediately.  Checkpointed RDD storage is reference-
counted by Spark's ContextCleaner and freed when the returned frame is
garbage-collected — unlike CacheManager entries, nothing outlives its
caller.

Scale note (100 TB): ``localCheckpoint`` stores on executors and does
not survive executor loss.  A production deployment pointing at object
storage would flip this to ``spark.sparkContext.setCheckpointDir`` +
``checkpoint()``; the call structure is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def materialize_and_release(result: DataFrame, *cached: DataFrame) -> DataFrame:
    """Eagerly materialize ``result``, then unpersist every frame in
    ``cached``.  Returns the materialized (lineage-truncated) frame."""
    out = result.localCheckpoint(eager=True)
    for df in cached:
        df.unpersist()
    return out
