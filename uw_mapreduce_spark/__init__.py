"""uw_mapreduce_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the *capabilities* of the reference
`mikolajblaz/uw-mapreduce` (a 5-job Hadoop MapReduce sliding-window
aggregation pipeline, `/root/reference/src/SlidingAggregation.java`),
re-expressed Spark-first:

- the reference's operators (sample, quantile borders, range partition,
  total sort, global rank, rebalance, sliding-window aggregate) as
  composable DataFrame functions (``operators/``),
- a scalable, MRC-style two-pass implementation of the unpartitioned
  rank+window path for 100 TB inputs (``operators/scale.py``),
- the general analytics surface a real engine needs (joins, group-bys,
  top-k, set ops — all Catalyst built-ins, exposed in ``plans/``),
- LLM-data-pipeline extensions: dedup (exact / MinHash-LSH / SimHash /
  n-gram Jaccard), embedding similarity search, text analysis, and
  multimodal binary-column plumbing (``operators/dedup.py``,
  ``operators/similarity.py``, ``functions/``),
- a Structured Streaming variant of the sliding aggregation
  (``streaming/``).

No code is copied from the reference; every module cites the reference
file:line whose *behavior* it reproduces.
"""

__version__ = "0.1.0"

from .audit import PipelineAudit  # noqa: E402
from .inspect import plan_digest, schema_drift  # noqa: E402
from .session import apply_runtime_confs, get_spark  # noqa: E402

__all__ = ["PipelineAudit", "apply_runtime_confs", "get_spark",
           "plan_digest", "schema_drift", "__version__"]
