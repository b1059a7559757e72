"""PipelineAudit (`uw_mapreduce_spark/audit.py`): per-gate counters
collected as a side effect of the single real action."""

from __future__ import annotations

from pyspark.sql import functions as F

from uw_mapreduce_spark.audit import PipelineAudit
from uw_mapreduce_spark.sources.tables import load_table


def test_pipeline_audit_counts_every_gate_in_one_action(spark, sf_small):
    docs = load_table(spark, sf_small, "documents")
    audit = PipelineAudit()
    df = audit.gate(docs, "min_chars", F.col("n_chars") >= 200)
    df = audit.gate(df, "english", F.col("lang") == "en")
    kept = df.count()  # the ONE action

    rep = audit.report()
    total = docs.count()
    n_long = docs.where(F.col("n_chars") >= 200).count()
    n_both = docs.where((F.col("n_chars") >= 200) & (F.col("lang") == "en")).count()

    assert rep["min_chars"] == {
        "rows_in": total, "rows_kept": n_long, "rows_dropped": total - n_long
    }
    assert rep["english"] == {
        "rows_in": n_long, "rows_kept": n_both, "rows_dropped": n_long - n_both
    }
    assert kept == n_both
    # The gates genuinely drop rows (the audit is exercised, not vacuous).
    assert rep["min_chars"]["rows_dropped"] > 0
    assert rep["english"]["rows_dropped"] > 0
