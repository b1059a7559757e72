"""Session-5 face-level invariants that the value-hash oracles cannot
express: the MRR ledger identity and modularity's partition sanity."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_mrr_bridge_ledger_identity(spark, sf_small):
    """closing = opening + new + expansion - contraction - churned for
    EVERY month — the property that makes the bridge a ledger."""
    from uw_mapreduce_spark.plans.catalog import QUERIES

    df = QUERIES["mrr_movements_customers"](spark, sf_small)
    bad = df.where(
        F.col("closing_c")
        != F.col("opening_c") + F.col("new_c") + F.col("expansion_c")
        - F.col("contraction_c") - F.col("churned_c")
    ).count()
    assert bad == 0


def test_modularity_contributions_bounded_and_ends_consistent(spark, sf_small):
    """Per-community q contributions lie in [-1e6, 1e6]; internal edge
    ends never exceed the community's degree sum; degree sums add up to
    2m (each edge contributes two ends)."""
    from uw_mapreduce_spark.plans.catalog import QUERIES, _coship_supplier_edges

    df = QUERIES["modularity_nations_suppliers"](spark, sf_small)
    rows = df.collect()
    assert rows, "no communities"
    for r in rows:
        assert -1_000_000 <= r["q_contrib_e6"] <= 1_000_000
        assert 0 <= r["internal_ends"] <= r["degree_sum"]
    m = _coship_supplier_edges(spark, sf_small).count()
    assert sum(r["degree_sum"] for r in rows) == 2 * m


def test_golden_record_covers_every_multi_cluster(spark, sf_small):
    """One golden row per multi-member ER cluster, attributes drawn
    from cluster members."""
    from uw_mapreduce_spark.plans.catalog import QUERIES

    golden = QUERIES["golden_record_parts"](spark, sf_small)
    er = QUERIES["entity_resolution_parts"](spark, sf_small)
    multi = (
        er.groupBy("canonical_key").count().where(F.col("count") >= 2).count()
    )
    rows = golden.collect()
    assert len(rows) == multi
    assert all(r["n_members"] >= 2 for r in rows)
