"""Twin-equality pins for the partition-pruned serving layouts: each
pruned key shares its oracle with the in-plan sibling, so beyond the
driver's hash gate we pin DIRECT DataFrame equality at sf0.001 — the
physical layout round trip (partitioned parquet write/read, stored PQ
codes, literal query table) must reproduce the fused plan's rows
bit-for-bit, including order."""

from __future__ import annotations

from tests.conftest import SF_DIR


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_ivf_pruned_equals_in_plan_sibling(spark):
    from data_ingestor_spark.ext.similarity import q_sim_ann_ivf, q_sim_ann_ivf_pruned

    a = _rows(q_sim_ann_ivf(spark, SF_DIR))
    b = _rows(q_sim_ann_ivf_pruned(spark, SF_DIR))
    assert a == b
    assert len(a) == 10


def test_ivfpq_pruned_equals_in_plan_sibling(spark):
    """Stored codes + literal ADC table == fused encode+lookup: the
    IVFADC serving shape loses nothing (q_sim_ann_ivfpq_pruned's
    contract)."""
    from data_ingestor_spark.ext.similarity import (
        q_sim_ann_ivfpq,
        q_sim_ann_ivfpq_pruned,
    )

    a = _rows(q_sim_ann_ivfpq(spark, SF_DIR))
    b = _rows(q_sim_ann_ivfpq_pruned(spark, SF_DIR))
    assert a == b
    assert len(a) == 10
