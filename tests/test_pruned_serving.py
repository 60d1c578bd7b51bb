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


def test_bm25_pruned_equals_in_plan_sibling(spark):
    """Bucketed postings + sidecar stats == the one-scan BM25 plan:
    in-bucket df is the corpus df (a term's postings live entirely in
    its md5 bucket) and the sidecar carries exact N/avgdl."""
    from data_ingestor_spark.ext.text import q_text_bm25, q_text_bm25_pruned

    a = _rows(q_text_bm25(spark, SF_DIR))
    b = _rows(q_text_bm25_pruned(spark, SF_DIR))
    assert a == b
    assert len(a) == 20


def test_bm25_bucket_router_matches_spark_hash(spark):
    """The driver-side bucket router (python hashlib) and the build's
    in-plan bucket expression (Spark md5/conv/pmod) are the same hash —
    the property the pruned scan's completeness rests on."""
    import hashlib

    from data_ingestor_spark.ext.text import _BM25_BUCKETS

    terms = ["customer", "window", "vector", "", "x", "ünïcode", "a b"]
    df = spark.createDataFrame([(t,) for t in terms], "term string")
    got = {
        r["term"]: r["b"]
        for r in df.selectExpr(
            "term",
            "pmod(cast(conv(substring(md5(term), 1, 8), 16, 10) as bigint),"
            f" {_BM25_BUCKETS}) as b",
        ).collect()
    }
    for t in terms:
        expect = int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % _BM25_BUCKETS
        assert got[t] == expect, t


def test_ivfpq_compact_hash_neutral_vs_delete_view(spark):
    """q_sim_ann_ivfpq_compact carries q_sim_ann_ivfpq_delete's oracle
    VERBATIM; pin the equality directly too: the physically compacted,
    pruned-served codes return row-for-row what the anti-join view
    returns — compaction changes layout, not results."""
    from data_ingestor_spark.ext.similarity import (
        q_sim_ann_ivfpq_compact,
        q_sim_ann_ivfpq_delete,
    )

    a = _rows(q_sim_ann_ivfpq_delete(spark, SF_DIR))
    b = _rows(q_sim_ann_ivfpq_compact(spark, SF_DIR))
    assert a == b
    assert len(a) == 10


def test_ivfpq_delete_no_tombstones_equals_plain(spark, tmp_path):
    """With no vec_id in the tombstone class (% 7 == 3), the delete
    view must degenerate to the plain fused IVFADC plan exactly."""
    import numpy as np

    from data_ingestor_spark.ext.similarity import (
        q_sim_ann_ivfpq,
        q_sim_ann_ivfpq_delete,
    )

    rng = np.random.default_rng(23)
    rows = [(0, [float(x) for x in rng.normal(size=16)], 0)]
    vid = 1
    while len(rows) < 61:
        if vid % 7 != 3:
            rows.append((vid, [float(x) for x in rng.normal(size=16)], vid % 4))
        vid += 1
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>, label int")
    df.write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))

    a = _rows(q_sim_ann_ivfpq(spark, str(tmp_path)))
    b = _rows(q_sim_ann_ivfpq_delete(spark, str(tmp_path)))
    assert a == b and len(a) == 10
