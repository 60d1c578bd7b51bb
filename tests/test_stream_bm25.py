"""Property tests for the streaming-maintained BM25 index
(ext/text.py merge_bm25_batch / q_stream_bm25_maintain): the
replay-idempotence and reset-guard contracts of merge_hourly_batch
applied to the text index, plus maintained-serve == one-shot batch
build equality."""

from __future__ import annotations

import os

import pytest

from tests.conftest import SF_DIR


def _split_docs(spark, n):
    from data_ingestor_spark.plans.registry import load_table

    d = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    return [d.filter(d.doc_id % n == i) for i in range(n)]


def _apply_all(spark, root, batches):
    from data_ingestor_spark.ext.text import merge_bm25_batch

    for i, b in enumerate(batches):
        assert merge_bm25_batch(spark, root, b, i) is True


def test_maintained_equals_batch_build(spark, tmp_path):
    """Sequential merges over a 3-way split serve exactly q_text_bm25's
    top-20 — segment flush + dictionary merge + pruned serve ≡ one-shot
    build."""
    from data_ingestor_spark.ext.text import bm25_query_maintained, q_text_bm25

    root = str(tmp_path / "idx")
    _apply_all(spark, root, _split_docs(spark, 3))
    got = [tuple(r) for r in bm25_query_maintained(spark, root).collect()]
    want = [tuple(r) for r in q_text_bm25(spark, SF_DIR).collect()]
    assert got == want and len(got) == 20


def test_replayed_batch_is_noop(spark, tmp_path):
    """A replayed batch id (foreachBatch at-least-once) must not
    double-count df/N/sum_dl or duplicate postings rows."""
    from data_ingestor_spark.ext.text import bm25_query_maintained, merge_bm25_batch
    from data_ingestor_spark.sinks import latest_version

    root = str(tmp_path / "idx")
    batches = _split_docs(spark, 2)
    _apply_all(spark, root, batches)
    before = [tuple(r) for r in bm25_query_maintained(spark, root).collect()]
    v_before = latest_version(os.path.join(root, "dict"))
    # replay the LAST batch (the crash-after-publish case): no-op
    assert merge_bm25_batch(spark, root, batches[1], 1) is False
    assert latest_version(os.path.join(root, "dict")) == v_before
    after = [tuple(r) for r in bm25_query_maintained(spark, root).collect()]
    assert after == before


def test_segment_rewrite_is_idempotent(spark, tmp_path):
    """A crash AFTER the segment write but BEFORE the dictionary
    publish replays into an identical segment rewrite + the dictionary
    merge — final state equals the clean run (the commit-point
    ordering contract)."""
    from data_ingestor_spark.ext.text import bm25_query_maintained, merge_bm25_batch

    batches = _split_docs(spark, 2)
    clean = str(tmp_path / "clean")
    _apply_all(spark, clean, batches)

    crashed = str(tmp_path / "crashed")
    assert merge_bm25_batch(spark, crashed, batches[0], 0) is True
    # simulate the torn batch: segment 1 written, dictionary not published
    seg_dir = os.path.join(crashed, "postings", "b=1")
    from data_ingestor_spark.ext.text import _BM25_BUCKETS, _tokenize_docs
    from pyspark.sql import functions as F

    docs = _tokenize_docs(batches[1])
    (
        docs.select("doc_id", "dl", F.explode("toks").alias("term"))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").cast("double").alias("tf"))
        .withColumn(
            "bucket",
            F.expr(
                "pmod(cast(conv(substring(md5(term), 1, 8), 16, 10) as bigint),"
                f" {_BM25_BUCKETS})"
            ),
        )
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(seg_dir)
    )
    # replay of batch 1 sees applied_bid 0 < 1: rewrites the segment,
    # publishes the dictionary — lands exactly where the clean run did
    assert merge_bm25_batch(spark, crashed, batches[1], 1) is True
    got = [tuple(r) for r in bm25_query_maintained(spark, crashed).collect()]
    want = [tuple(r) for r in bm25_query_maintained(spark, clean).collect()]
    assert got == want


def test_reset_checkpoint_guard_raises(spark, tmp_path):
    """A batch id far behind applied_bid means a reset checkpoint
    against live state: must raise, not silently skip every batch."""
    from data_ingestor_spark.ext.text import merge_bm25_batch

    root = str(tmp_path / "idx")
    batches = _split_docs(spark, 4)
    for i, b in enumerate(batches):
        merge_bm25_batch(spark, root, b, i)
    with pytest.raises(ValueError, match="reset"):
        merge_bm25_batch(spark, root, batches[0], 0)
