"""Property tests for the retrieval family (BM25 / incremental BM25 /
IVF-PQ) over RANDOM corpora — the fixture-based mirror tests in
test_ext.py pin the algorithms on the driver testdata; these generalize
the same claims to arbitrary inputs so tokenizer and segmentation edge
cases (multi-space runs, docs with zero query terms, empty-ish docs,
skewed segment splits, single-cell vector sets) can't hide behind one
fixture's shape."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from conftest import SF_DIR  # noqa: F401  (ensures conftest import side effects)

# a tiny vocabulary that overlaps the fixed query terms plus noise words
# and whitespace hazards; documents are space-joined so multi-space runs
# and leading/trailing spaces appear naturally via the '' token
_VOCAB = ["customer", "window", "vector", "the", "a", "scan", "", "row"]

_doc = st.lists(st.sampled_from(_VOCAB), min_size=0, max_size=12).map(" ".join)


def _mirror_bm25(docs, terms, k1, b):
    """Independent pure-python BM25 with the engine's exact contract:
    lowercase space-split, EMPTY TOKENS DROPPED, per-term integer
    micro-unit rounding before the per-doc sum."""
    toks = {i: [t for t in d.lower().split(" ") if t] for i, d in docs.items()}
    n = float(len(toks))
    avgdl = sum(len(t) for t in toks.values()) / n
    df = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    out = {}
    for i, v in toks.items():
        dl, s, hits = float(len(v)), 0, 0
        for term in terms:
            tf = float(v.count(term))
            if tf == 0:
                continue
            hits += 1
            idf = math.log(1.0 + (n - df[term] + 0.5) / (df[term] + 0.5))
            raw = idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))
            s += int(round(raw * 1_000_000.0))
        if hits:
            out[i] = (s, hits)
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(texts=st.lists(_doc, min_size=1, max_size=14))
def test_bm25_scored_matches_mirror_on_random_corpora(spark, tmp_path_factory, texts):
    """bm25_scored == the pure-python mirror on arbitrary corpora —
    including documents that are all-empty tokens (dl 0), documents
    with none of the query terms (absent from both sides), and
    multi-space runs the non-empty-token contract must absorb."""
    from data_ingestor_spark.ext.text import _BM25_B, _BM25_K1, _BM25_TERMS, bm25_scored

    tmp = tmp_path_factory.mktemp("bm25prop")
    rows = [(i, f"src{i % 3}", t) for i, t in enumerate(texts)]
    spark.createDataFrame(rows, "doc_id bigint, source string, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp / "documents.parquet"))

    expected = _mirror_bm25(dict(enumerate(texts)), _BM25_TERMS, _BM25_K1, _BM25_B)
    got = {
        r["doc_id"]: (r["score_micro"], r["n_terms"])
        for r in bm25_scored(spark, str(tmp)).collect()
    }
    assert got == expected


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(texts=st.lists(_doc, min_size=1, max_size=14))
def test_bm25_incremental_equals_scratch_on_random_corpora(
    spark, tmp_path_factory, texts
):
    """The maintenance identity on arbitrary corpora and arbitrary
    base/delta splits (doc_id % 10 makes some examples all-base or
    all-delta — the empty-segment edges): merged-segment BM25 returns
    the exact rows of the from-scratch top-20."""
    from data_ingestor_spark.ext.text import q_text_bm25, q_text_bm25_incremental

    tmp = tmp_path_factory.mktemp("bm25inc")
    rows = [(i, f"src{i % 3}", t) for i, t in enumerate(texts)]
    spark.createDataFrame(rows, "doc_id bigint, source string, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp / "documents.parquet"))

    scratch = sorted(
        (r["doc_id"], r["score_micro"], r["n_terms"])
        for r in q_text_bm25(spark, str(tmp)).collect()
    )
    merged = sorted(
        (r["doc_id"], r["score_micro"], r["n_terms"])
        for r in q_text_bm25_incremental(spark, str(tmp)).collect()
    )
    assert merged == scratch


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    texts=st.lists(_doc, min_size=1, max_size=14),
    delete_mask=st.lists(st.booleans(), min_size=14, max_size=14),
)
def test_bm25_delete_view_equals_scratch_on_random_delete_sets(
    spark, tmp_path_factory, texts, delete_mask
):
    """The deletion identity on arbitrary corpora and ARBITRARY delete
    sets (VERDICT r10 directive #3): the tombstone subtraction view
    (bm25_scored_with_deletes) returns exactly the rows of a
    from-scratch build over the surviving documents — including the
    delete-nothing, delete-everything, and all-survivors-empty edges
    where the merged (_n, _avgdl) hit their 0/0 guards."""
    from data_ingestor_spark.ext.text import bm25_scored, bm25_scored_with_deletes

    tmp = tmp_path_factory.mktemp("bm25del")
    deleted = {i for i, t in enumerate(texts) if delete_mask[i]}
    rows = [(i, f"src{i % 3}", t) for i, t in enumerate(texts)]
    spark.createDataFrame(rows, "doc_id bigint, source string, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp / "documents.parquet"))
    survivors = [(i, f"src{i % 3}", t) for i, t in enumerate(texts) if i not in deleted]

    tomb = spark.createDataFrame(
        [(i,) for i in sorted(deleted)] or [(None,)], "doc_id bigint"
    ).filter("doc_id is not null")
    view = sorted(
        (r["doc_id"], r["score_micro"], r["n_terms"])
        for r in bm25_scored_with_deletes(spark, str(tmp), tomb).collect()
    )

    tmp2 = tmp_path_factory.mktemp("bm25del_scratch")
    spark.createDataFrame(
        survivors or [(None, None, None)],
        "doc_id bigint, source string, text string",
    ).filter("doc_id is not null").write.mode("overwrite").parquet(
        str(tmp2 / "documents.parquet")
    )
    scratch = sorted(
        (r["doc_id"], r["score_micro"], r["n_terms"])
        for r in bm25_scored(spark, str(tmp2)).collect()
    )
    assert view == scratch


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    texts=st.lists(_doc, min_size=1, max_size=14),
    delete_mask=st.lists(st.booleans(), min_size=14, max_size=14),
)
def test_bm25_compaction_equals_scratch_on_random_delete_sets(
    spark, tmp_path_factory, texts, delete_mask
):
    """The compaction identity (VERDICT r11 'missing' #2, text side):
    physically rewriting the index without tombstoned entries
    (bm25_compact) scores exactly like a from-scratch build over the
    survivors — on arbitrary corpora and ARBITRARY delete sets,
    including delete-nothing and delete-everything."""
    from pyspark.sql import functions as F

    from data_ingestor_spark.ext.text import (
        _bm25_per_term,
        bm25_compact,
        bm25_scored,
    )

    tmp = tmp_path_factory.mktemp("bm25cmp")
    deleted = {i for i, t in enumerate(texts) if delete_mask[i]}
    rows = [(i, f"src{i % 3}", t) for i, t in enumerate(texts)]
    spark.createDataFrame(rows, "doc_id bigint, source string, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp / "documents.parquet"))

    tomb = spark.createDataFrame(
        [(i,) for i in sorted(deleted)] or [(None,)], "doc_id bigint"
    ).filter("doc_id is not null")
    postings, df_, stats = bm25_compact(spark, str(tmp), tomb)
    scored = (
        postings.join(F.broadcast(df_), "term")
        .crossJoin(stats)
        .select("doc_id", _bm25_per_term().alias("s_micro"))
    )
    compacted = sorted(
        (r["doc_id"], r["s"], r["n"])
        for r in scored.groupBy("doc_id")
        .agg(F.sum("s_micro").cast("long").alias("s"), F.count("*").alias("n"))
        .collect()
    )

    tmp2 = tmp_path_factory.mktemp("bm25cmp_scratch")
    survivors = [(i, f"src{i % 3}", t) for i, t in enumerate(texts) if i not in deleted]
    spark.createDataFrame(
        survivors or [(None, None, None)],
        "doc_id bigint, source string, text string",
    ).filter("doc_id is not null").write.mode("overwrite").parquet(
        str(tmp2 / "documents.parquet")
    )
    scratch = sorted(
        (r["doc_id"], r["score_micro"], r["n_terms"])
        for r in bm25_scored(spark, str(tmp2)).collect()
    )
    assert compacted == scratch


def test_sim_ann_ivfpq_single_cell_degenerates_to_flat_residual_pq(spark, tmp_path):
    """IVFADC's degenerate edge: every vector in ONE cell. The coarse
    quantizer contributes nothing (one centroid, always probed), so the
    index must still return a valid top-10 scored purely by the
    residual codebook, and an exact duplicate of the query still leads
    (its residual equals the query residual exactly)."""
    import numpy as np

    from data_ingestor_spark.ext.similarity import q_sim_ann_ivfpq

    rng = np.random.default_rng(99)
    qv = rng.normal(size=64).astype(np.float32)
    rows = [(0, [float(x) for x in qv], 0), (5, [float(x) for x in qv], 3)]
    for i in range(1, 30):
        if i == 5:
            continue
        v = rng.normal(size=64).astype(np.float32)
        rows.append((i, [float(x) for x in v], 3))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>, label int")
    df.write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))

    top = q_sim_ann_ivfpq(spark, str(tmp_path)).collect()
    assert len(top) == 10
    assert top[0]["vec_id"] == 5
    assert all(top[0]["adist_micro"] <= r["adist_micro"] for r in top)


def test_sim_ann_ivfpq_rejects_non_dividing_m(spark, tmp_path):
    """ADVICE r10: m must divide the vector dimension — a non-dividing
    m raises in-plan instead of silently dropping the trailing dim % m
    components from every distance."""
    import numpy as np
    import pytest
    from py4j.protocol import Py4JJavaError

    from data_ingestor_spark.ext.similarity import (
        ivfpq_adc_scores_multiprobe,
        load_vectors,
    )

    rng = np.random.default_rng(7)
    rows = [
        (i, [float(x) for x in rng.normal(size=6).astype(np.float32)], i % 2)
        for i in range(8)
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>, label int")
    df.write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))

    e = load_vectors(spark, str(tmp_path))
    with pytest.raises((Py4JJavaError, Exception), match="PQ requires m to divide"):
        ivfpq_adc_scores_multiprobe(e, probes=1, m=4).collect()
    # dividing m still works on the same 6-dim vectors
    assert ivfpq_adc_scores_multiprobe(e, probes=1, m=3).count() > 0


def test_ivfpq_insert_empty_delta_equals_plain(spark, tmp_path):
    """The ADD quadrant's empty edge: with no arriving batch, the
    insert view must score exactly the plain fused IVFADC plan (same
    stale artifacts, same rows, same order)."""
    import numpy as np

    from data_ingestor_spark.ext.similarity import (
        ivfpq_adc_scores,
        ivfpq_search_with_inserts,
        load_vectors,
    )
    from pyspark.sql import functions as F

    rng = np.random.default_rng(7)
    rows = [(0, [float(x) for x in rng.normal(size=16)], 0)]
    for i in range(1, 40):
        rows.append((i, [float(x) for x in rng.normal(size=16)], i % 4))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>, label int")
    df.write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))

    e = load_vectors(spark, str(tmp_path))
    base = e.filter(F.col("vec_id") != 0)
    empty = base.filter(F.lit(False))
    qv = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("_qe"))
    got = [tuple(r) for r in ivfpq_search_with_inserts(base, empty, qv).collect()]
    want = [
        tuple(r)
        for r in ivfpq_adc_scores(e).orderBy("adist_micro", "vec_id").limit(10).collect()
    ]
    assert got == want and len(got) == 10


def test_ivfpq_insert_duplicate_in_delta_leads(spark, tmp_path):
    """An arriving vector IDENTICAL to the query must rank first: its
    residual equals the query residual, so its per-subspace code is the
    argmin of the SAME quantity the ADC table holds — its summed table
    distance is the per-subspace minimum, which no other vector can
    beat (ties break toward its small vec_id)."""
    import numpy as np

    from data_ingestor_spark.ext.similarity import (
        ivfpq_search_with_inserts,
        load_vectors,
    )
    from pyspark.sql import functions as F

    rng = np.random.default_rng(11)
    q = [float(x) for x in rng.normal(size=16)]
    rows = [(0, q, 0)]
    for i in range(2, 40):
        rows.append((i, [float(x) for x in rng.normal(size=16)], i % 4))
    rows.append((1, q, 2))  # the arriving duplicate
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>, label int")
    df.write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))

    e = load_vectors(spark, str(tmp_path))
    base = e.filter((F.col("vec_id") != 0) & (F.col("vec_id") != 1))
    delta = e.filter(F.col("vec_id") == 1)
    qv = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("_qe"))
    top = ivfpq_search_with_inserts(base, delta, qv).collect()
    assert len(top) == 10
    assert top[0]["vec_id"] == 1
    assert all(top[0]["adist_micro"] <= r["adist_micro"] for r in top)
