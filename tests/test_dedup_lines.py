"""Property tests for the line-level (segment) dedup rewrite
(ext/dedup.py line_dedup / q_dedup_lines): a pure-Python keep-first
mirror over random corpora — including empty documents, all-identical
documents, and sub-span tails — must agree with the Spark pipeline
exactly (md5-for-md5: the kept_md5 checks the entire rewritten corpus
byte-for-byte, not just the counts)."""

from __future__ import annotations

import hashlib
import random

import pytest


def _mirror_line_dedup(docs, span):
    """Keep-first segment dedup, sequential reference semantics:
    an instance (doc_id, pos) of a segment survives iff it is the
    lexicographically smallest (doc_id, pos) carrying that segment."""
    segs = []
    for did, text in docs:
        t = text.split(" ")
        spans = [" ".join(t[i : i + span]) for i in range(0, len(t), span)]
        for pos, seg in enumerate(spans):
            segs.append((did, pos, seg))
    first = {}
    for did, pos, seg in sorted(segs, key=lambda x: (x[0], x[1])):
        first.setdefault(seg, (did, pos))
    out = {}
    for did, _text in docs:
        out[did] = [0, 0, []]
    for did, pos, seg in segs:
        rec = out[did]
        rec[0] += 1
        if first[seg] == (did, pos):
            rec[1] += 1
            rec[2].append((pos, seg))
    result = {}
    for did, (n_segments, n_kept, kept) in out.items():
        joined = " ".join(seg for _pos, seg in sorted(kept))
        result[did] = (
            n_segments,
            n_kept,
            hashlib.md5(joined.encode()).hexdigest(),
        )
    return result


def _spark_line_dedup(spark, docs, span):
    from data_ingestor_spark.ext.dedup import line_dedup

    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = line_dedup(df, span=span).collect()
    return {r["doc_id"]: (r["n_segments"], r["n_kept"], r["kept_md5"]) for r in rows}


VOCAB = ["alpha", "beta", "gamma", "delta", "", "x"]


def _random_docs(rng, n_docs, max_tokens):
    docs = []
    for did in range(n_docs):
        n = rng.randrange(0, max_tokens)
        docs.append((did, " ".join(rng.choice(VOCAB) for _ in range(n)) if n else ""))
    return docs


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("span", [1, 3, 8])
def test_line_dedup_matches_mirror_random(spark, seed, span):
    rng = random.Random(seed)
    docs = _random_docs(rng, n_docs=12, max_tokens=40)
    assert _spark_line_dedup(spark, docs, span) == _mirror_line_dedup(docs, span)


def test_line_dedup_all_identical_docs(spark):
    """All docs identical: the smallest doc_id keeps everything, every
    other doc is rewritten to the empty string (md5(''))."""
    text = "a b c d e f g h i j k l m n o p q"
    docs = [(i, text) for i in range(4)]
    got = _spark_line_dedup(spark, docs, span=8)
    assert got == _mirror_line_dedup(docs, span=8)
    empty_md5 = hashlib.md5(b"").hexdigest()
    n_segs = got[0][0]
    assert got[0] == (n_segs, n_segs, hashlib.md5(text.encode()).hexdigest())
    for did in (1, 2, 3):
        assert got[did] == (n_segs, 0, empty_md5)


def test_line_dedup_all_unique_is_identity(spark):
    """Disjoint vocabularies per doc: nothing drops and the rewritten
    text round-trips to the original (kept_md5 == md5(text))."""
    docs = [
        (0, "a0 a1 a2 a3 a4 a5 a6 a7 a8 a9"),
        (1, "b0 b1 b2 b3"),
        (2, "c0"),
    ]
    got = _spark_line_dedup(spark, docs, span=4)
    for did, text in docs:
        n_segments, n_kept, kept_md5 = got[did]
        assert n_segments == n_kept
        assert kept_md5 == hashlib.md5(text.encode()).hexdigest()


def _mirror_line_dedup_incremental(docs, new_ids, span):
    """Rebuild-with-precedence reference: rank every (doc, pos, seg)
    by (is_delta, doc_id, pos) per segment, restrict to delta docs."""
    segs = []
    for did, text in docs:
        t = text.split(" ")
        spans = [" ".join(t[i : i + span]) for i in range(0, len(t), span)]
        for pos, seg in enumerate(spans):
            segs.append((did in new_ids, did, pos, seg))
    first = {}
    for is_new, did, pos, seg in sorted(segs):
        first.setdefault(seg, (is_new, did, pos))
    out = {did: [0, 0, []] for did, _ in docs if did in new_ids}
    for is_new, did, pos, seg in segs:
        if not is_new:
            continue
        rec = out[did]
        rec[0] += 1
        if first[seg] == (is_new, did, pos):
            rec[1] += 1
            rec[2].append((pos, seg))
    return {
        did: (
            n,
            k,
            hashlib.md5(" ".join(s for _p, s in sorted(kept)).encode()).hexdigest(),
        )
        for did, (n, k, kept) in out.items()
    }


@pytest.mark.parametrize("seed", [3, 4])
@pytest.mark.parametrize("frac", [0.0, 0.3, 1.0])
def test_line_dedup_incremental_equals_rebuild(spark, seed, frac):
    """Incremental admission == full rebuild under arrival-order
    precedence, on random corpora and random splits including the
    empty-delta and all-delta edges."""
    from pyspark.sql import functions as F

    from data_ingestor_spark.ext.dedup import line_dedup_incremental

    rng = random.Random(seed)
    docs = _random_docs(rng, n_docs=12, max_tokens=40)
    new_ids = {did for did, _ in docs if rng.random() < frac}
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = line_dedup_incremental(df, F.col("doc_id").isin(list(new_ids) or [-1]), span=5).collect()
    got = {r["doc_id"]: (r["n_segments"], r["n_kept"], r["kept_md5"]) for r in rows}
    assert got == _mirror_line_dedup_incremental(docs, new_ids, span=5)


def test_line_dedup_within_doc_repeat_collapses(spark):
    """A segment repeated INSIDE one doc keeps only its first
    instance — the uniform global keep-first rule (C4's 'all but one
    of any span occurring more than once')."""
    docs = [(7, "x y z x y z")]
    got = _spark_line_dedup(spark, docs, span=3)
    assert got == _mirror_line_dedup(docs, span=3)
    assert got[7] == (2, 1, hashlib.md5(b"x y z").hexdigest())
