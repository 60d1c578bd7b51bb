"""Output caps for the quadratic-pair operators (judge directive r8 #5,
the triangle counter's escape-hatch pattern applied to
q_multimodal_phash_pairs / q_dedup_ngram_jaccard / q_dedup_embed_cosine).

Contract proven here, against exact enumeration on small inputs:

- ``max_block_members=K``: a deterministic SUBSET of the exact pair
  set, monotone non-decreasing in K, EXACT once K ≥ the largest block.
- ``pair_sample_bp=p``: p=10000 reproduces the exact set; p<10000 is a
  deterministic subset decided per id-pair (stable across reruns).
- defaults (both None) leave the exact result unchanged — oracle keys
  are untouched.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _pairs_set(df, a="doc_a", b="doc_b"):
    return {(r[a], r[b]) for r in df.collect()}


@pytest.fixture(scope="module")
def blocks_df(spark):
    # one big skewed block (12 members), one small (3), one singleton
    rows = [(i, "big") for i in range(12)]
    rows += [(100 + i, "small") for i in range(3)]
    rows += [(200, "solo")]
    return spark.createDataFrame(rows, "doc_id bigint, source string")


def test_salted_caps_default_off_matches_exact(spark, blocks_df):
    from data_ingestor_spark.operators.pairs import block_pairs, salted_block_pairs

    def ids(df):
        return {
            (r["a_id"], r["b_id"])
            for r in df.select(
                df["a.doc_id"].alias("a_id"), df["b.doc_id"].alias("b_id")
            ).collect()
        }

    exact = ids(block_pairs(blocks_df, ["source"], "doc_id"))
    assert len(exact) == 12 * 11 // 2 + 3
    assert ids(salted_block_pairs(blocks_df, ["source"], "doc_id")) == exact
    assert (
        ids(
            salted_block_pairs(
                blocks_df,
                ["source"],
                "doc_id",
                max_block_members=None,
                pair_sample_bp=None,
            )
        )
        == exact
    )


def test_max_block_members_subset_monotone_exact_at_cap(spark, blocks_df):
    from data_ingestor_spark.operators.pairs import block_pairs, salted_block_pairs

    def ids(df):
        return {
            (r["a_id"], r["b_id"])
            for r in df.select(
                df["a.doc_id"].alias("a_id"), df["b.doc_id"].alias("b_id")
            ).collect()
        }

    exact = ids(block_pairs(blocks_df, ["source"], "doc_id"))
    prev: set = set()
    for k in (2, 4, 8, 12):
        capped = ids(
            salted_block_pairs(
                blocks_df, ["source"], "doc_id", max_block_members=k
            )
        )
        assert capped <= exact  # always a subset of the exact pair set
        assert prev <= capped  # monotone non-decreasing in K
        # per-block bound: at most K(K-1)/2 pairs from the big block
        big = {p for p in capped if p[0] < 100}
        assert len(big) <= k * (k - 1) // 2
        prev = capped
    assert prev == exact  # K >= largest block reproduces the exact set


def test_pair_sample_bp_unbiased_subset_and_deterministic(spark, blocks_df):
    from data_ingestor_spark.operators.pairs import block_pairs, salted_block_pairs

    def ids(df):
        return {
            (r["a_id"], r["b_id"])
            for r in df.select(
                df["a.doc_id"].alias("a_id"), df["b.doc_id"].alias("b_id")
            ).collect()
        }

    exact = ids(block_pairs(blocks_df, ["source"], "doc_id"))
    full = ids(salted_block_pairs(blocks_df, ["source"], "doc_id", pair_sample_bp=10000))
    assert full == exact  # p=10000 keeps every pair
    s1 = ids(salted_block_pairs(blocks_df, ["source"], "doc_id", pair_sample_bp=4000))
    s2 = ids(salted_block_pairs(blocks_df, ["source"], "doc_id", pair_sample_bp=4000))
    assert s1 == s2  # md5 decision: stable across reruns
    assert s1 < exact  # proper subset at p<10000 on this input
    sml = ids(salted_block_pairs(blocks_df, ["source"], "doc_id", pair_sample_bp=1000))
    assert sml <= s1  # keep-decision is a threshold: monotone in p


@pytest.fixture(scope="module")
def docs_df(spark):
    # near-identical texts inside one (source, len-band) block
    base = "the quick brown fox jumps over the lazy dog " * 3
    rows = [(i, base + f"tail{i % 2}", "web") for i in range(8)]
    rows += [(100, "completely different text about spark engines", "web")]
    return spark.createDataFrame(rows, "doc_id bigint, text string, source string")


def test_ngram_jaccard_caps_vs_exact(spark, docs_df):
    from data_ingestor_spark.ext.dedup import ngram_jaccard_pairs

    exact = _pairs_set(ngram_jaccard_pairs(docs_df, out_col="j"))
    assert exact  # the near-identical docs do pair up
    assert _pairs_set(ngram_jaccard_pairs(docs_df, out_col="j", pair_sample_bp=10000)) == exact
    capped = _pairs_set(ngram_jaccard_pairs(docs_df, out_col="j", max_block_members=4))
    assert capped <= exact
    assert _pairs_set(ngram_jaccard_pairs(docs_df, out_col="j", max_block_members=64)) == exact
    sampled = _pairs_set(ngram_jaccard_pairs(docs_df, out_col="j", pair_sample_bp=3000))
    assert sampled <= exact


@pytest.fixture(scope="module")
def vecs_df(spark):
    # two labels; label 0 is a dense near-dup cluster
    rows = [(i, [1.0, 0.0, float(i) * 1e-4, 0.5], 0) for i in range(10)]
    rows += [(100 + i, [0.0, 1.0, 0.0, float(i)], 1) for i in range(4)]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>, label int")


def test_embed_cosine_caps_vs_exact(spark, vecs_df):
    from data_ingestor_spark.ext.similarity import embed_cosine_pairs

    def ids(df):
        return {(r["vec_a"], r["vec_b"]) for r in df.collect()}

    exact = ids(embed_cosine_pairs(vecs_df, min_cos=0.9))
    dense = {p for p in exact if p[1] < 100}
    assert len(dense) == 10 * 9 // 2  # the dense cluster is all-pairs
    assert ids(embed_cosine_pairs(vecs_df, min_cos=0.9, pair_sample_bp=10000)) == exact
    capped = ids(embed_cosine_pairs(vecs_df, min_cos=0.9, max_block_members=4))
    assert capped <= exact
    # the dense block is bounded at K(K-1)/2
    assert len({p for p in capped if p[1] < 100}) <= 4 * 3 // 2
    assert ids(embed_cosine_pairs(vecs_df, min_cos=0.9, max_block_members=100)) == exact


def test_phash_pair_caps_vs_exact(spark):
    from data_ingestor_spark.ext.multimodal import phash_bands, phash_candidate_pairs

    # 6 near-identical long docs (same bands) + 2 distinct ones
    base = "".join(chr(65 + (i * 7) % 26) for i in range(300))
    rows = [(i, base) for i in range(6)]
    rows += [(10, "z" * 300), (11, base[::-1])]
    d = spark.createDataFrame(rows, "doc_id bigint, text string")
    b = phash_bands(d)

    def ids(df):
        return {(r["id_a"], r["id_b"]) for r in df.collect()}

    exact = ids(phash_candidate_pairs(b))
    assert {(a, c) for a in range(6) for c in range(6) if a < c} <= exact
    assert ids(phash_candidate_pairs(b, pair_sample_bp=10000)) == exact
    capped = ids(phash_candidate_pairs(b, max_band_members=3))
    assert capped <= exact
    # identical-band bucket of 6 docs is bounded at 3*2/2 pairs
    assert len({p for p in capped if p[0] < 6 and p[1] < 6}) <= 3
    assert ids(phash_candidate_pairs(b, max_band_members=100)) == exact
    sampled = ids(phash_candidate_pairs(b, pair_sample_bp=2500))
    assert sampled <= exact
