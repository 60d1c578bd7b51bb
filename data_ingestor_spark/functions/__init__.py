"""Public column-function surface of the engine.

One import point for the reusable Column-level building blocks the
query library and extensions are made of — all built-in-expression
based (JVM-side, whole-stage codegen), no Python in any row path.
"""

from data_ingestor_spark.ext.dedup import cluster_pairs, minhash_signature
from data_ingestor_spark.ext.similarity import (
    cosine,
    label_centroids,
    lsh_bucket,
    topk_cosine,
)
from data_ingestor_spark.operators.pairs import block_pairs, salted_block_pairs
from data_ingestor_spark.plans.registry import dec, dec_sum

__all__ = [
    "block_pairs",
    "cluster_pairs",
    "cosine",
    "dec",
    "dec_sum",
    "label_centroids",
    "lsh_bucket",
    "minhash_signature",
    "salted_block_pairs",
    "topk_cosine",
]
