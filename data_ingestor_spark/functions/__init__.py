"""Public column-function surface of the engine.

One import point for the reusable building blocks the query library
and extensions are made of. The relational/dedup/similarity blocks are
built-in-expression based (JVM-side, whole-stage codegen, no Python in
any row path); the multimodal blocks are the documented exception —
Arrow-batched mapInPandas plumbing for binary payloads, where Python
is the point.
"""

from data_ingestor_spark.ext.dedup import cluster_pairs, minhash_signature
from data_ingestor_spark.ext.multimodal import (
    audio_chunk_energy,
    extract_features,
    resize_payloads,
    sample_frames,
    with_binary_payload,
)
from data_ingestor_spark.ext.similarity import (
    cosine,
    label_centroids,
    lsh_bucket,
    topk_cosine,
)
from data_ingestor_spark.operators.pairs import block_pairs, salted_block_pairs
from data_ingestor_spark.plans.registry import dec, dec_sum

__all__ = [
    "audio_chunk_energy",
    "block_pairs",
    "cluster_pairs",
    "cosine",
    "dec",
    "dec_sum",
    "extract_features",
    "label_centroids",
    "lsh_bucket",
    "minhash_signature",
    "resize_payloads",
    "salted_block_pairs",
    "sample_frames",
    "topk_cosine",
    "with_binary_payload",
]
