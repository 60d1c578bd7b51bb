"""Public column-function surface of the engine.

One import point for the reusable Column-level building blocks the
query library and extensions are made of — all built-in-expression
based (JVM-side, whole-stage codegen), no Python in any row path.
"""

from data_ingestor_spark.ext.dedup import minhash_signature
from data_ingestor_spark.ext.similarity import cosine, lsh_bucket, topk_cosine
from data_ingestor_spark.plans.registry import dec, dec_sum

__all__ = [
    "cosine",
    "dec",
    "dec_sum",
    "lsh_bucket",
    "minhash_signature",
    "topk_cosine",
]
