"""Aggregation point for the declared query library.

Importing this module populates the registry with every query family;
``__spark_entry__.py`` re-exports ``queries()`` / ``oracle_sql()`` from
here for the driver's correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import data_ingestor_spark.plans.relational  # noqa: F401
from data_ingestor_spark.plans.registry import REGISTRY

# Optional families — each module registers on import; keep imports
# one-per-line so a failure is attributable.
for _mod in (
    "data_ingestor_spark.plans.scalars",
    "data_ingestor_spark.plans.subqueries",
    "data_ingestor_spark.plans.tpch",
    "data_ingestor_spark.plans.events",
    "data_ingestor_spark.plans.ingest",
    "data_ingestor_spark.plans.timeseries",
    "data_ingestor_spark.plans.udfs",
    "data_ingestor_spark.ext.dedup",
    "data_ingestor_spark.ext.graph",
    "data_ingestor_spark.ext.similarity",
    "data_ingestor_spark.ext.text",
    "data_ingestor_spark.ext.multimodal",
):
    try:
        __import__(_mod)
    except ModuleNotFoundError:
        pass

# --- driver-evidence rotation -------------------------------------------------
# The driver's correctness gate checks the FIRST 50 registered queries per
# round; the full registry is ~2x that, so registration order decides which
# keys get fresh driver-side evidence.  This list front-loads the keys with
# the least (or failed) prior evidence; everything else keeps its natural
# module order after it.  The local gate (scripts/check_oracle.py) always
# runs all keys, so nothing rots silently while outside the window.
#
# Round-3 window: the 34 keys with zero driver evidence after rounds 1-2
# (TPC-H beyond Q3/Q5, event analytics, warehouse maintenance, multimodal
# features/frames, clustering, text extras, scan corners, streaming window
# agg, cogrouped UDF, window distribution/value functions), plus
# q_subq_scalar (r2's one hash failure, oracle rewritten to exact integer
# arithmetic this round), plus the keys newly added in round 3 (the 14
# early-round-3 keys and, in slot 50, q_dedup_semantic).
_PRIORITY: tuple[str, ...] = (
    # --- 34 zero-evidence keys -------------------------------------------
    "q_tpch_q1",
    "q_tpch_q6",
    "q_tpch_q7",
    "q_tpch_q8",
    "q_tpch_q10",
    "q_tpch_q13",
    "q_tpch_q14",
    "q_tpch_q15",
    "q_tpch_q17",
    "q_tpch_q18",
    "q_event_funnel",
    "q_event_retention",
    "q_event_sessions",
    "q_event_anomaly",
    "q_merge_upsert",
    "q_scd2_intervals",
    "q_dq_audit",
    "q_gap_fill",
    "q_dedup_clusters",
    "q_multimodal_features",
    "q_multimodal_frames",
    "q_embed_quantize",
    "q_text_repetition",
    "q_text_scrub",
    "q_text_zipf",
    "q_scan_orc",
    "q_partitioned_scan",
    "q_scalar_null",
    "q_agg_bitwise",
    "q_agg_approx_bounded",
    "q_stream_window_agg",
    "q_udf_cogrouped",
    "q_window_distribution",
    "q_window_value_funcs",
    # --- round-2 hash failure, oracle made deterministic in round 3 ------
    "q_subq_scalar",
    # --- new round-3 keys (zero evidence by construction) ----------------
    "q_sim_ann_lsh_multiprobe",
    "q_sim_ann_ivf_multiprobe",
    "q_text_chunk",
    "q_text_contamination",
    "q_event_moving_avg",
    "q_dedup_latest",
    "q_join_nullsafe",
    "q_stream_dedup",
    "q_graph_degree",
    "q_graph_triangles",
    "q_stream_stream_join",
    "q_scan_custom_source",
    "q_scan_jsonl",
    "q_stream_stateful",
    # --- slot 50: the session's flagship new LLM-pipeline op -------------
    # The other FIFTY-THREE keys added late in round 3 don't fit the
    # 50-slot window and must LEAD the round-4 rotation: q_sim_knn_join,
    # q_text_pack, q_text_gopher, q_text_domain_stats, q_split_assign,
    # q_kmeans_train, q_dedup_incremental, q_corpus_production,
    # q_event_dau_wau, q_text_unigram_logprob, q_tpch_q4/q12/q22,
    # q_tpch_q2/q9/q11/q16/q19/q20/q21, q_dedup_substring,
    # q_recursive_compound, q_scalar_variant, q_event_path,
    # q_multimodal_audio, q_agg_percentile_disc, q_k_anonymity,
    # q_profile_columns, q_subq_lateral, q_event_ewma, q_scan_binaryfile,
    # q_multimodal_phash, q_multimodal_phash_pairs, q_agg_incremental,
    # q_join_bucketed, q_dedup_lsh_recall, q_multimodal_scenes,
    # q_agg_mode, q_scan_schema_evolution, q_event_attribution,
    # q_sim_ann_recall, q_window_gap_islands, q_scd2_pit_join,
    # q_text_keywords, q_agg_grouping_id, q_scalar_url, q_udtf_analyze,
    # q_agg_sketch_union, q_agg_bitmap_distinct, q_scalar_try,
    # q_dedup_minhash_char, q_dedup_union_candidates,
    # q_event_funnel_latency — followed by the keys
    # last checked in round 1 (relational/window/set/scalar families)
    # that have not been re-checked since.
    "q_dedup_semantic",
)

_ordered = [k for k in _PRIORITY if k in REGISTRY]
_ordered += [k for k in REGISTRY if k not in _PRIORITY]
_specs = {k: REGISTRY[k] for k in _ordered}
REGISTRY.clear()
REGISTRY.update(_specs)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
