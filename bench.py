#!/usr/bin/env python
"""Benchmark harness (driver contract, BASELINE.md).

Times the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced with a ``noop``-format write so the full physical
plan executes (scan → shuffle → agg/join/window) without driver-side
collect costs skewing the numbers. The headline set spans every physical
pattern the engine exercises: columnar scan+agg, shuffle join, broadcast
join, window, time-bucketed agg, explode, top-k, MinHash dedup, and
vector top-k similarity.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q_agg_basic",        # TPC-H Q1-shaped scan + grouped agg (flagship)
    "q_tpch_q3",          # 3-way selective join + top-20 (TakeOrdered)
    "q_tpch_q5",          # 6-way star join, dims broadcast
    "q_join_inner",       # orders ⋈ lineitem shuffle join + agg
    "q_join_broadcast",   # dim broadcast join
    "q_agg_rollup",       # multi-level agg
    "q_window_rank",      # partitioned window ranking
    "q_window_tumbling",  # time-bucketed agg over events
    "q_topk_per_group",   # rank + filter top-k
    "q_explode",          # lateral view / unnest
    "q_dedup_minhash",    # MinHash near-dup over documents
    "q_sim_topk",         # brute-force cosine top-k over embeddings
    "q_text_stats",       # text quality/statistics scan
    "q_scalar_json",      # JSON extraction over events
    "q_curation_pipeline",  # quality gate → dedup → corpus stats (one plan)
    "q_text_tfidf",       # corpus statistics (tf ⋈ df + broadcast scalar)
]

#: Round-2+ additions, timed identically but reported SEPARATELY so the
#: headline total stays comparable round-over-round (same 16 queries).
EXTRA = [
    "q_tpch_q1",            # widest scan-agg (8 aggregates)
    "q_tpch_q18",           # HAVING semi-join + 3-way join
    "q_dedup_minhash_pairs",  # full MinHash-LSH candidate pipeline
    "q_dedup_clusters",     # iterative connected components
    "q_event_sessions",     # lag-gap-cumsum sessionization window
    "q_text_repetition",    # trigram repetition narrow map
    "q_sim_ann_lsh",        # bucketed ANN probe
    # round 3
    "q_sim_ann_lsh_multiprobe",  # 5-bucket multi-probe ANN
    "q_text_chunk",         # overlapping token-window chunking
    "q_text_contamination",  # benchmark 8-gram decontamination
    "q_dedup_semantic",     # SemDeDup within-cluster cosine dedup
    "q_dedup_incremental",  # batch-vs-corpus LSH admission
    "q_sim_knn_join",       # batch top-3 k-NN join
    "q_kmeans_train",       # 3 unrolled Lloyd iterations
    "q_text_pack",          # sequence packing running sums
    "q_tpch_q22",           # anti-join + broadcast scalar subquery
    "q_corpus_production",  # composite gate->dedup->split pipeline
    # round 3, late session
    "q_tpch_q2",            # de-correlated min + 4 broadcast dims
    "q_tpch_q9",            # 5-way star, integer-units profit
    "q_tpch_q19",           # disjunctive join predicate
    "q_tpch_q21",           # per-order aggregate rewrite of 2x EXISTS
    "q_dedup_substring",    # ExactSubstr rolling 32-gram profile
    "q_recursive_compound",  # native recursive CTE recurrence
    "q_scalar_variant",     # VARIANT shredded JSON aggregation
    # round 3, final session
    "q_multimodal_phash_pairs",  # banded dHash near-dup pairs
    "q_subq_lateral",       # decorrelated LATERAL top-2
    "q_profile_columns",    # single-scan column profiling
    "q_event_ewma",         # exact integer-weighted EWMA window
    "q_join_bucketed",      # co-located bucket join (one-time write + merge)
    "q_dedup_lsh_recall",   # sampled all-pairs LSH quality eval
    "q_scd2_pit_join",      # point-in-time SCD2 enrichment
    "q_multimodal_scenes",  # frame-stream shot segmentation
    "q_event_attribution",  # carry-forward last-touch credit
    # round 4
    "q_text_classifier",    # hashed linear classifier inference (narrow map)
    "q_text_bigram_lm",     # bigram LM training (pair counts + re-agg)
    "q_dedup_url",          # URL canonicalization dedup
    "q_mix_resample",       # domain-mix resampling (broadcast rates)
    "q_text_shard_manifest",  # running-sum shard packing
    "q_table_diff",         # snapshot diff full-outer classification
    "q_compact_plan",       # small-file compaction bin-packing
    "q_graph_pagerank",     # 3-iteration integer-scaled PageRank
    "q_interval_concurrency",  # sweep-line two-phase prefix sum
    "q_source_overlap",     # mergeable min-wise source sketches
    "q_bpe_train",          # two-round BPE merge training
    "q_embed_pca_power",    # integer power-iteration PCA
    "q_event_trend",        # OLS slope via mergeable integer sums
    "q_agg_rollup_cascade",  # hour->day->week continuous aggregate
    "q_agg_weighted_median",  # cumulative-weight window median
    "q_sample_weighted",    # size-biased bottom-k priority draw
    "q_stream_rollup_maintain",  # foreachBatch continuous aggregate
    "q_event_robust_anomaly",  # median/MAD outlier flags
    "q_bpe_apply",          # tokenize under learned merges
    "q_dedup_containment",  # asymmetric near-superset pairs
    "q_join_asof_nearest",  # bidirectional nearest-in-time align
    "q_market_basket",      # frequent-pair mining with lift
    "q_langid_confusion",   # classifier-vs-label confusion matrix
    "q_knn_accuracy",       # k-NN majority-vote label eval
    "q_scd2_merge",         # SCD2 close-and-append maintenance
    "q_event_abtest",       # pooled two-proportion z (A/A form)
    "q_event_forecast_backtest",  # lag-7 naive forecast + MAE/WAPE
    "q_window_ohlc",        # OHLC bars with pinned open/close
    "q_event_ltv_curve",    # cohort cumulative revenue curves
    "q_embed_outlier",      # centroid-distance mislabel QA
    "q_scan_delete_vectors",  # merge-on-read delete application
    "q_alloc_largest_remainder",  # Hamilton budget apportionment
    "q_event_changepoint",  # division-free CUSUM regime shift
    "q_text_drift",         # exact-integer TV distribution drift
    "q_dedup_lsh_bucket_stats",  # band-bucket skew histogram
    "q_dedup_stopband_tradeoff",  # measured stop-band capping
    "q_doc_lineage",        # per-doc provenance audit record
    # round 5 (the single registry addition this round)
    "q_dedup_containment_recall",  # sampled containment-recall eval by skew class
    # round 6 (no registry additions; track the two rewritten plans)
    "q_udf_cogrouped",      # bucketed-key cogrouped applyInPandas
    "q_agg_approx_bounded",  # split distinct + sketch accuracy contract
    # round 12 (index maintenance + SQL front doors; q_sql_graph_triangles
    # is deliberately excluded like its DataFrame twin — the sf0.1
    # near-dup graph makes triangle enumeration output-bound at ~1 min,
    # which would dominate the extras tail without measuring anything
    # the SCALING artifact doesn't already record)
    "q_sim_ann_ivf_insert",   # stale-centroid batch ingest + probe
    "q_sim_ann_ivf_compact",  # physical compaction, stale probe
    "q_sim_ann_ivf_compact_refresh",  # compaction + centroid refresh
    "q_sim_ann_ivf_mixed",    # delete + insert views composed
    "q_text_bm25_compact",    # postings/norms segment-merge rewrite
    "q_sql_minhash_pairs",    # LSH pair pipeline as one SQL text
    "q_sql_asof",             # sort-merge as-of join as one SQL text
    "q_sql_range_join",       # bucketed range join as one SQL text
    # round 13: q_stream_late_drop removed from the tail (present r12
    # only) — its ~7.4 s is three availableNow micro-batch TRIGGERS of
    # fixed streaming overhead, flat across SFs (SCALING_touched_r12),
    # so it dilutes the tail's regression signal without measuring any
    # data-dependent cost; same adjudication as the triangle keys above
    "q_sim_ann_ivf_pruned",   # cell-partitioned write + pruned probe
    # the other r13 graph-ANN keys (hnsw, nsw_insert, sql_ann_nsw) are
    # excluded like their q_sim_ann_nsw sibling: each is dominated by
    # the same ~24 s sf0.1 kNN-graph build (LSH_PLANES_r13.json), which
    # would triple the tail's wall-clock re-measuring one already-
    # artifacted cost
    "q_dedup_lines",          # C4-style keep-first segment rewrite
    "q_sim_ann_ivfpq_pruned",  # stored PQ codes + pruned ADC lookup scan
    "q_text_bm25_pruned",     # bucketed postings + sidecar stats probe
    "q_dedup_lines_incremental",  # batch vs standing segment index
    "q_sim_ann_ivfpq_insert",  # stale-artifact batch encode + ADC probe
    "q_sim_ann_ivfpq_delete",  # tombstone anti-join on codes
    "q_sim_ann_ivfpq_compact",  # survivor codes rewrite + pruned serve
    "q_sim_ann_ivfpq_compact_refresh",  # codebook retrain over survivors
    # q_stream_bm25_maintain is excluded like q_stream_late_drop: its
    # cost is 4 availableNow micro-batch TRIGGERS of fixed streaming
    # overhead (flat across SFs, SCALING_touched_r13b), not a
    # data-dependent signal the tail should re-measure
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("data-ingestor-spark-bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    load_start = round(os.getloadavg()[0], 2)

    # Single-thread CPU calibration: a fixed md5 workload whose runtime
    # depends only on this boot's effective per-core speed (the box is
    # re-provisioned between rounds and boots differ by up to ~1.2×
    # uniformly — observed r4→r5 on byte-identical code). Recorded so
    # cross-round comparisons can normalize: ratio × (cal_old / cal_new)
    # ≈ the code-attributable change. scripts/bench_compare.py applies
    # this automatically when both files carry the field.
    import hashlib

    def _cpu_cal() -> float:
        t0 = time.perf_counter()
        h = b"x" * 65536
        for _ in range(2000):
            h = hashlib.md5(h).digest() + h[: 65536 - 16]
        return round(time.perf_counter() - t0, 4)

    cpu_cal_s = _cpu_cal()

    from data_ingestor_spark.plans import queries as q

    # JVM/session warmup so the first timed query doesn't pay JIT + codegen
    # + parquet-reader bootstrap costs that a long-lived cluster session
    # never sees (region is the smallest table — 5 rows).
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    # Warm timing: each query runs twice and the faster run is recorded.
    # The first run pays one-time whole-stage-codegen (Janino) compilation
    # a long-lived cluster session amortizes to zero; the second run is
    # the steady-state execution cost that actually scales with data.
    def time_set(names):
        warm: dict[str, float] = {}
        first: dict[str, float] = {}
        for name in names:
            spec = q.REGISTRY.get(name)
            if spec is None:
                continue
            runs = []
            for _ in range(2):
                t0 = time.perf_counter()
                spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                runs.append(round(time.perf_counter() - t0, 3))
            first[name] = runs[0]
            warm[name] = min(runs)
        return warm, first

    # The headline 16 are timed STRICTLY FIRST — before any extras — so
    # their numbers are comparable across rounds by construction no
    # matter how long the extras tail is (judge directive r9 #2: the r8
    # idle-anchor read was confounded by the first full-extras run; the
    # mode is now recorded in the artifact so a comparison across
    # differently-moded records is mechanically detectable).
    timings, cold = time_set(HEADLINE)
    # Interleaved calibration between the headline block and the extras
    # tail (ADVICE r12 #5): the start→end drift gate only caught
    # contention persisting into the END calibration — a co-tenant
    # burst confined to mid-run, or an inflated START calibration
    # followed by a quiet run, still read idle_box_valid=true. Gating
    # on max/min across start/mid/end calibrations invalidates both
    # directions of skew.
    cpu_cal_s_mid = _cpu_cal()
    # Local idle-box variant (judge directive r8 #7): with
    # SPARK_GRAFT_FULL_EXTRAS=1 the extras tail covers EVERY registry
    # key outside the headline — the per-key anchors that adjudicate
    # driver-box outliers mechanically. The driver's own invocation
    # (no env) keeps the stable round-over-round extras list.
    full_extras = bool(os.environ.get("SPARK_GRAFT_FULL_EXTRAS"))
    extra_names = list(EXTRA)
    if full_extras:
        extra_names += [
            k for k in q.REGISTRY if k not in HEADLINE and k not in EXTRA
        ]
    extra, _ = time_set(extra_names)

    total = round(sum(timings.values()), 3)
    # Second calibration AFTER the queries (round-12 lesson): the first
    # r12 anchor read load_start 0.37 → idle_box_valid TRUE, yet every
    # key ran 1.3-3.4× inflated — a co-tenant burst that started AFTER
    # the pre-run load sample. The 1-minute average lies in both
    # directions (it also lags high for minutes after a big job exits,
    # falsely invalidating clean runs). Cal drift start→end is a direct
    # in-band contention probe: same fixed workload, same boot, so a
    # drift beyond noise (~5%) means something else was eating CPU
    # DURING the measurement window.
    cpu_cal_s_end = _cpu_cal()
    cal_drift = round(cpu_cal_s_end / cpu_cal_s, 3) if cpu_cal_s else None
    cals = [c for c in (cpu_cal_s, cpu_cal_s_mid, cpu_cal_s_end) if c]
    cal_spread = round(max(cals) / min(cals), 3) if cals else None
    idle_ok = load_start < 0.5 and (cal_spread is None or cal_spread < 1.1)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cold_first_run": cold,
                "extra_queries": extra,
                "host_load_avg_1m": round(os.getloadavg()[0], 2),
                "host_load_avg_1m_start": load_start,
                "cpu_cal_s": cpu_cal_s,
                "cpu_cal_s_mid": cpu_cal_s_mid,
                "cpu_cal_s_end": cpu_cal_s_end,
                "cal_drift": cal_drift,
                "cal_spread": cal_spread,
                # validity bit for idle-box anchor records: per-query
                # numbers are only comparable ACROSS rounds when the box
                # was quiet before the first query ran (BASELINE.md's
                # matched-load discipline, made mechanical) AND stayed
                # quiet through it (max/min spread across the three
                # interleaved calibrations — catches mid-run bursts and
                # inflated-start skew the start→end drift missed)
                "idle_box_valid": idle_ok,
                "n_keys_timed": len(timings) + len(extra),
                # measurement-mode stamp (judge directive r9 #2): the
                # headline block is always timed first, before any
                # extras, so headline numbers are mode-independent;
                # full_extras records whether the tail covered the
                # whole registry so cross-record extras comparisons
                # can check like-for-like
                "full_extras": full_extras,
                "headline_timed_first": True,
                "note": "per-query steady-state (best of 2); cold_first_run includes one-time codegen compile; extra_queries are round-2+ operators timed identically but excluded from the headline total for round-over-round comparability; host_load_avg_1m is the 1-minute load average at report time and _start before any query ran — the bench's own 32-core work raises the end value, so _start is the idle-box indicator; co-tenant load inflates every query uniformly (compare per-query RATIOS across rounds, not absolutes, when either is high); cpu_cal_s is a fixed single-thread md5 workload timed before any query — boots differ up to ~1.2× on identical code, so normalize cross-round ratios by cal_old/cal_new; cpu_cal_s_end repeats the calibration after the last query and cpu_cal_s_mid between headline and extras — cal_spread (max/min over the three) >= 1.1 means a co-tenant burst landed DURING the run or the start calibration itself was inflated (ADVICE r12 #5), and invalidates the idle bit even when _start was quiet; q_stream_late_drop was dropped from the extras tail in r13 (fixed trigger overhead, flat across SFs — not a regression signal)",
            }
        )
    )
    # Final COMPACT line, printed last so the driver's bounded tail capture
    # always contains a parseable headline even when the diagnostic JSON
    # above exceeds the capture window (rounds 3-4 recorded ``parsed: null``
    # for exactly that reason).  Same canonical shape the driver expects.
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "host_load_avg_1m_start": load_start,
                "idle_box_valid": idle_ok,
                # cpu_cal_s must ride the compact line too: when the
                # driver's tail window truncates the big diagnostic line
                # above, bench_compare's boot-speed normalization would
                # otherwise silently not apply to driver-recovered records
                "cpu_cal_s": cpu_cal_s,
                "cpu_cal_s_end": cpu_cal_s_end,
                "cal_drift": cal_drift,
                "cal_spread": cal_spread,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
