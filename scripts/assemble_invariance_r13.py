"""Assemble INVARIANCE_touched_r13.json from the two sf0.1 hash dumps.

Round-13 touched set: the 8 NEW keys (HNSW pair + maintained-hierarchy
insert, graph ADD/DELETE-view/COMPACT-repair, the NSW SQL front door,
the partition-pruned IVF layout) plus every key whose code paths were
refactored this round with outputs required unchanged:

- the 7 IVF-family keys rewired through the extracted ``best_cells``
  probe (VERDICT r12 directive #6) — ivf / multiprobe / delete /
  insert / compact / compact_refresh / mixed;
- the NSW pair (knn_graph now built via the shared
  ``_bucket_probe_scores`` helper with a ``planes`` parameter,
  nsw_search gained the ``entry`` seam);
- the LSH pair (lsh_bucket now assembled from the shared
  ``_lsh_bucket_sql`` string builder);
- q_sql_graph_triangles (per-call-token views + eager materialization
  + UNCACHE, ADVICE r12 #3) and q_stream_late_drop (content-
  fingerprinted split marker, ADVICE r12 #4).

Drift baselines: r12-touched keys vs INVARIANCE_touched_r12.json;
the ivf/multiprobe/lsh quartet vs INVARIANCE_r10.json (their last
full-registry sf0.1 dump; invariance in between transfers by the
r11/r12 audits' zero-plan-drift arguments). Also asserts the SQL
front door's hash equals its DataFrame twin's (q_sql_ann_nsw ==
q_sim_ann_nsw), the same-output contract every front door carries.

Usage (run the dumps first):
    python scripts/spark_hash_dump.py /root/testdata/sf0.1 \
        --json=/tmp/dump_base_r13.json <keys...>
    SPARK_GRAFT_CPUS=5 DIS_SHUFFLE_PARTITIONS=7 \
        python scripts/spark_hash_dump.py /root/testdata/sf0.1 \
        --json=/tmp/dump_odd_r13.json <keys...>
    python scripts/assemble_invariance_r13.py
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")
from scripts.spark_hash_dump import compare  # noqa: E402

NEW_KEYS = (
    "q_sim_ann_hnsw",
    "q_sim_ann_hnsw_recall",
    "q_sim_ann_hnsw_insert",
    "q_sim_ann_nsw_insert",
    "q_sim_ann_nsw_delete",
    "q_sim_ann_nsw_compact",
    "q_sql_ann_nsw",
    "q_sim_ann_ivf_pruned",
)
REFACTORED_R12_BASE = (
    "q_sim_ann_ivf_delete",
    "q_sim_ann_ivf_insert",
    "q_sim_ann_ivf_compact",
    "q_sim_ann_ivf_compact_refresh",
    "q_sim_ann_ivf_mixed",
    "q_sim_ann_nsw",
    "q_sim_ann_nsw_recall",
    "q_sql_graph_triangles",
    "q_stream_late_drop",
)
REFACTORED_R10_BASE = (
    "q_sim_ann_ivf",
    "q_sim_ann_ivf_multiprobe",
    "q_sim_ann_lsh",
    "q_sim_ann_lsh_multiprobe",
)
ALL_KEYS = NEW_KEYS + REFACTORED_R12_BASE + REFACTORED_R10_BASE


def main() -> int:
    base = json.load(open("/tmp/dump_base_r13.json"))
    odd = json.load(open("/tmp/dump_odd_r13.json"))
    r12 = json.load(open("/root/repo/INVARIANCE_touched_r12.json"))
    r10 = json.load(open("/root/repo/INVARIANCE_r10.json"))

    cmp_cfg = compare(base, odd)

    drift = []
    for k in REFACTORED_R12_BASE:
        if base["results"][k]["hash"] != r12["results_base"][k]["hash"]:
            drift.append(k)
    for k in REFACTORED_R10_BASE:
        if base["results"][k]["hash"] != r10["results_base"][k]["hash"]:
            drift.append(k)
    sql_twin_ok = (
        base["results"]["q_sql_ann_nsw"]["hash"]
        == base["results"]["q_sim_ann_nsw"]["hash"]
    )

    out = {
        "claim": (
            "touched-keys reshard invariance at sf0.1 on the round-13 code: "
            "the 8 new keys (HNSW pair + maintained hierarchy, graph "
            "ADD/DELETE-view/COMPACT-repair, NSW SQL front door, "
            "partition-pruned IVF) hash-match across local[*]/32 vs "
            "local[5]/7; every refactored key's base hash is byte-identical "
            "to its prior-round value (the best_cells extraction, the "
            "graph-build helper + planes parameter, the lsh_bucket string "
            "builder, and the two ADVICE hygiene fixes changed no output "
            "bit); and the SQL front door equals its DataFrame twin "
            "hash-for-hash"
        ),
        "config_base": {
            "master": base["meta"]["master"],
            "shuffle_partitions": int(base["meta"]["shuffle_partitions"]),
        },
        "config_odd": {
            "master": odd["meta"]["master"],
            "shuffle_partitions": int(odd["meta"]["shuffle_partitions"]),
        },
        "compare": cmp_cfg,
        "new_keys": sorted(NEW_KEYS),
        "refactored_checked_vs_r12": sorted(REFACTORED_R12_BASE),
        "refactored_checked_vs_r10": sorted(REFACTORED_R10_BASE),
        "refactored_drift": drift,
        "sql_twin_identical": sql_twin_ok,
        "results_base": base["results"],
        "results_odd": odd["results"],
    }
    with open("/root/repo/INVARIANCE_touched_r13.json", "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    ok = (
        not cmp_cfg["n_mismatch"]
        and not cmp_cfg["n_err"]
        and not drift
        and sql_twin_ok
    )
    print(
        f"cross-config: {cmp_cfg['n_match']} match, "
        f"{cmp_cfg['n_mismatch']} mismatch, {cmp_cfg['n_err']} err; "
        f"drift vs prior rounds: {drift or 'none'}; "
        f"sql twin identical: {sql_twin_ok}"
    )
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
