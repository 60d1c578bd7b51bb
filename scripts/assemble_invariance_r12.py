"""Assemble INVARIANCE_touched_r12.json from the two sf0.1 hash dumps.

Round-12 touched set: the 8 NEW keys (IVF insert / compact /
compact_refresh / mixed, BM25 compact, the minhash-pairs and
graph-triangles SQL front doors, the watermark late-drop key) plus the
keys whose PLANS or shared constants were touched this round with
outputs required unchanged — q_sim_ann_ivf_delete (body rewired through
the shared ivf_cell_search helper; plan fingerprint already proven
identical by PLAN_AUDIT_r12's empty diff) and the three keys whose
oracle texts moved into shared constants (q_dedup_minhash_pairs,
q_graph_degree, q_graph_triangles — Spark plans untouched by
construction, pinned here anyway).

Drift baselines: q_sim_ann_ivf_delete's sf0.1 hash is recorded in
INVARIANCE_touched_r11.json; the dedup/graph keys' hashes in
INVARIANCE_r10.json (their r11 invariance transfers by the r11 audit's
zero-plan-drift argument).

Usage (run the dumps first):
    python scripts/spark_hash_dump.py /root/testdata/sf0.1 \
        --json=/tmp/dump_base_r12.json <keys...>
    SPARK_GRAFT_CPUS=5 DIS_SHUFFLE_PARTITIONS=7 \
        python scripts/spark_hash_dump.py /root/testdata/sf0.1 \
        --json=/tmp/dump_odd_r12.json <keys...>
    python scripts/assemble_invariance_r12.py
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")
from scripts.spark_hash_dump import compare  # noqa: E402

NEW_KEYS = (
    "q_sim_ann_ivf_insert",
    "q_sim_ann_ivf_compact",
    "q_sim_ann_ivf_compact_refresh",
    "q_sim_ann_ivf_mixed",
    "q_text_bm25_compact",
    "q_sql_minhash_pairs",
    "q_sql_graph_triangles",
    "q_stream_late_drop",
)
REFACTORED_R11_BASE = ("q_sim_ann_ivf_delete",)
REFACTORED_R10_BASE = (
    "q_dedup_minhash_pairs",
    "q_graph_degree",
    "q_graph_triangles",
)
ALL_KEYS = NEW_KEYS + REFACTORED_R11_BASE + REFACTORED_R10_BASE


def main() -> int:
    base = json.load(open("/tmp/dump_base_r12.json"))
    odd = json.load(open("/tmp/dump_odd_r12.json"))
    r11 = json.load(open("/root/repo/INVARIANCE_touched_r11.json"))
    r10 = json.load(open("/root/repo/INVARIANCE_r10.json"))

    cmp_cfg = compare(base, odd)

    drift = []
    for k in REFACTORED_R11_BASE:
        if base["results"][k]["hash"] != r11["results_base"][k]["hash"]:
            drift.append(k)
    for k in REFACTORED_R10_BASE:
        if base["results"][k]["hash"] != r10["results_base"][k]["hash"]:
            drift.append(k)

    out = {
        "claim": (
            "touched-keys reshard invariance at sf0.1 on the round-12 code: "
            "the 8 new keys (index maintenance quadrants + compaction + SQL "
            "front doors + watermark late-drop) hash-match across "
            "local[*]/32 vs local[5]/7, and every refactored key's base "
            "hash is byte-identical to its previous-round value — the "
            "ivf_cell_search rewiring and the shared-oracle-constant "
            "extractions changed no output bit"
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
        "refactored_checked_vs_r11": sorted(REFACTORED_R11_BASE),
        "refactored_checked_vs_r10": sorted(REFACTORED_R10_BASE),
        "refactored_drift": drift,
        "results_base": base["results"],
        "results_odd": odd["results"],
    }
    with open("/root/repo/INVARIANCE_touched_r12.json", "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    ok = not cmp_cfg["n_mismatch"] and not cmp_cfg["n_err"] and not drift
    print(
        f"cross-config: {cmp_cfg['n_match']} match, "
        f"{cmp_cfg['n_mismatch']} mismatch, {cmp_cfg['n_err']} err; "
        f"drift vs prior rounds: {drift or 'none'}"
    )
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
