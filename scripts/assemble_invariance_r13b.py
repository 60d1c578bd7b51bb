"""Assemble INVARIANCE_touched_r13b.json from the two sf0.1 hash dumps
for the LATE-round-13 touched set (the second r13 batch: the
training-pipeline rewrite family and the pruned serving trio).

Touched set:

- the 4 NEW keys: q_dedup_lines / q_dedup_lines_incremental (C4-style
  segment rewrite + its maintenance quadrant), q_sim_ann_ivfpq_pruned
  (stored PQ codes + literal ADC table over the cell-partitioned
  layout), q_text_bm25_pruned (term-bucketed postings + df/stats
  sidecars);
- the IVFPQ quartet rewired through the extracted
  ``_ivfpq_probe_cells`` / ``_ivfpq_residuals`` / ``_ivfpq_codebook``
  helpers and the parametrized ``_ws_guard_expr`` — outputs required
  unchanged vs their INVARIANCE_touched_r11.json sf0.1 baselines;
- q_text_bm25 (untouched; dumped for the twin identity below).

Twin identities asserted (the same-output contract every serving
layout carries): q_sim_ann_ivfpq_pruned == q_sim_ann_ivfpq ==
q_sql_ann_ivfpq, and q_text_bm25_pruned == q_text_bm25.

Usage (run the dumps first):
    python scripts/spark_hash_dump.py /root/testdata/sf0.1 \
        --json=/tmp/dump_base_r13b.json <keys...>
    SPARK_GRAFT_CPUS=5 DIS_SHUFFLE_PARTITIONS=7 \
        python scripts/spark_hash_dump.py /root/testdata/sf0.1 \
        --json=/tmp/dump_odd_r13b.json <keys...>
    python scripts/assemble_invariance_r13b.py
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")
from scripts.spark_hash_dump import compare  # noqa: E402

NEW_KEYS = (
    "q_dedup_lines",
    "q_dedup_lines_incremental",
    "q_sim_ann_ivfpq_pruned",
    "q_text_bm25_pruned",
    "q_stream_bm25_maintain",
    "q_sim_ann_ivfpq_insert",
    "q_sim_ann_ivfpq_delete",
    "q_sim_ann_ivfpq_compact",
    "q_sim_ann_ivfpq_compact_refresh",
)
REFACTORED_R11_BASE = (
    "q_sim_ann_ivfpq",
    "q_sim_ann_ivfpq_multiprobe",
    "q_sim_ann_ivfpq_recall",
    "q_sql_ann_ivfpq",
)
UNTOUCHED_TWIN = ("q_text_bm25",)
ALL_KEYS = NEW_KEYS + REFACTORED_R11_BASE + UNTOUCHED_TWIN


def main() -> int:
    base = json.load(open("/tmp/dump_base_r13b.json"))
    odd = json.load(open("/tmp/dump_odd_r13b.json"))
    r11 = json.load(open("/root/repo/INVARIANCE_touched_r11.json"))

    cmp_cfg = compare(base, odd)

    drift = []
    for k in REFACTORED_R11_BASE:
        if base["results"][k]["hash"] != r11["results_base"][k]["hash"]:
            drift.append(k)
    twin_ok = {
        "ivfpq_pruned==ivfpq": base["results"]["q_sim_ann_ivfpq_pruned"]["hash"]
        == base["results"]["q_sim_ann_ivfpq"]["hash"],
        "sql_ann_ivfpq==ivfpq": base["results"]["q_sql_ann_ivfpq"]["hash"]
        == base["results"]["q_sim_ann_ivfpq"]["hash"],
        "bm25_pruned==bm25": base["results"]["q_text_bm25_pruned"]["hash"]
        == base["results"]["q_text_bm25"]["hash"],
        "stream_bm25_maintained==bm25": base["results"]["q_stream_bm25_maintain"][
            "hash"
        ]
        == base["results"]["q_text_bm25"]["hash"],
        "ivfpq_compact==delete_view": base["results"]["q_sim_ann_ivfpq_compact"][
            "hash"
        ]
        == base["results"]["q_sim_ann_ivfpq_delete"]["hash"],
    }

    out = {
        "claim": (
            "touched-keys reshard invariance at sf0.1 on the late-r13 code: "
            "the 9 new keys (segment rewrite + incremental admission, "
            "stored-codes IVFPQ serving, bucketed BM25 serving, streaming "
            "segment-flush index maintenance, the compressed family's "
            "full maintenance quadrant set ADD/DELETE/compact/refresh) "
            "hash-match across local[*]/32 "
            "vs local[5]/7; the IVFPQ quartet's base hashes are "
            "byte-identical to their r11 values (the probe/residual/"
            "codebook extraction changed no output bit); every pruned "
            "serving layout equals its in-plan sibling hash-for-hash; and "
            "the stream-maintained index serves the exact batch-build "
            "top-20"
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
        "refactored_drift": drift,
        "twin_identical": twin_ok,
        "results_base": base["results"],
        "results_odd": odd["results"],
    }
    with open("/root/repo/INVARIANCE_touched_r13b.json", "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    ok = (
        not cmp_cfg["n_mismatch"]
        and not cmp_cfg["n_err"]
        and not drift
        and all(twin_ok.values())
    )
    print(
        f"cross-config: {cmp_cfg['n_match']} match, {cmp_cfg['n_mismatch']} mismatch, "
        f"{cmp_cfg['n_err']} err; drift: {drift or 'none'}; twins: {twin_ok}"
    )
    print("wrote INVARIANCE_touched_r13b.json", "OK" if ok else "PROBLEMS")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
