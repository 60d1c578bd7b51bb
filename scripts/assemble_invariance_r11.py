"""Assemble INVARIANCE_touched_r11.json from the two sf0.1 hash dumps.

Round-11 touched set: the 5 NEW keys (q_text_bm25_delete,
q_sim_ann_ivf_delete, q_sql_bm25, q_sql_rrf_fusion, q_sql_ann_ivfpq)
plus the keys whose PLANS were refactored this round with outputs
required unchanged — the BM25 family (shared _bm25_per_term /
_tokenize_docs / _term_postings helpers) and the IVFPQ family (shared
_ivfpq_adc_scores_impl + the in-plan dim%m guard, which rewrites the
subspace-width expression in every ADC slice).

Artifact shape mirrors INVARIANCE_touched_r10_final.json: base/odd
configs, per-key results, cross-config compare, and a byte-identity
drift check of the refactored keys' base hashes against
INVARIANCE_r10.json (their r10 sf0.1 oracle equality transfers
transitively to any key whose hash is unchanged). The new keys have no
r10 baseline and are reported separately, backed by their own
oracle-hash passes in SWEEP_sf0001_r11 / SWEEP_sf001_r11.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")
from scripts.spark_hash_dump import compare  # noqa: E402

NEW_KEYS = (
    "q_text_bm25_delete",
    "q_sim_ann_ivf_delete",
    "q_sql_bm25",
    "q_sql_rrf_fusion",
    "q_sql_ann_ivfpq",
)
REFACTORED_KEYS = (
    "q_text_bm25",
    "q_text_bm25_batch",
    "q_text_bm25_incremental",
    "q_text_rrf_fusion",
    "q_sim_ann_ivfpq",
    "q_sim_ann_ivfpq_multiprobe",
    "q_sim_ann_ivfpq_recall",
)


def main() -> int:
    base = json.load(open("/tmp/dump_base_r11.json"))
    odd = json.load(open("/tmp/dump_odd_r11.json"))
    r10 = json.load(open("/root/repo/INVARIANCE_r10.json"))

    cmp_cfg = compare(base, odd)

    r10_base = r10["results_base"]
    drift = [
        k
        for k in REFACTORED_KEYS
        if k in r10_base
        and base["results"][k]["hash"] != r10_base[k]["hash"]
    ]
    checked_vs_r10 = [k for k in REFACTORED_KEYS if k in r10_base]

    out = {
        "claim": (
            "touched-keys reshard invariance at sf0.1 on the round-11 code: "
            "the 5 new keys (deletion twins + SQL front door) hash-match "
            "across local[*]/32 vs local[5]/7, and every refactored "
            "BM25/IVFPQ key's base hash is byte-identical to its "
            "INVARIANCE_r10 value — the shared-helper refactors and the "
            "in-plan dim%m guard changed no output bit"
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
        "refactored_keys_checked_vs_r10": sorted(checked_vs_r10),
        "refactored_drift_vs_r10": drift,
        "results_base": base["results"],
        "results_odd": odd["results"],
    }
    with open("/root/repo/INVARIANCE_touched_r11.json", "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    ok = not cmp_cfg["n_mismatch"] and not cmp_cfg["n_err"] and not drift
    print(
        f"cross-config: {cmp_cfg['n_match']} match, "
        f"{cmp_cfg['n_mismatch']} mismatch, {cmp_cfg['n_err']} err; "
        f"drift vs r10: {drift or 'none'}"
    )
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
