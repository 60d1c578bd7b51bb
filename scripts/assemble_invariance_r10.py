"""Assemble INVARIANCE_r10.json from the two sf0.1 hash dumps.

Same artifact shape as INVARIANCE_r9.json: base/odd configs, per-key
results, cross-config compare, and the byte-identity check of the base
hashes against the previous round's dump (zero-output-drift evidence —
the prior round's sf0.1 oracle equality transfers transitively to any
key whose hash is unchanged). The two r10-new keys have no r9 baseline
and are reported separately, backed by their own oracle-hash passes in
SWEEP_sf0001_r10 / SWEEP_sf001_r10.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")
from scripts.spark_hash_dump import compare  # noqa: E402


def main() -> int:
    base = json.load(open("/tmp/dump_base_r10.json"))
    odd = json.load(open("/tmp/dump_odd_r10.json"))
    r9 = json.load(open("/root/repo/INVARIANCE_r9.json"))

    cmp_cfg = compare(base, odd)

    r9_base = r9["results_base"]
    overlap = [k for k in base["results"] if k in r9_base]
    new_keys = sorted(k for k in base["results"] if k not in r9_base)
    drift = [
        k
        for k in overlap
        if base["results"][k]["hash"] != r9_base[k]["hash"]
    ]

    out = {
        "claim": (
            "full-registry reshard invariance at sf0.1 on the round-10 code "
            "(streaming trio keys added; dead-letter + run_stream_job are "
            "library surface, not plan changes)"
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
        "vs_r9_dump": {
            "claim": (
                "base-config hashes byte-identical to INVARIANCE_r9's dump on "
                "every overlapping key: zero output drift across the entire "
                "round-10 diff; r9's sf0.1 oracle equality transfers "
                "transitively to this code"
            ),
            "n_overlap": len(overlap),
            "n_byte_identical": len(overlap) - len(drift),
            "n_drift": len(drift),
            "drift_keys": drift,
            "new_keys_no_r9_baseline": new_keys,
            "new_keys_evidence": (
                "oracle hash-pass in SWEEP_sf0001_r10.json and "
                "SWEEP_sf001_r10.json; cross-config match in `compare` above"
            ),
        },
        "results_base": base["results"],
        "results_odd": odd["results"],
    }
    with open("/root/repo/INVARIANCE_r10.json", "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(
        json.dumps(
            {
                "compare": cmp_cfg,
                "n_overlap": len(overlap),
                "n_drift": len(drift),
                "drift_keys": drift,
                "new_keys": new_keys,
            },
            indent=1,
        )
    )
    return 1 if (cmp_cfg["n_mismatch"] or cmp_cfg["n_err"] or drift) else 0


if __name__ == "__main__":
    sys.exit(main())
