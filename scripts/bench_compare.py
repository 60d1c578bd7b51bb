"""Compare two bench JSON records round-over-round.

The bench's own discipline (bench.py note): co-tenant load inflates every
query uniformly, so when either box was loaded, compare per-query RATIOS,
not absolutes. This tool does that comparison mechanically so each round's
verdict can cite one number instead of re-deriving it.

When both records carry ``cpu_cal_s`` (the fixed single-thread md5
calibration bench.py times before any query), ratios are ALSO reported
normalized by cal_old/cal_new — the boot-speed-corrected, code-
attributable change (boxes are re-provisioned between rounds and boots
differ up to ~1.2× on byte-identical code).

Usage:
    python scripts/bench_compare.py BENCH_old.json BENCH_new.json

Accepts either the full diagnostic record (bench.py's first JSON line /
BENCH_local_rN.json) or a driver BENCH_rN.json wrapper whose ``tail``
holds the truncated JSON — per-query times are recovered from the tail
with a tolerant regex so even a truncated record contributes.
"""

from __future__ import annotations

import json
import re
import statistics
import sys


def load_queries(
    path: str,
) -> tuple[dict[str, float], float | None, float | None, float | None]:
    """Return ({query: seconds}, headline_total, load_start, cpu_cal_s)."""
    with open(path) as fh:
        doc = json.load(fh)
    if "queries" in doc and isinstance(doc["queries"], dict):
        q = dict(doc["queries"])
        q.update(doc.get("extra_queries", {}))
        return q, doc.get("value"), doc.get("host_load_avg_1m_start"), doc.get("cpu_cal_s")
    # driver wrapper: recover per-query pairs from the captured tail
    tail = doc.get("tail", "") or ""
    parsed = doc.get("parsed")
    if isinstance(parsed, dict) and "queries" in parsed:
        q = dict(parsed["queries"])
        q.update(parsed.get("extra_queries", {}))
        return (
            q,
            parsed.get("value"),
            parsed.get("host_load_avg_1m_start"),
            parsed.get("cpu_cal_s"),
        )
    pairs = re.findall(r'"(q_[a-z0-9_]+)":\s*([0-9.]+)', tail)
    load = re.search(r'"host_load_avg_1m_start":\s*([0-9.]+)', tail)
    cal = re.search(r'"cpu_cal_s":\s*([0-9.]+)', tail)
    return (
        {k: float(v) for k, v in pairs},
        None,
        float(load.group(1)) if load else None,
        float(cal.group(1)) if cal else None,
    )


def main() -> None:
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    old_q, old_total, old_load, old_cal = load_queries(sys.argv[1])
    new_q, new_total, new_load, new_cal = load_queries(sys.argv[2])
    shared = sorted(set(old_q) & set(new_q))
    if not shared:
        sys.exit("no shared queries between the two records")
    ratios = {k: new_q[k] / old_q[k] for k in shared if old_q[k] > 0}
    med = statistics.median(ratios.values())
    cal_factor = (old_cal / new_cal) if (old_cal and new_cal) else None
    regressed = {k: r for k, r in ratios.items() if r > 1.25}
    improved = sorted(ratios.items(), key=lambda kv: kv[1])[:5]
    out = {
        "n_shared": len(shared),
        "median_ratio_new_over_old": round(med, 3),
        "headline_total_old_s": old_total,
        "headline_total_new_s": new_total,
        "load_start_old": old_load,
        "load_start_new": new_load,
        "regressed_gt_1.25x": {k: round(v, 3) for k, v in sorted(regressed.items())},
        "top_improvements": {k: round(v, 3) for k, v in improved},
        "note": "ratios are new/old per shared query; when either "
        "load_start is high, the median ratio is the comparable "
        "number and absolutes are not",
    }
    if cal_factor is not None:
        out["cpu_cal_old_s"] = old_cal
        out["cpu_cal_new_s"] = new_cal
        out["median_ratio_cal_normalized"] = round(med * cal_factor, 3)
        out["regressed_gt_1.25x_cal_normalized"] = {
            k: round(v * cal_factor, 3)
            for k, v in sorted(ratios.items())
            if v * cal_factor > 1.25
        }
        out["note"] += (
            "; *_cal_normalized multiplies by cpu_cal_old/cpu_cal_new to "
            "remove boot-speed drift — use those when both records have the "
            "calibration field"
        )
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
