"""Measure the triangle-counter escape hatches at sf0.1 — the operating
recipe behind ``recommend_triangle_caps`` (judge directive r10 #4, the
pair-cap playbook of ``PAIR_CAPS_r8.json`` applied to the last 100 TB
operator with knobs but no measured recipe).

    python scripts/triangle_caps_probe.py [--sf /root/testdata/sf0.1] \
        [--json TRIANGLE_CAPS_r10.json]

What it measures, all in ONE session so the LSH edge pipeline
(`_pair_edges`, localCheckpoint-ed and memoized) is paid once:

- the EXACT compact-forward plan: wall time, vertices, total triangle
  mass (Σ per-vertex counts = 3 × #triangles);
- ``max_out_neighbors`` at the K the recommender derives from the real
  ``q_graph_degree`` histogram under a 10M-wedge budget, plus a larger
  fixed K: wall time and the lower bound's coverage of the exact mass;
- ``edge_sample_bp=2500``: wall time and the DOULION estimate's
  accuracy on total mass (unbiased, (10⁴/p)³-scaled).

The oracle key ``q_graph_triangles`` always runs exact; these knobs are
for corpora whose ``q_graph_degree`` histogram shows the quasi-clique
blowup before dedup collapses it. The JSON verdicts are what
``recommend_triangle_caps``'s regime boundaries encode.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--json", dest="json_out", default="TRIANGLE_CAPS_r10.json")
    ap.add_argument("--budget", type=int, default=10_000_000)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from data_ingestor_spark.ext.graph import (
        _pair_edges,
        recommend_triangle_caps,
        triangle_counts,
    )
    from data_ingestor_spark.plans.queries import REGISTRY

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("triangle-caps-probe")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    load0 = os.getloadavg()[0]

    edges = _pair_edges(spark, args.sf)  # pay the LSH pipeline once
    n_edges = edges.count()

    deg_rows = REGISTRY["q_graph_degree"].fn(spark, args.sf).collect()
    hist: dict[int, int] = {}
    for r in deg_rows:
        hist[r["degree"]] = hist.get(r["degree"], 0) + 1
    plan = recommend_triangle_caps(
        sorted(hist.items()), max_wedges=args.budget, estimate_ok=False
    )
    plan_est = recommend_triangle_caps(sorted(hist.items()), max_wedges=args.budget)

    def run(label: str, **knobs) -> dict:
        t0 = time.monotonic()
        out = triangle_counts(edges, **knobs)
        col = out.columns[1]
        row = out.agg(
            F.count(F.lit(1)).alias("nv"), F.sum(F.col(col)).alias("mass")
        ).collect()[0]
        dt = round(time.monotonic() - t0, 2)
        rec = {
            "s": dt,
            "n_vertices": int(row["nv"]),
            "triangle_mass": float(row["mass"]),
        }
        print(f"{label}: {rec}", flush=True)
        return rec

    results: dict = {
        "what": (
            "measured effect of the triangle-counter caps at sf0.1 "
            f"(local[{cpus}], agg timing over the memoized edge list; "
            "LSH pipeline cost excluded from all rows equally)"
        ),
        "n_edges": n_edges,
        "degree_histogram_summary": {
            "n_vertices": sum(hist.values()),
            "max_degree": max(hist),
            "distinct_degrees": len(hist),
        },
        "recommender_default_estimate_ok": {
            "budget_wedges": args.budget,
            "max_out_neighbors": plan_est.max_out_neighbors,
            "edge_sample_bp": plan_est.edge_sample_bp,
            "total_wedges_bound": plan_est.total_wedges,
            "expected_wedges": plan_est.expected_wedges,
            "reason": plan_est.reason,
        },
        "recommender_deterministic": {
            "budget_wedges": args.budget,
            "max_out_neighbors": plan.max_out_neighbors,
            "edge_sample_bp": plan.edge_sample_bp,
            "total_wedges_bound": plan.total_wedges,
            "expected_wedges": plan.expected_wedges,
            "reason": plan.reason,
        },
        "host_load_avg_1m_start": round(load0, 2),
    }

    exact = run("exact")
    results["exact"] = exact

    ks = []
    if plan.max_out_neighbors is not None:
        ks.append(plan.max_out_neighbors)
    ks.append(256)
    for k in dict.fromkeys(ks):
        rec = run(f"max_out_neighbors_{k}", max_out_neighbors=k)
        rec["coverage_of_exact"] = round(rec["triangle_mass"] / exact["triangle_mass"], 4)
        rec["speedup_vs_exact"] = round(exact["s"] / rec["s"], 2)
        results[f"max_out_neighbors_{k}"] = rec

    bps = [2500]
    if plan_est.edge_sample_bp is not None:
        bps.append(plan_est.edge_sample_bp)
    for bp in dict.fromkeys(bps):
        rec = run(f"edge_sample_bp_{bp}", edge_sample_bp=bp)
        rec["estimate_over_exact"] = round(rec["triangle_mass"] / exact["triangle_mass"], 4)
        rec["speedup_vs_exact"] = round(exact["s"] / rec["s"], 2)
        results[f"edge_sample_bp_{bp}"] = rec

    results["host_load_avg_1m_end"] = round(os.getloadavg()[0], 2)
    with open(os.path.join(REPO, args.json_out), "w") as fh:
        json.dump(results, fh, indent=1, sort_keys=True)
    print(f"wrote {args.json_out}", flush=True)


if __name__ == "__main__":
    main()
