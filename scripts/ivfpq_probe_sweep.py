"""Measure the IVF-PQ nprobe -> (recall@10, scanned fraction) frontier.

The multiprobe knob (`q_sim_ann_ivfpq_multiprobe`,
`ext/similarity.py::ivfpq_adc_scores_multiprobe`) exists to buy back the
cell-miss recall that q_sim_ann_ivfpq_recall measures; this sweep gives
the knob its measured operating recipe (the pair-cap / triangle-cap
discipline): for each nprobe, the exact recall@10 vs brute-force cosine
ground truth and the fraction of the corpus the probe scans. Both
numbers are exact algorithm properties (hash-proven engine-exact), so
the artifact is a property of the INDEX, not of a boot.

Usage: python scripts/ivfpq_probe_sweep.py [sf_dir ...] [--json OUT]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def sweep(spark, sf_dir: str, probe_grid=(1, 2, 3, 5, 10)) -> dict:
    from data_ingestor_spark.ext.similarity import (
        ivfpq_adc_scores_multiprobe,
        load_vectors,
        topk_cosine,
    )

    e = load_vectors(spark, sf_dir).localCheckpoint()
    n_base = e.filter(F.col("vec_id") != 0).count()
    exact10 = {
        r["vec_id"]
        for r in topk_cosine(
            e.filter(F.col("vec_id") != 0), e.filter(F.col("vec_id") == 0), k=10
        ).collect()
    }
    rows = []
    # two independent loss axes: nprobe fixes cell miss (m pinned at 4),
    # m fixes reconstruction error (probes pinned at all-cells, so the
    # residual recall ceiling is isolated from cell miss)
    grid = [(p, 4) for p in probe_grid] + [(10, m) for m in (8, 16, 32)]
    for p, m in grid:
        scores = ivfpq_adc_scores_multiprobe(e, probes=p, m=m)
        scanned = scores.count()  # candidates = members of probed cells
        got10 = {
            r["vec_id"]
            for r in scores.orderBy("adist_micro", "vec_id").limit(10).collect()
        }
        hits = len(exact10 & got10)
        rows.append(
            {
                "probes": p,
                "m_subspaces": m,
                "scanned": scanned,
                "scanned_frac_bp": scanned * 10000 // n_base,
                "hits_at_10": hits,
                "recall_bp": hits * 10000 // len(exact10),
            }
        )
        print(f"  probes={p} m={m}: scanned {scanned}/{n_base} recall@10 {hits}/10")
    return {"sf_dir": sf_dir, "n_base": n_base, "grid": rows}


def main(argv):
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    sf_dirs = argv or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]

    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("data-ingestor-spark-ivfpq-probe-sweep")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    out = {"claim": __doc__.split("\n")[0], "sweeps": [sweep(spark, d) for d in sf_dirs]}
    if json_out:
        with open(json_out, "w") as fh:
            json.dump(out, fh, indent=1)
        print(f"wrote {json_out}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
