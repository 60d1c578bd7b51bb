"""Measure the IVF compaction centroid-refresh recall delta.

q_sim_ann_ivf_compact proves compaction is HASH-NEUTRAL with the
tombstone view (stale centroids); q_sim_ann_ivf_compact_refresh proves
the refreshed index equals a rebuild over survivors. What neither key
shows is whether the refresh is WORTH the retrain — this probe gives
the cut-over its measured recipe (the IVFPQ_PROBES discipline): exact
recall@10 of the stale-centroid and refreshed-centroid single-probe
searches against brute-force cosine ground truth over the survivors,
at each SF. Both numbers are exact algorithm properties (hash-proven
engine-exact), so the artifact is a property of the INDEX, not a boot.

Usage: python scripts/ivf_compact_probe.py [sf_dir ...] [--json OUT]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def probe(spark, sf_dir: str) -> dict:
    from data_ingestor_spark.ext.similarity import (
        ivf_cell_search,
        ivf_compact,
        label_centroids,
        load_vectors,
        topk_cosine,
    )

    e = load_vectors(spark, sf_dir).localCheckpoint()
    base = e.filter(F.col("vec_id") != 0)
    tomb = base.filter(F.col("vec_id") % 7 == 3).select("vec_id")
    qv_raw = e.filter(F.col("vec_id") == 0)
    qv = qv_raw.select(F.col("embedding").alias("_qe"))

    survivors, refreshed = ivf_compact(base, tomb)
    n_surv = survivors.count()
    exact10 = {r["vec_id"] for r in topk_cosine(survivors, qv_raw, k=10).collect()}

    stale = label_centroids(base)
    got_stale = {r["vec_id"] for r in ivf_cell_search(survivors, stale, qv).collect()}
    got_refr = {r["vec_id"] for r in ivf_cell_search(survivors, refreshed, qv).collect()}
    return {
        "sf_dir": sf_dir,
        "n_base": base.count(),
        "n_survivors": n_surv,
        "recall_at_10_stale_bp": len(got_stale & exact10) * 10000 // 10,
        "recall_at_10_refreshed_bp": len(got_refr & exact10) * 10000 // 10,
        "probe_identical": got_stale == got_refr,
    }


def synthetic_demo(spark, tmp_dir: str) -> dict:
    """A corpus where the refresh measurably matters: cell B's mass is
    tombstoned members sitting NEAR the query, dragging its stale
    centroid onto the query's probe; its survivors are orthogonal. The
    stale probe therefore lands in B (recall 0/10) while the refreshed
    centroid moves B away and the probe recovers cell A, which holds
    the true neighbors (recall 10/10). This is the production shape:
    a hot shard deleted en masse leaves a stale centroid pointing at
    vectors that no longer exist."""
    import numpy as np

    from data_ingestor_spark.ext.similarity import (
        ivf_cell_search,
        ivf_compact,
        label_centroids,
        load_vectors,
        topk_cosine,
    )

    dim = 8
    q = np.zeros(dim, dtype=np.float32)
    q[0] = 1.0
    rng = np.random.default_rng(7)
    rows = [(0, [float(x) for x in q], 0)]
    vid = 1
    # cell A: 12 survivors at cos~0.9 to q, displaced in a COMMON
    # direction (e3) so the cell mean stays at cos~0.9 instead of the
    # noise averaging out back onto q — the true top-10 lives here
    e3 = np.zeros(dim, dtype=np.float32)
    e3[2] = 1.0
    for _ in range(12):
        v = q * 0.9 + 0.436 * e3 + 0.01 * rng.normal(size=dim).astype(np.float32)
        v = v / np.linalg.norm(v)
        rows.append((vid, [float(x) for x in v.astype(np.float32)], 0))
        vid += 1
    # cell B: 20 TOMBSTONED members hugging q (vid % 1000 >= 900 marks
    # them), plus 5 orthogonal survivors
    e2 = np.zeros(dim, dtype=np.float32)
    e2[1] = 1.0
    for _ in range(20):
        v = q * 0.99 + 0.01 * rng.normal(size=dim).astype(np.float32)
        v = v / np.linalg.norm(v)
        rows.append((900 + vid, [float(x) for x in v.astype(np.float32)], 1))
        vid += 1
    for _ in range(5):
        v = e2 + 0.01 * rng.normal(size=dim).astype(np.float32)
        v = v / np.linalg.norm(v)
        rows.append((vid, [float(x) for x in v.astype(np.float32)], 1))
        vid += 1
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(os.path.join(tmp_dir, "embeddings.parquet"))

    from pyspark.sql import functions as F  # noqa: PLC0415

    e = load_vectors(spark, tmp_dir)
    base = e.filter(F.col("vec_id") != 0)
    tomb = base.filter(F.col("vec_id") >= 900).select("vec_id")
    qv_raw = e.filter(F.col("vec_id") == 0)
    qv = qv_raw.select(F.col("embedding").alias("_qe"))
    survivors, refreshed = ivf_compact(base, tomb)
    exact10 = {r["vec_id"] for r in topk_cosine(survivors, qv_raw, k=10).collect()}
    stale = label_centroids(base)
    got_stale = {r["vec_id"] for r in ivf_cell_search(survivors, stale, qv).collect()}
    got_refr = {r["vec_id"] for r in ivf_cell_search(survivors, refreshed, qv).collect()}
    return {
        "corpus": "synthetic mass-delete of a hot cell (see docstring)",
        "n_survivors": survivors.count(),
        "recall_at_10_stale_bp": len(got_stale & exact10) * 10000 // 10,
        "recall_at_10_refreshed_bp": len(got_refr & exact10) * 10000 // 10,
    }


def main() -> int:
    argv = sys.argv[1:]
    out_json = None
    if "--json" in argv:
        i = argv.index("--json")
        out_json = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    sf_dirs = argv or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("data-ingestor-spark-ivf-compact-probe")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        result = {
            "claim": (
                "IVF compaction centroid-refresh recall delta: exact recall@10 "
                "vs brute-force over survivors, stale vs refreshed centroids, "
                "single probe."
            ),
            "probes": [probe(spark, d) for d in sf_dirs],
            "refresh_matters_demo": synthetic_demo(spark, tmp),
        }
    print(json.dumps(result, indent=1))
    if out_json:
        with open(out_json, "w") as fh:
            json.dump(result, fh, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
