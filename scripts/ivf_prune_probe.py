"""IVF partition-pruning evidence -> IVF_PRUNE_r13.json.

Runs q_sim_ann_ivf_pruned's physical path at two SFs and records, from
the EXECUTED plan's scan metrics (not the compile-time text), the file
and partition counts the pruned scan actually touched vs the full
cell-partitioned layout — turning the "at scale the probe is a
partition-pruned scan of 1/n_cells of the index" docstring claim
(ext/similarity.py, the whole IVF family) into checked evidence
(VERDICT r12 directive #4). Also captures the compile-time
``PartitionFilters`` line for the scan.

Run: python scripts/ivf_prune_probe.py [--json IVF_PRUNE_r13.json]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def scan_metrics(df) -> dict:
    """Executed-plan leaf-scan metrics (forces the plan first)."""
    df.collect()
    qe = df._jdf.queryExecution()
    leaves = qe.executedPlan().collectLeaves()
    out = {}
    for i in range(leaves.size()):
        node = leaves.apply(i)
        if "FileSourceScan" not in node.getClass().getName():
            continue
        m = node.metrics()
        it = m.iterator()
        vals = {}
        while it.hasNext():
            kv = it.next()
            vals[kv._1()] = int(kv._2().value())
        out[f"scan_{i}"] = vals
    return out


def main() -> int:
    out_path = "IVF_PRUNE_r13.json"
    if "--json" in sys.argv:
        out_path = sys.argv[sys.argv.index("--json") + 1]

    from pyspark.sql import SparkSession, functions as F

    from data_ingestor_spark.ext.similarity import (
        best_cells,
        cosine,
        label_centroids,
        load_vectors,
    )
    from data_ingestor_spark.plans.registry import scratch_dir

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        # AQE wraps scans in query-stage nodes, hiding FileSourceScan
        # from collectLeaves; pruning is AQE-independent, so probe
        # without it for direct metric access
        .config("spark.sql.adaptive.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")

    report = {"sfs": {}, "note": (
        "numFiles/numPartitions come from the EXECUTED FileSourceScan's "
        "SQL metrics after collecting the pruned search; full_layout_* "
        "count the same layout scanned without the cell filter. "
        "partition_filters is the compile-time scan attribute. The pruned "
        "scan must read 1/n_cells of the files — the IVF family's scale "
        "claim as a measured number."
    )}
    for sf_dir in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        e = load_vectors(spark, sf_dir)
        base = e.filter(F.col("vec_id") != 0)
        out = os.path.join(
            scratch_dir(f"probe_ivf_cells_{os.path.basename(sf_dir)}"), "cells"
        )
        base.write.mode("overwrite").partitionBy("label").parquet(out)
        cents = label_centroids(base)
        qv = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("_qe"))
        qcell = best_cells(cents, qv).collect()[0][0]
        members = spark.read.parquet(out).filter(F.col("label") == F.lit(qcell))
        pruned = members.crossJoin(F.broadcast(qv)).select(
            "vec_id", "label", cosine("embedding", "_qe").alias("cos_sim")
        ).orderBy(F.col("cos_sim").desc(), "vec_id").limit(10)
        full = spark.read.parquet(out).crossJoin(F.broadcast(qv)).select(
            "vec_id", "label", cosine("embedding", "_qe").alias("cos_sim")
        ).orderBy(F.col("cos_sim").desc(), "vec_id").limit(10)

        plan = pruned._jdf.queryExecution().explainString(mode)
        pf = [ln.strip() for ln in plan.splitlines() if "PartitionFilters:" in ln]
        # the COMPRESSED family's serving layout (q_sim_ann_ivfpq_pruned):
        # stored PQ codes partitioned by cell, literal ADC table, pruned
        # lookup scan — same 1/n_cells contract over m-byte codes
        from data_ingestor_spark.ext.similarity import q_sim_ann_ivfpq_pruned
        from data_ingestor_spark.plans.registry import scratch_dir as _sd

        pq = q_sim_ann_ivfpq_pruned(spark, sf_dir)
        plan_pq = pq._jdf.queryExecution().explainString(mode)
        codes_dir = os.path.join(
            _sd(f"q_ivfpq_cells_{os.path.basename(sf_dir.rstrip(chr(47)))}"), "codes"
        )
        rep = {
            "probed_cell": int(qcell),
            "n_cells": base.select("label").distinct().count(),
            "pruned_scan": scan_metrics(pruned),
            "full_layout_scan": scan_metrics(full),
            "partition_filters": pf,
            "ivfpq_codes_pruned_scan": scan_metrics(pq),
            "ivfpq_codes_full_layout_scan": scan_metrics(spark.read.parquet(codes_dir)),
            "ivfpq_partition_filters": [
                ln.strip() for ln in plan_pq.splitlines() if "PartitionFilters:" in ln
            ],
        }
        # the TEXT index's serving layout (q_text_bm25_pruned): postings
        # bucketed by term hash, driver-side bucket router, pruned probe
        from data_ingestor_spark.ext.text import q_text_bm25_pruned

        bm = q_text_bm25_pruned(spark, sf_dir)
        plan_bm = bm._jdf.queryExecution().explainString(mode)
        postings_dir = os.path.join(
            _sd(f"q_bm25_buckets_{os.path.basename(sf_dir.rstrip(chr(47)))}"),
            "postings",
        )
        rep["bm25_postings_pruned_scan"] = scan_metrics(bm)
        rep["bm25_postings_full_layout_scan"] = scan_metrics(
            spark.read.parquet(postings_dir)
        )
        rep["bm25_partition_filters"] = [
            ln.strip() for ln in plan_bm.splitlines() if "PartitionFilters:" in ln
        ]
        report["sfs"][os.path.basename(sf_dir)] = rep
        print(os.path.basename(sf_dir), json.dumps(rep))
    with open(os.path.join(REPO, out_path), "w") as fh:
        json.dump(report, fh, indent=2, sort_keys=True)
        fh.write("\n")
    print("wrote", out_path)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
