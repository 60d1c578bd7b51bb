"""recommend_lsh_planes evidence -> LSH_PLANES_r13.json.

Measures, at three SFs, the kNN-graph build cost and the resulting
walk recall for: the static default planes (oracle keys), the
recommender's choice, and an over-banded count past the recall floor —
turning the documented "(planes+1)/2^planes shrinks as planes grow"
rule (knn_graph docstring) into the measured tradeoff the recommender
encodes (VERDICT r12 directive #5, the PAIR_CAPS_r8 discipline).

Build time is the real Spark build (noop-forced edge materialization);
recall is the numpy mirror of the deterministic walk (mean recall@10
over 50 md5-picked leave-one-out queries — the HNSW_RECALL_r13
methodology, hash-anchored by the oracle keys at planes=4).

Run: python scripts/lsh_planes_probe.py [--json LSH_PLANES_r13.json]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

import duckdb
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from data_ingestor_spark.ext.similarity import (  # noqa: E402
    _LSH_PLANES,
    _NSW_K,
    recommend_lsh_planes,
)

N_QUERIES = 50


def _comp(p: int, j: int) -> float:
    return int(hashlib.md5(f"{p}:{j}".encode()).hexdigest()[:8], 16) / 2147483648.0 - 1.0


def load(sf_dir: str):
    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    return np.array([r[0] for r in rows]), np.array([r[1] for r in rows], float)


def buckets(V: np.ndarray, planes: int) -> np.ndarray:
    H = np.array([[_comp(p, j) for j in range(V.shape[1])] for p in range(planes)])
    return (((V @ H.T) >= 0).astype(int) * (1 << np.arange(planes))).sum(axis=1)


def knn_graph_np(ids, V, bk, members, planes, k=_NSW_K):
    idx = np.where(members)[0]
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    by_bucket: dict[int, list[int]] = {}
    for i in idx:
        by_bucket.setdefault(bk[i], []).append(i)
    graph: dict[int, list[int]] = {}
    n_cand = 0
    for i in idx:
        probe_bks = {bk[i]} | {bk[i] ^ (1 << p) for p in range(planes)}
        cand = [j for b in probe_bks for j in by_bucket.get(b, []) if j != i]
        n_cand += len(cand)
        if not cand:
            graph[ids[i]] = []
            continue
        sims = Vn[cand] @ Vn[i]
        order = sorted(range(len(cand)), key=lambda t: (-sims[t], ids[cand[t]]))
        graph[ids[i]] = [ids[cand[t]] for t in order[:k]]
    return graph, n_cand


def walk(graph, sims, entries, beam, rounds):
    bm = list(entries)
    visited: set[int] = set()
    for _ in range(rounds):
        cand = set(bm)
        for v in bm:
            cand.update(graph.get(v, []))
        visited |= cand
        bm = sorted(cand, key=lambda i: (-sims[i], i))[:beam]
    return visited


def mean_recall(ids, V, graph, beam, rounds):
    base = ids != 0
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    qsel = sorted(ids[base], key=lambda i: hashlib.md5(f"q:{i}".encode()).hexdigest())[:N_QUERIES]
    recs = []
    for qid in qsel:
        qi = int(np.where(ids == qid)[0][0])
        sims = {int(ids[i]): float(Vn[i] @ Vn[qi]) for i in range(len(ids)) if base[i]}
        exact10 = set(sorted((i for i in sims if i != qid), key=lambda i: (-sims[i], i))[:10])
        vis = walk(graph, sims, [min(ids[base])], beam, rounds)
        vis.discard(qid)
        top = sorted(vis, key=lambda i: (-sims[i], i))[:10]
        recs.append(len(set(top) & exact10))
    return round(float(np.mean(recs)), 2)


def main() -> int:
    out_path = "LSH_PLANES_r13.json"
    if "--json" in sys.argv:
        out_path = sys.argv[sys.argv.index("--json") + 1]

    from pyspark.sql import SparkSession, functions as F

    from data_ingestor_spark.ext.similarity import knn_graph, load_vectors

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    report = {"sfs": {}, "note": (
        "build_s = wall time of the Spark knn_graph edge build "
        "(noop-forced, best of 2); recall = numpy-mirror mean recall@10 "
        "over 50 leave-one-out queries with the standard walk budgets; "
        "cands = banded candidate pairs actually enumerated. The "
        "recommender keeps per-node candidate mass ~constant as the "
        "corpus grows (cheaper build) and DOUBLES the kept degree to "
        "compensate the tighter pool — the compensated row must beat "
        "the default's recall at a fraction of its build cost; the "
        "uncompensated row shows the recall the compensation recovers, "
        "and the over-banded row the cliff the floor guard exists for."
    )}
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        ids, V = load(sf_dir)
        n = int((ids != 0).sum())
        plan = recommend_lsh_planes(n)
        over = max(plan.planes + 3, 10)
        e = load_vectors(spark, sf_dir)
        base_df = e.filter(F.col("vec_id") != 0)
        rows = {}
        for tag, planes, k in (
            (f"default_p{_LSH_PLANES}_k{_NSW_K}", _LSH_PLANES, _NSW_K),
            (f"recommended_uncompensated_p{plan.planes}_k{_NSW_K}", plan.planes, _NSW_K),
            (f"recommended_p{plan.planes}_k{plan.k}", plan.planes, plan.k),
            (f"over_banded_p{over}_k{_NSW_K}", over, _NSW_K),
        ):
            if tag in rows:
                continue
            times = []
            for _ in range(2):
                t0 = time.perf_counter()
                knn_graph(base_df, k=k, planes=planes).write.format("noop").mode(
                    "overwrite"
                ).save()
                times.append(round(time.perf_counter() - t0, 2))
            bk = buckets(V, planes)
            g, n_cand = knn_graph_np(ids, V, bk, ids != 0, planes, k=k)
            rows[tag] = {
                "planes": planes,
                "k": k,
                "build_s": min(times),
                "cands_enumerated": n_cand,
                "recall_beam4x3": mean_recall(ids, V, g, 4, 3),
                "recall_beam12x8": mean_recall(ids, V, g, 12, 8),
            }
        report["sfs"][os.path.basename(sf_dir)] = {
            "n_vectors": n,
            "recommendation": {
                "planes": plan.planes,
                "k": plan.k,
                "expected_cands_per_node": plan.expected_cands_per_node,
                "reason": plan.reason,
            },
            "rows": rows,
        }
        print(os.path.basename(sf_dir), json.dumps(rows))
    with open(os.path.join(REPO, out_path), "w") as fh:
        json.dump(report, fh, indent=2, sort_keys=True)
        fh.write("\n")
    print("wrote", out_path)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
