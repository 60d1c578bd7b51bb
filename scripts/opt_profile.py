"""Per-query and sub-stage profiling for the r13 optimization round.

Times registry keys with the bench's exact methodology (noop sink, best
of N in one warmed session) and optionally dumps ``explain("formatted")``
to a directory — the measure-first tooling of
/opt/skills/guides/spark_optimization_guide.md §1 applied to this repo:

    python scripts/opt_profile.py --keys q_agg_basic,q_tpch_q3 \
        [--sf /root/testdata/sf0.1] [--reps 2] [--plans-dir plans/r13 \
        --plan-suffix _before] [--json /tmp/prof.json]

The session mirrors bench.py exactly (local[$SPARK_GRAFT_CPUS],
shuffle.partitions=$SPARK_GRAFT_CPUS, AQE on, UTC, noop sink) so numbers
here are directly comparable to the bench's per-key entries.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--keys", required=True, help="comma-separated registry keys")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--plan-suffix", default="")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("opt-profile")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from data_ingestor_spark.plans import queries as q

    # same JVM warmup as bench.py
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{args.sf}/region.parquet").count()

    out: dict[str, dict] = {}
    for name in args.keys.split(","):
        name = name.strip()
        spec = q.REGISTRY.get(name)
        if spec is None:
            out[name] = {"err": "unknown key"}
            continue
        spark.sparkContext.setJobDescription(f"opt-profile:{name}")
        runs = []
        t_build = None
        err = None
        try:
            for _ in range(args.reps):
                t0 = time.perf_counter()
                df = spec.fn(spark, args.sf)
                t_build = time.perf_counter() - t0
                df.write.format("noop").mode("overwrite").save()
                runs.append(round(time.perf_counter() - t0, 3))
            if args.plans_dir:
                os.makedirs(args.plans_dir, exist_ok=True)
                plan = spec.fn(spark, args.sf)._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
                )
                with open(
                    os.path.join(args.plans_dir, f"{name}{args.plan_suffix}.txt"), "w"
                ) as fh:
                    fh.write(plan)
        except Exception as e:  # noqa: BLE001
            err = f"{type(e).__name__}: {e}"[:300]
        out[name] = {
            "runs": runs,
            "best": min(runs) if runs else None,
            "build_s": round(t_build, 3) if t_build is not None else None,
            "err": err,
        }
        print(name, out[name], flush=True)
        spark.sparkContext.setJobDescription(None)

    if args.json:
        with open(args.json, "w") as fh:
            json.dump(out, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
