"""Dump canonical result hashes for registry keys, Spark-side only.

Companion to check_oracle.py for invariance evidence on keys whose
DuckDB oracles are multi-hour at large SF: the oracle's output does not
depend on Spark parallelism, so once SWEEP_sf01 has proven
Spark@local[32]/32 == oracle at a given SF, re-running ONLY the Spark
side under a different master/shuffle-partition config and comparing
canonical hashes Spark-vs-Spark proves reshard invariance without
paying the oracle again.

Usage:
    [env overrides] python scripts/spark_hash_dump.py <sf_dir> --json=OUT key...
    python scripts/spark_hash_dump.py --compare A.json B.json

Dump mode writes {key: {rows, cols, hash, elapsed_s, err}}
incrementally; compare mode prints the match/mismatch summary for two
dumps and exits non-zero on any mismatch or error.
"""
from __future__ import annotations

import json
import sys
import time


def compare(dump_a: dict, dump_b: dict) -> dict:
    """Compare two dump artifacts key-by-key.

    Returns {"n_match": int, "n_mismatch": int, "n_err": int,
    "mismatches": [key...], "errors": [key...]} over the keys present
    in BOTH dumps; a key erring in either run counts as an error, and a
    (rows, cols, hash) triple differing counts as a mismatch.
    """
    ra, rb = dump_a["results"], dump_b["results"]
    shared = sorted(set(ra) & set(rb))
    mismatches, errors, n_match = [], [], 0
    for k in shared:
        a, b = ra[k], rb[k]
        if a.get("err") or b.get("err"):
            errors.append(k)
        elif (a["rows"], a["cols"], a["hash"]) == (b["rows"], b["cols"], b["hash"]):
            n_match += 1
        else:
            mismatches.append(k)
    return {
        "n_match": n_match, "n_mismatch": len(mismatches),
        "n_err": len(errors), "mismatches": mismatches, "errors": errors,
    }


def main() -> int:
    if sys.argv[1:2] == ["--compare"]:
        a = json.load(open(sys.argv[2]))
        b = json.load(open(sys.argv[3]))
        out = compare(a, b)
        print(json.dumps(out, indent=1))
        return 1 if out["n_mismatch"] or out["n_err"] else 0

    sys.path.insert(0, ".")
    from scripts.check_oracle import canonical  # noqa: E402

    from scripts.check_oracle import parse_json_flag  # noqa: E402

    json_out, args = parse_json_flag(sys.argv[1:])
    sf_dir = args[0]
    keys = args[1:]

    from data_ingestor_spark.plans.queries import REGISTRY  # noqa: E402
    from data_ingestor_spark.session import get_session

    spark = get_session()
    conf = spark.sparkContext.getConf()
    meta = {
        "master": conf.get("spark.master"),
        "shuffle_partitions": spark.conf.get("spark.sql.shuffle.partitions"),
        "sf_dir": sf_dir,
    }
    results: dict[str, dict] = {}

    def flush() -> None:
        if json_out:
            from scripts.check_oracle import atomic_dump_json

            atomic_dump_json(json_out, {"meta": meta, "results": results})

    for name in keys:
        t0 = time.monotonic()
        try:
            pdf = REGISTRY[name].fn(spark, sf_dir).toPandas()
            n, cols, h = canonical(pdf)
            results[name] = {
                "rows": n, "cols": cols, "hash": h, "err": None,
                "elapsed_s": round(time.monotonic() - t0, 3),
            }
            print(f"ok    {name}: {n} rows {h[:16]}")
        except Exception as e:  # noqa: BLE001
            results[name] = {
                "rows": None, "cols": None, "hash": None, "err": str(e)[:500],
                "elapsed_s": round(time.monotonic() - t0, 3),
            }
            print(f"ERR   {name}: {e}")
        flush()
    flush()
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
