"""Local mirror of the driver's correctness gate.

Runs every registered query's Spark plan AND its DuckDB oracle at the
given scale factor, compares row-count, column names, and an
order-insensitive canonical value hash. Stricter than any plausible
driver check: values are compared at full precision (floats via repr,
timestamps ISO); Decimal and array/map result cells are rejected
outright because the driver's pandas hasher cannot compare them
consistently across engines.

Usage: python scripts/check_oracle.py [sf_dir] [query ...] [--py-oracles]
           [--json OUT.json]

--py-oracles: for queries listed in PY_ORACLES (the connected-component
    cluster keys), replace the recursive-CTE SQL oracle with a
    driver-side plain-Python union-find over the SAME DuckDB-derived
    LSH pair list. The recursive reachability CTE enumerates
    Σ|component|² (id, reachable) rows — infeasible at sf0.1 where the
    largest component has 2063 nodes — while the edge list plus an
    O(E α(V)) union-find stays trivially cheap at any SF. The edge list
    itself remains DuckDB-computed (independent of the Spark engine
    under test), so this is still a cross-engine check.
--json OUT: additionally write a machine-readable per-key result map
    (the SWEEP artifact format: rows/schema/hash match booleans, row
    counts, oracle kind, elapsed seconds).
"""

from __future__ import annotations

import hashlib
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from datetime import date, datetime
from decimal import Decimal

import duckdb

SF_DIR_DEFAULT = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _canon_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        if v == int(v) and abs(v) < 1e15:
            return repr(float(v))
        return repr(v)
    if isinstance(v, Decimal):
        # The driver's pandas hasher stringifies Spark's Decimal objects
        # (e.g. Decimal('45.30')) while DuckDB surfaces float64 (45.3), so
        # a DecimalType result column hash-diverges driver-side even when
        # every value is numerically identical (proven root cause of the
        # r2/r3 q_subq_scalar / q_dedup_latest failures).  Fail LOCALLY
        # instead of normalizing: project CAST(... AS DOUBLE) in the final
        # select of both engines.
        raise TypeError(
            "DecimalType result cell — cast the final projection to DOUBLE "
            "on both the Spark and oracle sides so the driver's pandas "
            "hasher sees identical float64 columns"
        )
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, (list, tuple, dict)):
        # The driver's canonicalizer (pandas-based sort/hash) cannot hash
        # list/map cells and records the whole query as an error.  Mirror
        # that here so an array-typed result column fails LOCALLY instead
        # of silently passing and then failing in the driver's gate.
        raise TypeError(
            "array/map-typed result cell — surface it as a joined string "
            "(array_join / array_to_string) so the oracle harness can hash it"
        )
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, bool):
        return str(int(v))
    return str(v)



def atomic_dump_json(path: str, obj) -> None:
    """Write JSON via a same-directory temp file + os.replace so a crash
    mid-dump can never leave a truncated artifact (the whole point of the
    per-key flush during multi-hour sweeps)."""
    import json

    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


def canonical(df_pandas) -> tuple[int, list[str], str]:
    import numpy as np
    import pandas as pd

    cols = sorted(df_pandas.columns)
    pdf = df_pandas[cols]
    rows = []
    for tup in pdf.itertuples(index=False, name=None):
        cells = []
        for v in tup:
            if isinstance(v, np.generic):
                v = v.item()
            if v is pd.NaT:
                v = None
            if isinstance(v, pd.Timestamp):
                v = v.to_pydatetime()
            if isinstance(v, np.ndarray):
                v = v.tolist()
            cells.append(_canon_cell(v))
        rows.append("|".join(cells))
    rows.sort()
    h = hashlib.sha256("\n".join(rows).encode()).hexdigest()
    return len(rows), cols, h


def _union_find_labels(pairs) -> dict[int, int]:
    """Min-label connected components over an edge list: classic
    union-find with path compression, rooting every merge at the
    smaller id so each component's label is its minimum doc_id —
    exactly the fixpoint cluster_pairs() and the recursive reach CTE
    compute. O(E α(V)) driver-side; feasible at any SF."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    nodes = set()
    for a, b in pairs:
        nodes.add(a)
        nodes.add(b)
    return {n: find(n) for n in nodes}


#: id(con) -> (con, labels); the tuple pins the connection object so its
#: id cannot be reused by a different connection while the entry lives
#: (a stale-labels trap if this module were reused across connections).
#: The value holds a weakref, NOT the connection itself, and the weakref
#: callback evicts the entry — closed/dropped connections (and their
#: label dicts) stay collectable across long multi-connection sweeps
#: (ADVICE r7: a strong ref here grew without bound).
_CLUSTER_LABEL_CACHE: dict[int, tuple[object, dict[int, int]]] = {}


def _py_cluster_labels(con):
    """DuckDB edge list (non-recursive pair CTEs) + Python union-find.
    Memoized per connection: q_dedup_clusters and q_dedup_cluster_summary
    share one edge-list computation (the banded self-join is the
    expensive part at sf0.1)."""
    import weakref

    hit = _CLUSTER_LABEL_CACHE.get(id(con))
    if hit is not None and hit[0]() is con:
        return hit[1]
    from data_ingestor_spark.ext.dedup import _CLUSTER_PAIRS_CTES

    pairs = con.sql(
        "WITH " + _CLUSTER_PAIRS_CTES + " SELECT doc_a, doc_b FROM pairs"
    ).fetchall()
    labels = _union_find_labels(pairs)
    key = id(con)
    ref = weakref.ref(con, lambda _r, _k=key: _CLUSTER_LABEL_CACHE.pop(_k, None))
    _CLUSTER_LABEL_CACHE[key] = (ref, labels)
    return labels


def _py_oracle_clusters(con):
    import pandas as pd

    labels = _py_cluster_labels(con)
    return pd.DataFrame(
        {"doc_id": list(labels.keys()), "cluster_id": list(labels.values())}
    )


def _py_oracle_cluster_summary(con):
    from collections import Counter

    import pandas as pd

    labels = _py_cluster_labels(con)
    sizes = Counter(labels.values())
    hist = Counter(sizes.values())
    return pd.DataFrame(
        {"cluster_size": list(hist.keys()), "n_clusters": list(hist.values())}
    )


#: queries whose SQL oracle is replaced under --py-oracles (recursive
#: transitive closure is Σ|component|²-infeasible at sf0.1; union-find
#: over the same DuckDB edge list is exact and linear)
PY_ORACLES = {
    "q_dedup_clusters": _py_oracle_clusters,
    "q_dedup_cluster_summary": _py_oracle_cluster_summary,
}


def parse_json_flag(args: list[str]) -> tuple[str | None, list[str]]:
    """Extract ``--json OUT`` / ``--json=OUT`` from an argv list.

    Returns (json_out_or_None, remaining_args). Both spellings must
    work: the = form silently parsed as a path-looking operand in
    earlier revisions, discarding a whole sweep's artifact."""
    rest = list(args)
    json_out = None
    if "--json" in rest:
        i = rest.index("--json")
        if i + 1 >= len(rest):
            raise SystemExit("usage: --json OUT (missing output path)")
        json_out = rest[i + 1]
        del rest[i : i + 2]
    for a in list(rest):
        if a.startswith("--json="):
            json_out = a.split("=", 1)[1]
            rest.remove(a)
    return json_out, rest


def main() -> int:
    use_py = "--py-oracles" in sys.argv[1:]
    json_out, args = parse_json_flag(sys.argv[1:])
    args = [a for a in args if a != "--py-oracles"]
    sf_dir = args[0] if args and "/" in args[0] else SF_DIR_DEFAULT
    only = [a for a in args if "/" not in a]

    from data_ingestor_spark.plans.queries import REGISTRY  # noqa: E402
    from data_ingestor_spark.session import get_session

    spark = get_session()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    names = only or sorted(REGISTRY)
    n_pass = n_fail = n_rowsonly = 0
    failures = []
    results: dict[str, dict] = {}

    def record(name, **kw):
        rec = {
            "rows_match": None, "schema_match": None, "hash_match": None,
            "spark_rows": None, "oracle_rows": None, "err": None,
            "oracle_kind": "sql", "elapsed_s": None,
        }
        rec.update(kw)
        results[name] = rec
        if json_out:
            # flush after every key: a multi-hour sf0.1 sweep must leave
            # a usable partial artifact if the session ends mid-run
            atomic_dump_json(
                json_out,
                {"sf_dir": sf_dir, "complete": False, "results": results},
            )

    import time as _time

    for name in names:
        spec = REGISTRY[name]
        t0 = _time.monotonic()
        py_fn = PY_ORACLES.get(name) if use_py else None
        kind = "py" if py_fn else ("none" if spec.oracle is None else "sql")
        try:
            sdf = spec.fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            failures.append(name)
            record(name, err=f"spark error: {e}", oracle_kind=kind,
                   elapsed_s=round(_time.monotonic() - t0, 3))
            continue
        if spec.oracle is None and py_fn is None:
            print(f"rows  {name}: {len(sdf)} rows (rows-only check)")
            n_rowsonly += 1
            record(name, spark_rows=len(sdf), oracle_kind="none",
                   rows_match=len(sdf) >= 0,
                   elapsed_s=round(_time.monotonic() - t0, 3))
            continue
        try:
            odf = py_fn(con) if py_fn else con.sql(spec.oracle).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle error: {e}")
            n_fail += 1
            failures.append(name)
            record(name, err=f"oracle error: {e}", oracle_kind=kind,
                   spark_rows=len(sdf),
                   elapsed_s=round(_time.monotonic() - t0, 3))
            continue
        try:
            sn, sc, sh = canonical(sdf)
            on, oc, oh = canonical(odf)
        except TypeError as e:
            print(f"FAIL  {name}: unhashable result: {e}")
            n_fail += 1
            failures.append(name)
            record(name, err=f"unhashable result: {e}", oracle_kind=kind,
                   spark_rows=len(sdf), oracle_rows=len(odf),
                   elapsed_s=round(_time.monotonic() - t0, 3))
            continue
        record(name, rows_match=sn == on, schema_match=sc == oc,
               hash_match=sh == oh, spark_rows=sn, oracle_rows=on,
               oracle_kind=kind, elapsed_s=round(_time.monotonic() - t0, 3))
        if (sn, sc, sh) == (on, oc, oh):
            print(f"PASS  {name}: {sn} rows" + (" [py-oracle]" if py_fn else ""))
            n_pass += 1
        else:
            print(f"FAIL  {name}: rows {sn}/{on} cols {sc}/{oc} hash {'=' if sh == oh else '≠'}")
            if sn == on and sc == oc:
                merged = _diff_sample(sdf, odf)
                if merged:
                    print(f"      first value diff: {merged}")
            n_fail += 1
            failures.append(name)
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only of {len(names)}")
    if failures:
        print("failures:", " ".join(failures))
    if json_out:
        atomic_dump_json(
            json_out,
            {"sf_dir": sf_dir, "complete": True, "results": results},
        )
        print(f"wrote {json_out}")
    spark.stop()
    return 1 if n_fail else 0


def _diff_sample(sdf, odf):
    import pandas as pd  # noqa: F401

    cols = sorted(sdf.columns)
    a = ["|".join(map(str, t)) for t in sdf[cols].itertuples(index=False, name=None)]
    b = ["|".join(map(str, t)) for t in odf[cols].itertuples(index=False, name=None)]
    sa, sb = sorted(a), sorted(b)
    for x, y in zip(sa, sb):
        if x != y:
            return f"spark={x!r} oracle={y!r}"
    return None


if __name__ == "__main__":
    sys.exit(main())

# NOTE on scale factors: the mirror (like the driver) is designed for
# sf0.01 and below. At sf0.1+ the LSH-family ORACLES (banded self-join
# CTEs carrying token arrays) are quadratically slow in DuckDB — the
# Spark side runs the same pipelines in seconds there (see bench.py
# extra_queries); validate the Spark side at sf0.1 with bench/timing
# runs, and hash-validate against DuckDB at sf0.01.
