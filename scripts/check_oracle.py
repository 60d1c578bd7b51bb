"""Local mirror of the driver's correctness gate.

Runs every registered query's Spark plan AND its DuckDB oracle at the
given scale factor, compares row-count, column names, and an
order-insensitive canonical value hash. Stricter than any plausible
driver check: values are compared at full precision (floats via repr,
timestamps ISO); Decimal and array/map result cells are rejected
outright because the driver's pandas hasher cannot compare them
consistently across engines.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
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


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and "/" in sys.argv[1] else SF_DIR_DEFAULT
    only = [a for a in sys.argv[1:] if "/" not in a]

    from data_ingestor_spark.plans.queries import REGISTRY  # noqa: E402
    from data_ingestor_spark.session import get_session

    spark = get_session()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    names = only or sorted(REGISTRY)
    n_pass = n_fail = n_rowsonly = 0
    failures = []
    for name in names:
        spec = REGISTRY[name]
        try:
            sdf = spec.fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            failures.append(name)
            continue
        if spec.oracle is None:
            print(f"rows  {name}: {len(sdf)} rows (rows-only check)")
            n_rowsonly += 1
            continue
        try:
            odf = con.sql(spec.oracle).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            failures.append(name)
            continue
        try:
            sn, sc, sh = canonical(sdf)
            on, oc, oh = canonical(odf)
        except TypeError as e:
            print(f"FAIL  {name}: unhashable result: {e}")
            n_fail += 1
            failures.append(name)
            continue
        if (sn, sc, sh) == (on, oc, oh):
            print(f"PASS  {name}: {sn} rows")
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
