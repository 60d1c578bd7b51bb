"""The flagship load job — the reference's end-to-end CLI lifecycle
(``main.go:24-151``, SURVEY §3.1) as one engine call.

Reference flow: config + schema bootstrap → eager parse for CSV/Excel
exports (``main.go:76-90``) → *second* streaming parse feeding the
worker-pool DB load (``main.go:93-119``) → all-or-nothing commit →
counters logged (``main.go:132-138``) → input archived (``main.go:141``).

Engine flow (one logical plan, SURVEY §2.3(h) fixes the double parse):

    load(file) → flatten → whitelist-project     (cached once)
      ├─ export_csv / export_excel / export_json (side outputs)
      ├─ publish (atomic parquet dir or staged JDBC)
      └─ archive_input + metrics report

Everything distributed stays distributed; only the small side exports
materialize on the driver (as they do in the reference).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from data_ingestor_spark import sinks
from data_ingestor_spark.metrics import observed
from data_ingestor_spark.operators.flatten import flatten_nested
from data_ingestor_spark.schemas import MIST_NESTED_SCHEMA, TEMPLATE_COLUMNS
from data_ingestor_spark.sources import load


@dataclass
class LoadJobResult:
    """What the reference logs at job end (``main.go:132-138``)."""

    rows_published: int
    rows_error: int
    archived_to: str | None
    exports: dict[str, str] = field(default_factory=dict)

    def report(self) -> str:
        return (
            f"records succeeded={self.rows_published} errors={self.rows_error} "
            f"archived={self.archived_to or '-'}"
        )


def run_load_job(
    spark: SparkSession,
    input_file: str,
    target_dir: str,
    schema=MIST_NESTED_SCHEMA,
    columns: list[str] = TEMPLATE_COLUMNS,
    array_col: str = "fnumbers",
    csv_out: str | None = None,
    excel_out: str | None = None,
    json_out: str | None = None,
    archive_dir: str | None = None,
    error_condition: str | None = None,
) -> LoadJobResult:
    """Run the full reference lifecycle against one input file.

    ``target_dir`` receives the atomic parquet publish (the engine's
    all-or-nothing O15 parity; swap in ``sinks.publish_jdbc_atomic``
    for a JDBC target). ``error_condition`` is a SQL boolean marking
    bad rows for the metrics report (O20) — rows are NOT dropped,
    matching the reference's count-and-continue workers
    (``mapreduce.go:45-49``).
    """
    raw = load(spark, input_file, schema=schema)
    flat = flatten_nested(raw, array_col, columns)
    flat, obs = observed(flat, error_condition=error_condition)
    # parse once, fan out to every sink (SURVEY §2.3(h))
    flat = flat.cache()
    try:
        exports: dict[str, str] = {}
        n = sinks.publish_parquet_atomic(flat, target_dir)
        if csv_out:
            sinks.export_csv(flat, csv_out, single_file=True)
            exports["csv"] = csv_out
        if excel_out:
            sinks.export_excel(flat, excel_out)
            exports["excel"] = excel_out
        if json_out:
            sinks.export_json(flat, json_out, array=True)
            exports["json"] = json_out
    finally:
        flat.unpersist()

    archived = sinks.archive_input(input_file, archive_dir) if archive_dir else None
    metrics = obs.get
    return LoadJobResult(
        rows_published=n,
        rows_error=int(metrics.get("rows_error", 0)),
        archived_to=archived,
        exports=exports,
    )
