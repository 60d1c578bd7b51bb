"""CLI entry point — drop-in analogue of the reference's loader binary.

Reference usage (``README.md:40-63``, flags at ``main.go:40-50``)::

    ./loader -file test-loader.xml -model MistAMS -table SFLW_RECS

Engine usage::

    python -m data_ingestor_spark.cli --file records.json --table out_dir \\
        [--csv out.csv] [--excel out.xlsx] [--json out.json] \\
        [--archive-dir archive/] [--config config.yaml]

``--table`` is a directory for the atomic parquet publish (pass a JDBC
URL via config to target a database instead); ``--model`` is accepted
for flag parity — like the reference, it only labels logs
(``fileloader-schema.go:137``: carried for logging, no dispatch).
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="data-ingestor-spark", description="Load a nested XML/JSON record file"
    )
    ap.add_argument("--file", required=True, help="input file (.json or .xml)")
    ap.add_argument("--table", required=True, help="target directory for the atomic parquet publish")
    ap.add_argument("--model", default="MistAMS", help="model label (logging only, like the reference)")
    ap.add_argument("--csv", default=None, help="optional CSV export path")
    ap.add_argument("--excel", default=None, help="optional Excel export path")
    ap.add_argument("--json", default=None, help="optional JSON export path")
    ap.add_argument("--archive-dir", default=None, help="archive the input here after load")
    ap.add_argument("--config", default=None, help="engine config YAML (session/JDBC settings)")
    args = ap.parse_args(argv)

    from data_ingestor_spark.pipeline import run_load_job
    from data_ingestor_spark.session import EngineConfig, get_session

    spark = get_session(EngineConfig.load(args.config))
    res = run_load_job(
        spark,
        args.file,
        target_dir=args.table,
        csv_out=args.csv,
        excel_out=args.excel,
        json_out=args.json,
        archive_dir=args.archive_dir,
    )
    print(f"[{args.model}] {res.report()}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
