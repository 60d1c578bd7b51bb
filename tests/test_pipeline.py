"""End-to-end flagship load job (reference lifecycle §3.1 parity)."""

import csv
import os
import shutil

from conftest import FIXTURES


def test_run_load_job_full_lifecycle(spark, tmp_path):
    from data_ingestor_spark.pipeline import run_load_job
    from data_ingestor_spark.xlsx import read_rows

    src = tmp_path / "in.json"
    shutil.copy(os.path.join(FIXTURES, "ingest-records.json"), src)

    res = run_load_job(
        spark,
        str(src),
        target_dir=str(tmp_path / "published"),
        csv_out=str(tmp_path / "out.csv"),
        excel_out=str(tmp_path / "out.xlsx"),
        json_out=str(tmp_path / "out.json"),
        archive_dir=str(tmp_path / "archive"),
        error_condition="fnumber IS NULL",
    )

    # published atomically: 17 flattened rows (7×2 + single + empty + missing)
    assert res.rows_published == 17
    assert spark.read.parquet(str(tmp_path / "published")).count() == 17

    # side exports present and consistent (parse-once fan-out, §2.3(h))
    with open(tmp_path / "out.csv") as f:
        assert len(list(csv.DictReader(f))) == 17
    assert len(read_rows(str(tmp_path / "out.xlsx"))) == 1 + 17

    # error metric counted the 2 null-fnumber rows without dropping them
    assert res.rows_error == 2

    # input archived: gone from source, present in archive dir
    assert not src.exists()
    assert res.archived_to == str(tmp_path / "archive" / "in.json")
    assert os.path.isfile(res.archived_to)

    assert "succeeded=17" in res.report() and "errors=2" in res.report()


def test_cli_main(spark, tmp_path, capsys):
    """CLI flag-parity entry point drives the same lifecycle."""
    from data_ingestor_spark import cli

    src = tmp_path / "in.json"
    shutil.copy(os.path.join(FIXTURES, "ingest-records.json"), src)
    rc = cli.main(
        ["--file", str(src), "--table", str(tmp_path / "out"), "--model", "MistAMS"]
    )
    assert rc == 0
    assert spark.read.parquet(str(tmp_path / "out")).count() == 17
    assert "[MistAMS] records succeeded=17" in capsys.readouterr().out


def test_cli_stream_subcommand(spark, tmp_path, capsys):
    """`stream` drains a watch dir through run_stream_job: same report
    shape as `load`, data/ + quarantine/ layout under --table."""
    from data_ingestor_spark import cli

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    shutil.copy(os.path.join(FIXTURES, "ingest-records.json"), in_dir / "a.json")
    rc = cli.main(
        [
            "stream",
            "--input-dir", str(in_dir),
            "--table", str(tmp_path / "out"),
            "--format", "json",
            "--timeout", "120",
        ]
    )
    assert rc == 0
    assert spark.read.parquet(str(tmp_path / "out" / "data")).count() == 17
    assert "[MistAMS] records succeeded=17 quarantined=0" in capsys.readouterr().out


def test_run_load_job_xml_input(spark, tmp_path):
    """The same lifecycle over the XML fixture (O1+O8 path): 6 records
    with 2 repeated groups + 1 single + 1 empty = 14 flattened rows."""
    from data_ingestor_spark.pipeline import run_load_job

    src = tmp_path / "in.xml"
    shutil.copy(os.path.join(FIXTURES, "ingest-records.xml"), src)
    res = run_load_job(
        spark,
        str(src),
        target_dir=str(tmp_path / "published"),
        csv_out=str(tmp_path / "out.csv"),
        archive_dir=str(tmp_path / "archive"),
    )
    assert res.rows_published == 14
    out = spark.read.parquet(str(tmp_path / "published"))
    assert out.count() == 14
    # XML chardata arrives as strings but lands in the TYPED schema (§2.3(e))
    assert dict(out.dtypes)["dt_created"] == "bigint"
    assert not src.exists() and os.path.isfile(res.archived_to)
