"""Sink parity tests (reference O12, O15-O19)."""

import csv
import json
import os

import pytest

from data_ingestor_spark import sinks


@pytest.fixture()
def flat_df(spark):
    from data_ingestor_spark.operators.flatten import flatten_nested
    from data_ingestor_spark.schemas import MIST_NESTED_SCHEMA, TEMPLATE_COLUMNS
    from data_ingestor_spark.sources import load

    from conftest import FIXTURES

    raw = load(spark, os.path.join(FIXTURES, "ingest-records.json"), schema=MIST_NESTED_SCHEMA)
    return flatten_nested(raw, "fnumbers", TEMPLATE_COLUMNS)


def test_export_csv_single_file(flat_df, tmp_path):
    out = str(tmp_path / "out.csv")
    sinks.export_csv(flat_df, out, single_file=True)
    assert os.path.isfile(out)
    with open(out) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 17
    # canonical template column order (SURVEY §2.3(b))
    assert list(rows[0].keys()) == flat_df.columns
    # missing/null values render as "" (fileloader-schema.go:556-563)
    ivan = next(r for r in rows if r["user"] == "ivan")
    assert ivan["fnumber"] == "" and ivan["scan_time"] == ""


def test_export_csv_distributed(flat_df, tmp_path):
    out = str(tmp_path / "out_dir.csv")
    sinks.export_csv(flat_df, out)
    assert os.path.isdir(out)  # partitioned directory write (the scale path)


def test_export_json_array(flat_df, tmp_path):
    out = str(tmp_path / "out.json")
    sinks.export_json(flat_df, out, array=True)
    with open(out) as f:
        data = json.load(f)
    assert isinstance(data, list) and len(data) == 17
    assert data[0].keys() == {c: None for c in flat_df.columns}.keys()


def test_export_excel_roundtrip(flat_df, tmp_path):
    from data_ingestor_spark.xlsx import read_rows

    out = str(tmp_path / "out.xlsx")
    sinks.export_excel(flat_df, out)
    grid = read_rows(out)
    assert list(grid[0]) == flat_df.columns
    assert len(grid) == 1 + 17
    # null fnumber renders "" (reference CSV/Excel semantics)
    ivan = next(r for r in grid[1:] if r[0] == "ivan")
    assert ivan[9] == "" or ivan[9] is None


def test_excel_template_roundtrip(tmp_path):
    """write_sheet → columns_from_excel reproduces the reference's
    db-template.xlsx row-3 column extraction (O6)."""
    from data_ingestor_spark.schemas import TEMPLATE_COLUMNS, columns_from_excel
    from data_ingestor_spark.xlsx import write_sheet

    path = str(tmp_path / "template.xlsx")
    display = ["User", "Date Created", "Date Submitted", "Asset Name", "Location",
               "Status", "JSON Hash", "Local ID", "Filename", "FNumber", "Scan Time"]
    flags = ["REQUIRED"] * 9 + ["OPTIONAL"] * 2
    write_sheet(path, [display, flags, list(TEMPLATE_COLUMNS)])
    assert columns_from_excel(path, "Sheet1", line=3) == TEMPLATE_COLUMNS
    assert columns_from_excel(path, "Sheet1", line=2) == flags


def test_build_insert_select_atomic_publish():
    stmts = sinks.build_insert_select("t__staging", "t", ["user", "dt_created"])
    assert stmts[0] == 'INSERT INTO "t" ("user", "dt_created") SELECT "user", "dt_created" FROM "t__staging"'
    assert stmts[1] == 'DROP TABLE "t__staging"'


@pytest.mark.parametrize("bad", ["t; DROP TABLE x", 'a"b', "1tbl", "t name", ""])
def test_unsafe_identifiers_rejected(bad):
    # SURVEY §2.3(g): the reference interpolates identifiers raw; we validate.
    with pytest.raises(ValueError):
        sinks.build_insert_select(bad, "t", ["c"])


def test_archive_input(tmp_path):
    src = tmp_path / "in.json"
    src.write_text("{}")
    dest_dir = tmp_path / "archive" / "nested"  # created on demand (fileloader.go:265-270)
    archived = sinks.archive_input(str(src), str(dest_dir))
    assert os.path.isfile(archived) and not src.exists()
    assert archived == str(dest_dir / "in.json")
