"""Flatten semantics per SURVEY §2.3(a): array elements explode to one
row each with base fields replicated; empty/missing arrays keep one row
with null element fields; whitelist projection drops unknown keys."""

import os

import pytest
from pyspark.sql import Row, functions as F
from pyspark.sql import types as T

from data_ingestor_spark.operators.flatten import flatten_nested, project_whitelist
from data_ingestor_spark.schemas import MIST_NESTED_SCHEMA, TEMPLATE_COLUMNS
from data_ingestor_spark.sources import load
from tests.conftest import FIXTURES


def test_json_fixture_flatten_counts(spark):
    raw = load(spark, os.path.join(FIXTURES, "ingest-records.json"), schema=MIST_NESTED_SCHEMA)
    flat = flatten_nested(raw, "fnumbers", TEMPLATE_COLUMNS)
    assert flat.count() == 17  # 7*2 + 1 + empty-array + missing-array
    assert flat.columns == TEMPLATE_COLUMNS


def test_xml_fixture_flatten_counts(spark):
    raw = load(spark, os.path.join(FIXTURES, "ingest-records.xml"), schema=MIST_NESTED_SCHEMA)
    flat = flatten_nested(raw, "fnumbers", TEMPLATE_COLUMNS)
    assert flat.count() == 14  # 6*2 + 1 + no-group record


def test_empty_and_missing_arrays_survive(spark):
    raw = load(spark, os.path.join(FIXTURES, "ingest-records.json"), schema=MIST_NESTED_SCHEMA)
    flat = flatten_nested(raw, "fnumbers", TEMPLATE_COLUMNS)
    nulls = {r["user"] for r in flat.filter(F.col("fnumber").isNull()).collect()}
    assert nulls == {"ivan", "judy"}


def test_base_fields_replicated(spark):
    raw = load(spark, os.path.join(FIXTURES, "ingest-records.json"), schema=MIST_NESTED_SCHEMA)
    flat = flatten_nested(raw, "fnumbers", TEMPLATE_COLUMNS)
    alice = flat.filter(F.col("user") == "alice").collect()
    assert len(alice) == 2
    assert {r["fnumber"] for r in alice} == {"F100", "F101"}
    assert all(r["json_hash"] == "h001" for r in alice)


def test_flatten_rejects_non_array(spark):
    df = spark.createDataFrame([Row(a=1, b="x")])
    with pytest.raises(TypeError, match="array<struct>"):
        flatten_nested(df, "b")


def test_whitelist_drops_and_fills(spark):
    df = spark.createDataFrame([Row(a=1, b="x", extra="drop-me")])
    with pytest.warns(UserWarning, match="extra"):
        out = project_whitelist(df, ["a", "b", "missing"])
    assert out.columns == ["a", "b", "missing"]
    row = out.collect()[0]
    assert row["missing"] is None


def test_xml_json_same_relational_result(spark):
    """Both formats cast into ONE typed schema (SURVEY §2.3(e)) — the
    overlapping records must be value-identical after flatten."""
    j = flatten_nested(
        load(spark, os.path.join(FIXTURES, "ingest-records.json"), schema=MIST_NESTED_SCHEMA),
        "fnumbers",
        TEMPLATE_COLUMNS,
    )
    x = flatten_nested(
        load(spark, os.path.join(FIXTURES, "ingest-records.xml"), schema=MIST_NESTED_SCHEMA),
        "fnumbers",
        TEMPLATE_COLUMNS,
    )
    jrows = {
        (r["user"], r["fnumber"], r["dt_created"]) for r in j.filter("user = 'alice'").collect()
    }
    xrows = {
        (r["user"], r["fnumber"], r["dt_created"]) for r in x.filter("user = 'alice'").collect()
    }
    assert jrows == xrows
    assert dict(j.dtypes) == dict(x.dtypes)


def test_hypothesis_flatten_row_count(spark):
    """Property: output rows = Σ max(1, len(array)) over records."""
    from hypothesis import given, settings, strategies as st

    elem = st.tuples(st.text("ab", max_size=3), st.text("xy", max_size=3))
    rec = st.tuples(st.integers(0, 10**6), st.one_of(st.none(), st.lists(elem, max_size=4)))

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField(
                "arr",
                T.ArrayType(
                    T.StructType(
                        [T.StructField("x", T.StringType()), T.StructField("y", T.StringType())]
                    )
                ),
            ),
        ]
    )

    @given(st.lists(rec, min_size=1, max_size=8))
    @settings(max_examples=10, deadline=None)
    def check(records):
        rows = [Row(id=i, arr=None if a is None else [Row(x=x, y=y) for x, y in a]) for i, a in records]
        df = spark.createDataFrame(rows, schema)
        out = flatten_nested(df, "arr")
        expected = sum(max(1, len(a) if a else 1) for _, a in records)
        assert out.count() == expected

    check()


def test_flatten_all_two_levels(spark):
    """flatten_all explodes nested arrays-of-struct recursively and
    inlines struct fields as parent_child columns."""
    from data_ingestor_spark.operators.flatten import flatten_all

    data = [
        {
            "id": 1,
            "meta": {"src": "a", "v": 2},
            "groups": [
                {"g": "g1", "items": [{"x": 1}, {"x": 2}]},
                {"g": "g2", "items": [{"x": 3}]},
            ],
        },
        {"id": 2, "meta": {"src": "b", "v": 5}, "groups": []},
    ]
    df = spark.createDataFrame(
        data,
        "id bigint, meta struct<src:string, v:bigint>, "
        "groups array<struct<g:string, items:array<struct<x:bigint>>>>",
    )
    out = flatten_all(df)
    assert sorted(out.columns) == ["groups_g", "groups_items_x", "id", "meta_src", "meta_v"]
    rows = {(r["id"], r["groups_g"], r["groups_items_x"]) for r in out.collect()}
    # id=1: 2+1 leaf items; id=2: survives empty-groups as one null row (§2.3(a))
    assert rows == {(1, "g1", 1), (1, "g1", 2), (1, "g2", 3), (2, None, None)}
    meta = {(r["id"], r["meta_src"], r["meta_v"]) for r in out.collect()}
    assert (2, "b", 5) in meta
