"""Content checksums for every non-code test input (judge r5 stretch #7).

The multimodal/dedup/text families derive their inputs deterministically
from the driver-generated testdata parquet, and several ingest oracles
check GOLDEN literal rows derived from the static fixtures in
tests/fixtures/. If either input drifts silently (a regenerated
testdata tree, an accidental fixture edit), the resulting oracle
mismatch would masquerade as an operator regression. These digests pin
the inputs so drift fails HERE, with an unambiguous message, instead.

If testdata is legitimately regenerated, update the constants (the test
failure prints the new digest) — that is the point: the change becomes
a reviewed diff, not a silent cause of phantom reds.

No SparkSession: DuckDB reads the parquet directly, so this runs in
milliseconds at collection time.
"""

from __future__ import annotations

import hashlib
from pathlib import Path

import duckdb
import pytest

FIXDIR = Path(__file__).parent / "fixtures"

#: md5 of the raw bytes of each static fixture (golden-literal oracles
#: in plans/ingest.py depend on these exact contents)
STATIC_FIXTURES = {
    "ingest-nested-deep.json": "8b6c7c1f81115be5617a7085dcb10631",
    "ingest-records.json": "487521fa29ae3eb7a6d497825a4afd34",
    "ingest-records.xml": "d91013b2d263f16bbc420badcdf02fb7",
    "scan-fixture.orc": "afaf9ae8461ce5838222c936a37ba0d3",
}

#: content digest of the tables the multimodal/dedup/text/similarity
#: families derive ALL their inputs from, at the two SFs the test suite
#: and the driver's gate use. documents: md5 over (doc_id, md5(text))
#: sorted by doc_id; embeddings: md5 over (vec_id, label, md5(vector)).
TESTDATA_DIGESTS = {
    ("sf0.001", "documents"): "aa074f00b74908fb682780fbab8a3f19",
    ("sf0.001", "embeddings"): "69aba8f9ecf83748207fb1c79cc1db0e",
    ("sf0.01", "documents"): "14b62b764eabee1ddecb450507beff94",
    ("sf0.01", "embeddings"): "5b9ed029d15ed9130e4198e3adab9ed9",
}


@pytest.mark.parametrize("name", sorted(STATIC_FIXTURES))
def test_static_fixture_unchanged(name):
    got = hashlib.md5((FIXDIR / name).read_bytes()).hexdigest()
    assert got == STATIC_FIXTURES[name], (
        f"tests/fixtures/{name} content changed (md5 {got}); the ingest "
        "golden-literal oracles depend on the exact bytes - if the edit "
        "is intentional, update STATIC_FIXTURES and the golden rows"
    )


@pytest.mark.parametrize("sf,table", sorted(TESTDATA_DIGESTS))
def test_testdata_content_pinned(sf, table):
    path = f"/root/testdata/{sf}/{table}.parquet"
    if table == "documents":
        sql = (
            "SELECT md5(string_agg(doc_id || ':' || md5(text), '|' "
            f"ORDER BY doc_id)) FROM '{path}'"
        )
    else:
        sql = (
            "SELECT md5(string_agg(vec_id || ':' || label || ':' || "
            "md5(CAST(embedding AS VARCHAR)), '|' ORDER BY vec_id)) "
            f"FROM '{path}'"
        )
    got = duckdb.sql(sql).fetchone()[0]
    assert got == TESTDATA_DIGESTS[(sf, table)], (
        f"{path} content drifted (digest {got}); multimodal/dedup/text "
        "evidence recorded against the old contents no longer applies - "
        "if the driver regenerated testdata, update TESTDATA_DIGESTS so "
        "the change is a reviewed diff, not a phantom operator regression"
    )
