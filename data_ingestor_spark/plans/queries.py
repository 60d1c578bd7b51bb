"""Aggregation point for the declared query library.

Importing this module populates the registry with every query family;
``__spark_entry__.py`` re-exports ``queries()`` / ``oracle_sql()`` from
here for the driver's correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import data_ingestor_spark.plans.relational  # noqa: F401
from data_ingestor_spark.plans.registry import REGISTRY

# Optional families — each module registers on import; keep imports
# one-per-line so a failure is attributable.
for _mod in (
    "data_ingestor_spark.plans.scalars",
    "data_ingestor_spark.plans.subqueries",
    "data_ingestor_spark.plans.ingest",
    "data_ingestor_spark.plans.timeseries",
    "data_ingestor_spark.plans.udfs",
    "data_ingestor_spark.ext.dedup",
    "data_ingestor_spark.ext.similarity",
    "data_ingestor_spark.ext.text",
    "data_ingestor_spark.ext.multimodal",
):
    try:
        __import__(_mod)
    except ModuleNotFoundError:
        pass


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
