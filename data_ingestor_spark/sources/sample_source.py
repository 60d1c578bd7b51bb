"""Spark 4 custom Python DataSource wrapping the sample generator (O21).

The reference's generator is a driver-side Go loop (``util/utils.go:
44-65``); ``util.generate_sample_records`` already re-expresses it as
``spark.range`` + expressions. This module additionally packages the
SAME record stream as a first-class *source*:
``spark.read.format("ingestor_samples").option("count", N).load()`` —
the Spark-4-native Python DataSource API, so sample data behaves like
any external system (schema discovery, option handling, partition
planning) instead of a helper function. Partitions split the id range
evenly, so generation is distributed and scales to any N with no
driver-side loop; each partition re-derives its rows deterministically
from (start, end), which also makes the source safely re-computable on
task retry — the property every 100 TB scan relies on.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from datetime import datetime, timezone

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from data_ingestor_spark.schemas import MIST_NESTED_SCHEMA


@dataclass
class _RangePartition(InputPartition):
    start: int
    end: int


def _iso(epoch: int) -> str:
    return datetime.fromtimestamp(epoch, tz=timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")


class SampleRecordsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.count = int(options.get("count", 10))
        self.base = int(options.get("base_epoch", 1_700_000_000))
        self.num_partitions = int(options.get("numPartitions", 4))

    def partitions(self):
        n = max(1, self.num_partitions)
        step = max(1, -(-self.count // n))
        return [
            _RangePartition(lo, min(lo + step, self.count))
            for lo in range(0, self.count, step)
        ]

    def read(self, partition: _RangePartition):
        base = self.base
        for i in range(partition.start, partition.end):
            yield (
                f"User{i + 1}",
                base + i,
                base + i + 100,
                f"asset-{i + 1}" if i % 2 == 0 else None,
                f"Location{i % 5}",
                ("Pending", "Approved", "Rejected")[i % 3],
                hashlib.md5(str(i).encode()).hexdigest(),
                f"L-{i + 1}" if i % 3 != 0 else None,
                "generated.json",
                [
                    (f"F{i + 1}-0", _iso(base + i * 60)),
                    (f"F{i + 1}-1", _iso(base + i * 60 + 30)),
                ],
            )


class SampleRecordsDataSource(DataSource):
    """``format("ingestor_samples")`` — options: count, base_epoch,
    numPartitions."""

    @classmethod
    def name(cls) -> str:
        return "ingestor_samples"

    def schema(self):
        return MIST_NESTED_SCHEMA

    def reader(self, schema) -> SampleRecordsReader:
        return SampleRecordsReader(self.options)


def register(spark) -> None:
    """Idempotently register the source on a session."""
    spark.dataSource.register(SampleRecordsDataSource)
