"""Sample-data generation (reference O21, ``util/utils.go:44-65``).

The reference synthesizes N ``models.Record``s with deterministic
field patterns (``User%d``, epoch offsets, alternating nullables,
two fnumbers per record). Spark-native: ``spark.range`` + expressions —
distributed, no driver-side loop, scales to any N.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def generate_sample_records(spark: SparkSession, count: int, base_epoch: int = 1_700_000_000) -> DataFrame:
    """Deterministic nested sample records matching the MistAMS model.

    Field patterns follow the reference generator (``util/utils.go:
    44-65``): sequential user names, increasing epochs, alternating
    null ast_name/local_id, and a two-element ``fnumbers`` group per
    record. Output conforms to :data:`MIST_NESTED_SCHEMA`.
    """
    i = F.col("id") + 1
    fnum = lambda j: F.struct(  # noqa: E731
        F.format_string(f"F%d-{j}", i).alias("fnumber"),
        F.date_format(
            F.timestamp_seconds(F.lit(base_epoch) + F.col("id") * 60 + j * 30),
            "yyyy-MM-dd'T'HH:mm:ss'Z'",
        ).alias("scan_time"),
    )
    df = spark.range(count).select(
        F.format_string("User%d", i).alias("user"),
        (F.lit(base_epoch) + F.col("id")).alias("dt_created"),
        (F.lit(base_epoch) + F.col("id") + 100).alias("dt_submitted"),
        F.when(F.col("id") % 2 == 0, F.format_string("asset-%d", i)).alias("ast_name"),
        F.concat(F.lit("Location"), (F.col("id") % 5).cast("string")).alias("location"),
        F.element_at(
            F.array(F.lit("Pending"), F.lit("Approved"), F.lit("Rejected")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("status"),
        F.md5(F.col("id").cast("string")).alias("json_hash"),
        F.when(F.col("id") % 3 != 0, F.format_string("L-%d", i)).alias("local_id"),
        F.lit("generated.json").alias("filename"),
        F.array(fnum(0), fnum(1)).alias("fnumbers"),
    )
    return df
