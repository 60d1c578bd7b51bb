"""Boundary pins for q_stream_late_drop's watermark contract (VERDICT
r11 directive #8). The oracle encodes EMPIRICALLY MEASURED semantics of
this Spark build's append-mode windowed aggregation under availableNow
+ maxFilesPerTrigger=1:

1. the late-row FILTER watermark lags one extra batch — a row in batch
   b is dropped iff its window end <= max(ts over batches 0..b-2) -
   delay (so batches 0 and 1 never drop);
2. the drop comparison is INCLUSIVE (window end == watermark drops);
3. the predicate is WINDOW-END-based, not row-ts-based — a late row
   whose window straddles the watermark survives;
4. a window EMITS iff its end <= the final watermark, also INCLUSIVE;
   unclosed windows never emit.

If a Spark upgrade shifts any of these, this file fails loudly and the
oracle must be re-measured — far better than a silent driver hash
mismatch."""

from __future__ import annotations

import os
import shutil
import time
import uuid

from pyspark.sql import functions as F


def _run_stream(spark, tmp_path, rows_by_file, window, delay):
    """Write each row list as ONE parquet file with increasing mtimes,
    run the append-mode windowed count under availableNow +
    maxFilesPerTrigger=1, return {window_start_str: n}."""
    in_dir = os.path.join(str(tmp_path), f"in_{uuid.uuid4().hex[:6]}")
    os.makedirs(in_dir)
    now = time.time()
    for i, rows in enumerate(rows_by_file):
        df = spark.createDataFrame(rows, "ts_s string").select(
            F.col("ts_s").cast("timestamp").alias("ts")
        )
        p = os.path.join(str(tmp_path), f"f{i}_{uuid.uuid4().hex[:6]}")
        df.coalesce(1).write.mode("overwrite").parquet(p)
        part = [f for f in os.listdir(p) if f.startswith("part-")][0]
        dst = os.path.join(in_dir, f"f{i}.parquet")
        shutil.copyfile(os.path.join(p, part), dst)
        mt = now - 60 + 10 * i
        os.utime(dst, (mt, mt))
    s = spark.readStream.schema("ts timestamp").option("maxFilesPerTrigger", 1).parquet(in_dir)
    agg = (
        s.withWatermark("ts", delay)
        .groupBy(F.window("ts", window).alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )
    sink = f"late_pin_{uuid.uuid4().hex[:6]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(120), "stream did not finish"
        out = {str(r["ws"]): r["n"] for r in spark.table(sink).collect()}
    finally:
        spark.catalog.dropTempView(sink)
    return out


def test_filter_watermark_lags_one_extra_batch(spark, tmp_path):
    """Batch 1's late rows survive (filter wm still epoch-0) even
    though batch 0 already advanced the planned watermark to 11:50 —
    the one-extra-batch lag the oracle's b-2 rule encodes."""
    out = _run_stream(
        spark,
        tmp_path,
        [
            [("2024-01-01 11:00:00",), ("2024-01-01 12:00:00",)],
            # late vs the PLANNED wm 11:50, but batch 1 filters at 0:
            [("2024-01-01 11:41:00",), ("2024-01-01 12:01:00",)],
        ],
        "5 minutes",
        "10 minutes",
    )
    assert out.get("2024-01-01 11:40:00") == 1  # late row KEPT and emitted


def test_drop_boundary_is_inclusive_and_batch2_drops(spark, tmp_path):
    """With the watermark settled at 11:50 for two batches, batch 2's
    rows in windows ending 11:45 (< wm) AND 11:50 (== wm, the boundary)
    are both dropped; a row in the window ending 11:55 (> wm) is kept
    but its window never emits (end > final wm)."""
    out = _run_stream(
        spark,
        tmp_path,
        [
            [("2024-01-01 11:00:00",), ("2024-01-01 12:00:00",)],
            [("2024-01-01 12:00:00",)],  # no advance; wm firmly 11:50
            [
                ("2024-01-01 11:41:00",),  # end 11:45 <  wm -> drop
                ("2024-01-01 11:46:00",),  # end 11:50 == wm -> drop (inclusive)
                ("2024-01-01 11:51:00",),  # end 11:55 >  wm -> keep, unclosed
                ("2024-01-01 12:01:00",),  # on time, unclosed
            ],
        ],
        "5 minutes",
        "10 minutes",
    )
    assert "2024-01-01 11:40:00" not in out
    assert "2024-01-01 11:45:00" not in out
    assert "2024-01-01 11:50:00" not in out  # kept but never emitted
    assert out.get("2024-01-01 11:00:00") == 1


def test_filter_predicate_is_window_end_not_row_ts(spark, tmp_path):
    """A late row (ts 11:46 < wm 11:50) whose 15-minute window ends at
    12:00 > wm SURVIVES — the drop predicate compares the WINDOW END,
    not the row timestamp."""
    out = _run_stream(
        spark,
        tmp_path,
        [
            [("2024-01-01 11:00:00",), ("2024-01-01 12:00:00",)],
            [("2024-01-01 12:00:00",)],
            [("2024-01-01 11:46:00",), ("2024-01-01 12:14:00",)],
        ],
        "15 minutes",
        "10 minutes",
    )
    # final wm = 12:14 - 10min = 12:04 >= 12:00, so the straddling
    # window emits WITH the late row counted
    assert out.get("2024-01-01 11:45:00") == 1


def test_emission_boundary_is_inclusive(spark, tmp_path):
    """A window whose end EQUALS the final watermark emits (end <= wm,
    inclusive): final wm = 12:05 - 10min = 11:55 = end of [11:50,11:55)."""
    out = _run_stream(
        spark,
        tmp_path,
        [[("2024-01-01 11:51:00",), ("2024-01-01 12:05:00",)]],
        "5 minutes",
        "10 minutes",
    )
    assert out.get("2024-01-01 11:50:00") == 1
    assert "2024-01-01 12:05:00" not in out  # unclosed: never emits
