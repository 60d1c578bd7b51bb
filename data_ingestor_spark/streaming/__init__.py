from data_ingestor_spark.streaming.ingest import (
    stream_json_records,
    stream_load,
    write_stream_batches,
)
from data_ingestor_spark.streaming.windows import (
    session_windowed_counts,
    stateful_dedup,
    tumbling_counts,
)

__all__ = [
    "stream_json_records",
    "stream_load",
    "write_stream_batches",
    "session_windowed_counts",
    "stateful_dedup",
    "tumbling_counts",
]
