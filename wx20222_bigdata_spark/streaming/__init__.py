"""Structured Streaming surface (SURVEY.md §2.9).

The reference's closest structures — micro-batch shard loop
(``pretrained_model.py:359-367``), periodic metric emission
(``main.py:215-219``), cross-step EMA state (``main.py:95-103``) — justify:

- tumbling / sliding window aggregates with watermarked late-data handling,
- session windows,
- ``applyInPandasWithState`` for the custom stateful EMA accumulator,
- ``dropDuplicatesWithinWatermark`` streaming dedup (bounded state),
- stream-stream interval join (attribution) with two-sided watermarks so
  join state is evicted, never retained forever.

Batch-equivalent window aggregates are oracle-checked (operators/
streaming_batch.py); the stream forms are validated by tests that run a
file-source micro-batch to a memory sink and compare against the batch
results (DuckDB has no streaming oracle).
"""

from wx20222_bigdata_spark.streaming.jobs import (  # noqa: F401
    read_events_stream,
    session_window_counts,
    sliding_avg,
    stateful_ema,
    tumbling_counts,
)
