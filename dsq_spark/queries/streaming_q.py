"""Structured Streaming exemplar with a HARD correctness row.

The streaming suite (`dsq_spark/streaming/`) is verified by batch-parity
and end-to-end pytest; this module additionally registers ONE streaming
query in the driver's oracle-checked registry: the driver's events table is
replayed through a bounded file-source STREAM (multiple triggers, watermark
state, AvailableNow termination), and the resulting windowed aggregate must
match a plain batch DuckDB oracle value-for-value.  That is the strongest
statement batch infrastructure can make about a stream: the incremental
plan converges to exactly the declarative answer.

Scale notes (100 TB): the tumbling agg keeps one state row per open
(window, event_type) group — bounded by the watermark horizon, not by input
size; the file source is swapped for Kafka unchanged.  The JSONL replay dir
is a test harness artifact (the driver hands us a static table, not a
topic), written once per session.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import functions as F

from dsq_spark.queries.base import register, t
from dsq_spark.streaming.ops import (
    read_events_stream,
    run_stream_to_memory,
    tumbling_window_agg,
)

# Microsecond-exact timestamp round-trip through the JSONL replay files:
# Spark's default JSON timestamp pattern can drop sub-millisecond digits,
# and a half-up rounding could push a boundary event into the next window.
_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"

# r10 (guide §4/§6 — ship only the columns the computation needs): the
# replay JSONL used to carry every events column; event_id and the props
# JSON blob are dead weight for tumbling_window_agg (ts, user_id for the
# HLL sketch, event_type, value), roughly doubling both the one-time
# write and EVERY trigger's parse.  The pruned column set is shared with
# scripts/bench_streaming_scale.py so source schemas stay in sync.
_REPLAY_COLS = ["ts", "user_id", "event_type", "value"]

# One replay dir per (application, sf_dir) — multiple driver calls reuse
# it.  Keyed on applicationId, NOT id(spark): a stopped session's id() can
# be reused by a new SparkSession and alias a stale dir (ADVICE r3).  The
# mkdtemp dirs are registered for atexit cleanup so a long pytest process
# doesn't accumulate them.
_REPLAY_MEMO: dict[tuple[str, str], str] = {}


def _cleanup_replay_dirs() -> None:
    import shutil

    for path in _REPLAY_MEMO.values():
        shutil.rmtree(path, ignore_errors=True)
    _REPLAY_MEMO.clear()


def _replay_dir(spark, sf_dir: str) -> str:
    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir))
    hit = _REPLAY_MEMO.get(key)
    if hit and os.path.isdir(hit):
        return hit
    if not _REPLAY_MEMO:
        import atexit

        atexit.register(_cleanup_replay_dirs)
    path = tempfile.mkdtemp(prefix="dsq_stream_replay_")
    (
        t(spark, sf_dir, "events")
        .select(*_REPLAY_COLS)
        # >1 file so AvailableNow exercises multiple triggers.  repartition,
        # NOT coalesce: the bench parquet is one row group -> one partition,
        # and coalesce(4) can only shrink, so it silently produced ONE file
        # (single trigger, single-task JSON parse) — r10 measurement.
        .repartition(4)
        .write.mode("overwrite").option("timestampFormat", _TS_FMT).json(path)
    )
    _REPLAY_MEMO[key] = path
    return path


@register(
    "streaming_window_counts",
    oracle="""
SELECT CAST(floor(epoch(ts) / 21600) * 21600 AS BIGINT) AS window_epoch,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 2) AS total_value
FROM events
GROUP BY 1, 2
""",
    doc=(
        "Tumbling 6-hour windowed counts/sums per event type computed by "
        "Structured Streaming: the events table replays as a bounded JSONL "
        "file stream (2 files per trigger), flows through the SAME "
        "tumbling_window_agg the streaming suite uses (watermarked, "
        "HLL user sketch elided from the checked columns), terminates via "
        "AvailableNow into a memory sink, and the final table must equal a "
        "plain batch GROUP BY in DuckDB — incremental state converging to "
        "the declarative answer, proven by the driver gate. State is one "
        "row per open (window, type) group, watermark-bounded at any scale."
    ),
)
def streaming_window_counts(spark, sf_dir):
    src = (
        spark.readStream.schema(
            t(spark, sf_dir, "events").select(*_REPLAY_COLS).schema
        )
        .option("maxFilesPerTrigger", 2)
        .option("timestampFormat", _TS_FMT)
        .json(_replay_dir(spark, sf_dir))
    )
    agg = tumbling_window_agg(src, width="6 hours", watermark="30 minutes")
    sink = f"strm_wc_{uuid.uuid4().hex[:12]}"
    run_stream_to_memory(agg, sink, output_mode="complete")
    res = spark.table(sink)
    return res.select(
        F.unix_timestamp("window_start").cast("long").alias("window_epoch"),
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        "total_value",
    )


# re-exported so the registry import in queries/__init__ picks this up
__all__ = ["streaming_window_counts", "read_events_stream"]
