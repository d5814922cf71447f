#!/usr/bin/env python
"""Scale-up curve for the Structured Streaming path (r3 VERDICT action #8).

Replays the events table through the SAME watermarked tumbling-window
pipeline `streaming_window_counts` registers (JSONL file source,
maxFilesPerTrigger=2, AvailableNow), at 1x / 10x / 30x sf0.1, and reports:

  * wall time per scale and the log-log growth exponent alpha between the
    two largest scales (same protocol as scripts/bench_scaling.py);
  * the state store's final row count (stateOperators[0].numRowsTotal from
    the query's lastProgress) — the EMPIRICAL check that state is bounded
    by the watermark horizon (open windows x event types), not by input
    size: the scaled inputs replicate events with remapped ids but the
    SAME time range, so rows grow 30x while state rows must stay flat.

The scaled inputs reuse scripts/bench_scaling.py's workload-shape-
preserving replication (facts scale, per-key densities constant).

Usage:  python scripts/bench_streaming_scale.py
Prints one JSON line: {"scales": {k: {"sec": s, "state_rows": n,
"input_rows": m}}, "alpha": a}.
"""

from __future__ import annotations

import json
import math
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_scaling import BASE, FACTORS, ROOT, build  # noqa: E402

RUNS = 3


def run_once(spark, sf_dir: str):
    """One full replay through the registered pipeline pieces; returns
    (seconds, state_rows, input_rows)."""
    import uuid

    from dsq_spark.queries.base import t
    from dsq_spark.queries.streaming_q import _REPLAY_COLS, _TS_FMT, _replay_dir
    from dsq_spark.streaming.ops import run_stream_to_memory, tumbling_window_agg

    replay = _replay_dir(spark, sf_dir)  # memoized: built once per scale
    schema = t(spark, sf_dir, "events").select(*_REPLAY_COLS).schema
    t0 = time.monotonic()
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2)
        .option("timestampFormat", _TS_FMT)
        .json(replay)
    )
    agg = tumbling_window_agg(src, width="6 hours", watermark="30 minutes")
    sink = f"strm_scale_{uuid.uuid4().hex[:10]}"
    q = run_stream_to_memory(agg, sink, timeout_s=1800.0, output_mode="complete")
    n_out = spark.table(sink).count()
    sec = time.monotonic() - t0
    prog = q.lastProgress or {}
    ops = prog.get("stateOperators") or [{}]
    state_rows = ops[0].get("numRowsTotal")
    rows_in = spark.read.schema(schema).json(replay).count()
    return sec, state_rows, rows_in, n_out


def main() -> None:
    from dsq_spark.session import get_spark

    spark = get_spark("dsq-streaming-scale")
    spark.sparkContext.setLogLevel("ERROR")
    for k in FACTORS:
        build(spark, k, f"{ROOT}/x{k}")

    scales = [(1, BASE)] + [(k, f"{ROOT}/x{k}") for k in FACTORS]
    out = {}
    for k, d in scales:
        best, state, rows_in, n_out = math.inf, None, None, None
        for _ in range(RUNS):
            sec, st, ri, no = run_once(spark, d)
            best = min(best, sec)
            state, rows_in, n_out = st, ri, no
        out[k] = {"sec": round(best, 3), "state_rows": state,
                  "input_rows": rows_in, "out_rows": n_out}
        print(f"x{k}: {out[k]}", file=sys.stderr, flush=True)
    k1, k2 = FACTORS
    alpha = (math.log(out[k2]["sec"] / out[k1]["sec"])
             / math.log(k2 / k1)) if out[k1]["sec"] > 0 else None
    print(json.dumps({"scales": out, "alpha": round(alpha, 3)}))


if __name__ == "__main__":
    main()
