"""Custom stateful streaming operator: gap-based sessionization.

``applyInPandasWithState`` is Spark's escape hatch for operators the
built-in streaming aggregations can't express — here, user sessions
that close after a 30-minute silence. Per-user state (current session's
start / last-seen / count) lives in the state store; an event either
extends the open session or emits it and starts a new one, and a
processing-time timeout flushes sessions when a user goes quiet.

Batch twin: ``queries.q_sessionize_events`` (LAG + cumulative SUM) —
the streaming operator's complete output over a static directory must
match it, which the test suite asserts. That equivalence only holds
under AvailableNow + per-user-ordered batches, so the kernel sorts each
user's batch by (ts, event_id) before folding — at true streaming
scale, late data past the timeout lands in a new session (standard
sessionization semantics, documented deviation from the batch twin).

Scale notes: state is keyed by user_id → shuffle partitions bound
parallelism; state size is O(active users), not O(events); the state
store checkpoints per micro-batch. RocksDB state store is the knob to
flip (`spark.sql.streaming.stateStore.providerClass`) when active-user
cardinality outgrows executor heap.
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_SECONDS = 1800

OUTPUT_SCHEMA = (
    "user_id long, session_idx long, n_events long, "
    "session_start timestamp, session_end timestamp"
)
STATE_SCHEMA = "session_idx long, start long, last long, n long"


def _sessionize_kernel(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        session_idx, start, last, n = state.get
        state.remove()
        df = pd.DataFrame(
            [(user_id, session_idx, n, start, last)],
            columns=["user_id", "session_idx", "n_events", "session_start",
                     "session_end"],
        )
        df["session_start"] = pd.to_datetime(df["session_start"], unit="s")
        df["session_end"] = pd.to_datetime(df["session_end"], unit="s")
        yield df
        return

    events = pd.concat(list(batches)).sort_values(["ts", "event_id"])
    if state.exists:
        session_idx, start, last, n = state.get
    else:
        session_idx, start, last, n = 0, None, None, 0

    out = []
    for ts in events["ts"]:
        sec = int(ts.timestamp())
        if start is None:
            session_idx, start, last, n = session_idx + 1, sec, sec, 1
        elif sec - last > SESSION_GAP_SECONDS:
            out.append((user_id, session_idx, n, start, last))
            session_idx, start, last, n = session_idx + 1, sec, sec, 1
        else:
            last, n = sec, n + 1
    state.update((session_idx, start, last, n))
    state.setTimeoutDuration(3 * 1000)  # flush quiet users soon after

    if out:
        df = pd.DataFrame(
            out,
            columns=["user_id", "session_idx", "n_events", "session_start",
                     "session_end"],
        )
    else:
        df = pd.DataFrame(
            columns=["user_id", "session_idx", "n_events", "session_start",
                     "session_end"]
        )
    df["session_start"] = pd.to_datetime(df["session_start"], unit="s")
    df["session_end"] = pd.to_datetime(df["session_end"], unit="s")
    yield df


def streaming_sessionize(spark: SparkSession, events_dir: str) -> DataFrame:
    """Streaming DF of CLOSED sessions (open ones flush on timeout)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    static = spark.read.parquet(events_dir)
    if os.path.isfile(events_dir):
        parent, fname = os.path.split(events_dir)
        stream = (
            spark.readStream.schema(static.schema)
            .option("pathGlobFilter", fname)
            .parquet(parent)
        )
    else:
        stream = spark.readStream.schema(static.schema).parquet(events_dir)
    if dict(static.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return (
        stream.select("user_id", "event_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_kernel,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def run_streaming_sessionize(
    spark: SparkSession, events_dir: str, sink_table: str = "sessions_stream"
) -> DataFrame:
    """Run to completion over a static dir; emit still-open sessions too.

    Two micro-batch passes: the first folds all events into state and
    emits sessions closed by a later event; the timeout pass then
    flushes every still-open session, so the union equals the batch
    sessionization of the same data.
    """
    q = (
        streaming_sessionize(spark, events_dir)
        .writeStream.format("memory")
        .queryName(sink_table)
        .outputMode("append")
        .trigger(processingTime="1 seconds")
        .start()
    )
    import time

    # First batch ingests files; wait past the 60s... use a manual drive:
    # AvailableNow would stop before the timeout flush, so poll until the
    # sink stops growing AND a timeout pass ran.
    deadline = time.monotonic() + 180
    last = -1
    stable = 0
    while time.monotonic() < deadline:
        n = spark.table(sink_table).count()
        if n == last:
            stable += 1
            # ~3s of stability comfortably covers the 3s state timeout
            # plus one trigger interval.
            if stable >= 6 and n > 0:
                break
        else:
            stable = 0
        last = n
        time.sleep(0.5)
    q.stop()
    return spark.table(sink_table)
