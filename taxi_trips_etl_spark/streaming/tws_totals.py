"""transformWithStateInPandas running totals — the Spark 4 arbitrary
stateful API (SPARK-46815, "State API v2"), successor to
applyInPandasWithState (``streaming/sessionize.py``): typed state
handles (ValueState/ListState/MapState) on a StatefulProcessor class
instead of one opaque GroupState tuple, explicit init/close lifecycle,
and timers decoupled from the input path.

The operator: per-user running (n_events, value_cents) totals. Every
micro-batch that delivers rows for a user updates the ValueState and
emits the new running total; after an AvailableNow drain the LAST
emission per user (the one with the largest n_events — emissions for
a key are strictly increasing in n) equals the batch GROUP BY, which
is the oracle.

Scale shape (100 TB stream): state is one fixed-width row per active
user in the state store (RocksDB — transformWithState requires that
provider), shuffle keyed by user_id; per-batch work is one Arrow
round-trip per key-with-input, not per key. The final-emission dedup
is a small aggregate over the sink, not the stream.

ENVIRONMENT GATE: the State API v2 Python client speaks protobuf to
the JVM state server (pyspark.sql.streaming.proto.StateMessage_pb2),
and the ``protobuf`` wheel is absent from this container — the drive
raises at first micro-batch. The operator is therefore NOT a registry
entry (the driver env would fail it); ``tests/test_round6b_ops.py``
skips unless protobuf is importable, the same gate pattern as the h3
known-vector test and the multimodal codec stubs. The
applyInPandasWithState sessionizer (``streaming/sessionize.py``)
remains the registered, oracle-verified stateful-custom-op path.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

OUTPUT_SCHEMA = "user_id long, n_events long, value_cents long"


def _make_processor():
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import LongType, StructField, StructType

    state_schema = StructType(
        [
            StructField("n", LongType()),
            StructField("cents", LongType()),
        ]
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", state_schema)

        def handleInputRows(
            self, key, rows, timerValues
        ) -> Iterator["pd.DataFrame"]:
            if self._totals.exists():
                n, cents = self._totals.get()
            else:
                n, cents = 0, 0
            for pdf in rows:
                n += len(pdf)
                cents += int(pdf["cents"].sum())
            self._totals.update((n, cents))
            yield pd.DataFrame(
                {
                    "user_id": [int(key[0])],
                    "n_events": [int(n)],
                    "value_cents": [int(cents)],
                }
            )

        def close(self) -> None:
            pass

    return RunningTotals()


def run_tws_running_totals(
    spark: SparkSession,
    events_dir: str,
    sink_table: str = "tws_totals_run",
    state_partitions: int = 8,
) -> DataFrame:
    """AvailableNow drive of the transformWithStateInPandas operator;
    returns the FINAL running total per user (largest-n emission),
    which must equal the batch GROUP BY twin. ``state_partitions``
    pins the state-store width (r13: this was the last stateful drive
    running at the 32-store batch default — one RocksDB instance per
    shuffle partition, each committing per micro-batch; grouping is
    logical, so the width never changes the output).

    Concurrency caveat (ADVICE r13): the pin sets the session-global
    ``spark.sql.shuffle.partitions`` for the whole start→awaitTermination
    span, so any BATCH query planned concurrently on this SparkSession
    silently inherits the 8-partition width — the same session-level
    hazard the ops runbook flags for bench contamination. This drive
    (like every registered streaming drive) must not overlap other
    planning on its session; Spark exposes no per-stream width option
    to scope it tighter (SPARK-45419 discussion)."""
    from taxi_trips_etl_spark.streaming.state import (
        state_partitions as _pin,
    )
    from taxi_trips_etl_spark.streaming.static_enrich import _event_stream

    stream = _event_stream(spark, events_dir).select(
        "user_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    out = stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_make_processor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )
    with _pin(spark, state_partitions):
        q = (
            out.writeStream.format("memory")
            .queryName(sink_table)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    sink = spark.table(sink_table)
    # Final emission per user: n_events strictly increases per
    # emission for a key, so max(n) identifies it; cents rides along
    # via the max_by pair.
    return sink.groupBy("user_id").agg(
        F.max("n_events").cast("long").alias("n_events"),
        F.expr("max_by(value_cents, n_events)")
        .cast("long")
        .alias("value_cents"),
    )
