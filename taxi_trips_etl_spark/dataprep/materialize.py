"""Materialization helper for self-join inputs and iterative lineage.

Why materialize at all: Catalyst gives self-joins NO ReusedExchange
(each side rebuilds the whole child plan), so without a checkpoint both
sides of a banded-signature self-join recompute the signatures from a
full corpus scan — at 100 TB that is two reads of the corpus and twice
the hashing. Iterative algorithms (connected components, k-means) have
the sibling problem: lineage grows per round until planning time and
stack depth blow up. Truncating lineage at the small intermediate table
is the scale-correct trade in both cases.

Why this indirection exists: ``localCheckpoint`` stores blocks ONLY on
executors. Under executor loss or dynamic allocation those blocks are
gone and the job fails unrecoverably — fine on a single-JVM local run,
a reliability regression on a 1000-executor cluster. ``checkpoint``
writes to the fault-tolerant checkpoint dir instead, surviving executor
loss, at the cost of a distributed-FS round trip.

:func:`materialize` picks automatically: if the SparkContext has a
checkpoint dir configured (``sc.setCheckpointDir('hdfs://…')`` — the
cluster posture), it uses reliable ``checkpoint``; otherwise it falls
back to ``localCheckpoint`` (the local/test posture; if you must run
executor-local, disable dynamic allocation or enable shuffle-block
decommissioning). One call site to flip, no operator changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def materialize(df: DataFrame, *, eager: bool = False) -> DataFrame:
    """Truncate ``df``'s lineage, reliably when the session allows it.

    Reliable ``checkpoint`` iff ``sc.setCheckpointDir`` was called
    (always eager in Spark's API when materialized — the ``eager``
    flag is honored as given for both paths).
    """
    sc = df.sparkSession.sparkContext
    try:
        has_dir = sc.getCheckpointDir() is not None
    except Exception:  # defensive: API shape varies across builds
        has_dir = getattr(sc, "_jsc", None) is not None and (
            sc._jsc.sc().getCheckpointDir().isDefined()
        )
    if has_dir:
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
