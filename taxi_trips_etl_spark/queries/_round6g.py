# Round-6 batch 10: mapInArrow — the last un-demonstrated Python batch
# surface (mapInPandas, applyInPandas, cogroup+applyInPandas,
# applyInPandasWithState, pandas UDFs, and the Python DataSource are
# all covered elsewhere). mapInArrow hands the kernel raw
# pyarrow.RecordBatch objects with NO pandas conversion — the
# max-throughput hook for kernels that can stay in Arrow compute.
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from taxi_trips_etl_spark.queries._registry import _t, register

__all__ = ["q_arrow_token_stats"]

ARROW_TOKEN_ORACLE = """
SELECT doc_id,
       CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
           AS n_tokens,
       CAST(strlen(trim(text)) AS BIGINT) AS n_bytes
FROM documents
WHERE trim(text) != ''
"""


@register("arrow_token_stats", ARROW_TOKEN_ORACLE)
def q_arrow_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token/byte counts computed in a ``mapInArrow``
    kernel with pure ``pyarrow.compute`` calls — the batch never
    converts to pandas (no object boxing, no index), which is the
    cheapest possible Python hook when the kernel is expressible in
    Arrow compute: whitespace splitting, list lengths, and binary
    lengths here are all vectorized C++.

    The counting itself is of course a one-line JVM expression
    (text_token_stats does exactly that); this entry exists to pin
    the mapInArrow SURFACE — schema discipline, RecordBatch
    iteration, and engine parity of the Arrow kernel against a SQL
    oracle — so real kernels (tokenizers, codecs) have a tested
    template. Scale shape: embarrassingly parallel map, batch memory
    bounded by maxPartitionBytes, only (id, counts) leave Python."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def kernel(batches):
        for batch in batches:
            text = pc.utf8_trim_whitespace(batch.column("text"))
            toks = pc.split_pattern_regex(text, r"\s+")
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    pc.cast(pc.list_value_length(toks), pa.int64()),
                    pc.cast(pc.binary_length(text), pa.int64()),
                ],
                names=["doc_id", "n_tokens", "n_bytes"],
            )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text").where(
        F.trim("text") != ""
    )
    return docs.mapInArrow(
        kernel, "doc_id long, n_tokens long, n_bytes long"
    )
