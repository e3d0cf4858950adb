"""End-to-end corpus preparation: the composed LLM-data pipeline.

quality filter → exact dedup (canonical id wins) → near-dup removal
(Jaccard-verified pairs, keep the lower id) → token-window chunking →
leak-proof hash split. Every stage is one of this repo's operators;
composing them stays one lazy Catalyst plan, so filters prune before
the expensive near-dup join and nothing materializes between stages.

Near-dup policy note: dropping ``doc_id_b`` of every qualifying pair is
the deterministic keep-first rule — for duplicate CLIQUES it can drop
more than a connected-components canonicalization would keep, which is
the usual (and safe) bias for training data. True connected-components
canonicalization needs an iterative algorithm — see clustering.py for
the driver-loop pattern if needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from taxi_trips_etl_spark.dataprep.dedup import (
    exact_duplicates,
    ngram_jaccard_pairs,
)
from taxi_trips_etl_spark.dataprep.sampling import train_test_split
from taxi_trips_etl_spark.dataprep.text import chunk_documents, quality_scores


def prepare_corpus(
    docs: DataFrame,
    quality_min: float = 0.75,
    jaccard_threshold: float = 0.8,
    chunk_tokens: int = 50,
    overlap: int = 10,
    test_rate: float = 0.2,
) -> DataFrame:
    """→ (doc_id, chunk_id, chunk_hash, chunk_tokens, split)."""
    q_ok = quality_scores(docs).filter(
        F.col("quality_score") >= quality_min
    ).select("doc_id")
    kept = docs.join(q_ok, "doc_id")
    canon = exact_duplicates(kept).select(
        F.col("canonical_doc_id").alias("doc_id")
    )
    kept2 = kept.join(canon, "doc_id")
    near_dups = (
        ngram_jaccard_pairs(kept2, threshold=jaccard_threshold)
        .select(F.col("doc_id_b").alias("doc_id"))
        .distinct()
    )
    kept3 = kept2.join(near_dups, "doc_id", "left_anti")
    chunks = chunk_documents(kept3, chunk_tokens=chunk_tokens, overlap=overlap)
    # Split on doc_id, not chunk id: all chunks of a document land on
    # the same side — no near-dup leakage across the boundary.
    return train_test_split(chunks, key="doc_id", test_rate=test_rate).select(
        "doc_id",
        "chunk_id",
        F.md5("chunk_text").alias("chunk_hash"),
        "chunk_tokens",
        "split",
    )
