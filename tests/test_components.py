"""Connected components: cliques, chains, singletons, canonicalization."""

from __future__ import annotations

from taxi_trips_etl_spark.dataprep.components import (
    canonicalize_near_dups,
    connected_components,
)


def test_components_chain_and_clique(spark):
    # chain 1-2-3-4 (diameter 3), clique {10,11,12}, pair {20,21}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (11, 12), (20, 21)],
        "doc_id_a long, doc_id_b long",
    )
    comp = {r.doc_id: r.component_id for r in connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_components_long_path_converges(spark):
    # path 0-1-2-…-9: worst-case diameter for label propagation
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "doc_id_a long, doc_id_b long"
    )
    comp = {r.doc_id: r.component_id for r in connected_components(pairs).collect()}
    assert set(comp.values()) == {0}
    assert len(comp) == 10


def test_canonicalize_keeps_one_per_component(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(6)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (4, 5)], "doc_id_a long, doc_id_b long"
    )
    kept = sorted(r.doc_id for r in canonicalize_near_dups(docs, pairs).collect())
    # component {0,1,2} → keep 0; {4,5} → keep 4; singleton 3 untouched.
    assert kept == [0, 3, 4]
