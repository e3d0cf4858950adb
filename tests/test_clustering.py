"""DataFrame k-means: determinism, convergence, correctness on a
separable synthetic dataset."""

from __future__ import annotations

from pyspark.sql import functions as F

from taxi_trips_etl_spark.dataprep.clustering import cluster_summary, kmeans_assign


def _separable(spark):
    # Three tight blobs far apart in 4-d; ids 0-2 are one point of each
    # blob (so deterministic init starts near all three).
    rows = []
    blobs = [(0.0, 0.0), (10.0, 0.0), (0.0, 10.0)]
    vid = 0
    for round_ in range(10):
        for b, (bx, by) in enumerate(blobs):
            jitter = 0.01 * round_
            rows.append((vid, [bx + jitter, by - jitter, 1.0, -1.0]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_kmeans_recovers_blobs(spark):
    vecs = _separable(spark)
    out = kmeans_assign(vecs, k=3, iterations=5)
    rows = out.collect()
    assert len(rows) == 30
    # Every blob's members share a cluster, and the three differ.
    by_blob = {}
    for r in rows:
        by_blob.setdefault(r.vec_id % 3, set()).add(r.cluster_id)
    assert all(len(s) == 1 for s in by_blob.values())
    assert len({next(iter(s)) for s in by_blob.values()}) == 3
    # Tight blobs → tiny inertia.
    total_inertia = sum(
        r.inertia for r in cluster_summary(out).collect()
    )
    assert total_inertia < 1.0


def test_kmeans_deterministic(spark):
    vecs = _separable(spark)
    a = sorted(map(tuple, kmeans_assign(vecs, k=3, iterations=3).collect()))
    b = sorted(map(tuple, kmeans_assign(vecs, k=3, iterations=3).collect()))
    assert a == b


def test_kmeans_on_driver_embeddings(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = kmeans_assign(emb, k=8, iterations=3)
    assert out.count() == emb.count()
    assert out.select("cluster_id").distinct().count() <= 8
    assert out.filter(F.col("sq_dist") < 0).count() == 0
