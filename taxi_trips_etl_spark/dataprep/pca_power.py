"""Top principal component via power iteration — ORACLE-REPLAYABLE.

``similarity.pca_project`` (numpy ``eigh``) is the production PCA; its
eigendecomposition is a black box no SQL engine replays, so its
registry entry is rows-only. This module trades the full spectrum for
ONE component computed by an algorithm whose every step is exact
integer arithmetic or IEEE ops on identical operands — the same
replay discipline that converted k-means and BPE to hash-green:

1. Integer-quantized second moments: per row, round(x_i·x_j·1e10) —
   an int64 — summed EXACTLY (integer addition is associative, so
   partition order cannot matter; this is the float-sum hazard the
   registry avoids everywhere by summing cents).
2. Covariance assembled driver-side from those integers with a fixed
   IEEE expression, then re-quantized to int64 (units 1e-10).
3. Power iteration on an INTEGER state vector q (units 1e-6 of a unit
   vector): w = C_int·q is exact int64 (|w| ≤ 64·1e10·1e6 < 2^63);
   the only floats are the norm (deterministic double from identical
   ints) and the requantization round(w/‖w‖·1e6).
4. Sign fixed (first nonzero q positive), projection = one narrow
   JVM fold with the component inlined as literals.

At 100 TB: the moment pass is an Arrow ``mapInPandas`` emitting one
(count, means, Gram) partial per batch — numpy does the per-batch
work, int64 keeps it exact — and the driver folds partition-count
partials; the iteration itself is d×d, independent of row count.

Convergence note, stated honestly: power iteration finds the top
eigenvector at rate (λ2/λ1)^t; 12 iterations suffice for spectra with
a clear top gap (pytest pins agreement with numpy on synthetic
anisotropic data). Degenerate λ1≈λ2 spectra converge slowly — the
production eigh path has no such caveat.
"""

from __future__ import annotations

from collections.abc import Iterator
import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Q_COV = 10**10  # covariance / moment quantization (1e-10 units)
Q_VEC = 10**6   # unit-vector state quantization (1e-6 units)


def _round_half_away(v: float) -> int:
    """Python's round() is banker's (half-to-even); Spark and DuckDB
    round() are half-AWAY-from-zero. Quantization boundaries land on
    exact .5 often enough at 1e10 scale (~ulp-probability × millions of
    samples) that the rule must match the engines'."""
    return int(math.floor(v + 0.5)) if v >= 0 else int(math.ceil(v - 0.5))


def _moment_partials(dim: int):
    import pandas as pd

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np

        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf["v"].to_numpy()).astype("float64")

            def q(a):
                # half-away-from-zero (matches Spark/DuckDB round; np.rint
                # is banker's) — see _round_half_away
                s = a * Q_COV
                return np.where(
                    s >= 0, np.floor(s + 0.5), np.ceil(s - 0.5)
                ).astype("int64")

            # per-element quantize THEN sum: int64 addition is exact and
            # order-free, unlike float partial sums
            m = q(x).sum(axis=0)
            g = q(np.einsum("ri,rj->rij", x, x)).sum(axis=0)
            yield pd.DataFrame(
                {
                    "n": [len(x)],
                    "m": [m.tolist()],
                    "g": [g.reshape(-1).tolist()],
                }
            )

    return gen


def _covariance_int(n: int, m: list[int], g: list[list[int]]) -> list[list[int]]:
    """Fixed IEEE assembly (matches the oracle SQL term-for-term):
    cov_ij = (G_ij/Q)/n − (M_i/Q/n)·(M_j/Q/n), requantized to 1e-10."""
    d = len(m)
    out = []
    for i in range(d):
        row = []
        for j in range(d):
            cov = (float(g[i][j]) / Q_COV) / n - (
                float(m[i]) / Q_COV / n
            ) * (float(m[j]) / Q_COV / n)
            row.append(_round_half_away(cov * Q_COV))
        out.append(row)
    return out


def _power_iterate(c_int: list[list[int]], iterations: int) -> list[int]:
    d = len(c_int)
    q0 = _round_half_away(1.0 / math.sqrt(d) * Q_VEC)
    q = [q0] * d
    for _ in range(iterations):
        w = [
            sum(c_int[i][j] * q[j] for j in range(d))  # exact int64-range
            for i in range(d)
        ]
        norm = math.sqrt(sum(float(x) * float(x) for x in w))
        if norm == 0.0:
            break
        q = [_round_half_away(float(x) / norm * Q_VEC) for x in w]
    # deterministic sign: first nonzero coordinate positive
    for x in q:
        if x != 0:
            if x < 0:
                q = [-y for y in q]
            break
    return q


def power_iteration_pc1(
    embeddings: DataFrame,
    iterations: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ (vec_id, pc1): projection onto the power-iteration top
    component. See module docstring for the exact-replay ledger."""
    vecs = embeddings.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    dim = vecs.select(F.size("v").alias("d")).first()["d"]
    partials = vecs.select("v").mapInPandas(
        _moment_partials(dim),
        schema="n long, m array<long>, g array<long>",
    ).collect()
    n = sum(p["n"] for p in partials)
    m = [0] * dim
    g = [[0] * dim for _ in range(dim)]
    for p in partials:
        for i in range(dim):
            m[i] += p["m"][i]
        flat = p["g"]
        for i in range(dim):
            base = i * dim
            gi = g[i]
            for j in range(dim):
                gi[j] += flat[base + j]
    c_int = _covariance_int(n, m, g)
    q = _power_iterate(c_int, iterations)
    comp = [x / Q_VEC for x in q]
    arr = "array(" + ",".join(f"{x!r}D" for x in comp) + ")"
    return vecs.select(
        id_col,
        F.round(
            F.expr(
                f"aggregate(zip_with(v, {arr}, (a, b) -> a * b),"
                " 0.0D, (acc, x) -> acc + x)"
            ),
            6,
        ).alias("pc1"),
    )


def power_iteration_oracle_sql(
    dim: int = 64, iterations: int = 12
) -> str:
    """DuckDB twin: identical integer moments, covariance assembly,
    integer iteration, sign fix and projection (see module docstring)."""
    q0 = _round_half_away(1.0 / math.sqrt(dim) * Q_VEC)
    return f"""
    WITH RECURSIVE e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
               FROM embeddings),
    idx AS (SELECT unnest(generate_series(1, {dim})) AS i),
    moments AS (
        SELECT i.i, j.i AS j,
               sum(CAST(round(emb[i.i] * emb[j.i] * {Q_COV}) AS BIGINT))
                   AS s
        FROM e, idx i, idx j
        GROUP BY 1, 2
    ),
    mean_s AS (
        SELECT i.i,
               sum(CAST(round(emb[i.i] * {Q_COV}) AS BIGINT)) AS ms
        FROM e, idx i GROUP BY 1
    ),
    nn AS (SELECT count(*) AS n FROM e),
    cov AS (
        SELECT mo.i, mo.j,
               CAST(round(((CAST(mo.s AS DOUBLE) / {Q_COV}) / n
                           - (CAST(a.ms AS DOUBLE) / {Q_COV} / n)
                             * (CAST(b.ms AS DOUBLE) / {Q_COV} / n))
                          * {Q_COV}) AS BIGINT) AS c
        FROM moments mo
        JOIN mean_s a ON a.i = mo.i
        JOIN mean_s b ON b.i = mo.j
        CROSS JOIN nn
    ),
    cmat AS (
        SELECT list(r ORDER BY i) AS C
        FROM (SELECT i, list(c ORDER BY j) AS r FROM cov GROUP BY i)
    ),
    it AS (
        SELECT 0 AS t,
               list_transform(generate_series(1, {dim}),
                              x -> CAST({q0} AS BIGINT)) AS q
        UNION ALL
        SELECT t + 1,
               list_transform(w, x ->
                   CAST(round(CAST(x AS DOUBLE) / nrm * {Q_VEC})
                        AS BIGINT))
        FROM (
            SELECT t, w,
                   sqrt(list_sum(list_transform(
                       w, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                       AS nrm
            FROM (
                SELECT t,
                       list_transform(generate_series(1, {dim}), i ->
                           list_sum(list_transform(
                               generate_series(1, {dim}),
                               j -> C[i][j] * q[j]))) AS w
                FROM it, cmat
                WHERE t < {iterations}
            )
        )
        WHERE nrm > 0
    ),
    final_q AS (SELECT q FROM it ORDER BY t DESC LIMIT 1),
    signed AS (
        SELECT CASE WHEN (SELECT x FROM (SELECT unnest(q) AS x,
                                                generate_subscripts(q, 1)
                                                    AS p FROM final_q)
                          WHERE x != 0 ORDER BY p LIMIT 1) < 0
                    THEN list_transform(q, x -> -x) ELSE q END AS q
        FROM final_q
    )
    SELECT vec_id,
           round(list_sum(list_transform(generate_series(1, {dim}),
                 i -> emb[i] * (CAST(q[i] AS DOUBLE) / {Q_VEC}))), 6)
               AS pc1
    FROM e CROSS JOIN signed
    """
