"""Query registry: every implemented operator as (Spark builder, DuckDB oracle).

This is the single source of truth consumed by ``__spark_entry__.py``
(driver contract), ``bench.py`` and the test suite. Each entry maps a
SURVEY.md §2 operator (or a north-star dataprep operator) onto the
driver testdata tables; the oracle is ANSI-ish SQL DuckDB runs on the
same parquet.

Portability rules that keep the value-hash comparison exact:

- output columns are only BIGINT / DOUBLE / VARCHAR; timestamps are
  rendered ``yyyy-MM-dd HH:mm:ss`` strings on both sides;
- money/cent-quantized doubles are NEVER float-summed-then-rounded
  (their sums land exactly on .005 boundaries where engines' round()
  disagrees) — they are summed as exact integer cents, with averages
  produced by one IEEE division on identical operands;
- every hash is md5-hex (bit-identical in Spark and DuckDB);
- ties are either included via RANK (deterministic) or broken by an
  explicit unique key before any LIMIT.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from taxi_trips_etl_spark.dataprep.materialize import materialize

from taxi_trips_etl_spark.dataprep import dedup, multimodal, similarity, text
from taxi_trips_etl_spark.functions.scalar import daypart, timestamp_diff_minutes
from taxi_trips_etl_spark.operators.normalize import normalize_trips
from taxi_trips_etl_spark.operators.popularity import ranked_counts
from taxi_trips_etl_spark.plans.models import taxi_models
from taxi_trips_etl_spark.sources.taxi_testdata import (
    N_ZONES,
    _zone_wkt,
    trips_from_lineitem,
)

QueryFn = Callable[[SparkSession, str], DataFrame]

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _utc(spark: SparkSession) -> None:
    """Entry-point session pin, applied by ``register``'s wrapper to
    every driver-invoked query: timestamp rendering must agree with
    DuckDB's naive reading (UTC), and events parquet may carry
    TIMESTAMP(NANOS) (nanosAsLong). This wrapper layer — not readers —
    is the sanctioned place to mutate these session confs; readers only
    *require* them (``sources.readers.require_utc_session`` /
    ``require_nanos_as_long``)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet's ``ts`` physical type has varied across testdata
    generations (TIMESTAMP(NANOS), then NTZ micros); normalize to a
    session-UTC TIMESTAMP either way — see
    :func:`~taxi_trips_etl_spark.sources.readers.normalize_event_ts`."""
    from taxi_trips_etl_spark.sources.readers import normalize_event_ts

    _utc(spark)  # idempotent entry pin (UTC + nanosAsLong)
    return normalize_event_ts(spark.read.parquet(f"{sf_dir}/events.parquet"))


def _ts_str(col: F.Column, alias: str) -> F.Column:
    return F.date_format(col, "yyyy-MM-dd HH:mm:ss").alias(alias)


def _norm_trips(spark: SparkSession, sf_dir: str) -> DataFrame:
    return normalize_trips(trips_from_lineitem(_t(spark, sf_dir, "lineitem")))


# DuckDB twin of sources/taxi_testdata.trips_from_lineitem + the
# normalization predicate (normalization_query.py:3-9 semantics).
TRIPS_SQL = f"""
    SELECT
        l_shipdate + to_seconds(CAST(l_orderkey % 86400 AS BIGINT)) AS pickup_datetime,
        l_shipdate + to_seconds(CAST(l_orderkey % 86400 AS BIGINT))
            + to_minutes(CAST(l_quantity AS BIGINT)) AS dropoff_datetime,
        CAST(CASE WHEN l_orderkey % 7 = 0 THEN NULL
                  WHEN l_orderkey % 11 = 0 THEN 0
                  ELSE (l_linenumber % 5) + 1 END AS BIGINT) AS passenger_count,
        CASE WHEN l_orderkey % 13 = 0 THEN 0.0 ELSE l_quantity END AS trip_distance,
        l_extendedprice - l_tax * 1000.0 AS fare_amount,
        l_partkey % {N_ZONES} AS pickup_location_id,
        l_suppkey % {N_ZONES} AS dropoff_location_id
    FROM lineitem
"""

NORM_SQL = f"""
    SELECT * FROM ({TRIPS_SQL})
    WHERE pickup_datetime != dropoff_datetime
      AND passenger_count != 0 AND passenger_count IS NOT NULL
      AND trip_distance != 0 AND trip_distance IS NOT NULL
      AND fare_amount != 0
"""

DAYPART_SQL = """
    CASE WHEN {t} >= '06:00:00' AND {t} < '12:00:00' THEN 'Morning'
         WHEN {t} >= '12:00:00' AND {t} < '18:00:00' THEN 'Noon'
         WHEN {t} >= '18:00:00' AND {t} <= '23:59:59' THEN 'Evening'
         WHEN {t} < '06:00:00' THEN 'Night' END
"""

TOKS_SQL = "string_split_regex(trim(lower(text)), '\\s+')"
GRAMS_SQL = f"""
    SELECT doc_id,
           list_distinct(list_transform(
               generate_series(1, len({TOKS_SQL}) - 2),
               i -> concat_ws(' ', {TOKS_SQL}[i], {TOKS_SQL}[i+1], {TOKS_SQL}[i+2])
           )) AS grams
    FROM documents
    WHERE len({TOKS_SQL}) >= 3
"""

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}

# Verification rotation. The driver's correctness harness checks the first
# ~50 registry entries per round; the registry has grown past that, so
# ``all_queries``/``all_oracles`` order entries least-recently-verified
# first: names never seen in a CORRECTNESS_r{N}.json come before names
# already proven green, and within each group older proofs come first.
# Round history (name → rounds in which the driver recorded a green
# rows+schema+hash row; see CORRECTNESS_r01.json for round 1).
# MAINTENANCE (next round): fold the names green in CORRECTNESS_r05.json
# into this map as (…, 5) so the rotation keeps cycling fairly:
_R4_VERIFIED: tuple[str, ...] = (
    # hash-green rows in CORRECTNESS_r04.json
    "embedding_kmeans", "tpch_min_cost_supplier", "tpch_product_profit",
    "tpch_important_parts", "tpch_shipmode_priority",
    "semantic_decontaminate", "scd2_customer_history", "cdc_upsert_apply",
    "skew_salted_join", "embedding_int8_quantize", "graph_pagerank",
    "fuzzy_match_fastss2", "chunk_dedup_docs", "weighted_priority_sample",
    "token_entropy_by_source", "feature_hash_counts", "bigram_lm_topk",
    "embedding_zscore", "mad_outliers", "ewma_daily_revenue",
    "rolling_corr_revenue", "pareto_frontier", "graph_triangles",
    "tpch_suppliers_waiting", "streaming_static_enrich",
    "streaming_cdc_upsert", "quality_classifier_score",
    "month_over_month_growth", "constraint_quarantine",
    "weighted_sample_per_group", "rolling_active_users",
    "regex_pretokenize_counts", "source_distinctive_terms",
    "time_weighted_average", "streaming_ingest_dedup",
    "streaming_dq_monitor", "global_count", "topk_limit", "rank_topk",
    "rename_projection", "octet_length_fn", "timestamp_diff_minutes",
    "union_append", "multihop_join", "null_semantics",
    # rows-only-by-design entries driver-checked in round 4 (no oracle;
    # marking them keeps them at the back of the rotation window)
    "similarity_pq_topk", "flagship_most_populars", "hll_distinct_rollup",
    "embedding_pca_project", "bpe_learn_merges",
)
_R3_VERIFIED: tuple[str, ...] = (
    "dedup_components", "variant_json_shred", "lag_lead_order_gaps",
    "numeric_histogram", "iqr_outliers", "retention_cohorts",
    "funnel_conversion", "activity_streaks", "tpch_order_priority",
    "tpch_local_supplier_volume", "tpch_forecast_revenue",
    "tpch_volume_shipping", "tpch_returned_items",
    "tpch_customer_distribution", "tpch_promo_effect",
    "tpch_small_qty_revenue", "tpch_large_volume_customer",
    "gopher_quality_filter", "dup_ngram_coverage",
    "dsir_importance_weights", "unigram_logprob_buckets",
    "session_window_agg", "tpch_market_share", "fuzzy_match_fastss",
    "tpch_top_supplier", "streaming_session_window",
    "dedup_canonicalize", "split_leakage_audit",
    "embedding_canonicalize", "event_transition_matrix",
    "kfold_assignment", "tpch_disjunctive_pricing",
    "window_range_interval", "unpivot_metrics", "bm25_keyword_search",
    "tpch_sales_opportunity", "string_agg_ordered", "forward_fill_gaps",
    "normalize_filter", "daypart_case", "window_dedup_rank",
    "broadcast_left_join", "composite_key_join", "most_populars_flat",
    "daily_metrics",
)
_R2_VERIFIED: tuple[str, ...] = (
    "ann_recall_at_k", "anomaly_zscore_days", "array_functions",
    "build_vocab", "c4_quality_filter", "collect_set_agg",
    "corpus_decontaminate", "corpus_prepare_v2",
    "correlated_scalar_subquery", "cube_agg", "date_functions",
    "dedup_minhash_incremental", "dedup_stats_by_source",
    "domain_mixture_sample", "embedding_centroid_by_source",
    "embedding_random_projection", "explode_top_tokens",
    "filter_clause_agg", "flagship_known_zones", "grouping_sets_agg",
    "hex_neighbor_smoothing", "hopping_window_counts", "latest_by_key",
    "multimodal_features", "null_safe_join", "pack_sequences",
    "percentiles_exact", "recursive_cte_date_spine", "rollup_agg",
    "semantic_search_docs", "semi_anti_join", "set_ops",
    "streaming_click_attribution", "streaming_sessionize_stateful",
    "text_lexical_diversity", "text_pii_scrub",
    "text_repetition_scores", "tokenize_with_vocab", "topk_per_group",
    "tpch_pricing_summary", "tpch_shipping_priority",
    "udtf_split_sentences", "validate_constraints",
    "window_distribution", "window_distribution_approx",
    "window_first_last", "window_moving_sum", "winnowing_fingerprints",
    "winnowing_near_dup_pairs", "zorder_key_customers",
)
# Merge-safe accumulation: a name green in several rounds keeps ALL its
# rounds (max() drives the rotation) — append new rounds via _mark_verified
# so re-verifications never clobber history.
_VERIFIED_ROUNDS: dict[str, tuple[int, ...]] = {}


def _mark_verified(round_no: int, names: tuple[str, ...]) -> None:
    for n in names:
        _VERIFIED_ROUNDS[n] = _VERIFIED_ROUNDS.get(n, ()) + (round_no,)


_mark_verified(4, _R4_VERIFIED)
_mark_verified(3, _R3_VERIFIED)
_mark_verified(2, _R2_VERIFIED)
_mark_verified(1, (
        "normalize_filter", "daypart_case", "window_dedup_rank",
        "broadcast_left_join", "composite_key_join", "most_populars_flat",
        "daily_metrics", "global_count", "topk_limit", "rank_topk",
        "rename_projection", "octet_length_fn", "timestamp_diff_minutes",
        "union_append", "multihop_join", "null_semantics",
        "model_daily_trip_metrics", "model_trips_view", "model_staging_rename",
        "dedup_exact", "dedup_minhash_lsh", "dedup_simhash_fingerprint",
        "dedup_simhash_pairs", "dedup_ngram_jaccard", "similarity_cosine_topk",
        "similarity_lsh_topk", "text_token_stats", "text_quality_scores",
        "text_language_id", "text_fingerprints", "deterministic_sample",
        "train_test_split", "text_clean", "chunk_documents",
        "corpus_prepare_pipeline", "text_tfidf_top_terms", "stratified_sample",
        "multimodal_meta", "streaming_daypart_rollup", "embedding_near_dup",
        "similarity_lsh_multiprobe", "similarity_ivf_topk", "sql_ordinal_sort",
        "sessionize_events", "profile_columns", "asof_join_purchases",
        "range_join_windows", "json_extract_props", "string_functions",
        "pivot_event_types",
    ))


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            _utc(spark)
            return fn(spark, sf_dir)

        _QUERIES[name] = wrapped
        if oracle is not None:
            _ORACLES[name] = oracle
        return wrapped

    return deco


def _rotation_order() -> list[str]:
    """Registry names, least-recently-driver-verified first.

    Sort key: (last round the name was green, rows-only?, registration
    index) — never-verified names (last round 0) lead, then round-1-only
    names, etc. Within a group, oracle-bearing entries precede rows-only
    ones (a hash row is worth more than a rows-only row when the
    driver's ~50-entry budget runs out), then registration order keeps
    the rotation deterministic round-over-round.
    """
    names = list(_QUERIES)
    return sorted(
        names,
        key=lambda n: (
            max(_VERIFIED_ROUNDS.get(n, (0,))),
            0 if n in _ORACLES else 1,
            names.index(n),
        ),
    )


def all_queries() -> dict[str, QueryFn]:
    return {n: _QUERIES[n] for n in _rotation_order()}


def all_oracles() -> dict[str, str]:
    return {n: _ORACLES[n] for n in _rotation_order() if n in _ORACLES}


# ===========================================================================
# Relational core (SURVEY.md §2.2-§2.8) on the derived taxi data model
# ===========================================================================


@register(
    "normalize_filter",
    f"""
    SELECT strftime(pickup_datetime, '%Y-%m-%d %H:%M:%S') AS pickup_ts,
           strftime(dropoff_datetime, '%Y-%m-%d %H:%M:%S') AS dropoff_ts,
           passenger_count, trip_distance, fare_amount,
           pickup_location_id, dropoff_location_id
    FROM ({NORM_SQL})
    """,
)
def q_normalize_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/P2: the reference normalization predicate (keep-good-rows)."""
    return _norm_trips(spark, sf_dir).select(
        _ts_str(F.col("pickup_datetime"), "pickup_ts"),
        _ts_str(F.col("dropoff_datetime"), "dropoff_ts"),
        "passenger_count",
        "trip_distance",
        "fare_amount",
        "pickup_location_id",
        "dropoff_location_id",
    )


@register(
    "daypart_case",
    f"""
    SELECT {DAYPART_SQL.format(t="strftime(ts, '%H:%M:%S')")} AS daypart,
           count(*) AS event_count
    FROM events GROUP BY 1
    """,
)
def q_daypart_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F2/F3: the no-ELSE daypart CASE over extracted TIME strings."""
    return (
        _events(spark, sf_dir)
        .groupBy(daypart(F.col("ts")).alias("daypart"))
        .agg(F.count(F.lit(1)).alias("event_count"))
    )


@register(
    "window_dedup_rank",
    """
    SELECT user_id, event_id, CAST(strlen(props) AS BIGINT) AS props_len
    FROM (SELECT *, rank() OVER (PARTITION BY user_id
                                 ORDER BY strlen(props) DESC) AS finish_rank
          FROM events)
    WHERE finish_rank = 1
    """,
)
def q_window_dedup_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1+P5: longest-payload-wins dedup rank (enrichment_query.py:12-14)."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.octet_length("props").desc())
    return (
        ev.withColumn("finish_rank", F.rank().over(w))
        .filter(F.col("finish_rank") == 1)
        .select(
            "user_id",
            "event_id",
            F.octet_length("props").cast("long").alias("props_len"),
        )
    )


@register(
    "broadcast_left_join",
    """
    SELECT l_orderkey, l_linenumber, l_suppkey, s_name, s_acctbal
    FROM lineitem LEFT JOIN supplier ON l_suppkey = s_suppkey
    """,
)
def q_broadcast_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/J2: fact × broadcast dim LEFT equi-join."""
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    return li.join(F.broadcast(sup), li["l_suppkey"] == sup["s_suppkey"], "left").select(
        "l_orderkey", "l_linenumber", "l_suppkey", "s_name", "s_acctbal"
    )


@register(
    "composite_key_join",
    """
    SELECT a.l_orderkey, a.l_linenumber, a.l_partkey, a.l_suppkey,
           a.l_quantity, b.l_extendedprice
    FROM lineitem a
    JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_linenumber = b.l_linenumber
     AND a.l_partkey = b.l_partkey AND a.l_suppkey = b.l_suppkey
    """,
)
def q_composite_key_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: INNER join on a composite 4-column equi key."""
    li = _t(spark, sf_dir, "lineitem")
    keys = ["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"]
    a = li.select(*keys, "l_quantity")
    b = li.select(*keys, "l_extendedprice")
    return a.join(b, keys, "inner").select(
        *keys, "l_quantity", "l_extendedprice"
    )


MOST_POPULARS_SQL = f"""
    WITH cells AS (
        SELECT 'z' || CAST(pickup_location_id AS VARCHAR) AS pickup_cell,
               'z' || CAST(dropoff_location_id AS VARCHAR) AS dropoff_cell
        FROM ({NORM_SQL})
    ),
    routes0 AS (
        SELECT pickup_cell, dropoff_cell, count(*) AS route_count,
               rank() OVER (ORDER BY count(*) DESC) AS popularity
        FROM cells GROUP BY 1, 2
    ),
    r AS (SELECT * FROM routes0 WHERE popularity <= 100),
    d0 AS (
        SELECT dropoff_cell, count(*) AS dropoff_count,
               rank() OVER (ORDER BY count(*) DESC) AS popularity
        FROM cells GROUP BY 1
    ),
    d AS (SELECT * FROM d0 WHERE popularity <= 100),
    p0 AS (
        SELECT pickup_cell, count(*) AS pickup_count,
               rank() OVER (ORDER BY count(*) DESC) AS popularity
        FROM cells GROUP BY 1
    ),
    p AS (SELECT * FROM p0 WHERE popularity <= 100)
    SELECT CAST(popularity AS BIGINT) AS popularity,
           r.pickup_cell AS route_pickup_cell,
           r.dropoff_cell AS route_dropoff_cell,
           r.route_count,
           d.dropoff_cell AS dropoff_hexagon, d.dropoff_count,
           p.pickup_cell AS pickup_hexagon, p.pickup_count
    FROM r JOIN d USING (popularity) JOIN p USING (popularity)
"""


def _populars_flat(cells: DataFrame) -> DataFrame:
    """taxi_trips_etl.py:164-176 final-result shape, flat columns:
    three group-count-rank-top100 branches joined USING(popularity)."""
    routes = ranked_counts(cells, ["pickup_cell", "dropoff_cell"], "route_count", 100)
    drops = ranked_counts(cells, ["dropoff_cell"], "dropoff_count", 100)
    picks = ranked_counts(cells, ["pickup_cell"], "pickup_count", 100)
    return (
        routes.select(
            F.col("popularity").cast("long").alias("popularity"),
            F.col("pickup_cell").alias("route_pickup_cell"),
            F.col("dropoff_cell").alias("route_dropoff_cell"),
            "route_count",
        )
        .join(
            drops.select(
                F.col("popularity").cast("long").alias("popularity"),
                F.col("dropoff_cell").alias("dropoff_hexagon"),
                "dropoff_count",
            ),
            "popularity",
        )
        .join(
            picks.select(
                F.col("popularity").cast("long").alias("popularity"),
                F.col("pickup_cell").alias("pickup_hexagon"),
                "pickup_count",
            ),
            "popularity",
        )
    )


@register("most_populars_flat", MOST_POPULARS_SQL)
def q_most_populars_flat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2 + W2 + T1 + J4: the full final-result shape
    (taxi_trips_etl.py:164-176) with location-derived cells so DuckDB
    can oracle it (the geo-UDF variant is ``flagship_most_populars``)."""
    cells = _norm_trips(spark, sf_dir).select(
        F.concat(F.lit("z"), F.col("pickup_location_id").cast("string")).alias(
            "pickup_cell"
        ),
        F.concat(F.lit("z"), F.col("dropoff_location_id").cast("string")).alias(
            "dropoff_cell"
        ),
    )
    return _populars_flat(cells)


def _zone_hex_values_sql() -> str:
    """The synthetic zone dim's zone_id → hex-cell mapping as a SQL
    VALUES list, computed at import time with the same pure-Python
    centroid→cell function the enrichment UDF wraps.

    Rank-dedup semantics baked in: zones with a duplicate geometry
    (z % 5 == 0) keep the LONGER octagon WKT (enrichment_query.py:12-14
    — byte_length DESC, rank 1), so the mapping indexes that geometry's
    centroid. tests/test_geo.py pins the underlying WKT→cell fixtures,
    keeping this literal list honest independently of Spark."""
    from taxi_trips_etl_spark.functions.geo import centroid_cell

    rows = ", ".join(
        f"({z}, '{centroid_cell(_zone_wkt(z, detailed=(z % 5 == 0)))}')"
        for z in range(N_ZONES)
    )
    return f"SELECT * FROM (VALUES {rows}) AS zm(zone_id, hex)"


_FLAGSHIP_KNOWN_ZONES_TEMPLATE = f"""
    WITH zm AS ({{zm}}),
    cells AS (
        SELECT p.hex AS pickup_cell, d.hex AS dropoff_cell
        FROM ({NORM_SQL}) t
        LEFT JOIN zm p ON t.pickup_location_id = p.zone_id
        LEFT JOIN zm d ON t.dropoff_location_id = d.zone_id
    ),
    routes0 AS (
        SELECT pickup_cell, dropoff_cell, count(*) AS route_count,
               rank() OVER (ORDER BY count(*) DESC) AS popularity
        FROM cells GROUP BY 1, 2
    ),
    r AS (SELECT * FROM routes0 WHERE popularity <= 100),
    d0 AS (
        SELECT dropoff_cell, count(*) AS dropoff_count,
               rank() OVER (ORDER BY count(*) DESC) AS popularity
        FROM cells GROUP BY 1
    ),
    d AS (SELECT * FROM d0 WHERE popularity <= 100),
    p0 AS (
        SELECT pickup_cell, count(*) AS pickup_count,
               rank() OVER (ORDER BY count(*) DESC) AS popularity
        FROM cells GROUP BY 1
    ),
    p AS (SELECT * FROM p0 WHERE popularity <= 100)
    SELECT CAST(popularity AS BIGINT) AS popularity,
           r.pickup_cell AS route_pickup_cell,
           r.dropoff_cell AS route_dropoff_cell,
           r.route_count,
           d.dropoff_cell AS dropoff_hexagon, d.dropoff_count,
           p.pickup_cell AS pickup_hexagon, p.pickup_count
    FROM r JOIN d USING (popularity) JOIN p USING (popularity)
"""


FLAGSHIP_KNOWN_ZONES_SQL = _FLAGSHIP_KNOWN_ZONES_TEMPLATE.format(
    zm=_zone_hex_values_sql()
)


@register("flagship_known_zones", FLAGSHIP_KNOWN_ZONES_SQL)
def q_flagship_known_zones(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL 4-stage pipeline — load → normalize → geo/hex enrichment
    (WKT-centroid→cell UDF on the deduped zone dim, two broadcast
    joins) → rank/top-k/USING join — against an exact DuckDB oracle.

    Unlike ``flagship_most_populars`` (rows-only: hex ids come from the
    UDF), the synthetic zone dim's centroids are knowable at import
    time, so the oracle carries the zone→cell mapping as a literal
    VALUES list produced by the same pure-Python ``centroid_cell`` the
    UDF wraps — pinning the relational 95% of the pipeline exactly
    while tests/test_geo.py pins the UDF kernel itself.
    """
    from taxi_trips_etl_spark.operators.enrich import enrich_trips
    from taxi_trips_etl_spark.sources.taxi_testdata import zone_dim

    enriched = enrich_trips(_norm_trips(spark, sf_dir), zone_dim(spark))
    cells = enriched.select(
        F.col("h3_pickup").alias("pickup_cell"),
        F.col("h3_dropoff").alias("dropoff_cell"),
    )
    return _populars_flat(cells)


_HEX_OFFSETS = ((0, 0), (1, 0), (-1, 0), (0, 1), (0, -1), (1, -1), (-1, 1))


def _hex_smooth_sql() -> str:
    nbrs = ", ".join(
        "concat_ws('_', parts[1], "
        f"CAST(CAST(parts[2] AS BIGINT) + {dq} AS VARCHAR), "
        f"CAST(CAST(parts[3] AS BIGINT) + {dr} AS VARCHAR))"
        for dq, dr in _HEX_OFFSETS
    )
    return f"""
    WITH zm AS ({_zone_hex_values_sql()}),
    counts AS (
        SELECT d.hex AS cell, count(*) AS n
        FROM ({NORM_SQL}) t
        LEFT JOIN zm d ON t.dropoff_location_id = d.zone_id
        WHERE d.hex IS NOT NULL
        GROUP BY 1
    ),
    fan AS (
        SELECT cell, n,
               unnest([{nbrs}]) AS nbr_cell
        FROM (SELECT cell, n, string_split(cell, '_') AS parts FROM counts)
    ),
    smoothed AS (
        SELECT nbr_cell AS cell, sum(n) AS smoothed_count
        FROM fan GROUP BY 1
    )
    SELECT c.cell, CAST(c.n AS BIGINT) AS raw_count,
           CAST(s.smoothed_count AS BIGINT) AS smoothed_count
    FROM counts c JOIN smoothed s USING (cell)
    """


@register("hex_neighbor_smoothing", _hex_smooth_sql())
def q_hex_neighbor_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial smoothing over the hex grid: each cell's dropoff count
    summed with its 6 axial neighbors' (hotspot detection robust to
    cell-boundary jitter). The neighbor fan-out is a 7-way explode of
    STRING ARITHMETIC on the cell id — no geometry at query time, so
    the smoothing join is a plain equi-join that scales like any
    groupBy. Exact oracle via the known-zone VALUES mapping."""
    from taxi_trips_etl_spark.operators.enrich import enrich_trips
    from taxi_trips_etl_spark.sources.taxi_testdata import zone_dim

    enriched = enrich_trips(_norm_trips(spark, sf_dir), zone_dim(spark))
    counts = (
        enriched.filter(F.col("h3_dropoff").isNotNull())
        .groupBy(F.col("h3_dropoff").alias("cell"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    parts = F.split("cell", "_")
    qq = F.element_at(parts, 2).cast("long")
    rr = F.element_at(parts, 3).cast("long")
    nbrs = F.array(
        *[
            F.concat_ws(
                "_",
                F.element_at(parts, 1),
                (qq + dq).cast("string"),
                (rr + dr).cast("string"),
            )
            for dq, dr in _HEX_OFFSETS
        ]
    )
    fan = counts.select("cell", "n", F.explode(nbrs).alias("nbr_cell"))
    smoothed = fan.groupBy(F.col("nbr_cell").alias("cell")).agg(
        F.sum("n").alias("smoothed_count")
    )
    return counts.join(smoothed, "cell").select(
        "cell",
        F.col("n").cast("long").alias("raw_count"),
        F.col("smoothed_count").cast("long"),
    )


@register(
    "daily_metrics",
    """
    SELECT order_date, n_orders, total_price_cents,
           CAST(total_price_cents AS DOUBLE) / 100.0 / n_orders AS avg_price
    FROM (SELECT strftime(o_orderdate, '%Y-%m-%d') AS order_date,
                 count(*) AS n_orders,
                 CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                     AS total_price_cents
          FROM orders GROUP BY 1)
    """,
)
def q_daily_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: multi-aggregate groupBy (models/daily_trip_metrics.sql shape).

    Money discipline: prices are cent-quantized, so float sums/avgs sit
    EXACTLY on .005 rounding boundaries and Spark/DuckDB round() can
    disagree. Sum exact integer cents instead; the avg is then one
    deterministic IEEE division on identical operands in both engines.
    """
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return (
        _t(spark, sf_dir, "orders")
        .groupBy(F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(cents).alias("total_price_cents"),
        )
        .select(
            "order_date",
            "n_orders",
            "total_price_cents",
            (F.col("total_price_cents").cast("double") / 100.0 / F.col("n_orders"))
            .alias("avg_price"),
        )
    )


@register("global_count", "SELECT count(1) AS row_count FROM lineitem")
def q_global_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: global scalar count (models/trips_view.sql:1)."""
    return _t(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("row_count"))


@register(
    "topk_limit",
    """
    SELECT l_partkey, count(*) AS part_count
    FROM lineitem GROUP BY 1
    ORDER BY part_count DESC, l_partkey LIMIT 100
    """,
)
def q_topk_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1: ORDER BY count DESC LIMIT k (TakeOrderedAndProject), with a
    unique-key tiebreak for cross-engine determinism."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("part_count"))
        .orderBy(F.col("part_count").desc(), F.col("l_partkey"))
        .limit(100)
    )


@register(
    "rank_topk",
    """
    SELECT l_suppkey, supp_count, CAST(popularity AS BIGINT) AS popularity
    FROM (SELECT l_suppkey, count(*) AS supp_count,
                 rank() OVER (ORDER BY count(*) DESC) AS popularity
          FROM lineitem GROUP BY 1)
    WHERE popularity <= 5
    """,
)
def q_rank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: global RANK over aggregated counts, ties included."""
    return ranked_counts(
        _t(spark, sf_dir, "lineitem"), ["l_suppkey"], "supp_count", 5
    ).select("l_suppkey", "supp_count", F.col("popularity").cast("long").alias("popularity"))


@register(
    "rename_projection",
    """
    SELECT c_custkey AS customer_id, c_name AS customer_name,
           c_mktsegment AS market_segment, c_acctbal AS account_balance
    FROM customer
    """,
)
def q_rename_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: staging rename (stg_taxi_trips__tripss.sql:9-19)."""
    return _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("customer_id"),
        F.col("c_name").alias("customer_name"),
        F.col("c_mktsegment").alias("market_segment"),
        F.col("c_acctbal").alias("account_balance"),
    )


@register(
    "octet_length_fn",
    """
    SELECT p_partkey, CAST(strlen(p_name) AS BIGINT) AS name_bytes,
           CAST(length(p_name) AS BIGINT) AS name_chars
    FROM part
    """,
)
def q_octet_length_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4: byte_length ≡ octet_length (enrichment_query.py:12,19)."""
    return _t(spark, sf_dir, "part").select(
        "p_partkey",
        F.octet_length("p_name").cast("long").alias("name_bytes"),
        F.length("p_name").cast("long").alias("name_chars"),
    )


@register(
    "timestamp_diff_minutes",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(floor((epoch(l_shipdate) - epoch(o_orderdate)) / 60) AS BIGINT)
               AS ship_delay_min
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    """,
)
def q_timestamp_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10: timestamp_diff(_, _, minute) (models/tripss.sql:3)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    return li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        "l_orderkey",
        "l_linenumber",
        timestamp_diff_minutes(F.col("l_shipdate"), F.col("o_orderdate")).alias(
            "ship_delay_min"
        ),
    )


@register(
    "union_append",
    """
    SELECT l_returnflag, count(*) AS n
    FROM (SELECT * FROM lineitem UNION ALL SELECT * FROM lineitem)
    GROUP BY 1
    """,
)
def q_union_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7/S4: append-load ≡ unionByName."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.unionByName(li)
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "multihop_join",
    """
    SELECT r_name, n_customers,
           CAST(balance_cents AS DOUBLE) / 100.0 / n_customers AS avg_balance
    FROM (SELECT r_name, count(*) AS n_customers,
                 CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
                     AS balance_cents
          FROM customer
          JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          GROUP BY 1)
    """,
)
def q_multihop_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained broadcast equi-joins across the dim hierarchy."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    return (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(cents).alias("balance_cents"),
        )
        .select(
            "r_name",
            "n_customers",
            (F.col("balance_cents").cast("double") / 100.0 / F.col("n_customers"))
            .alias("avg_balance"),
        )
    )


@register(
    "null_semantics",
    """
    SELECT count(*) AS total_rows,
           CAST(count(nullif(l_discount, 0.0)) AS BIGINT) AS nonzero_discounts,
           CAST(sum(CASE WHEN nullif(l_discount, 0.0) IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS zero_or_null,
           CAST(count(CASE WHEN nullif(l_discount, 0.0) != 0.05 THEN 1 END)
                AS BIGINT) AS neq_keeps
    FROM lineitem
    """,
)
def q_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12: null-rejecting ``!=`` / IS NULL semantics (BQ-compatible)."""
    li = _t(spark, sf_dir, "lineitem")
    nz = F.nullif(F.col("l_discount"), F.lit(0.0))
    return li.agg(
        F.count(F.lit(1)).alias("total_rows"),
        F.count(nz).alias("nonzero_discounts"),
        F.sum(F.when(nz.isNull(), 1).otherwise(0)).cast("long").alias("zero_or_null"),
        F.count(F.when(nz != 0.05, 1)).alias("neq_keeps"),
    )


# ===========================================================================
# dbt-parity models (SURVEY.md §1.1 / EP3)
# ===========================================================================


def _model_registry(spark: SparkSession, sf_dir: str):
    norm = _norm_trips(spark, sf_dir)
    enriched_like = norm.select(
        daypart(F.col("pickup_datetime")).alias("daypart"),
        "pickup_datetime",
        "dropoff_datetime",
        "pickup_location_id",
        "dropoff_location_id",
        F.col("fare_amount").alias("total_amount"),
    )
    return taxi_models(spark, enriched_like)


@register(
    "model_daily_trip_metrics",
    f"""
    SELECT pickup_date, n_trips, avg_drive_time, total_drive_time,
           total_amount_cents,
           CAST(total_amount_cents AS DOUBLE) / 100.0 / n_trips AS avg_amount
    FROM (SELECT strftime(pickup_datetime, '%Y-%m-%d') AS pickup_date,
                 count(*) AS n_trips,
                 avg(drive_time) AS avg_drive_time,
                 CAST(sum(drive_time) AS BIGINT) AS total_drive_time,
                 CAST(sum(fare_cents) AS BIGINT) AS total_amount_cents
          FROM (SELECT pickup_datetime,
                       CAST(floor((epoch(dropoff_datetime) - epoch(pickup_datetime))
                                  / 60) AS BIGINT) AS drive_time,
                       CAST(round(fare_amount * 100) AS BIGINT) AS fare_cents
                FROM ({NORM_SQL}))
          GROUP BY 1)
    """,
)
def q_model_daily_trip_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dbt model daily_trip_metrics (models/daily_trip_metrics.sql:1-3)."""
    reg = _model_registry(spark, sf_dir)
    return reg.ref("daily_trip_metrics").select(
        F.date_format("pickup_date", "yyyy-MM-dd").alias("pickup_date"),
        "n_trips",
        "avg_drive_time",
        F.col("total_drive_time").cast("long").alias("total_drive_time"),
        "total_amount_cents",
        "avg_amount",
    )


@register(
    "model_trips_view",
    f"SELECT count(1) AS trip_count FROM ({NORM_SQL})",
)
def q_model_trips_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dbt model trips_view (models/trips_view.sql:1)."""
    return _model_registry(spark, sf_dir).ref("trips_view")


@register(
    "model_staging_rename",
    f"""
    SELECT strftime(pickup_datetime, '%Y-%m-%d %H:%M:%S') AS pickup_ts,
           strftime(dropoff_datetime, '%Y-%m-%d %H:%M:%S') AS dropoff_ts,
           pickup_location_id AS pickup_zone,
           dropoff_location_id AS dropoff_zone,
           {DAYPART_SQL.format(t="strftime(pickup_datetime, '%H:%M:%S')")} AS daypart
    FROM ({NORM_SQL})
    """,
)
def q_model_staging_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dbt staging model (stg_taxi_trips__tripss.sql:1-21)."""
    stg = _model_registry(spark, sf_dir).ref("stg_taxi_trips__tripss")
    return stg.select(
        _ts_str(F.col("pickup_ts"), "pickup_ts"),
        _ts_str(F.col("dropoff_ts"), "dropoff_ts"),
        "pickup_zone",
        "dropoff_zone",
        "daypart",
    )


# ===========================================================================
# Dedup operators (north-star)
# ===========================================================================


@register(
    "dedup_exact",
    """
    SELECT md5(text) AS text_hash, min(doc_id) AS canonical_doc_id,
           count(1) AS dup_count
    FROM documents GROUP BY 1
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.exact_duplicates(_t(spark, sf_dir, "documents"))


_MINHASH_SIG_SQL = ", ".join(
    f"list_min(list_transform(grams, g -> md5('{i}:' || g))) AS mh{i}"
    for i in range(dedup.MINHASH_K)
)
_MINHASH_BANDS_SQL = " UNION ALL ".join(
    f"""SELECT doc_id, {b} AS band_id,
        md5(concat_ws('|', mh{b * 4}, mh{b * 4 + 1}, mh{b * 4 + 2}, mh{b * 4 + 3}))
            AS band_key FROM sig"""
    for b in range(dedup.LSH_BANDS)
)


@register(
    "dedup_minhash_lsh",
    f"""
    WITH shingled AS ({GRAMS_SQL}),
    sig AS (SELECT doc_id, {_MINHASH_SIG_SQL} FROM shingled),
    bands AS ({_MINHASH_BANDS_SQL})
    SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
    FROM bands a JOIN bands b
      ON a.band_id = b.band_id AND a.band_key = b.band_key
     AND a.doc_id < b.doc_id
    """,
)
def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.minhash_lsh_candidates(_t(spark, sf_dir, "documents"))


@register(
    "dedup_minhash_incremental",
    f"""
    WITH shingled AS ({GRAMS_SQL}),
    sig AS (SELECT doc_id, {_MINHASH_SIG_SQL} FROM shingled),
    bands AS ({_MINHASH_BANDS_SQL}),
    nb AS (SELECT * FROM bands WHERE doc_id % 10 = 0)
    SELECT DISTINCT least(n.doc_id, c.doc_id) AS doc_id_a,
           greatest(n.doc_id, c.doc_id) AS doc_id_b
    FROM nb n JOIN bands c
      ON n.band_id = c.band_id AND n.band_key = c.band_key
     AND n.doc_id != c.doc_id
    """,
)
def q_dedup_minhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta dedup: the doc_id%10==0 slice is the ingest batch; pairs
    touch the batch only — corpus×corpus is never re-paired."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.minhash_lsh_incremental(
        docs.filter(F.col("doc_id") % 10 != 0),
        docs.filter(F.col("doc_id") % 10 == 0),
    )


def _simhash_fp_sql() -> str:
    bit_terms = " + ".join(
        f"""CASE WHEN list_sum(list_transform(hs,
                h -> ((h >> {j}) & 1) * 2 - 1)) > 0
            THEN CAST({1 << j} AS BIGINT) ELSE 0 END"""
        for j in range(dedup.SIMHASH_BITS)
    )
    return f"""
    WITH toks AS (
        SELECT doc_id, list_distinct({TOKS_SQL}) AS dtoks FROM documents
    ),
    hs AS (
        SELECT doc_id,
               list_transform(dtoks,
                   t -> CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT)) AS hs
        FROM toks
    )
    SELECT doc_id, {bit_terms} AS simhash FROM hs
    """


@register("dedup_simhash_fingerprint", _simhash_fp_sql())
def q_dedup_simhash_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.simhash(_t(spark, sf_dir, "documents"))


@register(
    "dedup_simhash_pairs",
    f"""
    WITH fp AS ({_simhash_fp_sql()}),
    banded AS (
        SELECT doc_id, simhash, b.band_id,
               (simhash >> (b.band_id * 15)) & 32767 AS band_val
        FROM fp, (SELECT unnest(generate_series(0, 3)) AS band_id) b
    ),
    pairs AS (
        SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
               a.simhash AS sh_a, b.simhash AS sh_b
        FROM banded a JOIN banded b
          ON a.band_id = b.band_id AND a.band_val = b.band_val
         AND a.doc_id < b.doc_id
    )
    SELECT doc_id_a, doc_id_b,
           CAST(bit_count(xor(sh_a, sh_b)) AS BIGINT) AS hamming
    FROM pairs
    WHERE bit_count(xor(sh_a, sh_b)) <= 3
    """,
)
def q_dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.simhash_near_duplicates(_t(spark, sf_dir, "documents"))


@register(
    "dedup_ngram_jaccard",
    f"""
    WITH g AS (SELECT doc_id, grams, len(grams) AS n_grams FROM ({GRAMS_SQL})
               WHERE len(grams) > 0)
    SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
           round(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                 / len(list_distinct(a.grams || b.grams)), 6) AS jaccard
    FROM g a JOIN g b
      ON a.doc_id < b.doc_id
     AND least(a.n_grams, b.n_grams) >= greatest(a.n_grams, b.n_grams) * 0.8
    WHERE round(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                / len(list_distinct(a.grams || b.grams)), 6) >= 0.8
    """,
)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.ngram_jaccard_pairs(_t(spark, sf_dir, "documents"))


# ===========================================================================
# Similarity search (north-star)
# ===========================================================================

_COS_SQL = """
    list_sum(list_transform(generate_series(1, len(a.emb)),
                            i -> a.emb[i] * b.emb[i]))
    / (sqrt(list_sum(list_transform(generate_series(1, len(a.emb)),
                                    i -> a.emb[i] * a.emb[i])))
       * sqrt(list_sum(list_transform(generate_series(1, len(b.emb)),
                                      i -> b.emb[i] * b.emb[i]))))
"""


@register(
    "similarity_cosine_topk",
    f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
    scored AS (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               {_COS_SQL} AS cos
        FROM e a JOIN e b ON a.vec_id < 10 AND a.vec_id != b.vec_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, cos,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, neighbor_id) AS knn_rank
        FROM scored
    )
    SELECT query_id, neighbor_id, round(cos, 6) AS cosine,
           CAST(knn_rank AS BIGINT) AS knn_rank
    FROM ranked WHERE knn_rank <= 5
    """,
)
def q_similarity_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.cosine_topk_bruteforce(_t(spark, sf_dir, "embeddings"))


@register(
    "ann_recall_at_k",
    f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
    scored AS (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               {_COS_SQL} AS cos,
               substr(list_aggregate(list_transform(
                       generate_series(1, 6),
                       i -> CASE WHEN a.emb[i] > 0 THEN '1' ELSE '0' END),
                   'string_agg', ''), 1, 6) AS qb,
               substr(list_aggregate(list_transform(
                       generate_series(1, 6),
                       i -> CASE WHEN b.emb[i] > 0 THEN '1' ELSE '0' END),
                   'string_agg', ''), 1, 6) AS nb
        FROM e a JOIN e b ON a.vec_id < 10 AND a.vec_id != b.vec_id
    ),
    exact AS (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, neighbor_id) AS r
        FROM scored
    ),
    truth AS (SELECT query_id, neighbor_id FROM exact WHERE r <= 3),
    approx AS (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, neighbor_id) AS r
        FROM scored WHERE qb = nb
    ),
    hits AS (
        SELECT t.query_id,
               sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                   AS n_hit
        FROM truth t
        LEFT JOIN (SELECT query_id, neighbor_id FROM approx WHERE r <= 3) a
          ON t.query_id = a.query_id AND t.neighbor_id = a.neighbor_id
        GROUP BY 1
    )
    SELECT query_id, CAST(n_hit AS BIGINT) AS n_hit,
           round(CAST(n_hit AS DOUBLE) / 3, 4) AS recall_at_3
    FROM hits
    """,
)
def q_ann_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN self-evaluation: recall@3 of the sign-LSH bucket index
    against brute-force ground truth, per query — the metric that
    tells you whether an index's speed is costing you quality. Both
    sides are this repo's own operators; the comparison is one tiny
    join on (query, neighbor)."""
    emb = _t(spark, sf_dir, "embeddings")
    truth = similarity.cosine_topk_bruteforce(
        emb, query_ids_below=10, k=3
    ).select("query_id", "neighbor_id")
    approx = similarity.cosine_topk_lsh(
        emb, query_ids_below=10, k=3, planes=6
    ).select("query_id", F.col("neighbor_id").alias("a_neighbor"))
    return (
        truth.join(
            approx,
            (truth["query_id"] == approx["query_id"])
            & (truth["neighbor_id"] == approx["a_neighbor"]),
            "left",
        )
        .drop(approx["query_id"])
        .groupBy("query_id")
        .agg(
            F.sum(
                F.when(F.col("a_neighbor").isNotNull(), 1).otherwise(0)
            ).cast("long").alias("n_hit")
        )
        .select(
            "query_id",
            "n_hit",
            F.round(F.col("n_hit") / 3, 4).alias("recall_at_3"),
        )
    )


@register(
    "embedding_centroid_by_source",
    """
    WITH j AS (SELECT d.source, CAST(e.embedding AS DOUBLE[]) AS emb
               FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id),
    f AS (SELECT source,
                 unnest(list_transform(generate_series(1, len(emb)),
                        i -> {'pos': i, 'x': emb[i]})) AS u
          FROM j)
    SELECT source, CAST(u.pos AS BIGINT) AS dim,
           round(avg(u.x), 6) AS centroid_val,
           CAST(count(*) AS BIGINT) AS n_vectors
    FROM f GROUP BY 1, 2
    """,
)
def q_embedding_centroid_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain embedding centroids (long form: source × dim) — the
    domain-profile vectors used for mixture diagnostics and drift
    monitoring. posexplode → one partial-agg shuffle on (source, dim);
    the shuffle carries scalar partial sums, never vectors."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    emb = _t(spark, sf_dir, "embeddings")
    j = docs.join(emb, docs["doc_id"] == emb["vec_id"]).select(
        "source",
        F.transform("embedding", lambda x: x.cast("double")).alias("emb"),
    )
    f = j.select("source", F.posexplode("emb").alias("pos0", "x"))
    return (
        f.groupBy("source", (F.col("pos0") + 1).cast("long").alias("dim"))
        .agg(
            F.round(F.avg("x"), 6).alias("centroid_val"),
            F.count(F.lit(1)).alias("n_vectors"),
        )
        .select("source", "dim", "centroid_val", F.col("n_vectors").cast("long"))
    )


@register(
    "semantic_search_docs",
    f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
    scored AS (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               {_COS_SQL} AS cos
        FROM e a JOIN e b ON a.vec_id < 5 AND a.vec_id != b.vec_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, cos,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, neighbor_id) AS knn_rank
        FROM scored
    )
    SELECT r.query_id, r.neighbor_id, round(r.cos, 6) AS cosine,
           CAST(r.knn_rank AS BIGINT) AS knn_rank,
           substr(d.text, 1, 80) AS snippet, d.source
    FROM ranked r JOIN documents d ON r.neighbor_id = d.doc_id
    WHERE r.knn_rank <= 3
    """,
)
def q_semantic_search_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval end-to-end: ANN over the embedding table joined back
    to the documents table for display (the RAG-retrieval read path).
    The hit list is tiny (queries × k), so the text join broadcasts
    the HITS into documents — the corpus text is scanned once, never
    shuffled, and only matching rows carry text."""
    hits = similarity.cosine_topk_bruteforce(
        _t(spark, sf_dir, "embeddings"), query_ids_below=5, k=3
    )
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.join(
            F.broadcast(hits),
            F.col("doc_id") == F.col("neighbor_id"),
        )
        .select(
            "query_id",
            "neighbor_id",
            "cosine",
            "knn_rank",
            F.substring("text", 1, 80).alias("snippet"),
            "source",
        )
    )


@register(
    "similarity_lsh_topk",
    f"""
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
               array_to_string(list_transform(embedding[1:8],
                   x -> CASE WHEN x > 0 THEN '1' ELSE '0' END), '') AS bucket
        FROM embeddings
    ),
    scored AS (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, {_COS_SQL} AS cos
        FROM e a JOIN e b
          ON a.vec_id < 10 AND a.vec_id != b.vec_id AND a.bucket = b.bucket
    ),
    ranked AS (
        SELECT query_id, neighbor_id, cos,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, neighbor_id) AS knn_rank
        FROM scored
    )
    SELECT query_id, neighbor_id, round(cos, 6) AS cosine,
           CAST(knn_rank AS BIGINT) AS knn_rank
    FROM ranked WHERE knn_rank <= 3
    """,
)
def q_similarity_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.cosine_topk_lsh(_t(spark, sf_dir, "embeddings"))


# ===========================================================================
# Text analysis (north-star)
# ===========================================================================


def _pii_scrub_sql_expr() -> str:
    """Nested regexp_replace chain built from the SAME pattern table the
    Spark operator uses (dataprep/text.py:PII_PATTERNS) — one source of
    truth for the RE2/Java-portable pattern subset."""
    from taxi_trips_etl_spark.dataprep.text import PII_PATTERNS

    expr = "text"
    for pat, repl in PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    return expr


@register(
    "text_pii_scrub",
    f"""
    WITH s AS (SELECT doc_id, text, {_pii_scrub_sql_expr()} AS scrubbed_text
               FROM documents)
    SELECT doc_id, scrubbed_text,
           CAST(text != scrubbed_text AS BIGINT) AS pii_found
    FROM s
    """,
)
def q_text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (emails/URLs/IPs/phones → typed placeholders) —
    the pre-training privacy pass, pure regexp_replace chain."""
    return text.pii_scrub(_t(spark, sf_dir, "documents"))


@register(
    "text_lexical_diversity",
    f"""
    WITH tok AS (SELECT doc_id, unnest({TOKS_SQL}) AS tok FROM documents),
    per AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY 1, 2),
    a AS (SELECT doc_id, sum(c) AS n, count(*) AS d, max(c) AS m,
                 sum(c * log2(CAST(c AS DOUBLE))) AS clogc
          FROM per GROUP BY 1)
    SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
           CAST(d AS BIGINT) AS n_distinct_tokens,
           round(CAST(d AS DOUBLE) / n, 4) AS ttr,
           round(CAST(m AS DOUBLE) / n, 4) AS top_token_frac,
           round(log2(CAST(n AS DOUBLE)) - clogc / n, 4) AS token_entropy
    FROM a
    """,
)
def q_text_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-token ratio, top-token fraction, unigram entropy — the
    repetition/templated-text quality signals."""
    return text.lexical_diversity(_t(spark, sf_dir, "documents"))


@register(
    "corpus_decontaminate",
    f"""
    WITH g AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   generate_series(1, len({TOKS_SQL}) - 4),
                   i -> concat_ws(' ', {TOKS_SQL}[i], {TOKS_SQL}[i+1],
                                  {TOKS_SQL}[i+2], {TOKS_SQL}[i+3],
                                  {TOKS_SQL}[i+4])))) AS gram
        FROM documents
        WHERE len({TOKS_SQL}) >= 5
    ),
    ev AS (SELECT doc_id AS eval_doc_id, gram FROM g WHERE doc_id % 20 = 0)
    SELECT DISTINCT g.doc_id, ev.eval_doc_id
    FROM g JOIN ev USING (gram)
    WHERE g.doc_id != ev.eval_doc_id
    """,
)
def q_corpus_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: corpus docs sharing a 5-token shingle
    with the deterministic pseudo-eval slice (doc_id % 20 == 0) — the
    test-set-leakage hygiene op, one gram equi-join, never doc×doc."""
    docs = _t(spark, sf_dir, "documents")
    return text.ngram_decontaminate(
        docs, docs.filter(F.col("doc_id") % 20 == 0)
    )


@register(
    "text_repetition_scores",
    f"""
    WITH t AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
    bi AS (SELECT doc_id, 2 AS gram_n,
                  unnest(list_transform(generate_series(1, len(toks) - 1),
                         i -> concat_ws(' ', toks[i], toks[i+1]))) AS gram
           FROM t WHERE len(toks) >= 2),
    tri AS (SELECT doc_id, 3 AS gram_n,
                   unnest(list_transform(generate_series(1, len(toks) - 2),
                          i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))
                       AS gram
            FROM t WHERE len(toks) >= 3),
    c AS (SELECT doc_id, gram_n, gram, count(*) AS c
          FROM (SELECT * FROM bi UNION ALL SELECT * FROM tri) GROUP BY 1, 2, 3),
    a AS (SELECT doc_id, gram_n, sum(c) AS n, max(c) AS m,
                 sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup
          FROM c GROUP BY 1, 2)
    SELECT d.doc_id,
           CAST(coalesce(max(CASE WHEN gram_n = 2 THEN n END), 0) AS BIGINT)
               AS n_bigrams,
           round(coalesce(CAST(max(CASE WHEN gram_n = 2 THEN m END) AS DOUBLE)
                 / max(CASE WHEN gram_n = 2 THEN n END), 0), 4)
               AS top_bigram_frac,
           round(coalesce(CAST(max(CASE WHEN gram_n = 2 THEN dup END) AS DOUBLE)
                 / max(CASE WHEN gram_n = 2 THEN n END), 0), 4)
               AS dup_bigram_frac,
           CAST(coalesce(max(CASE WHEN gram_n = 3 THEN n END), 0) AS BIGINT)
               AS n_trigrams,
           round(coalesce(CAST(max(CASE WHEN gram_n = 3 THEN dup END) AS DOUBLE)
                 / max(CASE WHEN gram_n = 3 THEN n END), 0), 4)
               AS dup_trigram_frac
    FROM documents d LEFT JOIN a ON d.doc_id = a.doc_id
    GROUP BY d.doc_id
    """,
)
def q_text_repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters: top-bigram fraction and
    duplicate bigram/trigram fractions per doc."""
    return text.repetition_scores(_t(spark, sf_dir, "documents"))


@register(
    "pack_sequences",
    f"""
    WITH t AS (SELECT doc_id, CAST(len({TOKS_SQL}) AS BIGINT) AS n_tokens
               FROM documents),
    s AS (SELECT doc_id, n_tokens,
                 CAST(coalesce(SUM(n_tokens) OVER (ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                      AS BIGINT) AS start_offset
          FROM t)
    SELECT doc_id, n_tokens, start_offset,
           start_offset // 512 AS first_seq,
           (start_offset + n_tokens - 1) // 512 AS last_seq,
           (start_offset + n_tokens - 1) // 512 - start_offset // 512 + 1
               AS n_seqs
    FROM s
    """,
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concatenate-and-split packing plan at seq_len=512. The oracle is
    the naive global-window prefix sum; the Spark impl is the two-pass
    bucketed equivalent (see dataprep/packing.py) — same numbers, no
    single-partition window."""
    from taxi_trips_etl_spark.dataprep.packing import pack_sequences

    return pack_sequences(_t(spark, sf_dir, "documents"))


@register(
    "domain_mixture_sample",
    """
    WITH c AS (SELECT source, CAST(count(*) AS DOUBLE) AS n_domain
               FROM documents GROUP BY 1),
    s AS (SELECT sum(n_domain) AS n_total, sum(sqrt(n_domain)) AS w_total
          FROM c),
    r AS (SELECT c.source,
                 CAST(floor(least(1.0, 0.5 * s.n_total * sqrt(c.n_domain)
                                  / s.w_total / c.n_domain) * 4294967296.0)
                      AS BIGINT) AS threshold
          FROM c, s)
    SELECT d.doc_id, d.source
    FROM documents d JOIN r ON d.source = r.source
    WHERE CAST(concat('0x', substr(md5('mix:' || CAST(d.doc_id AS VARCHAR)),
                                   1, 8)) AS BIGINT) < r.threshold
    """,
)
def q_domain_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted (alpha=0.5) domain rebalancing to ~50% of
    the corpus, content-hash membership — the multi-source mixing op."""
    from taxi_trips_etl_spark.dataprep.sampling import domain_mixture_sample

    return domain_mixture_sample(
        _t(spark, sf_dir, "documents"), key="doc_id", domain_col="source"
    ).select("doc_id", "source")


@register(
    "build_vocab",
    f"""
    WITH tok AS (SELECT unnest({TOKS_SQL}) AS token FROM documents),
    c AS (SELECT token, count(*) AS n_occurrences FROM tok GROUP BY 1),
    top AS (SELECT token, n_occurrences FROM c
            ORDER BY n_occurrences DESC, token ASC LIMIT 1000)
    SELECT token,
           CAST(row_number() OVER (ORDER BY n_occurrences DESC, token ASC) - 1
                AS BIGINT) AS token_id,
           CAST(n_occurrences AS BIGINT) AS n_occurrences
    FROM top
    """,
)
def q_build_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-prep vocabulary: top-1000 terms by global count with
    deterministic dense ids (parallel top-k, no global term sort)."""
    return text.build_vocab(_t(spark, sf_dir, "documents"), vocab_size=1000)


@register(
    "c4_quality_filter",
    f"""
    WITH t AS (SELECT doc_id, text, {TOKS_SQL} AS toks FROM documents),
    m AS (SELECT doc_id,
                 len(toks) AS n_tokens,
                 CAST(list_sum(list_transform(toks, w -> length(w)))
                      AS DOUBLE) / len(toks) AS mean_len,
                 length(text) AS n_chars,
                 length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g'))
                     AS n_weird,
                 list_max(list_transform(toks, w -> length(w))) AS max_tok
          FROM t)
    SELECT doc_id,
           CAST(n_tokens >= 5 AND n_tokens <= 10000 AS BIGINT) AS ok_n_tokens,
           CAST(mean_len >= 2 AND mean_len <= 12 AS BIGINT) AS ok_mean_len,
           CAST(n_weird < n_chars * 0.3 AS BIGINT) AS ok_symbols,
           CAST(max_tok <= 40 AS BIGINT) AS ok_max_tok,
           CAST(n_tokens >= 5 AND n_tokens <= 10000
                AND mean_len >= 2 AND mean_len <= 12
                AND n_weird < n_chars * 0.3 AND max_tok <= 40 AS BIGINT)
               AS keep
    FROM m
    """,
)
def q_c4_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style rule gate with auditable per-rule booleans — the
    cheap pre-filter ahead of dedup/scoring in a corpus pipeline."""
    return text.c4_quality_filter(_t(spark, sf_dir, "documents"))


@register(
    "tpch_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS sum_base_price_cents,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                         AS BIGINT)) AS BIGINT) AS sum_disc_price_e4,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
                               * (1 + l_tax) * 1000000) AS BIGINT)) AS BIGINT)
               AS sum_charge_e6,
           round(CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS DOUBLE)
                 / count(*), 4) AS avg_qty,
           round(CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE)
                 / 100 / count(*), 4) AS avg_disc,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_tpch_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan → pushed filter → one partial-agg shuffle
    of (flag, status) — 6 groups regardless of input size. Money terms
    are rounded to exact integers per row BEFORE summing (float sums
    are partition-order-dependent; integer sums are portable and
    exact — see plans/models.py daily metrics for the same rule)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    qty = F.round("l_quantity").cast("long")
    base = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_price = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("long")
    charge = F.round(
        F.col("l_extendedprice")
        * (1 - F.col("l_discount"))
        * (1 + F.col("l_tax"))
        * 1000000
    ).cast("long")
    disc = F.round(F.col("l_discount") * 100).cast("long")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(qty).alias("sum_qty"),
        F.sum(base).alias("sum_base_price_cents"),
        F.sum(disc_price).alias("sum_disc_price_e4"),
        F.sum(charge).alias("sum_charge_e6"),
        F.round(F.sum(qty).cast("double") / F.count(F.lit(1)), 4).alias(
            "avg_qty"
        ),
        F.round(
            F.sum(disc).cast("double") / 100 / F.count(F.lit(1)), 4
        ).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@register(
    "tpch_shipping_priority",
    """
    SELECT l.l_orderkey,
           CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000)
                         AS BIGINT)) AS BIGINT) AS revenue_e4,
           o.o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue_e4 DESC, o.o_orderdate ASC, l.l_orderkey ASC
    LIMIT 10
    """,
)
def q_tpch_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: the segment-filtered customer dim broadcasts
    into orders, the filtered join keys on l_orderkey, revenue partial-
    aggs, and top-10 runs as TakeOrderedAndProject — no global sort.
    The deterministic l_orderkey tie-break keeps the LIMIT stable
    across engines and partitionings."""
    c = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate")
        < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    rev = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("long")
    return (
        li.join(
            F.broadcast(c).join(o, c["c_custkey"] == o["o_custkey"]).select(
                "o_orderkey", "o_orderdate"
            ),
            li["l_orderkey"] == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(rev).alias("revenue_e4"))
        .select("l_orderkey", "revenue_e4", "o_orderdate")
        .orderBy(
            F.desc("revenue_e4"), F.asc("o_orderdate"), F.asc("l_orderkey")
        )
        .limit(10)
    )


@register(
    "tokenize_with_vocab",
    f"""
    WITH tok0 AS (SELECT unnest({TOKS_SQL}) AS token FROM documents),
    cnt AS (SELECT token, count(*) AS n FROM tok0 GROUP BY 1),
    vocab AS (SELECT token,
                     CAST(row_number() OVER (ORDER BY n DESC, token ASC) - 1
                          AS BIGINT) AS token_id
              FROM (SELECT token, n FROM cnt
                    ORDER BY n DESC, token ASC LIMIT 1000)),
    t AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
    flat AS (SELECT doc_id,
                    unnest(list_transform(generate_series(1, len(toks)),
                           i -> {{'pos': i, 'tok': toks[i]}})) AS u
             FROM t),
    f AS (SELECT doc_id, u.pos AS pos, u.tok AS token FROM flat),
    j AS (SELECT f.doc_id, f.pos, coalesce(v.token_id, -1) AS tid
          FROM f LEFT JOIN vocab v USING (token))
    SELECT doc_id,
           string_agg(CAST(tid AS VARCHAR), ' ' ORDER BY pos) AS token_ids,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN tid = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unk
    FROM j GROUP BY doc_id
    """,
)
def q_tokenize_with_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer apply: build_vocab's top-1000 vocabulary broadcast
    onto posexploded tokens, reassembled in position order — id
    sequences ready for packing; OOV → -1."""
    docs = _t(spark, sf_dir, "documents")
    return text.tokenize_with_vocab(
        docs, text.build_vocab(docs, vocab_size=1000)
    )


@register(
    "dedup_stats_by_source",
    """
    WITH per AS (SELECT source, md5(text) AS h, count(*) AS c
                 FROM documents GROUP BY 1, 2)
    SELECT source, CAST(sum(c) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_unique_texts,
           round(CAST(sum(c - 1) AS DOUBLE) / sum(c), 4) AS dup_rate
    FROM per GROUP BY source
    """,
)
def q_dedup_stats_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup observability per source — doc counts, distinct texts,
    duplicate rate (crawler re-ingest detector)."""
    return text.dedup_stats_by_source(_t(spark, sf_dir, "documents"))


@register(
    "validate_constraints",
    """
    SELECT 'not_null:l_orderkey' AS rule,
           CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS violations
    FROM lineitem
    UNION ALL
    SELECT 'range:l_quantity:[1.0,50.0]',
           CAST(sum(CASE WHEN l_quantity IS NULL
                         OR NOT (l_quantity BETWEEN 1.0 AND 50.0)
                    THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'range:l_discount:[0.0,0.1]',
           CAST(sum(CASE WHEN l_discount IS NULL
                         OR NOT (l_discount BETWEEN 0.0 AND 0.1)
                    THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'unique:l_orderkey,l_linenumber',
           CAST(coalesce(sum(c), 0) AS BIGINT)
    FROM (SELECT count(*) AS c FROM lineitem
          GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1)
    """,
)
def q_validate_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality gate over lineitem: not-null + ranges
    fold into one conditional-aggregate scan; key uniqueness is one
    partial-agg groupBy — the dbt-tests analog, engine-checked."""
    from taxi_trips_etl_spark.dataprep.profile import validate_constraints

    return validate_constraints(
        _t(spark, sf_dir, "lineitem"),
        not_null=["l_orderkey"],
        unique=[["l_orderkey", "l_linenumber"]],
        ranges={"l_quantity": (1.0, 50.0), "l_discount": (0.0, 0.1)},
    )


@register(
    "winnowing_fingerprints",
    """
    WITH t AS (SELECT doc_id, lower(text) AS s FROM documents),
    g AS (SELECT doc_id,
                 list_transform(generate_series(1, length(s) - 8 + 1),
                     i -> CAST(concat('0x', substr(md5(substr(s, i, 8)), 1, 8))
                               AS BIGINT)) AS grams
          FROM t WHERE length(s) - 8 + 1 >= 4),
    m AS (SELECT doc_id,
                 list_distinct(list_transform(
                     generate_series(1, len(grams) - 4 + 1),
                     i -> list_min(grams[i : i + 3]))) AS fps
          FROM g)
    SELECT doc_id, unnest(fps) AS fp FROM m
    """,
)
def q_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS winnowing fingerprints (k=8, w=4): windowed-min k-gram
    hashes — any shared substring of length ≥ 11 chars shares a
    fingerprint; posting-shaped output joins like every dedup op."""
    return text.winnowing_fingerprints(_t(spark, sf_dir, "documents"))


_WINNOW_FP_SQL = """
    WITH t AS (SELECT doc_id, lower(text) AS s FROM documents),
    g AS (SELECT doc_id,
                 list_transform(generate_series(1, length(s) - 8 + 1),
                     i -> CAST(concat('0x', substr(md5(substr(s, i, 8)), 1, 8))
                               AS BIGINT)) AS grams
          FROM t WHERE length(s) - 8 + 1 >= 4),
    m AS (SELECT doc_id,
                 list_distinct(list_transform(
                     generate_series(1, len(grams) - 4 + 1),
                     i -> list_min(grams[i : i + 3]))) AS fps
          FROM g)
    SELECT doc_id, unnest(fps) AS fp FROM m
"""


@register(
    "winnowing_near_dup_pairs",
    f"""
    WITH fps AS ({_WINNOW_FP_SQL})
    SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
           CAST(count(*) AS BIGINT) AS n_shared
    FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2 HAVING count(*) >= 3
    """,
)
def q_winnowing_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial-overlap near-dup pairs via shared winnowing
    fingerprints — catches a copied paragraph inside an otherwise
    different doc, which whole-doc MinHash resemblance misses."""
    return text.winnowing_near_dup_pairs(_t(spark, sf_dir, "documents"))


def _corpus_v2_sql() -> str:
    """End-to-end oracle for the v2 (round-2) corpus pipeline, chained
    from the same per-stage fragments the individual oracles use."""
    c4_keep = f"""
        SELECT doc_id FROM (
            SELECT doc_id,
                   len({TOKS_SQL}) AS n_tokens,
                   CAST(list_sum(list_transform({TOKS_SQL}, w -> length(w)))
                        AS DOUBLE) / len({TOKS_SQL}) AS mean_len,
                   length(text) AS n_chars,
                   length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g'))
                       AS n_weird,
                   list_max(list_transform({TOKS_SQL}, w -> length(w)))
                       AS max_tok
            FROM documents)
        WHERE n_tokens >= 5 AND n_tokens <= 10000
          AND mean_len >= 2 AND mean_len <= 12
          AND n_weird < n_chars * 0.3 AND max_tok <= 40
    """

    def five_gram(src: str) -> str:
        return f"""
        SELECT doc_id, unnest(list_distinct(list_transform(
                   generate_series(1, len({TOKS_SQL}) - 4),
                   i -> concat_ws(' ', {TOKS_SQL}[i], {TOKS_SQL}[i+1],
                                  {TOKS_SQL}[i+2], {TOKS_SQL}[i+3],
                                  {TOKS_SQL}[i+4])))) AS gram
        FROM {src} WHERE len({TOKS_SQL}) >= 5
        """

    return f"""
    WITH gated AS (SELECT d.* FROM documents d JOIN ({c4_keep}) USING (doc_id)),
    scrubbed AS (SELECT doc_id, lang, source, n_chars,
                        {_pii_scrub_sql_expr()} AS text
                 FROM gated),
    canon AS (SELECT min(doc_id) AS doc_id FROM scrubbed GROUP BY md5(text)),
    kept2 AS (SELECT s.* FROM scrubbed s JOIN canon USING (doc_id)
              WHERE doc_id % 20 != 0),
    evald AS (SELECT doc_id, text FROM documents WHERE doc_id % 20 = 0),
    cg AS ({five_gram("kept2")}),
    eg AS ({five_gram("evald")}),
    contaminated AS (SELECT DISTINCT cg.doc_id FROM cg JOIN eg USING (gram)
                     WHERE cg.doc_id != eg.doc_id),
    kept3 AS (SELECT * FROM kept2
              WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)),
    tok0 AS (SELECT unnest({TOKS_SQL}) AS token FROM kept3),
    cnt AS (SELECT token, count(*) AS n FROM tok0 GROUP BY 1),
    vocab AS (SELECT token,
                     CAST(row_number() OVER (ORDER BY n DESC, token ASC) - 1
                          AS BIGINT) AS token_id
              FROM (SELECT token, n FROM cnt
                    ORDER BY n DESC, token ASC LIMIT 500)),
    t AS (SELECT doc_id, {TOKS_SQL} AS toks FROM kept3),
    flat AS (SELECT doc_id,
                    unnest(list_transform(generate_series(1, len(toks)),
                           i -> {{'pos': i, 'tok': toks[i]}})) AS u
             FROM t),
    f AS (SELECT doc_id, u.pos AS pos, u.tok AS token FROM flat),
    j AS (SELECT f.doc_id, f.pos, coalesce(v.token_id, -1) AS tid
          FROM f LEFT JOIN vocab v USING (token)),
    tokd AS (SELECT doc_id,
                    string_agg(CAST(tid AS VARCHAR), ' ' ORDER BY pos)
                        AS token_ids,
                    CAST(count(*) AS BIGINT) AS n_tokens,
                    CAST(sum(CASE WHEN tid = -1 THEN 1 ELSE 0 END) AS BIGINT)
                        AS n_unk
             FROM j GROUP BY doc_id),
    packed AS (SELECT doc_id, n_tokens,
                      CAST(coalesce(SUM(n_tokens) OVER (ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                           0) AS BIGINT) AS start_offset
               FROM tokd)
    SELECT tokd.doc_id, tokd.token_ids, tokd.n_tokens, tokd.n_unk,
           p.start_offset,
           p.start_offset // 128 AS first_seq,
           (p.start_offset + tokd.n_tokens - 1) // 128 AS last_seq,
           (p.start_offset + tokd.n_tokens - 1) // 128
               - p.start_offset // 128 + 1 AS n_seqs,
           CASE WHEN CAST(concat('0x', substr(md5('split:' ||
                    CAST(tokd.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                < {int(0.2 * (1 << 32))}
                THEN 'test' ELSE 'train' END AS split
    FROM tokd JOIN packed p USING (doc_id)
    """


@register("corpus_prepare_v2", _corpus_v2_sql())
def q_corpus_prepare_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-2 composed pipeline: C4 gate → PII scrub → exact dedup →
    decontamination → vocab → tokenize → pack → split, one lazy plan,
    oracle-checked end to end."""
    from taxi_trips_etl_spark.dataprep.corpus import prepare_corpus_v2

    return prepare_corpus_v2(_t(spark, sf_dir, "documents"))


def _zorder_oracle() -> str:
    from taxi_trips_etl_spark.functions.scalar import zorder_key_sql

    zk = zorder_key_sql("(c_custkey % 256)", "c_nationkey", 8, "duckdb")
    return f"SELECT c_custkey, {zk} AS zkey FROM customer"


@register("zorder_key_customers", _zorder_oracle())
def q_zorder_key_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout key: bit-interleave two columns so a
    range sort keeps BOTH columns' row-group stats tight (multi-column
    data skipping). One SQL generator serves Spark and the oracle."""
    from taxi_trips_etl_spark.functions.scalar import zorder_key

    return _t(spark, sf_dir, "customer").select(
        "c_custkey",
        zorder_key("(c_custkey % 256)", "c_nationkey", 8).alias("zkey"),
    )


@register(
    "text_token_stats",
    f"""
    SELECT doc_id,
           CAST(len({TOKS_SQL}) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct({TOKS_SQL})) AS BIGINT) AS n_distinct_tokens,
           round(CAST(list_sum(list_transform({TOKS_SQL}, w -> length(w)))
                      AS DOUBLE) / len({TOKS_SQL}), 4) AS avg_token_len,
           CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_bpe_tokens
    FROM documents
    """,
)
def q_text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.token_stats(_t(spark, sf_dir, "documents"))


_EN_STOP_SQL = "('the', 'a', 'of', 'and', 'is', 'to')"


@register(
    "text_quality_scores",
    f"""
    WITH base AS (
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS n_chars_measured,
               CAST(len({TOKS_SQL}) AS BIGINT) AS n_tokens,
               round(CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                          AS DOUBLE) / length(text), 4) AS alpha_ratio,
               round(CAST(length(regexp_replace(text, '[^ ]', '', 'g'))
                          AS DOUBLE) / length(text), 4) AS space_ratio,
               round(CAST(len(list_filter({TOKS_SQL}, w -> w IN {_EN_STOP_SQL}))
                          AS DOUBLE) / len({TOKS_SQL}), 4) AS stopword_ratio
        FROM documents
    )
    SELECT doc_id, n_chars_measured, n_tokens, alpha_ratio, space_ratio,
           stopword_ratio,
           round(least(1.0, n_tokens / 50.0) * 0.4 + alpha_ratio * 0.4
                 + least(1.0, stopword_ratio * 5) * 0.2, 4) AS quality_score
    FROM base
    """,
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.quality_scores(_t(spark, sf_dir, "documents"))


def _lang_sql() -> str:
    counts = ", ".join(
        f"""CAST(len(list_filter({TOKS_SQL}, w -> w IN
            ({', '.join(repr(w) for w in sw)}))) AS BIGINT) AS n_{lang}"""
        for lang, sw in text.LANG_STOPWORDS.items()
    )
    return f"""
    WITH c AS (SELECT doc_id, {counts} FROM documents)
    SELECT doc_id, n_en, n_de, n_fr, n_es,
           CASE WHEN greatest(n_en, n_de, n_fr, n_es) <= 0 THEN 'und'
                WHEN n_en = greatest(n_en, n_de, n_fr, n_es) THEN 'en'
                WHEN n_de = greatest(n_en, n_de, n_fr, n_es) THEN 'de'
                WHEN n_fr = greatest(n_en, n_de, n_fr, n_es) THEN 'fr'
                ELSE 'es' END AS predicted_lang
    FROM c
    """


@register("text_language_id", _lang_sql())
def q_text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.language_id(_t(spark, sf_dir, "documents"))


@register(
    "text_fingerprints",
    f"""
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct({TOKS_SQL})), ' '))
               AS canon_fingerprint,
           md5(text) AS exact_fingerprint
    FROM documents
    """,
)
def q_text_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.fingerprints(_t(spark, sf_dir, "documents"))


@register(
    "deterministic_sample",
    f"""
    SELECT doc_id, lang, n_chars FROM documents
    WHERE CAST(concat('0x', substr(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 8))
               AS BIGINT) < {int(0.25 * (1 << 32))}
    """,
)
def q_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-hash sampling (~25%): identical membership on any engine,
    partitioning, or rerun — unlike seed-based df.sample()."""
    from taxi_trips_etl_spark.dataprep.sampling import deterministic_sample

    return deterministic_sample(
        _t(spark, sf_dir, "documents"), 0.25, key="doc_id"
    ).select("doc_id", "lang", "n_chars")


@register(
    "train_test_split",
    f"""
    SELECT split, count(*) AS n, min(doc_id) AS min_doc, max(doc_id) AS max_doc
    FROM (SELECT doc_id,
                 CASE WHEN CAST(concat('0x', substr(md5('split:' ||
                          CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                      < {int(0.2 * (1 << 32))}
                      THEN 'test' ELSE 'train' END AS split
          FROM documents)
    GROUP BY 1
    """,
)
def q_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-keyed train/test split: stable under appends, leak-proof
    when keyed on the dedup-canonical id."""
    from taxi_trips_etl_spark.dataprep.sampling import train_test_split

    return (
        train_test_split(_t(spark, sf_dir, "documents"), key="doc_id")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


@register(
    "text_clean",
    """
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                               ' +', ' ', 'g')) AS clean_text,
           CAST(length(trim(regexp_replace(regexp_replace(lower(text),
                '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS BIGINT) AS clean_chars,
           md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                                   ' +', ' ', 'g'))) AS clean_hash
    FROM documents
    """,
)
def q_text_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text normalization (lower, strip non-alnum, collapse spaces)."""
    return text.clean_text(_t(spark, sf_dir, "documents"))


@register(
    "chunk_documents",
    """
    WITH t AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS ws
        FROM documents
    ),
    meta AS (
        SELECT doc_id, ws,
               greatest(1, CAST(ceil((len(ws) - 10) / 40.0) AS BIGINT)) AS n_chunks
        FROM t
    ),
    chunks AS (
        SELECT doc_id, ws, unnest(generate_series(0, n_chunks - 1)) AS chunk_id
        FROM meta
    )
    SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
           array_to_string(ws[chunk_id * 40 + 1 : chunk_id * 40 + 50], ' ')
               AS chunk_text,
           CAST(len(ws[chunk_id * 40 + 1 : chunk_id * 40 + 50]) AS BIGINT)
               AS chunk_tokens
    FROM chunks
    """,
)
def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (50-token chunks, 10 overlap)."""
    return text.chunk_documents(_t(spark, sf_dir, "documents"))


def _corpus_pipeline_sql() -> str:
    """Composite oracle: the whole corpus-prep pipeline as nested SQL
    built from the same per-stage fragments the individual oracles use
    (all-pairs Jaccard is fine at oracle scale)."""
    quality = f"""
        SELECT doc_id FROM (
            SELECT doc_id,
                   round(least(1.0, CAST(len({TOKS_SQL}) AS BIGINT) / 50.0) * 0.4
                         + round(CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                                      AS DOUBLE) / length(text), 4) * 0.4
                         + least(1.0,
                                 round(CAST(len(list_filter({TOKS_SQL},
                                       w -> w IN {_EN_STOP_SQL})) AS DOUBLE)
                                       / len({TOKS_SQL}), 4) * 5) * 0.2,
                         4) AS quality_score
            FROM documents)
        WHERE quality_score >= 0.75
    """
    return f"""
    WITH kept AS (
        SELECT d.* FROM documents d JOIN ({quality}) USING (doc_id)
    ),
    canon AS (
        SELECT min(doc_id) AS doc_id FROM kept GROUP BY md5(text)
    ),
    kept2 AS (SELECT k.* FROM kept k JOIN canon USING (doc_id)),
    g AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   generate_series(1, len(string_split_regex(trim(lower(text)), '\\s+')) - 2),
                   i -> concat_ws(' ',
                        string_split_regex(trim(lower(text)), '\\s+')[i],
                        string_split_regex(trim(lower(text)), '\\s+')[i+1],
                        string_split_regex(trim(lower(text)), '\\s+')[i+2]))) AS grams
        FROM kept2
        WHERE len(string_split_regex(trim(lower(text)), '\\s+')) >= 3
    ),
    gs AS (SELECT doc_id, grams, len(grams) AS n FROM g WHERE len(grams) > 0),
    drops AS (
        SELECT DISTINCT b.doc_id
        FROM gs a JOIN gs b
          ON a.doc_id < b.doc_id
         AND least(a.n, b.n) >= greatest(a.n, b.n) * 0.8
        WHERE round(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                    / len(list_distinct(a.grams || b.grams)), 6) >= 0.8
    ),
    kept3 AS (
        SELECT * FROM kept2 WHERE doc_id NOT IN (SELECT doc_id FROM drops)
    ),
    toks AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS ws FROM kept3
    ),
    meta AS (
        SELECT doc_id, ws,
               greatest(1, CAST(ceil((len(ws) - 10) / 40.0) AS BIGINT)) AS n_chunks
        FROM toks
    ),
    chunks AS (
        SELECT doc_id, unnest(generate_series(0, n_chunks - 1)) AS chunk_id, ws
        FROM meta
    )
    SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
           md5(array_to_string(ws[chunk_id * 40 + 1 : chunk_id * 40 + 50], ' '))
               AS chunk_hash,
           CAST(len(ws[chunk_id * 40 + 1 : chunk_id * 40 + 50]) AS BIGINT)
               AS chunk_tokens,
           CASE WHEN CAST(concat('0x', substr(md5('split:' ||
                    CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                < {int(0.2 * (1 << 32))}
                THEN 'test' ELSE 'train' END AS split
    FROM chunks
    """


@register("corpus_prepare_pipeline", _corpus_pipeline_sql())
def q_corpus_prepare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed LLM corpus-prep pipeline: quality filter → exact
    dedup → Jaccard near-dup removal → chunk → leak-proof split, as one
    lazy plan — oracle-checked end to end."""
    from taxi_trips_etl_spark.dataprep.corpus import prepare_corpus

    return prepare_corpus(_t(spark, sf_dir, "documents"))


@register(
    "text_tfidf_top_terms",
    """
    WITH posting AS (
        SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
        FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM posting GROUP BY 1, 2),
    df_ AS (SELECT term, count(DISTINCT doc_id) AS df FROM posting GROUP BY 1),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
        SELECT doc_id, term, tf,
               round(tf * (ln((n_docs + 1.0) / (df + 1)) + 1), 6) AS tfidf
        FROM tf JOIN df_ USING (term) CROSS JOIN n
    ),
    ranked AS (
        SELECT doc_id, term, tf, tfidf,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY tfidf DESC, term) AS term_rank
        FROM scored
    )
    SELECT doc_id, term, tf, tfidf, CAST(term_rank AS BIGINT) AS term_rank
    FROM ranked WHERE term_rank <= 5
    """,
)
def q_text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed TF-IDF top-5 characteristic terms per document."""
    return text.tf_idf_top_terms(_t(spark, sf_dir, "documents"))


@register(
    "stratified_sample",
    f"""
    SELECT lang, count(*) AS n_sampled, min(doc_id) AS min_doc
    FROM documents
    WHERE CAST(concat('0x', substr(md5('strata:' || CAST(doc_id AS VARCHAR)), 1, 8))
               AS BIGINT)
          < CASE WHEN lang = 'en' THEN {int(0.1 * (1 << 32))}
                 WHEN lang = 'de' THEN {int(0.5 * (1 << 32))}
                 ELSE {int(0.25 * (1 << 32))} END
    GROUP BY 1
    """,
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum hash sampling: downsample dominant 'en' (10%), keep
    half of 'de', quarter of the rest — class rebalancing without RNG."""
    from taxi_trips_etl_spark.dataprep.sampling import stratified_sample

    out = stratified_sample(
        _t(spark, sf_dir, "documents"),
        rates={"en": 0.1, "de": 0.5},
        key="doc_id",
        strata_col="lang",
        default_rate=0.25,
    )
    return out.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_sampled"), F.min("doc_id").alias("min_doc")
    )


# ===========================================================================
# Multimodal plumbing (north-star) — mapInPandas vs pure-SQL oracle
# ===========================================================================


@register(
    "multimodal_meta",
    """
    SELECT doc_id AS media_id, 'text/plain' AS media_type,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           sha256(text) AS sha256,
           CASE WHEN text LIKE 'RIFF%' THEN 'riff'
                WHEN text LIKE 'GIF8%' THEN 'gif'
                ELSE 'unknown' END AS magic
    FROM documents
    """,
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = multimodal.attach_payload(_t(spark, sf_dir, "documents"))
    return multimodal.extract_meta(media)


_FEATURE_COLS_SQL = ",\n           ".join(
    f"CAST(COALESCE(sum(n) FILTER (WHERE bucket = {i}), 0) AS BIGINT) AS c{i}"
    for i in range(16)
)


@register(
    "multimodal_features",
    f"""
    WITH ch AS (SELECT doc_id AS media_id, unnest(string_split(text, '')) AS c
                FROM documents WHERE length(text) > 0),
    p AS (SELECT media_id, ord(c) // 16 AS bucket, count(*) AS n
          FROM ch GROUP BY 1, 2)
    SELECT media_id,
           {_FEATURE_COLS_SQL}
    FROM p GROUP BY media_id
    """,
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload column
    (byte-value histogram, 16 exact integer buckets) — the numpy
    mapInPandas kernel vs a character-codepoint oracle (payloads here
    are utf-8 of ASCII text, so bytes ≡ codepoints; a real image corpus
    would be rows-only)."""
    docs = _t(spark, sf_dir, "documents").filter(F.length("text") > 0)
    return multimodal.extract_features(multimodal.attach_payload(docs))


# ===========================================================================
# Streaming (north-star / README.md:96-98 "instant results" variant)
# ===========================================================================


@register(
    "streaming_daypart_rollup",
    f"""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           {DAYPART_SQL.format(t="strftime(ts, '%H:%M:%S')")} AS daypart,
           event_type,
           count(*) AS event_count,
           round(sum(value), 2) AS total_value
    FROM events GROUP BY 1, 2, 3
    """,
)
def q_streaming_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming job (AvailableNow) whose complete-mode output
    must equal the batch aggregation — the oracle IS that batch query."""
    from taxi_trips_etl_spark.streaming.rollup import run_streaming_daypart_rollup

    return run_streaming_daypart_rollup(
        spark, f"{sf_dir}/events.parquet", sink_table="daypart_rollup_oracle_run"
    )


_EMB_PAIRS_SQL = """
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
               array_to_string(list_transform(embedding[1:6],
                   x -> CASE WHEN x > 0 THEN '1' ELSE '0' END), '') AS bucket
        FROM embeddings
    )
    SELECT vec_id_a, vec_id_b, cosine FROM (
        SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
               round(
                   list_sum(list_transform(generate_series(1, len(a.emb)),
                                           i -> a.emb[i] * b.emb[i]))
                   / (sqrt(list_sum(list_transform(generate_series(1, len(a.emb)),
                                                   i -> a.emb[i] * a.emb[i])))
                      * sqrt(list_sum(list_transform(generate_series(1, len(b.emb)),
                                                     i -> b.emb[i] * b.emb[i])))),
                   6) AS cosine
        FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    ) WHERE cosine >= 0.3
"""


@register(
    "embedding_near_dup",
    _EMB_PAIRS_SQL,
)
def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: sign-LSH bucket candidates + exact
    cosine verify (threshold tuned to the synthetic corpus)."""
    return similarity.embedding_near_dup_pairs(_t(spark, sf_dir, "embeddings"))


@register(
    "similarity_lsh_multiprobe",
    f"""
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
               array_to_string(list_transform(embedding[1:8],
                   x -> CASE WHEN x > 0 THEN '1' ELSE '0' END), '') AS bucket
        FROM embeddings
    ),
    probes AS (
        SELECT vec_id AS query_id, emb AS q_vec,
               unnest([bucket] || list_transform(generate_series(1, 8),
                   i -> substr(bucket, 1, i - 1)
                        || (CASE WHEN substr(bucket, i, 1) = '1'
                                 THEN '0' ELSE '1' END)
                        || substr(bucket, i + 1, 8 - i))) AS probe
        FROM e WHERE vec_id < 10
    ),
    scored AS (
        SELECT p.query_id, b.vec_id AS neighbor_id,
               list_sum(list_transform(generate_series(1, len(p.q_vec)),
                                       i -> p.q_vec[i] * b.emb[i]))
               / (sqrt(list_sum(list_transform(generate_series(1, len(p.q_vec)),
                                               i -> p.q_vec[i] * p.q_vec[i])))
                  * sqrt(list_sum(list_transform(generate_series(1, len(b.emb)),
                                                 i -> b.emb[i] * b.emb[i])))) AS cos
        FROM probes p JOIN e b
          ON p.probe = b.bucket AND p.query_id != b.vec_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, cos,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, neighbor_id) AS knn_rank
        FROM scored
    )
    SELECT query_id, neighbor_id, round(cos, 6) AS cosine,
           CAST(knn_rank AS BIGINT) AS knn_rank
    FROM ranked WHERE knn_rank <= 3
    """,
)
def q_similarity_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe sign-LSH: probe own bucket + all hamming-1 buckets."""
    return similarity.cosine_topk_lsh_multiprobe(_t(spark, sf_dir, "embeddings"))


_IVF_COS = _COS_SQL.replace("a.emb", "{a}").replace("b.emb", "{b}")


@register(
    "similarity_ivf_topk",
    f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
    cents AS (SELECT vec_id AS cent_id, emb AS cent_vec FROM e WHERE vec_id < 8),
    scored_cells AS (
        SELECT a.vec_id, a.emb, cents.cent_id,
               {_IVF_COS.format(a="a.emb", b="cents.cent_vec")} AS ccos
        FROM e a CROSS JOIN cents
    ),
    ranked_cells AS (
        SELECT vec_id, emb, cent_id,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY ccos DESC, cent_id) AS cell_rank
        FROM scored_cells
    ),
    assignment AS (
        SELECT vec_id AS neighbor_id, emb AS c_vec, cent_id
        FROM ranked_cells WHERE cell_rank = 1
    ),
    probes AS (
        SELECT vec_id AS query_id, emb AS q_vec, cent_id
        FROM ranked_cells WHERE vec_id < 10 AND cell_rank <= 2
    ),
    scored AS (
        SELECT p.query_id, a.neighbor_id,
               {_IVF_COS.format(a="p.q_vec", b="a.c_vec")} AS cos
        FROM probes p JOIN assignment a USING (cent_id)
        WHERE p.query_id != a.neighbor_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, cos,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, neighbor_id) AS knn_rank
        FROM scored
    )
    SELECT query_id, neighbor_id, round(cos, 6) AS cosine,
           CAST(knn_rank AS BIGINT) AS knn_rank
    FROM ranked WHERE knn_rank <= 3
    """,
)
def q_similarity_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: sampled-centroid coarse quantizer + nprobe=2 search."""
    return similarity.ivf_topk(_t(spark, sf_dir, "embeddings"))


@register(
    "sql_ordinal_sort",
    """
    SELECT l_returnflag, l_linestatus, count(*) AS n
    FROM lineitem GROUP BY 1, 2 ORDER BY 3 DESC, 1, 2
    """,
)
def q_sql_ordinal_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6: ordinal GROUP BY / ORDER BY through the spark.sql surface
    (spark.sql.orderByOrdinal/groupByOrdinal, default on — the
    reference's `ORDER BY 2 desc` idiom, taxi_trips_etl.py:169)."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("v_lineitem")
    return spark.sql(
        "SELECT l_returnflag, l_linestatus, count(*) AS n "
        "FROM v_lineitem GROUP BY 1, 2 ORDER BY 3 DESC, 1, 2"
    )


@register(
    "sessionize_events",
    """
    WITH o AS (
        SELECT user_id, event_id,
               CAST(floor(epoch(ts)) AS BIGINT) AS sec, ts
        FROM events
    ),
    gaps AS (
        SELECT user_id, event_id, sec, ts,
               CASE WHEN sec - lag(sec) OVER w > 1800
                         OR lag(sec) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM o WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)
    ),
    sessions AS (
        SELECT user_id, event_id, ts,
               sum(new_session) OVER (PARTITION BY user_id
                                      ORDER BY sec, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS session_idx
        FROM gaps
    )
    SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
           count(*) AS n_events,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end
    FROM sessions GROUP BY 1, 2
    """,
)
def q_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via LAG + cumulative SUM windows (30-min gap).

    Covers the window families the reference lacks (lag, running sum
    with an explicit ROWS frame) and is the batch twin of the stateful
    streaming sessionizer. Epoch seconds are truncated identically on
    both engines (cast ≡ floor for positive epochs).
    """
    ev = _events(spark, sf_dir).select(
        "user_id", "event_id", "ts", F.col("ts").cast("long").alias("sec")
    )
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    gaps = ev.withColumn(
        "new_session",
        F.when(
            (F.col("sec") - F.lag("sec").over(w) > 1800)
            | F.lag("sec").over(w).isNull(),
            1,
        ).otherwise(0),
    )
    cum = Window.partitionBy("user_id").orderBy("sec", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sessions = gaps.withColumn("session_idx", F.sum("new_session").over(cum))
    return sessions.groupBy(
        "user_id", F.col("session_idx").cast("long").alias("session_idx")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        _ts_str(F.min("ts"), "session_start"),
        _ts_str(F.max("ts"), "session_end"),
    )


_PROFILE_COLS = ("passenger_count", "trip_distance", "pickup_location_id", "fare_amount")
_PROFILE_ORACLE = " UNION ALL ".join(
    f"""SELECT '{c}' AS column_name, count(*) AS n_rows,
        CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
        count(DISTINCT {c}) AS n_distinct
        FROM ({TRIPS_SQL})"""
    for c in _PROFILE_COLS
)


@register("profile_columns", _PROFILE_ORACLE)
def q_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality profile: per-column nulls + exact distincts in one
    aggregate pass over the (un-normalized) trips table."""
    from taxi_trips_etl_spark.dataprep.profile import profile_table

    trips = trips_from_lineitem(_t(spark, sf_dir, "lineitem"))
    return profile_table(trips, list(_PROFILE_COLS))


@register(
    "asof_join_purchases",
    """
    WITH purchases AS (
        SELECT user_id, ts, max(value) AS purchase_value
        FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    )
    SELECT e.user_id, e.event_id,
           strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS event_ts,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           p.purchase_value
    FROM events e ASOF LEFT JOIN purchases p
      ON e.user_id = p.user_id AND e.ts >= p.ts
    """,
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: every event annotated with the user's most recent
    prior-or-equal purchase (union+window composition vs DuckDB's
    native ASOF LEFT JOIN)."""
    from taxi_trips_etl_spark.operators.asof import asof_join

    ev = _events(spark, sf_dir)
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purchase_value"))
    )
    left = ev.select("user_id", "event_id", "ts")
    out = asof_join(left, purchases, on=["user_id"])
    return out.select(
        "user_id",
        "event_id",
        _ts_str(F.col("ts"), "event_ts"),
        _ts_str(F.col("__asof_ts"), "purchase_ts"),
        "purchase_value",
    )


@register(
    "range_join_windows",
    """
    WITH windows AS (
        SELECT user_id AS w_user, ts AS w_start, ts + INTERVAL 2 HOUR AS w_end
        FROM events WHERE event_type = 'purchase' AND user_id < 10
    )
    SELECT e.event_id, w.w_user,
           strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
           strftime(w.w_start, '%Y-%m-%d %H:%M:%S') AS window_start
    FROM events e JOIN windows w
      ON e.ts >= w.w_start AND e.ts <= w.w_end
    WHERE e.event_type = 'click'
    """,
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join with NO equi key: clicks falling inside any purchase
    window — bucketed equi-join composition vs DuckDB's IEJoin."""
    from taxi_trips_etl_spark.operators.asof import range_join_points

    ev = _events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "ts")
    windows = (
        ev.filter((F.col("event_type") == "purchase") & (F.col("user_id") < 10))
        .select(
            F.col("user_id").alias("w_user"),
            F.col("ts").alias("w_start"),
            F.timestamp_add("HOUR", F.lit(2), F.col("ts")).alias("w_end"),
        )
    )
    out = range_join_points(clicks, windows, "ts", "w_start", "w_end")
    return out.select(
        "event_id",
        "w_user",
        _ts_str(F.col("ts"), "click_ts"),
        _ts_str(F.col("w_start"), "window_start"),
    )


@register(
    "json_extract_props",
    """
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(props ->> 'k' AS BIGINT)) AS BIGINT) AS k_sum,
           CAST(max(CAST(props ->> 'k' AS BIGINT)) AS BIGINT) AS k_max,
           CAST(count(CASE WHEN CAST(props ->> 'k' AS BIGINT) > 50
                           THEN 1 END) AS BIGINT) AS k_over_50
    FROM events GROUP BY 1
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured column path: JSON payload → typed field →
    aggregate (get_json_object stays JVM-side; from_json with an
    explicit schema is the stricter variant for fixed shapes)."""
    ev = _events(spark, sf_dir)
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("k_sum"),
        F.max(k).alias("k_max"),
        F.count(F.when(k > 50, 1)).alias("k_over_50"),
    )


@register(
    "string_functions",
    """
    SELECT p_partkey,
           upper(p_brand) AS brand_upper,
           substr(p_name, 1, 8) AS name_prefix,
           replace(p_type, ' ', '_') AS type_snake,
           CAST(length(p_name) - length(replace(p_name, ' ', '')) + 1 AS BIGINT)
               AS name_words,
           concat(p_brand, '#', CAST(p_size AS VARCHAR)) AS brand_size,
           regexp_extract(p_type, '([A-Z]+)$', 1) AS type_last_word
    FROM part
    """,
)
def q_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function battery (upper/substr/replace/concat/regexp),
    all whole-stage-codegen built-ins."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        (
            F.length("p_name")
            - F.length(F.replace(F.col("p_name"), F.lit(" "), F.lit("")))
            + 1
        ).cast("long").alias("name_words"),
        F.concat(F.col("p_brand"), F.lit("#"), F.col("p_size").cast("string")).alias(
            "brand_size"
        ),
        F.regexp_extract("p_type", r"([A-Z]+)$", 1).alias("type_last_word"),
    )


@register(
    "pivot_event_types",
    """
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS click,
           CAST(count(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS error,
           CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS purchase,
           CAST(count(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS signup,
           CAST(count(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS view
    FROM events GROUP BY 1
    """,
)
def q_pivot_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: long→wide per-day event-type counts. Explicit value list
    keeps it one pass (no distinct-values pre-query) — the scalable form."""
    ev = _events(spark, sf_dir)
    kinds = ["click", "error", "purchase", "signup", "view"]
    out = (
        ev.groupBy(F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"))
        .pivot("event_type", kinds)
        .agg(F.count(F.lit(1)))
    )
    # pivot leaves NULL for empty cells; the oracle's count(CASE) gives 0
    return out.select(
        "day", *[F.coalesce(F.col(k), F.lit(0)).cast("long").alias(k) for k in kinds]
    )


@register(
    "explode_top_tokens",
    f"""
    SELECT tok, count(*) AS n, count(DISTINCT doc_id) AS n_docs
    FROM (SELECT doc_id, unnest({TOKS_SQL}) AS tok FROM documents)
    GROUP BY 1 ORDER BY n DESC, tok LIMIT 50
    """,
)
def q_explode_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explode (lateral view) + aggregate: corpus token frequencies."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.explode(dedup.tokens_col("text")).alias("tok"))
        .groupBy("tok")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.col("n").desc(), "tok")
        .limit(50)
    )


@register(
    "collect_set_agg",
    """
    SELECT user_id,
           array_to_string(list_sort(list_distinct(list(event_type))), ',')
               AS event_types,
           count(*) AS n_events
    FROM events GROUP BY 1
    """,
)
def q_collect_set_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set → sorted → joined: order-insensitive array aggregate
    rendered portably (raw collect_set order is engine/partition-defined,
    so normalize before comparing anything)."""
    return (
        _events(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_set("event_type"))).alias(
                "event_types"
            ),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@register(
    "semi_anti_join",
    """
    SELECT 'has_orders' AS segment, count(*) AS n,
           CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
               AS balance_cents
    FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    UNION ALL
    SELECT 'no_orders' AS segment, count(*) AS n,
           CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
               AS balance_cents
    FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def q_semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI / LEFT ANTI joins (EXISTS / NOT EXISTS): existence
    filtering without fanout — the dedup-free way to segment a fact
    table by presence in another."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("c_acctbal") * 100).cast("long")

    def seg(df: DataFrame, label: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).alias("n"), F.sum(cents).alias("balance_cents")
        ).select(F.lit(label).alias("segment"), "n", "balance_cents")

    semi = c.join(o, c["c_custkey"] == o["o_custkey"], "left_semi")
    anti = c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti")
    return seg(semi, "has_orders").unionByName(seg(anti, "no_orders"))


@register(
    "null_safe_join",
    """
    WITH t AS (SELECT l_orderkey, l_linenumber,
                      nullif(l_discount, 0.0) AS d FROM lineitem)
    SELECT count(*) AS n_pairs
    FROM t a JOIN t b
      ON a.d IS NOT DISTINCT FROM b.d
     AND a.l_orderkey = b.l_orderkey AND a.l_linenumber = b.l_linenumber
    """,
)
def q_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> ≡ IS NOT DISTINCT FROM): NULL keys
    match each other instead of vanishing — self-join here must return
    every row (incl. the NULL-discount ones a plain ``=`` would drop)."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", F.nullif("l_discount", F.lit(0.0)).alias("d")
    )
    a, b = li.alias("a"), li.alias("b")
    return (
        a.join(
            b,
            F.col("a.d").eqNullSafe(F.col("b.d"))
            & (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_linenumber") == F.col("b.l_linenumber")),
        )
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@register(
    "filter_clause_agg",
    """
    SELECT l_returnflag,
           count(*) AS n,
           count(*) FILTER (WHERE l_quantity > 25) AS n_big,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                FILTER (WHERE l_discount > 0.05) AS BIGINT) AS discounted_cents
    FROM lineitem GROUP BY 1
    """,
)
def q_filter_clause_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTER-clause conditional aggregation through the SQL surface."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("v_li_filter")
    return spark.sql(
        """
        SELECT l_returnflag,
               count(*) AS n,
               count(*) FILTER (WHERE l_quantity > 25) AS n_big,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                    FILTER (WHERE l_discount > 0.05) AS BIGINT) AS discounted_cents
        FROM v_li_filter GROUP BY 1
        """
    )


@register(
    "anomaly_zscore_days",
    """
    WITH daily AS (
        SELECT strftime(ts, '%Y-%m-%d') AS d,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1
    ),
    st AS (
        SELECT d, n,
               avg(n) OVER w AS mu,
               stddev_samp(n) OVER w AS sigma,
               count(*) OVER w AS n_base
        FROM daily
        WINDOW w AS (ORDER BY d ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
    )
    SELECT d, n, round(mu, 4) AS trailing_mean,
           round((n - mu) / sigma, 4) AS zscore,
           CAST((n - mu) / sigma > 3.0 OR (n - mu) / sigma < -3.0
                AS BIGINT) AS is_anomaly
    FROM st
    WHERE n_base >= 7 AND sigma > 0
    """,
)
def q_anomaly_zscore_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate-anomaly detection: each day's event count z-scored against
    its OWN trailing 7-day window (current row excluded — yesterday's
    spike must not mask today's). Post-aggregation window: the frame
    runs over ~365 rows/year regardless of event volume, so the global
    sort is safe at any scale; at multi-entity grain add PARTITION BY."""
    ev = _events(spark, sf_dir)
    daily = ev.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("d")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy("d").rowsBetween(-7, -1)
    st = daily.select(
        "d",
        "n",
        F.avg("n").over(w).alias("mu"),
        F.stddev_samp("n").over(w).alias("sigma"),
        F.count(F.lit(1)).over(w).alias("n_base"),
    )
    z = (F.col("n") - F.col("mu")) / F.col("sigma")
    return st.filter((F.col("n_base") >= 7) & (F.col("sigma") > 0)).select(
        "d",
        "n",
        F.round("mu", 4).alias("trailing_mean"),
        F.round(z, 4).alias("zscore"),
        ((z > 3.0) | (z < -3.0)).cast("long").alias("is_anomaly"),
    )


@register(
    "window_moving_sum",
    """
    WITH daily AS (
        SELECT l_suppkey, strftime(l_shipdate, '%Y-%m-%d') AS d,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM lineitem GROUP BY 1, 2
    )
    SELECT l_suppkey, d, cents,
           CAST(sum(cents) OVER (PARTITION BY l_suppkey ORDER BY d
                                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
                AS BIGINT) AS trailing7_cents
    FROM daily
    """,
)
def q_window_moving_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving aggregate with an explicit ROWS frame (trailing-7 revenue
    per supplier) — the running-metric window family."""
    li = _t(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    daily = li.groupBy(
        "l_suppkey", F.date_format("l_shipdate", "yyyy-MM-dd").alias("d")
    ).agg(F.sum(cents).alias("cents"))
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("d")
        .rowsBetween(-6, Window.currentRow)
    )
    return daily.withColumn("trailing7_cents", F.sum("cents").over(w))


@register(
    "window_distribution",
    """
    WITH s AS (SELECT l_suppkey, count(*) AS supp_count FROM lineitem GROUP BY 1)
    SELECT l_suppkey, supp_count,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume
    FROM s WINDOW w AS (ORDER BY supp_count DESC, l_suppkey)
    """,
)
def q_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution windows: ntile / percent_rank / cume_dist over a
    deterministic total order (exact k/n rationals — portable doubles)."""
    s = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("supp_count"))
    )
    w = Window.orderBy(F.col("supp_count").desc(), "l_suppkey")
    return s.select(
        "l_suppkey",
        "supp_count",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@register(
    "window_distribution_approx",
    """
    WITH s AS (SELECT l_suppkey, count(*) AS supp_count FROM lineitem GROUP BY 1),
    b AS (SELECT percentile_disc(0.25) WITHIN GROUP (ORDER BY supp_count) AS b25,
                 percentile_disc(0.50) WITHIN GROUP (ORDER BY supp_count) AS b50,
                 percentile_disc(0.75) WITHIN GROUP (ORDER BY supp_count) AS b75
          FROM s)
    SELECT l_suppkey, supp_count,
           CAST(1 + CASE WHEN supp_count > b25 THEN 1 ELSE 0 END
                  + CASE WHEN supp_count > b50 THEN 1 ELSE 0 END
                  + CASE WHEN supp_count > b75 THEN 1 ELSE 0 END AS BIGINT)
               AS value_quartile
    FROM s, b
    """,
)
def q_window_distribution_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-pass distribution bucketing — the scale swap-in for
    ``window_distribution``'s global ntile.

    The global window needs EVERY supplier in one sorted partition; at
    extreme supplier cardinality that single reducer is the bottleneck.
    This variant computes the three quartile boundaries as an aggregate
    (``percentile_disc`` — exact, and discrete so the integer
    boundaries are engine-portable), ships them back as three literals,
    and assigns value-based quartiles in a narrow whole-stage-codegen
    projection — no global sort, no single-partition exchange. Ties
    share a bucket (value semantics) instead of being row-split the way
    ntile does, which is what you want for distribution analysis. At
    cardinalities where even the exact percentile agg is too heavy,
    swap ``percentile_disc`` for ``percentile_approx`` — same plan
    shape, sketch-mergeable partials.
    """
    s = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("supp_count"))
    )
    b = s.selectExpr(
        "percentile_disc(0.25) WITHIN GROUP (ORDER BY supp_count) AS b25",
        "percentile_disc(0.50) WITHIN GROUP (ORDER BY supp_count) AS b50",
        "percentile_disc(0.75) WITHIN GROUP (ORDER BY supp_count) AS b75",
    ).collect()[0]
    quartile = (
        F.lit(1)
        + F.when(F.col("supp_count") > b["b25"], 1).otherwise(0)
        + F.when(F.col("supp_count") > b["b50"], 1).otherwise(0)
        + F.when(F.col("supp_count") > b["b75"], 1).otherwise(0)
    )
    return s.select(
        "l_suppkey",
        "supp_count",
        quartile.cast("long").alias("value_quartile"),
    )


@register(
    "window_first_last",
    """
    SELECT l_orderkey, l_linenumber,
           first_value(l_quantity) OVER w AS first_qty,
           last_value(l_quantity) OVER (PARTITION BY l_orderkey
                                        ORDER BY l_linenumber, l_quantity
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND UNBOUNDED FOLLOWING) AS last_qty
    FROM lineitem
    WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber, l_quantity)
    """,
)
def q_window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value with the unbounded-following frame gotcha
    (default frame ends at CURRENT ROW — last_value needs the explicit
    full frame)."""
    li = _t(spark, sf_dir, "lineitem")
    # (l_orderkey, l_linenumber) is NOT unique in this data — order by
    # quantity too, so first/last are well-defined on any engine.
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber", "l_quantity")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.first("l_quantity").over(w).alias("first_qty"),
        F.last("l_quantity").over(w_full).alias("last_qty"),
    )


@register(
    "rollup_agg",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
           count(*) AS n,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS price_cents
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (flag → flag+status → grand total) with
    grouping_id disambiguating synthetic NULLs — one pass, Expand-based."""
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    return (
        _t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.sum(cents).alias("price_cents"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "n", "price_cents")
    )


@register(
    "cube_agg",
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
           count(*) AS n
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q_cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 2^k grouping-set combinations in one Expand pass."""
    return (
        _t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.grouping_id().cast("long").alias("gid"), F.count(F.lit(1)).alias("n"))
        .select("o_orderstatus", "o_orderpriority", "gid", "n")
    )


@register(
    "percentiles_exact",
    """
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.25) AS p25,
           quantile_cont(l_quantity, 0.5) AS p50,
           quantile_cont(l_quantity, 0.75) AS p75,
           count(*) AS n
    FROM lineitem GROUP BY 1
    """,
)
def q_percentiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated percentiles per group (Spark
    ``percentile`` ≡ DuckDB ``quantile_cont``). The approx_percentile
    sketch is the swap-in at extreme cardinality."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_quantity, 0.25)").alias("p25"),
            F.expr("percentile(l_quantity, 0.5)").alias("p50"),
            F.expr("percentile(l_quantity, 0.75)").alias("p75"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "set_ops",
    """
    SELECT 'with_orders' AS segment, count(*) AS n FROM (
        SELECT c_custkey FROM customer
        INTERSECT
        SELECT o_custkey FROM orders)
    UNION ALL
    SELECT 'without_orders' AS segment, count(*) AS n FROM (
        SELECT c_custkey FROM customer
        EXCEPT
        SELECT o_custkey FROM orders)
    """,
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT (§2.7 — absent in the reference, part of a
    complete relational surface)."""
    cust = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    ords = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    with_orders = cust.intersect(ords).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("with_orders").alias("segment"), "n"
    )
    without = cust.exceptAll(ords.distinct()).distinct().agg(
        F.count(F.lit(1)).alias("n")
    ).select(F.lit("without_orders").alias("segment"), "n")
    return with_orders.unionByName(without)


_SESSIONIZE_ORACLE = _ORACLES["sessionize_events"]


@register("streaming_sessionize_stateful", _SESSIONIZE_ORACLE)
def q_streaming_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandasWithState gap-sessionizer, run to completion over the
    static events dir. Its append-mode output (closed sessions + the
    timeout flush) must equal the batch LAG/SUM sessionization — so it
    shares that query's oracle: a custom stateful streaming operator
    that is still exactly hash-verified."""
    from taxi_trips_etl_spark.streaming.sessionize import run_streaming_sessionize

    out = run_streaming_sessionize(
        spark, f"{sf_dir}/events.parquet", sink_table="sessions_oracle_run"
    )
    return out.select(
        "user_id",
        "session_idx",
        "n_events",
        _ts_str(F.col("session_start"), "session_start"),
        _ts_str(F.col("session_end"), "session_end"),
    )


@register(
    "streaming_click_attribution",
    """
    SELECT c.user_id, c.event_id AS click_id,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
           p.event_id AS purchase_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND c.ts >= p.ts AND c.ts <= p.ts + INTERVAL 2 HOUR
    """,
)
def q_streaming_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream inner join (clicks × purchases within
    2h, per user); AvailableNow over static data must equal the batch
    join — which IS the oracle."""
    from taxi_trips_etl_spark.streaming.stream_join import (
        run_streaming_click_attribution,
    )

    out = run_streaming_click_attribution(
        spark, f"{sf_dir}/events.parquet", sink_table="click_attr_oracle_run"
    )
    return out.select(
        "user_id",
        "click_id",
        _ts_str(F.col("click_ts"), "click_ts"),
        "purchase_id",
        _ts_str(F.col("purchase_ts"), "purchase_ts"),
    )


_COMPONENTS_SQL = f"""
    WITH RECURSIVE fp AS ({_simhash_fp_sql()}),
    banded AS (
        SELECT doc_id, simhash, b.band_id,
               (simhash >> (b.band_id * 15)) & 32767 AS band_val
        FROM fp, (SELECT unnest(generate_series(0, 3)) AS band_id) b
    ),
    pairs AS (
        SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
        FROM banded a JOIN banded b
          ON a.band_id = b.band_id AND a.band_val = b.band_val
         AND a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    ),
    sym AS (SELECT doc_id_a AS a, doc_id_b AS b FROM pairs
            UNION SELECT doc_id_b, doc_id_a FROM pairs),
    nodes AS (SELECT DISTINCT a AS node FROM sym),
    reach(node, r) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT re.node, s.b FROM reach re JOIN sym s ON re.r = s.a
    )
    SELECT node AS doc_id, min(r) AS component_id FROM reach GROUP BY node
"""


@register("dedup_components", _COMPONENTS_SQL)
def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over SimHash near-dup pairs → canonical
    component id per doc. The iterative star contraction is verified
    EXACTLY against a DuckDB recursive-CTE transitive closure (min
    reachable id per node) — feasible because near-dup components are
    small; chain/clique correctness and min-label≡star equality are
    additionally pytest-verified.

    Routed via connected_components_auto — the production posture:
    near-dup pair graphs are corpus-tiny (hundreds of edges here, ≪
    the corpus at any scale), so below the edge cap the identical
    union-find runs driver-side in milliseconds instead of paying
    per-round Spark job overhead; past the cap it escalates to star
    contraction (O(log n) rounds, depth-proof; measured ~25% faster
    than min-label at sf0.1). Driver ≡ star ≡ min-label is
    pytest-pinned, so the oracle covers every path."""
    from taxi_trips_etl_spark.dataprep.components import (
        connected_components_auto,
    )

    pairs = dedup.simhash_near_duplicates(_t(spark, sf_dir, "documents"))
    return connected_components_auto(pairs)


def _random_projection_oracle() -> str:
    from taxi_trips_etl_spark.dataprep.similarity import random_projection_sql

    exprs = random_projection_sql(64, 16, dialect="duckdb")
    cols = ",\n           ".join(
        f"round({e}, 6) AS rp_{j}" for j, e in enumerate(exprs)
    )
    return f"SELECT vec_id,\n           {cols}\nFROM embeddings"


@register("embedding_random_projection", _random_projection_oracle())
def q_embedding_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss projection 64→16 dims (deterministic
    Achlioptas ±1 signs, one shared expression generator for Spark and
    the oracle) — the scan-shrinking preprocessor for ANN/dedup."""
    from taxi_trips_etl_spark.dataprep.similarity import random_projection

    return random_projection(
        _t(spark, sf_dir, "embeddings"), in_dim=64, out_dim=16
    )


@register("similarity_pq_topk")  # rows-only: numpy codebook training
def q_similarity_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-Quantization ANN: 8-byte codes + ADC lookup scoring —
    the compressed-scan ANN shape for 100 TB corpora. Codebooks train
    on a deterministic sample (driver numpy Lloyd's), hence no SQL
    oracle; recall and Spark≡numpy ADC equality are pytest-verified."""
    from taxi_trips_etl_spark.dataprep.similarity import pq_topk

    return pq_topk(
        _t(spark, sf_dir, "embeddings"), m=8, ksub=16, k=3, query_ids_below=5
    )


# Lloyd's unrolled in DuckDB CTEs: the Spark side's fixed init (k
# lowest-id vectors) + fixed 3 iterations make the whole trajectory
# deterministic, so the oracle replays it — init c0, three
# assign/update rounds, final assignment, summary. Floating-point
# accumulation order differs (DuckDB avg vs Spark partial sums), but
# the synthetic blobs are well-separated so argmin assignments agree
# and the rounded inertia absorbs the ~1e-12 noise.
_KM_DIST = (
    "list_sum(list_transform(generate_series(1, len(v)),"
    " i -> (v[i] - c[i]) * (v[i] - c[i])))"
)


def _km_assign(prev: str) -> str:
    return f"""
  SELECT vec_id, cluster_id, d FROM (
    SELECT vec_id, cluster_id, d,
           row_number() OVER (PARTITION BY vec_id ORDER BY d, cluster_id) AS rn
    FROM (
      SELECT vecs.vec_id, {prev}.cluster_id, {_KM_DIST} AS d
      FROM vecs CROSS JOIN {prev}
    )
  ) WHERE rn = 1
"""


def _km_update(assign: str, prev: str) -> str:
    return f"""
  SELECT {prev}.cluster_id, coalesce(m.c, {prev}.c) AS c
  FROM {prev} LEFT JOIN (
    SELECT cluster_id, list(mi ORDER BY i) AS c FROM (
      SELECT cluster_id, i, avg(x) AS mi FROM (
        SELECT a.cluster_id,
               unnest(generate_series(1, len(v))) AS i,
               unnest(v) AS x
        FROM {assign} a JOIN vecs USING (vec_id)
      ) GROUP BY cluster_id, i
    ) GROUP BY cluster_id
  ) m USING (cluster_id)
"""


KMEANS_ORACLE_SQL = f"""
WITH vecs AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
c0 AS (
  SELECT (row_number() OVER (ORDER BY vec_id)) - 1 AS cluster_id, v AS c
  FROM (SELECT vec_id, v FROM vecs ORDER BY vec_id LIMIT 8)
),
a1 AS ({_km_assign('c0')}),
c1 AS ({_km_update('a1', 'c0')}),
a2 AS ({_km_assign('c1')}),
c2 AS ({_km_update('a2', 'c1')}),
a3 AS ({_km_assign('c2')}),
c3 AS ({_km_update('a3', 'c2')}),
afinal AS ({_km_assign('c3')})
SELECT CAST(cluster_id AS BIGINT) AS cluster_id,
       count(*) AS n_vectors,
       round(sum(round(d, 6)), 4) AS inertia
FROM afinal GROUP BY cluster_id
"""


@register("embedding_kmeans", KMEANS_ORACLE_SQL)
def q_embedding_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic DataFrame k-means over the embeddings table —
    per-cluster sizes + inertia. Iterative (Lloyd's, 3 rounds); the
    fixed init (k lowest-id vectors) makes the trajectory replayable,
    so the oracle unrolls the same three Lloyd iterations in DuckDB
    CTEs (KMEANS_ORACLE_SQL above) and checks the final summary."""
    from taxi_trips_etl_spark.dataprep.clustering import (
        cluster_summary,
        kmeans_assign,
    )

    emb = _t(spark, sf_dir, "embeddings")
    return cluster_summary(kmeans_assign(emb, k=8, iterations=3))


@register(
    "topk_per_group",
    """
    SELECT nation_key, l_partkey, revenue_cp, part_rank
    FROM (
        SELECT s_nationkey AS nation_key, l_partkey,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                    AS BIGINT) AS revenue_cp,
               CAST(row_number() OVER (
                   PARTITION BY s_nationkey
                   ORDER BY sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                               * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                            DESC, l_partkey) AS BIGINT) AS part_rank
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY s_nationkey, l_partkey
    ) WHERE part_rank <= 3
    """,
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 parts per nation by discounted revenue: broadcast-dim join →
    partial+final hash agg → per-group row_number → rank filter. The
    per-group-top-k idiom (vs the reference's global top-100,
    taxi_trips_etl.py:169): the window runs over the *aggregated* rows
    (≈ nations × parts), never the fact table, so the sort state per
    partition stays tiny at any scale. Revenue is exact integer
    cent·percent units (no float sums — see module docstring)."""
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    rev = (
        F.round(F.col("l_extendedprice") * 100).cast("long")
        * (F.lit(100) - F.round(F.col("l_discount") * 100).cast("long"))
    )
    agg = (
        li.join(F.broadcast(sup), li["l_suppkey"] == sup["s_suppkey"])
        .groupBy(F.col("s_nationkey").alias("nation_key"), "l_partkey")
        .agg(F.sum(rev).cast("long").alias("revenue_cp"))
    )
    w = Window.partitionBy("nation_key").orderBy(
        F.col("revenue_cp").desc(), F.col("l_partkey")
    )
    return (
        agg.withColumn("part_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("part_rank") <= 3)
        .select("nation_key", "l_partkey", "revenue_cp", "part_rank")
    )


@register(
    "hopping_window_counts",
    """
    SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, count(*) AS n_events,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
    FROM (
        SELECT time_bucket(INTERVAL '30 minutes', ts) AS window_start,
               event_type, value FROM events
        UNION ALL
        SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes',
               event_type, value FROM events
    )
    GROUP BY window_start, event_type
    """,
)
def q_hopping_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch hopping-window aggregation (1h windows sliding every 30min)
    via ``F.window`` — the batch twin of the streaming rollup. Each
    event lands in exactly size/slide = 2 windows; Spark expands them
    JVM-side before the hash agg (no Python, no explode of user data).
    Oracle: union of the two 30-min-grid buckets each event covers
    (both engines' grids are epoch-aligned, so buckets coincide)."""
    ev = _events(spark, sf_dir)
    win = F.window("ts", "1 hour", "30 minutes")
    return (
        ev.groupBy(win.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("value_cents"),
        )
        .select(
            _ts_str(F.col("w.start"), "window_start"),
            "event_type",
            "n_events",
            "value_cents",
        )
    )


@register(
    "latest_by_key",
    """
    SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts
    FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                       ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
    WHERE rn = 1
    """,
)
def q_latest_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest record per key via ``max_by`` over a (ts, event_id) struct:
    a single hash aggregation with partial (map-side) combine. At scale
    this beats the window row_number=1 idiom (which the oracle uses, as
    the SQL statement of the same semantics): no per-partition sort, no
    full-row shuffle — only one candidate row per key per map task
    crosses the wire. event_id breaks ts ties deterministically."""
    ev = _events(spark, sf_dir)
    picked = F.max_by(
        F.struct("event_id", "event_type", "ts"),
        F.struct("ts", "event_id"),
    ).alias("last")
    return (
        ev.groupBy("user_id")
        .agg(picked)
        .select(
            "user_id",
            F.col("last.event_id").alias("last_event_id"),
            F.col("last.event_type").alias("last_event_type"),
            _ts_str(F.col("last.ts"), "last_ts"),
        )
    )


@register(
    "date_functions",
    """
    SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
           strftime(date_trunc('month', o_orderdate) + INTERVAL '1 month',
                    '%Y-%m-%d') AS next_month_start,
           CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
           count(*) AS n_orders,
           CAST(count(DISTINCT isodow(o_orderdate)) AS BIGINT) AS n_weekdays
    FROM orders
    GROUP BY 1, 2, 3, 4
    """,
)
def q_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-function battery (F9-adjacent): date_trunc / last_day /
    add_months / quarter / ISO weekday, aggregated per month. All
    JVM-side built-ins; dates render as yyyy-MM-dd strings so both
    engines hash identical values. Spark ``weekday`` is Monday=0, DuckDB
    ``isodow`` Monday=1 — hence the +1."""
    o = _t(spark, sf_dir, "orders")
    month = F.date_trunc("month", F.col("o_orderdate"))
    return (
        o.groupBy(
            F.date_format(month, "yyyy-MM-dd").alias("month_start"),
            F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias(
                "month_end"
            ),
            F.date_format(F.add_months(month, 1), "yyyy-MM-dd").alias(
                "next_month_start"
            ),
            F.quarter("o_orderdate").cast("long").alias("qtr"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct(F.weekday("o_orderdate") + F.lit(1))
            .cast("long")
            .alias("n_weekdays"),
        )
    )


@register(
    "grouping_sets_agg",
    """
    SELECT coalesce(o_orderpriority, 'ALL') AS priority,
           coalesce(o_orderstatus, 'ALL') AS status,
           CAST(grouping(o_orderpriority) * 2 + grouping(o_orderstatus)
                AS BIGINT) AS gid,
           count(*) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS total_cents
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus),
                            (o_orderpriority, o_orderstatus), ())
    """,
)
def q_grouping_sets_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS (beyond the rollup/cube entries): four
    explicit sets in ONE Expand+hash-agg pass — at scale this reads the
    fact table once instead of unioning four separate aggregations.
    grouping() markers disambiguate 'ALL' labels from real values."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("v_orders_gs")
    return spark.sql(
        """
        SELECT coalesce(o_orderpriority, 'ALL') AS priority,
               coalesce(o_orderstatus, 'ALL') AS status,
               CAST(grouping(o_orderpriority) * 2 + grouping(o_orderstatus)
                    AS BIGINT) AS gid,
               count(*) AS n_orders,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS total_cents
        FROM v_orders_gs
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus),
                                (o_orderpriority, o_orderstatus), ())
        """
    )


@register(
    "correlated_scalar_subquery",
    """
    SELECT o_orderkey, o_custkey,
           CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
    FROM orders o
    WHERE o_totalprice = (SELECT max(o2.o_totalprice) FROM orders o2
                          WHERE o2.o_custkey = o.o_custkey)
    """,
)
def q_correlated_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (each order compared to its customer's
    own maximum). Catalyst de-correlates this into an aggregate + join —
    the physical plan is one extra hash agg on (custkey, max), never a
    per-row re-scan, so the idiom is safe on an arbitrarily large fact
    table. Ties (two max-price orders for one customer) are all kept —
    deterministic without a limit."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("v_orders_corr")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey,
               CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
        FROM v_orders_corr o
        WHERE o_totalprice = (SELECT max(o2.o_totalprice) FROM v_orders_corr o2
                              WHERE o2.o_custkey = o.o_custkey)
        """
    )


@register(
    "recursive_cte_date_spine",
    """
    WITH RECURSIVE months(m, stop) AS (
        SELECT date_trunc('month', max(o_orderdate)) - INTERVAL '11 months',
               date_trunc('month', max(o_orderdate))
        FROM orders
        UNION ALL
        SELECT m + INTERVAL '1 month', stop FROM months WHERE m < stop
    )
    SELECT strftime(m, '%Y-%m-%d') AS month_start,
           coalesce(n_orders, 0) AS n_orders
    FROM months
    LEFT JOIN (SELECT date_trunc('month', o_orderdate) AS om,
                      count(*) AS n_orders
               FROM orders GROUP BY 1) o ON om = m
    """,
)
def q_recursive_cte_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE date spine (Spark 4 recursive CTE): generate the
    12 months ending at the newest order date, then left-join monthly
    counts so empty months surface as 0 — the standard gap-filling
    pattern for time series. The recursion is bounded (12 driver-side
    iterations carrying the stop bound along, clear of the default
    100-level recursion limit regardless of data span); the fact table
    is aggregated exactly once."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("v_orders_spine")
    return spark.sql(
        """
        WITH RECURSIVE months(m, stop) AS (
            SELECT date_trunc('month', max(o_orderdate)) - INTERVAL '11' MONTH,
                   date_trunc('month', max(o_orderdate))
            FROM v_orders_spine
            UNION ALL
            SELECT m + INTERVAL '1' MONTH, stop FROM months WHERE m < stop
        )
        SELECT date_format(m, 'yyyy-MM-dd') AS month_start,
               coalesce(n_orders, CAST(0 AS BIGINT)) AS n_orders
        FROM months
        LEFT JOIN (SELECT date_trunc('month', o_orderdate) AS om,
                          count(*) AS n_orders
                   FROM v_orders_spine GROUP BY 1) o ON om = m
        """
    )


@register(
    "udtf_split_sentences",
    """
    WITH toks AS (
      SELECT doc_id,
             list_filter(list_transform(string_split_regex(text, '[.!?]'),
                                        s -> trim(s, ' ' || chr(9) || chr(10)
                                                       || chr(13))),
                         s -> s != '') AS sents
      FROM documents
    )
    SELECT doc_id, CAST(s.i - 1 AS BIGINT) AS sent_idx, s.x AS sentence
    FROM (SELECT doc_id,
                 unnest(list_transform(sents,
                        (x, i) -> struct_pack(x := x, i := i))) AS s
          FROM toks)
    """,
)
def q_udtf_split_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4 table function) + LATERAL join: one input
    row → N output rows, the table-function analogue of the two scalar
    UDFs. UDTFs are Python-slow-path, so this belongs on *document*
    grain (the row-multiplying parse), never on the fact table — the
    same placement rule as the geo UDFs. The pytest covers multi-
    sentence splitting; this table is single-sentence so the oracle
    pins the pass-through shape."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="sentence: string, sent_idx: bigint")
    class SplitSentences:
        def eval(self, text: str):  # noqa: ANN001 — UDTF protocol
            if text is None:
                return
            import re

            parts = [p.strip(" \t\n\r") for p in re.split(r"[.!?]", text)]
            for i, p in enumerate(s for s in parts if s):
                yield p, i

    spark.udtf.register("split_sentences", SplitSentences)
    _t(spark, sf_dir, "documents").createOrReplaceTempView("v_docs_udtf")
    return spark.sql(
        """
        SELECT doc_id, s.sent_idx, s.sentence
        FROM v_docs_udtf, LATERAL split_sentences(text) s
        """
    )


@register(
    "array_functions",
    """
    SELECT vec_id,
           round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))),
                 6) AS elem_sum,
           CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
           CAST(list_max(embedding) AS DOUBLE) AS max_elem,
           CAST(list_position(embedding, list_max(embedding)) AS BIGINT)
               AS argmax_pos
    FROM embeddings
    """,
)
def q_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array battery over the embedding column — transform
    / filter / aggregate / array_max / array_position, all JVM-side
    lambdas (no Python, no explode: the 64-float array never leaves the
    row). Elements are cast to double *before* the fold so both engines
    run the identical left-to-right IEEE sum; the one float-accumulated
    output is rounded to 6 places per the similarity-family convention."""
    emb = _t(spark, sf_dir, "embeddings")
    as_double = F.expr("transform(embedding, x -> cast(x as double))")
    return emb.select(
        "vec_id",
        F.round(
            F.aggregate(as_double, F.lit(0.0), lambda a, x: a + x), 6
        ).alias("elem_sum"),
        F.expr("cast(size(filter(embedding, x -> x > 0)) as bigint)").alias(
            "n_pos"
        ),
        F.expr("cast(array_max(embedding) as double)").alias("max_elem"),
        F.expr(
            "cast(array_position(embedding, array_max(embedding)) as bigint)"
        ).alias("argmax_pos"),
    )


@register(
    "variant_json_shred",
    """
    SELECT event_type, count(*) AS n_events,
           CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
               AS k_sum,
           CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
               AS k_max
    FROM events GROUP BY event_type
    """,
)
def q_variant_json_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured shredding through VariantType (Spark 4):
    parse_json once per row into a variant, then typed variant_get
    extraction — the open-schema path for ingesting JSON whose shape
    isn't known at write time (vs get_json_object's per-field string
    re-parse in the json_extract_props entry). Aggregates stay exact
    (integer k)."""
    _events(spark, sf_dir).createOrReplaceTempView("v_events_variant")
    return spark.sql(
        """
        SELECT event_type, count(*) AS n_events,
               sum(variant_get(parse_json(props), '$.k', 'long')) AS k_sum,
               max(variant_get(parse_json(props), '$.k', 'long')) AS k_max
        FROM v_events_variant GROUP BY event_type
        """
    )


@register(
    "lag_lead_order_gaps",
    """
    WITH o AS (
        SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS od,
               lag(CAST(o_orderdate AS DATE)) OVER w AS prev_date,
               lead(CAST(o_orderdate AS DATE)) OVER w AS next_date
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE),
                     o_orderkey)
    )
    SELECT o_custkey, o_orderkey, strftime(od, '%Y-%m-%d') AS order_date,
           CAST(date_diff('day', prev_date, od) AS BIGINT) AS days_since_prev,
           CAST(date_diff('day', od, next_date) AS BIGINT) AS days_until_next
    FROM o
    """,
)
def q_lag_lead_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead inter-event deltas (days between a customer's consecutive
    orders) — the purchase-recency / inter-arrival-time window family.
    One shuffle on o_custkey serves both offsets; NULL at each edge."""
    od = F.to_date("o_orderdate")
    w = Window.partitionBy("o_custkey").orderBy(od, "o_orderkey")
    return _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.date_format(od, "yyyy-MM-dd").alias("order_date"),
        F.datediff(od, F.lag(od).over(w)).cast("long").alias("days_since_prev"),
        F.datediff(F.lead(od).over(w), od).cast("long").alias("days_until_next"),
    )


@register(
    "numeric_histogram",
    """
    SELECT CAST(floor(o_totalprice / 25000.0) AS BIGINT) AS bin_id,
           CAST(floor(o_totalprice / 25000.0) AS BIGINT) * 25000.0 AS bin_lo,
           count(*) AS n,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS total_cents
    FROM orders GROUP BY 1
    """,
)
def q_numeric_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram binning (floor-divide → groupBy) — the
    distribution-profiling primitive. The bin id is computed with one
    IEEE divide+floor on identical operands, so it is engine-portable;
    map-side partial aggregation makes this one narrow shuffle of at
    most n_bins rows per partition regardless of input size."""
    o = _t(spark, sf_dir, "orders")
    bin_id = F.floor(F.col("o_totalprice") / F.lit(25000.0)).cast("long")
    return (
        o.groupBy(bin_id.alias("bin_id"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "total_cents"
            ),
        )
        .select(
            "bin_id",
            (F.col("bin_id") * F.lit(25000.0)).alias("bin_lo"),
            "n",
            "total_cents",
        )
    )


@register(
    "iqr_outliers",
    """
    WITH q AS (
        SELECT o_orderpriority,
               quantile_disc(o_totalprice, 0.25) AS q1,
               quantile_disc(o_totalprice, 0.75) AS q3
        FROM orders GROUP BY 1
    )
    SELECT o.o_orderpriority, count(*) AS n,
           CAST(sum(CASE WHEN o_totalprice < q1 - 1.5 * (q3 - q1)
                           OR o_totalprice > q3 + 1.5 * (q3 - q1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           min(q1) AS q1, min(q3) AS q3
    FROM orders o JOIN q USING (o_orderpriority)
    GROUP BY 1
    """,
)
def q_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier detection per group: discrete quartiles
    (percentile_disc picks an actual element — bit-identical across
    engines, unlike interpolated quantiles), fences in plain IEEE
    arithmetic, then a broadcast join back to the fact and a counting
    aggregate. The per-group quartile table is tiny (one row per group),
    so the fact table is scanned exactly twice with no wide shuffle."""
    o = _t(spark, sf_dir, "orders")
    o.createOrReplaceTempView("v_orders_iqr")
    q = spark.sql(
        """
        SELECT o_orderpriority,
               percentile_disc(0.25) WITHIN GROUP (ORDER BY o_totalprice) AS q1,
               percentile_disc(0.75) WITHIN GROUP (ORDER BY o_totalprice) AS q3
        FROM v_orders_iqr GROUP BY o_orderpriority
        """
    )
    lo = F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))
    hi = F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))
    is_out = (F.col("o_totalprice") < lo) | (F.col("o_totalprice") > hi)
    return (
        o.join(F.broadcast(q), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(is_out.cast("long")).alias("n_outliers"),
            F.min("q1").alias("q1"),
            F.min("q3").alias("q3"),
        )
    )


def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention-cohort matrix: users grouped by first-activity
    week; each cell counts cohort members active N weeks later.

    Two partial-agg passes: (user → cohort week) is one groupBy-min;
    activity distinct-collapses to (user, week) BEFORE the join, so
    the cohort join fans out on weeks-per-user (bounded), never raw
    events. All shuffles key on user_id."""
    ev = _events(spark, sf_dir).select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("week")
    )
    cohort = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    active = ev.distinct()
    return (
        active.join(cohort, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(F.col("week"), F.col("cohort_week")) / 7
            ).cast("long").alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("user_id").alias("n_users"))
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
            F.col("n_users").cast("long"),
        )
    )


register(
    "retention_cohorts",
    """
    WITH ev AS (SELECT user_id, date_trunc('week', ts) AS week FROM events),
    cohort AS (SELECT user_id, min(week) AS cohort_week FROM ev GROUP BY 1),
    active AS (SELECT DISTINCT user_id, week FROM ev)
    SELECT strftime(c.cohort_week, '%Y-%m-%d') AS cohort_week,
           CAST(date_diff('day', c.cohort_week, a.week) / 7 AS BIGINT)
               AS week_offset,
           CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
    FROM active a JOIN cohort c USING (user_id)
    GROUP BY 1, 2
    """,
)(q_retention_cohorts)


@register(
    "funnel_conversion",
    """
    WITH v AS (
        SELECT user_id, min(ts) AS t_view FROM events
        WHERE event_type = 'view' GROUP BY 1
    ),
    c AS (
        SELECT e.user_id, min(e.ts) AS t_click
        FROM events e JOIN v USING (user_id)
        WHERE e.event_type = 'click' AND e.ts > v.t_view GROUP BY 1
    ),
    p AS (
        SELECT e.user_id, min(e.ts) AS t_purchase
        FROM events e JOIN c USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts > c.t_click GROUP BY 1
    )
    SELECT 'view' AS funnel_stage, count(*) AS n_users FROM v
    UNION ALL
    SELECT 'view_click', count(*) FROM c
    UNION ALL
    SELECT 'view_click_purchase', count(*) FROM p
    """,
)
def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-step funnel analysis (view → click → purchase): each
    stage is the earliest qualifying event strictly after the previous
    stage's timestamp. Three min-aggregates and two equi-joins on
    user_id — every shuffle is on the same key, so with AQE the
    exchanges reuse one partitioning; no window sort over raw events."""
    ev = _events(spark, sf_dir)

    def stage(etype: str, prev: DataFrame | None, prev_ts: str, out: str) -> DataFrame:
        s = ev.filter(F.col("event_type") == etype)
        if prev is not None:
            s = s.join(prev, "user_id").filter(F.col("ts") > F.col(prev_ts))
        return s.groupBy("user_id").agg(F.min("ts").alias(out))

    v = stage("view", None, "", "t_view")
    c = stage("click", v, "t_view", "t_click")
    p = stage("purchase", c, "t_click", "t_purchase")
    counts = [
        v.agg(F.lit("view").alias("funnel_stage"), F.count(F.lit(1)).alias("n_users")),
        c.agg(F.lit("view_click").alias("funnel_stage"), F.count(F.lit(1)).alias("n_users")),
        p.agg(
            F.lit("view_click_purchase").alias("funnel_stage"),
            F.count(F.lit(1)).alias("n_users"),
        ),
    ]
    out = counts[0]
    for nxt in counts[1:]:
        out = out.unionByName(nxt)
    return out


@register(
    "activity_streaks",
    """
    WITH days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    isl AS (
        SELECT user_id, d,
               d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
                        AS BIGINT) * INTERVAL 1 DAY AS anchor
        FROM days
    ),
    streaks AS (
        SELECT user_id, anchor, count(*) AS streak_len
        FROM isl GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(max(streak_len) AS BIGINT) AS longest_streak,
           CAST(sum(streak_len) AS BIGINT) AS n_active_days,
           count(*) AS n_streaks
    FROM streaks GROUP BY 1
    """,
)
def q_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: longest consecutive-day activity streak per
    user via the date-minus-row_number anchor trick. The distinct
    collapses raw events to at most (users × days) rows BEFORE the
    window sort, so the expensive ordered pass runs on the reduced set."""
    ev = _events(spark, sf_dir)
    days = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    isl = days.withColumn(
        "anchor", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    streaks = isl.groupBy("user_id", "anchor").agg(
        F.count(F.lit(1)).alias("streak_len")
    )
    return streaks.groupBy("user_id").agg(
        F.max("streak_len").alias("longest_streak"),
        F.sum("streak_len").alias("n_active_days"),
        F.count(F.lit(1)).alias("n_streaks"),
    )


# ===========================================================================
# Flagship (geo-UDF path — not SQL-expressible, driver does rows-only)
# ===========================================================================


@register("flagship_most_populars")  # no oracle: hex cells come from UDFs
def q_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    from taxi_trips_etl_spark.plans.pipeline import run_taxi_pipeline

    df = run_taxi_pipeline(spark, sf_dir)
    assert df is not None
    return df.select(
        F.col("popularity").cast("long").alias("popularity"),
        F.col("route.pickup_hexagons").alias("route_pickup_hex"),
        F.col("route.dropoff_hexagons").alias("route_dropoff_hex"),
        "route_count",
        "dropoff_hexagon",
        "dropoff_count",
        "pickup_hexagon",
        "pickup_count",
    )


# ===========================================================================
# TPC-H derived batch (beyond-reference relational coverage).
#
# The testdata is TPC-H-ish but misses some spec columns
# (l_commitdate/l_receiptdate/l_shipmode, partsupp, c_phone), so each
# query keeps the SPEC'S PLAN SHAPE (the join graph, the agg, the
# correlation) while adapting predicates to the columns that exist.
# Money follows the repo rule: round to integer units per row BEFORE
# summing (double sums are partition-order-dependent; integer sums are
# exact and portable across engines).
# ===========================================================================

_REV_E4 = "CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)"


@register(
    "tpch_order_priority",
    """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_tpch_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS decorrelates to a LEFT SEMI join on
    l_orderkey (lineitem never widens the orders rows), then a 5-group
    partial-agg. The spec's commit<receipt lateness test is adapted to
    shipped->30-days-after-order (those columns don't exist here); the
    semi-join + tiny-agg plan is identical."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (li["l_orderkey"] == o["o_orderkey"])
        & (li["l_shipdate"] > o["o_orderdate"] + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "tpch_local_supplier_volume",
    f"""
    SELECT n_name, CAST(sum({_REV_E4}) AS BIGINT) AS revenue_e4
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue_e4 DESC, n_name
    """,
)
def q_tpch_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: the region->nation chain broadcasts (tiny) and
    prunes supplier BEFORE the fact joins; lineitem then joins orders
    on l_orderkey (the one big shuffle) and the c_nationkey=s_nationkey
    'local' correlation rides the customer join as an extra equi-key.
    Output is <=25 rows no matter the input size."""
    n = (
        _t(spark, sf_dir, "nation")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    rev = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("long")
    return (
        li.join(o.select("o_orderkey", "o_custkey"),
                li["l_orderkey"] == F.col("o_orderkey"))
        .join(F.broadcast(s), li["l_suppkey"] == F.col("s_suppkey"))
        .join(
            c,
            (F.col("o_custkey") == c["c_custkey"])
            & (F.col("s_nationkey") == c["c_nationkey"]),
        )
        .groupBy("n_name")
        .agg(F.sum(rev).alias("revenue_e4"))
        .orderBy(F.desc("revenue_e4"), F.asc("n_name"))
    )


@register(
    "tpch_forecast_revenue",
    """
    SELECT CAST(sum(CAST(round(l_extendedprice * l_discount * 10000)
                         AS BIGINT)) AS BIGINT) AS revenue_e4,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.02 AND 0.04
      AND l_quantity < 24
    """,
)
def q_tpch_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-side predicate (all three filters push
    to parquet row-group stats) feeding a single global agg — zero
    joins, one 2-column exchange of partial sums. The canonical
    'is the filter actually pushed down' probe."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.02)
        & (F.col("l_discount") <= 0.04)
        & (F.col("l_quantity") < 24)
    )
    rev = F.round(
        F.col("l_extendedprice") * F.col("l_discount") * 10000
    ).cast("long")
    return li.agg(
        F.sum(rev).alias("revenue_e4"), F.count(F.lit(1)).alias("n_lines")
    )


@register(
    "tpch_volume_shipping",
    f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
           CAST(sum({_REV_E4}) AS BIGINT) AS revenue_e4
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
    JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
    WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q_tpch_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: two aliased broadcasts of the SAME tiny nation
    dim (supplier-side and customer-side roles), the disjunctive
    nation-pair predicate evaluated after both joins, and a
    (nation,nation,year) partial-agg. The supplier dim is nation-pruned
    before touching the fact table."""
    sn = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    ).filter(F.col("supp_nation").isin("NATION_1", "NATION_2"))
    cn = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("cust_nation").isin("NATION_1", "NATION_2"))
    s = _t(spark, sf_dir, "supplier").join(
        F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key")
    ).select("s_suppkey", "supp_nation")
    c = _t(spark, sf_dir, "customer").join(
        F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key")
    ).select("c_custkey", "cust_nation")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_suppkey", "l_shipdate",
             "l_extendedprice", "l_discount")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    rev = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("long")
    return (
        li.join(F.broadcast(s), li["l_suppkey"] == F.col("s_suppkey"))
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.sum(rev).alias("revenue_e4"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "tpch_returned_items",
    f"""
    SELECT c.c_custkey, c.c_name,
           CAST(sum({_REV_E4}) AS BIGINT) AS revenue_e4,
           CAST(round(c.c_acctbal * 100) AS BIGINT) AS acctbal_cents,
           n.n_name
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue_e4 DESC, c.c_custkey ASC
    LIMIT 20
    """,
)
def q_tpch_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returnflag filter rides the lineitem scan, the
    quarter filter prunes orders, the join tree aggregates per customer
    and TakeOrderedAndProject keeps 20 — the global sort never
    materializes. c_custkey tie-break pins the LIMIT set."""
    c = _t(spark, sf_dir, "customer")
    n = F.broadcast(_t(spark, sf_dir, "nation").select("n_nationkey", "n_name"))
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    rev = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("long")
    return (
        li.join(o.select("o_orderkey", "o_custkey"),
                li["l_orderkey"] == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == c["c_custkey"])
        .join(n, c["c_nationkey"] == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(rev).alias("revenue_e4"))
        .select(
            "c_custkey", "c_name", "revenue_e4",
            F.round(F.col("c_acctbal") * 100).cast("long").alias("acctbal_cents"),
            "n_name",
        )
        .orderBy(F.desc("revenue_e4"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "tpch_customer_distribution",
    """
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
          FROM customer c
          LEFT JOIN orders o ON c.c_custkey = o.o_custkey
          GROUP BY c.c_custkey)
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q_tpch_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: LEFT join keeps order-less customers (their
    count is 0, not a dropped row), first agg keys on c_custkey, the
    second collapses to the tiny count-of-counts histogram. count() of
    the RIGHT side's key is what makes the zero-order rows count 0."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "tpch_promo_effect",
    f"""
    SELECT round(100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                                  THEN {_REV_E4} ELSE 0 END)
                 / sum({_REV_E4}), 4) AS promo_revenue_pct
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    """,
)
def q_tpch_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: month-filtered lineitem joins the part dim
    (broadcast — part is orders of magnitude smaller than lineitem),
    conditional-sum ratio in ONE agg pass. Integer-e4 revenue keeps the
    ratio's numerator/denominator bit-identical across engines; the
    final division is one double op on two exact integers."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    p = F.broadcast(_t(spark, sf_dir, "part").select("p_partkey", "p_type"))
    rev = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("long")
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))
    return (
        li.join(p, li["l_partkey"] == F.col("p_partkey"))
        .agg(
            F.round(
                100.0 * F.sum(promo) / F.sum(rev), 4
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "tpch_small_qty_revenue",
    """
    SELECT CAST(floor(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                      / 7.0) AS BIGINT) AS avg_yearly_cents
    FROM lineitem l
    JOIN (SELECT l_partkey, 0.2 * avg(l_quantity) AS qty_threshold
          FROM lineitem GROUP BY l_partkey) t
      ON l.l_partkey = t.l_partkey
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#12'
      AND l.l_quantity < t.qty_threshold
    """,
)
def q_tpch_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: the correlated 'below 20% of this part's mean
    quantity' subquery decorrelates to a per-part aggregate joined back
    on l_partkey. Quantities are small integers, so the double avg is
    exact and the 0.2x threshold compares identically in both engines.
    At scale both sides shuffle on l_partkey — one co-partitioned
    exchange each; the brand filter broadcasts via the part dim."""
    li = _t(spark, sf_dir, "lineitem")
    thresholds = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (0.2 * F.avg("l_quantity")).alias("qty_threshold")
    )
    p = F.broadcast(
        _t(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#12")
        .select("p_partkey")
    )
    return (
        li.join(p, li["l_partkey"] == F.col("p_partkey"))
        .join(thresholds, li["l_partkey"] == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.floor(
                F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")) / 7
            )
            .cast("long")
            .alias("avg_yearly_cents")
        )
    )


@register(
    "tpch_large_volume_customer",
    """
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           CAST(round(o.o_totalprice * 100) AS BIGINT) AS totalprice_cents,
           CAST(sum(CAST(round(l.l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
                           GROUP BY l_orderkey
                           HAVING sum(l_quantity) > 150)
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY totalprice_cents DESC, o.o_orderkey ASC
    LIMIT 100
    """,
)
def q_tpch_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: the HAVING subquery is a self-aggregation of
    lineitem reused as a LEFT SEMI join on l_orderkey; at scale the
    semi-join's key set is tiny (only pathological orders survive), so
    AQE turns it into a broadcast. Top-100 runs as
    TakeOrderedAndProject with o_orderkey tie-break."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 150)
        .select("l_orderkey")
    )
    o = _t(spark, sf_dir, "orders").join(
        big, F.col("o_orderkey") == big["l_orderkey"], "left_semi"
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(F.round("l_quantity").cast("long")).alias("sum_qty"))
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            F.round(F.col("o_totalprice") * 100).cast("long")
            .alias("totalprice_cents"),
            "sum_qty",
        )
        .orderBy(F.desc("totalprice_cents"), F.asc("o_orderkey"))
        .limit(100)
    )


# ===========================================================================
# Training-data curation batch (r3): Gopher rules, duplicated-span
# diagnostics, DSIR importance weights, perplexity-proxy bucketing.
# ===========================================================================

_GOPHER_SQL = f"""
    WITH t AS (SELECT doc_id, {TOKS_SQL} AS toks, text FROM documents),
    m AS (SELECT doc_id,
                 len(toks) AS n_words,
                 CAST(list_sum(list_transform(toks, w -> length(w)))
                      AS DOUBLE) / len(toks) AS mean_len,
                 len(list_filter(toks, w -> contains(w, '#')
                                         OR contains(w, '...'))) AS n_symbols,
                 len(list_filter(toks, w -> regexp_matches(w, '[a-zA-Z]')))
                     AS n_alpha,
                 len(list_intersect(list_distinct(toks),
                     ['the','be','to','of','and','that','have','with']))
                     AS n_stop
          FROM t)
    SELECT doc_id,
           CAST(n_words >= 10 AND n_words <= 100000 AS BIGINT)
               AS ok_word_count,
           CAST(mean_len >= 2 AND mean_len <= 10 AS BIGINT)
               AS ok_mean_word_len,
           CAST(n_symbols < n_words * 0.1 AS BIGINT) AS ok_symbol_ratio,
           CAST(n_alpha >= n_words * 0.8 AS BIGINT) AS ok_alpha_words,
           CAST(n_stop >= 2 AS BIGINT) AS ok_stopwords,
           CAST(n_words >= 10 AND n_words <= 100000
                AND mean_len >= 2 AND mean_len <= 10
                AND n_symbols < n_words * 0.1
                AND n_alpha >= n_words * 0.8
                AND n_stop >= 2 AS BIGINT) AS keep
    FROM m
"""


@register("gopher_quality_filter", _GOPHER_SQL)
def q_gopher_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher rule gate (Rae et al. 2021) — see
    dataprep/text.py:gopher_quality_filter for the rule inventory."""
    from taxi_trips_etl_spark.dataprep.text import gopher_quality_filter

    return gopher_quality_filter(_t(spark, sf_dir, "documents"))


_DUPCOV_N = 8
_DUPCOV_SQL = f"""
    WITH t AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
    g AS (SELECT doc_id,
                 unnest(list_distinct(list_transform(
                     generate_series(1, len(toks) - {_DUPCOV_N - 1}),
                     i -> array_to_string(toks[i:i + {_DUPCOV_N - 1}], ' ')
                 ))) AS gram
          FROM t WHERE len(toks) >= {_DUPCOV_N}),
    gd AS (SELECT gram, count(DISTINCT doc_id) AS n_docs FROM g GROUP BY 1)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(sum(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_grams,
           round(CAST(sum(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 4) AS dup_coverage
    FROM g JOIN gd USING (gram)
    GROUP BY doc_id
"""


@register("dup_ngram_coverage", _DUPCOV_SQL)
def q_dup_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lee et al. 2021 duplicated-span diagnostics — fraction of each
    doc's 8-grams shared with at least one other doc. Posting-list shuffle on the
    gram key; see dataprep/text.py:dup_ngram_coverage."""
    from taxi_trips_etl_spark.dataprep.text import dup_ngram_coverage

    return dup_ngram_coverage(_t(spark, sf_dir, "documents"), n=_DUPCOV_N)


_DSIR_SQL = f"""
    WITH t AS (SELECT doc_id, source = 'src0' AS is_target,
                      unnest({TOKS_SQL}) AS tok
               FROM documents),
    m AS (SELECT tok,
                 CAST(sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_t,
                 count(*) AS n_all
          FROM t GROUP BY 1),
    tot AS (SELECT sum(n_t) AS tot_t, sum(n_all) AS tot_all,
                   count(*) AS vocab FROM m),
    r AS (SELECT tok,
                 ln(CAST(n_t + 1 AS DOUBLE) / (tot_t + vocab))
                 - ln(CAST(n_all + 1 AS DOUBLE) / (tot_all + vocab))
                     AS log_ratio
          FROM m CROSS JOIN tot)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           round(avg(log_ratio), 6) AS importance_weight
    FROM t JOIN r USING (tok)
    GROUP BY doc_id
"""


@register("dsir_importance_weights", _DSIR_SQL)
def q_dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR unigram importance weights targeting source 'src0' — see
    dataprep/text.py:dsir_importance_weights."""
    from taxi_trips_etl_spark.dataprep.text import dsir_importance_weights

    return dsir_importance_weights(
        _t(spark, sf_dir, "documents"), target_source="src0"
    )


_PPL_SQL = f"""
    WITH t AS (SELECT doc_id, unnest({TOKS_SQL}) AS tok FROM documents),
    m AS (SELECT tok, count(*) AS n FROM t GROUP BY 1),
    tot AS (SELECT sum(n) AS tot, count(*) AS vocab FROM m),
    p AS (SELECT tok, ln(CAST(n + 1 AS DOUBLE) / (tot + vocab)) AS lp
          FROM m CROSS JOIN tot),
    s AS (SELECT doc_id, round(avg(lp), 6) AS mean_logprob
          FROM t JOIN p USING (tok) GROUP BY 1),
    r AS (SELECT min(mean_logprob) AS lo, max(mean_logprob) AS hi FROM s)
    SELECT doc_id, mean_logprob,
           CAST(least(3, floor((mean_logprob - lo) / ((hi - lo) / 4)))
                AS BIGINT) AS ppl_bucket
    FROM s CROSS JOIN r
"""


@register("unigram_logprob_buckets", _PPL_SQL)
def q_unigram_logprob_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing with a corpus-fit unigram LM —
    see dataprep/text.py:unigram_logprob_score."""
    from taxi_trips_etl_spark.dataprep.text import unigram_logprob_score

    return unigram_logprob_score(_t(spark, sf_dir, "documents"), n_buckets=4)


_SESSION_WINDOW_SQL = """
    WITH o AS (SELECT user_id, epoch_us(ts) AS us, ts FROM events),
    gaps AS (
        SELECT user_id, us, ts,
               CASE WHEN lag(us) OVER w IS NULL
                         OR us - lag(us) OVER w >= 1800000000
                    THEN 1 ELSE 0 END AS new_session
        FROM o WINDOW w AS (PARTITION BY user_id ORDER BY us)
    ),
    s AS (
        SELECT user_id, ts,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY us
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS sid
        FROM gaps
    )
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S')
               AS session_end,
           count(*) AS n_events
    FROM s GROUP BY user_id, sid
"""


@register("session_window_agg", _SESSION_WINDOW_SQL)
def q_session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-NATIVE session windows (F.session_window): unlike the
    lag+cumsum islands of ``sessionize_events``, this runs Spark's
    dedicated session-window operator — one shuffle on user_id, sessions
    merged inside the aggregate (and in streaming, a purpose-built
    session state store — no arbitrary-state UDF needed). Semantics
    pinned by the oracle: events merge iff gap < 30 min STRICTLY
    (window end is exclusive), session_end = last event + gap.
    """
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            _ts_str(F.col("session_window.start"), "session_start"),
            _ts_str(F.col("session_window.end"), "session_end"),
            "n_events",
        )
    )


def _hll_oracle() -> str:
    from taxi_trips_etl_spark.dataprep.profile import hll_portable_oracle_sql

    inner = hll_portable_oracle_sql(
        "SELECT event_type, user_id, CAST(ts AS DATE) AS day FROM events",
        key="event_type", value="user_id", partial="day",
    )
    return f"""
    SELECT k AS event_type, approx_distinct, registers_set,
           n_partials_merged
    FROM ({inner})
    """


@register("hll_distinct_rollup", _hll_oracle())
def q_hll_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type distinct users via per-day HLL register partials
    merged upward. Oracle-bearing since round 5: the registry entry
    runs the PORTABLE md5-register variant whose register derivation
    and estimate arithmetic DuckDB replays exactly (see
    dataprep/profile.py:hll_portable_rollup for the bit-exactness
    argument); the DataSketches production variant
    (hll_distinct_rollup) keeps its pytest error-bound/merge pins."""
    from taxi_trips_etl_spark.dataprep.profile import hll_portable_rollup

    ev = _events(spark, sf_dir).withColumn("day", F.to_date("ts"))
    return hll_portable_rollup(ev, ["event_type"], "user_id", "day")


@register(
    "tpch_market_share",
    f"""
    SELECT o_year,
           round(CAST(sum(CASE WHEN nation = 'NATION_1' THEN volume_e4
                               ELSE 0 END) AS DOUBLE)
                 / sum(volume_e4), 4) AS mkt_share
    FROM (SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
                 {_REV_E4.replace('l_extendedprice', 'l.l_extendedprice')
                         .replace('l_discount', 'l.l_discount')} AS volume_e4,
                 n2.n_name AS nation
          FROM lineitem l
          JOIN part p     ON p.p_partkey = l.l_partkey
          JOIN supplier s ON s.s_suppkey = l.l_suppkey
          JOIN orders o   ON o.o_orderkey = l.l_orderkey
          JOIN customer c ON c.c_custkey = o.o_custkey
          JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
          JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
          JOIN region r   ON r.r_regionkey = n1.n_regionkey
          WHERE r.r_name = 'ASIA'
            AND p.p_type = 'PROMO'
            AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00')
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q_tpch_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: the deepest join tree in the suite (lineitem ×
    part × supplier × orders × customer × nation×2 × region). Dims all
    broadcast; the only big shuffle is lineitem⋈orders on l_orderkey.
    The supplier-side nation (n2) survives to the conditional sum —
    market share = NATION_1's fraction of promo volume into ASIA
    customers. Integer-e4 volume keeps the ratio bit-portable."""
    li = _t(spark, sf_dir, "lineitem")
    p = F.broadcast(
        _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    s = F.broadcast(
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select("s_suppkey", "nation")
    )
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    n1 = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_cust = F.broadcast(
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    vol = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("long")
    return (
        li.join(p, li["l_partkey"] == F.col("p_partkey"))
        .join(s, li["l_suppkey"] == F.col("s_suppkey"))
        .join(o.select("o_orderkey", "o_custkey", "o_orderdate"),
              li["l_orderkey"] == F.col("o_orderkey"))
        .join(asia_cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_1", vol).otherwise(0))
                .cast("double")
                / F.sum(vol),
                4,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register("embedding_pca_project")  # rows-only: eigendecomposition has
# no DuckDB twin; Spark≡numpy projection equality is pytest-pinned.
def q_embedding_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA to 4 components: one covariance agg pass + driver eigh +
    literal-eigenvector projection — see similarity.py:pca_project.

    Output is posexploded to scalar (vec_id, component_idx, value) rows
    per the registry's BIGINT/DOUBLE/VARCHAR portability rule — array
    cells are unhashable in pandas-side canonicalization."""
    from taxi_trips_etl_spark.dataprep.similarity import pca_project

    emb = _t(spark, sf_dir, "embeddings")
    projected = pca_project(emb, n_components=4)
    return projected.select(
        "vec_id", F.posexplode(F.col("pc").cast("array<double>"))
    ).select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("pos").cast("long").alias("component_idx"),
        F.col("col").cast("double").alias("value"),
    )


@register(
    "fuzzy_match_fastss",
    """
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS edit_dist
    FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 1
    """,
)
def q_fuzzy_match_fastss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record-linkage fuzzy join. The ORACLE is the brute-force O(n²)
    Levenshtein join; the Spark side uses symmetric-deletion blocking
    (dedup.py:fastss_pairs) — hash-equality between them PROVES the
    blocking loses no pairs while doing O(n·len) work."""
    from taxi_trips_etl_spark.dataprep.dedup import fastss_pairs

    return fastss_pairs(_t(spark, sf_dir, "customer"))


@register(
    "tpch_top_supplier",
    f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               CAST(sum({_REV_E4}) AS BIGINT) AS total_revenue_e4
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, r.total_revenue_e4
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue_e4 = (SELECT max(total_revenue_e4) FROM revenue)
    ORDER BY s.s_suppkey
    """,
)
def q_tpch_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the revenue 'view' is built once and consumed
    twice (per-supplier totals + the scalar max) — a lazy checkpoint
    materializes it once, mirroring the spec's CREATE VIEW, and the
    scalar max comes back as a broadcast filter, not a second
    aggregation of lineitem."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("long")
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(rev).alias("total_revenue_e4"))
        .transform(materialize, eager=False)
    )
    best = revenue.agg(F.max("total_revenue_e4").alias("mx"))
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(best),
                     F.col("total_revenue_e4") == F.col("mx"))
        .join(s, F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue_e4")
        .orderBy("s_suppkey")
    )


@register("streaming_session_window", _SESSION_WINDOW_SQL)
def q_streaming_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of session_window_agg: same oracle — AvailableNow
    over the static events dir must equal the batch session windows."""
    from taxi_trips_etl_spark.streaming.session_window import (
        run_streaming_session_window,
    )

    return run_streaming_session_window(spark, f"{sf_dir}/events.parquet")


@register(
    "dedup_canonicalize",
    f"""
    SELECT d.doc_id, d.lang, d.source
    FROM documents d
    LEFT JOIN ({_COMPONENTS_SQL}) c ON d.doc_id = c.doc_id
    WHERE c.doc_id IS NULL OR c.doc_id = c.component_id
    """,
)
def q_dedup_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end component-aware dedup: SimHash pairs → connected
    components → keep exactly the component minimum per near-dup
    cluster (plus every untouched doc). Unlike keep-first pair
    dropping, cliques/chains lose all but ONE member — the oracle is
    the recursive-CTE closure, so the whole LSH→components→survivors
    composition is hash-verified."""
    from taxi_trips_etl_spark.dataprep.components import (
        canonicalize_near_dups,
    )

    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.simhash_near_duplicates(docs)
    return canonicalize_near_dups(docs, pairs).select(
        "doc_id", "lang", "source"
    )


_SPLIT_CASE = (
    "CASE WHEN CAST(concat('0x', substr(md5('split:' || "
    "CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) < "
    f"{int(0.2 * (1 << 32))} THEN 'test' ELSE 'train' END"
)


@register(
    "split_leakage_audit",
    f"""
    WITH fp AS ({_simhash_fp_sql()}),
    banded AS (
        SELECT doc_id, simhash, b.band_id,
               (simhash >> (b.band_id * 15)) & 32767 AS band_val
        FROM fp, (SELECT unnest(generate_series(0, 3)) AS band_id) b
    ),
    prs AS (
        SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
        FROM banded a JOIN banded b
          ON a.band_id = b.band_id AND a.band_val = b.band_val
         AND a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    ),
    sp AS (SELECT doc_id, {_SPLIT_CASE} AS split FROM documents)
    SELECT CAST(count(*) AS BIGINT) AS n_near_dup_pairs,
           CAST(sum(CASE WHEN sa.split != sb.split THEN 1 ELSE 0 END)
                AS BIGINT) AS n_leaked_pairs
    FROM prs
    JOIN sp sa ON prs.doc_id_a = sa.doc_id
    JOIN sp sb ON prs.doc_id_b = sb.doc_id
    """,
)
def q_split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test contamination audit: near-dup pairs whose members
    land on OPPOSITE sides of the hash split are eval-set leakage (the
    reason dedup-then-split must key on the canonical id). One number
    to alert on per corpus build; the pair side reuses the SimHash
    candidate shuffle, the split side is a scan-side hash expression."""
    from taxi_trips_etl_spark.dataprep.sampling import train_test_split

    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.simhash_near_duplicates(docs)
    split = train_test_split(docs, key="doc_id").select("doc_id", "split")
    return (
        pairs.join(
            split.select(F.col("doc_id").alias("doc_id_a"),
                         F.col("split").alias("split_a")),
            "doc_id_a",
        )
        .join(
            split.select(F.col("doc_id").alias("doc_id_b"),
                         F.col("split").alias("split_b")),
            "doc_id_b",
        )
        .agg(
            F.count(F.lit(1)).alias("n_near_dup_pairs"),
            F.sum(
                (F.col("split_a") != F.col("split_b")).cast("long")
            ).alias("n_leaked_pairs"),
        )
    )


_EMB_COMPONENTS_SQL = f"""
    WITH RECURSIVE prs AS ({_EMB_PAIRS_SQL}),
    sym AS (SELECT vec_id_a AS a, vec_id_b AS b FROM prs
            UNION SELECT vec_id_b, vec_id_a FROM prs),
    nodes AS (SELECT DISTINCT a AS node FROM sym),
    reach(node, r) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT re.node, s.b FROM reach re JOIN sym s ON re.r = s.a
    )
    SELECT node AS vec_id, min(r) AS component_id FROM reach GROUP BY node
"""


@register(
    "embedding_canonicalize",
    f"""
    SELECT em.vec_id, CAST(em.label AS BIGINT) AS label
    FROM embeddings em
    LEFT JOIN ({_EMB_COMPONENTS_SQL}) c ON em.vec_id = c.vec_id
    WHERE c.vec_id IS NULL OR c.vec_id = c.component_id
    """,
)
def q_embedding_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space dedup end to end: sign-LSH cosine near-dup
    pairs → connected components → keep one vector (the component
    minimum) per semantic cluster. The embedding twin of
    dedup_canonicalize, hash-verified through the same recursive-CTE
    closure oracle."""
    from taxi_trips_etl_spark.dataprep.components import (
        canonicalize_near_dups,
    )
    from taxi_trips_etl_spark.dataprep.similarity import (
        embedding_near_dup_pairs,
    )

    emb = _t(spark, sf_dir, "embeddings")
    pairs = embedding_near_dup_pairs(emb)
    return canonicalize_near_dups(
        emb, pairs, id_col="vec_id", a_col="vec_id_a", b_col="vec_id_b"
    ).select("vec_id", F.col("label").cast("long").alias("label"))


@register(
    "event_transition_matrix",
    """
    WITH o AS (
        SELECT user_id, event_type, epoch_us(ts) AS us, event_id
        FROM events
    ),
    seq AS (
        SELECT user_id,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY us, event_id) AS from_type,
               event_type AS to_type
        FROM o
    ),
    t AS (SELECT from_type, to_type, count(*) AS n
          FROM seq WHERE from_type IS NOT NULL GROUP BY 1, 2)
    SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
           round(CAST(n AS DOUBLE)
                 / sum(n) OVER (PARTITION BY from_type), 6) AS p
    FROM t
    """,
)
def q_event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type Markov transitions: lag over (ts, event_id)
    builds the bigram stream, one partial-agg shuffle counts the
    |types|² matrix, and row-normalized probabilities come from a
    window over the TINY aggregated matrix — never the event stream.
    The classic session-behavior feature for recommendation/anomaly
    models."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.unix_micros("ts"), "event_id"
    )
    seq = ev.select(
        F.lag("event_type").over(w).alias("from_type"),
        F.col("event_type").alias("to_type"),
    ).filter(F.col("from_type").isNotNull())
    t = seq.groupBy("from_type", "to_type").agg(F.count(F.lit(1)).alias("n"))
    w_row = Window.partitionBy("from_type")
    return t.select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(w_row), 6).alias(
            "p"
        ),
    )


@register(
    "kfold_assignment",
    f"""
    SELECT fold, count(*) AS n, min(doc_id) AS min_doc
    FROM (SELECT doc_id,
                 CAST(concat('0x', substr(md5('fold:' ||
                      CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 5 AS fold
          FROM documents)
    GROUP BY 1
    """,
)
def q_kfold_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-keyed 5-fold CV assignment (append-stable, RNG-free) —
    the k-fold sibling of train_test_split."""
    from taxi_trips_etl_spark.dataprep.sampling import kfold_assign

    return (
        kfold_assign(_t(spark, sf_dir, "documents"), key="doc_id", k=5)
        .groupBy("fold")
        .agg(F.count(F.lit(1)).alias("n"), F.min("doc_id").alias("min_doc"))
    )


@register(
    "tpch_disjunctive_pricing",
    f"""
    SELECT CAST(sum({_REV_E4}) AS BIGINT) AS revenue_e4,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q_tpch_disjunctive_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: an OR-of-ANDs join predicate. Catalyst must
    extract the common join key (equi on p_partkey), push the
    quantity-range disjunction's union bounds (1..30) to the lineitem
    scan, and evaluate the full disjunction post-join — the predicate
    never degrades the join to a nested loop. Adapted to the available
    columns (no p_container/l_shipmode in this testdata)."""
    li = _t(spark, sf_dir, "lineitem")
    p = F.broadcast(_t(spark, sf_dir, "part").select("p_partkey", "p_brand"))
    rev = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("long")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("l_quantity").between(20, 30))
    )
    return (
        li.join(p, li["l_partkey"] == F.col("p_partkey"))
        .filter(cond)
        .agg(F.sum(rev).alias("revenue_e4"),
             F.count(F.lit(1)).alias("n_lines"))
    )


@register(
    "window_range_interval",
    """
    SELECT o_custkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                OVER (PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
                      RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)
                AS BIGINT) AS trailing_30d_cents
    FROM orders
    """,
)
def q_window_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over event time (not ROWS): per customer, revenue in
    the trailing 30 DAYS — the frame is value-based, so same-day orders
    aggregate together and gaps matter, unlike a row-count frame.
    Spark's rangeBetween needs a numeric ordering key → order by epoch
    seconds with a 2 592 000-second preceding bound; the oracle uses
    the identical numeric frame, making the semantics engine-portable
    by construction."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-2592000, 0)
    )
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return o.select(
        "o_custkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        F.sum(cents).over(w).alias("trailing_30d_cents"),
    )


@register(
    "unpivot_metrics",
    """
    WITH wide AS (
        SELECT l_returnflag,
               CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
                   AS total_qty,
               CAST(count(*) AS BIGINT) AS n_lines,
               CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
        FROM lineitem GROUP BY 1)
    SELECT l_returnflag, metric, value FROM wide
    UNPIVOT (value FOR metric IN (total_qty, n_lines, n_orders))
    """,
)
def q_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide→long reshape): the inverse of pivot_event_types.
    Spark's native unpivot keeps it one narrow projection (each input
    row fans out to n_metrics rows — no shuffle beyond the upstream
    agg); metric/value long form is what plotting and metric-store
    sinks consume."""
    li = _t(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.sum(F.round("l_quantity").cast("long")).alias("total_qty"),
        F.count(F.lit(1)).alias("n_lines"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )
    return wide.unpivot(
        ids=["l_returnflag"],
        values=["total_qty", "n_lines", "n_orders"],
        variableColumnName="metric",
        valueColumnName="value",
    )


_BM25_TERMS = ("join", "hash", "filter")
_BM25_SQL = f"""
    WITH lens AS (
        SELECT doc_id, CAST(len({TOKS_SQL}) AS DOUBLE) AS dl FROM documents
    ),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM lens),
    posting AS (
        SELECT doc_id, tok AS term
        FROM (SELECT doc_id, unnest({TOKS_SQL}) AS tok FROM documents)
        WHERE tok IN ('join', 'hash', 'filter')
    ),
    tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
           FROM posting GROUP BY 1, 2),
    dfx AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
    idf AS (SELECT term,
                   ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) AS idf, avgdl
            FROM dfx CROSS JOIN stats)
    SELECT doc_id, round(sum(idf * tf / (tf + 1.2 * (1 - 0.75 + 0.75 * dl
                   / avgdl))), 6) AS bm25
    FROM tf JOIN idf USING (term) JOIN lens USING (doc_id)
    GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id ASC
    LIMIT 20
"""


@register("bm25_keyword_search", _BM25_SQL)
def q_bm25_keyword_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-20 for the query {join, hash, filter} — see
    dataprep/text.py:bm25_search."""
    from taxi_trips_etl_spark.dataprep.text import bm25_search

    return bm25_search(
        _t(spark, sf_dir, "documents"), list(_BM25_TERMS), top_n=20
    )


@register(
    "tpch_sales_opportunity",
    """
    SELECT c.c_nationkey,
           CAST(count(*) AS BIGINT) AS numcust,
           CAST(sum(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS BIGINT)
               AS totacctbal_cents
    FROM customer c
    WHERE c.c_acctbal > (SELECT avg(c_acctbal) FROM customer
                         WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= DATE '2000-01-01')
    GROUP BY c.c_nationkey
    ORDER BY c.c_nationkey
    """,
)
def q_tpch_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (adapted — no c_phone country codes in this
    testdata): above-average-balance customers with no RECENT orders
    (lapsed since 2000 — this testdata has no order-less customers at
    all, so the unscoped anti-join made the green row vacuous). The
    scalar subquery evaluates once and broadcasts as a filter; NOT
    EXISTS decorrelates to a LEFT ANTI join on o_custkey with the date
    predicate pushed into the anti-side scan. Both are the shapes that
    keep this one scan of each table."""
    c = _t(spark, sf_dir, "customer")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(F.avg("c_acctbal").alias("ab"))
    )
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.to_date("o_orderdate") >= F.lit("2000-01-01"))
        .select("o_custkey")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(o, c["c_custkey"] == o["o_custkey"], "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.round(F.col("c_acctbal") * 100).cast("long")).alias(
                "totacctbal_cents"
            ),
        )
        .orderBy("c_nationkey")
    )


@register(
    "string_agg_ordered",
    """
    SELECT l_returnflag, l_linestatus,
           string_agg(DISTINCT l_shipmode_proxy, ','
                      ORDER BY l_shipmode_proxy) AS modes
    FROM (SELECT l_returnflag, l_linestatus,
                 concat('M', CAST(l_linenumber % 4 AS VARCHAR))
                     AS l_shipmode_proxy
          FROM lineitem)
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def q_string_agg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG/STRING_AGG): collect_set →
    array_sort → concat_ws gives deterministic order regardless of
    partitioning — the portable form of an ORDER BY inside an
    aggregate (Spark's collect_list order is partition-dependent;
    sorting after the fact is the engine-safe idiom)."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_linestatus",
        F.concat(F.lit("M"), (F.col("l_linenumber") % 4).cast("string")).alias(
            "mode"
        ),
    )
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_set("mode"))).alias(
                "modes"
            )
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "forward_fill_gaps",
    """
    WITH spine AS (
        SELECT unnest(generate_series(DATE '1996-01-01', DATE '1996-03-31',
                                      INTERVAL 1 DAY))::DATE AS day
    ),
    daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS revenue_cents
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY 1
    )
    SELECT strftime(s.day, '%Y-%m-%d') AS day,
           coalesce(d.revenue_cents,
                    last_value(d.revenue_cents IGNORE NULLS)
                        OVER (ORDER BY s.day ROWS BETWEEN UNBOUNDED
                              PRECEDING AND 1 PRECEDING),
                    0) AS revenue_cents_filled,
           CAST(d.revenue_cents IS NULL AS BIGINT) AS was_gap
    FROM spine s LEFT JOIN daily d ON s.day = d.day
    """,
)
def q_forward_fill_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap filling over a date spine: LEFT join daily aggregates onto a
    generated calendar, then forward-fill missing days with the LAST
    known value (last_value IGNORE NULLS over the preceding frame) —
    the standard time-series densification before ML featurization.
    The spine is sequence()-generated — no data dependency. The fill
    window is global-unpartitioned BY DESIGN: it runs on the
    post-aggregation calendar (rows = days, not orders), the repo's
    bounded-cardinality window rule; per-entity fills would partition
    by the entity key."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "revenue_cents"
        )
    )
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1996-01-01").cast("date"),
                F.lit("1996-03-31").cast("date"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    return (
        spine.join(daily, "day", "left")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce(
                F.col("revenue_cents"),
                F.last("revenue_cents", ignorenulls=True).over(w),
                F.lit(0),
            ).alias("revenue_cents_filled"),
            F.col("revenue_cents").isNull().cast("long").alias("was_gap"),
        )
    )


# ===========================================================================
# TPC-H shape batch 4 (round 4): Q2 / Q9 / Q11 / Q12 adapted to this
# testdata's columns (no partsupp table; no l_shipmode column)
# ===========================================================================


@register(
    "tpch_min_cost_supplier",
    """
    WITH cost AS (
        SELECT l_partkey, l_suppkey,
               CAST(min(round(l_extendedprice * 100 / l_quantity)) AS BIGINT)
                   AS unit_cost_cents
        FROM lineitem GROUP BY l_partkey, l_suppkey
    )
    SELECT p.p_partkey, s.s_suppkey, s.s_name, n.n_name, c.unit_cost_cents
    FROM cost c
    JOIN part p ON c.l_partkey = p.p_partkey
    JOIN supplier s ON c.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_size <= 5
      AND c.unit_cost_cents = (SELECT min(c2.unit_cost_cents) FROM cost c2
                               WHERE c2.l_partkey = c.l_partkey)
    """,
)
def q_tpch_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (adapted — no partsupp: the observed minimum unit
    price from lineitem stands in for ps_supplycost): for each small
    part, every supplier achieving the part's minimum unit cost. The
    correlated min subquery decorrelates to a window-min over the
    already-aggregated (part, supplier) table — the window input is the
    post-agg cardinality, not the fact table — and ties survive, as Q2
    requires. Unit cost is one IEEE divide then cents-rounded, so both
    engines derive bit-identical integers."""
    li = _t(spark, sf_dir, "lineitem")
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(
            F.round(F.col("l_extendedprice") * 100 / F.col("l_quantity"))
            .cast("long")
        ).alias("unit_cost_cents")
    )
    w = Window.partitionBy("l_partkey")
    best = cost.withColumn(
        "_min_cp", F.min("unit_cost_cents").over(w)
    ).filter(F.col("unit_cost_cents") == F.col("_min_cp"))
    p = F.broadcast(
        _t(spark, sf_dir, "part")
        .filter(F.col("p_size") <= 5)
        .select("p_partkey")
    )
    s = F.broadcast(
        _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    )
    n = F.broadcast(_t(spark, sf_dir, "nation").select("n_nationkey", "n_name"))
    return (
        best.join(p, best["l_partkey"] == p["p_partkey"])
        .join(s, best["l_suppkey"] == s["s_suppkey"])
        .join(n, s["s_nationkey"] == n["n_nationkey"])
        .select("p_partkey", "s_suppkey", "s_name", "n_name", "unit_cost_cents")
    )


@register(
    "tpch_product_profit",
    f"""
    SELECT nation, o_year, CAST(sum(amount_e4) AS BIGINT) AS profit_e4
    FROM (
        SELECT n.n_name AS nation,
               CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
               {_REV_E4}
                 - CAST(round(p.p_retailprice * 100) AS BIGINT)
                   * CAST(l.l_quantity AS BIGINT) * 10 AS amount_e4
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_name LIKE '%red%'
    )
    GROUP BY nation, o_year
    """,
)
def q_tpch_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (adapted — 10% of p_retailprice stands in for
    ps_supplycost): profit by supplier nation x order year over
    name-filtered parts. The one real shuffle is lineitem ⋈ orders on
    orderkey; part/supplier/nation broadcast, and the p_name filter
    prunes the broadcast BEFORE the fact join so Catalyst turns it into
    a semi-join reduction on the fact side. Money stays integer-e4."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    p = F.broadcast(
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    s = F.broadcast(
        _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    )
    n = F.broadcast(_t(spark, sf_dir, "nation").select("n_nationkey", "n_name"))
    rev_e4 = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("long")
    cost_e4 = (
        F.round(F.col("p_retailprice") * 100).cast("long")
        * F.col("l_quantity").cast("long")
        * F.lit(10).cast("long")
    )
    return (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(n, s["s_nationkey"] == n["n_nationkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(rev_e4 - cost_e4).alias("profit_e4"))
    )


@register(
    "tpch_important_parts",
    f"""
    WITH val AS (
        SELECT l_partkey, CAST(sum({_REV_E4}) AS BIGINT) AS value_e4
        FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        WHERE s.s_nationkey = 7
        GROUP BY l_partkey
    )
    SELECT l_partkey, value_e4
    FROM val
    WHERE value_e4 > (SELECT sum(value_e4) * 0.001 FROM val)
    """,
)
def q_tpch_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (adapted — revenue through one nation's
    suppliers stands in for partsupp stock value): parts whose value
    exceeds a fraction of the national total. The HAVING-style global
    threshold is a 1-row broadcast crossJoin onto the per-part
    aggregate (never a single-partition window); the per-part agg is
    the only full shuffle and the fraction compare is BIGINT-vs-double
    on exact integer sums, identical in both engines."""
    li = _t(spark, sf_dir, "lineitem")
    s = F.broadcast(
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_nationkey") == 7)
        .select("s_suppkey")
    )
    rev_e4 = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("long")
    val = (
        li.join(s, li["l_suppkey"] == s["s_suppkey"])
        .groupBy("l_partkey")
        .agg(F.sum(rev_e4).alias("value_e4"))
    )
    threshold = val.agg((F.sum("value_e4") * 0.001).alias("_thr"))
    return (
        val.crossJoin(F.broadcast(threshold))
        .filter(F.col("value_e4") > F.col("_thr"))
        .select("l_partkey", "value_e4")
    )


@register(
    "tpch_shipmode_priority",
    """
    SELECT shipmode_proxy,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM (SELECT l_orderkey,
                 concat('M', CAST(l_linenumber % 4 AS VARCHAR))
                     AS shipmode_proxy
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00') l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY shipmode_proxy
    """,
)
def q_tpch_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (adapted — the linenumber-derived shipmode proxy
    this repo's string_agg query also uses, since the testdata carries
    no l_shipmode): per-mode counts of high- vs low-priority order
    lines in a shipdate year. The date filter is pushed to the lineitem
    scan; the priority CASE runs as two conditional sums in ONE agg
    pass after the orderkey join (fact-fact shuffle, no broadcast —
    orders is the same magnitude as lineitem)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select(
        "l_orderkey",
        F.concat(
            F.lit("M"), (F.col("l_linenumber") % 4).cast("string")
        ).alias("shipmode_proxy"),
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("shipmode_proxy")
        .agg(
            F.sum(is_high.cast("long")).alias("high_line_count"),
            F.sum((~is_high).cast("long")).alias("low_line_count"),
        )
    )


@register(
    "semantic_decontaminate",
    """
    WITH e AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    ev AS (
        SELECT vec_id AS eval_id, v AS w,
               sqrt(list_sum(list_transform(v, x -> x * x))) AS wn
        FROM e WHERE vec_id < 50
    ),
    co AS (
        SELECT vec_id, v,
               sqrt(list_sum(list_transform(v, x -> x * x))) AS vn
        FROM e WHERE vec_id >= 50
    ),
    scored AS (
        SELECT co.vec_id, ev.eval_id,
               round(list_sum(list_transform(generate_series(1, len(v)),
                                             i -> v[i] * w[i]))
                     / (vn * wn), 6) AS cos_r
        FROM co CROSS JOIN ev
    ),
    best AS (
        SELECT vec_id, eval_id, cos_r,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cos_r DESC, eval_id) AS rn
        FROM scored
    )
    SELECT vec_id, CAST(eval_id AS BIGINT) AS matched_eval_id,
           cos_r AS max_cosine
    FROM best WHERE rn = 1 AND cos_r >= 0.4
    """,
)
def q_semantic_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space decontamination: corpus vectors (vec_id ≥ 50)
    whose cosine to ANY eval vector (vec_id < 50) reaches 0.4 — the
    semantic sibling of corpus_decontaminate's n-gram overlap. Eval
    side broadcasts (bounded benchmark suite); corpus streams once;
    argmax collapses map-side. See similarity.semantic_decontaminate."""
    from taxi_trips_etl_spark.dataprep.similarity import (
        semantic_decontaminate,
    )

    emb = _t(spark, sf_dir, "embeddings")
    return semantic_decontaminate(
        emb.filter(F.col("vec_id") >= 50),
        emb.filter(F.col("vec_id") < 50).select(
            F.col("vec_id").alias("eval_id"), "embedding"
        ),
        threshold=0.4,
    )


# ---------------------------------------------------------------------------
# round 4: warehouse mutation ops, skew-proof join, quantization, graphs
# ---------------------------------------------------------------------------

_SCD2_UPD = """
    SELECT c_custkey AS k,
           CASE WHEN c_custkey % 4 = 0 THEN c_mktsegment || '-V2'
                ELSE c_mktsegment END AS u_seg,
           c_nationkey AS u_nat
    FROM customer WHERE c_custkey % 2 = 0
    UNION ALL
    SELECT c_custkey + 10000000, 'NEWSEG', c_nationkey
    FROM customer WHERE c_custkey % 50 = 0
"""


@register(
    "scd2_customer_history",
    f"""
    WITH upd AS ({_SCD2_UPD}),
    j AS (
        SELECT d.c_custkey AS dk, d.c_mktsegment AS seg,
               d.c_nationkey AS nat, u.k AS uk, u.u_seg, u.u_nat
        FROM customer d FULL OUTER JOIN upd u ON d.c_custkey = u.k
    )
    SELECT dk AS c_custkey, seg AS c_mktsegment,
           CAST(nat AS BIGINT) AS c_nationkey,
           '1990-01-01 00:00:00' AS valid_from_s,
           CAST(NULL AS VARCHAR) AS valid_to_s
    FROM j WHERE dk IS NOT NULL
      AND (uk IS NULL OR (seg = u_seg AND nat = u_nat))
    UNION ALL
    SELECT dk, seg, CAST(nat AS BIGINT),
           '1990-01-01 00:00:00', '1996-06-01 00:00:00'
    FROM j WHERE dk IS NOT NULL AND uk IS NOT NULL
      AND NOT (seg = u_seg AND nat = u_nat)
    UNION ALL
    SELECT uk, u_seg, CAST(u_nat AS BIGINT),
           '1996-06-01 00:00:00', CAST(NULL AS VARCHAR)
    FROM j WHERE uk IS NOT NULL
      AND (dk IS NULL OR NOT (seg = u_seg AND nat = u_nat))
    """,
)
def q_scd2_customer_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 apply (operators/scd2.py): a deterministic update
    batch (half the keys, a quarter of them actually changed, plus a
    tranche of brand-new keys) hits an all-open customer dimension;
    output is the full version history. The oracle replays the three
    branch outcomes (untouched / closed / opened) with a direct
    attribute compare — proving the md5 change-hash decides exactly
    like attribute equality. One full-outer shuffle on the business
    key; the dimension is small by definition at 100 TB (the fact side
    never enters this op)."""
    from taxi_trips_etl_spark.operators.scd2 import scd2_apply

    c = _t(spark, sf_dir, "customer")
    dim = c.select(
        "c_custkey",
        "c_mktsegment",
        "c_nationkey",
        F.lit("1990-01-01 00:00:00").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    upd = (
        c.filter(F.col("c_custkey") % 2 == 0)
        .select(
            "c_custkey",
            F.when(
                F.col("c_custkey") % 4 == 0,
                F.concat(F.col("c_mktsegment"), F.lit("-V2")),
            )
            .otherwise(F.col("c_mktsegment"))
            .alias("c_mktsegment"),
            "c_nationkey",
            F.lit("1996-06-01 00:00:00").cast("timestamp").alias(
                "effective_ts"
            ),
        )
        .unionByName(
            c.filter(F.col("c_custkey") % 50 == 0).select(
                (F.col("c_custkey") + 10000000).alias("c_custkey"),
                F.lit("NEWSEG").alias("c_mktsegment"),
                "c_nationkey",
                F.lit("1996-06-01 00:00:00").cast("timestamp").alias(
                    "effective_ts"
                ),
            )
        )
    )
    hist = scd2_apply(dim, upd, "c_custkey", ["c_mktsegment", "c_nationkey"])
    return hist.select(
        "c_custkey",
        "c_mktsegment",
        F.col("c_nationkey").cast("long").alias("c_nationkey"),
        _ts_str(F.col("valid_from"), "valid_from_s"),
        _ts_str(F.col("valid_to"), "valid_to_s"),
    )


_CDC_UPD = """
    SELECT c_custkey AS k, c_name AS u_name, c_nationkey AS u_nat,
           c_acctbal + 1000.0 AS u_bal, 'UPDATED' AS u_seg
    FROM customer WHERE c_custkey % 5 = 0
    UNION ALL
    SELECT c_custkey + 10000000, 'NEW#' || CAST(c_custkey AS VARCHAR),
           c_nationkey, 0.0, 'INSERTED'
    FROM customer WHERE c_custkey % 100 = 0
"""


@register(
    "cdc_upsert_apply",
    f"""
    WITH upd AS ({_CDC_UPD})
    SELECT COALESCE(t.c_custkey, u.k) AS c_custkey,
           CASE WHEN u.k IS NOT NULL THEN u.u_name ELSE t.c_name END
               AS c_name,
           CAST(CASE WHEN u.k IS NOT NULL THEN u.u_nat
                     ELSE t.c_nationkey END AS BIGINT) AS c_nationkey,
           CAST(round(CASE WHEN u.k IS NOT NULL THEN u.u_bal
                           ELSE t.c_acctbal END * 100) AS BIGINT)
               AS acctbal_cents,
           CASE WHEN u.k IS NOT NULL THEN u.u_seg ELSE t.c_mktsegment END
               AS c_mktsegment
    FROM customer t FULL OUTER JOIN upd u ON t.c_custkey = u.k
    """,
)
def q_cdc_upsert_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-INTO semantics on plain parquet (operators/upsert.py): a
    CDC batch (updates to every 5th key + inserts of new keys) applied
    via full-outer join — updates win per key, unmatched target rows
    survive, unmatched source rows insert. The oracle IS the merge
    spec, so the green row proves the portable-MERGE formulation. One
    shuffle on the merge key (zero if both sides are bucketed on it);
    money compared as exact integer cents."""
    from taxi_trips_etl_spark.operators.upsert import upsert

    c = _t(spark, sf_dir, "customer")
    upd = (
        c.filter(F.col("c_custkey") % 5 == 0)
        .select(
            "c_custkey",
            "c_name",
            "c_nationkey",
            (F.col("c_acctbal") + 1000.0).alias("c_acctbal"),
            F.lit("UPDATED").alias("c_mktsegment"),
        )
        .unionByName(
            c.filter(F.col("c_custkey") % 100 == 0).select(
                (F.col("c_custkey") + 10000000).alias("c_custkey"),
                F.concat(
                    F.lit("NEW#"), F.col("c_custkey").cast("string")
                ).alias("c_name"),
                "c_nationkey",
                F.lit(0.0).alias("c_acctbal"),
                F.lit("INSERTED").alias("c_mktsegment"),
            )
        )
    )
    merged = upsert(c, upd, ["c_custkey"])
    return merged.select(
        "c_custkey",
        "c_name",
        F.col("c_nationkey").cast("long").alias("c_nationkey"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("acctbal_cents"),
        "c_mktsegment",
    )


@register(
    "skew_salted_join",
    """
    SELECT o.o_orderkey, o.o_custkey, c.c_mktsegment,
           CAST(round(o.o_totalprice * 100) AS BIGINT) AS totalprice_cents
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def q_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted hot-key join (operators/skew.py): the big side carries
    ONE deterministic xxhash64-derived salt, the small side replicates
    across all 8 salts, and the equi-join runs on (key, salt) — so a
    pathological key spreads over 8 tasks instead of serializing on
    one. The oracle is the PLAIN join: the green row proves salting is
    semantics-preserving (every big row still meets every matching
    small row exactly once). For a broadcastable dim prefer
    F.broadcast; salting is the mid×mid fallback AQE's skew handling
    can't split (single hot KEY, not partition)."""
    from taxi_trips_etl_spark.operators.skew import salted_join

    big = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_custkey").alias("ck"),
        "o_totalprice",
    )
    small = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ck"), "c_mktsegment"
    )
    joined = salted_join(big, small, ["ck"], "inner", salts=8)
    return joined.select(
        "o_orderkey",
        F.col("ck").alias("o_custkey"),
        "c_mktsegment",
        F.round(F.col("o_totalprice") * 100).cast("long").alias(
            "totalprice_cents"
        ),
    )


@register(
    "embedding_int8_quantize",
    """
    WITH e AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    x0 AS (
        SELECT vec_id,
               unnest(generate_series(1, len(v))) AS i,
               unnest(v) AS val
        FROM e
    ),
    x AS (SELECT vec_id, CAST(i - 1 AS BIGINT) AS dim_idx, val FROM x0),
    stats AS (
        SELECT dim_idx, min(val) AS mn, max(val) AS mx
        FROM x GROUP BY dim_idx
    )
    SELECT x.vec_id, x.dim_idx,
           CASE WHEN mx = mn THEN 0
                ELSE CAST(least(255, greatest(0,
                         round((val - mn) / ((mx - mn) / 255.0))))
                     AS BIGINT) - 128 END AS code
    FROM x JOIN stats USING (dim_idx)
    """,
)
def q_embedding_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar int8 quantization (dataprep/quantize.py): per-DIMENSION
    affine codebook (64 rows, one narrow agg) broadcast back onto the
    corpus — float32 vectors become 4x-smaller int8 codes with zero
    corpus-side shuffles. All-IEEE-double arithmetic in an identical
    op order on both engines, so the code values hash-match exactly;
    this is the fully-SQL-expressible end of the quantization spectrum
    (PQ — similarity_pq_topk — is the trained end)."""
    from taxi_trips_etl_spark.dataprep.quantize import quantize_int8

    return quantize_int8(_t(spark, sf_dir, "embeddings"))


def _pagerank_oracle(iters: int = 10) -> str:
    total = 10**12
    head = f"""
    WITH reps AS (
        SELECT o.o_custkey, o.o_orderkey, o.o_orderdate,
               min(l.l_suppkey) AS rep
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2, 3
    ),
    seqd AS (
        SELECT o_custkey, rep,
               lag(rep) OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate, o_orderkey) AS prev
        FROM reps
    ),
    edges AS (
        SELECT DISTINCT prev AS src, rep AS dst FROM seqd
        WHERE prev IS NOT NULL AND prev <> rep
    ),
    nodes AS (SELECT src AS node FROM edges
              UNION SELECT dst FROM edges),
    params AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
    deg AS (SELECT src, CAST(count(*) AS BIGINT) AS d
            FROM edges GROUP BY src),
    r0 AS (SELECT node, {total} // (SELECT n FROM params) AS r FROM nodes)"""
    steps = []
    for k in range(1, iters + 1):
        steps.append(f"""
    r{k} AS (
        SELECT n.node,
               (15 * {total}) // (100 * (SELECT n FROM params))
               + (85 * COALESCE(s.insum, 0)) // 100 AS r
        FROM nodes n LEFT JOIN (
            SELECT e.dst AS node, SUM(r.r // d.d) AS insum
            FROM edges e
            JOIN r{k - 1} r ON r.node = e.src
            JOIN deg d ON d.src = e.src
            GROUP BY e.dst
        ) s ON s.node = n.node
    )""")
    return (
        head
        + ","
        + ",".join(steps)
        + f"""
    SELECT node, CAST(r AS BIGINT) AS rank_e12 FROM r{iters}
    """
    )


@register("graph_pagerank", _pagerank_oracle(10))
def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (dataprep/graph.py) over the supplier-transition graph
    (per customer, consecutive orders' representative suppliers form a
    directed edge) — the link-importance signal web-corpus curation
    pipelines use for page filtering. Integer fixed-point arithmetic
    (1e12 scale, integer division everywhere) makes 10 power
    iterations bit-reproducible regardless of summation order — which
    is what lets a 10-step unrolled-CTE oracle hash-match it exactly.
    Small graphs route to a driver union-loop (same recurrence);
    at scale each round is one ranks⋈edges broadcast join + one
    groupBy(dst) with map-side partial sums, lineage truncated per
    round."""
    from taxi_trips_etl_spark.dataprep.graph import pagerank_auto

    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    reps = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_custkey", "o_orderkey", "o_orderdate")
        .agg(F.min("l_suppkey").alias("rep"))
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    edges = (
        reps.select("rep", F.lag("rep").over(w).alias("prev"))
        .filter(F.col("prev").isNotNull() & (F.col("prev") != F.col("rep")))
        .select(F.col("prev").alias("src"), F.col("rep").alias("dst"))
        .distinct()
    )
    return pagerank_auto(edges, iters=10)


@register("bpe_learn_merges")
def q_bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE merge-rule learning (dataprep/bpe.py): 8 merges over the
    documents word-frequency table — the tokenizer-training half of
    the LLM pipeline (tokenize_with_vocab is the applying half). The
    corpus-sized work is ONE word-count agg; every iteration after
    that touches only the bounded vocabulary. Data-dependent literals
    inside a per-iteration fold are not SQL-expressible → rows-only
    here; pytest pins distributed ≡ driver ≡ hand-computed example."""
    from taxi_trips_etl_spark.dataprep.bpe import learn_bpe_auto

    return learn_bpe_auto(_t(spark, sf_dir, "documents"), n_merges=8)


@register(
    "fuzzy_match_fastss2",
    """
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS edit_dist
    FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
    WHERE a.c_mktsegment = 'BUILDING' AND b.c_mktsegment = 'BUILDING'
      AND levenshtein(a.c_name, b.c_name) <= 2
    """,
)
def q_fuzzy_match_fastss2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FastSS at distance 2 (dataprep/dedup.py fastss_pairs
    max_dist=2): depth-2 symmetric-deletion neighborhoods (self +
    1-deletions + position-pair 2-deletions) meet in an equi-join;
    real levenshtein() verifies survivors, so bucket collisions cost a
    compare, never a wrong answer. O(n·len²) candidate rows vs the
    O(n²) all-pairs matrix the DuckDB oracle brute-forces — the green
    row is the recall proof. Input bounded to one market segment to
    keep the quadratic oracle honest at sf0.1."""
    c = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    return dedup.fastss_pairs(c, "c_custkey", "c_name", max_dist=2)


# ---------------------------------------------------------------------------
# Round 4: chunk-level exact dedup, weighted sampling, entropy/feature
# hashing/bigram-LM text ops, z-score standardization, robust stats,
# time-series windows, skyline, triangles, and the Q21 shape.
# ---------------------------------------------------------------------------

_CHUNK_TOKS = "string_split_regex(trim(lower(text)), '\\s+')"

@register(
    "chunk_dedup_docs",
    f"""
    WITH toks AS (
        SELECT doc_id, {_CHUNK_TOKS} AS t FROM documents
    ),
    chunks AS (
        SELECT doc_id, i - 1 AS chunk_idx,
               array_to_string(
                   list_slice(t, (i - 1) * 10 + 1, (i - 1) * 10 + 10), ' '
               ) AS chunk
        FROM (SELECT doc_id, t,
                     unnest(generate_series(1, ((len(t) - 1) // 10) + 1)) AS i
              FROM toks)
    ),
    marked AS (
        SELECT doc_id, chunk_idx, chunk,
               row_number() OVER (PARTITION BY chunk
                                  ORDER BY doc_id, chunk_idx) AS rn
        FROM chunks
    )
    SELECT doc_id,
           coalesce(string_agg(CASE WHEN rn = 1 THEN chunk END, ' '
                               ORDER BY chunk_idx), '') AS text_dedup,
           CAST(count(*) FILTER (WHERE rn = 1) AS BIGINT) AS n_chunks_kept,
           CAST(count(*) FILTER (WHERE rn > 1) AS BIGINT) AS n_chunks_dropped
    FROM marked GROUP BY doc_id
    """,
)
def q_chunk_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide exact chunk dedup (dataprep/dedup.py:chunk_dedup —
    Lee et al. 2021 restricted to aligned 10-token windows): every
    later byte-identical chunk is dropped, documents reassemble from
    survivors. Two minimal shuffles: first-wins window on md5(chunk),
    ordered reassembly on doc_id. The oracle replays the exact
    first-occurrence rule in DuckDB."""
    return dedup.chunk_dedup(_t(spark, sf_dir, "documents"), chunk_tokens=10)


@register(
    "weighted_priority_sample",
    f"""
    SELECT c_custkey, weight_cents, priority_key FROM (
        SELECT c_custkey,
               CAST(round(c_acctbal * 100) AS BIGINT) AS weight_cents,
               CAST(CAST(concat('0x', substr(
                        md5('wps:' || CAST(c_custkey AS VARCHAR)), 1, 8))
                    AS BIGINT) AS DOUBLE)
                   / CAST(CAST(round(c_acctbal * 100) AS BIGINT) AS DOUBLE)
                   AS priority_key
        FROM customer
        WHERE CAST(round(c_acctbal * 100) AS BIGINT) > 0
    ) ORDER BY priority_key, c_custkey LIMIT 100
    """,
)
def q_weighted_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (dataprep/sampling.py:weighted_priority_sample — priority sampling,
    Duffield-Lund-Thorup): priority = hash-uniform / weight, keep the
    100 smallest. One IEEE division of exact integers per row keeps the
    key bit-identical across engines (no -ln(u) transcendental); the
    global top-k compiles to TakeOrderedAndProject (per-partition
    heaps), never a full sort."""
    from taxi_trips_etl_spark.dataprep.sampling import (
        weighted_priority_sample,
    )

    return weighted_priority_sample(
        _t(spark, sf_dir, "customer"),
        "c_custkey",
        F.round(F.col("c_acctbal") * 100),
        k=100,
        salt="wps",
    )


@register(
    "token_entropy_by_source",
    f"""
    WITH c AS (
        SELECT source, tok, count(*) AS c FROM (
            SELECT source, unnest({_CHUNK_TOKS}) AS tok FROM documents
        ) GROUP BY source, tok
    )
    SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_distinct,
           round(log2(CAST(sum(c) AS DOUBLE))
                 - sum(c * log2(CAST(c AS DOUBLE)))
                   / CAST(sum(c) AS DOUBLE), 6) AS entropy_bits
    FROM c GROUP BY source ORDER BY source
    """,
)
def q_token_entropy_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-distribution Shannon entropy
    (dataprep/text.py:token_entropy) — the corpus-diversity /
    template-spam signal. Single-pass H = log2(N) − Σ c·log2 c / N
    rearrangement: one map-side-combined shuffle on (source, token),
    then a reduce over ≤ vocab rows; round(6) absorbs ~1e-12
    summation-order noise."""
    from taxi_trips_etl_spark.dataprep.text import token_entropy

    return token_entropy(_t(spark, sf_dir, "documents"))


@register(
    "feature_hash_counts",
    f"""
    SELECT doc_id,
           CAST(CAST(concat('0x', substr(md5(tok), 1, 8)) AS BIGINT) % 64
                AS BIGINT) AS bucket,
           count(*) AS n
    FROM (SELECT doc_id, unnest({_CHUNK_TOKS}) AS tok FROM documents)
    GROUP BY 1, 2
    """,
)
def q_feature_hash_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick featurization (dataprep/text.py:feature_hash_counts,
    Weinberger et al. 2009): md5(token) mod 64 buckets → sparse integer
    count vectors with fixed dimensionality, no vocab build, no OOV.
    All-integer output; one explode + one combined shuffle."""
    from taxi_trips_etl_spark.dataprep.text import feature_hash_counts

    return feature_hash_counts(_t(spark, sf_dir, "documents"), n_buckets=64)


@register(
    "bigram_lm_topk",
    f"""
    WITH t AS (
        SELECT doc_id, {_CHUNK_TOKS} AS t FROM documents
        WHERE len({_CHUNK_TOKS}) >= 2
    ),
    pairs AS (
        SELECT t[i] AS w1, t[i + 1] AS w2, count(*) AS pair_n
        FROM (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i FROM t)
        GROUP BY 1, 2
    ),
    heads AS (
        SELECT w1, CAST(sum(pair_n) AS BIGINT) AS head_n
        FROM pairs GROUP BY w1
    ),
    top_heads AS (SELECT w1 FROM heads ORDER BY head_n DESC, w1 LIMIT 20)
    SELECT w1, w2, CAST(pair_n AS BIGINT) AS pair_n, head_n,
           CAST(pair_n AS DOUBLE) / CAST(head_n AS DOUBLE) AS cond_p
    FROM (
        SELECT p.w1, p.w2, p.pair_n, h.head_n,
               row_number() OVER (PARTITION BY p.w1
                                  ORDER BY p.pair_n DESC, p.w2) AS rn
        FROM pairs p JOIN heads h USING (w1) JOIN top_heads USING (w1)
    ) WHERE rn <= 3
    """,
)
def q_bigram_lm_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram LM summary (dataprep/text.py:bigram_lm_topk): top-3
    successors with P(w2|w1) for the 20 most frequent heads. Bigrams
    come from a token-array zip (no self-join); windows run over the
    vocab² aggregate, never the corpus; the head cut is a broadcast
    TakeOrderedAndProject semi-join, not a global window. Exact counts,
    one IEEE division per probability."""
    from taxi_trips_etl_spark.dataprep.text import bigram_lm_topk

    return bigram_lm_topk(
        _t(spark, sf_dir, "documents"), heads=20, next_per_head=3
    )


@register(
    "embedding_zscore",
    """
    WITH xs AS (
        SELECT vec_id, i - 1 AS dim_idx, CAST(embedding[i] AS DOUBLE) AS x
        FROM (SELECT vec_id, embedding,
                     unnest(generate_series(1, len(embedding))) AS i
              FROM embeddings)
    ),
    st AS (
        SELECT dim_idx, sum(x) / CAST(count(*) AS DOUBLE) AS mu,
               sqrt(greatest(
                   sum(x * x) / CAST(count(*) AS DOUBLE)
                   - (sum(x) / CAST(count(*) AS DOUBLE))
                     * (sum(x) / CAST(count(*) AS DOUBLE)), 0.0)) AS sigma
        FROM xs GROUP BY dim_idx
    )
    SELECT CAST(xs.vec_id AS BIGINT) AS vec_id,
           CAST(xs.dim_idx AS BIGINT) AS dim_idx,
           round(CASE WHEN sigma = 0 THEN 0.0
                      ELSE (x - mu) / sigma END, 6) AS z
    FROM xs JOIN st USING (dim_idx)
    WHERE vec_id < 5
    """,
)
def q_embedding_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension z-score standardization
    (dataprep/similarity.py:standardize_dims) — the feature-scaling
    step ahead of k-means/PCA/ANN. Stats are one posexplode +
    map-side-combined groupBy(dim) over ALL vectors; the d-row stats
    table joins back as a broadcast; output sampled to vec_id < 5.
    round(6) absorbs partial-sum-order noise (~1e-12)."""
    from taxi_trips_etl_spark.dataprep.similarity import standardize_dims

    return standardize_dims(_t(spark, sf_dir, "embeddings"), id_below=5)


@register(
    "mad_outliers",
    """
    WITH pts AS (
        SELECT c_nationkey,
               CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
        FROM customer
    ),
    m AS (SELECT c_nationkey, median(bal_cents) AS med
          FROM pts GROUP BY c_nationkey),
    d AS (SELECT p.c_nationkey, p.bal_cents, m.med,
                 abs(p.bal_cents - m.med) AS dev
          FROM pts p JOIN m USING (c_nationkey)),
    md AS (SELECT c_nationkey, median(dev) AS mad
           FROM d GROUP BY c_nationkey)
    SELECT d.c_nationkey, round(max(d.med), 1) AS med_cents,
           round(max(md.mad), 1) AS mad_cents,
           CAST(count(*) AS BIGINT) AS n_cust,
           CAST(count(*) FILTER (WHERE d.dev > 3 * md.mad) AS BIGINT)
               AS n_outliers
    FROM d JOIN md USING (c_nationkey)
    GROUP BY d.c_nationkey ORDER BY d.c_nationkey
    """,
)
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-absolute-deviation robust outlier screen per nation — the
    heavy-tail-safe sibling of iqr_outliers. One shuffle on nation,
    then three in-partition window passes over the SAME partitioning
    (exact median, MAD of deviations, threshold count) — Spark reuses
    the single Exchange for all three windows, so robust stats cost no
    more shuffles than a plain groupBy. Medians are exact interpolated
    percentiles (integer cents → .0/.5 values, engine-portable)."""
    c = _t(spark, sf_dir, "customer").select(
        "c_nationkey",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_cents"),
    )
    w = Window.partitionBy("c_nationkey")
    d = c.withColumn(
        "med", F.percentile("bal_cents", F.lit(0.5)).over(w)
    ).withColumn("dev", F.abs(F.col("bal_cents") - F.col("med")))
    d = d.withColumn("mad", F.percentile("dev", F.lit(0.5)).over(w))
    return (
        d.groupBy("c_nationkey")
        .agg(
            F.round(F.max("med"), 1).alias("med_cents"),
            F.round(F.max("mad"), 1).alias("mad_cents"),
            F.count(F.lit(1)).cast("long").alias("n_cust"),
            F.sum((F.col("dev") > 3 * F.col("mad")).cast("long"))
            .cast("long")
            .alias("n_outliers"),
        )
        .orderBy("c_nationkey")
    )


# Exponential weights 0.7^j, j=0..19, generated once by repeated
# multiplication and inlined as IDENTICAL double literals on both
# engines — pow() is transcendental and libm-dependent, literals are
# not. Index convention: _EWMA_W[0] weights the CURRENT row.
_EWMA_W = [0.7 ** j for j in range(20)]
_EWMA_W_SQL = "[" + ", ".join(repr(w) for w in _EWMA_W) + "]"


@register(
    "ewma_daily_revenue",
    f"""
    WITH daily AS (
        SELECT c.c_nationkey,
               strftime(CAST(o.o_orderdate AS DATE), '%Y-%m-%d') AS day,
               CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS daily_cents
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2
    ),
    win AS (
        SELECT c_nationkey, day, daily_cents,
               list(daily_cents) OVER (
                   PARTITION BY c_nationkey ORDER BY day
                   ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS xs
        FROM daily
    )
    SELECT c_nationkey, day, daily_cents,
           round(
               list_sum(list_transform(generate_series(1, len(xs)),
                   i -> (CAST(xs[i] AS DOUBLE) / 100.0)
                        * ({_EWMA_W_SQL})[len(xs) - i + 1]))
               / list_sum(list_transform(generate_series(1, len(xs)),
                   i -> ({_EWMA_W_SQL})[len(xs) - i + 1])), 4) AS ewma
    FROM win
    """,
)
def q_ewma_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of daily revenue per nation
    (trailing 20 observations, decay 0.7) — the smoothing primitive for
    monitoring/seasonality features. The weights are PRE-COMPUTED
    literals shared verbatim with the oracle, and both engines fold the
    SAME trailing list left-to-right, so the float result is
    bit-identical before the insurance round(4). One shuffle on nation
    builds the daily series; the window frame is rows-based (20
    elements max), so state per row is O(20) at any scale."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    daily = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy(
            "c_nationkey",
            F.date_format(F.to_date("o_orderdate"), "yyyy-MM-dd").alias(
                "day"
            ),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("daily_cents")
        )
    )
    w = (
        Window.partitionBy("c_nationkey")
        .orderBy("day")
        .rowsBetween(-19, Window.currentRow)
    )
    ws = "array(" + ", ".join(repr(x) + "D" for x in _EWMA_W) + ")"
    ewma = F.expr(
        f"round(aggregate(sequence(0, size(xs) - 1), 0.0D, (acc, i) -> "
        f"acc + (CAST(element_at(xs, i + 1) AS DOUBLE) / 100.0D) "
        f"* element_at({ws}, size(xs) - i)) / "
        f"aggregate(sequence(0, size(xs) - 1), 0.0D, (acc, i) -> "
        f"acc + element_at({ws}, size(xs) - i)), 4)"
    )
    return (
        daily.withColumn("xs", F.collect_list("daily_cents").over(w))
        .select("c_nationkey", "day", "daily_cents", ewma.alias("ewma"))
    )


@register(
    "rolling_corr_revenue",
    """
    WITH g AS (
        SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS day,
               CAST(sum(CAST(round(o_totalprice) AS BIGINT)) AS BIGINT) AS y
        FROM orders GROUP BY 1
    ),
    n1 AS (
        SELECT strftime(CAST(o.o_orderdate AS DATE), '%Y-%m-%d') AS day,
               CAST(sum(CAST(round(o.o_totalprice) AS BIGINT)) AS BIGINT) AS x
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_nationkey = 1 GROUP BY 1
    ),
    j AS (SELECT n1.day, CAST(n1.x AS HUGEINT) AS x,
                 CAST(g.y AS HUGEINT) AS y FROM n1 JOIN g USING (day)),
    w AS (
        -- HUGEINT operands: sum() only promotes its ACCUMULATOR, the
        -- x*x / x*y products would still be evaluated in int64 and
        -- overflow around sf 30 — cast the inputs so every product
        -- and sum is int128, matching Spark's decimal(38,0) envelope.
        SELECT day, x, y,
               count(*) OVER tw AS n,
               sum(x) OVER tw AS sx, sum(y) OVER tw AS sy,
               sum(x * y) OVER tw AS sxy,
               sum(x * x) OVER tw AS sxx, sum(y * y) OVER tw AS syy,
               row_number() OVER (ORDER BY day) AS rn
        FROM j
        WINDOW tw AS (ORDER BY day ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)
    )
    SELECT day,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                    * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6) AS corr
    FROM w
    WHERE rn >= 30 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
    """,
)
def q_rolling_corr_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-30-observation Pearson correlation between nation 1's
    daily revenue and the global daily total — the co-movement monitor.
    The five sufficient statistics are EXACT wide integers — Spark
    carries them as decimal(38,0), the oracle as HUGEINT (int128),
    because plain int64 products of daily-revenue squares wrap/overflow
    around sf 3-30 — and only the final sqrt/divide touches floats
    (identical operands → identical result; round(6) is insurance).
    Window state is O(1) per row via running sums — no list
    materialization at scale. Degenerate (zero-variance) windows are
    filtered, as are the first 29 partial windows."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    day = F.date_format(F.to_date("o_orderdate"), "yyyy-MM-dd").alias("day")
    dollars = F.round(F.col("o_totalprice")).cast("long")
    g = o.groupBy(day).agg(F.sum(dollars).cast("long").alias("y"))
    n1 = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .filter(F.col("c_nationkey") == 1)
        .groupBy(day)
        .agg(F.sum(dollars).cast("long").alias("x"))
    )
    j = n1.join(g, "day")
    tw = Window.orderBy("day").rowsBetween(-29, Window.currentRow)
    rw = Window.orderBy("day")
    # Sufficient statistics in DECIMAL, not long: DuckDB's sum(BIGINT)
    # promotes to HUGEINT (int128) while a long sum in Spark would
    # silently WRAP once daily-revenue squares grow past 2^63 (reached
    # around sf 3-10) — the engines would diverge exactly at scale.
    # decimal(38,0) keeps every product/sum exact to 1e38 (centuries
    # of headroom past 100 TB) and converts to the same double.
    xd = F.col("x").cast("decimal(20,0)")
    yd = F.col("y").cast("decimal(20,0)")
    wdf = j.select(
        "day",
        F.count(F.lit(1)).over(tw).alias("n"),
        F.sum(xd).over(tw).alias("sx"),
        F.sum(yd).over(tw).alias("sy"),
        F.sum(xd * yd).over(tw).alias("sxy"),
        F.sum(xd * xd).over(tw).alias("sxx"),
        F.sum(yd * yd).over(tw).alias("syy"),
        F.row_number().over(rw).alias("rn"),
    )
    varx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return (
        wdf.filter((F.col("rn") >= 30) & (varx > 0) & (vary > 0))
        .select(
            "day",
            F.round(
                num.cast("double")
                / (F.sqrt(varx.cast("double")) * F.sqrt(vary.cast("double"))),
                6,
            ).alias("corr"),
        )
    )


@register(
    "pareto_frontier",
    """
    WITH pts AS (
        SELECT c.c_nationkey, c.c_custkey,
               CAST(round(c.c_acctbal * 100) AS BIGINT) AS bal_cents,
               CAST(coalesce(o.n, 0) AS BIGINT) AS n_orders
        FROM customer c LEFT JOIN (
            SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey
        ) o ON c.c_custkey = o.o_custkey
    )
    SELECT c_nationkey, c_custkey, bal_cents, n_orders FROM pts p
    WHERE NOT EXISTS (
        SELECT 1 FROM pts q
        WHERE q.c_nationkey = p.c_nationkey
          AND q.bal_cents >= p.bal_cents AND q.n_orders >= p.n_orders
          AND (q.bal_cents > p.bal_cents OR q.n_orders > p.n_orders)
    )
    """,
)
def q_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline per nation: customers not dominated on (balance,
    order count). The ORACLE is the literal O(n²) NOT-EXISTS dominance
    test; the Spark side is the sort-based linear scan — two window
    maxima over ONE shuffle on nation (max orders over strictly-higher
    balances via a range frame, max among balance peers), dominated iff
    either beats the row. Hash equality between the two is the proof
    the O(n log n) plan computes the same frontier."""
    c = _t(spark, sf_dir, "customer")
    o = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    pts = c.join(o, c["c_custkey"] == o["o_custkey"], "left").select(
        "c_nationkey",
        "c_custkey",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_cents"),
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_orders"),
    )
    w_high = (
        Window.partitionBy("c_nationkey")
        .orderBy("bal_cents")
        .rangeBetween(1, Window.unboundedFollowing)
    )
    w_peer = Window.partitionBy("c_nationkey", "bal_cents")
    dominated = (
        F.coalesce(
            F.max("n_orders").over(w_high) >= F.col("n_orders"), F.lit(False)
        )
    ) | (F.max("n_orders").over(w_peer) > F.col("n_orders"))
    return (
        pts.withColumn("dom", dominated)
        .filter(~F.col("dom"))
        .select("c_nationkey", "c_custkey", "bal_cents", "n_orders")
    )


@register(
    "graph_triangles",
    """
    WITH reps AS (
        SELECT o_custkey, o_orderkey, o_orderdate, min(l_suppkey) AS rep
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY 1, 2, 3
    ),
    tr AS (
        SELECT rep, lag(rep) OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey) AS prev
        FROM reps
    ),
    edges AS (
        SELECT DISTINCT least(prev, rep) AS lo, greatest(prev, rep) AS hi
        FROM tr WHERE prev IS NOT NULL AND prev <> rep
    ),
    tris AS (
        SELECT e1.lo AS a, e1.hi AS b, e2.hi AS c
        FROM edges e1
        JOIN edges e2 ON e1.hi = e2.lo
        JOIN edges e3 ON e3.lo = e1.lo AND e3.hi = e2.hi
    ),
    corners AS (
        SELECT a AS node FROM tris
        UNION ALL SELECT b FROM tris
        UNION ALL SELECT c FROM tris
    )
    SELECT node, count(*) AS n_triangles
    FROM corners GROUP BY node ORDER BY node
    """,
)
def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts (dataprep/graph.py:triangle_count) over
    the same supplier-transition graph graph_pagerank walks, taken
    undirected — the local-clustering / link-farm signal. Compact-
    forward enumeration (a<b<c) produces each triangle exactly once
    through two hash equi-joins on a checkpointed canonical edge list;
    the oracle replays the identical enumeration declaratively."""
    from taxi_trips_etl_spark.dataprep.graph import triangle_count

    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    reps = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_custkey", "o_orderkey", "o_orderdate")
        .agg(F.min("l_suppkey").alias("rep"))
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    edges = (
        reps.select("rep", F.lag("rep").over(w).alias("prev"))
        .filter(F.col("prev").isNotNull() & (F.col("prev") != F.col("rep")))
        .select(F.col("prev").alias("src"), F.col("rep").alias("dst"))
    )
    return triangle_count(edges)


@register(
    "tpch_suppliers_waiting",
    """
    WITH li AS (
        SELECT l_orderkey, l_suppkey,
               (l_suppkey % 45) > (l_partkey % 30) AS late
        FROM lineitem
    )
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM li l1
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
                  AND o.o_orderstatus = 'F'
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE l1.late
      AND EXISTS (SELECT 1 FROM li l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM li l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name LIMIT 20
    """,
)
def q_tpch_suppliers_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting), adapted: no
    commit/receipt dates in this testdata, so lateness derives
    deterministically from key arithmetic on both engines. The ORACLE
    keeps the spec's correlated EXISTS / NOT-EXISTS pair; the Spark
    side replaces BOTH with one per-order pre-aggregation — distinct
    suppliers and distinct LATE suppliers per order — joined once:
    'another supplier exists' ⇔ n_supp ≥ 2, 'no other late supplier' ⇔
    n_late_supp = 1 (the row's own supplier is late). Two scans of
    lineitem total, vs four in the naive decorrelation — the
    agg-then-join rewrite is the scale win this entry pins."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        ((F.col("l_suppkey") % 45) > (F.col("l_partkey") % 30)).alias("late"),
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("late"), F.col("l_suppkey"))
        ).alias("n_late_supp"),
    )
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    s = F.broadcast(_t(spark, sf_dir, "supplier").select("s_suppkey", "s_name"))
    return (
        li.filter(F.col("late"))
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(per_order, "l_orderkey")
        .filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


@register(
    "streaming_static_enrich",
    """
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           CAST(c.c_nationkey AS BIGINT) AS c_nationkey,
           e.event_type,
           count(*) AS n_events,
           round(sum(e.value), 2) AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2, 3
    """,
)
def q_streaming_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment (streaming/static_enrich.py): the event
    stream broadcast-joins the customer dim per micro-batch (dim
    refreshes land without a restart; the stream side never shuffles
    for the join), then a watermarked 1-day-window aggregation. The
    AvailableNow complete-mode output must equal the one-shot batch
    join+aggregate — the oracle IS that batch query."""
    from taxi_trips_etl_spark.streaming.static_enrich import (
        run_streaming_static_enrich,
    )

    return run_streaming_static_enrich(
        spark,
        f"{sf_dir}/events.parquet",
        _t(spark, sf_dir, "customer"),
        sink_table="static_enrich_oracle_run",
    )


@register(
    "streaming_cdc_upsert",
    """
    SELECT user_id, last_event_id, last_ts, last_type, last_value FROM (
        SELECT user_id,
               event_id AS last_event_id,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts,
               event_type AS last_type,
               value AS last_value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)
def q_streaming_cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch CDC apply (streaming/stream_upsert.py): micro-batches
    of the event feed merge into a per-user state table, newest
    (ts, event_id) wins. The merge is a commutative/associative
    reduction, so the final state is independent of batch splits and
    arrival order — which is exactly why the whole-feed argmax oracle
    can hash-match it (and why redelivered batches are no-ops in
    production). Multi-batch splitting is pytest-pinned equal to this
    single-batch run."""
    from taxi_trips_etl_spark.streaming.stream_upsert import (
        run_streaming_cdc_upsert,
    )

    out = run_streaming_cdc_upsert(spark, f"{sf_dir}/events.parquet")
    return out.select(
        "user_id",
        "last_event_id",
        _ts_str(F.col("last_ts"), "last_ts"),
        "last_type",
        "last_value",
    )


@register(
    "quality_classifier_score",
    f"""
    WITH feat AS (
        SELECT doc_id,
               CAST(CAST(concat('0x', substr(md5(tok), 1, 8)) AS BIGINT) % 64
                    AS BIGINT) AS bucket,
               count(*) AS n
        FROM (SELECT doc_id, unnest({_CHUNK_TOKS}) AS tok FROM documents)
        GROUP BY 1, 2
    ),
    scored AS (
        SELECT doc_id,
               sum(n * ((bucket * 37 + 11) % 21 - 10)) AS margin_scaled,
               sum(n) AS n_tokens
        FROM feat GROUP BY doc_id
    )
    SELECT doc_id,
           CAST(margin_scaled AS BIGINT) AS margin_scaled,
           CAST(margin_scaled AS DOUBLE) / (10.0 * CAST(n_tokens AS DOUBLE))
               AS margin,
           CASE WHEN margin_scaled > 0 THEN 'keep' ELSE 'drop' END AS label
    FROM scored
    """,
)
def q_quality_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear quality-classifier inference at scale (the fasttext-style
    filter every web-corpus pipeline runs): hashed token features ×
    a weight vector → per-document margin and keep/drop label. Weights
    here are the deterministic literal family w_b = ((37b+11) mod 21
    − 10)/10 so both engines share them exactly; the margin accumulates
    as an EXACT INTEGER (count × integer weight) and floats appear only
    in one final division. Composition: feature_hash_counts → one more
    map-side-combined groupBy(doc_id) — the corpus is touched once, and
    a real trained weight vector drops in as a literal array the same
    way (broadcast-free, codegen-friendly)."""
    from taxi_trips_etl_spark.dataprep.text import feature_hash_counts

    feats = feature_hash_counts(_t(spark, sf_dir, "documents"), n_buckets=64)
    w_int = (F.col("bucket") * 37 + 11) % 21 - 10
    return (
        feats.groupBy("doc_id")
        .agg(
            F.sum(F.col("n") * w_int).cast("long").alias("margin_scaled"),
            F.sum("n").alias("n_tokens"),
        )
        .select(
            "doc_id",
            "margin_scaled",
            (
                F.col("margin_scaled").cast("double")
                / (F.lit(10.0) * F.col("n_tokens").cast("double"))
            ).alias("margin"),
            F.when(F.col("margin_scaled") > 0, "keep")
            .otherwise("drop")
            .alias("label"),
        )
    )


@register(
    "month_over_month_growth",
    """
    WITH monthly AS (
        SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d')
                   AS month_start,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS revenue_cents
        FROM orders GROUP BY 1
    )
    SELECT month_start, revenue_cents,
           CAST(revenue_cents - lag(revenue_cents)
                    OVER (ORDER BY month_start) AS BIGINT) AS delta_cents,
           round(CAST(revenue_cents - lag(revenue_cents)
                          OVER (ORDER BY month_start) AS DOUBLE)
                 / CAST(lag(revenue_cents)
                            OVER (ORDER BY month_start) AS DOUBLE), 6)
               AS mom_growth
    FROM monthly
    """,
)
def q_month_over_month_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth — the period-over-period KPI
    family (lag over a calendar aggregate). Revenue is exact integer
    cents; growth is one IEEE division of those integers (round 6 is
    insurance only). The window is global but CALENDAR-BOUNDED (≤ one
    row per month regardless of fact size), the same
    aggregate-then-window posture as the popularity rank; the first
    month yields NULLs by definition."""
    o = _t(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd")
        .alias("month_start")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("revenue_cents")
    )
    w = Window.orderBy("month_start")
    prev = F.lag("revenue_cents").over(w)
    return monthly.select(
        "month_start",
        "revenue_cents",
        (F.col("revenue_cents") - prev).cast("long").alias("delta_cents"),
        F.round(
            (F.col("revenue_cents") - prev).cast("double")
            / prev.cast("double"),
            6,
        ).alias("mom_growth"),
    )


@register(
    "constraint_quarantine",
    f"""
    SELECT strftime(pickup_datetime, '%Y-%m-%d %H:%M:%S') AS pickup_ts,
           passenger_count, trip_distance,
           CAST(round(fare_amount * 100) AS BIGINT) AS fare_cents,
           concat_ws(',',
               CASE WHEN pickup_datetime = dropoff_datetime
                    THEN 'zero_duration' END,
               CASE WHEN passenger_count IS NULL OR passenger_count = 0
                    THEN 'no_passengers' END,
               CASE WHEN trip_distance IS NULL OR trip_distance = 0
                    THEN 'zero_distance' END,
               CASE WHEN fare_amount = 0 THEN 'zero_fare' END
           ) AS reasons
    FROM ({TRIPS_SQL})
    WHERE pickup_datetime = dropoff_datetime
       OR passenger_count IS NULL OR passenger_count = 0
       OR trip_distance IS NULL OR trip_distance = 0
       OR fare_amount = 0
    """,
)
def q_constraint_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The normalize filter's REJECT side, with per-row reason labels —
    the quarantine/dead-letter pattern (SURVEY §2.2's predicate run in
    reverse; validate_constraints gives the counts, this gives the
    rows). One scan, one codegen span: each CASE re-tests one predicate
    and concat_ws drops the NULLs of passed checks, so the reason
    string is deterministic and engine-portable. At 100 TB the rejects
    sink to their own partitioned table for triage while the pass side
    flows on — nothing recomputes."""
    trips = trips_from_lineitem(_t(spark, sf_dir, "lineitem"))
    zero_dur = F.col("pickup_datetime") == F.col("dropoff_datetime")
    no_pass = F.col("passenger_count").isNull() | (
        F.col("passenger_count") == 0
    )
    zero_dist = F.col("trip_distance").isNull() | (
        F.col("trip_distance") == 0
    )
    zero_fare = F.col("fare_amount") == 0
    return trips.filter(zero_dur | no_pass | zero_dist | zero_fare).select(
        _ts_str(F.col("pickup_datetime"), "pickup_ts"),
        "passenger_count",
        "trip_distance",
        F.round(F.col("fare_amount") * 100).cast("long").alias("fare_cents"),
        F.concat_ws(
            ",",
            F.when(zero_dur, "zero_duration"),
            F.when(no_pass, "no_passengers"),
            F.when(zero_dist, "zero_distance"),
            F.when(zero_fare, "zero_fare"),
        ).alias("reasons"),
    )


@register(
    "weighted_sample_per_group",
    """
    SELECT source, doc_id, weight, priority_key FROM (
        SELECT source, doc_id, weight, priority_key,
               row_number() OVER (PARTITION BY source
                                  ORDER BY priority_key, doc_id) AS rn
        FROM (
            SELECT source, doc_id, CAST(n_chars AS BIGINT) AS weight,
                   CAST(CAST(concat('0x', substr(
                            md5('wpg:' || CAST(doc_id AS VARCHAR)), 1, 8))
                        AS BIGINT) AS DOUBLE) / CAST(n_chars AS DOUBLE)
                       AS priority_key
            FROM documents WHERE n_chars > 0
        )
    ) WHERE rn <= 5
    """,
)
def q_weighted_sample_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group weighted sampling without replacement (5 docs per
    source, weight = document length) — the domain-balanced corpus
    draw: every domain contributes a fixed quota, length-weighted
    within. Same bit-exact priority key as weighted_priority_sample
    (hash-uniform / integer weight, one IEEE division), but the top-k
    runs PER GROUP via a row_number window over the group partition —
    one shuffle on source, heap-free, no global sort anywhere."""
    d = _t(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("wpg:"), F.col("doc_id").cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    pk = u.cast("double") / F.col("n_chars").cast("double")
    w = Window.partitionBy("source").orderBy("priority_key", "doc_id")
    return (
        d.select(
            "source",
            "doc_id",
            F.col("n_chars").cast("long").alias("weight"),
            pk.alias("priority_key"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("source", "doc_id", "weight", "priority_key")
    )


@register(
    "rolling_active_users",
    """
    WITH act AS (
        SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
    ),
    spine AS (SELECT DISTINCT d FROM act)
    SELECT strftime(s.d, '%Y-%m-%d') AS day,
           CAST(count(DISTINCT a.user_id) AS BIGINT) AS active_users_28d
    FROM spine s JOIN act a
      ON a.d <= s.d AND a.d >= s.d - INTERVAL 27 DAY
    GROUP BY s.d
    """,
)
def q_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 28-day active users per day — the MAU/WAU engagement KPI
    family. A windowed COUNT DISTINCT cannot ride a frame (distinct
    doesn't decompose into running state), so the scale shape is:
    reduce the event stream to the DAY-GRANULAR activity table
    (distinct (day, user) — bounded by days × users, not event
    volume), broadcast the ~calendar-sized day spine against it as a
    range join, and count distinct per spine day. The corpus-sized
    work is one distinct; everything after is calendar-bounded."""
    ev = (
        _events(spark, sf_dir)
        .select(F.to_date("ts").alias("d"), "user_id")
        .distinct()
    )
    spine = F.broadcast(ev.select("d").distinct().alias("s"))
    a = ev.alias("a")
    j = spine.join(
        a,
        (F.col("a.d") <= F.col("s.d"))
        & (F.col("a.d") >= F.date_sub(F.col("s.d"), 27)),
    )
    return (
        j.groupBy("s.d")
        .agg(F.countDistinct("a.user_id").cast("long").alias(
            "active_users_28d"
        ))
        .select(F.date_format("d", "yyyy-MM-dd").alias("day"),
                "active_users_28d")
    )


# GPT-2-style pre-tokenizer, simplified to constructs whose semantics
# are identical in Java regex (Spark) and RE2 (DuckDB): runs of
# letters, runs of digits, single other-non-space chars. The
# whitespace set is ENUMERATED rather than \s because the engines'
# \s differ at the edge (Java includes vertical tab \x0B, RE2 does
# not) — with the explicit class, \x0B counts as punctuation on both.
_PRETOK_RE = "[a-z]+|[0-9]+|[^a-z0-9 \\t\\n\\f\\r]"


@register(
    "regex_pretokenize_counts",
    f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(lower(text), '{_PRETOK_RE}'))
                AS BIGINT) AS n_subtokens,
           CAST(len(string_split_regex(trim(lower(text)),
                                       '[ \t\n\f\r]+')) AS BIGINT)
               AS n_ws_tokens,
           CAST(len(list_distinct(
                    regexp_extract_all(lower(text), '{_PRETOK_RE}')))
                AS BIGINT) AS n_distinct_subtokens
    FROM documents
    """,
)
def q_regex_pretokenize_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-style regex pre-tokenization counts (the GPT-2 pattern's
    portable core: letter runs | digit runs | single punctuation) next
    to the whitespace tokenization — the token-budget estimator run
    before committing to a tokenizer. Pure JVM regexp_extract_all in
    one codegen span; the pattern is restricted to constructs where
    Java regex and RE2 agree, which is what lets the oracle share it
    verbatim."""
    docs = _t(spark, sf_dir, "documents")
    # NOTE: the function form with a lit() pattern, not an F.expr SQL
    # string — Spark's single-quoted SQL literals consume backslash
    # escapes ('\\s' arrives as 's'), which silently turned the
    # negated class into one that MATCHES spaces. The whitespace split
    # below enumerates its class for the same Java-\s ⊃ RE2-\s reason
    # as _PRETOK_RE (vertical tab).
    sub = F.regexp_extract_all(
        F.lower(F.col("text")), F.lit(_PRETOK_RE), 0
    )
    return docs.select(
        "doc_id",
        F.size(sub).cast("long").alias("n_subtokens"),
        F.size(F.split(F.trim(F.lower(F.col("text"))), r"[ \t\n\f\r]+"))
        .cast("long")
        .alias("n_ws_tokens"),
        F.size(F.array_distinct(sub))
        .cast("long")
        .alias("n_distinct_subtokens"),
    )


@register(
    "source_distinctive_terms",
    f"""
    WITH tok AS (
        SELECT source, tok, count(*) AS a FROM (
            SELECT source, unnest({_CHUNK_TOKS}) AS tok FROM documents
        ) GROUP BY 1, 2
    ),
    tot AS (SELECT tok, sum(a) AS t FROM tok GROUP BY tok),
    src AS (SELECT source, sum(a) AS sa FROM tok GROUP BY source),
    all_n AS (SELECT sum(a) AS n FROM tok)
    SELECT source, tok,
           CAST(a AS BIGINT) AS n_in_source,
           CAST(t - a AS BIGINT) AS n_elsewhere,
           round(ln((a + 1.0) / (sa - a + 1.0))
                 - ln((t - a + 1.0) / ((n - sa) - (t - a) + 1.0)), 6)
               AS log_odds,
           CAST(rnk AS BIGINT) AS rnk
    FROM (
        SELECT tok.source, tok.tok, tok.a, tot.t, src.sa, all_n.n,
               row_number() OVER (
                   PARTITION BY tok.source
                   ORDER BY ln((tok.a + 1.0) / (src.sa - tok.a + 1.0))
                            - ln((tot.t - tok.a + 1.0)
                                 / ((all_n.n - src.sa)
                                    - (tot.t - tok.a) + 1.0)) DESC,
                            tok.tok) AS rnk
        FROM tok JOIN tot USING (tok) JOIN src USING (source)
                 CROSS JOIN all_n
    ) WHERE rnk <= 5
    """,
)
def q_source_distinctive_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinctive terms per source via smoothed log-odds (Monroe et
    al.'s 'Fightin' Words' without the prior variance term) — the
    domain-fingerprinting op behind corpus mixing decisions. Exact
    integer counts feed ln() on identical operands; window ranks run
    over the vocab-bounded aggregate; the corpus-wide stats (per-term
    totals, per-source totals, grand total) join back as broadcasts.
    Ties (uniform synthetic text makes many) break on the term, so
    top-5 is deterministic."""
    docs = _t(spark, sf_dir, "documents")
    spark_tok = (
        # spread() on high-cardinality doc_id, NOT source: hashing
        # into ~20 source values would cap the CPU-heavy split+explode
        # at 20 tasks (the tokens_table docstring trap).
        dedup.spread(
            docs.select(
                "doc_id", "source", dedup.tokens_col("text").alias("toks")
            )
        )
        .select("source", F.explode("toks").alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("a"))
    )
    tot = spark_tok.groupBy("tok").agg(F.sum("a").alias("t"))
    src = spark_tok.groupBy("source").agg(F.sum("a").alias("sa"))
    n = spark_tok.agg(F.sum("a").alias("n"))
    j = (
        spark_tok.join(F.broadcast(tot), "tok")
        .join(F.broadcast(src), "source")
        .crossJoin(F.broadcast(n))
    )
    log_odds = F.log((F.col("a") + 1.0) / (F.col("sa") - F.col("a") + 1.0)) - F.log(
        (F.col("t") - F.col("a") + 1.0)
        / ((F.col("n") - F.col("sa")) - (F.col("t") - F.col("a")) + 1.0)
    )
    w = Window.partitionBy("source").orderBy(log_odds.desc(), F.asc("tok"))
    return (
        j.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select(
            "source",
            "tok",
            F.col("a").cast("long").alias("n_in_source"),
            (F.col("t") - F.col("a")).cast("long").alias("n_elsewhere"),
            F.round(log_odds, 6).alias("log_odds"),
            F.col("rnk").cast("long").alias("rnk"),
        )
    )


@register(
    "time_weighted_average",
    """
    WITH seq AS (
        SELECT user_id, value, ts,
               lead(ts) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS next_ts
        FROM events
    ),
    seg AS (
        SELECT user_id, value,
               CAST(date_diff('second', ts, next_ts) AS BIGINT) AS dur_s
        FROM seq WHERE next_ts IS NOT NULL
    )
    SELECT user_id,
           CAST(sum(dur_s) AS BIGINT) AS total_s,
           round(sum(value * CAST(dur_s AS DOUBLE))
                 / CAST(sum(dur_s) AS DOUBLE), 4) AS twap
    FROM seg WHERE dur_s > 0
    GROUP BY user_id
    """,
)
def q_time_weighted_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of an irregular event series per user (the
    TWAP/sensor-integration primitive): each reading holds until the
    next one, so it weighs by its holding duration. Durations are
    EXACT integer seconds (epoch diffs) and the only floats are the
    value×duration products and one final division — round(4) absorbs
    the summation-order difference between Spark's partial aggregates
    and the oracle's sequential sum. One shuffle on user_id serves the
    lead window; the aggregation reuses the same partitioning (zero
    extra exchanges)."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = (
        ev.select(
            "user_id",
            "value",
            F.unix_timestamp("ts").alias("t"),
            F.unix_timestamp(F.lead("ts").over(w)).alias("next_t"),
        )
        .filter(F.col("next_t").isNotNull())
        .select(
            "user_id",
            "value",
            (F.col("next_t") - F.col("t")).alias("dur_s"),
        )
        .filter(F.col("dur_s") > 0)
    )
    return seg.groupBy("user_id").agg(
        F.sum("dur_s").cast("long").alias("total_s"),
        F.round(
            F.sum(F.col("value") * F.col("dur_s").cast("double"))
            / F.sum("dur_s").cast("double"),
            4,
        ).alias("twap"),
    )


@register(
    "streaming_ingest_dedup",
    f"""
    WITH shingled AS ({GRAMS_SQL}),
    sig AS (SELECT doc_id, {_MINHASH_SIG_SQL} FROM shingled),
    bands AS ({_MINHASH_BANDS_SQL}),
    dups AS (
        SELECT DISTINCT b.doc_id FROM bands a JOIN bands b
          ON a.band_id = b.band_id AND a.band_key = b.band_key
         AND a.doc_id < b.doc_id
    )
    SELECT d.doc_id FROM documents d
    WHERE d.doc_id NOT IN (SELECT doc_id FROM dups)
    """,
)
def q_streaming_ingest_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming corpus ingestion with incremental near-dup rejection
    (streaming/ingest_dedup.py): each micro-batch LSH-pairs ONLY
    against the accumulated band index (plus itself), never
    corpus×corpus, and clean docs append to the sink. Drained here
    with AvailableNow over the documents table; the keep rule — a doc
    survives unless it band-collides with an earlier-ingested/lower-id
    doc — is replayed by the oracle's one-shot LSH over the whole
    corpus (single-source drain ⇒ identical semantics; multi-batch
    splits are pytest-pinned in test_streaming_ingest_dedup)."""
    import shutil
    import tempfile

    from taxi_trips_etl_spark.streaming.ingest_dedup import (
        run_streaming_ingest_dedup,
    )

    docs = _t(spark, sf_dir, "documents")
    work = tempfile.mkdtemp(prefix="ingest_dedup_q_")
    try:
        # The file-stream source wants a directory; stage the single
        # parquet file into one.
        src = f"{work}/source"
        import os as _os

        _os.makedirs(src)
        shutil.copy(f"{sf_dir}/documents.parquet", src)
        run_streaming_ingest_dedup(
            spark,
            src,
            docs.schema,
            index_path=f"{work}/index",
            clean_path=f"{work}/clean",
            checkpoint_path=f"{work}/ckpt",
        )
        kept = [
            r["doc_id"]
            for r in spark.read.parquet(f"{work}/clean")
            .select("doc_id")
            .collect()
        ]
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(
        [(int(i),) for i in sorted(kept)], "doc_id long"
    )


@register(
    "streaming_dq_monitor",
    """
    SELECT 'not_null:user_id' AS rule,
           CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS violations,
           CAST(0 AS BIGINT) AS batch_id
    FROM events
    UNION ALL
    SELECT 'range:value:[0.0,90.0]',
           CAST(sum(CASE WHEN value IS NULL OR value < 0.0 OR value > 90.0
                         THEN 1 ELSE 0 END) AS BIGINT),
           CAST(0 AS BIGINT)
    FROM events
    UNION ALL
    SELECT 'unique:event_id',
           CAST(coalesce((SELECT sum(c) FROM (
               SELECT count(*) AS c FROM events GROUP BY event_id
               HAVING count(*) > 1)), 0) AS BIGINT),
           CAST(0 AS BIGINT)
    """,
)
def q_streaming_dq_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming data-quality monitor (streaming/dq_monitor.py): the
    same declarative rules as validate_constraints run per micro-batch
    via foreachBatch, appending a (rule, violations, batch_id) time
    series a dashboard alerts on. Drained single-batch here so the
    whole-feed oracle replays each rule; the range rule is
    deliberately violated by the testdata (~3% of values exceed 90) so
    the green row is non-vacuous. Per-batch cost: one conditional-
    aggregate scan + one narrow groupBy per unique rule."""
    import shutil
    import tempfile

    from taxi_trips_etl_spark.streaming.dq_monitor import (
        run_streaming_dq_monitor,
    )

    _events(spark, sf_dir)  # sets nanosAsLong for the schema read below
    work = tempfile.mkdtemp(prefix="dq_monitor_q_")
    try:
        src = f"{work}/source"
        import os as _os

        _os.makedirs(src)
        shutil.copy(f"{sf_dir}/events.parquet", src)
        run_streaming_dq_monitor(
            spark,
            src,
            spark.read.parquet(f"{sf_dir}/events.parquet").schema,
            log_path=f"{work}/log",
            checkpoint_path=f"{work}/ckpt",
            not_null=["user_id"],
            unique=[["event_id"]],
            ranges={"value": (0.0, 90.0)},
        )
        rows = [
            (r["rule"], int(r["violations"]), int(r["batch_id"]))
            for r in spark.read.parquet(f"{work}/log").collect()
        ]
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(
        sorted(rows), "rule string, violations long, batch_id long"
    )
