"""Event-stream analytics operators (round 7).

Sequence and seasonality shapes over the ``events`` table that the
existing funnel/sessionize/attribution family doesn't cover: path
mining (top event-type trigrams), time-of-day seasonality, and
statistical anomaly detection on daily volumes.

Determinism posture: every float sum is a DECIMAL accumulation, LN/
SQRT see per-row values both engines computed identically, ratios
round to 6 dp, and every ordering breaks ties on a unique key
(``event_id`` within a user stream, names elsewhere).

Scale posture: windows partition by user (uniform, unbounded
parallelism) or run over calendar-bounded aggregates (hours × types,
days × types — small no matter the event volume); the heavy exchanges
are partial-aggregated groupBys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from lakehouse_workshop_spark.operators import query

PATH_TOP_K = 10
ANOMALY_Z = 2.0


def _path_sql() -> str:
    # LEAD twice over the per-user stream, then count trigram strings.
    return f"""
    WITH seq AS (
        SELECT event_type AS e1,
               LEAD(event_type, 1) OVER w AS e2,
               LEAD(event_type, 2) OVER w AS e3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT e1 || '>' || e2 || '>' || e3 AS path,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM seq WHERE e3 IS NOT NULL
    GROUP BY 1 ORDER BY n DESC, path LIMIT {PATH_TOP_K}
    """


@query("user_path_trigrams", tier=2, oracle=_path_sql())
def user_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{PATH_TOP_K} three-step event-type paths across all user
    streams — the path-mining primitive behind "what do users do right
    before purchase/error".

    Scale: one window pass partitioned by user (each stream is
    independent; the exchange key is uniform), then a groupBy on the
    trigram string whose distinct cardinality is ≤ |event_types|³ = tiny
    — partial aggregation collapses it map-side; the final top-k is
    TakeOrderedAndProject.
    """
    from lakehouse_workshop_spark.catalog import load_table

    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_path_sql())


def _seasonality_sql(hour_expr: str) -> str:
    return f"""
    SELECT CAST({hour_expr} AS INT) AS hour_of_day, event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(COUNT(*) AS DOUBLE) /
                 SUM(COUNT(*)) OVER (PARTITION BY event_type), 6)
               AS share_of_type
    FROM events
    GROUP BY 1, 2
    ORDER BY hour_of_day, event_type
    """


@query(
    "hourly_seasonality",
    tier=2,
    oracle=_seasonality_sql("EXTRACT(hour FROM ts)"),
)
def hourly_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonality per event type with each hour's share of
    its type's total — the load-shaping/staffing curve. Sessions pin UTC
    so the hour extract agrees across engines.

    Scale: partial-agg to ≤ 24 × |types| rows before the only exchange;
    the share window runs over that constant-size aggregate.
    """
    from lakehouse_workshop_spark.catalog import load_table

    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_seasonality_sql("hour(ts)"))


def _anomaly_sql(day_expr: str) -> str:
    # Daily value totals per type, then a population z-score per day
    # against that type's own distribution. Moments accumulate in
    # DECIMAL over per-day values that are themselves DECIMAL sums, so
    # nothing depends on partition order.
    return f"""
    WITH daily AS (
        SELECT event_type, {day_expr} AS day,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS v
        FROM events GROUP BY 1, 2
    ),
    stats AS (
        SELECT event_type,
               COUNT(*) AS n_days,
               CAST(SUM(CAST(v AS DECIMAL(38,6))) AS DOUBLE) AS sv,
               CAST(SUM(CAST(v * v AS DECIMAL(38,6))) AS DOUBLE) AS svv
        FROM daily GROUP BY event_type
    )
    SELECT d.event_type, d.day,
           ROUND(d.v, 2) AS day_value,
           ROUND((d.v - sv / n_days)
                 / SQRT(svv / n_days - (sv / n_days) * (sv / n_days)),
                 6) AS zscore
    FROM daily d JOIN stats s ON d.event_type = s.event_type
    WHERE svv / n_days - (sv / n_days) * (sv / n_days) > 0
      AND ABS((d.v - sv / n_days)
              / SQRT(svv / n_days - (sv / n_days) * (sv / n_days)))
          > {ANOMALY_Z}
    ORDER BY d.event_type, d.day
    """


@query(
    "daily_value_anomalies",
    tier=2,
    oracle=_anomaly_sql("strftime(ts, '%Y-%m-%d')"),
)
def daily_value_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Days whose total event value sits more than {ANOMALY_Z}σ from that
    event type's own daily mean (population moments) — the monitoring
    query behind volume-anomaly alerts.

    Scale: the raw scan partial-aggregates to days × types rows; the
    moment pass and the z-score join both run over that calendar-bounded
    aggregate. Per-day sums and both moment sums accumulate in DECIMAL;
    SQRT sees a double both engines derived from identical DECIMAL casts.
    """
    from lakehouse_workshop_spark.catalog import load_table

    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_anomaly_sql("date_format(ts, 'yyyy-MM-dd')"))


# --- bucketized range join (round 8) ----------------------------------------
RANGE_JOIN_WINDOW_S = 300  # "purchases within 5 minutes after the error"


@query(
    "range_join_error_purchases",
    tier=2,
    oracle=f"""
    SELECT e.event_id, CAST(COUNT(p.event_id) AS BIGINT) AS n_purchases_5m
    FROM events e
    LEFT JOIN events p
      ON p.event_type = 'purchase'
     AND p.ts > e.ts
     AND epoch(p.ts) <= epoch(e.ts) + {RANGE_JOIN_WINDOW_S}
    WHERE e.event_type = 'error'
    GROUP BY e.event_id
    """,
)
def range_join_error_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Platform-wide temporal range join with NO equi-key: for every
    error event, count purchases across ALL users in the following
    {RANGE_JOIN_WINDOW_S}s. The naive inequality join (the oracle's
    form) has no equi-condition, so Spark would plan a
    BroadcastNestedLoopJoin scanning every (error, purchase) pair —
    quadratic, dead at 100 TB.

    The scale form is the classic bucketization rewrite: both sides
    bucket time into window-width buckets; a purchase in (t, t+W] lies
    in bucket(t) or bucket(t)+1, so each error equi-joins buckets {{b,
    b+1}} (a 2-row explode on the probe side) and the exact predicate
    filters inside the match — an equi-shuffle join whose per-bucket
    fan-out is bounded by traffic per window, never corpus size. Same
    rows as the naive form, proven by the oracle.
    """
    from lakehouse_workshop_spark.catalog import load_table

    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    w = RANGE_JOIN_WINDOW_S
    return spark.sql(
        f"""
        WITH errors AS (
            SELECT event_id, ts,
                   CAST(FLOOR(unix_timestamp(ts) / {w}) AS BIGINT) AS b
            FROM events WHERE event_type = 'error'
        ),
        probes AS (
            SELECT event_id, ts, explode(array(b, b + 1)) AS bucket
            FROM errors
        ),
        purchases AS (
            SELECT event_id AS p_id, ts AS p_ts,
                   CAST(FLOOR(unix_timestamp(ts) / {w}) AS BIGINT) AS bucket
            FROM events WHERE event_type = 'purchase'
        )
        SELECT e.event_id,
               CAST(COUNT(CASE WHEN p.p_ts > e.ts
                                AND unix_timestamp(p.p_ts)
                                    <= unix_timestamp(e.ts) + {w}
                               THEN p.p_id END) AS BIGINT) AS n_purchases_5m
        FROM probes e
        LEFT JOIN purchases p ON e.bucket = p.bucket
        GROUP BY e.event_id
        """
    )
