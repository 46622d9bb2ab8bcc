"""Event-time windowed aggregation over the ``events`` table — the batch
mirror of the streaming operators in datapipelines_spark/streaming/.

The reference has no event-time semantics at all (its only notion of time is
epoch cycling, SURVEY §2.10); these queries define the engine's tumbling /
sliding / session window behavior on bounded data so DuckDB can oracle the
exact same semantics Structured Streaming applies unbounded (same F.window /
session_window expressions — see streaming/windows.py and the streaming
tests).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from datapipelines_spark.catalog import query
from datapipelines_spark.sources.parquet import load_table


@query(
    "events_tumbling_1h",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           SUM(value) AS sum_value
    FROM events WHERE ts IS NOT NULL
    GROUP BY 1, 2
    ORDER BY window_start, event_type
    """,
)
def events_tumbling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows (F.window) per event type.

    Identical expression works under readStream + withWatermark; tested as a
    stream in tests/test_streaming.py.
    """
    e = load_table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
        .orderBy("window_start", "event_type")
    )


@query(
    "events_sliding_1h_30m",
    oracle="""
    WITH win AS (
        SELECT time_bucket(INTERVAL '30 minutes', ts) AS window_start, value
        FROM events WHERE ts IS NOT NULL
        UNION ALL
        SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes', value
        FROM events WHERE ts IS NOT NULL
    )
    SELECT CAST(window_start AS TIMESTAMP) AS window_start,
           COUNT(*) AS n_events,
           SUM(value) AS sum_value
    FROM win
    GROUP BY 1 ORDER BY window_start
    """,
)
def events_sliding_1h_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows, 1 h length / 30 min slide: every event lands in two
    overlapping windows (Spark expands this internally; the oracle expands it
    explicitly via UNION ALL of the two epoch-aligned bucket starts)."""
    e = load_table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        # SUM, not AVG: avg = sum/2^k of centile-valued doubles has a finite
        # decimal expansion ending exactly in "...5" at the normalization
        # digit, so cross-engine accumulation-order ULPs flip the rounding
        # tie (observed at sf0.1). Sums keep ULP noise far below the 9th
        # significant digit.
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
        .orderBy("window_start")
    )


@query(
    "events_session_windows",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) >= 21600000000
                    OR LAG(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WHERE ts IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT user_id, ts, value,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS session_no
        FROM ordered
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           COUNT(*) AS n_events,
           SUM(value) AS sum_value
    FROM numbered
    GROUP BY user_id, session_no
    ORDER BY user_id, session_start
    """,
)
def events_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a 6-hour inactivity gap per user
    (F.session_window — a new session starts when the gap since the previous
    event is ≥ the timeout; the oracle replays that rule as gaps-and-islands
    with microsecond-exact arithmetic)."""
    e = load_table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    return (
        e.groupBy(F.session_window("ts", "6 hours").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
        .orderBy("user_id", "session_start")
    )


@query(
    "events_user_lifetime_stats",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           COUNT(DISTINCT event_type) AS n_event_types,
           SUM(value) AS total_value,
           MIN(ts) AS first_seen,
           MAX(ts) AS last_seen
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def events_user_lifetime_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key lifetime state — the batch shape of an
    applyInPandasWithState / mapGroupsWithState accumulator (streaming
    version in streaming/stateful.py)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("event_type").alias("n_event_types"),
            F.sum("value").alias("total_value"),
            F.min("ts").alias("first_seen"),
            F.max("ts").alias("last_seen"),
        )
        .orderBy("user_id")
    )


@query(
    "events_funnel_conversion",
    oracle="""
    WITH firsts AS (
        SELECT user_id,
               MIN(ts) FILTER (event_type = 'view')     AS first_view,
               MIN(ts) FILTER (event_type = 'click')    AS first_click,
               MIN(ts) FILTER (event_type = 'purchase') AS first_purchase
        FROM events GROUP BY user_id
    )
    SELECT COUNT(*) AS n_users,
           COUNT(first_view) AS n_viewed,
           COUNT(CASE WHEN first_click > first_view THEN 1 END) AS n_clicked_after_view,
           COUNT(CASE WHEN first_purchase > first_click AND first_click > first_view
                      THEN 1 END) AS n_full_funnel
    FROM firsts
    """,
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-sequence funnel (view → click → purchase) via conditional
    min-timestamp aggregation — a single shuffle, no self-joins."""
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("first_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("first_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("first_purchase"),
    )
    return firsts.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("first_view").alias("n_viewed"),
        F.count(F.when(F.col("first_click") > F.col("first_view"), 1)).alias(
            "n_clicked_after_view"
        ),
        F.count(
            F.when(
                (F.col("first_purchase") > F.col("first_click"))
                & (F.col("first_click") > F.col("first_view")),
                1,
            )
        ).alias("n_full_funnel"),
    )


@query(
    "events_interpolate_hourly",
    oracle="""
    WITH hourly AS (
        SELECT user_id, date_trunc('hour', ts) AS hr, COUNT(*) AS n
        FROM events GROUP BY 1, 2
    ),
    pairs AS (
        SELECT user_id, hr, n,
               LEAD(hr) OVER (PARTITION BY user_id ORDER BY hr) AS nxt_hr,
               LEAD(n)  OVER (PARTITION BY user_id ORDER BY hr) AS nxt_n
        FROM hourly
    ),
    gaps AS (
        SELECT p.user_id, g.ghr AS hr,
               round(CAST(p.n AS DOUBLE)
                     + (p.nxt_n - p.n)
                       * (CAST(date_diff('hour', p.hr, g.ghr) AS DOUBLE)
                          / date_diff('hour', p.hr, p.nxt_hr)), 6) AS rate,
               TRUE AS interpolated
        FROM pairs p,
             LATERAL unnest(generate_series(p.hr + INTERVAL 1 HOUR,
                                            p.nxt_hr - INTERVAL 1 HOUR,
                                            INTERVAL 1 HOUR)) AS g(ghr)
        WHERE p.nxt_hr > p.hr + INTERVAL 1 HOUR
    )
    SELECT user_id, hr, rate, interpolated FROM (
        SELECT user_id, hr, CAST(n AS DOUBLE) AS rate, FALSE AS interpolated
        FROM hourly
        UNION ALL
        SELECT * FROM gaps
    ) ORDER BY user_id, hr
    """,
)
def events_interpolate_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series densification by LINEAR INTERPOLATION (the companion to
    zero-fill gap-filling): per-user hourly event rates, with missing hours
    between observations filled along the line between their neighbors.

    All interpolation arithmetic derives from integers (counts and hour
    offsets), so the interpolated doubles are bit-identical across engines.
    One shuffle for the hourly aggregate, one window pass for neighbors;
    the gap explosion is bounded by the observed gap length."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("hr")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("user_id").orderBy("hr")
    pairs = hourly.select(
        "user_id",
        "hr",
        "n",
        F.lead("hr").over(w).alias("nxt_hr"),
        F.lead("n").over(w).alias("nxt_n"),
    )
    one_h = F.expr("INTERVAL 1 HOUR")
    gaps = (
        pairs.where(F.col("nxt_hr") > F.col("hr") + one_h)
        .select(
            "user_id",
            "hr",
            "n",
            "nxt_hr",
            "nxt_n",
            F.explode(
                F.sequence(F.col("hr") + one_h, F.col("nxt_hr") - one_h, one_h)
            ).alias("ghr"),
        )
        .select(
            "user_id",
            F.col("ghr").alias("hr"),
            F.round(
                F.col("n").cast("double")
                + (F.col("nxt_n") - F.col("n"))
                * (
                    F.expr("timestampdiff(HOUR, hr, ghr)").cast("double")
                    / F.expr("timestampdiff(HOUR, hr, nxt_hr)")
                ),
                6,
            ).alias("rate"),
            F.lit(True).alias("interpolated"),
        )
    )
    real = hourly.select(
        "user_id",
        "hr",
        F.col("n").cast("double").alias("rate"),
        F.lit(False).alias("interpolated"),
    )
    return real.unionByName(gaps).orderBy("user_id", "hr")


@query(
    "events_cohort_retention",
    oracle="""
    WITH e AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
    firsts AS (SELECT user_id, MIN(d) AS cohort_day FROM e GROUP BY user_id),
    act AS (SELECT DISTINCT user_id, d FROM e),
    j AS (
        SELECT f.cohort_day, (a.d - f.cohort_day) AS day_offset, a.user_id
        FROM act a JOIN firsts f USING (user_id)
    ),
    r AS (
        SELECT cohort_day, day_offset, COUNT(DISTINCT user_id) AS n_active
        FROM j WHERE day_offset <= 7 GROUP BY 1, 2
    ),
    s AS (SELECT cohort_day, COUNT(*) AS cohort_size FROM firsts GROUP BY 1)
    SELECT strftime(r.cohort_day, '%Y-%m-%d') AS cohort_day,
           CAST(r.day_offset AS BIGINT) AS day_offset,
           r.n_active,
           s.cohort_size,
           CAST(FLOOR(1000.0 * r.n_active / s.cohort_size) AS BIGINT)
               AS retention_permille
    FROM r JOIN s USING (cohort_day)
    ORDER BY cohort_day, day_offset
    """,
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention — the classic product-analytics shape: users are
    cohorted by FIRST active day, and each (cohort, day-offset 0..7) cell
    reports how many cohort members were active again that day. Two
    hash aggregates (first-day per user, distinct user-days) and one join
    on user_id; cohort sizes join broadcast-small. events.ts is NTZ —
    bucketing uses to_date, never epoch arithmetic (TESTDATA discipline).
    """
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d")
    )
    firsts = e.groupBy("user_id").agg(F.min("d").alias("cohort_day"))
    act = e.distinct()
    j = act.join(firsts, "user_id").select(
        "cohort_day",
        F.datediff("d", "cohort_day").cast("bigint").alias("day_offset"),
        "user_id",
    )
    r = (
        j.where(F.col("day_offset") <= 7)
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
    )
    s = firsts.groupBy("cohort_day").agg(F.count(F.lit(1)).alias("cohort_size"))
    return (
        r.join(F.broadcast(s), "cohort_day")
        .select(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            "day_offset",
            "n_active",
            "cohort_size",
            F.floor(F.lit(1000.0) * F.col("n_active") / F.col("cohort_size"))
            .cast("bigint")
            .alias("retention_permille"),
        )
        .orderBy("cohort_day", "day_offset")
    )


@query(
    "events_anomaly_mad",
    oracle="""
    WITH r AS (
        SELECT event_id, event_type, value,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY value, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
    ),
    med AS (
        SELECT event_type,
               MAX(CASE WHEN rn = (n + 1) // 2 THEN value END) AS med
        FROM r GROUP BY event_type
    ),
    d AS (
        SELECT r.event_id, r.event_type, r.value, med.med,
               abs(r.value - med.med) AS dev,
               row_number() OVER (PARTITION BY r.event_type
                                  ORDER BY abs(r.value - med.med),
                                           r.event_id) AS drn,
               COUNT(*) OVER (PARTITION BY r.event_type) AS n
        FROM r JOIN med USING (event_type)
    ),
    mad AS (
        SELECT event_type,
               MAX(CASE WHEN drn = (n + 1) // 2 THEN dev END) AS mad
        FROM d GROUP BY event_type
    )
    SELECT d.event_id, d.event_type,
           CAST(FLOOR(d.value * 1000) AS BIGINT) AS value_milli,
           CAST(FLOOR(mad.mad * 1000) AS BIGINT) AS mad_milli,
           (abs(d.value - d.med) > 3 * mad.mad) AS is_anomaly
    FROM d JOIN mad USING (event_type)
    ORDER BY d.event_id
    """,
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly flagging by Median Absolute Deviation per event
    type: |value - median| > 3 * MAD — the outlier rule that, unlike
    mean/stddev z-scores, is not dragged by the outliers it hunts (and,
    cross-engine, needs NO order-sensitive floating sum at all). Both
    medians are DISCRETE — the rank-(n+1)//2 element by integer arithmetic
    (the winsorize discipline), ties pinned by event_id — so every
    compared quantity derives from identical IEEE ops. Two windows per
    event_type partition; group medians join back broadcast-small."""
    # NULL values have no rank (each engine orders them differently) and a
    # NULL type is not a population — out of the MAD domain on both sides
    e = (
        load_table(spark, sf_dir, "events")
        .where(F.col("value").isNotNull() & F.col("event_type").isNotNull())
        .select("event_id", "event_type", "value")
    )
    w1 = Window.partitionBy("event_type").orderBy("value", "event_id")
    r = e.select(
        "event_id",
        "event_type",
        "value",
        F.row_number().over(w1).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("n"),
    )
    med = (
        r.select(
            "event_type",
            F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("value")).alias(
                "m"
            ),
        )
        .groupBy("event_type")
        .agg(F.max("m").alias("med"))
    )
    d0 = r.join(F.broadcast(med), "event_type").withColumn(
        "dev", F.abs(F.col("value") - F.col("med"))
    )
    w2 = Window.partitionBy("event_type").orderBy("dev", "event_id")
    d = d0.withColumn("drn", F.row_number().over(w2))
    mad = (
        d.select(
            "event_type",
            F.when(F.col("drn") == F.expr("(n + 1) div 2"), F.col("dev")).alias(
                "x"
            ),
        )
        .groupBy("event_type")
        .agg(F.max("x").alias("mad"))
    )
    return (
        d.join(F.broadcast(mad), "event_type")
        .select(
            "event_id",
            "event_type",
            F.floor(F.col("value") * 1000).cast("bigint").alias("value_milli"),
            F.floor(F.col("mad") * 1000).cast("bigint").alias("mad_milli"),
            (F.abs(F.col("value") - F.col("med")) > 3 * F.col("mad")).alias(
                "is_anomaly"
            ),
        )
        .orderBy("event_id")
    )


@query(
    "events_daily_trend_slope",
    oracle="""
    WITH d AS (
        SELECT event_type,
               CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS day,
               CAST(FLOOR(value * 1000000) AS BIGINT) AS v_micro
        FROM events
    ),
    daily AS (
        SELECT event_type, day, SUM(v_micro) AS y
        FROM d GROUP BY 1, 2
    ),
    s AS (
        SELECT event_type,
               COUNT(*) AS n, SUM(day) AS sx, SUM(y) AS sy,
               SUM(day * y) AS sxy, SUM(day * day) AS sxx
        FROM daily GROUP BY 1
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           CAST(FLOOR(1000.0 * (n * sxy - sx * sy)
                      / (CAST(n * sxx - sx * sx AS DOUBLE) * 1000000))
                AS BIGINT) AS slope_milli
    FROM s ORDER BY event_type
    """,
)
def events_daily_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metric trend detection: the ordinary-least-squares slope of each
    event type's DAILY value total over the month, in value-units per day
    (floor-scaled milli). Every accumulated quantity is an exact INTEGER —
    values floor to micros per row BEFORE summing (a float sum's addition
    order is nondeterministic under parallel aggregation; an integer sum
    is associative), day indices are small ints, and the closed-form OLS
    slope (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2) divides two exact integers in
    one final double op. Two partially-aggregated shuffles, group count =
    |event types|."""
    e = load_table(spark, sf_dir, "events")
    d = e.select(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
        .cast("bigint")
        .alias("day"),
        F.floor(F.col("value") * 1000000).cast("bigint").alias("v_micro"),
    )
    daily = d.groupBy("event_type", "day").agg(F.sum("v_micro").alias("y"))
    s = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("day").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("day") * F.col("y")).alias("sxy"),
        F.sum(F.col("day") * F.col("day")).alias("sxx"),
    )
    return s.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_days"),
        F.floor(
            F.lit(1000.0)
            * (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (
                (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
                    "double"
                )
                * 1000000
            )
        )
        .cast("bigint")
        .alias("slope_milli"),
    ).orderBy("event_type")


@query(
    "events_transition_matrix",
    oracle="""
    WITH o AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
    )
    SELECT prev_type, event_type AS next_type, COUNT(*) AS n_transitions
    FROM o WHERE prev_type IS NOT NULL
    GROUP BY 1, 2
    ORDER BY prev_type, next_type
    """,
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral transition matrix: how often each event type follows
    each other type within a user's stream — the Markov-chain view behind
    next-action prediction and funnel design. One lag window per user
    partition (the stream is already the partitioning the sessionization
    queries use) + one partially-aggregated count over |types|² groups;
    tie order pinned by (ts, event_id). Domain: well-formed events (a
    NULL ts has no position in the stream, a NULL type no state)."""
    e = load_table(spark, sf_dir, "events").where(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    )
    return (
        o.where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n_transitions"))
        .orderBy("prev_type", "next_type")
    )
