"""Time-series operators over the events stream: calendar gap-filling
and last-observation-carried-forward interpolation — the two idioms
that turn an irregular event stream into a regular series.

Scale notes: the bucket grid is generated from a 1-row bounds
aggregate (``sequence`` + ``explode``), so grid size is bounded by the
time span, never the event count; LOCF is one window pass per user.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from movierecommender_sentimentanalysissytem_spark.functions.rounding import round4
from movierecommender_sentimentanalysissytem_spark.registry import query
from movierecommender_sentimentanalysissytem_spark.sources.tables import table


@query(
    "timeseries_gapfill",
    oracle="""
    WITH bounds AS (
        SELECT CAST(floor(epoch(date_trunc('second', MIN(ts))) / 600) * 600 AS BIGINT) AS b0,
               CAST(floor(epoch(date_trunc('second', MAX(ts))) / 600) * 600 AS BIGINT) AS b1
        FROM events
    ),
    grid AS (
        SELECT unnest(generate_series(b0, b1, 600)) AS s FROM bounds
    ),
    counts AS (
        SELECT CAST(floor(epoch(date_trunc('second', ts)) / 600) * 600 AS BIGINT) AS s,
               COUNT(*) AS n,
               FLOOR(SUM(value) * 10000 + 0.5) / 10000 AS total_value
        FROM events GROUP BY s
    )
    SELECT strftime(to_timestamp(g.s), '%Y-%m-%d %H:%M:%S') AS bucket,
           COALESCE(c.n, 0) AS n,
           COALESCE(c.total_value, 0.0) AS total_value,
           (c.s IS NULL) AS was_gap
    FROM grid g LEFT JOIN counts c ON g.s = c.s
    """,
)
def timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense 10-minute series: generate the full bucket grid between
    the stream's bounds (1-row aggregate → sequence → explode), left
    join the sparse per-bucket aggregates, zero-fill the gaps."""
    e = table(spark, sf_dir, "events").withColumn(
        "sec", F.unix_timestamp(F.date_trunc("second", F.col("ts")))
    )
    bounds = e.agg(
        (F.floor(F.min("sec") / 600) * 600).cast("long").alias("b0"),
        (F.floor(F.max("sec") / 600) * 600).cast("long").alias("b1"),
    )
    grid = bounds.select(
        F.explode(F.sequence("b0", "b1", F.lit(600))).alias("s")
    )
    counts = (
        e.groupBy(((F.floor(F.col("sec") / 600)) * 600).cast("long").alias("s"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            round4(F.sum("value")).alias("total_value"),
        )
    )
    c = counts.alias("c")
    return (
        grid.alias("g")
        .join(c, F.col("g.s") == F.col("c.s"), "left")
        .select(
            F.date_format(
                F.timestamp_seconds(F.col("g.s")), "yyyy-MM-dd HH:mm:ss"
            ).alias("bucket"),
            F.coalesce(F.col("c.n"), F.lit(0)).alias("n"),
            F.coalesce(F.col("c.total_value"), F.lit(0.0)).alias("total_value"),
            F.col("c.s").isNull().alias("was_gap"),
        )
    )


@query(
    "timeseries_locf",
    oracle="""
    WITH nulled AS (
        SELECT user_id, event_id,
               CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
        FROM events
    )
    SELECT user_id, event_id,
           FLOOR(COALESCE(last_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), -1.0)
               * 10000 + 0.5) / 10000 AS v_filled
    FROM nulled
    """,
)
def timeseries_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward: error events null their value
    and inherit the user's most recent valid reading (window ``last``
    with ignorenulls; -1 sentinel when no prior observation exists)."""
    e = table(spark, sf_dir, "events")
    nulled = e.select(
        "user_id",
        "event_id",
        F.when(F.col("event_type") == "error", F.lit(None)).otherwise(
            F.col("value")
        ).alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return nulled.select(
        "user_id",
        "event_id",
        round4(
            F.coalesce(F.last("v", ignorenulls=True).over(w), F.lit(-1.0))
        ).alias("v_filled"),
    )


@query(
    "timeseries_ewma",
    oracle="""
    WITH ordered AS (
        SELECT user_id, list(value ORDER BY date_trunc('second', ts), event_id) AS vs
        FROM events WHERE value IS NOT NULL GROUP BY user_id
    )
    SELECT user_id, len(vs) AS n,
           FLOOR(list_reduce(vs, (acc, x) -> 0.3 * x + 0.7 * acc)
                 * 10000 + 0.5) / 10000 AS ewma
    FROM ordered
    """,
)
def timeseries_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average per user (α = 0.3) — the
    recursive smoother SQL windows cannot express (each output depends
    on the previous OUTPUT, not a previous input). Implemented as an
    in-order higher-order-function fold over the user's time-sorted
    value array: one shuffle on user_id, JVM-side lambda, no Python,
    no iteration. The fold is left-to-right on both engines, so the
    cross-engine doubles agree bit-for-bit before rounding. (ts, event_id)
    is the total order — event_id breaks equal-second ties. State per
    user is its event list: bounded by per-user activity, the same
    bound LOCF and sessionization already carry; a user hot enough to
    break it would need the same salting every per-user window needs."""
    e = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    ordered = (
        e.select(
            "user_id",
            F.struct(
                F.date_trunc("second", F.col("ts")).alias("ts_s"),
                F.col("event_id").alias("eid"),
                F.col("value").alias("v"),
            ).alias("rec"),
        )
        .groupBy("user_id")
        .agg(F.array_sort(F.collect_list("rec")).alias("recs"))
        .withColumn("vs", F.expr("transform(recs, r -> r.v)"))
    )
    ewma = F.expr(
        "aggregate(slice(vs, 2, size(vs) - 1), element_at(vs, 1),"
        " (acc, x) -> 0.3D * x + 0.7D * acc)"
    )
    return ordered.select(
        "user_id",
        F.size("vs").alias("n"),
        round4(ewma).alias("ewma"),
    )


@query(
    "timeseries_multi_rollup",
    oracle="""
    SELECT CASE WHEN GROUPING(h) = 1 THEN 'day' ELSE 'hour' END AS grain,
           strftime(d, '%Y-%m-%d') AS day,
           CASE WHEN GROUPING(h) = 1 THEN -1
                ELSE CAST(EXTRACT(hour FROM h) AS INTEGER) END AS hour,
           COUNT(*) AS n,
           FLOOR(SUM(value) * 10000 + 0.5) / 10000 AS total_value
    FROM (
        SELECT date_trunc('day', ts) AS d, date_trunc('hour', ts) AS h,
               value
        FROM events
    )
    GROUP BY GROUPING SETS ((d), (d, h))
    """,
)
def timeseries_multi_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-granularity rollup: hourly AND daily
    aggregates of the event stream in ONE pass via GROUPING SETS —
    the continuous-aggregate maintenance job of a time-series store.
    One shuffle produces both grains (Spark expands the sets before
    the exchange); the alternative — two separate aggregations — scans
    and shuffles the fact table twice. GROUPING() disambiguates the
    grain, with hour = -1 as the day-row filler (NULL would collide
    with a genuine null hour under the driver's column sort)."""
    e = table(spark, sf_dir, "events").select(
        F.date_trunc("day", F.col("ts")).alias("d"),
        F.date_trunc("hour", F.col("ts")).alias("h"),
        "value",
    )
    return (
        e.groupingSets([["d"], ["d", "h"]], "d", "h")
        .agg(
            F.grouping("h").alias("gh"),
            F.count(F.lit(1)).alias("n"),
            round4(F.sum("value")).alias("total_value"),
        )
        .select(
            F.when(F.col("gh") == 1, "day").otherwise("hour").alias("grain"),
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            F.when(F.col("gh") == 1, F.lit(-1))
            .otherwise(F.hour("h"))
            .cast("int")
            .alias("hour"),
            "n",
            "total_value",
        )
    )


@query(
    "timeseries_resample_ohlc",
    oracle="""
    WITH o AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
               value,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type, date_trunc('day', ts)
                   ORDER BY date_trunc('second', ts) ASC, event_id ASC)
                   AS rn_a,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type, date_trunc('day', ts)
                   ORDER BY date_trunc('second', ts) DESC, event_id DESC)
                   AS rn_d
        FROM events
    )
    SELECT event_type, day,
           MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
           MAX(value) AS high, MIN(value) AS low,
           MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
           COUNT(*) AS n_events,
           FLOOR(SUM(value) * 10000 + 0.5) / 10000 AS total_value
    FROM o GROUP BY event_type, day
    """,
)
def timeseries_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downsample the event stream to daily OHLC bars per event type —
    the finance-style resample every metrics store implements (open =
    first value of the day, close = last). First/last are row_number
    picks over one partitioned window pair ordered on (second-truncated
    ts, event_id) — a total order, so bar edges are engine-exact; the
    asc and desc windows share one hash partitioning, so Catalyst plans
    a single exchange with two sorts. High/low/volume fold in the same
    final rollup. Open/close/high/low project RAW doubles (exact row
    picks need no rounding); only the summed volume is 4-dp-rounded."""
    e = table(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("day", F.col("ts")).alias("d"),
        F.date_trunc("second", F.col("ts")).alias("sec"),
        "event_id",
        "value",
    )
    wa = Window.partitionBy("event_type", "d").orderBy(
        F.col("sec").asc(), F.col("event_id").asc()
    )
    wd = Window.partitionBy("event_type", "d").orderBy(
        F.col("sec").desc(), F.col("event_id").desc()
    )
    return (
        e.withColumn("rn_a", F.row_number().over(wa))
        .withColumn("rn_d", F.row_number().over(wd))
        .groupBy("event_type", F.col("d").cast("date").alias("day"))
        .agg(
            F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
            round4(F.sum("value")).alias("total_value"),
        )
    )


@query(
    "timeseries_mom_growth",
    oracle="""
    WITH monthly AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
               FLOOR(SUM(o_totalprice) * 10000 + 0.5) / 10000 AS revenue,
               COUNT(*) AS n_orders
        FROM orders GROUP BY month
    )
    SELECT month, revenue, n_orders,
           FLOOR(((revenue - lag(revenue) OVER (ORDER BY month))
                  / lag(revenue) OVER (ORDER BY month)) * 10000 + 0.5)
               / 10000 AS mom_growth
    FROM monthly
    """,
)
def timeseries_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth — the KPI trend line every
    revenue dashboard opens with. The monthly rollup is the heavy,
    fully distributed pass (map-side combinable sums); the lag/growth
    window then runs GLOBAL but over one row per month — O(months)
    rows regardless of order volume, the same bounded-global-window
    class as win_ntile_percent's O(buckets) offset pass (reviewed in
    plans/audit.py). Growth divides the 4-dp-ROUNDED revenues on both
    sides, so the ratio sees identical operands; the first month's
    growth is NULL (no prior), never a division error."""
    o = table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month")
    ).agg(
        round4(F.sum("o_totalprice")).alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    w = Window.orderBy("month")
    prev = F.lag("revenue").over(w)
    return monthly.select(
        "month",
        "revenue",
        "n_orders",
        round4((F.col("revenue") - prev) / prev).alias("mom_growth"),
    )


@query(
    "timeseries_rate_spike",
    oracle="""
    WITH per_day AS (
        SELECT datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
               COUNT(*) AS n_total,
               CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_error
        FROM events GROUP BY d
    ),
    rated AS (
        SELECT d, n_total, n_error,
               CAST(n_error AS DOUBLE) / n_total AS err_rate,
               AVG(CAST(n_error AS DOUBLE) / n_total) OVER (
                   ORDER BY d ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
                   AS trail_avg
        FROM per_day
    )
    SELECT CAST(d AS BIGINT) AS day_num, n_total, n_error,
           FLOOR(err_rate * 10000 + 0.5) / 10000 AS err_rate,
           FLOOR(trail_avg * 10000 + 0.5) / 10000 AS trail_avg,
           err_rate > 2 * trail_avg AS is_spike
    FROM rated WHERE trail_avg IS NOT NULL
    """,
)
def timeseries_rate_spike(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operational anomaly detection: flag days whose error rate
    exceeds 2× the trailing-week average — the alerting primitive over
    any service-event stream. The row-level work collapses to one
    partial-aggregable per-day rollup; the trailing-mean frame
    (ROWS 7 PRECEDING .. 1 PRECEDING — strictly historical, so a spike
    can't suppress its own baseline) runs over O(days) rows, bounded
    by the calendar (reviewed in plans/audit.py). The spike predicate
    compares the UNROUNDED doubles — both engines build them from the
    same integer counts with the same expression, so the boundary is
    bit-identical; the projected rates take the stable 4-dp round.
    Warm-up days with no full trailing window are excluded on both
    sides rather than flagged against a partial baseline."""
    e = table(spark, sf_dir, "events")
    per_day = e.groupBy(
        F.datediff(F.to_date("ts"), F.lit("2024-01-01")).alias("d")
    ).agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("bigint")
        .alias("n_error"),
    )
    err_rate = F.col("n_error").cast("double") / F.col("n_total")
    w = Window.orderBy("d").rowsBetween(-7, -1)
    rated = per_day.select(
        "d",
        "n_total",
        "n_error",
        err_rate.alias("err_rate"),
        F.avg(err_rate).over(w).alias("trail_avg"),
    )
    return rated.filter(F.col("trail_avg").isNotNull()).select(
        F.col("d").cast("bigint").alias("day_num"),
        "n_total",
        "n_error",
        round4(F.col("err_rate")).alias("err_rate"),
        round4(F.col("trail_avg")).alias("trail_avg"),
        (F.col("err_rate") > 2 * F.col("trail_avg")).alias("is_spike"),
    )


@query(
    "timeseries_backlog_curve",
    oracle="""
    WITH placed AS (
        SELECT datediff('day', DATE '1992-01-01',
                        CAST(o_orderdate AS DATE)) AS d,
               COUNT(*) AS placed
        FROM orders GROUP BY d
    ),
    completed AS (
        SELECT datediff('day', DATE '1992-01-01',
                        CAST(MAX(l_shipdate) AS DATE)) AS d,
               COUNT(*) AS done
        FROM lineitem GROUP BY l_orderkey
        HAVING COUNT(*) > 0
    ),
    done_per_day AS (
        SELECT d, CAST(COUNT(*) AS BIGINT) AS done
        FROM (SELECT d FROM completed) GROUP BY d
    ),
    spine AS (
        SELECT COALESCE(p.d, c.d) AS d,
               COALESCE(p.placed, 0) AS placed,
               COALESCE(c.done, 0) AS done
        FROM placed p FULL OUTER JOIN done_per_day c ON p.d = c.d
    )
    SELECT CAST(d AS BIGINT) AS day_num,
           CAST(placed AS BIGINT) AS placed,
           done AS completed,
           CAST(SUM(placed - done) OVER (ORDER BY d
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS open_backlog
    FROM spine
    """,
)
def timeseries_backlog_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order backlog over time, reconstructed event-sourcing
    style: each order contributes +1 on its placement day and −1 on
    its completion day (max line-item ship date), and the backlog
    curve is the running sum of the daily net — the operational
    inventory/WIP chart. The scalable identity: the fact tables
    collapse to two O(days) daily rollups (placement is a direct
    groupBy; completion needs one orderkey reduction first), a
    full-outer day-spine merge aligns them, and the only ordered pass
    is the running sum over the calendar-bounded spine (same reviewed
    class as the growth curve). No per-day interval-containment join
    — the naive "count orders where placed ≤ d < completed per d"
    re-scans the facts once per day."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    placed = o.groupBy(
        F.datediff(F.to_date("o_orderdate"), F.lit("1992-01-01")).alias("d")
    ).agg(F.count(F.lit(1)).alias("placed"))
    completed = (
        li.groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("last_ship"))
        .groupBy(
            F.datediff(F.to_date("last_ship"), F.lit("1992-01-01")).alias(
                "d"
            )
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("done"))
    )
    spine = placed.join(
        completed, placed.d == completed.d, "full_outer"
    ).select(
        F.coalesce(placed.d, completed.d).alias("d"),
        F.coalesce("placed", F.lit(0)).alias("placed"),
        F.coalesce("done", F.lit(0)).alias("done"),
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return spine.select(
        F.col("d").cast("bigint").alias("day_num"),
        F.col("placed").cast("bigint").alias("placed"),
        F.col("done").alias("completed"),
        F.sum(F.col("placed") - F.col("done"))
        .over(w)
        .cast("bigint")
        .alias("open_backlog"),
    )


@query(
    "timeseries_seasonal_baseline",
    oracle="""
    WITH daily AS (
        SELECT o_orderdate AS day,
               (date_diff('day', DATE '1970-01-01', o_orderdate) + 3) % 7
                   AS weekday,
               SUM(o_totalprice) AS revenue
        FROM orders GROUP BY 1, 2
    ),
    wd AS (
        SELECT weekday AS wk, AVG(revenue) AS mu,
               stddev_samp(revenue) AS sigma
        FROM daily GROUP BY weekday
    )
    SELECT day, CAST(weekday AS INTEGER) AS weekday,
           FLOOR(revenue * 10000 + 0.5) / 10000 AS revenue,
           FLOOR(mu * 10000 + 0.5) / 10000 AS wd_avg,
           FLOOR(((revenue - mu) / sigma) * 10000 + 0.5) / 10000 AS z,
           ABS(FLOOR(((revenue - mu) / sigma) * 10000 + 0.5) / 10000) > 2.0
               AS is_anomaly
    FROM daily JOIN wd ON weekday = wk
    """,
)
def timeseries_seasonal_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday-seasonal anomaly baseline: each day's revenue is scored
    against ITS WEEKDAY's mean/stddev — the deseasonalized complement
    of anomaly_zscore (whose global per-type moments would flag every
    ordinary Saturday if weekends ran hot). Weekday comes from pure
    epoch-day integer arithmetic ((days + 3) % 7, 0 = Monday), the
    events_time_profile convention — Spark's dayofweek and DuckDB's
    dow disagree on numbering, so neither appears. Plan shape: daily
    rollup (one shuffle on ~O(days) groups) → 7-row moment aggregate
    broadcast back as a row-local join — never a window over the day
    partition. The z-score is rounded before the |z| > 2 cut so
    summation-order noise in the moments can't flip a boundary day."""
    o = table(spark, sf_dir, "orders")
    epoch_day = F.datediff(
        F.col("o_orderdate"), F.lit("1970-01-01").cast("date")
    )
    daily = o.groupBy(
        F.col("o_orderdate").alias("day"),
        ((epoch_day.cast("bigint") + 3) % 7).alias("weekday"),
    ).agg(F.sum("o_totalprice").alias("revenue"))
    wd = daily.groupBy(F.col("weekday").alias("wk")).agg(
        F.avg("revenue").alias("mu"),
        F.stddev_samp("revenue").alias("sigma"),
    )
    z = round4((F.col("revenue") - F.col("mu")) / F.col("sigma"))
    return daily.join(F.broadcast(wd), F.col("weekday") == F.col("wk")).select(
        "day",
        F.col("weekday").cast("int").alias("weekday"),
        round4(F.col("revenue")).alias("revenue"),
        round4(F.col("mu")).alias("wd_avg"),
        z.alias("z"),
        (F.abs(z) > 2.0).alias("is_anomaly"),
    )


@query(
    "timeseries_decompose_additive",
    oracle="""
    WITH daily AS (
        SELECT o_orderdate AS day,
               (date_diff('day', DATE '1970-01-01', o_orderdate) + 3) % 7
                   AS weekday,
               SUM(o_totalprice) AS revenue
        FROM orders GROUP BY 1, 2
    ),
    tr AS (
        SELECT day, weekday, revenue,
               AVG(revenue) OVER (ORDER BY day
                                  ROWS BETWEEN 3 PRECEDING
                                  AND 3 FOLLOWING) AS trend
        FROM daily
    ),
    se AS (
        SELECT weekday AS wk, AVG(revenue - trend) AS seasonal
        FROM tr GROUP BY weekday
    )
    SELECT day, CAST(weekday AS INTEGER) AS weekday,
           FLOOR(revenue * 10000 + 0.5) / 10000 AS revenue,
           FLOOR(trend * 10000 + 0.5) / 10000 AS trend,
           FLOOR(seasonal * 10000 + 0.5) / 10000 AS seasonal,
           FLOOR((revenue - trend - seasonal) * 10000 + 0.5) / 10000
               AS residual
    FROM tr JOIN se ON weekday = wk
    """,
)
def timeseries_decompose_additive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive decomposition of the daily revenue series:
    trend = centered 7-day moving average, seasonal = weekday mean of
    the detrended series, residual = what's left — the three-way
    split behind every 'is this dip real or just Sunday' question,
    and the generative model the seasonal-baseline anomaly key
    (timeseries_seasonal_baseline) implicitly assumes. The trend
    window and the 7-row seasonal broadcast both run over the
    O(days) ROLLUP — the raw fact table is touched exactly once;
    series edges keep Spark/DuckDB-identical partial frames (AVG
    over however many of the 7 rows exist). Weekday is the
    (epoch_day + 3) % 7 integer convention."""
    o = table(spark, sf_dir, "orders")
    epoch_day = F.datediff(
        F.col("o_orderdate"), F.lit("1970-01-01").cast("date")
    )
    daily = o.groupBy(
        F.col("o_orderdate").alias("day"),
        ((epoch_day.cast("bigint") + 3) % 7).alias("weekday"),
    ).agg(F.sum("o_totalprice").alias("revenue"))
    wtr = Window.orderBy("day").rowsBetween(-3, 3)
    tr = daily.withColumn("trend", F.avg("revenue").over(wtr))
    se = tr.groupBy(F.col("weekday").alias("wk")).agg(
        F.avg(F.col("revenue") - F.col("trend")).alias("seasonal")
    )
    return tr.join(F.broadcast(se), F.col("weekday") == F.col("wk")).select(
        "day",
        F.col("weekday").cast("int").alias("weekday"),
        round4(F.col("revenue")).alias("revenue"),
        round4(F.col("trend")).alias("trend"),
        round4(F.col("seasonal")).alias("seasonal"),
        round4(
            F.col("revenue") - F.col("trend") - F.col("seasonal")
        ).alias("residual"),
    )
