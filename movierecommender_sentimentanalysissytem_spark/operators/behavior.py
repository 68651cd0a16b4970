"""Behavioral event analytics: batch time-gap sessionization,
last-touch attribution, and RFM user segmentation — the
clickstream-shaped operators that sit between the raw events table and
the recommender/funnel tier (funnel_conversion, cohort_retention).

All three follow the events-table determinism rules (FIXTURES.md):
order within a user only on (second-truncated ts, event_id) — a total
order both engines agree on — and never project a raw ns timestamp.
Every plan shuffles on user_id once and keeps window state bounded by
a single user's history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from movierecommender_sentimentanalysissytem_spark.functions.rounding import round4
from movierecommender_sentimentanalysissytem_spark.registry import query
from movierecommender_sentimentanalysissytem_spark.sources.tables import table

# Epoch seconds of the second-truncated event time — the one timestamp
# projection both engines compute identically on the ns fixture.
_SEC = "CAST(epoch(date_trunc('second', ts)) AS BIGINT)"


def _sec_col() -> F.Column:
    return F.unix_timestamp(F.date_trunc("second", F.col("ts")))


@query(
    "sessionize_batch",
    oracle=f"""
    WITH o AS (
        SELECT user_id, event_id, event_type, {_SEC} AS sec,
               lag({_SEC}) OVER (
                   PARTITION BY user_id
                   ORDER BY {_SEC}, event_id) AS prev_sec
        FROM events
    ),
    marked AS (
        SELECT *, CASE WHEN prev_sec IS NULL OR sec - prev_sec > 1800
                       THEN 1 ELSE 0 END AS is_new
        FROM o
    ),
    sess AS (
        SELECT *, SUM(is_new) OVER (
                   PARTITION BY user_id
                   ORDER BY sec, event_id) AS session_id
        FROM marked
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           MIN(sec) AS start_sec, COUNT(*) AS n_events,
           MAX(sec) - MIN(sec) AS duration_s,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_purchases
    FROM sess GROUP BY user_id, session_id
    """,
)
def sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: a 30-minute inactivity gap starts a new
    session (the batch twin of stream_session_window; the
    integer-island variant is win_gaps_islands). The classic two-window
    composition — lag marks session starts, a running sum of the marks
    numbers the sessions — needs one shuffle on user_id; both windows
    and the final rollup share that partitioning, so Catalyst plans a
    single exchange. Session state never leaves the window frame: at
    100 TB a user's history sorts within its partition and spills if
    pathological, but no cross-user state exists."""
    e = table(spark, sf_dir, "events").withColumn("sec", _sec_col())
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    marked = e.withColumn(
        "is_new",
        F.when(
            F.lag("sec").over(w).isNull()
            | (F.col("sec") - F.lag("sec").over(w) > 1800),
            1,
        ).otherwise(0),
    )
    sess = marked.withColumn(
        "session_id", F.sum("is_new").over(w).cast("bigint")
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.min("sec").alias("start_sec"),
        F.count(F.lit(1)).alias("n_events"),
        (F.max("sec") - F.min("sec")).alias("duration_s"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "n_purchases"
        ),
    )


@query(
    "attribution_last_touch",
    oracle=f"""
    WITH o AS (
        SELECT user_id, event_id, event_type, {_SEC} AS sec,
               last_value(CASE WHEN event_type = 'click' THEN event_id END
                          IGNORE NULLS) OVER w AS click_id,
               last_value(CASE WHEN event_type = 'click' THEN {_SEC} END
                          IGNORE NULLS) OVER w AS click_sec
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY {_SEC}, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_id AS purchase_id, user_id, click_id AS attributed_click_id,
           sec - click_sec AS gap_s
    FROM o WHERE event_type = 'purchase'
    """,
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase credits the user's most
    recent preceding click (NULL when no click came before — preserved,
    not dropped: unattributed purchases are the interesting rows in an
    attribution audit). ``last(..., ignoreNulls) OVER (unbounded
    preceding..current)`` carries the latest click forward as running
    window state — O(1) per row, one user_id shuffle, no self-join of
    purchases against clicks (which would re-shuffle both sides and
    skew on heavy clickers). A time-capped variant would add a range
    frame on sec; the uncapped form keeps the oracle windowed
    identically in both engines."""
    e = table(spark, sf_dir, "events").withColumn("sec", _sec_col())
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    click_id = F.last(
        F.when(F.col("event_type") == "click", F.col("event_id")),
        ignorenulls=True,
    ).over(w)
    click_sec = F.last(
        F.when(F.col("event_type") == "click", F.col("sec")),
        ignorenulls=True,
    ).over(w)
    return (
        e.withColumn("click_id", click_id)
        .withColumn("click_sec", click_sec)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("click_id").alias("attributed_click_id"),
            (F.col("sec") - F.col("click_sec")).alias("gap_s"),
        )
    )


@query(
    "rec_rfm_segmentation",
    oracle=f"""
    WITH p AS (
        SELECT user_id, MAX({_SEC}) AS last_sec, COUNT(*) AS freq,
               FLOOR(SUM(value) * 10000 + 0.5) / 10000 AS monetary
        FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ),
    m AS (
        SELECT MAX(last_sec) AS now_sec,
               quantile_cont(last_sec, [0.25, 0.5, 0.75]) AS l_t,
               quantile_cont(freq, [0.25, 0.5, 0.75]) AS f_t,
               quantile_cont(monetary, [0.25, 0.5, 0.75]) AS m_t
        FROM p
    ),
    scored AS (
        SELECT user_id,
               CAST(now_sec - last_sec AS BIGINT) AS recency_s,
               freq, monetary,
               -- recency: LOWER is better -> quartile 1 = most recent;
               -- recency above its p-quantile <=> last_sec below the
               -- (1-p)-quantile of last_sec
               1 + CAST(last_sec < l_t[3] AS INT)
                 + CAST(last_sec < l_t[2] AS INT)
                 + CAST(last_sec < l_t[1] AS INT) AS r_q,
               -- frequency / monetary: HIGHER is better -> quartile 1 = top
               1 + CAST(freq <= f_t[3] AS INT) + CAST(freq <= f_t[2] AS INT)
                 + CAST(freq <= f_t[1] AS INT) AS f_q,
               1 + CAST(monetary <= m_t[3] AS INT)
                 + CAST(monetary <= m_t[2] AS INT)
                 + CAST(monetary <= m_t[1] AS INT) AS m_q
        FROM p CROSS JOIN m
    )
    SELECT user_id, recency_s, freq, monetary, r_q, f_q, m_q,
           CAST(r_q AS VARCHAR) || '-' || CAST(f_q AS VARCHAR) || '-'
               || CAST(m_q AS VARCHAR) AS segment
    FROM scored
    """,
)
def rec_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation over purchase events: per-user recency (seconds
    behind the latest purchase anywhere), frequency, and monetary sum,
    each cut into quartiles at the exact interpolated 25/50/75
    boundaries, composed into an 'r-f-m' segment label. Deliberately
    NOT a global ntile() — a total-order window over every user is the
    single-task cliff win_ntile_percent had to engineer around; here
    the boundaries are a 1-row aggregate broadcast back for a row-local
    bucket comparison, so the plan is two map-side-combinable passes
    whatever the user count. Monetary is 4-dp-rounded BEFORE the
    boundary comparison on both sides (double purchase sums are
    summation-order noisy; boundary decisions must see identical
    operands). Quartile convention: strict '>' pushes a user on a
    recency boundary into the better bucket, '<=' does the same for
    frequency/monetary — pinned in tests."""
    p = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .withColumn("sec", _sec_col())
        .groupBy("user_id")
        .agg(
            F.max("sec").alias("last_sec"),
            F.count(F.lit(1)).alias("freq"),
            round4(F.sum("value")).alias("monetary"),
        )
    )
    m = p.agg(
        F.max("last_sec").alias("now_sec"),
        F.percentile(
            F.col("last_sec"), F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))
        ).alias("l_t"),
        F.percentile(
            F.col("freq"), F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))
        ).alias("f_t"),
        F.percentile(
            F.col("monetary"), F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))
        ).alias("m_t"),
    )
    rec = F.col("now_sec") - F.col("last_sec")
    scored = p.crossJoin(F.broadcast(m)).select(
        "user_id",
        rec.cast("bigint").alias("recency_s"),
        "freq",
        "monetary",
        (
            1
            + (F.col("last_sec") < F.element_at("l_t", 3)).cast("int")
            + (F.col("last_sec") < F.element_at("l_t", 2)).cast("int")
            + (F.col("last_sec") < F.element_at("l_t", 1)).cast("int")
        ).alias("r_q"),
        (
            1
            + (F.col("freq") <= F.element_at("f_t", 3)).cast("int")
            + (F.col("freq") <= F.element_at("f_t", 2)).cast("int")
            + (F.col("freq") <= F.element_at("f_t", 1)).cast("int")
        ).alias("f_q"),
        (
            1
            + (F.col("monetary") <= F.element_at("m_t", 3)).cast("int")
            + (F.col("monetary") <= F.element_at("m_t", 2)).cast("int")
            + (F.col("monetary") <= F.element_at("m_t", 1)).cast("int")
        ).alias("m_q"),
    )
    return scored.withColumn(
        "segment",
        F.concat_ws("-", F.col("r_q"), F.col("f_q"), F.col("m_q")),
    )


@query(
    "events_time_profile",
    oracle=f"""
    WITH b AS (
        SELECT ({_SEC} // 86400 + 3) % 7 AS weekday,
               ({_SEC} % 86400) // 3600 AS hour,
               value
        FROM events
    )
    SELECT CAST(weekday AS INTEGER) AS weekday, CAST(hour AS INTEGER) AS hour,
           COUNT(*) AS n,
           FLOOR(AVG(value) * 10000 + 0.5) / 10000 AS avg_value
    FROM b GROUP BY weekday, hour
    """,
)
def events_time_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday × hour activity heatmap (0 = Monday; epoch day 0 was a
    Thursday, hence the +3) — the seasonality profile capacity
    planning and anomaly baselines read. Bucketing is pure integer
    arithmetic on the epoch second (identical cross-engine, no
    timezone/locale dependence — Spark's dayofweek and DuckDB's
    dow/isodow number weekdays differently, so neither is used), and
    the rollup is one ≤ 168-group map-side-combinable aggregate: at
    100 TB this stays a single scan with a trivial shuffle."""
    e = table(spark, sf_dir, "events").withColumn("sec", _sec_col())
    return (
        e.select(
            (((F.col("sec") / 86400).cast("bigint") + 3) % 7)
            .cast("int").alias("weekday"),
            (F.col("sec") % 86400 / 3600).cast("int").alias("hour"),
            "value",
        )
        .groupBy("weekday", "hour")
        .agg(
            F.count(F.lit(1)).alias("n"),
            round4(F.avg("value")).alias("avg_value"),
        )
    )


@query(
    "events_transition_matrix",
    oracle=f"""
    WITH o AS (
        SELECT event_type AS cur_type,
               lead(event_type) OVER (
                   PARTITION BY user_id
                   ORDER BY {_SEC}, event_id) AS next_type
        FROM events
    ),
    c AS (
        SELECT cur_type, next_type, COUNT(*) AS n
        FROM o WHERE next_type IS NOT NULL
        GROUP BY cur_type, next_type
    ),
    t AS (SELECT cur_type, CAST(SUM(n) AS BIGINT) AS n_cur FROM c
          GROUP BY cur_type)
    SELECT cur_type, next_type, n,
           FLOOR((CAST(n AS DOUBLE) / n_cur) * 10000 + 0.5) / 10000 AS p
    FROM c JOIN t USING (cur_type)
    """,
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next event type | current) — the behavioral twin of
    text_bigram_lm (same count-normalize shape, sequences instead of
    token streams). Successors come from one lead() pass per user
    (ordered on the FIXTURES.md total order); each user's final event
    has no successor and drops out. Row totals are derived FROM the
    transition counts and broadcast back — |event types|² is tiny at
    any data scale, so everything after the lead window is a
    fixed-size report. Probabilities divide exact integer counts."""
    e = table(spark, sf_dir, "events").withColumn("sec", _sec_col())
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    o = e.select(
        F.col("event_type").alias("cur_type"),
        F.lead("event_type").over(w).alias("next_type"),
    ).filter(F.col("next_type").isNotNull())
    c = o.groupBy("cur_type", "next_type").agg(F.count(F.lit(1)).alias("n"))
    t = c.groupBy(F.col("cur_type").alias("ct")).agg(F.sum("n").alias("n_cur"))
    return (
        c.join(F.broadcast(t), c.cur_type == F.col("ct"))
        .select(
            "cur_type",
            "next_type",
            "n",
            round4(F.col("n").cast("double") / F.col("n_cur")).alias("p"),
        )
    )


@query(
    "time_to_conversion",
    oracle=f"""
    WITH su AS (
        SELECT user_id, MIN({_SEC}) AS signup_sec
        FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    conv AS (
        SELECT e.user_id, MIN({_SEC}) AS convert_sec
        FROM events e JOIN su ON e.user_id = su.user_id
        WHERE e.event_type = 'purchase' AND {_SEC} >= su.signup_sec
        GROUP BY e.user_id
    )
    SELECT user_id, signup_sec, convert_sec,
           convert_sec - signup_sec AS delta_s
    FROM su JOIN conv USING (user_id)
    """,
)
def time_to_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert: per user, the gap between first signup and the
    first purchase at-or-after it (users who never complete both legs
    drop out — the survival-analysis censoring boundary). Two
    MIN-aggregates and one user_id equi-join; the at-or-after
    constraint is a residual predicate on the joined row, not a range
    join. funnel_conversion counts WHO converts; this measures HOW
    FAST — the pairing every activation dashboard plots. All epoch
    arithmetic on second-truncated integers (FIXTURES.md)."""
    e = table(spark, sf_dir, "events").withColumn("sec", _sec_col())
    su = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("sec").alias("signup_sec"))
    )
    conv = (
        e.filter(F.col("event_type") == "purchase")
        .join(su.select(F.col("user_id").alias("su_uid"), "signup_sec"),
              F.col("user_id") == F.col("su_uid"))
        .filter(F.col("sec") >= F.col("signup_sec"))
        .groupBy("user_id")
        .agg(F.min("sec").alias("convert_sec"))
    )
    return (
        su.join(conv, "user_id")
        .select(
            "user_id",
            "signup_sec",
            "convert_sec",
            (F.col("convert_sec") - F.col("signup_sec")).alias("delta_s"),
        )
    )


@query(
    "events_dau_rolling",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT user_id,
               datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d
        FROM events
    ),
    days AS (SELECT DISTINCT d FROM ud),
    contrib AS (
        SELECT user_id, d + x.o AS target
        FROM ud CROSS JOIN (
            SELECT unnest(range(7)) AS o
        ) x
    ),
    wau AS (
        SELECT target AS d, COUNT(DISTINCT user_id) AS wau7
        FROM contrib
        WHERE target IN (SELECT d FROM days)
        GROUP BY target
    ),
    dau AS (
        SELECT d, COUNT(*) AS dau FROM ud GROUP BY d
    )
    SELECT CAST(dau.d AS BIGINT) AS day_num, dau.dau,
           CAST(wau.wau7 AS BIGINT) AS wau7
    FROM dau JOIN wau ON dau.d = wau.d
    """,
)
def events_dau_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users plus the 7-day rolling distinct-user count
    (DAU/WAU) — the engagement pair every product dashboard leads
    with. A rolling COUNT(DISTINCT) has no window-frame form; the
    scalable identity is contribution explode: each distinct
    (user, day) pair contributes the user to target days d..d+6, then
    one count-distinct per target day. That is distinct → 7× explode →
    distinct-count — two key shuffles, both partial-aggregable, no
    per-day self-join of the whole activity table (which would read
    the fact 7×). Day numbers are integer datediffs from the fixture
    epoch, so no timestamp arithmetic leaves the row level; target
    days outside the observed domain are dropped by a broadcast
    semi-join against the O(days) distinct-day set."""
    e = table(spark, sf_dir, "events")
    ud = e.select(
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01")).alias("d"),
    ).distinct()
    days = ud.select("d").distinct()
    contrib = ud.select(
        "user_id", F.explode(F.sequence(F.col("d"), F.col("d") + 6)).alias("target")
    )
    wau = (
        contrib.join(
            F.broadcast(days), contrib.target == days.d, "left_semi"
        )
        .groupBy("target")
        .agg(F.count_distinct("user_id").alias("wau7"))
    )
    dau = ud.groupBy("d").agg(F.count(F.lit(1)).alias("dau"))
    return dau.join(wau, dau.d == wau.target).select(
        F.col("d").cast("bigint").alias("day_num"),
        "dau",
        F.col("wau7").cast("bigint").alias("wau7"),
    )


@query(
    "events_cumulative_unique",
    oracle="""
    WITH first_seen AS (
        SELECT o_custkey,
               MIN(CAST(date_part('year', o_orderdate) AS BIGINT) * 12
                   + CAST(date_part('month', o_orderdate) AS BIGINT) - 1)
                   AS m
        FROM orders GROUP BY o_custkey
    ),
    per_month AS (
        SELECT m, COUNT(*) AS new_customers FROM first_seen GROUP BY m
    )
    SELECT m AS month_num, new_customers,
           CAST(SUM(new_customers) OVER (ORDER BY m
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_customers
    FROM per_month
    """,
)
def events_cumulative_unique(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct customers by first-order month — the
    customer-growth curve. A naive cumulative COUNT(DISTINCT)
    re-scans the fact table once per period; the linear identity is
    first-touch attribution of each customer to their MIN month (one
    custkey shuffle, partial-aggregable), then a running sum over the
    per-month new-customer rollup. The only ordered pass is that
    final window over O(months) rows — bounded by the calendar, not
    the data (reviewed in plans/audit.py), which is what makes this
    the 100 TB form. Months are absolute integers (year·12 + month-1),
    avoiding cross-engine date-truncation rendering."""
    o = table(spark, sf_dir, "orders")
    m = (
        F.year("o_orderdate").cast("bigint") * 12
        + F.month("o_orderdate").cast("bigint")
        - 1
    )
    first_seen = o.groupBy("o_custkey").agg(F.min(m).alias("m"))
    per_month = first_seen.groupBy("m").agg(
        F.count(F.lit(1)).alias("new_customers")
    )
    w = Window.orderBy("m").rowsBetween(Window.unboundedPreceding, 0)
    return per_month.select(
        F.col("m").alias("month_num"),
        "new_customers",
        F.sum("new_customers").over(w).cast("bigint").alias("cum_customers"),
    )


@query(
    "events_cohort_ltv",
    oracle="""
    WITH om AS (
        SELECT o_custkey AS c,
               CAST(date_part('year', o_orderdate) AS BIGINT) * 12
                   + CAST(date_part('month', o_orderdate) AS BIGINT) - 1
                   AS m,
               o_totalprice AS rev
        FROM orders
    ),
    cohort AS (
        SELECT c, MIN(m) AS c0 FROM om GROUP BY c
    ),
    sizes AS (
        SELECT c0, COUNT(*) AS n_customers FROM cohort GROUP BY c0
    ),
    per_offset AS (
        SELECT cohort.c0, om.m - cohort.c0 AS off, SUM(om.rev) AS rev
        FROM om JOIN cohort ON om.c = cohort.c
        GROUP BY cohort.c0, off
    ),
    cum AS (
        SELECT c0, off, SUM(rev) OVER (
            PARTITION BY c0 ORDER BY off
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_rev
        FROM per_offset
    )
    SELECT cum.c0 AS cohort_month, CAST(cum.off AS BIGINT) AS month_offset,
           sizes.n_customers,
           FLOOR(cum.cum_rev * 10000 + 0.5) / 10000 AS cum_revenue,
           FLOOR(cum.cum_rev / sizes.n_customers * 10000 + 0.5) / 10000
               AS ltv_per_customer
    FROM cum JOIN sizes ON cum.c0 = sizes.c0
    WHERE cum.off <= 12
    """,
)
def events_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: for each acquisition cohort
    (first-order month), cumulative revenue per acquired customer at
    each month offset ≤ 12 — the revenue twin of cohort_retention,
    and the curve a growth team reads unit economics from. The fact
    table reduces to (cohort, offset) revenue cells BEFORE any
    window: the running sum partitions by cohort and orders by a
    ≤13-row offset frame, so window state is bounded by the reporting
    horizon, never by data volume; cohort assignment is one custkey
    shuffle and the cells join cohort sizes on the cohort key.
    Revenue sums are order-sensitive doubles — both projections take
    the stable 4-dp round; the offset cut keeps the report width
    fixed as history grows."""
    o = table(spark, sf_dir, "orders")
    m = (
        F.year("o_orderdate").cast("bigint") * 12
        + F.month("o_orderdate").cast("bigint")
        - 1
    )
    om = o.select(
        F.col("o_custkey").alias("c"),
        m.alias("m"),
        F.col("o_totalprice").alias("rev"),
    )
    cohort = om.groupBy("c").agg(F.min("m").alias("c0"))
    sizes = cohort.groupBy("c0").agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    per_offset = (
        om.join(cohort, "c")
        .groupBy("c0", (F.col("m") - F.col("c0")).alias("off"))
        .agg(F.sum("rev").alias("rev"))
    )
    w = Window.partitionBy("c0").orderBy("off").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = per_offset.withColumn("cum_rev", F.sum("rev").over(w))
    return (
        cum.filter(F.col("off") <= 12)
        .join(sizes, "c0")
        .select(
            F.col("c0").alias("cohort_month"),
            F.col("off").cast("bigint").alias("month_offset"),
            "n_customers",
            round4(F.col("cum_rev")).alias("cum_revenue"),
            round4(F.col("cum_rev") / F.col("n_customers")).alias(
                "ltv_per_customer"
            ),
        )
    )


@query(
    "events_stickiness",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT user_id,
               datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d
        FROM events
    ),
    days AS (SELECT DISTINCT d FROM ud),
    contrib AS (
        SELECT user_id, d + x.o AS target
        FROM ud CROSS JOIN (SELECT unnest(range(30)) AS o) x
    ),
    mau AS (
        SELECT target AS d, COUNT(DISTINCT user_id) AS mau30
        FROM contrib WHERE target IN (SELECT d FROM days)
        GROUP BY target
    ),
    dau AS (SELECT d, COUNT(*) AS dau FROM ud GROUP BY d)
    SELECT CAST(dau.d AS BIGINT) AS day_num, dau.dau,
           CAST(mau.mau30 AS BIGINT) AS mau30,
           FLOOR(CAST(dau.dau AS DOUBLE) / mau.mau30 * 10000 + 0.5)
               / 10000 AS stickiness
    FROM dau JOIN mau ON dau.d = mau.d
    """,
)
def events_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stickiness (DAU/MAU): the engagement-quality ratio — what
    fraction of the month's actives showed up today. Same contribution-
    explode identity as events_dau_rolling at window 30: each distinct
    (user, day) feeds 30 target days, one count-distinct per target —
    constant 30× replication of the DISTINCT pairs (not the raw
    events), two partial-aggregable shuffles, no per-day re-scan. The
    ratio projects with the stable 4-dp round; day coverage is gated
    by the observed-day spine broadcast, like the 7-day twin."""
    e = table(spark, sf_dir, "events")
    ud = e.select(
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01")).alias("d"),
    ).distinct()
    days = ud.select("d").distinct()
    contrib = ud.select(
        "user_id",
        F.explode(F.sequence(F.col("d"), F.col("d") + 29)).alias("target"),
    )
    mau = (
        contrib.join(F.broadcast(days), contrib.target == days.d, "left_semi")
        .groupBy("target")
        .agg(F.count_distinct("user_id").alias("mau30"))
    )
    dau = ud.groupBy("d").agg(F.count(F.lit(1)).alias("dau"))
    return dau.join(mau, dau.d == mau.target).select(
        F.col("d").cast("bigint").alias("day_num"),
        "dau",
        F.col("mau30").cast("bigint").alias("mau30"),
        round4(F.col("dau").cast("double") / F.col("mau30")).alias(
            "stickiness"
        ),
    )


@query(
    "events_ab_test_analysis",
    oracle="""
    WITH assigned AS (
        SELECT DISTINCT user_id,
               CAST('0x' || substr(md5('ab:' || user_id), 1, 15)
                    AS BIGINT) % 2 AS arm
        FROM events
    ),
    conv AS (
        SELECT DISTINCT user_id FROM events
        WHERE event_type = 'purchase' AND value > 150
    ),
    arms AS (
        SELECT arm, COUNT(*) AS n,
               CAST(SUM(CASE WHEN conv.user_id IS NOT NULL
                        THEN 1 ELSE 0 END) AS BIGINT) AS x
        FROM assigned LEFT JOIN conv USING (user_id)
        GROUP BY arm
    ),
    wide AS (
        SELECT MAX(CASE WHEN arm = 0 THEN n END) AS n0,
               MAX(CASE WHEN arm = 0 THEN x END) AS x0,
               MAX(CASE WHEN arm = 1 THEN n END) AS n1,
               MAX(CASE WHEN arm = 1 THEN x END) AS x1
        FROM arms
    )
    SELECT n0, x0, n1, x1,
           FLOOR(CAST(x0 AS DOUBLE) / n0 * 10000 + 0.5) / 10000 AS rate0,
           FLOOR(CAST(x1 AS DOUBLE) / n1 * 10000 + 0.5) / 10000 AS rate1,
           FLOOR((CAST(x1 AS DOUBLE) / n1 - CAST(x0 AS DOUBLE) / n0)
                 * 10000 + 0.5) / 10000 AS lift,
           FLOOR(((CAST(x1 AS DOUBLE) / n1 - CAST(x0 AS DOUBLE) / n0)
                  / NULLIF(sqrt((CAST(x0 + x1 AS DOUBLE) / (n0 + n1))
                         * (1 - CAST(x0 + x1 AS DOUBLE) / (n0 + n1))
                         * (1.0 / n0 + 1.0 / n1)), 0))
                 * 10000 + 0.5) / 10000 AS z
    FROM wide
    """,
)
def events_ab_test_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: deterministic 50/50 hash assignment
    (the md5 family — the SAME user always lands in the same arm, on
    any engine, with no assignment table to store), per-arm conversion
    to purchase, lift, and the pooled two-proportion z statistic. This
    is the experimentation tier the engagement operators feed: at
    100 TB the whole analysis is two distinct-reductions on user_id
    and a 2-row pivot — assignment is computed, never joined from
    state. The z-score's sqrt runs over exact integer ratios, so the
    4-dp stable round fully absorbs its single-ulp; arm hashing on the
    DISTINCT user set keeps heavy users from weighting assignment."""
    e = table(spark, sf_dir, "events")
    assigned = e.select(
        "user_id",
        F.expr(
            "CAST(conv(substring(md5(concat('ab:', user_id)), 1, 15),"
            " 16, 10) AS BIGINT) % 2"
        ).alias("arm"),
    ).distinct()
    # conversion = a HIGH-VALUE purchase (> 150): on the live fixture
    # every user purchases something, which would make the pooled
    # variance zero and z NULL — the threshold keeps both arms'
    # conversion genuinely partial (pinned in tests)
    conv = (
        e.filter(
            (F.col("event_type") == "purchase") & (F.col("value") > 150)
        )
        .select("user_id")
        .distinct()
        .withColumn("converted", F.lit(1))
    )
    arms = (
        assigned.join(conv, "user_id", "left")
        .groupBy("arm")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.coalesce("converted", F.lit(0))).cast("bigint").alias("x"),
        )
    )
    wide = arms.agg(
        F.max(F.when(F.col("arm") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("arm") == 0, F.col("x"))).alias("x0"),
        F.max(F.when(F.col("arm") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("arm") == 1, F.col("x"))).alias("x1"),
    )
    r0 = F.col("x0").cast("double") / F.col("n0")
    r1 = F.col("x1").cast("double") / F.col("n1")
    p = (F.col("x0") + F.col("x1")).cast("double") / (
        F.col("n0") + F.col("n1")
    )
    # a universally-converting (or never-converting) population has
    # zero pooled variance: z is undefined -> NULL via NULLIF, the
    # same degenerate-denominator convention as the regression keys
    z = (r1 - r0) / F.nullif(
        F.sqrt(p * (1 - p) * (1.0 / F.col("n0") + 1.0 / F.col("n1"))),
        F.lit(0.0),
    )
    return wide.select(
        "n0", "x0", "n1", "x1",
        round4(r0).alias("rate0"),
        round4(r1).alias("rate1"),
        round4(r1 - r0).alias("lift"),
        round4(z).alias("z"),
    )


@query(
    "events_window_funnel",
    oracle=f"""
    WITH o AS (
        SELECT user_id, event_type, {_SEC} AS sec,
               last_value(CASE WHEN event_type = 'click' THEN {_SEC} END
                          IGNORE NULLS) OVER w AS last_click_sec
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY {_SEC}, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    flags AS (
        SELECT user_id,
               MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                   AS did_click,
               MAX(CASE WHEN event_type = 'purchase'
                        AND last_click_sec IS NOT NULL
                        AND sec - last_click_sec <= 3600
                        THEN 1 ELSE 0 END) AS did_convert
        FROM o GROUP BY user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(did_click) AS BIGINT) AS n_clicked,
           CAST(SUM(did_convert) AS BIGINT) AS n_converted_1h,
           FLOOR(CAST(SUM(did_convert) AS DOUBLE)
                 / NULLIF(SUM(did_click), 0) * 10000 + 0.5) / 10000
               AS conv_rate
    FROM flags
    """,
)
def events_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-sequence window funnel: click THEN purchase within one
    hour — the time-constrained ordered funnel (ClickHouse's
    windowFunnel shape) that the unordered funnel_conversion and the
    uncapped attribution_last_touch both miss. The running
    last-click-time window state makes the sequence check row-local
    (O(1) state per user, one user_id shuffle, no click×purchase
    self-join that would blow up on heavy clickers); per-user flags
    then collapse to a single funnel report row. The conversion rate
    guards its denominator with NULLIF on both sides."""
    e = table(spark, sf_dir, "events").withColumn("sec", _sec_col())
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    last_click = F.last(
        F.when(F.col("event_type") == "click", F.col("sec")),
        ignorenulls=True,
    ).over(w)
    o = e.withColumn("last_click_sec", last_click)
    flags = o.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "click", 1).otherwise(0)
        ).alias("did_click"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & F.col("last_click_sec").isNotNull()
                & (F.col("sec") - F.col("last_click_sec") <= 3600),
                1,
            ).otherwise(0)
        ).alias("did_convert"),
    )
    return flags.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("did_click").cast("bigint").alias("n_clicked"),
        F.sum("did_convert").cast("bigint").alias("n_converted_1h"),
        round4(
            F.sum("did_convert").cast("double")
            / F.nullif(F.sum("did_click"), F.lit(0))
        ).alias("conv_rate"),
    )


@query(
    "stats_power_analysis",
    oracle="""
    WITH assigned AS (
        SELECT DISTINCT user_id,
               CAST('0x' || substr(md5('ab:' || user_id), 1, 15)
                    AS BIGINT) % 2 AS arm
        FROM events
    ),
    conv AS (
        SELECT DISTINCT user_id FROM events
        WHERE event_type = 'purchase' AND value > 150
    ),
    arms AS (
        SELECT arm, COUNT(*) AS n,
               CAST(SUM(CASE WHEN conv.user_id IS NOT NULL
                        THEN 1 ELSE 0 END) AS BIGINT) AS x
        FROM assigned LEFT JOIN conv USING (user_id)
        GROUP BY arm
    ),
    base AS (
        SELECT SUM(n) AS n_total,
               CAST(SUM(x) AS DOUBLE) / SUM(n) AS p,
               MIN(n) AS n_arm
        FROM arms
    )
    SELECT CAST(n_total AS BIGINT) AS n_total,
           CAST(n_arm AS BIGINT) AS n_per_arm,
           FLOOR(p * 10000 + 0.5) / 10000 AS baseline_rate,
           FLOOR(((1.96 + 0.8416) * sqrt(2.0 * p * (1 - p) / n_arm))
                 * 10000 + 0.5) / 10000 AS mde_abs,
           FLOOR(((1.96 + 0.8416) * sqrt(2.0 * p * (1 - p) / n_arm)
                  / NULLIF(p, 0)) * 10000 + 0.5) / 10000 AS mde_rel
    FROM base
    """,
)
def stats_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment power analysis: the minimum detectable effect at
    α = 0.05 (two-sided) and 80% power for the A/B setup of
    events_ab_test_analysis — MDE = (z_α/2 + z_β)·√(2p(1−p)/n_arm),
    the pre-registration number every experiment review asks for
    BEFORE the test runs (an observed lift below the MDE is noise no
    matter what the z-score says). Same two distinct-reductions as the
    A/B readout collapsed to a 1-row report; the conservative per-arm
    n is the SMALLER arm (hash assignment is near- but not exactly
    50/50). Pure closed-form arithmetic over exact integer counts —
    the z quantiles are literals, the single sqrt is IEEE-exact."""
    e = table(spark, sf_dir, "events")
    assigned = e.select(
        "user_id",
        F.expr(
            "CAST(conv(substring(md5(concat('ab:', user_id)), 1, 15),"
            " 16, 10) AS BIGINT) % 2"
        ).alias("arm"),
    ).distinct()
    conv = (
        e.filter(
            (F.col("event_type") == "purchase") & (F.col("value") > 150)
        )
        .select("user_id")
        .distinct()
        .withColumn("converted", F.lit(1))
    )
    arms = (
        assigned.join(conv, "user_id", "left")
        .groupBy("arm")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.coalesce("converted", F.lit(0))).cast("bigint").alias("x"),
        )
    )
    base = arms.agg(
        F.sum("n").alias("n_total"),
        (F.sum("x").cast("double") / F.sum("n")).alias("p"),
        F.min("n").alias("n_arm"),
    )
    mde = (1.96 + 0.8416) * F.sqrt(
        2.0 * F.col("p") * (1 - F.col("p")) / F.col("n_arm")
    )
    return base.select(
        F.col("n_total").cast("bigint").alias("n_total"),
        F.col("n_arm").cast("bigint").alias("n_per_arm"),
        round4(F.col("p")).alias("baseline_rate"),
        round4(mde).alias("mde_abs"),
        round4(mde / F.nullif(F.col("p"), F.lit(0.0))).alias("mde_rel"),
    )


@query(
    "attribution_multi_touch",
    oracle=f"""
    WITH o AS (
        SELECT user_id, event_id, event_type,
               CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                    OVER w AS BIGINT) AS n_touches,
               first_value(CASE WHEN event_type = 'click' THEN event_id END
                           IGNORE NULLS) OVER w AS first_click_id,
               last_value(CASE WHEN event_type = 'click' THEN event_id END
                          IGNORE NULLS) OVER w AS last_click_id
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY {_SEC}, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_id AS purchase_id, user_id, n_touches,
           first_click_id, last_click_id,
           CAST(FLOOR(10000.0 / NULLIF(n_touches, 0)) AS BIGINT) AS credit_bp
    FROM o WHERE event_type = 'purchase'
    """,
)
def attribution_multi_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: each purchase reports how many
    clicks preceded it, the first and last of them, and the equal
    credit share each would receive (floor basis points — integer, so
    the split is hash-exact; NULL when no click preceded, mirroring
    attribution_last_touch's unattributed rows). All three facts are
    running window state over the same (user, time) ordering — one
    user_id shuffle shared by the count and both ignore-NULLs
    endpoints, O(1) state per row, no clicks-to-purchases self-join
    (which would shuffle both event classes again and skew on heavy
    clickers). The first/last pair is what position-based (U-shaped)
    attribution weights; n_touches is the denominator linear
    attribution divides by."""
    e = table(spark, sf_dir, "events").withColumn("sec", _sec_col())
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    click_id = F.when(F.col("event_type") == "click", F.col("event_id"))
    touched = e.select(
        "user_id",
        "event_id",
        "event_type",
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .over(w)
        .cast("bigint")
        .alias("n_touches"),
        F.first(click_id, ignorenulls=True).over(w).alias("first_click_id"),
        F.last(click_id, ignorenulls=True).over(w).alias("last_click_id"),
    )
    return touched.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        "n_touches",
        "first_click_id",
        "last_click_id",
        F.floor(F.lit(10000.0) / F.nullif(F.col("n_touches"), F.lit(0)))
        .cast("bigint")
        .alias("credit_bp"),
    )


@query(
    "events_interarrival_histogram",
    oracle=f"""
    WITH gaps AS (
        SELECT {_SEC} - lag({_SEC}) OVER (
                   PARTITION BY user_id
                   ORDER BY {_SEC}, event_id) AS gap_s
        FROM events
    )
    SELECT CAST(LEAST(gap_s // 60, 60) AS BIGINT) AS bucket_min,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM gaps WHERE gap_s IS NOT NULL
    GROUP BY 1
    """,
)
def events_interarrival_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival-time distribution: per-user gaps between
    consecutive events, bucketed by minute with a 60-minute overflow
    cap — the empirical histogram a sessionization threshold (the
    sessionize_batch 30-min gap) should be READ FROM rather than
    guessed; its valley is the session boundary. Gap computation is
    the same single user_id-shuffle lag window every behavior key
    shares; bucketing is pure integer arithmetic (floor-div 60,
    LEAST cap) so the rollup — at most 61 groups — is
    map-side-combinable and hash-exact. First events per user drop
    out as NULL gaps on both engines."""
    e = table(spark, sf_dir, "events").withColumn("sec", _sec_col())
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    gaps = e.select((F.col("sec") - F.lag("sec").over(w)).alias("gap_s"))
    return (
        gaps.filter(F.col("gap_s").isNotNull())
        .select(
            F.least(F.floor(F.col("gap_s") / 60), F.lit(60))
            .cast("bigint")
            .alias("bucket_min")
        )
        .groupBy("bucket_min")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "events_path_analysis",
    oracle=f"""
    WITH seq AS (
        SELECT event_type AS e1,
               lead(event_type, 1) OVER w AS e2,
               lead(event_type, 2) OVER w AS e3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY {_SEC}, event_id)
    )
    SELECT e1 || '>' || e2 || '>' || e3 AS path,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM seq WHERE e2 IS NOT NULL AND e3 IS NOT NULL
    GROUP BY 1
    ORDER BY n DESC, path ASC
    LIMIT 10
    """,
)
def events_path_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 three-step behavior paths (event-type trigrams within a
    user's timeline) — the depth-3 extension of
    events_transition_matrix (first-order) that surfaces WORKFLOWS
    (browse>click>purchase vs browse>click>error) instead of single
    hops; the behavioral twin of text_bigram_lm's n-gram step-up. Two
    leads share one window sort on the standard (user, sec, event_id)
    total order; incomplete tails (fewer than 2 successors) drop out
    via the NULL filter identically cross-engine. The rollup groups
    on O(|event types|³) ≤ a few hundred keys — map-side combinable —
    and the top-10 is a TakeOrdered with the path itself as the
    deterministic tie-break."""
    e = table(spark, sf_dir, "events").withColumn("sec", _sec_col())
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    seq = e.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    return (
        seq.filter(F.col("e2").isNotNull() & F.col("e3").isNotNull())
        .select(
            F.concat_ws(">", "e1", "e2", "e3").alias("path"),
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("path").asc())
        .limit(10)
    )


@query(
    "events_conversion_latency_quantiles",
    oracle=f"""
    WITH c AS (
        SELECT user_id, MIN({_SEC}) AS csec
        FROM events WHERE event_type = 'click' GROUP BY user_id
    ),
    p AS (
        SELECT e.user_id, c.csec, MIN({_SEC}) AS psec
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND {_SEC} >= c.csec
        GROUP BY e.user_id, c.csec
    ),
    d AS (SELECT psec - csec AS delay_s FROM p),
    v AS (SELECT delay_s, COUNT(*) AS cnt FROM d GROUP BY delay_s),
    cum AS (
        SELECT delay_s,
               SUM(cnt) OVER (ORDER BY delay_s
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cc,
               (SELECT COUNT(*) FROM d) AS n
        FROM v
    )
    SELECT CAST(ANY_VALUE(n) AS BIGINT) AS n_conv,
           CAST(MIN(CASE WHEN cc >= (n + 1) // 2 THEN delay_s END)
                AS BIGINT) AS p50_s,
           CAST(MIN(CASE WHEN cc >= (9 * n + 9) // 10 THEN delay_s END)
                AS BIGINT) AS p90_s
    FROM cum
    """,
)
def events_conversion_latency_quantiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Click→purchase latency distribution: each user's first click
    paired with their first purchase at-or-after it, then the exact
    DISCRETE p50/p90 of the delay — the SLA-style readout
    time_to_conversion's per-user rows feed. The quantile never ranks
    raw rows: delays collapse to a distinct-value/count relation
    first (stats_mann_whitney's trick), so the one global cumulative
    window runs over O(distinct delay seconds) — bounded by the
    integer delay domain, not by users — and the percentile is the
    smallest value whose cumulative count reaches the integer-ceil
    rank ((n+1)//2, (9n+9)//10 — agg_percentile_disc's no-doubles
    convention). n arrives as a 1-row broadcast. Everything is BIGINT
    end-to-end: no rounding anywhere."""
    e = table(spark, sf_dir, "events").withColumn("sec", _sec_col())
    c = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("sec").alias("csec"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("sec") >= F.col("csec"))
        .groupBy("user_id", "csec")
        .agg(F.min("sec").alias("psec"))
    )
    d = p.select((F.col("psec") - F.col("csec")).alias("delay_s"))
    v = d.groupBy("delay_s").agg(F.count(F.lit(1)).alias("cnt"))
    wcum = Window.orderBy("delay_s").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    n = d.agg(F.count(F.lit(1)).alias("n"))
    cum = v.withColumn("cc", F.sum("cnt").over(wcum)).crossJoin(
        F.broadcast(n)
    )
    r50 = F.floor((F.col("n") + 1) / 2)
    r90 = F.floor((9 * F.col("n") + 9) / 10)
    return cum.agg(
        F.any_value(F.col("n")).cast("bigint").alias("n_conv"),
        F.min(F.when(F.col("cc") >= r50, F.col("delay_s")))
        .cast("bigint")
        .alias("p50_s"),
        F.min(F.when(F.col("cc") >= r90, F.col("delay_s")))
        .cast("bigint")
        .alias("p90_s"),
    )


@query(
    "events_bot_detection",
    oracle=f"""
    WITH e AS (
        SELECT user_id, event_type, {_SEC} AS sec FROM events
    ),
    tc AS (
        SELECT user_id, event_type, COUNT(*) AS c
        FROM e GROUP BY user_id, event_type
    ),
    tp AS (
        SELECT user_id, c,
               CAST(c AS DOUBLE) / SUM(c) OVER (PARTITION BY user_id) AS p
        FROM tc
    ),
    u AS (
        SELECT user_id, CAST(SUM(c) AS BIGINT) AS n,
               FLOOR(-SUM(p * ln(p)) * 10000 + 0.5) / 10000 AS type_entropy
        FROM tp GROUP BY user_id
    ),
    span AS (
        SELECT user_id, MAX(sec) - MIN(sec) AS span_s FROM e
        GROUP BY user_id
    ),
    feat AS (
        SELECT u.user_id, n, span_s, type_entropy,
               FLOOR((CAST(n AS DOUBLE) * 86400 / (span_s + 1))
                     * 10000 + 0.5) / 10000 AS events_per_day
        FROM u JOIN span ON u.user_id = span.user_id
    ),
    mom AS (
        SELECT AVG(events_per_day) AS mu, stddev_samp(events_per_day) AS sd
        FROM feat
    )
    SELECT user_id, n, span_s, events_per_day, type_entropy,
           FLOOR(((events_per_day - mu) / sd) * 10000 + 0.5) / 10000
               AS rate_z,
           FLOOR(((events_per_day - mu) / sd) * 10000 + 0.5) / 10000 > 1.5
               AND type_entropy < 1.55 AS is_bot
    FROM feat CROSS JOIN mom
    """,
)
def events_bot_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-based bot/spam scoring per user: event volume, active
    span, events-per-day rate, and event-type entropy (a scripted
    client hammers one endpoint — low diversity; a human's mix is
    high-entropy) — the traffic-hygiene filter that runs BEFORE any
    behavioral analytics or training-data export trusts the events
    table. The rate flag is SELF-CALIBRATING: a z-score against the
    live population moments (1-row broadcast, anomaly_zscore class)
    rather than a fixture-coupled absolute threshold, composed with
    an absolute entropy floor (ln-scale; 5 uniform types ≈ 1.609).
    Shape: two rollups sharing the user_id shuffle, a per-user
    entropy window bounded by |event types|, and a 1-row moment
    cross — no windows over raw events. The z is rounded before the
    1.5 cut (boundary-ulp rule)."""
    e = table(spark, sf_dir, "events").withColumn("sec", _sec_col())
    tc = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("c"))
    wtot = Window.partitionBy("user_id")
    p = F.col("c").cast("double") / F.sum("c").over(wtot)
    ent = tc.withColumn("pe", -p * F.log(p)).groupBy("user_id").agg(
        F.sum("c").cast("bigint").alias("n"),
        round4(F.sum("pe")).alias("type_entropy"),
    )
    span = e.groupBy("user_id").agg(
        (F.max("sec") - F.min("sec")).alias("span_s")
    )
    feat = ent.join(span, "user_id").withColumn(
        "events_per_day",
        round4(F.col("n").cast("double") * 86400 / (F.col("span_s") + 1)),
    )
    mom = feat.agg(
        F.avg("events_per_day").alias("mu"),
        F.stddev_samp("events_per_day").alias("sd"),
    )
    z = round4((F.col("events_per_day") - F.col("mu")) / F.col("sd"))
    return feat.crossJoin(F.broadcast(mom)).select(
        "user_id",
        "n",
        "span_s",
        "events_per_day",
        "type_entropy",
        z.alias("rate_z"),
        ((z > 1.5) & (F.col("type_entropy") < 1.55)).alias("is_bot"),
    )


@query(
    "ml_training_snapshot",
    oracle=f"""
    WITH e AS (
        SELECT event_id, user_id, event_type, value, {_SEC} AS sec
        FROM events
    ),
    feat AS (
        SELECT event_id, user_id, event_type, sec,
               COALESCE(SUM(CASE WHEN event_type = 'click' THEN 1 END)
                   OVER w7, 0) AS clicks_7d,
               FLOOR(COALESCE(SUM(CASE WHEN event_type = 'purchase'
                                       THEN value END) OVER w7, 0.0)
                     * 10000 + 0.5) / 10000 AS spend_7d,
               COALESCE(COUNT(*) OVER wlife, 0) AS prior_events
        FROM e
        WINDOW w7 AS (PARTITION BY user_id ORDER BY sec
                      RANGE BETWEEN 604800 PRECEDING AND 1 PRECEDING),
               wlife AS (PARTITION BY user_id ORDER BY sec
                         RANGE BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING)
    )
    SELECT event_id AS purchase_id, user_id, sec,
           CAST(clicks_7d AS BIGINT) AS clicks_7d, spend_7d,
           CAST(prior_events AS BIGINT) AS prior_events
    FROM feat WHERE event_type = 'purchase'
    """,
)
def ml_training_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free training-set assembly: for every purchase (the
    label event), features computed from STRICTLY PRIOR activity —
    clicks and spend in the trailing 7 days, lifetime prior event
    count. This is the feature-store point-in-time-correctness
    pattern: the frames end at 1 PRECEDING on the VALUE axis (RANGE,
    not ROWS), so nothing co-timestamped with or later than the label
    can leak into its features, and the prior-window membership is a
    pure function of the timestamp — deterministic even among
    same-second peers, where a ROWS frame would depend on tie order
    (the lineitem fuzz finding's hazard class). All three features
    share one user_id shuffle and one sort; at 100 TB this is the
    single-pass alternative to N point-in-time joins against a
    feature table (join_temporal_snapshot is the two-table form)."""
    e = table(spark, sf_dir, "events").withColumn("sec", _sec_col())
    w7 = (
        Window.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(-604800, -1)
    )
    wlife = (
        Window.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    feat = e.select(
        "event_id",
        "user_id",
        "event_type",
        "sec",
        F.coalesce(
            F.sum(F.when(F.col("event_type") == "click", 1)).over(w7),
            F.lit(0),
        )
        .cast("bigint")
        .alias("clicks_7d"),
        round4(
            F.coalesce(
                F.sum(
                    F.when(F.col("event_type") == "purchase", F.col("value"))
                ).over(w7),
                F.lit(0.0),
            )
        ).alias("spend_7d"),
        F.coalesce(F.count(F.lit(1)).over(wlife), F.lit(0))
        .cast("bigint")
        .alias("prior_events"),
    )
    return feat.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        "sec",
        "clicks_7d",
        "spend_7d",
        "prior_events",
    )


@query(
    "events_user_overlap_jaccard",
    oracle="""
    WITH s AS (
        SELECT DISTINCT user_id, event_type FROM events
    ),
    totals AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS nu
        FROM s GROUP BY event_type
    ),
    pairs AS (
        SELECT a.event_type AS t1, b.event_type AS t2,
               CAST(COUNT(*) AS BIGINT) AS n_both
        FROM s a JOIN s b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY t1, t2
    )
    SELECT t1, t2, n_both, ta.nu AS n1, tb.nu AS n2,
           FLOOR((CAST(n_both AS DOUBLE) / (ta.nu + tb.nu - n_both))
                 * 10000 + 0.5) / 10000 AS jaccard
    FROM pairs
    JOIN totals ta ON pairs.t1 = ta.event_type
    JOIN totals tb ON pairs.t2 = tb.event_type
    """,
)
def events_user_overlap_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap between event types: Jaccard |A∩B| / |A∪B| of
    the user sets for every unordered type pair — the
    segment-overlap readout behind "do purchasers also search?"
    targeting questions, and the exact ground truth the MinHash
    machinery (dedup_near_minhash) estimates at document scale. The
    (user, type) relation is deduplicated FIRST (one distinct
    shuffle), so the self-join fans out at most |types| rows per
    user — intersection counts come from one equi-join on user with
    the t1 < t2 triangle cut, union sizes by inclusion-exclusion
    from the O(types) totals (no second pass over users). All
    integer until the final division."""
    e = table(spark, sf_dir, "events")
    s = e.select("user_id", "event_type").distinct()
    totals = s.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("nu")
    )
    a = s.alias("a")
    b = s.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("t1"),
            F.col("b.event_type").alias("t2"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_both"))
    )
    ta = totals.select(
        F.col("event_type").alias("ka"), F.col("nu").alias("n1")
    )
    tb = totals.select(
        F.col("event_type").alias("kb"), F.col("nu").alias("n2")
    )
    return (
        pairs.join(F.broadcast(ta), F.col("t1") == F.col("ka"))
        .join(F.broadcast(tb), F.col("t2") == F.col("kb"))
        .select(
            "t1",
            "t2",
            "n_both",
            "n1",
            "n2",
            round4(
                F.col("n_both").cast("double")
                / (F.col("n1") + F.col("n2") - F.col("n_both"))
            ).alias("jaccard"),
        )
    )


@query(
    "events_peak_concurrency",
    oracle=f"""
    WITH o AS (
        SELECT user_id, event_id, {_SEC} AS sec,
               lag({_SEC}) OVER (PARTITION BY user_id
                                 ORDER BY {_SEC}, event_id) AS prev_sec
        FROM events
    ),
    sess AS (
        SELECT user_id,
               SUM(CASE WHEN prev_sec IS NULL OR sec - prev_sec > 1800
                        THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY sec, event_id)
                   AS sid,
               sec
        FROM o
    ),
    spans AS (
        SELECT user_id, sid, MIN(sec) AS s0, MAX(sec) AS s1
        FROM sess GROUP BY user_id, sid
    ),
    clipped AS (
        SELECT user_id, sid, d.day,
               GREATEST(s0, d.day * 86400) AS cs,
               LEAST(s1, d.day * 86400 + 86399) AS ce
        FROM spans,
             unnest(generate_series(s0 // 86400, s1 // 86400)) AS d(day)
    ),
    deltas AS (
        SELECT day, cs AS sec, 1 AS delta FROM clipped
        UNION ALL
        SELECT day, ce + 1 AS sec, -1 AS delta FROM clipped
    ),
    running AS (
        SELECT day,
               SUM(delta) OVER (PARTITION BY day
                                ORDER BY sec, delta DESC
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS conc,
               delta
        FROM deltas
    )
    SELECT CAST(day AS BIGINT) AS day,
           CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_sessions,
           CAST(MAX(conc) AS BIGINT) AS peak_concurrency
    FROM running GROUP BY day
    """,
)
def events_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per day — the capacity number
    (licenses, connection pools, live-ops dashboards) that neither
    session COUNTS (sessionize_batch) nor event rates give: it needs
    the interval-overlap maximum, computed by the classic sweep line.
    Sessions (the 30-min-gap rule, same lineage as sessionize_batch)
    are CLIPPED to day boundaries first (explode over the ≤2 days a
    session touches), then each day processes its own +1/−1 delta
    stream with a running sum — windows partition by DAY, so sweep
    state is bounded by daily activity, never the timeline. Ties at
    one second order starts before ends (delta DESC — touching
    sessions overlap inclusively); the per-row running values among
    identical (sec, delta) rows are permutation-dependent but the
    per-day MAX is not, which is why only the max is emitted."""
    e = table(spark, sf_dir, "events").withColumn("sec", _sec_col())
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    marked = e.withColumn(
        "is_new",
        F.when(
            F.lag("sec").over(w).isNull()
            | (F.col("sec") - F.lag("sec").over(w) > 1800),
            1,
        ).otherwise(0),
    ).withColumn("sid", F.sum("is_new").over(w))
    spans = marked.groupBy("user_id", "sid").agg(
        F.min("sec").alias("s0"), F.max("sec").alias("s1")
    )
    clipped = spans.select(
        "s0",
        "s1",
        F.explode(
            F.sequence(
                F.floor(F.col("s0") / 86400), F.floor(F.col("s1") / 86400)
            )
        ).alias("day"),
    ).select(
        "day",
        F.greatest(F.col("s0"), F.col("day") * 86400).alias("cs"),
        F.least(F.col("s1"), F.col("day") * 86400 + 86399).alias("ce"),
    )
    deltas = clipped.select(
        "day", F.col("cs").alias("sec"), F.lit(1).alias("delta")
    ).unionByName(
        clipped.select(
            "day", (F.col("ce") + 1).alias("sec"), F.lit(-1).alias("delta")
        )
    )
    wrun = (
        Window.partitionBy("day")
        .orderBy(F.col("sec").asc(), F.col("delta").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = deltas.withColumn("conc", F.sum("delta").over(wrun))
    return running.groupBy("day").agg(
        F.sum(F.when(F.col("delta") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_sessions"),
        F.max("conc").cast("bigint").alias("peak_concurrency"),
    ).select(
        F.col("day").cast("bigint").alias("day"),
        "n_sessions",
        "peak_concurrency",
    )
