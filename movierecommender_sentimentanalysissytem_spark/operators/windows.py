"""Window functions (SURVEY.md §2.5).

The archetype's "top-N movies per user" generalizes to the full window
surface. Determinism rule: every ORDER BY inside a window carries a
unique trailing tiebreaker key, otherwise rank/lag results are
non-deterministic across partitions and the oracle hash diverges.

Scale notes: a window = one shuffle on partitionBy keys + per-partition
sort. Partition keys here are user/customer ids (high cardinality → even
distribution). An unpartitioned window (global ORDER BY) funnels all
data through one task and is deliberately absent from this surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from movierecommender_sentimentanalysissytem_spark.registry import query
from movierecommender_sentimentanalysissytem_spark.sources.tables import table


@query(
    "win_row_number_topk",
    oracle="""
    SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 4) AS total, rn
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rn
        FROM orders
    ) t WHERE rn <= 3
    """,
)
def win_row_number_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by price (the archetype's top-N
    recommendations shape). o_orderkey is the deterministic tiebreaker.
    """
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 4).alias("total"),
            "rn",
        )
    )


@query(
    "win_rank_dense",
    oracle="""
    SELECT p_brand, p_partkey,
           ROUND(p_retailprice, 4) AS price,
           CAST(RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS INTEGER) AS rnk,
           CAST(DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS INTEGER) AS drnk
    FROM part
    WHERE p_size <= 10
    """,
)
def win_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey")
    )
    return p.select(
        "p_brand",
        "p_partkey",
        F.round("p_retailprice", 4).alias("price"),
        F.rank().over(w).cast("int").alias("rnk"),
        F.dense_rank().over(w).cast("int").alias("drnk"),
    )


@query(
    "win_lag_lead",
    oracle="""
    SELECT user_id, event_id,
           ROUND(value, 4) AS value,
           ROUND(value - LAG(value) OVER w, 4) AS delta_prev,
           ROUND(LEAD(value) OVER w - value, 4) AS delta_next
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
    """,
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event value deltas. Ordered by the unique event_id (not
    the ns timestamp — SURVEY §1.2 rule) so both engines sort identically.
    """
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    return e.select(
        "user_id",
        "event_id",
        F.round("value", 4).alias("value"),
        F.round(F.col("value") - F.lag("value", 1).over(w), 4).alias("delta_prev"),
        F.round(F.lead("value", 1).over(w) - F.col("value"), 4).alias("delta_next"),
    )


@query(
    "win_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_spend
    FROM orders
    """,
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative revenue per customer over order date (orderkey breaks
    same-date ties deterministically)."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 4).alias("running_spend"),
    )


@query(
    "win_moving_avg",
    oracle="""
    SELECT user_id, event_id,
           ROUND(AVG(value) OVER (
               PARTITION BY user_id ORDER BY event_id
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS mavg3
    FROM events
    """,
)
def win_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        F.round(F.avg("value").over(w), 4).alias("mavg3"),
    )


@query(
    "win_range_frame",
    oracle="""
    SELECT p_brand, p_partkey, p_size,
           COUNT(*) OVER (
               PARTITION BY p_brand ORDER BY p_size
               RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS n_similar_size
    FROM part
    """,
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame on a numeric key: parts within ±2 size units of the
    current row's size, per brand. (COUNT over a RANGE frame depends only
    on values, not row order, so it's deterministic without a tiebreak.)
    """
    p = table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy("p_size").rangeBetween(-2, 2)
    return p.select(
        "p_brand",
        "p_partkey",
        "p_size",
        F.count(F.lit(1)).over(w).alias("n_similar_size"),
    )


@query(
    "win_ntile_percent",
    oracle="""
    SELECT o_orderkey,
           CAST(NTILE(4) OVER w AS INTEGER) AS quartile,
           ROUND(PERCENT_RANK() OVER w, 4) AS prank,
           ROUND(CUME_DIST() OVER w, 4) AS cdist
    FROM orders
    WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
    """,
)
def win_ntile_percent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartiles / percent_rank / cume_dist over the full order set,
    computed WITHOUT a global single-task window.

    A naive ``Window.orderBy(...)`` with no partition funnels every row
    through one task — the classic 100 TB cliff. This is the distributed
    two-pass form (same trick as curation_shard_token_budget's prefix
    sum), with exactly ONE full-data shuffle:

      1. bucket rows by a monotone range of the leading sort key
         (``floor(o_totalprice / W)`` — contiguous value ranges, so
         bucket order IS global order);
      2. per-bucket ``row_number`` — one hash shuffle on ``bkt``, all
         buckets ranked in parallel;
      3. per-bucket counts via map-side partial aggregation (the
         full-data side of that groupBy never shuffles — only
         O(buckets) partial rows move) → cumulative offsets via a
         window over that TINY frame, broadcast back;
      4. global rank = offset + local row number, and ntile /
         percent_rank / cume_dist fall out arithmetically (the sort key
         includes the unique ``o_orderkey``, so rank is tie-free and the
         tie-sensitive definitions collapse to rank math).

    Fixed-width buckets fit the fixture's bounded, roughly uniform
    price domain; at real scale the same plan runs with
    ``approxQuantile``-derived boundaries instead, which bounds skew
    without changing any downstream step. The only ordered-global state
    is the bucket count vector — O(buckets), not O(rows).
    """
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    b = o.withColumn(
        "bkt", F.floor(F.col("o_totalprice") / F.lit(10_000.0)).cast("long")
    )
    local = b.withColumn(
        "lrn",
        F.row_number().over(
            Window.partitionBy("bkt").orderBy("o_totalprice", "o_orderkey")
        ),
    )
    counts = b.groupBy("bkt").agg(F.count(F.lit(1)).alias("cnt"))
    w_bkt = Window.orderBy("bkt")
    offsets = counts.select(
        "bkt",
        F.coalesce(
            F.sum("cnt").over(w_bkt.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("off"),
        F.sum("cnt")
        .over(
            w_bkt.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        )
        .alias("n_total"),
    )
    ranked = local.join(F.broadcast(offsets), "bkt").withColumn(
        "rnk", F.col("off") + F.col("lrn")
    )
    # SQL NTILE(4): the first (n mod 4) tiles hold ceil(n/4) rows, the
    # rest floor(n/4). CASE branches evaluate lazily, so the base-0
    # (< 4 rows) edge never divides by zero.
    n, rnk = F.col("n_total"), F.col("rnk")
    base = F.expr("n_total div 4")
    rem = n % 4
    cut = rem * (base + 1)
    quartile = F.when(
        rnk <= cut, F.expr("(rnk - 1) div ((n_total div 4) + 1)") + 1
    ).otherwise(rem + F.expr("(rnk - (n_total % 4) * ((n_total div 4) + 1) - 1) div (n_total div 4)") + 1)
    prank = F.when(n == 1, F.lit(0.0)).otherwise((rnk - 1) / (n - 1))
    return ranked.select(
        "o_orderkey",
        quartile.cast("int").alias("quartile"),
        F.round(prank, 4).alias("prank"),
        F.round(rnk / n, 4).alias("cdist"),
    )


@query(
    "win_first_last",
    oracle="""
    SELECT user_id, event_id, event_type,
           FIRST_VALUE(event_type) OVER w AS first_type,
           LAST_VALUE(event_type) OVER w AS last_type,
           CAST(NTH_VALUE(event_id, 2) OVER w AS BIGINT) AS second_event
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth value over the full partition frame (explicit
    UNBOUNDED FOLLOWING — the default frame would make LAST_VALUE the
    current row)."""
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return e.select(
        "user_id",
        "event_id",
        "event_type",
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w).alias("last_type"),
        F.nth_value("event_id", 2).over(w).alias("second_event"),
    )


@query(
    "win_gaps_islands",
    oracle="""
    WITH days AS (
        SELECT DISTINCT user_id,
               CAST(epoch(date_trunc('day', ts)) / 86400 AS BIGINT) AS day
        FROM events
    ),
    grp AS (
        SELECT user_id, day,
               day - ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY day) AS island
        FROM days
    )
    SELECT user_id,
           CAST(MIN(day) AS BIGINT) AS streak_start_day,
           COUNT(*) AS streak_days
    FROM grp GROUP BY user_id, island
    HAVING COUNT(*) >= 3
    """,
)
def win_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: consecutive-day activity streaks per user (the
    retention/engagement primitive). The classic trick — day minus its
    per-user row_number is constant within a consecutive run — turns
    streak detection into one window plus one groupBy; no self-joins,
    no iteration, scales as two shuffles on user_id regardless of
    streak length."""
    e = table(spark, sf_dir, "events")
    days = e.select(
        "user_id",
        (
            F.unix_timestamp(F.date_trunc("day", F.col("ts"))) / 86400
        ).cast("bigint").alias("day"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    grp = days.withColumn(
        "island", F.col("day") - F.row_number().over(w)
    )
    return (
        grp.groupBy("user_id", "island")
        .agg(
            F.min("day").alias("streak_start_day"),
            F.count(F.lit(1)).alias("streak_days"),
        )
        .filter(F.col("streak_days") >= 3)
        .drop("island")
    )


@query(
    "win_pattern_sequence",
    oracle="""
    WITH o AS (
        SELECT user_id, event_id, event_type,
               date_trunc('second', ts) AS ts_s,
               lead(event_type, 1) OVER w AS t1,
               lead(event_type, 2) OVER w AS t2,
               lead(event_id, 1) OVER w AS e1,
               lead(event_id, 2) OVER w AS e2,
               lead(date_trunc('second', ts), 2) OVER w AS ts2
        FROM events
        WINDOW w AS (PARTITION BY user_id
                     ORDER BY date_trunc('second', ts), event_id)
    )
    SELECT user_id, event_id AS view_eid, e1 AS click_eid,
           e2 AS purchase_eid,
           strftime(ts_s, '%Y-%m-%d %H:%M:%S') AS started
    FROM o
    WHERE event_type = 'view' AND t1 = 'click' AND t2 = 'purchase'
      AND ts2 <= ts_s + INTERVAL 1 DAY
    """,
)
def win_pattern_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-pattern detection (the MATCH_RECOGNIZE / CEP shape Spark
    has no native operator for): find strictly consecutive
    view→click→purchase triples per user completing within one
    day. Expressed as a lead() chain over the per-user time order
    — one window pass, one shuffle on user_id, no self-joins (the
    naive 3-way self-join shuffles the events table three times and
    needs an adjacency filter afterwards anyway). (ts, event_id) is
    the total order, so 'consecutive' is well-defined under ties."""
    e = table(spark, sf_dir, "events").withColumn(
        "ts_s", F.date_trunc("second", F.col("ts"))
    )
    w = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
    o = e.select(
        "user_id",
        "event_id",
        "event_type",
        "ts_s",
        F.lead("event_type", 1).over(w).alias("t1"),
        F.lead("event_type", 2).over(w).alias("t2"),
        F.lead("event_id", 1).over(w).alias("e1"),
        F.lead("event_id", 2).over(w).alias("e2"),
        F.lead("ts_s", 2).over(w).alias("ts2"),
    )
    return o.filter(
        (F.col("event_type") == "view")
        & (F.col("t1") == "click")
        & (F.col("t2") == "purchase")
        & (F.col("ts2") <= F.col("ts_s") + F.expr("INTERVAL 1 DAY"))
    ).select(
        "user_id",
        F.col("event_id").alias("view_eid"),
        F.col("e1").alias("click_eid"),
        F.col("e2").alias("purchase_eid"),
        F.date_format("ts_s", "yyyy-MM-dd HH:mm:ss").alias("started"),
    )


@query(
    "win_share_of_total",
    oracle="""
    SELECT event_id, user_id,
           FLOOR((value / SUM(value) OVER (PARTITION BY user_id))
                 * 10000 + 0.5) / 10000 AS share_of_user,
           CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT)
               AS n_user_events
    FROM events WHERE event_type = 'purchase'
    """,
)
def win_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-group projection: each purchase's fraction of its
    user's total spend — the percent-of-total idiom every BI layer
    ships. The window has PARTITION BY but no ORDER BY, so the frame
    is the whole partition and the operator computes ONE sum per
    group, broadcast to its rows — no sort, no running state, one
    user_id shuffle. (A global share-of-ALL variant would instead use
    a 1-row aggregate broadcast, the tpch_q11 pattern — a global
    no-order window is a single-partition cliff.) Both engines divide
    their own partition sums, which can differ in final ulps from
    summation order — absorbed by the 4-dp guard round."""
    from movierecommender_sentimentanalysissytem_spark.functions.rounding import (
        round4,
    )

    e = table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    w = Window.partitionBy("user_id")
    return e.select(
        "event_id",
        "user_id",
        round4(F.col("value") / F.sum("value").over(w)).alias(
            "share_of_user"
        ),
        F.count(F.lit(1)).over(w).alias("n_user_events"),
    )


@query(
    "win_topk_with_ties",
    oracle="""
    WITH b AS (
        SELECT c_custkey, c_mktsegment,
               CAST(FLOOR(c_acctbal / 100) AS BIGINT) AS band
        FROM customer
    ),
    r AS (
        SELECT *,
               rank() OVER (PARTITION BY c_mktsegment
                            ORDER BY band DESC) AS rnk,
               row_number() OVER (PARTITION BY c_mktsegment
                                  ORDER BY band DESC, c_custkey) AS rn
        FROM b
    )
    SELECT c_mktsegment AS segment, c_custkey AS custkey, band,
           CAST(rnk AS BIGINT) AS rnk, rn > 3 AS is_tie_overflow
    FROM r WHERE rnk <= 3
    """,
)
def win_topk_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k WITH TIES — the FETCH FIRST 3 ROWS WITH TIES semantics:
    rank() <= k keeps every peer of the k-th row, where
    win_row_number_topk's row_number() <= k silently drops all but an
    arbitrary one (arbitrary = whatever the tie-break picks; without a
    unique tie-break it isn't even deterministic — exactly the
    ambiguity the fuzzer's lineitem finding documented). Ranking is on
    a banded balance (FLOOR/100) so the fixture genuinely has peers;
    is_tie_overflow marks the rows a WITHOUT-ties cut would have
    dropped, via a row_number with the c_custkey total-order
    tie-break. One window shuffle on segment; rank and row_number
    share the sort."""
    c = table(spark, sf_dir, "customer")
    b = c.select(
        "c_custkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 100).cast("bigint").alias("band"),
    )
    w_rank = Window.partitionBy("c_mktsegment").orderBy(F.col("band").desc())
    w_rn = Window.partitionBy("c_mktsegment").orderBy(
        F.col("band").desc(), F.col("c_custkey").asc()
    )
    return (
        b.withColumn("rnk", F.rank().over(w_rank).cast("bigint"))
        .withColumn("rn", F.row_number().over(w_rn))
        .filter(F.col("rnk") <= 3)
        .select(
            F.col("c_mktsegment").alias("segment"),
            F.col("c_custkey").alias("custkey"),
            "band",
            "rnk",
            (F.col("rn") > 3).alias("is_tie_overflow"),
        )
    )
