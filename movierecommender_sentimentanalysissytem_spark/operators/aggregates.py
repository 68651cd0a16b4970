"""Aggregation operators (SURVEY.md §2.4).

Scale notes: every groupBy here compiles to partial (map-side) +
final hash aggregation — one shuffle keyed on the grouping columns.
Grouping keys are low-cardinality categorical columns, so the reduce
side is tiny regardless of input scale; AQE coalesces the post-shuffle
partitions. ``count_distinct`` is the one genuinely expensive shape
(expands before it contracts) — its approximate HLL twin
(`agg_approx_count_distinct`) is the 100 TB substitute.

Float rule (SURVEY.md §1.2): every floating aggregate is rounded to
4 dp identically on both sides; distributed summation order never
shows above 4 dp at fixture magnitudes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from movierecommender_sentimentanalysissytem_spark.functions.rounding import round4
from movierecommender_sentimentanalysissytem_spark.registry import query
from movierecommender_sentimentanalysissytem_spark.sources.tables import table


@query(
    "agg_global",
    oracle="""
    SELECT COUNT(*) AS n,
           ROUND(SUM(l_quantity), 4) AS sum_qty,
           ROUND(AVG(l_extendedprice), 4) AS avg_price,
           ROUND(MIN(l_discount), 4) AS min_disc,
           ROUND(MAX(l_tax), 4) AS max_tax,
           COUNT(DISTINCT l_returnflag) AS n_flags
    FROM lineitem
    """,
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.min("l_discount"), 4).alias("min_disc"),
        F.round(F.max("l_tax"), 4).alias("max_tax"),
        F.countDistinct("l_returnflag").alias("n_flags"),
    )


@query(
    "agg_groupby",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 4) AS sum_qty,
           ROUND(SUM(l_extendedprice), 4) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
           ROUND(AVG(l_quantity), 4) AS avg_qty,
           ROUND(AVG(l_extendedprice), 4) AS avg_price,
           ROUND(AVG(l_discount), 4) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-like pricing summary: 2 grouping keys, 8 aggregates.

    The workhorse shape of the recommender's exploratory analytics
    (avg rating / rating count per movie) generalized per SURVEY §2.4.
    """
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 4).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "agg_having",
    oracle="""
    SELECT o_custkey, COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 4) AS spend
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 12
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("spend"),
        )
        .filter(F.col("n_orders") >= 12)
    )


@query(
    "agg_count_distinct",
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
    FROM events
    GROUP BY event_type
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "agg_approx_count_distinct",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS exact_users,
           (ABS(approx_count_distinct(user_id) - COUNT(DISTINCT user_id))
              <= 0.05 * COUNT(DISTINCT user_id)) AS within_5pct_of_exact
    FROM events GROUP BY event_type
    """,
)
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate distinct — the scan-once, no-expansion shape
    that replaces exact COUNT(DISTINCT) at 100 TB.

    SQL-checkable form: raw estimates differ across engines by design,
    so each engine reports its OWN estimate only through the boolean
    ``within_5pct_of_exact`` (HLL rsd 0.01 here, DuckDB's HLL there);
    both engines agree on the exact count and on the boolean, which is
    what the driver hashes.

    Plan note: HLL depends only on the value SET, so both aggregates
    run over the deduped (event_type, user_id) pairs — one distinct
    shuffle plus a tiny agg, instead of the multi-pass expand that
    mixing exact count_distinct and approx in one agg would plan."""
    e = table(spark, sf_dir, "events")
    pairs = e.select("event_type", "user_id").distinct()
    return pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("exact_users"),
        (
            F.abs(
                F.approx_count_distinct("user_id", 0.01)
                - F.count(F.lit(1))
            )
            <= 0.05 * F.count(F.lit(1))
        ).alias("within_5pct_of_exact"),
    )


@query(
    "agg_distinct",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct()


@query(
    "agg_rollup",
    oracle="""
    SELECT r_name, n_name, COUNT(*) AS n, CAST(GROUPING(r_name) + 2 * GROUPING(n_name) AS INTEGER) AS gid
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical totals region → nation → grand total."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return joined.rollup("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n"),
        (F.grouping("r_name") + 2 * F.grouping("n_name")).cast("int").alias("gid"),
    )


@query(
    "agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           ROUND(SUM(o_totalprice), 4) AS total,
           CAST(GROUPING(o_orderstatus) + 2 * GROUPING(o_orderpriority) AS INTEGER) AS gid
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 4).alias("total"),
        (F.grouping("o_orderstatus") + 2 * F.grouping("o_orderpriority")).cast("int").alias("gid"),
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           CAST(GROUPING(l_returnflag) + 2 * GROUPING(l_linestatus) AS INTEGER) AS gid
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit grouping sets via the SQL path (Spark SQL supports
    GROUPING SETS natively; the DataFrame API does not expose it)."""
    table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "mrsas_gs_lineitem"
    )
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
               CAST(GROUPING(l_returnflag) + 2 * GROUPING(l_linestatus) AS INTEGER) AS gid
        FROM mrsas_gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@query(
    "agg_pivot",
    oracle="""
    SELECT user_id,
           ROUND(SUM(CASE WHEN event_type = 'view' THEN value ELSE 0 END), 4) AS view,
           ROUND(SUM(CASE WHEN event_type = 'click' THEN value ELSE 0 END), 4) AS click,
           ROUND(SUM(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END), 4) AS purchase,
           ROUND(SUM(CASE WHEN event_type = 'signup' THEN value ELSE 0 END), 4) AS signup,
           ROUND(SUM(CASE WHEN event_type = 'error' THEN value ELSE 0 END), 4) AS error
    FROM events
    GROUP BY user_id
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """event_type → columns. Uses ``pivot`` with explicit values (the
    scalable form: no extra pass to discover the pivot domain) and a
    0.0-filled sum so the result matches the CASE-WHEN oracle exactly.
    """
    e = table(spark, sf_dir, "events")
    pivoted = (
        e.groupBy("user_id")
        .pivot("event_type", ["view", "click", "purchase", "signup", "error"])
        .agg(F.sum("value"))
    )
    cols = [F.col("user_id")] + [
        F.round(F.coalesce(F.col(c), F.lit(0.0)), 4).alias(c)
        for c in ["view", "click", "purchase", "signup", "error"]
    ]
    return pivoted.select(*cols)


@query(
    "agg_filtered",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(CASE WHEN l_discount > 0.05 THEN l_extendedprice ELSE 0 END), 4)
               AS hi_disc_revenue,
           COUNT(CASE WHEN l_quantity >= 25 THEN 1 END) AS n_bulk,
           ROUND(AVG(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 4) AS avg_qty_f
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregates: sum/count/avg over CASE-filtered inputs."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(
            F.sum(
                F.when(F.col("l_discount") > 0.05, F.col("l_extendedprice")).otherwise(
                    0.0
                )
            ),
            4,
        ).alias("hi_disc_revenue"),
        F.count(F.when(F.col("l_quantity") >= 25, F.lit(1))).alias("n_bulk"),
        F.round(
            F.avg(F.when(F.col("l_linestatus") == "F", F.col("l_quantity"))), 4
        ).alias("avg_qty_f"),
    )


@query(
    "agg_collect",
    oracle="""
    SELECT o_orderstatus,
           array_to_string(list_sort(list(DISTINCT o_orderpriority)), '|')
               AS priorities
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group sorted distinct list (deterministic: collect order is
    non-deterministic in a distributed agg, so sort + distinct pins it).
    Projected as a '|'-joined string: scalar outputs keep the oracle
    hash format-independent of either engine's list representation."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.concat_ws(
            "|", F.sort_array(F.collect_set("o_orderpriority"))
        ).alias("priorities")
    )


@query(
    "agg_percentile",
    oracle="""
    SELECT o_orderstatus,
           ROUND(CAST(quantile_cont(o_totalprice, 0.5) AS DOUBLE), 4) AS median_price,
           ROUND(CAST(quantile_cont(o_totalprice, 0.9) AS DOUBLE), 4) AS p90_price
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated percentiles (Spark ``percentile`` and
    DuckDB ``quantile_cont`` share the interpolation rule)."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("median_price"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90_price"),
    )


@query(
    "agg_stddev_var",
    oracle="""
    SELECT event_type,
           ROUND(STDDEV_SAMP(value), 4) AS sd,
           ROUND(VAR_SAMP(value), 4) AS var,
           ROUND(STDDEV_POP(value), 4) AS sd_pop
    FROM events
    GROUP BY event_type
    """,
)
def agg_stddev_var(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.round(F.stddev_samp("value"), 4).alias("sd"),
        F.round(F.var_samp("value"), 4).alias("var"),
        F.round(F.stddev_pop("value"), 4).alias("sd_pop"),
    )


@query(
    "agg_corr",
    oracle="""
    SELECT l_returnflag,
           ROUND(CORR(l_quantity, l_extendedprice), 4) AS qty_price_corr,
           ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 4) AS qty_price_covar
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
            "qty_price_covar"
        ),
    )


@query(
    "agg_skew_salted",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           ROUND(SUM(l_quantity), 4) AS sum_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation — the manual skew-mitigation
    pattern for hot grouping keys (l_returnflag has only 3 values, the
    worst case: every row funnels to 3 reducers).

    Stage 1 groups on (key, salt) — 16-way fan-out spreads each hot key
    across reducers; stage 2 merges the partials per key. The result is
    identical to the direct groupBy (the oracle IS the direct form);
    sums here are integer-valued doubles, so re-association is exact.
    At 100 TB this is the fallback when AQE skew handling can't split a
    single hot key's hash partition.
    """
    li = table(spark, sf_dir, "lineitem")
    partial = (
        li.withColumn("salt", (F.col("l_orderkey") % 16).cast("int"))
        .groupBy("l_returnflag", "salt")
        .agg(
            F.count(F.lit(1)).alias("pn"),
            F.sum("l_quantity").alias("pq"),
        )
    )
    return partial.groupBy("l_returnflag").agg(
        F.sum("pn").alias("n"),
        F.round(F.sum("pq"), 4).alias("sum_qty"),
    )


@query(
    "agg_unpivot",
    oracle="""
    SELECT l_returnflag, measure, ROUND(val, 4) AS val
    FROM (
        SELECT l_returnflag, 'sum_qty' AS measure, SUM(l_quantity) AS val
        FROM lineitem GROUP BY l_returnflag
        UNION ALL
        SELECT l_returnflag, 'sum_disc', SUM(l_discount)
        FROM lineitem GROUP BY l_returnflag
        UNION ALL
        SELECT l_returnflag, 'sum_tax', SUM(l_tax)
        FROM lineitem GROUP BY l_returnflag
    ) t
    """,
)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide → long) via ``stack``: the inverse of agg_pivot,
    melting three aggregate columns into (measure, val) rows. The
    oracle mirrors with the portable UNION ALL formulation."""
    li = table(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("sum_qty"),
        F.sum("l_discount").alias("sum_disc"),
        F.sum("l_tax").alias("sum_tax"),
    )
    return wide.select(
        "l_returnflag",
        F.expr(
            "stack(3, 'sum_qty', sum_qty, 'sum_disc', sum_disc,"
            " 'sum_tax', sum_tax) AS (measure, raw_val)"
        ),
    ).select("l_returnflag", "measure", F.round("raw_val", 4).alias("val"))


@query(
    "agg_hll_sketch_union",
    oracle="""
    SELECT COUNT(DISTINCT user_id) AS exact_total_users,
           (ABS(approx_count_distinct(user_id) - COUNT(DISTINCT user_id))
              <= 0.05 * COUNT(DISTINCT user_id)) AS within_5pct_of_exact
    FROM events
    """,
)
def agg_hll_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketches (Datasketches): build one sketch per
    event_type, then union the sketches for the overall estimate —
    the re-aggregatable pattern that replaces raw COUNT(DISTINCT) in
    100 TB rollup hierarchies (sketch once, merge everywhere).

    SQL-checkable form: the merged-sketch estimate is compared to the
    exact distinct on the Spark side and reported as the boolean
    ``within_5pct_of_exact``; DuckDB computes the same boolean with
    its own HLL. Exact count + boolean hash-match across engines."""
    e = table(spark, sf_dir, "events")
    per_type = e.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    merged = per_type.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("long").alias(
            "approx_total_users"
        )
    )
    exact = e.agg(F.count_distinct("user_id").alias("exact_total_users"))
    return exact.crossJoin(F.broadcast(merged)).select(
        "exact_total_users",
        (
            F.abs(F.col("approx_total_users") - F.col("exact_total_users"))
            <= 0.05 * F.col("exact_total_users")
        ).alias("within_5pct_of_exact"),
    )


@query(
    "agg_approx_percentile",
    oracle="""
    SELECT l_returnflag,
           TRUE AS p50_within_1pct,
           TRUE AS p90_within_1pct,
           TRUE AS p99_within_1pct
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (Greenwald-Khanna sketch): the bounded-memory
    quantile path for 100 TB (exact percentile sorts each group).

    Output is SCALAR columns only (an array<double> column crashes the
    driver's canonicalizer — unhashable list). Sketch values are
    algorithm-specific, so each quantile is reported as a boolean
    "within 1% of the exact percentile_cont" computed entirely on the
    Spark side; the oracle's exact-vs-exact comparison is identically
    TRUE. agg_percentile remains the exact value-checked twin."""
    li = table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.expr(
            "approx_percentile(l_extendedprice, 0.5, 10000)"
        ).alias("ap50"),
        F.expr(
            "approx_percentile(l_extendedprice, 0.9, 10000)"
        ).alias("ap90"),
        F.expr(
            "approx_percentile(l_extendedprice, 0.99, 10000)"
        ).alias("ap99"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("ep50"),
        F.expr("percentile(l_extendedprice, 0.9)").alias("ep90"),
        F.expr("percentile(l_extendedprice, 0.99)").alias("ep99"),
    )
    within = lambda a, e: (  # noqa: E731
        F.abs(F.col(a) - F.col(e)) <= 0.01 * F.abs(F.col(e))
    )
    return agg.select(
        "l_returnflag",
        within("ap50", "ep50").alias("p50_within_1pct"),
        within("ap90", "ep90").alias("p90_within_1pct"),
        within("ap99", "ep99").alias("p99_within_1pct"),
    )


@query(
    "agg_approx_top_k",
    oracle="""
    SELECT event_type AS item, COUNT(*) AS est_count
    FROM events GROUP BY event_type
    ORDER BY est_count DESC, item LIMIT 3
    """,
)
def agg_approx_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based heavy hitters (``approx_top_k``, Spark 4): the
    bounded-memory frequent-items path — at 100 TB an exact top-k by
    count needs a full groupBy shuffle; the sketch mergess partial
    summaries in fixed space. With the fixture's 5 distinct values the
    sketch is exact, so the exact top-3 is a valid oracle (on
    high-cardinality data this key would get the within-tolerance
    boolean treatment like agg_approx_count_distinct)."""
    e = table(spark, sf_dir, "events")
    tk = e.selectExpr("approx_top_k(event_type, 3) AS tk")
    return tk.select(F.expr("inline(tk)")).select(
        F.col("item"), F.col("count").alias("est_count")
    )


@query(
    "agg_bitmap_distinct",
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via bucketed roaring-style bitmaps
    (Spark 3.5 ``bitmap_*`` aggregates): ids hash into 32k-wide
    buckets, each bucket folds to a fixed-width bitmap, and bucket
    bitmaps OR-merge — the re-aggregatable EXACT pattern that slots
    between plain COUNT(DISTINCT) (full expansion shuffle) and HLL
    (approximate). At 100 TB: bitmap state per (group, bucket) is
    bounded at 4 KB regardless of cardinality, merges are associative,
    and rollup hierarchies reuse the same bitmaps sketch-style but
    with exact answers — which is why the exact-distinct oracle checks
    it value-for-value."""
    e = table(spark, sf_dir, "events")
    per_bucket = (
        e.selectExpr(
            "event_type",
            "bitmap_bucket_number(user_id) AS bkt",
            "bitmap_bit_position(user_id) AS pos",
        )
        .groupBy("event_type", "bkt")
        .agg(F.expr("bitmap_construct_agg(pos)").alias("bm"))
    )
    return per_bucket.groupBy("event_type").agg(
        F.expr("SUM(bitmap_count(bm))").cast("long").alias("n_users")
    )


@query(
    "agg_string_concat_ordered",
    oracle="""
    SELECT n_nationkey, string_agg(s_name, ',' ORDER BY s_name) AS suppliers
    FROM nation JOIN supplier ON s_nationkey = n_nationkey
    GROUP BY n_nationkey
    """,
)
def agg_string_concat_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG/string_agg): supplier names
    per nation, comma-joined in name order — the reporting primitive
    engines disagree on most (ordering inside an aggregate). Spark has
    no ORDER BY inside collect_list, so the deterministic form is
    collect → array_sort → array_join, which is also the
    partition-order-proof form (collect_list order is otherwise
    nondeterministic under AQE). State is the group's name list —
    the same bounded-group argument as agg_collect."""
    n = table(spark, sf_dir, "nation")
    s = table(spark, sf_dir, "supplier")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_nationkey")
        .agg(
            F.array_join(
                F.array_sort(F.collect_list("s_name")), ","
            ).alias("suppliers")
        )
    )


@query(
    "agg_boolean_family",
    oracle="""
    SELECT o_orderpriority,
           COUNT(CASE WHEN o_totalprice > 200000 THEN 1 END) AS n_big,
           bool_and(o_totalprice > 0.0) AS all_positive,
           bool_or(o_orderstatus = 'P') AS any_pending
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_boolean_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregate family: count_if / bool_and (EVERY) /
    bool_or (ANY) — the data-quality assertion primitives (is every
    price positive? did any order go pending?). All three fold to
    1-bit partial state, so the shuffle carries one boolean per
    group-column regardless of input width — the cheapest aggregates
    in the engine."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count_if(F.col("o_totalprice") > 200000).alias("n_big"),
        F.bool_and(F.col("o_totalprice") > 0.0).alias("all_positive"),
        F.bool_or(F.col("o_orderstatus") == "P").alias("any_pending"),
    )


def deterministic_mode(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Deterministic MODE: counts → rank → keep rank 1, ties broken by
    the smallest value. Engines' native ``mode()`` breaks ties
    arbitrarily; this form is total-ordered so both engines agree. Two
    aggregations, both partial-combining; the rank window partitions by
    the group key (never global). State is one count per
    (group, value) — bounded by value cardinality. Returns columns
    (group_col, mode_value, mode_n). Tie-break determinism is pinned on
    crafted exact ties in tests/test_operators.py."""
    counts = df.groupBy(group_col, value_col).agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy(group_col).orderBy(F.desc("n"), F.asc(value_col))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            group_col,
            F.col(value_col).alias("mode_value"),
            F.col("n").alias("mode_n"),
        )
    )


@query(
    "agg_mode",
    oracle="""
    SELECT l_returnflag, l_linestatus AS mode_linestatus, n AS mode_n
    FROM (
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
               ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                  ORDER BY COUNT(*) DESC, l_linestatus) AS rn
        FROM lineitem GROUP BY l_returnflag, l_linestatus
    ) WHERE rn = 1
    """,
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most frequent l_linestatus per return flag via
    ``deterministic_mode`` (see the helper for the plan rationale)."""
    li = table(spark, sf_dir, "lineitem")
    return deterministic_mode(li, "l_returnflag", "l_linestatus").select(
        "l_returnflag",
        F.col("mode_value").alias("mode_linestatus"),
        "mode_n",
    )


@query(
    "agg_latest_by_key",
    oracle="""
    SELECT o_orderpriority,
           FLOOR(arg_max(o_totalprice, o_orderkey) * 10000 + 0.5) / 10000
               AS latest_price,
           arg_max(o_custkey, o_orderkey) AS latest_custkey,
           FLOOR(arg_min(o_totalprice, o_orderkey) * 10000 + 0.5) / 10000
               AS first_price,
           MAX(o_orderkey) AS latest_key,
           COUNT(*) AS n
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_latest_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by (SQL arg_max/arg_min): the attributes of the
    newest- and oldest-keyed order per priority — last-value-per-key
    compaction as a single aggregate instead of a window + rn = 1
    filter (win_row_number_topk's shape). The ordering column is
    o_orderkey, UNIQUE by fixture contract, so the argmax row is a
    total-order pick — max_by over a tied ordering is unspecified in
    both engines and would be a latent cross-engine divergence.
    Aggregate state is one (key, value) pair per group — map-side
    combinable, no sort, no window buffer."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        round4(F.max_by("o_totalprice", "o_orderkey")).alias("latest_price"),
        F.max_by("o_custkey", "o_orderkey").alias("latest_custkey"),
        round4(F.min_by("o_totalprice", "o_orderkey")).alias("first_price"),
        F.max("o_orderkey").alias("latest_key"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "agg_percentile_disc",
    oracle="""
    WITH r AS (
        SELECT o_orderpriority AS prio, o_totalprice AS v,
               ROW_NUMBER() OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY o_totalprice, o_orderkey) AS rn,
               COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
        FROM orders
    )
    SELECT prio AS o_orderpriority,
           FLOOR(MAX(CASE WHEN rn = (n + 1) // 2 THEN v END)
                 * 10000 + 0.5) / 10000 AS p50_disc,
           FLOOR(MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN v END)
                 * 10000 + 0.5) / 10000 AS p90_disc,
           ANY_VALUE(n) AS n
    FROM r GROUP BY prio
    """,
)
def agg_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISCRETE percentiles (p50/p90): the smallest data value whose
    cumulative rank reaches p·n — an actual row's value, never an
    interpolation (agg_percentile is the continuous twin). Both sides
    compute the index as INTEGER arithmetic — ceil(p·n) written as
    (n+1)//2 and (9n+9)//10 — because ceil(0.9 * n) in doubles can
    land on either side of an integer depending on how the engine
    rounds 0.9·n, a one-rank cross-engine divergence. The picked value
    is permutation-invariant under ties (equal values fill adjacent
    ranks), and one rank/count window + one rollup on the same key is
    the whole plan. At 100 TB the exact sort swaps for
    approx_percentile the same way quality_outlier_iqr documents."""
    o = table(spark, sf_dir, "orders")
    wr = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    wn = Window.partitionBy("o_orderpriority")
    r = o.select(
        F.col("o_orderpriority").alias("prio"),
        F.col("o_totalprice").alias("v"),
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    p50_at = F.expr("(n + 1) div 2")
    p90_at = F.expr("(9 * n + 9) div 10")
    return r.groupBy(F.col("prio").alias("o_orderpriority")).agg(
        round4(F.max(F.when(F.col("rn") == p50_at, F.col("v")))).alias(
            "p50_disc"
        ),
        round4(F.max(F.when(F.col("rn") == p90_at, F.col("v")))).alias(
            "p90_disc"
        ),
        F.any_value("n").alias("n"),
    )


@query(
    "agg_share_of_parent",
    oracle="""
    WITH nat AS (
        SELECT r_name AS region, n_name AS nation,
               SUM(o_totalprice) AS rev
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
    ),
    reg AS (
        SELECT region, nation, rev,
               SUM(rev) OVER (PARTITION BY region) AS region_rev
        FROM nat
    ),
    tot AS (SELECT SUM(rev) AS total FROM nat)
    SELECT region, nation,
           FLOOR(rev * 10000 + 0.5) / 10000 AS revenue,
           FLOOR((rev / region_rev) * 10000 + 0.5) / 10000
               AS share_in_region,
           FLOOR((region_rev / total) * 10000 + 0.5) / 10000
               AS region_share_of_total
    FROM reg CROSS JOIN tot
    """,
)
def agg_share_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical share-of-parent: each nation's revenue as a share
    of ITS REGION, and each region's share of the grand total — the
    drill-down ratio every BI hierarchy renders, which a flat
    GROUP BY ROLLUP (agg_rollup) gives as absolute subtotals but not
    as normalized shares. Shape: ONE fact aggregation to the
    O(nations) leaf rollup; the parent totals come from a window
    PARTITIONED BY the parent key over that tiny rollup (25 rows —
    never a second fact scan, never a global window) and the grand
    total from a 1-row broadcast. Dims broadcast into the fact join;
    the fact shuffles once on the leaf grouping."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    nat = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region"), F.col("n_name").alias("nation")
        )
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    wreg = Window.partitionBy("region")
    reg = nat.withColumn("region_rev", F.sum("rev").over(wreg))
    tot = nat.agg(F.sum("rev").alias("total"))
    return reg.crossJoin(F.broadcast(tot)).select(
        "region",
        "nation",
        round4(F.col("rev")).alias("revenue"),
        round4(F.col("rev") / F.col("region_rev")).alias("share_in_region"),
        round4(F.col("region_rev") / F.col("total")).alias(
            "region_share_of_total"
        ),
    )
