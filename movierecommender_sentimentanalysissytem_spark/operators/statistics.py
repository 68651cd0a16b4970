"""Distribution-shape and outlier analytics: robust statistics
(median/MAD), z-score anomaly flagging, rolling distinct cardinality,
Pareto/skyline extraction, and triangle counting — the second-tier
statistical operators a curation pipeline layers over the profiling
primitives (profile_table, profile_numeric_histogram).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from movierecommender_sentimentanalysissytem_spark.functions.rounding import round4
from movierecommender_sentimentanalysissytem_spark.registry import query
from movierecommender_sentimentanalysissytem_spark.sources.tables import table


@query(
    "stats_median_mad",
    oracle="""
    SELECT event_type,
           FLOOR(median(value) * 10000 + 0.5) / 10000 AS med,
           FLOOR(mad(value) * 10000 + 0.5) / 10000 AS mad
    FROM events GROUP BY event_type
    """,
)
def stats_median_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust center/spread per group: median and MAD (median absolute
    deviation) — the outlier-resistant twins of mean/stddev
    (agg_stddev_var). Spark has no mad(), so it's composed from its
    definition: the RAW group median joins back (broadcast — one row
    per group) and a second exact median runs over the absolute
    deviations. Two shuffles on the same group key; both engines
    interpolate even-count medians identically, and rounding happens
    only on the final projections so the deviation pass sees full
    precision."""
    e = table(spark, sf_dir, "events")
    med = e.groupBy(F.col("event_type").alias("mt")).agg(
        F.median("value").alias("med_raw")
    )
    # eqNullSafe: the oracle's GROUP BY keeps a NULL event_type group,
    # so the median join-back must not drop it (NULL == NULL is false
    # under a plain equi-join — a latent one-row hash mismatch on any
    # fixture generation with NULL event types).
    return (
        e.join(F.broadcast(med), e.event_type.eqNullSafe(F.col("mt")))
        .groupBy("event_type")
        .agg(
            round4(F.first("med_raw")).alias("med"),
            round4(
                F.median(F.abs(F.col("value") - F.col("med_raw")))
            ).alias("mad"),
        )
    )


@query(
    "anomaly_zscore",
    oracle="""
    WITH stats AS (
        SELECT event_type, AVG(value) AS mu, stddev_samp(value) AS sigma
        FROM events GROUP BY event_type
    )
    SELECT event_id, e.event_type,
           FLOOR(((value - mu) / sigma) * 10000 + 0.5) / 10000 AS z
    FROM events e JOIN stats USING (event_type)
    WHERE abs(FLOOR(((value - mu) / sigma) * 10000 + 0.5) / 10000) > 2.5
    """,
)
def anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score outlier flagging: per-group mean/stddev as a tiny
    aggregate broadcast back into a row-local filter — NOT a window
    over the group partition (a handful of giant partitions would
    serialize at 100 TB; the broadcast join keeps the scan
    embarrassingly parallel). The z-score is rounded to 4 dp on both
    sides before the |z| > 2.5 cut so summation-order noise in the
    group moments can't flip a boundary row."""
    e = table(spark, sf_dir, "events")
    stats = e.groupBy(F.col("event_type").alias("st")).agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sigma")
    )
    z = round4((F.col("value") - F.col("mu")) / F.col("sigma"))
    return (
        e.join(F.broadcast(stats), e.event_type == F.col("st"))
        .withColumn("z", z)
        .filter(F.abs(F.col("z")) > 2.5)
        .select("event_id", "event_type", "z")
    )


@query(
    "win_rolling_distinct",
    oracle="""
    SELECT event_id, user_id,
           COUNT(DISTINCT event_type) OVER (
               PARTITION BY user_id
               ORDER BY date_trunc('second', ts), event_id
               ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS n_kinds
    FROM events WHERE user_id <= 10
    """,
)
def win_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling distinct cardinality: distinct event kinds in each
    user's trailing 10 events. Spark windows reject COUNT(DISTINCT)
    outright — the standard rewrite is size(collect_set() OVER frame),
    which keeps the dedup inside the window operator (set state is
    bounded by the frame length). The frame's ORDER BY truncates ts to
    the second (FIXTURES.md rule: never order cross-engine on raw ts —
    DuckDB sees the file's ns values, Spark the µs rebuild, so a
    sub-µs component would order the engines differently) and carries
    event_id as the tiebreaker: frame membership must be a total order
    or the two engines could legally disagree on ties.

    The user_id <= 10 bound is inside the events user_id domain at
    EVERY fixture SF (max is 14 at sf0.001), so the filter always
    selects a non-empty proper subset — pinned in
    tests/test_invariants.py so a fixture regeneration that shrinks
    the domain fails loudly instead of silently blanking the query."""
    e = table(spark, sf_dir, "events").filter(F.col("user_id") <= 10)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.date_trunc("second", F.col("ts")), F.col("event_id"))
        .rowsBetween(-9, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.size(F.collect_set("event_type").over(w)).alias("n_kinds"),
    )


@query(
    "skyline_pareto",
    oracle="""
    WITH pts AS (
        SELECT DISTINCT FLOOR(p_retailprice * 10000 + 0.5) / 10000 AS price,
               p_size AS size
        FROM part
    )
    SELECT price, size FROM pts a
    WHERE NOT EXISTS (
        SELECT 1 FROM pts b
        WHERE b.price >= a.price AND b.size <= a.size
          AND (b.price > a.price OR b.size < a.size))
    """,
)
def skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier): parts not dominated on
    (maximize price, minimize size). The oracle is the quadratic
    NOT EXISTS; the Spark plan is the linear two-level reduction that
    survives 100 TB — skyline(A ∪ B) = skyline(skyline(A) ∪
    skyline(B)), so each hash bucket computes a LOCAL skyline with a
    running-min window (sorted by price DESC, size ASC, a point
    survives iff every earlier point has larger size), then the
    bounded union of local skylines (≤ |distinct sizes| rows per
    bucket) repeats the pass globally. No all-pairs join anywhere."""
    pts = (
        table(spark, sf_dir, "part")
        .select(
            round4(F.col("p_retailprice")).alias("price"),
            F.col("p_size").alias("size"),
        )
        .distinct()
        .withColumn("bkt", F.pmod(F.hash("price", "size"), F.lit(8)))
    )

    def survivors(df: DataFrame, part_cols: list[str]) -> DataFrame:
        w = (
            Window.partitionBy(*part_cols)
            .orderBy(F.desc("price"), F.asc("size"))
            .rowsBetween(Window.unboundedPreceding, -1)
            if part_cols
            else Window.orderBy(F.desc("price"), F.asc("size")).rowsBetween(
                Window.unboundedPreceding, -1
            )
        )
        m = F.min("size").over(w)
        return df.withColumn("m", m).filter(
            F.col("m").isNull() | (F.col("m") > F.col("size"))
        ).drop("m")

    local = survivors(pts, ["bkt"]).drop("bkt")
    return survivors(local, [])


def _supplier_cooccurrence_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected distinct edge set (a < b) of the supplier
    co-occurrence graph: two suppliers share an edge iff they appear on
    the same order. One equi-self-join on the order key — quadratic
    only within an order's supplier set, which is bounded by order
    size, not graph size."""
    lo = (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    b = lo.select(
        F.col("l_orderkey").alias("k"), F.col("l_suppkey").alias("s2")
    )
    return (
        lo.join(b, (lo.l_orderkey == b.k) & (lo.l_suppkey < b.s2))
        .select(F.col("l_suppkey").alias("a"), F.col("s2").alias("b"))
        .distinct()
    )


@query(
    "graph_triangle_count",
    oracle="""
    WITH lo AS (
        SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
    ),
    edges AS (
        SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v
        FROM lo a JOIN lo b ON a.l_orderkey = b.l_orderkey
        WHERE a.l_suppkey < b.l_suppkey
    )
    SELECT COUNT(*) AS n_triangles
    FROM edges e1
    JOIN edges e2 ON e1.v = e2.u
    JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting on the supplier co-occurrence graph (edge =
    two suppliers sharing an order). The oracle orients edges by id
    (u < v); the Spark plan uses DEGREE orientation — each edge points
    from its lower-degree endpoint (ties by id), so every triangle has
    exactly one oriented path and the per-vertex OUT-degree is
    O(√m)-bounded (the classic orientation guarantee) regardless of
    hubs.

    Counting runs as adjacency-set intersection, not a wedge
    enumeration: per oriented edge (u, v) the count contribution is
    |N⁺(u) ∩ N⁺(v)| via ``array_intersect`` over sorted out-neighbor
    arrays — shuffle volume O(m) rows (edges + two adjacency joins,
    arrays ≤ O(√m) each), with the Σ out-deg² work happening INSIDE
    whole-stage codegen instead of materializing as shuffled wedge
    rows. On this fixture's densest regime (sf0.1: 1,000 suppliers,
    91% of all possible edges present, 137M wedges) the previous
    wedge-join + left-semi plan shuffled those 137M rows and ran
    ~20 s; the intersect form computes the identical count in ~4 s.
    Same asymptotic work, an order less shuffle — exactly the trade
    that matters at 100 TB."""
    from movierecommender_sentimentanalysissytem_spark.plans.caching import (
        scoped_persist,
    )

    # Shared-lineage rule (ROUND7_NOTES.md): und feeds the degree
    # aggregate (twice, via the a/b union) and the orientation join;
    # oe feeds both wedge sides and the closing-edge probe. Without
    # the persists Catalyst re-derives the order-key self-join 3x and
    # the oriented edge build 3x on top of it.
    und = scoped_persist(_supplier_cooccurrence_edges(spark, sf_dir))
    # degree of each vertex over the undirected edge set — persisted
    # (r15): deg feeds BOTH broadcast sides (da, db), and the two
    # explicit BroadcastExchanges each re-ran the union+groupBy over
    # the und cache (stage profile: twin ~14-20 s task-time stages
    # emitting identical 61.7k partial rows). One row per vertex —
    # tiny cache, one aggregation pass.
    deg = scoped_persist(
        und.select(F.col("a").alias("x"))
        .unionAll(und.select(F.col("b").alias("x")))
        .groupBy("x")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    da = deg.select(F.col("x").alias("a"), F.col("d").alias("deg_a"))
    db = deg.select(F.col("x").alias("b"), F.col("d").alias("deg_b"))
    lower_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    oe = scoped_persist(
        und.join(F.broadcast(da), "a")
        .join(F.broadcast(db), "b")
        .select(
            F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        )
    )
    # adj feeds BOTH sides of the counting join; without the persist
    # Catalyst re-derives the collect_list aggregation (a full shuffle
    # of oe into sorted arrays) once per side. Measured at sf0.1:
    # 12-23 s warm → ~4 s with the persist. The adjacency sides stay
    # shuffled joins (no broadcast hint): adj is O(m) and would OOM a
    # driver at graph scale; AQE already converts the post-shuffle
    # sides to broadcast at runtime when they measure small.
    adj = scoped_persist(
        oe.groupBy("u").agg(F.sort_array(F.collect_list("v")).alias("nbrs"))
    )
    au = adj.select(F.col("u").alias("ju"), F.col("nbrs").alias("nu"))
    av = adj.select(F.col("u").alias("jv"), F.col("nbrs").alias("nv"))
    # Orientation is a total order, so triangle {a<b<c} is counted
    # exactly once: at edge (a, b), as c ∈ N⁺(a) ∩ N⁺(b). Edges whose
    # head has no out-neighbors contribute 0 and may drop from the
    # inner join; coalesce keeps the empty-graph grand-total row 0.
    return (
        oe.join(au, oe.u == au.ju)
        .join(av, oe.v == av.jv)
        .select(F.size(F.array_intersect("nu", "nv")).alias("t"))
        .agg(
            F.coalesce(F.sum("t"), F.lit(0))
            .cast("bigint")
            .alias("n_triangles")
        )
    )


@query(
    "graph_degree_stats",
    oracle="""
    WITH lo AS (
        SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
    ),
    wedges AS (
        SELECT a.l_suppkey AS u, b.l_suppkey AS v,
               COUNT(*) AS w
        FROM lo a JOIN lo b ON a.l_orderkey = b.l_orderkey
        WHERE a.l_suppkey < b.l_suppkey
        GROUP BY u, v
    )
    SELECT x AS supplier, COUNT(*) AS degree,
           CAST(SUM(w) AS BIGINT) AS strength
    FROM (
        SELECT u AS x, w FROM wedges UNION ALL SELECT v, w FROM wedges
    ) GROUP BY x
    """,
)
def graph_degree_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vertex degree and strength (weighted degree = total
    co-occurrence count) of the supplier co-occurrence graph — the
    diagnostic run before any graph algorithm: it decides whether
    triangle counting needs degree orientation, whether joins need
    skew salting, and how fast components will converge. The weighted
    edge list aggregates the order-key self-join once (each pair with
    its co-occurrence multiplicity); vertex stats are one groupBy over
    the symmetrized list. Both aggregations map-side combine; the
    unweighted distinct-edge twin of this build is shared with
    graph_triangle_count via _supplier_cooccurrence_edges."""
    lo = (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    b = lo.select(
        F.col("l_orderkey").alias("k"), F.col("l_suppkey").alias("s2")
    )
    wedges = (
        lo.join(b, (lo.l_orderkey == b.k) & (lo.l_suppkey < b.s2))
        .groupBy(F.col("l_suppkey").alias("u"), F.col("s2").alias("v"))
        .agg(F.count(F.lit(1)).alias("w"))
    )
    sym = wedges.select(F.col("u").alias("x"), "w").unionAll(
        wedges.select(F.col("v").alias("x"), "w")
    )
    return sym.groupBy(F.col("x").alias("supplier")).agg(
        F.count(F.lit(1)).alias("degree"),
        F.sum("w").alias("strength"),
    )


@query(
    "quality_fk_orphans",
    oracle="""
    SELECT 'orders_without_customer' AS chk, COUNT(*) AS n_orphans
    FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    UNION ALL
    SELECT 'lineitem_without_order', COUNT(*)
    FROM lineitem l
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    UNION ALL
    SELECT 'lineitem_without_part', COUNT(*)
    FROM lineitem l
    WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
    UNION ALL
    SELECT 'events_without_known_user', COUNT(*)
    FROM events e
    WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id)
    """,
)
def quality_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: orphan counts for every declared
    foreign key, as one long quality report — the pre-publish gate a
    warehouse load runs after ingest. Each check is a LEFT ANTI join
    (NOT EXISTS) counting unmatched fact rows; dimension sides
    broadcast, the fact-fact check shuffles on its key once. At
    100 TB each check stays a single pass with a fixed-width
    1-row output — the report unions four scalars, not data."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    c = table(spark, sf_dir, "customer")
    p = table(spark, sf_dir, "part")
    e = table(spark, sf_dir, "events")

    def orphans(fact: DataFrame, dim: DataFrame, cond, label: str) -> DataFrame:
        return (
            fact.join(dim, cond, "left_anti")
            .agg(F.count(F.lit(1)).alias("n_orphans"))
            .select(F.lit(label).alias("chk"), "n_orphans")
        )

    return (
        orphans(o, c, o.o_custkey == c.c_custkey, "orders_without_customer")
        .unionByName(
            orphans(
                li, o, li.l_orderkey == o.o_orderkey, "lineitem_without_order"
            )
        )
        .unionByName(
            orphans(li, p, li.l_partkey == p.p_partkey, "lineitem_without_part")
        )
        .unionByName(
            orphans(
                e, c, e.user_id == c.c_custkey, "events_without_known_user"
            )
        )
    )


@query(
    "profile_equidepth_histogram",
    oracle="""
    WITH b AS (
        SELECT l_returnflag, l_extendedprice,
               ntile(8) OVER (
                   PARTITION BY l_returnflag
                   ORDER BY l_extendedprice, l_orderkey, l_linenumber,
                            l_partkey)
                   AS bucket
        FROM lineitem
    )
    SELECT l_returnflag, bucket, COUNT(*) AS n,
           FLOOR(MIN(l_extendedprice) * 10000 + 0.5) / 10000 AS lo,
           FLOOR(MAX(l_extendedprice) * 10000 + 0.5) / 10000 AS hi
    FROM b GROUP BY l_returnflag, bucket
    """,
)
def profile_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram (8 equal-count buckets per group) — the
    quantile-boundary profile range-partitioners and optimizers feed
    on; the equi-width twin is profile_numeric_histogram. ntile's
    ORDER BY carries (orderkey, linenumber) tiebreakers: equal prices
    on a bucket boundary would otherwise be assigned engine-
    dependently. Partitioned by group, the windows parallelize across
    groups; a single-group global profile at 100 TB would instead use
    approx_percentile boundaries + one bucketing pass (the
    agg_approx_percentile path) to avoid one giant sorted partition."""
    li = table(spark, sf_dir, "lineitem")
    # (l_orderkey, l_linenumber) alone is not unique in this fixture;
    # l_partkey completes the key so ntile boundary assignment can
    # never tie engine-dependently.
    w = Window.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber", "l_partkey"
    )
    return (
        li.withColumn("bucket", F.ntile(8).over(w))
        .groupBy("l_returnflag", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            round4(F.min("l_extendedprice")).alias("lo"),
            round4(F.max("l_extendedprice")).alias("hi"),
        )
    )


@query(
    "win_rolling_median",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_partkey,
           CAST(MEDIAN(l_quantity) OVER (
               PARTITION BY l_suppkey
               ORDER BY l_orderkey, l_linenumber, l_partkey
               ROWS BETWEEN 8 PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS med_qty
    FROM lineitem WHERE l_suppkey <= 20
    """,
)
def win_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling median over a trailing 9-row frame — a window aggregate
    Spark has no native function for (percentile functions reject
    moving frames). The portable form keeps the frame's values as a
    sorted bounded array and selects the middle element(s):
    ``collect_list OVER frame → array_sort → midpoint`` — state is the
    9-row frame, not the partition, so the window operator's memory is
    O(frame) per row and the plan is the ordinary one-shuffle
    partitioned window. Median of an odd/even frame follows the
    standard (lower+upper)/2 interpolation; quantities are integers so
    the half-sums are exact doubles cross-engine.

    DuckDB's native windowed MEDIAN is the oracle — proving the
    array-selection rewrite semantically identical."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") <= 20)
    # (l_orderkey, l_linenumber) is NOT unique in this fixture (712
    # duplicate pairs at sf0.01); l_partkey completes the unique order
    # key — a ROWS frame over a tied ordering is nondeterministic.
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_orderkey", "l_linenumber", "l_partkey")
        .rowsBetween(-8, Window.currentRow)
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        rolling_median_col("l_quantity", w).alias("med_qty"),
    )


def rolling_median_col(value_col: str, w) -> "F.Column":
    """Median over an arbitrary window frame as a Column:
    ``collect_list OVER frame → array_sort → midpoint`` with standard
    (lower+upper)/2 interpolation for even frames. Odd/even frame-edge
    behavior is pinned on literal frames in tests/test_operators.py."""
    vals = F.array_sort(F.collect_list(value_col).over(w))
    n = F.size(vals)
    lower = F.element_at(vals, ((n + 1) / 2).cast("int"))
    upper = F.element_at(vals, (n / 2 + 1).cast("int"))
    return ((lower + upper) / 2.0).cast("double")


@query(
    "quality_null_profile",
    oracle="""
    SELECT 'events.props' AS col_name, COUNT(*) AS n_rows,
           COUNT(*) - COUNT(props) AS n_null,
           CAST(SUM(CASE WHEN props = '' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_empty,
           FLOOR((1.0 - CAST(COUNT(props) AS DOUBLE) / COUNT(*))
                 * 10000 + 0.5) / 10000 AS null_ratio
    FROM events
    UNION ALL
    SELECT 'documents.text', COUNT(*), COUNT(*) - COUNT(text),
           CAST(SUM(CASE WHEN text = '' THEN 1 ELSE 0 END) AS BIGINT),
           FLOOR((1.0 - CAST(COUNT(text) AS DOUBLE) / COUNT(*))
                 * 10000 + 0.5) / 10000
    FROM documents
    UNION ALL
    SELECT 'orders.o_orderstatus', COUNT(*), COUNT(*) - COUNT(o_orderstatus),
           CAST(SUM(CASE WHEN o_orderstatus = '' THEN 1 ELSE 0 END)
                AS BIGINT),
           FLOOR((1.0 - CAST(COUNT(o_orderstatus) AS DOUBLE) / COUNT(*))
                 * 10000 + 0.5) / 10000
    FROM orders
    """,
)
def quality_null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Completeness audit: per profiled column, row count, NULL count,
    empty-string count, and null ratio — the first report a data
    contract check emits (quality_fk_orphans covers referential
    integrity; this covers presence). Each column is one COUNT-family
    aggregate over its own table — map-side combinable single scans
    unioned into a fixed-width report; on the current fixtures every
    count is zero, which is exactly what the audit asserts (the
    mechanics stay pinned if a regeneration ever ships NULLs)."""

    def profile(df: DataFrame, tbl: str, col: str) -> DataFrame:
        return df.agg(
            F.lit(f"{tbl}.{col}").alias("col_name"),
            F.count(F.lit(1)).alias("n_rows"),
            (F.count(F.lit(1)) - F.count(F.col(col))).alias("n_null"),
            F.sum(F.when(F.col(col) == "", 1).otherwise(0)).alias("n_empty"),
            round4(
                1.0 - F.count(F.col(col)).cast("double") / F.count(F.lit(1))
            ).alias("null_ratio"),
        ).select("col_name", "n_rows", "n_null", "n_empty", "null_ratio")

    e = table(spark, sf_dir, "events")
    d = table(spark, sf_dir, "documents")
    o = table(spark, sf_dir, "orders")
    return (
        profile(e, "events", "props")
        .unionByName(profile(d, "documents", "text"))
        .unionByName(profile(o, "orders", "o_orderstatus"))
    )


@query(
    "quality_table_checksum",
    oracle="""
    WITH o AS (
        SELECT CAST('0x' || substr(md5(concat('ck:',
                   CAST(o_orderkey AS VARCHAR), '|',
                   CAST(o_custkey AS VARCHAR), '|', o_orderstatus, '|',
                   CAST(CAST(FLOOR(o_totalprice * 10000 + 0.5) AS BIGINT)
                        AS VARCHAR), '|', o_orderpriority)), 1, 15)
                   AS BIGINT) % 1000000007 AS h
        FROM orders
    ),
    c AS (
        SELECT CAST('0x' || substr(md5(concat('ck:',
                   CAST(c_custkey AS VARCHAR), '|', c_name, '|',
                   CAST(c_nationkey AS VARCHAR), '|',
                   CAST(CAST(FLOOR(c_acctbal * 10000 + 0.5) AS BIGINT)
                        AS VARCHAR), '|', c_mktsegment)), 1, 15)
                   AS BIGINT) % 1000000007 AS h
        FROM customer
    )
    SELECT 'orders' AS tbl, COUNT(*) AS n_rows,
           CAST(SUM(h) % 1000000007 AS BIGINT) AS checksum
    FROM o
    UNION ALL
    SELECT 'customer', COUNT(*), CAST(SUM(h) % 1000000007 AS BIGINT)
    FROM c
    """,
)
def quality_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent table fingerprints: per table, the row count
    and the modular sum of a 60-bit content hash over each row's
    canonical string — the reconciliation primitive a migration (like
    this whole engine) runs on both sides to prove a copy byte-exact
    without moving data. Canonicalization rules make it cross-engine:
    doubles enter as FLOOR(x·10⁴+0.5) integers (raw CAST(double AS
    STRING) formats differently per engine), every field is explicitly
    stringified, and '|' delimits (no concat_ws — it silently skips
    NULLs, the scan_text_lines lesson). Each per-row term is reduced
    mod 1e9+7 so the SUM stays inside BIGINT to ~9e9 rows; beyond
    that, the same mod-sum runs as a two-level tree. One
    map-side-combinable aggregate per table — a full-scan, zero-
    shuffle audit at any scale."""
    from movierecommender_sentimentanalysissytem_spark.functions.dedup import (
        _spark_h,
    )

    def checksum(df: DataFrame, tbl: str, canon: str) -> DataFrame:
        h = F.expr(_spark_h("ck", canon)) % 1000000007
        return df.select(h.alias("h")).agg(
            F.lit(tbl).alias("tbl"),
            F.count(F.lit(1)).alias("n_rows"),
            (F.sum("h") % 1000000007).cast("bigint").alias("checksum"),
        ).select("tbl", "n_rows", "checksum")

    price_int = "CAST(CAST(FLOOR(o_totalprice * 10000 + 0.5) AS BIGINT) AS STRING)"
    bal_int = "CAST(CAST(FLOOR(c_acctbal * 10000 + 0.5) AS BIGINT) AS STRING)"
    o_canon = (
        "concat(CAST(o_orderkey AS STRING), '|', CAST(o_custkey AS STRING),"
        f" '|', o_orderstatus, '|', {price_int}, '|', o_orderpriority)"
    )
    c_canon = (
        "concat(CAST(c_custkey AS STRING), '|', c_name, '|',"
        f" CAST(c_nationkey AS STRING), '|', {bal_int}, '|', c_mktsegment)"
    )
    return checksum(table(spark, sf_dir, "orders"), "orders", o_canon).unionByName(
        checksum(table(spark, sf_dir, "customer"), "customer", c_canon)
    )


@query(
    "quality_expectation_suite",
    oracle="""
    WITH agg AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(CASE WHEN l_quantity <= 0 OR l_quantity IS NULL
                        THEN 1 ELSE 0 END) AS BIGINT) AS v_qty,
               CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 1
                             OR l_discount IS NULL
                        THEN 1 ELSE 0 END) AS BIGINT) AS v_disc,
               CAST(SUM(CASE WHEN l_extendedprice <= 0
                             OR l_extendedprice IS NULL
                        THEN 1 ELSE 0 END) AS BIGINT) AS v_price,
               CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS v_ship,
               CAST(SUM(CASE WHEN l_tax < 0 OR l_tax IS NULL
                        THEN 1 ELSE 0 END) AS BIGINT) AS v_tax
        FROM lineitem
    )
    SELECT r.rule, agg.n AS n_checked, r.v AS n_violations,
           r.v = 0 AS passed
    FROM agg, LATERAL (
        VALUES ('quantity_positive', v_qty),
               ('discount_in_range', v_disc),
               ('price_positive', v_price),
               ('shipdate_not_null', v_ship),
               ('tax_nonnegative', v_tax)
    ) AS r(rule, v)
    """,
)
def quality_expectation_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality expectation suite: one report row per
    rule (violation count + pass flag) — the contract gate a pipeline
    evaluates before publishing a table, expressed as a single
    aggregate scan. All five rules fold into ONE partial-aggregable
    pass over the fact table (conditional-sum per rule), and the
    per-rule rows come from unpivoting the 1-row aggregate — so the
    suite costs one table scan regardless of rule count, instead of
    the rule-per-query re-scan a naive checker runs. NULL is a
    violation for every rule (an absent value can't satisfy a
    constraint), stated identically in both engines."""
    li = table(spark, sf_dir, "lineitem")

    def viol(cond: F.Column) -> F.Column:
        return F.sum(F.when(cond, 1).otherwise(0)).cast("bigint")

    agg = li.agg(
        F.count(F.lit(1)).alias("n"),
        viol(
            (F.col("l_quantity") <= 0) | F.col("l_quantity").isNull()
        ).alias("v_qty"),
        viol(
            (F.col("l_discount") < 0)
            | (F.col("l_discount") > 1)
            | F.col("l_discount").isNull()
        ).alias("v_disc"),
        viol(
            (F.col("l_extendedprice") <= 0)
            | F.col("l_extendedprice").isNull()
        ).alias("v_price"),
        viol(F.col("l_shipdate").isNull()).alias("v_ship"),
        viol((F.col("l_tax") < 0) | F.col("l_tax").isNull()).alias("v_tax"),
    )
    rules = agg.select(
        "n",
        F.explode(
            F.array(
                F.struct(
                    F.lit("quantity_positive").alias("rule"),
                    F.col("v_qty").alias("v"),
                ),
                F.struct(
                    F.lit("discount_in_range").alias("rule"),
                    F.col("v_disc").alias("v"),
                ),
                F.struct(
                    F.lit("price_positive").alias("rule"),
                    F.col("v_price").alias("v"),
                ),
                F.struct(
                    F.lit("shipdate_not_null").alias("rule"),
                    F.col("v_ship").alias("v"),
                ),
                F.struct(
                    F.lit("tax_nonnegative").alias("rule"),
                    F.col("v_tax").alias("v"),
                ),
            )
        ).alias("r"),
    )
    return rules.select(
        F.col("r.rule").alias("rule"),
        F.col("n").alias("n_checked"),
        F.col("r.v").alias("n_violations"),
        (F.col("r.v") == 0).alias("passed"),
    )


@query(
    "stats_subsample_ci",
    oracle="""
    WITH folds AS (
        SELECT CAST('0x' || substr(md5('ci:' || o_orderkey), 1, 15)
                    AS BIGINT) % 10 AS fold,
               o_totalprice AS v
        FROM orders
    ),
    per_fold AS (
        SELECT fold, AVG(v) AS m FROM folds GROUP BY fold
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_folds,
           FLOOR(AVG(m) * 10000 + 0.5) / 10000 AS mean_of_means,
           FLOOR(STDDEV_SAMP(m) * 10000 + 0.5) / 10000 AS sd_of_means,
           FLOOR((AVG(m) - 1.96 * STDDEV_SAMP(m) / sqrt(COUNT(*)))
                 * 10000 + 0.5) / 10000 AS ci_low,
           FLOOR((AVG(m) + 1.96 * STDDEV_SAMP(m) / sqrt(COUNT(*)))
                 * 10000 + 0.5) / 10000 AS ci_high
    FROM per_fold
    """,
)
def stats_subsample_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subsampling confidence interval for the mean order value: split
    the population into 10 DETERMINISTIC hash folds (the md5 family —
    reproducible across engines/reruns, unlike RNG bootstrap
    resampling, which no two engines can replay identically), take
    each fold's mean, and report mean ± 1.96·sd/√k over the fold
    means. This is the embarrassingly-parallel uncertainty estimate:
    one groupBy over a hash bucket (map-side combinable) plus a
    10-row final aggregate — where a classic bootstrap would re-scan
    the data B times. Fold means are order-sensitive in their last
    ulps; every projected statistic takes the stable 4-dp round."""
    o = table(spark, sf_dir, "orders")
    fold = F.expr(
        "CAST(conv(substring(md5(concat('ci:', o_orderkey)), 1, 15),"
        " 16, 10) AS BIGINT) % 10"
    )
    per_fold = (
        o.select(fold.alias("fold"), F.col("o_totalprice").alias("v"))
        .groupBy("fold")
        .agg(F.avg("v").alias("m"))
    )
    k = F.count(F.lit(1)).cast("bigint")
    stats = per_fold.agg(
        k.alias("n_folds"),
        F.avg("m").alias("mm"),
        F.stddev_samp("m").alias("sd"),
    )
    half = 1.96 * F.col("sd") / F.sqrt(F.col("n_folds"))
    return stats.select(
        "n_folds",
        round4(F.col("mm")).alias("mean_of_means"),
        round4(F.col("sd")).alias("sd_of_means"),
        round4(F.col("mm") - half).alias("ci_low"),
        round4(F.col("mm") + half).alias("ci_high"),
    )


@query(
    "profile_join_skew",
    oracle="""
    WITH per_key AS (
        SELECT l_partkey AS k, COUNT(*) AS c FROM lineitem GROUP BY k
    ),
    stats AS (
        SELECT COUNT(*) AS n_keys, MAX(c) AS max_rows,
               SUM(c) AS total_rows
        FROM per_key
    ),
    heavy AS (
        SELECT k, c, ROW_NUMBER() OVER (ORDER BY c DESC, k ASC) AS rn
        FROM per_key
    )
    SELECT heavy.k AS heavy_key, heavy.c AS heavy_rows,
           CAST(heavy.rn AS INTEGER) AS rank,
           stats.n_keys, stats.max_rows,
           FLOOR(CAST(stats.total_rows AS DOUBLE) / stats.n_keys
                 * 10000 + 0.5) / 10000 AS avg_rows,
           FLOOR(CAST(stats.max_rows AS DOUBLE)
                 / (CAST(stats.total_rows AS DOUBLE) / stats.n_keys)
                 * 10000 + 0.5) / 10000 AS skew_ratio
    FROM heavy CROSS JOIN stats
    WHERE heavy.rn <= 5
    """,
)
def profile_join_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnosis: per-key cardinality profile of a join
    column (top-5 heaviest keys, max/avg ratio) — the measurement that
    DECIDES between a plain shuffle join, salting (join_skew_salted),
    and AQE skew splitting. At 100 TB you run this before the join,
    not after the stage straggles: one partial-aggregable count per
    key, a 1-row moment summary broadcast onto the O(keys) rollup, and
    a top-k window over that rollup (WindowGroupLimit — never a sort
    of the fact table). The skew ratio is a ratio of exact integers
    under the stable round."""
    li = table(spark, sf_dir, "lineitem")
    per_key = li.groupBy(F.col("l_partkey").alias("k")).agg(
        F.count(F.lit(1)).alias("c")
    )
    stats = per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.max("c").alias("max_rows"),
        F.sum("c").alias("total_rows"),
    )
    heavy = per_key.withColumn(
        "rn", F.row_number().over(Window.orderBy(F.desc("c"), F.asc("k")))
    ).filter(F.col("rn") <= 5)
    avg_rows = F.col("total_rows").cast("double") / F.col("n_keys")
    return heavy.crossJoin(F.broadcast(stats)).select(
        F.col("k").alias("heavy_key"),
        F.col("c").alias("heavy_rows"),
        F.col("rn").cast("int").alias("rank"),
        "n_keys",
        "max_rows",
        round4(avg_rows).alias("avg_rows"),
        round4(F.col("max_rows").cast("double") / avg_rows).alias(
            "skew_ratio"
        ),
    )


@query(
    "quality_key_candidates",
    oracle="""
    WITH a AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS k1,
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS k2,
               CAST(COUNT(DISTINCT CONCAT(CAST(o_custkey AS VARCHAR), '|',
                                          CAST(o_orderdate AS VARCHAR)))
                    AS BIGINT) AS k3
        FROM orders
    )
    SELECT 'o_orderkey' AS candidate, k1 AS n_distinct, n_rows,
           FLOOR(CAST(k1 AS DOUBLE) / n_rows * 10000 + 0.5) / 10000
               AS uniqueness,
           k1 = n_rows AS is_key
    FROM a
    UNION ALL
    SELECT 'o_custkey', k2, n_rows,
           FLOOR(CAST(k2 AS DOUBLE) / n_rows * 10000 + 0.5) / 10000,
           k2 = n_rows
    FROM a
    UNION ALL
    SELECT 'o_custkey|o_orderdate', k3, n_rows,
           FLOOR(CAST(k3 AS DOUBLE) / n_rows * 10000 + 0.5) / 10000,
           k3 = n_rows
    FROM a
    """,
)
def quality_key_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-key discovery: exact uniqueness ratio (distinct/rows)
    for each contracted column set of orders, with an is_key verdict —
    the profiling step schema contracts, dedup keepers, and upsert
    merge keys are all decided from (and the check the fuzzer's
    lineitem finding shows is NOT optional: that fixture silently has
    no unique key). All three candidates plus the row count come from
    ONE scan — Spark plans the multi-distinct aggregate as a single
    Expand (3× row multiply) rather than three passes, then a 1-row
    stack() projection fans the wide result into report rows. The
    composite candidate is canonicalized as 'custkey|date' text: both
    engines print dates as YYYY-MM-DD, and both columns are non-NULL
    fixture FKs, so plain CONCAT has no NULL-skip hazard
    (scan_text_lines advice class). At 100 TB exact multi-distinct is
    one Expand shuffle; the approx variant to trade toward is
    agg_approx_count_distinct."""
    o = table(spark, sf_dir, "orders")
    a = o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("o_orderkey").alias("k1"),
        F.countDistinct("o_custkey").alias("k2"),
        F.countDistinct(
            F.concat(
                F.col("o_custkey").cast("string"),
                F.lit("|"),
                F.col("o_orderdate").cast("string"),
            )
        ).alias("k3"),
    )
    stacked = a.select(
        F.expr(
            "stack(3, 'o_orderkey', k1, 'o_custkey', k2, "
            "'o_custkey|o_orderdate', k3) AS (candidate, n_distinct)"
        ),
        "n_rows",
    )
    return stacked.select(
        "candidate",
        "n_distinct",
        "n_rows",
        round4(F.col("n_distinct").cast("double") / F.col("n_rows")).alias(
            "uniqueness"
        ),
        (F.col("n_distinct") == F.col("n_rows")).alias("is_key"),
    )


@query(
    "quality_order_reconcile",
    oracle="""
    WITH per_order AS (
        SELECT l_orderkey,
               SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax))
                   AS line_total
        FROM lineitem GROUP BY l_orderkey
    ),
    j AS (
        SELECT o_orderkey, o_totalprice, line_total,
               FLOOR((line_total / o_totalprice) * 10000 + 0.5) / 10000
                   AS ratio
        FROM orders LEFT JOIN per_order ON o_orderkey = l_orderkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN line_total IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_without_lines,
           CAST(SUM(CASE WHEN ABS(ratio - 1) <= 0.01 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_within_1pct,
           CAST(SUM(CASE WHEN ratio IS NOT NULL AND ABS(ratio - 1) > 0.01
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatched,
           FLOOR(MIN(ratio) * 10000 + 0.5) / 10000 AS min_ratio,
           FLOOR(MAX(ratio) * 10000 + 0.5) / 10000 AS max_ratio
    FROM j
    """,
)
def quality_order_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table reconciliation: does each order header's total agree
    with its lines' net revenue? The inter-TABLE data-quality check
    the single-table keys (quality_expectation_suite, checksum, null
    profile) cannot see — broken ETL usually disagrees BETWEEN tables
    before any within-table rule fires. Shape: per-order line rollup
    (one shuffle on the join key), LEFT join from headers so
    line-less orders surface as their own defect class instead of
    silently vanishing, then a 1-row conditional-aggregate summary.
    The per-order ratio takes the stable round before the ±1%
    tolerance gate so summation-order noise in the ≤7-term line sums
    can't flip a boundary order between the matched/mismatched
    counts."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    per_order = li.groupBy("l_orderkey").agg(
        F.sum(
            F.col("l_extendedprice")
            * (1 - F.col("l_discount"))
            * (1 + F.col("l_tax"))
        ).alias("line_total")
    )
    j = o.join(per_order, o.o_orderkey == per_order.l_orderkey, "left").select(
        "o_totalprice",
        "line_total",
        round4(F.col("line_total") / F.col("o_totalprice")).alias("ratio"),
    )
    return j.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.when(F.col("line_total").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_without_lines"),
        F.sum(F.when(F.abs(F.col("ratio") - 1) <= 0.01, 1).otherwise(0))
        .cast("bigint")
        .alias("n_within_1pct"),
        F.sum(
            F.when(
                F.col("ratio").isNotNull() & (F.abs(F.col("ratio") - 1) > 0.01),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_mismatched"),
        round4(F.min("ratio")).alias("min_ratio"),
        round4(F.max("ratio")).alias("max_ratio"),
    )


@query(
    "quality_control_chart",
    oracle=f"""
    WITH e AS (
        SELECT CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 86400
                   AS day,
               CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_err
        FROM events
    ),
    daily AS (
        SELECT day, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(is_err) AS BIGINT) AS n_errors
        FROM e GROUP BY day
    ),
    center AS (
        SELECT CAST(SUM(n_errors) AS DOUBLE) / SUM(n) AS pbar FROM daily
    )
    SELECT CAST(day AS BIGINT) AS day, n, n_errors,
           FLOOR((CAST(n_errors AS DOUBLE) / n) * 10000 + 0.5) / 10000 AS p,
           FLOOR((pbar + 3 * SQRT(pbar * (1 - pbar) / n)) * 10000 + 0.5)
               / 10000 AS ucl,
           FLOOR(GREATEST(pbar - 3 * SQRT(pbar * (1 - pbar) / n), 0.0)
                 * 10000 + 0.5) / 10000 AS lcl,
           FLOOR((CAST(n_errors AS DOUBLE) / n) * 10000 + 0.5) / 10000 >
               FLOOR((pbar + 3 * SQRT(pbar * (1 - pbar) / n)) * 10000 + 0.5)
               / 10000
           OR
           FLOOR((CAST(n_errors AS DOUBLE) / n) * 10000 + 0.5) / 10000 <
               FLOOR(GREATEST(pbar - 3 * SQRT(pbar * (1 - pbar) / n), 0.0)
                     * 10000 + 0.5) / 10000
               AS out_of_control
    FROM daily CROSS JOIN center
    """,
)
def quality_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shewhart p-chart over the daily error rate: centerline p̄ from
    the pooled totals, per-day 3σ binomial control limits
    p̄ ± 3·√(p̄(1−p̄)/nᵢ) (lower limit clamped at 0), and an
    out-of-control flag — the SPC discipline that separates
    common-cause noise from a real process shift, where
    timeseries_rate_spike's trailing-mean rule reacts to ANY recent
    level and anomaly_zscore has no per-day sample-size awareness
    (a small day legitimately wanders wider — the √n denominator is
    the point). Everything is closed-form IEEE arithmetic over
    integer counts: exact p̄ as a 1-row broadcast, per-day limits
    row-local, both sides of each flag comparison rounded first
    (boundary-ulp rule). One O(days) rollup, one scalar pass."""
    e = table(spark, sf_dir, "events").select(
        F.floor(
            F.unix_timestamp(F.date_trunc("second", F.col("ts"))) / 86400
        ).alias("day"),
        F.when(F.col("event_type") == "error", 1).otherwise(0).alias(
            "is_err"
        ),
    )
    daily = e.groupBy("day").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("is_err").cast("bigint").alias("n_errors"),
    )
    center = daily.agg(
        (
            F.sum("n_errors").cast("double") / F.sum("n")
        ).alias("pbar")
    )
    p4 = round4(F.col("n_errors").cast("double") / F.col("n"))
    sigma = F.sqrt(
        F.col("pbar") * (1 - F.col("pbar")) / F.col("n")
    )
    ucl4 = round4(F.col("pbar") + 3 * sigma)
    lcl4 = round4(F.greatest(F.col("pbar") - 3 * sigma, F.lit(0.0)))
    return daily.crossJoin(F.broadcast(center)).select(
        F.col("day").cast("bigint").alias("day"),
        "n",
        "n_errors",
        p4.alias("p"),
        ucl4.alias("ucl"),
        lcl4.alias("lcl"),
        ((p4 > ucl4) | (p4 < lcl4)).alias("out_of_control"),
    )


@query(
    "quality_fk_matrix",
    oracle="""
    SELECT 'orders.o_custkey->customer' AS fk,
           CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS n_rows,
           CAST((SELECT COUNT(*) FROM orders
                 WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
                AS BIGINT) AS n_orphans
    UNION ALL
    SELECT 'lineitem.l_orderkey->orders',
           (SELECT COUNT(*) FROM lineitem),
           (SELECT COUNT(*) FROM lineitem
            WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
    UNION ALL
    SELECT 'lineitem.l_partkey->part',
           (SELECT COUNT(*) FROM lineitem),
           (SELECT COUNT(*) FROM lineitem
            WHERE l_partkey NOT IN (SELECT p_partkey FROM part))
    UNION ALL
    SELECT 'lineitem.l_suppkey->supplier',
           (SELECT COUNT(*) FROM lineitem),
           (SELECT COUNT(*) FROM lineitem
            WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier))
    UNION ALL
    SELECT 'customer.c_nationkey->nation',
           (SELECT COUNT(*) FROM customer),
           (SELECT COUNT(*) FROM customer
            WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation))
    UNION ALL
    SELECT 'supplier.s_nationkey->nation',
           (SELECT COUNT(*) FROM supplier),
           (SELECT COUNT(*) FROM supplier
            WHERE s_nationkey NOT IN (SELECT n_nationkey FROM nation))
    UNION ALL
    SELECT 'nation.n_regionkey->region',
           (SELECT COUNT(*) FROM nation),
           (SELECT COUNT(*) FROM nation
            WHERE n_regionkey NOT IN (SELECT r_regionkey FROM region))
    """,
)
def quality_fk_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-wide referential-integrity audit: orphan counts for all
    SEVEN declared FK relationships in one report — the single table
    a data-platform on-call reads after a bad load, where
    quality_fk_orphans drills into one relationship's offending rows.
    Each relationship is a LEFT-ANTI join count (NOT IN over non-null
    keys rewrites to anti; every dim side broadcasts); the per-FK
    rows union into the report. All counts are BIGINT — hash-exact.
    On the intact fixture every n_orphans is 0 BY DESIGN: the key
    asserts referential health, and the crafted test plants orphans
    to prove the counts actually count."""
    pairs = [
        ("orders.o_custkey->customer", "orders", "o_custkey",
         "customer", "c_custkey"),
        ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
         "orders", "o_orderkey"),
        ("lineitem.l_partkey->part", "lineitem", "l_partkey",
         "part", "p_partkey"),
        ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
         "supplier", "s_suppkey"),
        ("customer.c_nationkey->nation", "customer", "c_nationkey",
         "nation", "n_nationkey"),
        ("supplier.s_nationkey->nation", "supplier", "s_nationkey",
         "nation", "n_nationkey"),
        ("nation.n_regionkey->region", "nation", "n_regionkey",
         "region", "r_regionkey"),
    ]
    out = None
    for name, child, ck, parent, pk in pairs:
        ch = table(spark, sf_dir, child)
        pa = table(spark, sf_dir, parent).select(F.col(pk).alias("__pk"))
        orphans = ch.join(
            F.broadcast(pa), ch[ck] == F.col("__pk"), "left_anti"
        )
        row = ch.agg(F.count(F.lit(1)).alias("n_rows")).crossJoin(
            orphans.agg(F.count(F.lit(1)).alias("n_orphans"))
        ).select(
            F.lit(name).alias("fk"), "n_rows", "n_orphans"
        )
        out = row if out is None else out.unionByName(row)
    return out


@query(
    "quality_seq_gap_audit",
    oracle="""
    WITH gaps AS (
        SELECT event_type, event_id,
               event_id - LAG(event_id) OVER (
                   PARTITION BY event_type ORDER BY event_id) AS gap
        FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(event_id) AS BIGINT) AS min_id,
           CAST(MAX(event_id) AS BIGINT) AS max_id,
           CAST(MAX(event_id) - MIN(event_id) + 1 - COUNT(*) AS BIGINT)
               AS missing,
           FLOOR(CAST(COUNT(*) AS DOUBLE)
                 / (MAX(event_id) - MIN(event_id) + 1) * 10000 + 0.5)
               / 10000 AS density,
           CAST(MAX(gap) AS BIGINT) AS max_adjacent_gap,
           CAST(COUNT(*) - COUNT(DISTINCT event_id) AS BIGINT)
               AS n_duplicate_ids
    FROM gaps
    GROUP BY event_type
    """,
)
def quality_seq_gap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-gap audit over a monotonically-assigned id column: per
    event_type, how much of the id range [min, max] is actually
    present (missing count + density), the largest adjacent gap, and
    duplicate-id count — the "did my ingest drop or replay rows" check
    a pipeline runs on every partition of a sequenced feed before
    trusting downstream counts. event_id is a global dense sequence,
    so per-type streams are naturally gapped and the audit is
    non-degenerate: each type's density ≈ its share of traffic, and a
    max_adjacent_gap far above 1/density flags a type-specific outage
    window rather than random thinning.

    Scale design: one window (partition by type, ordered by id — the
    partition-local sort a real sequenced feed is usually already
    clustered by) feeding one map-side-combinable aggregate; the
    COUNT DISTINCT rides the same shuffle key. No joins, no driver
    state; output is O(#types) rows. All columns are exact integers
    except density, one division under the stable 4-dp round."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("event_id")
    gaps = ev.select(
        "event_type",
        "event_id",
        (F.col("event_id") - F.lag("event_id").over(w)).alias("gap"),
    )
    return gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.min("event_id").cast("bigint").alias("min_id"),
        F.max("event_id").cast("bigint").alias("max_id"),
        (
            F.max("event_id") - F.min("event_id") + 1 - F.count(F.lit(1))
        )
        .cast("bigint")
        .alias("missing"),
        round4(
            F.count(F.lit(1)).cast("double")
            / (F.max("event_id") - F.min("event_id") + 1)
        ).alias("density"),
        F.max("gap").cast("bigint").alias("max_adjacent_gap"),
        (F.count(F.lit(1)) - F.countDistinct("event_id"))
        .cast("bigint")
        .alias("n_duplicate_ids"),
    )
