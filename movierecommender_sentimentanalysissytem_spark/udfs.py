"""UDF surface (SURVEY.md §2.12).

UDFs are the engine's escape hatch, not its hot path: every operator
that CAN be a built-in is a built-in (see functions/). This module
demonstrates each UDF tier with functions deliberately chosen to be
SQL-mirrorable so even the Python paths get full oracle checks:

- scalar Python UDF: row-at-a-time, pickled — the slow tier
- pandas UDF: Arrow-batched, vectorized — ~10-100× faster, the only
  acceptable Python tier in hot paths at 100 TB
- applyInPandas: grouped-map for per-group logic
- UDTF: one-row → many-rows table function

Float discipline: Python-side accumulation uses explicit sequential
loops (not numpy pairwise summation) so the fold order — and hence the
bits — match the oracle's list_reduce / windowed-agg formulations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from movierecommender_sentimentanalysissytem_spark.functions.rounding import round4
from movierecommender_sentimentanalysissytem_spark.registry import query
from movierecommender_sentimentanalysissytem_spark.sources.tables import table


@query(
    "udf_python_scalar",
    oracle="""
    SELECT doc_id,
           regexp_replace(lower(text), '[aeiou]', '', 'g') AS text_devoweled
    FROM documents
    WHERE doc_id < 50
    """,
)
def udf_python_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (normalize: lowercase + strip vowels) —
    mirrored by a pure-SQL regexp so the oracle still hash-checks it."""
    import re

    @F.udf(T.StringType())
    def devowel(s: str) -> str:
        return re.sub(r"[aeiou]", "", s.lower()) if s is not None else None

    d = table(spark, sf_dir, "documents")
    return d.filter(F.col("doc_id") < 50).select(
        "doc_id", devowel("text").alias("text_devoweled")
    )


@query(
    "udf_pandas_vectorized",
    oracle="""
    SELECT vec_id,
           FLOOR(sqrt(list_reduce(list_transform(embedding,
                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                     (a, b) -> a + b)) * 10000 + 0.5) / 10000 AS l2_norm
    FROM embeddings
    """,
)
def udf_pandas_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched pandas UDF computing the embedding L2 norm.

    The accumulation is an explicit sequential Python loop so the fold
    order matches DuckDB's list_reduce exactly (numpy's pairwise
    summation would differ in the last ulp and break the value hash).
    """
    import math

    import pandas as pd

    def _l2_norm_batch(col):
        def norm(arr):
            acc = 0.0
            for x in arr:
                xd = float(x)
                acc += xd * xd
            return math.sqrt(acc)

        return col.map(norm)

    # no inline type hints: `from __future__ import annotations` would
    # stringify them and pandas_udf's hint parser rejects the strings
    l2_norm = F.pandas_udf(_l2_norm_batch, T.DoubleType())
    del pd  # silence unused-import linters; pandas is used at runtime

    e = table(spark, sf_dir, "embeddings")
    return e.select("vec_id", round4(l2_norm("embedding")).alias("l2_norm"))


@query(
    "udaf_pandas_grouped",
    oracle="""
    SELECT user_id, event_id,
           FLOOR(((value - AVG(value) OVER w) / STDDEV_SAMP(value) OVER w)
                 * 10000 + 0.5) / 10000 AS zscore
    FROM events
    WINDOW w AS (PARTITION BY user_id)
    """,
)
def udaf_pandas_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map ``applyInPandas``: per-user z-score of event values.

    Mean/stddev are computed with sequential loops (sum, then sum of
    squared deviations — the numerically-stable two-pass form DuckDB's
    STDDEV_SAMP also uses) so values hash-match the windowed-SQL oracle.
    """
    import math

    import pandas as pd

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_id", T.LongType()),
            T.StructField("zscore", T.DoubleType()),
        ]
    )

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        vals = [float(v) for v in pdf["value"]]
        n = len(vals)
        mean = 0.0
        for v in vals:
            mean += v
        mean /= n
        if n > 1:
            m2 = 0.0
            for v in vals:
                m2 += (v - mean) * (v - mean)
            sd = math.sqrt(m2 / (n - 1))
        else:
            sd = float("nan")
        z = [
            math.floor(((v - mean) / sd) * 10000 + 0.5) / 10000 if sd == sd else None
            for v in vals
        ]
        return pd.DataFrame(
            {"user_id": pdf["user_id"], "event_id": pdf["event_id"], "zscore": z}
        )

    e = table(spark, sf_dir, "events").select("user_id", "event_id", "value")
    return e.groupBy("user_id").applyInPandas(zscore, schema)


@query(
    "udtf",
    oracle="""
    SELECT event_id, 'k' AS key, CAST(props->>'$.k' AS VARCHAR) AS val
    FROM events
    WHERE event_id < 200
    """,
)
def udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF exploding the props JSON object into (key, value)
    rows via a lateral join — the one-row → many-rows tier."""
    import json

    from pyspark.sql.functions import udtf as udtf_dec

    @udtf_dec(returnType="key: string, val: string")
    class ParseProps:
        def eval(self, props: str):
            if props:
                for k, v in json.loads(props).items():
                    yield str(k), str(v)

    spark.udtf.register("mrsas_parse_props", ParseProps)
    e = table(spark, sf_dir, "events")
    e.filter(F.col("event_id") < 200).select(
        "event_id", "props"
    ).createOrReplaceTempView("mrsas_udtf_events")
    return spark.sql(
        """
        SELECT e.event_id, t.key, t.val
        FROM mrsas_udtf_events e, LATERAL mrsas_parse_props(e.props) t
        """
    )


@query(
    "udf_arrow_optimized",
    oracle="""
    SELECT doc_id,
           LENGTH(text) - LENGTH(regexp_replace(text, '[aeiou]', '', 'g'))
               AS n_vowels
    FROM documents WHERE doc_id < 100
    """,
)
def udf_arrow_optimized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized Python UDF (Spark 4 ``useArrow=True``): scalar
    Python semantics with Arrow-batch serialization — the middle tier
    between the pickled row-at-a-time UDF (udf_python_scalar, ~10-100×
    slower transfers) and the pandas UDF (udf_pandas_vectorized, batch
    semantics). Same per-row function signature, columnar wire format.
    Mirrored by a pure-SQL vowel count so the oracle hash-checks it."""

    @F.udf(T.IntegerType(), useArrow=True)
    def n_vowels(s: str) -> int:
        return sum(1 for ch in s if ch in "aeiou") if s is not None else None

    d = table(spark, sf_dir, "documents")
    return d.filter(F.col("doc_id") < 100).select(
        "doc_id", n_vowels("text").alias("n_vowels")
    )


@query(
    "udf_map_in_arrow",
    oracle="""
    SELECT doc_id, LENGTH(text) AS n_chars_py, n_chars AS n_chars_col
    FROM documents WHERE doc_id < 200
    """,
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow``: the lowest-overhead Python tier — raw pyarrow
    RecordBatches with no pandas conversion at all. Right choice when
    the Python side is itself Arrow-native (vector libs, Lance/Polars,
    tokenizers with Arrow bindings); pandas round-trips (mapInPandas)
    cost an extra copy each way. Recomputes text length batch-wise and
    carries the stored n_chars through for the oracle to cross-check
    both."""
    import pyarrow as pa

    def recount(batches):
        for batch in batches:
            tbl = pa.Table.from_batches([batch])
            yield pa.RecordBatch.from_arrays(
                [
                    tbl.column("doc_id").combine_chunks(),
                    pa.compute.utf8_length(
                        tbl.column("text").combine_chunks()
                    ).cast(pa.int64()),
                    tbl.column("n_chars").combine_chunks().cast(pa.int64()),
                ],
                names=["doc_id", "n_chars_py", "n_chars_col"],
            )

    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return d.select("doc_id", "text", "n_chars").mapInArrow(
        recount, "doc_id bigint, n_chars_py bigint, n_chars_col bigint"
    )


@query(
    "udtf_table_argument",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events,
           FLOOR(SUM(value) * 10000 + 0.5) / 10000 AS total_value
    FROM events WHERE user_id <= 10 GROUP BY user_id
    """,
)
def udtf_table_argument(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polymorphic UDTF over a TABLE argument (Spark 4): the function
    receives WHOLE PARTITIONS of a relation — ``PARTITION BY user_id
    ORDER BY event_id`` hands each instance one user's rows in a fixed
    order — the custom-aggregation escape hatch when terminate()-time
    logic won't fit builtin aggregates. The partition clause is what
    makes it scale: Spark shuffles on user_id and runs one UDTF
    instance per partition in parallel. The Python fold runs in
    deterministic event_id order; the oracle is the equivalent
    GROUP BY (both sides 4 dp-rounded)."""
    from pyspark.sql.functions import udtf as udtf_dec

    @udtf_dec(
        returnType="user_id: bigint, n_events: bigint, total_value: double"
    )
    class UserSummary:
        def __init__(self):
            self._uid = None
            self._n = 0
            self._tot = 0.0

        def eval(self, row):
            self._uid = row["user_id"]
            self._n += 1
            self._tot += row["value"]

        def terminate(self):
            if self._uid is not None:
                import math

                yield self._uid, self._n, math.floor(
                    self._tot * 10000 + 0.5
                ) / 10000

    spark.udtf.register("mrsas_user_summary", UserSummary)
    e = table(spark, sf_dir, "events")
    # user_id <= 10 sits inside the domain at every SF (see
    # tests/test_invariants.py fixture-domain pins).
    e.filter(F.col("user_id") <= 10).select(
        "user_id", "event_id", "value"
    ).createOrReplaceTempView("mrsas_udtf_tbl")
    return spark.sql(
        """
        SELECT * FROM mrsas_user_summary(
            TABLE(mrsas_udtf_tbl) PARTITION BY user_id ORDER BY event_id)
        """
    )


@query(
    "udf_pandas_iter",
    oracle="""
    SELECT o_orderkey,
           FLOOR(((o_totalprice - 150000.0) / 50000.0) * 10000 + 0.5)
               / 10000 AS price_z
    FROM orders WHERE o_orderkey < 1000
    """,
)
def udf_pandas_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterator-of-Series pandas UDF (SCALAR_ITER eval type) — the
    variant built for expensive one-time initialization: the constants
    (a "model") load ONCE per worker before the batch loop, then every
    Arrow batch streams through the same closure. Completes the UDF
    eval-type matrix alongside scalar (udf_python_scalar), vectorized
    SCALAR (udf_pandas_vectorized), grouped-map (udaf_pandas_grouped),
    mapInPandas/mapInArrow, and UDTFs. The arithmetic is trivially
    SQL-mirrored; what the key pins is the iterator protocol."""
    def _standardize(batches):
        center, scale = 150000.0, 50000.0  # one-time "model load"
        for s in batches:
            yield (s - center) / scale

    # explicit SCALAR_ITER eval type: the module's stringified
    # annotations (`from __future__ import annotations`) defeat
    # pandas_udf's hint inference, same note as udf_pandas_vectorized
    standardize = F.pandas_udf(
        _standardize, "double", F.PandasUDFType.SCALAR_ITER
    )

    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    return o.select(
        "o_orderkey",
        round4(standardize(F.col("o_totalprice"))).alias("price_z"),
    )


@query(
    "udf_cogrouped_map",
    oracle="""
    WITH e AS (
        SELECT user_id, event_type,
               CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec
        FROM events WHERE event_type IN ('click', 'purchase')
    )
    SELECT user_id,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clicks,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_purchases,
           MAX(CASE WHEN event_type = 'click' THEN sec END)
               AS last_click_sec,
           MAX(CASE WHEN event_type = 'purchase' THEN sec END)
               AS last_purchase_sec
    FROM e GROUP BY user_id
    """,
)
def udf_cogrouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped-map pandas UDF — ``df1.groupBy(k).cogroup(
    df2.groupBy(k)).applyInPandas(...)``: BOTH groups for a key arrive
    in one Python call as two aligned pandas frames, the eval type the
    rest of the §2.12 matrix (scalar / iter / grouped-map /
    grouped-agg / UDTF / mapInArrow) doesn't reach. This is the
    escape hatch for per-key merge logic joins can't express
    (custom as-of semantics, per-key reconciliation) — here a
    deliberately SQL-mirrorable merge (side counts + last-activity
    seconds, either side possibly absent) so the Python path still
    gets a full hash oracle. Scale shape: one co-partitioned shuffle
    of both inputs on the key, Arrow-batched transfer, per-key state
    only — the cogroup twin of udaf_pandas_grouped's notes.

    The two sides are built from INDEPENDENT reads on purpose: when
    both cogroup inputs derive from one shared parent DataFrame,
    Spark's subplan reuse can serve BOTH Arrow streams from one
    side's pruned projection, and the Python worker then receives a
    group frame missing the non-key column (observed at sf0.1:
    right frame with 18 rows and only ``user_id`` — a KeyError deep
    in the merge). Separate scans make each side's projection its
    own plan; the column-pruned double scan is cheaper than the bug
    is subtle."""
    import pandas as pd

    def _side(event_type: str):
        e = table(spark, sf_dir, "events").withColumn(
            "sec", F.unix_timestamp(F.date_trunc("second", F.col("ts")))
        )
        return e.filter(F.col("event_type") == event_type).select(
            "user_id", "sec"
        )

    clicks = _side("click")
    purchases = _side("purchase")

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_clicks", T.LongType()),
            T.StructField("n_purchases", T.LongType()),
            T.StructField("last_click_sec", T.LongType()),
            T.StructField("last_purchase_sec", T.LongType()),
        ]
    )

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        uid = int(left["user_id"].iloc[0] if len(left)
                  else right["user_id"].iloc[0])
        return pd.DataFrame(
            [
                {
                    "user_id": uid,
                    "n_clicks": len(left),
                    "n_purchases": len(right),
                    "last_click_sec": (
                        int(left["sec"].max()) if len(left) else None
                    ),
                    "last_purchase_sec": (
                        int(right["sec"].max()) if len(right) else None
                    ),
                }
            ]
        )

    return (
        clicks.groupBy("user_id")
        .cogroup(purchases.groupBy("user_id"))
        .applyInPandas(merge, schema)
    )
