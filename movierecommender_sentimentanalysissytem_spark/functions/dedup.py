"""Deduplication operators (SURVEY.md §2.10 + the LLM-data-pipeline
mandate): exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine.

Every operator here is SQL-checked — including MinHash and SimHash.
The trick is a cross-engine-deterministic hash family derived from md5:
``bigint(hex_prefix(md5(seed || ':' || s), 15))`` computes the identical
60-bit integer in Spark (``conv(substring(md5(..),1,15),16,10)``) and
DuckDB (``CAST('0x' || substr(md5(..),1,15) AS BIGINT)``), so signatures
match bit-for-bit and the oracle exercises the full pipeline, not just
row counts.

Scale design:
- Exact dedup groups on a fixed-width digest, never the raw text, so
  shuffle rows stay small no matter how long documents get.
- MinHash+LSH is the linear-time near-dup path: per-doc signatures are
  computed in a single JVM-side higher-order-function pass (no Python),
  banded, and only band-collision pairs are verified with exact
  Jaccard. All-pairs comparison never happens.
- The n-gram Jaccard operator is the bounded-candidate brute-force
  twin (same-lang + length-band blocking) used to validate MinHash
  recall on samples.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from movierecommender_sentimentanalysissytem_spark.functions.rounding import round4
from movierecommender_sentimentanalysissytem_spark.registry import query
from movierecommender_sentimentanalysissytem_spark.sources.tables import table

N_HASHES = 8          # minhash signature length
N_BANDS = 4           # LSH bands (2 hashes per band)
ROWS_PER_BAND = N_HASHES // N_BANDS


# ---------------------------------------------------------- hash family

def _spark_h(seed: str, s_expr: str) -> str:
    """Spark SQL: 60-bit integer hash of ``s_expr`` under ``seed``."""
    return (
        f"CAST(conv(substring(md5(concat('{seed}', ':', {s_expr})), 1, 15), 16, 10)"
        " AS BIGINT)"
    )


def _duck_h(seed: str, s_expr: str) -> str:
    """DuckDB: the same 60-bit integer hash."""
    return (
        f"CAST('0x' || substr(md5(concat('{seed}', ':', {s_expr})), 1, 15) AS BIGINT)"
    )


_SPARK_SHINGLES = (
    "array_distinct(transform(sequence(1, size(split(text, ' ')) - 2),"
    " i -> concat(element_at(split(text, ' '), i), ' ',"
    "             element_at(split(text, ' '), i + 1), ' ',"
    "             element_at(split(text, ' '), i + 2))))"
)

_DUCK_SHINGLES = (
    "list_distinct(list_transform(range(1, len(string_split(text, ' ')) - 1),"
    " i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]"
    " || ' ' || string_split(text, ' ')[i+2]))"
)


# ------------------------------------------------------------ operators

@query(
    "dedup_exact",
    oracle="""
    SELECT doc_id, lang, source, md5(text) AS text_md5
    FROM (
        SELECT doc_id, lang, source, text,
               ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM documents
    ) t WHERE rn = 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: keep the lowest doc_id per distinct text, keyed on
    the md5 digest (deterministic winner, fixed-width shuffle key)."""
    d = table(spark, sf_dir, "documents")
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "source", F.md5("text").alias("text_md5"))
    )


def _minhash_oracle() -> str:
    hs = ",\n           ".join(
        f"list_min(list_transform(shingles, s -> {_duck_h(str(j), 's')})) AS h{j}"
        for j in range(N_HASHES)
    )
    def band_key(b: int) -> str:
        return "md5(concat(" + ", '_', ".join(
            f"CAST(h{b * ROWS_PER_BAND + r} AS VARCHAR)"
            for r in range(ROWS_PER_BAND)
        ) + "))"

    band_union = "\n        UNION ALL ".join(
        f"SELECT doc_id, shingles, {b + 1} AS band_id, {band_key(b)} AS band_key FROM sig"
        for b in range(N_BANDS)
    )
    return f"""
    WITH sh AS (
        SELECT doc_id, {_DUCK_SHINGLES} AS shingles
        FROM documents
        WHERE len(string_split(text, ' ')) >= 3
    ),
    sig AS (
        SELECT doc_id, shingles,
           {hs}
        FROM sh
    ),
    bands AS (
        {band_union}
    ),
    pairs AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band_id = b.band_id AND a.band_key = b.band_key
         AND a.doc_id < b.doc_id
    )
    SELECT p.doc_a, p.doc_b,
           FLOOR((CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
                  / len(list_distinct(list_concat(sa.shingles, sb.shingles))))
                 * 10000 + 0.5) / 10000 AS jaccard
    FROM pairs p
    JOIN sh sa ON sa.doc_id = p.doc_a
    JOIN sh sb ON sb.doc_id = p.doc_b
    WHERE CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
          / len(list_distinct(list_concat(sa.shingles, sb.shingles))) >= 0.5
    """


@query("dedup_near_minhash", oracle=_minhash_oracle())
def dedup_near_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH near-duplicate pairs, verified with exact Jaccard.

    Pipeline (all JVM-side higher-order functions, no Python UDFs):
    3-word shingles → 8 md5-family minhashes → 4 LSH bands of 2 →
    band-collision self-join → exact Jaccard ≥ 0.5 on collided pairs.
    SQL-checked end-to-end thanks to the cross-engine md5 hash family.
    """
    d = table(spark, sf_dir, "documents").filter(
        F.size(F.split("text", " ")) >= 3
    )
    sh = d.select("doc_id", F.expr(_SPARK_SHINGLES).alias("shingles"))
    sig = sh
    for j in range(N_HASHES):
        sig = sig.withColumn(
            f"h{j}",
            F.expr(
                "array_min(transform(shingles, s -> " + _spark_h(str(j), "s") + "))"
            ),
        )
    band_cols = [
        F.md5(
            F.concat_ws(
                "_",
                *[
                    F.col(f"h{b * ROWS_PER_BAND + r}").cast("string")
                    for r in range(ROWS_PER_BAND)
                ],
            )
        )
        for b in range(N_BANDS)
    ]
    bands = sig.select(
        "doc_id",
        F.posexplode(F.array(*band_cols)).alias("band_id0", "band_key"),
    ).select("doc_id", (F.col("band_id0") + 1).alias("band_id"), "band_key")
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    sa = sh.select(
        F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a")
    )
    sb = sh.select(
        F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b")
    )
    jacc = F.size(F.array_intersect("sh_a", "sh_b")).cast("double") / F.size(
        F.array_union("sh_a", "sh_b")
    )
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(jacc >= 0.5)
        .select("doc_a", "doc_b", round4(jacc).alias("jaccard"))
    )


def _simhash_oracle() -> str:
    h = _duck_h("s", "u.word")
    bit_sums = ",\n           ".join(
        f"SUM(CASE WHEN ((h >> {b}) & 1) = 1 THEN 1 ELSE -1 END) AS s{b}"
        for b in range(16)
    )
    fp = " + ".join(f"(CASE WHEN s{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(16))
    return f"""
    WITH tokens AS (
        SELECT doc_id, {h} AS h
        FROM documents, unnest(string_split(text, ' ')) AS u(word)
    ),
    bits AS (
        SELECT doc_id,
           {bit_sums}
        FROM tokens GROUP BY doc_id
    )
    SELECT doc_id, CAST({fp} AS INTEGER) AS simhash16
    FROM bits
    """


@query("dedup_simhash", oracle=_simhash_oracle())
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash fingerprint per document (frequency-weighted sign
    sum of per-token hash bits). Same md5 hash family as MinHash, so the
    fingerprints are SQL-checked exactly.

    Relational formulation: explode tokens → one conditional SUM per
    bit → assemble the fingerprint arithmetically. One shuffle (the
    groupBy), fixed-width state — at 100 TB this is a plain word-count
    shape.
    """
    d = table(spark, sf_dir, "documents")
    tokens = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).withColumn("h", F.expr(_spark_h("s", "word")))
    bit_aggs = [
        F.sum(
            F.when(F.expr(f"(h >> {b}) & 1") == 1, F.lit(1)).otherwise(F.lit(-1))
        ).alias(f"s{b}")
        for b in range(16)
    ]
    bits = tokens.groupBy("doc_id").agg(*bit_aggs)
    fp = None
    for b in range(16):
        term = F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return bits.select("doc_id", fp.cast("int").alias("simhash16"))


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH sh AS (
        SELECT doc_id, lang, n_chars, {_DUCK_SHINGLES} AS s
        FROM documents
        WHERE len(string_split(text, ' ')) >= 3
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           FLOOR((CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                  / len(list_distinct(list_concat(a.s, b.s)))) * 10000 + 0.5) / 10000
               AS jaccard
    FROM sh a JOIN sh b
      ON a.lang = b.lang
     AND a.doc_id < b.doc_id
     AND abs(a.n_chars - b.n_chars) <= 30
    WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
          / len(list_distinct(list_concat(a.s, b.s))) >= 0.3
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked brute-force n-gram Jaccard: candidate pairs share a
    language and a ±30-char length band (cheap blocking keys), then
    exact 3-gram Jaccard ≥ 0.3. The blocking keeps the pair count
    near-linear; the MinHash operator is the unblocked scale path."""
    d = table(spark, sf_dir, "documents").filter(
        F.size(F.split("text", " ")) >= 3
    )
    sh = d.select("doc_id", "lang", "n_chars", F.expr(_SPARK_SHINGLES).alias("s"))
    a, b = sh.alias("a"), sh.alias("b")
    jacc = F.size(
        F.array_intersect(F.col("a.s"), F.col("b.s"))
    ).cast("double") / F.size(F.array_union(F.col("a.s"), F.col("b.s")))
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.abs(F.col("a.n_chars") - F.col("b.n_chars")) <= 30),
        )
        .filter(jacc >= 0.3)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            round4(jacc).alias("jaccard"),
        )
    )


_DOT_64 = (
    "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
    " 0.0D, (acc, v) -> acc + v)"
)
_NORM = "sqrt(aggregate(transform({v}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 0.0D, (acc, u) -> acc + u))"

_DUCK_DOT = (
    "list_reduce(list_transform(range(1, 65),"
    " i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)),"
    " (x, y) -> x + y)"
)
_DUCK_NORM = (
    "sqrt(list_reduce(list_transform({v}.embedding,"
    " x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (p, q) -> p + q))"
)


@query(
    "dedup_embedding_cosine",
    oracle=f"""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label,
           FLOOR(({_DUCK_DOT} / ({_DUCK_NORM.format(v='a')} * {_DUCK_NORM.format(v='b')}))
                 * 10000 + 0.5) / 10000 AS cos_sim
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE {_DUCK_DOT} / ({_DUCK_NORM.format(v='a')} * {_DUCK_NORM.format(v='b')}) >= 0.4
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, blocked by label (the cheap
    partition key), cosine ≥ 0.4 computed with an in-order JVM fold —
    bit-identical to the DuckDB list_reduce formulation.

    At 100 TB the label-blocking becomes LSH bucketing
    (sim_threshold_join_lsh); the pairwise kernel is unchanged.
    """
    e = table(spark, sf_dir, "embeddings")
    a = e.select(
        F.col("vec_id").alias("vec_a"),
        F.col("label").alias("label"),
        F.col("embedding").alias("a"),
    )
    b = e.select(
        F.col("vec_id").alias("vec_b"),
        F.col("label").alias("label_b"),
        F.col("embedding").alias("b"),
    )
    dot = F.expr(_DOT_64)
    cos = dot / (
        F.expr(_NORM.format(v="a")) * F.expr(_NORM.format(v="b"))
    )
    return (
        a.join(
            b,
            (F.col("label") == F.col("label_b")) & (F.col("vec_a") < F.col("vec_b")),
        )
        .filter(cos >= 0.4)
        .select("vec_a", "vec_b", "label", round4(cos).alias("cos_sim"))
    )
