"""Multimodal (binary) column plumbing for training-data pipelines.

Images/audio/video are opaque ``binary`` columns with typed metadata;
decode / feature-extract / frame-sample run as Arrow-batched pandas
functions over ``mapInPandas``. The real media codecs are NOT in this
container (SURVEY.md environment), so the decode step is STUBBED: a
clearly-marked ``decode_media`` raises ``NotImplementedError`` for real
codecs and a deterministic fake decoder stands in for tests. Everything
Spark-side — schema, partitioning, UDF signatures, Arrow batch shapes —
is real and tested.

The fixture has no binary table, so a deterministic surrogate is built
in-plan: ``media = unhex(md5(text) || md5('2:' || text))`` with metadata
derived from doc columns. Because the surrogate is md5-derived, BOTH
operators are SQL-checked exactly: the DuckDB oracles reconstruct every
byte from the hex digests and verify the Python UDFs' arithmetic
value-for-value (plus invariants in tests/test_multimodal.py).

Scale notes: mapInPandas streams Arrow batches — peak memory is
O(batch), not O(partition); decode parallelism equals input partitions
(media blobs should be stored pre-partitioned by size class so batches
stay balanced). Feature extraction emits fixed-width rows, so the
shuffle after extraction is cheap regardless of blob size.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from movierecommender_sentimentanalysissytem_spark.registry import query
from movierecommender_sentimentanalysissytem_spark.sources.tables import table


def decode_media(blob: bytes, media_type: str) -> bytes:
    """Decode a media blob to raw samples/pixels.

    STUB: real decoding needs image/audio codecs (PIL, ffmpeg, …) that
    are not installed in this environment. The fake ``media_type``
    is handled deterministically so the surrounding Spark plumbing is
    exercised end-to-end; any real codec request fails loudly.
    """
    if media_type == "fake":
        return blob  # identity "decode" — deterministic stand-in
    raise NotImplementedError(
        f"decode for media_type={media_type!r} requires codec libraries "
        "not present in this environment (PIL/ffmpeg/torchaudio)"
    )


def _media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → surrogate media table: (doc_id, media binary,
    media_type, meta struct<width,height,n_frames>)."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.unhex(F.concat(F.md5("text"), F.md5(F.concat(F.lit("2:"), F.col("text"))))).alias(
            "media"
        ),
        F.lit("fake").alias("media_type"),
        F.struct(
            (F.col("n_chars") % 64 + 1).cast("int").alias("width"),
            (F.col("n_chars") % 48 + 1).cast("int").alias("height"),
            (F.col("n_chars") % 8 + 1).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


_FEAT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("byte_mean", T.DoubleType()),
        T.StructField("byte_min", T.IntegerType()),
        T.StructField("byte_max", T.IntegerType()),
        T.StructField("feat", T.ArrayType(T.DoubleType())),
    ]
)


_FEAT_ORACLE = """
    WITH hexes AS (
        SELECT doc_id, md5(text) || md5('2:' || text) AS hx FROM documents
    ),
    bytes AS (
        SELECT doc_id, CAST('0x' || substr(hx, i*2 + 1, 2) AS INTEGER) AS b
        FROM hexes, range(0, 32) t(i)
    )
    SELECT doc_id,
           CAST(COUNT(*) AS INTEGER) AS n_bytes,
           AVG(b) AS byte_mean,
           CAST(MIN(b) AS INTEGER) AS byte_min,
           CAST(MAX(b) AS INTEGER) AS byte_max,
""" + ",\n".join(
    f"           SUM(CASE WHEN b >> 5 = {i} THEN 1 ELSE 0 END) / 32.0"
    f" AS feat_{i}"
    for i in range(8)
) + """
    FROM bytes GROUP BY doc_id
"""


@query("multimodal_feature_extract", oracle=_FEAT_ORACLE)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode (stub) + feature-extract over Arrow batches: per-blob
    byte statistics and an 8-bucket byte histogram as the "embedding".
    The mapInPandas iterator shape (pdf-in → pdf-out generator) is the
    real production plumbing for image/audio featurization.

    SQL-checked exactly: the surrogate blob is md5-derived, so the
    oracle reconstructs every byte from the hex digest in pure SQL —
    the Python UDF's arithmetic is verified value-for-value against a
    relational formulation (byte stats and all 8 histogram buckets)."""
    import pandas as pd

    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = {
                "doc_id": [],
                "n_bytes": [],
                "byte_mean": [],
                "byte_min": [],
                "byte_max": [],
                "feat": [],
            }
            for doc_id, blob, mtype in zip(
                pdf["doc_id"], pdf["media"], pdf["media_type"]
            ):
                raw = decode_media(bytes(blob), mtype)
                n = len(raw)
                acc = 0
                hist = [0] * 8
                for byte in raw:
                    acc += byte
                    hist[byte >> 5] += 1
                out["doc_id"].append(doc_id)
                out["n_bytes"].append(n)
                out["byte_mean"].append(acc / n if n else 0.0)
                out["byte_min"].append(min(raw) if n else 0)
                out["byte_max"].append(max(raw) if n else 0)
                out["feat"].append([h / n for h in hist] if n else [0.0] * 8)
            yield pd.DataFrame(out)

    media = _media_table(spark, sf_dir)
    feats = media.mapInPandas(extract, _FEAT_SCHEMA)
    # Scalar-only projection: the driver's canonicalizer cannot hash
    # array columns, so the 8-bucket histogram is flattened to feat_0..7.
    return feats.select(
        "doc_id",
        "n_bytes",
        "byte_mean",
        "byte_min",
        "byte_max",
        *[F.col("feat")[i].alias(f"feat_{i}") for i in range(8)],
    )


_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_bytes", T.IntegerType()),
        T.StructField("frame_md5", T.StringType()),
    ]
)


_FRAME_ORACLE = """
    WITH m AS (
        SELECT doc_id, md5(text) || md5('2:' || text) AS hx,
               (n_chars % 8 + 1) AS n_frames,
               CAST(32 // (n_chars % 8 + 1) AS INTEGER) AS fsize
        FROM documents
    )
    SELECT doc_id,
           CAST(i AS INTEGER) AS frame_idx,
           fsize AS frame_bytes,
           md5(substr(hx, i*fsize*2 + 1, fsize*2)) AS frame_md5
    FROM m, range(0, 8, 2) t(i)
    WHERE i < n_frames
"""


@query("multimodal_frame_sample", oracle=_FRAME_ORACLE)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling for "video" blobs: split each blob into
    meta.n_frames equal chunks and emit one row per sampled frame
    (every 2nd frame) — the one-blob → many-rows explode pattern that
    video pipelines need, with per-frame digests for downstream dedup.

    The digest is md5 over the frame's lowercase-hex encoding (the
    canonical string form), which makes the Python chunking logic
    SQL-checkable exactly: the oracle re-derives every chunk from the
    surrogate blob's hex digest and hashes the same string."""
    import hashlib

    import pandas as pd

    def sample(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_bytes": [], "frame_md5": []}
            for doc_id, blob, mtype, meta in zip(
                pdf["doc_id"], pdf["media"], pdf["media_type"], pdf["meta"]
            ):
                raw = decode_media(bytes(blob), mtype)
                n_frames = int(meta["n_frames"])
                size = max(1, len(raw) // n_frames)
                for idx in range(0, n_frames, 2):  # sample every 2nd frame
                    chunk = raw[idx * size : (idx + 1) * size]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["frame_bytes"].append(len(chunk))
                    out["frame_md5"].append(
                        hashlib.md5(chunk.hex().encode()).hexdigest()
                    )
            yield pd.DataFrame(out)

    media = _media_table(spark, sf_dir)
    return media.mapInPandas(sample, _FRAME_SCHEMA)
