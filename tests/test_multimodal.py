"""Multimodal binary-column plumbing invariants."""

from __future__ import annotations

import pytest

from movierecommender_sentimentanalysissytem_spark import registry
from movierecommender_sentimentanalysissytem_spark.functions.multimodal import (
    decode_media,
)
from tests.conftest import SF_SMALL

QS = registry.queries()


def test_decode_stub_fails_loudly_for_real_codecs():
    with pytest.raises(NotImplementedError):
        decode_media(b"\x00", "image/png")


def test_feature_extract_schema_and_values(spark):
    df = QS["multimodal_feature_extract"](spark, SF_SMALL)
    rows = df.collect()
    assert rows
    for r in rows:
        assert r.n_bytes == 32  # two md5 digests
        assert 0 <= r.byte_min <= r.byte_max <= 255
        feat = [r[f"feat_{i}"] for i in range(8)]
        assert abs(sum(feat) - 1.0) < 1e-9  # histogram normalized


def test_feature_extract_deterministic(spark):
    a = {r.doc_id: r.byte_mean for r in QS["multimodal_feature_extract"](spark, SF_SMALL).collect()}
    b = {r.doc_id: r.byte_mean for r in QS["multimodal_feature_extract"](spark, SF_SMALL).collect()}
    assert a == b


def test_frame_sample_counts_match_meta(spark):
    from pyspark.sql import functions as F

    from movierecommender_sentimentanalysissytem_spark.functions.multimodal import (
        _media_table,
    )

    frames = QS["multimodal_frame_sample"](spark, SF_SMALL)
    per_doc = {r.doc_id: r.n for r in frames.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    meta = {
        r.doc_id: r.n_frames
        for r in _media_table(spark, SF_SMALL).select("doc_id", "meta.n_frames").collect()
    }
    for doc_id, n in per_doc.items():
        expected = (meta[doc_id] + 1) // 2  # every 2nd frame
        assert n == expected
