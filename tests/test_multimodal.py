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


def test_parse_wav_roundtrips_stdlib_writer():
    import io
    import struct
    import wave as wavmod

    from movierecommender_sentimentanalysissytem_spark.functions.multimodal import (
        parse_wav,
    )

    buf = io.BytesIO()
    samples = struct.pack("<8h", *[0, 100, -100, 32767, -32768, 7, -7, 1])
    with wavmod.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(samples)
    nch, rate, n, pcm = parse_wav(buf.getvalue())
    assert (nch, rate, n) == (1, 16000, 8)
    assert pcm == samples


def test_parse_wav_rejects_garbage():
    import wave as wavmod

    import pytest as pt

    from movierecommender_sentimentanalysissytem_spark.functions.multimodal import (
        parse_wav,
    )

    with pt.raises(wavmod.Error):
        parse_wav(b"\x00" * 64)


def test_parse_ppm_validates_header_and_payload():
    import pytest as pt

    from movierecommender_sentimentanalysissytem_spark.functions.multimodal import (
        parse_ppm,
    )

    pix = bytes(range(2 * 2 * 3))
    w, h, maxval, got = parse_ppm(b"P6\n2 2\n255\n" + pix)
    assert (w, h, maxval) == (2, 2, 255)
    assert got == pix
    with pt.raises(ValueError):
        parse_ppm(b"P5\n2 2\n255\n" + pix)          # wrong magic
    with pt.raises(ValueError):
        parse_ppm(b"P6\n2 2\n255\n" + pix[:-1])     # short payload
    with pt.raises(ValueError):
        parse_ppm(b"P6\n2 2\n65535\n" + pix)        # unsupported depth


def test_decode_media_still_refuses_compressed_codecs():
    import pytest as pt

    from movierecommender_sentimentanalysissytem_spark.functions.multimodal import (
        decode_media,
    )

    with pt.raises(NotImplementedError):
        decode_media(b"\xff\xd8\xff", "jpeg")
