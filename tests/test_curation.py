"""Invariants for the corpus-curation operators (functions/curation.py):
decontamination, repetition filtering, mix rebalancing, quantization.
Cross-engine value equality is covered by the parity oracles; these pin
the semantic properties that a hash match alone would not explain."""

from __future__ import annotations

from movierecommender_sentimentanalysissytem_spark import registry
from tests.conftest import SF_SMALL

QS = registry.queries()


def test_decontaminate_excludes_benchmark_and_bounds(spark):
    from movierecommender_sentimentanalysissytem_spark.functions.curation import (
        _SPARK_IS_BENCH,
    )
    from movierecommender_sentimentanalysissytem_spark.sources.tables import table
    from pyspark.sql import functions as F

    rows = QS["decontaminate_ngram_overlap"](spark, SF_SMALL).collect()
    assert rows
    bench_ids = {
        r.doc_id
        for r in table(spark, SF_SMALL, "documents")
        .filter(F.expr(_SPARK_IS_BENCH))
        .select("doc_id")
        .collect()
    }
    assert bench_ids, "benchmark slice is empty — gate is broken"
    for r in rows:
        # benchmark docs are never scored against themselves
        assert r.doc_id not in bench_ids
        assert 0 <= r.n_overlap <= r.n_shingles
        assert 0.0 <= r.overlap_frac <= 1.0
        assert r.contaminated == (r.n_overlap / r.n_shingles >= 0.5)


def test_repetition_filter_bounds_and_flag_consistency(spark):
    rows = QS["text_repetition_filter"](spark, SF_SMALL).collect()
    assert rows
    flagged = 0
    for r in rows:
        assert 0.0 <= r.dup_bigram_frac <= 1.0
        assert 0.0 < r.top_word_ratio <= 1.0
        assert r.flagged == (
            r.dup_bigram_frac > 0.2 or r.top_word_ratio > 0.2
        )
        flagged += int(r.flagged)
    # the fixture corpus contains both clean and repetitive docs
    assert 0 < flagged < len(rows)


def test_mix_rebalance_targets(spark):
    rows = QS["corpus_mix_rebalance"](spark, SF_SMALL).collect()
    assert rows
    total = sum(r.n_before for r in rows)
    target = total / len(rows)
    for r in rows:
        assert 0 < r.n_after <= r.n_before
        # under-represented languages are kept whole
        if r.n_before <= target:
            assert r.n_after == r.n_before
        # over-represented languages land near the uniform target
        else:
            assert r.n_after < r.n_before
            assert abs(r.n_after - target) / target < 0.35


def test_quantization_error_bounded_by_half_step(spark):
    rows = QS["embedding_quantize_int8"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.amax_r > 0.0
        # mean |x - dq(x)| can never exceed half the quantization step
        half_step_x1000 = (r.amax_r / 127.0) / 2.0 * 1000.0
        assert 0.0 <= r.mean_abs_err_x1000 <= half_step_x1000 + 1e-3


def test_corpus_funnel_monotone(spark):
    rows = {
        r.stage: (r.n_docs, r.n_tokens)
        for r in QS["pipeline_corpus_funnel"](spark, SF_SMALL).collect()
    }
    stages = sorted(rows)
    assert stages == [
        "1_raw",
        "2_quality",
        "3_exact_dedup",
        "4_norm_dedup",
        "5_decontaminated",
    ]
    for a, b in zip(stages, stages[1:]):
        assert rows[b][0] <= rows[a][0], f"{b} grew vs {a}"
        assert rows[b][1] <= rows[a][1]
    # the funnel actually removes something end-to-end on this corpus
    assert rows["5_decontaminated"][0] < rows["1_raw"][0]
