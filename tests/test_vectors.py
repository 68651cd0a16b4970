"""Similarity-search quality assertions (SURVEY.md §5.3)."""

from __future__ import annotations

import os

import pytest

from movierecommender_sentimentanalysissytem_spark import registry
from tests.conftest import SF_ORACLE, SF_SMALL, SF_TENTH

QS = registry.queries()


# Heavyweight evidence tier: quality sweeps / scaled corpora /
# multi-second Spark jobs. Fast iteration path: pytest -m "not slow".
pytestmark = pytest.mark.slow


def _pairs(df, ca, cb):
    return {(r[ca], r[cb]) for r in df.collect()}


def test_lsh_recall_against_brute_force(spark):
    """Floor at three corpus sizes INCLUDING sf0.1 — the scale where
    round 6 measured the decay class this test exists to catch
    (0.985 LSH recall at sf0.1; the IVF sibling had silently decayed
    0.97 → 0.77 there under a fixed shape)."""
    for sf_dir in (SF_SMALL, SF_ORACLE, SF_TENTH):
        exact = _pairs(
            QS["sim_threshold_join"](spark, sf_dir), "vec_a", "vec_b"
        )
        approx = _pairs(
            QS["sim_threshold_join_lsh"](spark, sf_dir), "vec_a", "vec_b"
        )
        if exact:
            recall = len(exact & approx) / len(exact)
            assert recall >= 0.9, f"LSH recall {recall:.2f} < 0.9 @ {sf_dir}"


import pytest


@pytest.mark.parametrize("sf_dir", [SF_SMALL, SF_ORACLE, SF_TENTH])
def test_ivf_topk_overlaps_brute_force(spark, sf_dir):
    """recall@3 of the IVF path vs the exact brute-force top-3.

    IVF sizes itself k ≈ sqrt(n) cells, probing IVF_PROBE_FRAC of
    them (round-6 recall audit: measured 0.93-0.97 at sf0.001 AND
    sf0.1); the floor pins ≥ 0.9 AT THREE CORPUS SIZES — sf0.1 is
    where the scale-decay class round 6 caught lives (0.97 at
    sf0.001 silently became 0.77 at sf0.1 under a fixed k=8 shape),
    so the exact regression regime is in CI, not just the small
    fixtures."""
    exact = QS["sim_topk_neighbors"](spark, sf_dir).collect()
    ivf = QS["sim_topk_ivf"](spark, sf_dir).collect()
    exact_top = {(r.query_id, r.neighbor_id) for r in exact}
    ivf_top = {(r.query_id, r.neighbor_id) for r in ivf}
    recall = len(exact_top & ivf_top) / len(exact_top)
    assert recall >= 0.9, f"IVF recall {recall:.2f} < 0.9"


def test_cosine_kernel_self_similarity(spark):
    """cos(v, v) must be exactly 1.0 (up to the stable rounding)."""
    from pyspark.sql import functions as F

    from movierecommender_sentimentanalysissytem_spark.functions.vector import (
        _cos_expr,
    )
    from movierecommender_sentimentanalysissytem_spark.sources.tables import table

    e = table(spark, SF_SMALL, "embeddings").limit(20)
    df = e.select(
        F.col("embedding").alias("a"), F.col("embedding").alias("b")
    ).select(_cos_expr().alias("c"))
    for r in df.collect():
        assert abs(r.c - 1.0) < 1e-12


def test_ivf_shape_scaling():
    """k ≈ √n bounded below at 8; nprobe = ceil(0.375·k) bounded below
    at 4 and above at k — the adaptive sizing that holds the recall
    floor across corpus sizes (a fixed shape decays, round-6 audit)."""
    from movierecommender_sentimentanalysissytem_spark.functions.vector import (
        _ivf_shape,
    )

    assert _ivf_shape(0) == (8, 4)
    assert _ivf_shape(1) == (8, 4)
    assert _ivf_shape(100) == (10, 4)
    k, npr = _ivf_shape(2000)
    assert k == 44 and npr == 17
    k, npr = _ivf_shape(10**9)
    assert k == 31622 and npr == 11859
    for n in (0, 5, 63, 64, 65, 10**6):
        k, npr = _ivf_shape(n)
        assert 4 <= npr <= k


def test_ivf_recall_on_clustered_corpus(spark, tmp_path_factory):
    """Recall floor in the CLUSTERED regime. The shipped fixtures are
    near-isotropic (ANN's worst case — recall tracks probed fraction),
    so every floor above exercises only that regime; a corpus of a few
    tight clusters pins the complementary one, where the quantizer
    should trivially co-locate true neighbors and recall should be
    near-perfect. Future knob changes (e.g. shrinking nprobe because
    isotropic recall allows it) must not silently break the easy
    regime — this is the cheap insurance round 6's audit asked for.

    Fixture: 400 unit vectors in 64-dim, 8 tight clusters (seeded
    center + N(0, 0.08) noise, re-normalized); queries 0-9 span all 8
    clusters, so each query's true top-3 live in its own cluster."""
    import numpy as np

    rng = np.random.default_rng(7)
    centers = rng.normal(size=(8, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for vid in range(400):
        c = vid % 8
        v = centers[c] + rng.normal(scale=0.08, size=64)
        v /= np.linalg.norm(v)
        rows.append((vid, [float(x) for x in v], c))
    out = str(tmp_path_factory.mktemp("ivf_clustered"))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")

    exact = {
        (r.query_id, r.neighbor_id)
        for r in QS["sim_topk_neighbors"](spark, out).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in QS["sim_topk_ivf"](spark, out).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"clustered-corpus IVF recall {recall:.2f} < 0.9"


def test_ivf_survives_zero_vectors(spark, tmp_path_factory):
    """A zero vector (norm 0) must not NaN-poison the spherical
    quantizer: it keeps raw coordinates instead of dividing by zero,
    and every non-zero vector still gets ranked neighbors."""
    import pyspark.sql.functions as F

    out = str(tmp_path_factory.mktemp("ivf_zero"))
    rows = []
    for vid in range(20):
        if vid == 3:
            vec = [0.0] * 64  # the poison row
        else:
            vec = [0.0] * 64
            vec[vid % 8] = 1.0
            vec[(vid + 1) % 8] = 0.5
        rows.append((vid, [float(x) for x in vec], vid % 2))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")

    got = QS["sim_topk_ivf"](spark, out).collect()
    assert got, "IVF returned nothing on a corpus containing a zero vector"
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append(r)
        assert r.cos_sim == r.cos_sim or r.query_id == 3  # no NaN except vs zero
    # every non-zero query (vec_id < 10) has neighbors
    assert set(by_q) >= {0, 1, 2, 4, 5}


def test_ivf_empty_query_batch_degrades_gracefully(spark, tmp_path_factory):
    """Companion to the empty-CORPUS exclusion documented in
    tests/test_empty_inputs.py (KMeans on zero rows is a defined MLlib
    error): an empty QUERY batch must flow through the same plans to an
    EMPTY result with no crash. Corpus of 20 well-formed vectors whose
    vec_ids all exceed the 10-query cutoff — the quantizer fits, the
    inverted lists build, the probe relation is empty, and the top-k
    window over zero candidates returns zero rows."""
    out = str(tmp_path_factory.mktemp("ivf_noquery"))
    rows = []
    for vid in range(20):
        vec = [0.0] * 64
        vec[vid % 8] = 1.0
        rows.append((100 + vid, [float(x) for x in vec], vid % 2))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    assert QS["sim_topk_ivf"](spark, out).count() == 0


@pytest.mark.parametrize("sf_dir", [SF_SMALL, SF_ORACLE, SF_TENTH])
def test_embedding_dim_matches_shared_constant(spark, sf_dir):
    """Pin the fixture invariant behind EMBEDDING_DIM (round-7 advice):
    the Spark kernels fold over the actual arrays while the DuckDB
    oracle mirrors index ``range(1, EMBEDDING_DIM + 1)`` derived from
    the shared constant in sources/tables.py — this test is what makes
    a fixture-dimensionality change loud instead of a silent
    engine/oracle desync. Checks min == max == EMBEDDING_DIM so a
    single ragged row also fails."""
    import pyspark.sql.functions as F

    from movierecommender_sentimentanalysissytem_spark.sources.tables import (
        EMBEDDING_DIM,
        table,
    )

    row = (
        table(spark, sf_dir, "embeddings")
        .agg(
            F.min(F.size("embedding")).alias("lo"),
            F.max(F.size("embedding")).alias("hi"),
        )
        .collect()[0]
    )
    assert row.lo == row.hi == EMBEDDING_DIM, (
        f"embeddings.embedding dims [{row.lo}, {row.hi}] @ {sf_dir} "
        f"!= shared EMBEDDING_DIM {EMBEDDING_DIM}"
    )


def test_ivf_partitioned_matches_in_memory(spark):
    """sim_topk_ivf_partitioned is the same index + probe + exact-rank
    pipeline with the inverted lists round-tripped through a
    cell-partitioned parquet layout — so its output must be IDENTICAL
    (ids, rounded cosines, ranks) to sim_topk_ivf restricted to the
    same 2-query batch. This identity is the rows-only key's
    correctness gate; the parquet float round-trip is exact (array of
    fp32 written/read bit-identically, kernels widen to fp64 the same
    way on both paths)."""
    part = {
        (r.query_id, r.neighbor_id, r.cos_sim, r.rn)
        for r in QS["sim_topk_ivf_partitioned"](spark, SF_ORACLE).collect()
    }
    mem = {
        (r.query_id, r.neighbor_id, r.cos_sim, r.rn)
        for r in QS["sim_topk_ivf"](spark, SF_ORACLE).collect()
        if r.query_id < 2
    }
    assert part and part == mem


def test_ivf_partitioned_probes_fewer_cells_than_total(spark):
    """Partition pruning must have something to prune: the 2-query
    probe batch's distinct cell set must be strictly smaller than the
    written partition count (= total cells), i.e. the dynamicpruning
    expression pinned in tests/test_plans.py genuinely skips
    directories rather than vacuously selecting all of them."""
    from pyspark.sql import functions as F

    from movierecommender_sentimentanalysissytem_spark.functions.vector import (
        _ivf_index,
    )

    e, assigned, nearest_cells, nprobe = _ivf_index(spark, SF_ORACLE)
    probed = (
        e.filter(F.col("vec_id") < 2)
        .select(F.explode(nearest_cells("vn", nprobe)["cell"]).alias("cell"))
        .distinct()
        .count()
    )
    total = assigned.select("cell").distinct().count()
    assert probed < total, f"probes cover all {total} cells — nothing pruned"


def test_pandas_centroid_kernel_matches_literal_kernel(spark):
    """The extreme-k nearest-cell path (_nearest_cells_pandas: centers
    as a broadcast numpy matrix scored by GEMM inside an Arrow batch)
    must assign every corpus vector to exactly the same top-N cells,
    in the same order, as the literal-struct-array kernel the plans
    embed below ~10^4 cells. Same fitted quantizer on both sides
    (centers exposed on the kernel), N = IVF_NASSIGN and nprobe — the
    two widths the IVF keys actually use. Boundary-float caveat is in
    the kernel docstring; fixture margins are ~1e-2, so the comparison
    is exact and deterministic here."""
    from pyspark.sql import functions as F

    from movierecommender_sentimentanalysissytem_spark.functions.vector import (
        _ivf_index,
        _nearest_cells_pandas,
    )

    e, assigned, nearest_cells, nprobe = _ivf_index(spark, SF_ORACLE)
    for top in (2, nprobe):
        lit = {
            r.vec_id: list(r.cells)
            for r in e.select(
                "vec_id", nearest_cells("vn", top)["cell"].alias("cells")
            ).collect()
        }
        pdk = _nearest_cells_pandas(spark, nearest_cells.centers, top)
        pd_ = {
            r.vec_id: list(r.cells)
            for r in e.select("vec_id", pdk("vn").alias("cells")).collect()
        }
        assert pd_ == lit and len(lit) > 0


def test_lsh_bucket_geometry_bounds_join_volume(spark):
    """Regression pin for the round-8 bucket retune, in the metric that
    actually drives the join cost. On 12 OR-ed hash tables over a
    near-isotropic corpus the DISTINCT candidate union is ~95% of all
    pairs under ANY sane width (measured 94.5% at 0.1 vs 99.96% at
    0.5 — useless as a regression signal); what the retune improved is
    the JOIN VOLUME: Σ_buckets |bucket|²/2 per table, the number of
    (pair, table) rows the collision join materializes. A unit vector's
    projection spread is ≈ 1/√dim, so width 0.8/√dim keeps the
    per-table collision fraction ≈ 0.8/(2√π) ≈ 0.22 (measured 0.216),
    while the old 0.5 ≈ 4σ width collapses each table into 2-3 buckets
    at ≈ 0.50 (measured 0.499) — 2.3x the join work, the measured
    101 → 55 s at the 10x smoke corpus. Bounds sit between the two
    regimes so a drift back toward degenerate geometry goes red here
    instead of resurfacing as a wall-clock mystery."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH, Normalizer
    from pyspark.ml.functions import array_to_vector, vector_to_array
    from pyspark.sql import functions as F

    from movierecommender_sentimentanalysissytem_spark.functions.vector import (
        LSH_BUCKET_LENGTH,
        LSH_NUM_HASH_TABLES,
    )
    from movierecommender_sentimentanalysissytem_spark.sources.tables import table

    emb = table(spark, SF_SMALL, "embeddings").select(
        "vec_id",
        array_to_vector(F.col("embedding").cast("array<double>")).alias("v"),
    )
    unit = Normalizer(inputCol="v", outputCol="unit", p=2.0).transform(emb)
    n = unit.count()
    all_pairs = n * (n - 1) / 2

    def per_table_collision_fraction(bucket_length: float) -> float:
        model = BucketedRandomProjectionLSH(
            inputCol="unit",
            outputCol="hashes",
            bucketLength=bucket_length,
            numHashTables=LSH_NUM_HASH_TABLES,
            seed=42,
        ).fit(unit)
        buckets = (
            model.transform(unit)
            .select("vec_id", F.posexplode("hashes").alias("t", "bv"))
            .select("t", vector_to_array(F.col("bv"))[0].alias("b"))
            .groupBy("t", "b")
            .count()
        )
        volume = buckets.agg(
            F.sum(F.expr("count * (count - 1) / 2")).alias("s")
        ).collect()[0].s
        return volume / all_pairs / LSH_NUM_HASH_TABLES

    shipped = per_table_collision_fraction(LSH_BUCKET_LENGTH)
    assert shipped <= 0.30, (
        f"shipped LSH geometry does {shipped:.2f} of brute-force work per "
        f"table (expected ≈ 0.22) — bucket width has degenerated"
    )
    # Teeth check: the pre-retune width must violate the same bound,
    # proving the assertion distinguishes the regimes. Fitting and
    # fully transforming a SECOND LSH model roughly doubles this
    # already-expensive test, so the control runs only when opted in
    # (MRSAS_SLOW=1); the last measured value is pinned here — 0.499
    # at width 0.5 on the sf0.001 fixture (seed 42), vs the 0.40
    # bound — so the per-run assertion above keeps its calibration
    # without paying the second fit every suite run (r9 ADVICE).
    if os.environ.get("MRSAS_SLOW") == "1":
        degenerate = per_table_collision_fraction(0.5)
        assert degenerate >= 0.40, (
            f"degenerate-width control measured {degenerate:.2f} — the "
            f"bound no longer separates the regimes, re-derive it"
        )


def test_ivf_probe_sweep_curve(spark):
    """The probe sweep must behave like a tuning curve: candidate
    volume strictly grows with probe width, recall is non-decreasing,
    and the default width (flagged is_default) meets the same ≥ 0.9
    floor sim_topk_ivf is held to. This is the quality gate for the
    rows-only sweep key."""
    rows = sorted(
        QS["sim_topk_ivf_probe_sweep"](spark, SF_ORACLE).collect(),
        key=lambda r: r.nprobe,
    )
    assert len(rows) >= 3
    cands = [r.n_candidates for r in rows]
    recalls = [r.recall_at_3 for r in rows]
    assert cands == sorted(cands) and cands[0] < cands[-1]
    assert all(b >= a - 1e-9 for a, b in zip(recalls, recalls[1:])), recalls
    default = [r for r in rows if r.is_default]
    assert len(default) == 1 and default[0].recall_at_3 >= 0.9
