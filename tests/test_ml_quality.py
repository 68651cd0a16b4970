"""Model-quality floors for the MLlib workflows (the archetype's
headline metrics: ALS RMSE, sentiment accuracy)."""

from __future__ import annotations

from pyspark.sql import functions as F

from movierecommender_sentimentanalysissytem_spark import registry
from tests.conftest import SF_SMALL

QS = registry.queries()


def test_als_recommendations_shape(spark):
    recs = QS["ml_als_recommend"](spark, SF_SMALL)
    per_user = recs.groupBy("user").count().agg(F.min("count"), F.max("count")).collect()[0]
    assert per_user[0] == per_user[1] == 5  # exactly 5 recs per user


def test_als_model_rmse_reasonable(spark):
    """ALS must beat the global-mean predictor on its own training data
    (rank-8 factorization vs a single constant — a low bar that catches
    broken wiring, seeds, or degenerate convergence)."""
    from pyspark.ml.recommendation import ALS

    from movierecommender_sentimentanalysissytem_spark.ml.pipelines import _ratings

    ratings = _ratings(spark, SF_SMALL)
    als = ALS(rank=8, maxIter=5, regParam=0.1, seed=42, userCol="user",
              itemCol="item", ratingCol="rating", coldStartStrategy="drop")
    pred = als.fit(ratings).transform(ratings)
    err = pred.select(
        F.pow(F.col("rating") - F.col("prediction"), 2).alias("se"),
        F.pow(F.col("rating") - F.avg("rating").over(__import__("pyspark").sql.window.Window.partitionBy()), 2).alias("se_mean"),
    ).agg(F.sqrt(F.avg("se")).alias("rmse"), F.sqrt(F.avg("se_mean")).alias("rmse_mean")).collect()[0]
    assert err.rmse < err.rmse_mean, (err.rmse, err.rmse_mean)


def test_sentiment_pipeline_beats_chance(spark):
    preds = QS["ml_sentiment_pipeline"](spark, SF_SMALL)
    acc = preds.agg(
        F.avg((F.col("label") == F.col("prediction")).cast("double"))
    ).collect()[0][0]
    # binary task on training data with TF-IDF features — should be
    # well above the majority-class floor
    assert acc > 0.6, acc
