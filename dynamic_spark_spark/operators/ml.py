"""MLlib train/predict (SURVEY.md §2.B B17).

Reference evidence: NaiveBayes train + predict + accuracy in the PySpark
program doc (``docs/PySparkProgram-sparkprogram.md:37-42``, model save
``:45``). Native mapping: a ``pyspark.ml`` pipeline over the embeddings
table. Rows-only check (iterative optimizers are not SQL-expressible).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dynamic_spark_spark.registry import query
from dynamic_spark_spark.sources.readers import load_table


@query("ml_train_predict", tag="ml")  # rows-only: iterative fit
def ml_train_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a multinomial logistic regression on the embedding vectors to
    predict ``label``, score the same table, and report per-label accuracy.
    The fit is distributed (LBFGS over partitioned gradients); scoring is a
    map-only pass — both scale linearly with the corpus."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector

    e = load_table(spark, sf_dir, "embeddings")
    data = e.select(
        "vec_id",
        F.col("label").cast("double").alias("label"),
        array_to_vector(F.col("embedding").cast("array<double>")).alias("features"),
    )
    model = LogisticRegression(maxIter=20, regParam=0.01).fit(data)
    scored = model.transform(data)
    return (
        scored.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("prediction") == F.col("label")).cast("long")).alias("n_correct"),
        )
        .withColumn("accuracy", F.round(F.col("n_correct") / F.col("n"), 4))
    )


@query("ml_kmeans_cluster", tag="ml")  # rows-only: iterative fit
def ml_kmeans_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed k-means over the embedding vectors (seeded, k=10) —
    the MLlib counterpart of the declarative IVF coarse quantizer in
    ``llmops.similarity.sim_topk_ivf``; at 100 TB this is the trainer that
    produces the cell centroids (fit on a sample, assign map-only)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    e = load_table(spark, sf_dir, "embeddings")
    data = e.select(
        "vec_id",
        "label",
        array_to_vector(F.col("embedding").cast("array<double>")).alias("features"),
    )
    model = KMeans(k=10, seed=42, maxIter=10).fit(data)
    return (
        model.transform(data)
        .groupBy("prediction")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.countDistinct("label").alias("n_labels"),
        )
    )
