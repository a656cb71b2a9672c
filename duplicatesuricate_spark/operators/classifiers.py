"""Match/no-match classifiers over similarity tables (reference A14).

The reference ships four models (duplicatesuricate/classifiers.py): sklearn
RandomForest (default, 500 trees, classifiers.py:196-315), a Spark ML RF
pipeline sketched at classifiers.py:65-193 (VectorAssembler +
RandomForestClassifier, per-row proba-extraction UDF at 156-157), a
rule-based scorer (351-417) and a dummy (318-348).  Here the Spark ML path
is implemented properly — the probability column is unpacked with
``vector_to_array`` (a built-in, not the reference's per-row UDF) — and the
rule-based path lives in ``linkage.rule_score``.  No sklearn: the driver-
side model would not survive a 10^12-pair inference anyway.

The dedup acceptance path deliberately does NOT use ML (north rule pins a
deterministic Jaccard/Hamming decision); this module exists for the
record-linkage API surface and training workflows (A24).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class SparkRFClassifier:
    """RandomForest over score columns; mirrors the intended semantics of
    the reference's MLSparkModel (fillna(0) -> assemble -> RF -> positive-
    class probability, threshold 0.5 at classifiers.py:23)."""

    def __init__(self, score_cols: list[str], n_trees: int = 50,
                 threshold: float = 0.5, seed: int = 42):
        self.score_cols = list(score_cols)
        self.n_trees = n_trees
        self.threshold = threshold
        self.seed = seed
        self.model = None

    def _prep(self, df: DataFrame) -> DataFrame:
        return df.fillna(0.0, subset=self.score_cols)

    def fit(self, scored: DataFrame, label_col: str = "y_true") -> "SparkRFClassifier":
        from pyspark.ml import Pipeline
        from pyspark.ml.classification import RandomForestClassifier
        from pyspark.ml.feature import VectorAssembler

        pipe = Pipeline(stages=[
            VectorAssembler(inputCols=self.score_cols, outputCol="features"),
            RandomForestClassifier(
                featuresCol="features",
                labelCol=label_col,
                numTrees=self.n_trees,
                seed=self.seed,
            ),
        ])
        self.model = pipe.fit(self._prep(scored))
        return self

    def predict_proba(self, scored: DataFrame) -> DataFrame:
        """Adds ``y_proba`` = P(match); vector unpacked JVM-side."""
        from pyspark.ml.functions import vector_to_array

        if self.model is None:
            raise RuntimeError("fit() first")
        out = self.model.transform(self._prep(scored))
        return out.withColumn(
            "y_proba", vector_to_array(F.col("probability")).getItem(1)
        ).drop("features", "rawPrediction", "probability", "prediction")

    def predict(self, scored: DataFrame) -> DataFrame:
        return self.predict_proba(scored).where(
            F.col("y_proba") > F.lit(self.threshold)
        )


class DummyClassifier:
    """Reference's dummy model (classifiers.py:318-348): deterministic
    pseudo-random proba here (seeded hash, not RNG) so tests are stable."""

    def __init__(self, score_cols: list[str] | None = None, seed: int = 42):
        self.seed = seed

    def fit(self, scored: DataFrame, label_col: str = "y_true") -> "DummyClassifier":
        return self

    def predict_proba(self, scored: DataFrame) -> DataFrame:
        h = F.pmod(F.xxhash64("id_a", "id_b", F.lit(self.seed)), F.lit(1_000_000))
        return scored.withColumn("y_proba", h / F.lit(1_000_000.0))
