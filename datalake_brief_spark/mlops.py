"""ML micro-pipeline surface (SURVEY §2.12, M1-M6).

The reference's third notebook is the canonical shape: VectorAssembler →
randomSplit → LinearRegression → evaluate (reference pyspark-3.ipynb:124-137,
219-221, 270-314), plus ml.feature.Imputer for statistical impute (reference
pyspark-2.ipynb:286-324). This engine keeps pyspark.ml (public API) but fixes
the reference's reproducibility bug: randomSplit there is unseeded
(pyspark-3.ipynb:219) — every op here REQUIRES a seed.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.ml.evaluation import RegressionEvaluator
from pyspark.ml.feature import Imputer, VectorAssembler
from pyspark.ml.regression import LinearRegression, LinearRegressionModel
from pyspark.sql import DataFrame


def impute(
    df: DataFrame,
    cols: list[str],
    strategy: str = "mean",
    suffix: str = "_imputed",
) -> DataFrame:
    """M6/N7: ml.feature.Imputer (strategy mean|median|mode, the three the
    reference's comment names at pyspark-2.ipynb cell-10). Eager fit (one agg
    job), lazy transform. For a pure-plan alternative see
    operators.nulls.impute_mean."""
    out_cols = [c + suffix for c in cols]
    model = Imputer(inputCols=cols, outputCols=out_cols, strategy=strategy).fit(df)
    return model.transform(df)


def assemble_features(
    df: DataFrame, input_cols: list[str], output_col: str = "features"
) -> DataFrame:
    """M1: VectorAssembler (reference pyspark-3.ipynb:124-137)."""
    return VectorAssembler(inputCols=input_cols, outputCol=output_col).transform(df)


def train_test_split(
    df: DataFrame, weights: tuple[float, float] = (0.75, 0.25), seed: int = 42
) -> tuple[DataFrame, DataFrame]:
    """M2 with a mandatory seed (the reference's unseeded split at
    pyspark-3.ipynb:219 makes its own golden metrics unreproducible)."""
    train, test = df.randomSplit(list(weights), seed=seed)
    return train, test


@dataclass
class RegressionResult:
    model: LinearRegressionModel
    predictions: DataFrame
    mae: float
    mse: float
    coefficients: list[float]
    intercept: float


def fit_linear_regression(
    train: DataFrame,
    test: DataFrame,
    features_col: str = "features",
    label_col: str = "label",
) -> RegressionResult:
    """M3-M5: fit, predict, evaluate (MAE/MSE as the reference reports at
    pyspark-3.ipynb:305)."""
    lr = LinearRegression(featuresCol=features_col, labelCol=label_col)
    model = lr.fit(train)
    preds = model.transform(test)
    mae = RegressionEvaluator(
        labelCol=label_col, predictionCol="prediction", metricName="mae"
    ).evaluate(preds)
    mse = RegressionEvaluator(
        labelCol=label_col, predictionCol="prediction", metricName="mse"
    ).evaluate(preds)
    return RegressionResult(
        model=model,
        predictions=preds,
        mae=mae,
        mse=mse,
        coefficients=list(model.coefficients),
        intercept=float(model.intercept),
    )
