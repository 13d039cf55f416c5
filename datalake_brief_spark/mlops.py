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


def normalize_features(
    df: DataFrame,
    cols: list[str],
    method: str = "zscore",
    group_col: str | None = None,
    suffix: str = "_norm",
) -> DataFrame:
    """Feature normalization as pure plan expressions — the data-prep step
    before assemble_features: ``zscore`` ((x − mean)/stddev_samp, what
    ml.feature.StandardScaler(withMean=True) computes per column) or
    ``minmax`` ((x − min)/(max − min), MinMaxScaler's [0,1] default).
    ``group_col`` normalizes WITHIN groups (per-language token stats,
    per-source lengths) — something the ml scalers can't express.

    Plan shape: one (optionally keyed) aggregate for the statistics, the
    scalar row(s) broadcast back, the transform inline in the scan stage —
    two jobs, no pyspark.ml fit, no Python. Degenerate spreads (constant
    column: stddev 0 / max==min) yield NULL rather than ±inf, matching
    SQL division semantics on both engines. Equals StandardScaler /
    MinMaxScaler outputs exactly (pinned in pytest) while staying
    oracle-replayable."""
    from pyspark.sql import functions as F

    keys = [group_col] if group_col else []
    if method == "zscore":
        stats = [
            f
            for c in cols
            for f in (
                F.avg(c).alias(f"__m_{c}"),
                F.stddev_samp(c).alias(f"__s_{c}"),
            )
        ]
        exprs = {
            c: (F.col(c) - F.col(f"__m_{c}"))
            / F.when(F.col(f"__s_{c}") != 0, F.col(f"__s_{c}"))
            for c in cols
        }
    elif method == "minmax":
        stats = [
            f
            for c in cols
            for f in (F.min(c).alias(f"__m_{c}"), F.max(c).alias(f"__x_{c}"))
        ]
        exprs = {
            c: (F.col(c) - F.col(f"__m_{c}"))
            / F.when(
                F.col(f"__x_{c}") != F.col(f"__m_{c}"),
                F.col(f"__x_{c}") - F.col(f"__m_{c}"),
            )
            for c in cols
        }
    else:
        raise ValueError(f"unknown method {method!r} (zscore|minmax)")
    agg = df.groupBy(*keys).agg(*stats) if keys else df.agg(*stats)
    j = df.join(F.broadcast(agg), keys) if keys else df.crossJoin(F.broadcast(agg))
    out = j.select(
        *df.columns, *[exprs[c].alias(c + suffix) for c in cols]
    )
    return out


def target_encode(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    id_col: str,
    n_folds: int = 5,
    seed: int = 0,
    smoothing: float = 0.0,
    precision: int = 4,
) -> DataFrame:
    """Out-of-fold target encoding — replace a categorical feature with the
    mean of the target computed on the OTHER folds, the leakage-safe form
    (a row never sees its own label through its encoding; in-fold means are
    the classic target-leak that inflates validation scores).

    Folds are deterministic content-addressed buckets, ``md5(seed|id) mod
    n_folds`` — the split_by_hash contract, so fold membership is stable
    across runs/engines and the DuckDB oracle replays it. The encoding for
    (category c, fold f) is ``(sum_c − sum_{c,f}) / (cnt_c − cnt_{c,f})``,
    optionally smoothed toward the out-of-fold GLOBAL mean with weight
    ``smoothing`` (Micci-Barreca 2001's m-estimate). Categories whose rows
    all sit in one fold get the out-of-fold global mean (the unsmoothed
    ratio is 0/0 there).

    Scale shape: one partial+final aggregate keyed on (category, fold) —
    map-side combine collapses each partition to |C|·n_folds rows — then
    driver-scale arithmetic over that tiny frame; the result is the
    ENCODING TABLE (category × fold), meant to broadcast-join back onto
    the fact. No window, no per-row Python, no second scan of the data."""
    from pyspark.sql import functions as F

    fold = F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.lit(str(seed)), F.col(id_col).cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long"),
        F.lit(n_folds),
    )
    t = F.col(target_col).cast("double")
    per = (
        df.withColumn("fold", fold)
        .groupBy(cat_col, "fold")
        .agg(F.sum(t).alias("__fs"), F.count(t).alias("__fc"))
    )
    tot = per.groupBy(cat_col).agg(
        F.sum("__fs").alias("__ts"), F.sum("__fc").alias("__tc")
    )
    g = per.agg(F.sum("__fs").alias("__gs"), F.sum("__fc").alias("__gc"))
    oof_cnt = F.col("__tc") - F.col("__fc")
    oof_sum = F.col("__ts") - F.col("__fs")
    oof_global = (F.col("__gs") - F.col("__fs")) / (F.col("__gc") - F.col("__fc"))
    enc_raw = F.when(oof_cnt > 0, oof_sum / oof_cnt).otherwise(oof_global)
    enc = (
        (oof_sum + F.lit(smoothing) * oof_global)
        / (oof_cnt + F.lit(smoothing))
        if smoothing > 0
        else enc_raw
    )
    return (
        per.join(F.broadcast(tot), cat_col)
        .crossJoin(F.broadcast(g))
        .select(
            F.col(cat_col),
            F.col("fold").cast("long").alias("fold"),
            F.round(enc, precision).alias("encoding"),
            F.col("__fc").cast("long").alias("n_in_fold"),
        )
    )


def mutual_information(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    precision: int = 6,
) -> DataFrame:
    """Mutual information I(X; Y) between each categorical feature and the
    label — the model-free feature-ranking screen (a feature with MI ≈ 0
    cannot help any classifier; one with MI near H(Y) is a leak):
    I = Σ_{x,y} p(x,y) · ln(p(x,y) / (p(x)·p(y))), in nats, with the
    normalized variant I/H(Y) alongside (1.0 = label fully determined).

    Scale shape, per feature: ONE (feature, label)-keyed partial+final
    aggregate over the scan (map-side combine → |X|·|Y| rows), marginals
    re-aggregated from the joint counts (no second scan), all arithmetic
    on the contingency-sized relation. Features evaluate independently and
    union — k features = k parallel aggregates of the same cached scan."""
    from functools import reduce

    from pyspark.sql import functions as F

    outs = []
    for fc in feature_cols:
        joint = df.groupBy(
            F.col(fc).cast("string").alias("__x"),
            F.col(label_col).cast("string").alias("__y"),
        ).agg(F.count(F.lit(1)).cast("double").alias("__c"))
        mx = joint.groupBy("__x").agg(F.sum("__c").alias("__cx"))
        my = joint.groupBy("__y").agg(F.sum("__c").alias("__cy"))
        tot = joint.agg(F.sum("__c").alias("__n"))
        p_xy = F.col("__c") / F.col("__n")
        p_x = F.col("__cx") / F.col("__n")
        p_y = F.col("__cy") / F.col("__n")
        full = (
            joint.join(F.broadcast(mx), "__x")
            .join(F.broadcast(my), "__y")
            .crossJoin(F.broadcast(tot))
        )
        mi = full.agg(F.sum(p_xy * F.log(p_xy / (p_x * p_y))).alias("__mi"))
        hy = (
            my.crossJoin(F.broadcast(tot))
            .agg((-F.sum(p_y * F.log(p_y))).alias("__hy"))
        )
        outs.append(
            mi.crossJoin(F.broadcast(hy)).select(
                F.lit(fc).alias("feature"),
                F.round(F.col("__mi"), precision).alias("mi_nats"),
                F.round(F.col("__hy"), precision).alias("label_entropy"),
                F.round(
                    F.when(F.col("__hy") > 0, F.col("__mi") / F.col("__hy")),
                    precision,
                ).alias("mi_normalized"),
            )
        )
    return reduce(lambda a, b: a.unionByName(b), outs)


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


def one_hot(
    df: DataFrame,
    cat_col: str,
    categories: list[str] | None = None,
    prefix: str | None = None,
) -> DataFrame:
    """One-hot encode a categorical column into 0/1 integer columns —
    StringIndexer+OneHotEncoder semantics but with a DETERMINISTIC
    category order (explicit ``categories`` list, else sorted distinct
    values — StringIndexer's frequency order reshuffles column meaning
    when the data drifts, which poisons any model trained on yesterday's
    encoding). Unseen/NULL categories encode as all-zeros (the
    handleInvalid='keep' dummy drops out because every column is
    explicit). The distinct scan is one partial-aggregated shuffle over
    the (small) category set; the encoding itself is pure scan-stage
    CASE expressions — no fit object, no UDF, replayable by any SQL
    engine."""
    from pyspark.sql import functions as F

    if categories is None:
        categories = sorted(
            r[0] for r in df.select(cat_col).distinct().collect() if r[0] is not None
        )
    pfx = f"{prefix or cat_col}_"
    return df.select(
        *df.columns,
        *[
            F.coalesce((F.col(cat_col) == F.lit(c)).cast("int"), F.lit(0)).alias(
                f"{pfx}{c}"
            )
            for c in categories
        ],
    )


def classification_report(
    df: DataFrame,
    pred_col: str,
    label_col: str,
    precision: int = 6,
) -> DataFrame:
    """Binary-classifier evaluation in ONE partial-aggregated pass:
    confusion counts (tp/fp/fn/tn) as conditional sums over the scan,
    then precision/recall/F1/accuracy derived on the single result row —
    no per-class shuffle, no collect, so it costs one reduction at any
    corpus size. Degenerate slices (no predicted positives / no actual
    positives) yield NULL metrics rather than division blow-ups, matching
    SQL division semantics on any engine. ``pred_col`` and ``label_col``
    are boolean columns; build them from your model output upstream."""
    from pyspark.sql import functions as F

    p = F.col(pred_col).cast("boolean")
    y = F.col(label_col).cast("boolean")
    agg = df.agg(
        F.sum((p & y).cast("long")).alias("tp"),
        F.sum((p & ~y).cast("long")).alias("fp"),
        F.sum((~p & y).cast("long")).alias("fn"),
        F.sum((~p & ~y).cast("long")).alias("tn"),
    )
    tp, fp, fn, tn = (F.col(c) for c in ("tp", "fp", "fn", "tn"))
    prec = tp / F.when((tp + fp) > 0, tp + fp)
    rec = tp / F.when((tp + fn) > 0, tp + fn)
    f1 = 2 * prec * rec / F.when((prec + rec) > 0, prec + rec)
    acc = (tp + tn) / F.when((tp + fp + fn + tn) > 0, tp + fp + fn + tn)
    return agg.select(
        "tp",
        "fp",
        "fn",
        "tn",
        F.round(prec, precision).alias("precision"),
        F.round(rec, precision).alias("recall"),
        F.round(f1, precision).alias("f1"),
        F.round(acc, precision).alias("accuracy"),
    )


def auc_score(
    df: DataFrame,
    score_col: str,
    label_col: str,
    precision: int = 6,
) -> DataFrame:
    """Exact ROC-AUC via the Mann-Whitney rank statistic:
    AUC = (Σ midranks of positives − n_pos(n_pos+1)/2) / (n_pos·n_neg),
    with MIDRANKS for score ties (the standard tie correction — min- or
    max-ranks bias AUC under heavy ties). Midrank = min_rank +
    (ties−1)/2 comes from one global sort window plus a per-score-value
    count, so the whole statistic is exact integer arithmetic over one
    sort and two aggregates — no sampling, no trapezoid approximation,
    and any engine replays it bit-for-bit. Degenerate slices (no
    positives or no negatives) yield NULL. The global sort is the cost —
    at corpus scale pre-aggregate by distinct score first (the rank only
    depends on the score value): ranks derive from the DISTINCT-SCORE
    spectrum, rows never globally sort. For CONTINUOUS double scores
    |distinct| ≈ |rows|, so the spectrum itself is data-scale — its
    prefix count therefore runs as a 256-bin two-phase cumsum
    (windows.binned_prefix_sums: per-bin partitioned prefixes + a
    driver-scale bin-offset cumsum broadcast back), never an
    Exchange-SinglePartition window (VERDICT r7 ask #4)."""
    from pyspark.sql import functions as F

    from .operators.windows import binned_prefix_sums

    y = F.col(label_col).cast("boolean")
    spec = df.groupBy(F.col(score_col).alias("__s")).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(y.cast("long")).alias("__np"),
    )
    # spectrum keys are distinct by construction (groupBy), so the order
    # is unique without a tiebreak; min_rank = exclusive prefix count + 1
    ranked = binned_prefix_sums(spec, "__s", {"__pre_n": F.col("__n")}).select(
        "__n",
        "__np",
        (F.col("__pre_n") + 1).alias("__min_rank"),
    )
    # midrank of every row at this score = min_rank + (n-1)/2; positives
    # at this score contribute np * midrank to the rank sum.
    mid = F.col("__min_rank") + (F.col("__n") - 1) / 2.0
    agg = ranked.agg(
        F.sum(F.col("__np") * mid).alias("__rank_sum"),
        F.sum("__np").cast("long").alias("n_pos"),
        (F.sum("__n") - F.sum("__np")).cast("long").alias("n_neg"),
    )
    auc = (
        F.col("__rank_sum")
        - F.col("n_pos") * (F.col("n_pos") + 1) / 2.0
    ) / F.when(
        (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
        F.col("n_pos").cast("double") * F.col("n_neg"),
    )
    return agg.select(
        "n_pos", "n_neg", F.round(auc, precision).alias("auc")
    )


def calibration_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
    precision: int = 6,
) -> DataFrame:
    """Reliability-curve bins: scores in [0,1] bucketed into ``n_bins``
    equal-width bins → per bin (n, mean predicted score, observed
    positive rate). A calibrated model tracks the diagonal; the gap is
    what temperature scaling fixes. One partial-aggregated shuffle on
    the tiny bin key; the bin edge convention (floor(s·n), score 1.0
    clamped into the last bin) is explicit so any engine replays it.
    mean_score rounds at ``precision`` (sum order differs across
    engines at the last ulp); positive_rate is an exact count ratio."""
    from pyspark.sql import functions as F

    s = F.col(score_col).cast("double")
    b = F.least(
        F.floor(s * n_bins).cast("long"), F.lit(n_bins - 1).cast("long")
    )
    y = F.col(label_col).cast("boolean").cast("long")
    return (
        df.select(b.alias("bin"), s.alias("__s"), y.alias("__y"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.avg("__s"), precision).alias("mean_score"),
            F.round(F.sum("__y") / F.count(F.lit(1)), precision).alias(
                "positive_rate"
            ),
        )
    )
