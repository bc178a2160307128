"""Learned quality classifier: distributed MLlib logistic regression
over the engine's JVM-side text features, distilled back into a pure
Column expression for scoring (the same fit-distributed /
score-as-codegen pattern as ``similarity.ivf_ann_topk``'s KMeans
centroids).

Why this shape for 100 TB: training sees only the (tiny) labeled set;
scoring — the part that touches the full corpus — inlines the learned
coefficients as literals into one whole-stage-codegen projection, so
the inference pass adds ZERO shuffles, zero Python, and no model
object on the executors. The heuristic ``quality_col`` stays as the
no-labels default; this is the upgrade path once a curation team has
labels.
"""

from __future__ import annotations

import math
from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import Column, DataFrame

# feature order is the model contract (coefficients align by position)
FEATURE_NAMES = (
    "len_score", "stop_ratio", "punct_ratio", "mean_word_len",
    "digit_ratio", "upper_ratio",
)


def quality_features(c) -> dict[str, "Column"]:
    """The classifier's feature map as named Column expressions — all
    codegen'd (length/regexp/size arithmetic), no Python."""
    from pyspark.sql import functions as F

    from html_to_document_spark.operators.text_analysis import (
        _word_count,
        lang_scores,
        r4,
    )

    n_chars = F.greatest(F.length(c), F.lit(1))
    n_words = F.greatest(_word_count(c), F.lit(1))
    n_punct = F.size(F.regexp_extract_all(c, F.lit(r"[^\w\s]"), F.lit(0)))
    n_digit = F.size(F.regexp_extract_all(c, F.lit(r"[0-9]"), F.lit(0)))
    n_upper = F.size(F.regexp_extract_all(c, F.lit(r"[A-Z]"), F.lit(0)))
    return {
        "len_score": r4(F.least(n_words / F.lit(50.0), F.lit(1.0))),
        "stop_ratio": r4(lang_scores(c, "en") / n_words),
        "punct_ratio": r4(n_punct / n_chars),
        "mean_word_len": r4(F.length(F.trim(c)) / n_words),
        "digit_ratio": r4(n_digit / n_chars),
        "upper_ratio": r4(n_upper / n_chars),
    }


def train_quality_model(
    labeled: "DataFrame",
    text_col: str = "text",
    label_col: str = "label",
    reg_param: float = 0.01,
    max_iter: int = 50,
) -> dict:
    """Fit logistic regression on (text, 0/1 label) with MLlib
    (distributed over the labeled frame). Returns a plain-dict model
    ``{"coefficients": [...], "intercept": b}`` — JSON-serializable,
    version-safe, and consumable by :func:`quality_model_col` without
    any MLlib object on the scoring path."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler
    from pyspark.sql import functions as F

    feats = quality_features(F.col(text_col))
    train = labeled.select(
        F.col(label_col).cast("double").alias("label"),
        *[v.alias(k) for k, v in feats.items()],
    )
    assembled = VectorAssembler(
        inputCols=list(FEATURE_NAMES), outputCol="features"
    ).transform(train)
    lr = LogisticRegression(
        maxIter=max_iter, regParam=reg_param, standardization=True
    )
    m = lr.fit(assembled)
    return {
        "coefficients": [float(x) for x in m.coefficients],
        "intercept": float(m.intercept),
    }


def quality_model_col(model: dict, c) -> "Column":
    """P(good) as ONE Column expression: the learned coefficients are
    inlined as literals over the feature expressions — scoring the full
    corpus is a shuffle-free whole-stage-codegen projection."""
    from pyspark.sql import functions as F

    feats = quality_features(c)
    z = F.lit(model["intercept"])
    for name, w in zip(FEATURE_NAMES, model["coefficients"]):
        z = z + F.lit(w) * feats[name]
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def score_quality(
    df: "DataFrame", model: dict, text_col: str = "text"
) -> "DataFrame":
    """df + ``quality_prob`` column (pure projection)."""
    from pyspark.sql import functions as F

    return df.withColumn(
        "quality_prob", quality_model_col(model, F.col(text_col))
    )


def sigmoid(z: float) -> float:
    """Driver-side reference sigmoid (tests)."""
    return 1.0 / (1.0 + math.exp(-z))
