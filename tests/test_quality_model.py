"""Learned quality classifier: MLlib fit -> codegen projection score."""

import random

from pyspark.sql import functions as F

from html_to_document_spark.operators.quality_model import (
    score_quality,
    train_quality_model,
)


def _labeled(spark, n=400, seed=3):
    """Separable synthetic labels: 'good' docs are English-ish prose,
    'bad' docs are punctuation/digit soup."""
    rng = random.Random(seed)
    good_words = ("the and for with this that from have text page "
                  "world data clear words about").split()
    rows = []
    for i in range(n):
        if i % 2 == 0:
            text = " ".join(rng.choices(good_words, k=rng.randint(25, 60)))
            rows.append((f"g{i}", text, 1))
        else:
            junk = "".join(rng.choices("0123456789!@#$%^&*()[]{};:", k=80))
            rows.append((f"b{i}", junk + " zz qq", 0))
    return spark.createDataFrame(rows, "doc_id string, text string, label int")


def test_train_and_score_separates(spark):
    labeled = _labeled(spark)
    model = train_quality_model(labeled)
    assert len(model["coefficients"]) == 6
    scored = score_quality(labeled, model)
    rows = scored.select("doc_id", "label", "quality_prob").collect()
    good = [r.quality_prob for r in rows if r.label == 1]
    bad = [r.quality_prob for r in rows if r.label == 0]
    # separable by construction: the learned model must separate it
    assert min(good) > max(bad)
    acc = sum((p > 0.5) == bool(lbl) for p, lbl in
              [(r.quality_prob, r.label) for r in rows]) / len(rows)
    assert acc > 0.97


def test_scoring_is_pure_projection(spark):
    labeled = _labeled(spark, n=60)
    model = train_quality_model(labeled)
    out = score_quality(labeled.select("doc_id", "text"), model)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan        # zero shuffles
    assert "BatchEvalPython" not in plan  # zero Python on scoring
    assert "ArrowEvalPython" not in plan


def test_model_is_plain_json(spark):
    import json

    model = train_quality_model(_labeled(spark, n=60))
    # survives JSON round-trip (ship it in a config, not a pickle)
    m2 = json.loads(json.dumps(model))
    a = score_quality(_labeled(spark, n=20), model).collect()
    b = score_quality(_labeled(spark, n=20), m2).collect()
    assert a == b
