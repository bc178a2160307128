"""Mixture resampling: fraction math (pure) + Spark composition."""

import pytest

from html_to_document_spark.operators.mixture import (
    mixture_fractions,
    resample_mixture,
)


def test_mixture_fractions_binding_source():
    counts = {"web": 1000, "books": 100, "code": 400}
    # want 50/25/25; books binds: 100/0.25 = 400 total max
    f = mixture_fractions(counts, {"web": 0.5, "books": 0.25, "code": 0.25})
    assert f["books"] == 1.0
    assert f["web"] == pytest.approx(200 / 1000)
    assert f["code"] == pytest.approx(100 / 400)


def test_mixture_fractions_drops_untargeted_and_validates():
    f = mixture_fractions({"a": 10, "junk": 99}, {"a": 1.0})
    assert f == {"a": 1.0, "junk": 0.0}
    with pytest.raises(ValueError):
        mixture_fractions({"a": 10}, {"a": 1.0, "missing": 1.0})
    with pytest.raises(ValueError):
        mixture_fractions({"a": 10}, {})


def test_resample_mixture_composition(spark):
    rows = ([(i, "web") for i in range(4000)]
            + [(i, "books") for i in range(4000, 4400)]
            + [(i, "code") for i in range(4400, 6000)])
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = resample_mixture(df, {"web": 0.5, "books": 0.25, "code": 0.25},
                           seed=7)
    got = {r["source"]: r["n"] for r in
           out.groupBy("source").count().withColumnRenamed("count", "n")
           .collect()}
    # books binds at 400 -> total ~1600: web ~800, code ~400
    assert got["books"] == 400               # fraction 1.0 is exact
    assert 700 <= got["web"] <= 900          # Bernoulli tolerance
    assert 330 <= got["code"] <= 470
    # deterministic for a fixed seed
    again = {r["source"]: r["n"] for r in
             resample_mixture(df, {"web": 0.5, "books": 0.25,
                                   "code": 0.25}, seed=7)
             .groupBy("source").count().withColumnRenamed("count", "n")
             .collect()}
    assert got == again
