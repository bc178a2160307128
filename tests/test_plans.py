"""Physical-plan assertions: the PLANS.md audit table, executable.

These pin the scale-critical plan properties (scan pruning, filter
pushdown, broadcast joins, UDF-above-filter ordering) so a regression
in query shape fails CI, not just a manual .explain read."""

import os

import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("H2D_TEST_SF_DIR", "/root/testdata/sf0.001")


def _executed_plan(df) -> str:
    df.count()  # let AQE finalize
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted")
    )


def test_token_stats_scan_pruned(spark):
    """documents has 5+ columns; the scan must read only (doc_id, text)
    (token_stats now gates via the merged token_fingerprint row)."""
    df = entry_mod.queries()["token_fingerprint"](spark, SF_DIR)
    plan = _formatted(df)
    scan = [seg for seg in plan.split("\n\n") if "ReadSchema" in seg]
    assert scan, plan
    read_schema = [ln for ln in scan[0].splitlines() if "ReadSchema" in ln][0]
    assert "doc_id" in read_schema and "text" in read_schema
    for col in ("lang", "source", "n_chars"):
        assert col not in read_schema, read_schema


def test_pricing_summary_filter_pushdown(spark):
    df = entry_mod.queries()["pricing_summary"](spark, SF_DIR)
    plan = _formatted(df)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed and "l_shipdate" in pushed[0], pushed


def test_revenue_by_nation_broadcasts_dims(spark):
    df = entry_mod.queries()["revenue_by_nation"](spark, SF_DIR)
    plan = _executed_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # fact table never shuffled to join


def test_extraction_filter_stays_above_udf(spark):
    """Filters on UDF OUTPUT columns cannot be pushed below the opaque
    extraction stage — but scan-level pruning must still reach parquet."""
    from pyspark.sql import functions as F

    from html_to_document_spark.operators.extract_spans import (
        extract_spans_from_html,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    df = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.concat(F.lit("<p>"), F.col("text"), F.lit("</p>")).alias("html"),
    )
    out = extract_spans_from_html(df).filter(F.size("spans") > 0)
    plan = _formatted(out)
    scan = [seg for seg in plan.split("\n\n") if "ReadSchema" in seg]
    read_schema = [ln for ln in scan[0].splitlines() if "ReadSchema" in ln][0]
    assert "lang" not in read_schema  # column pruning through the UDF
    assert "MapInArrow" in plan


def test_ann_cosine_query_side_broadcast(spark):
    df = entry_mod.queries()["ann_cosine_topk"](spark, SF_DIR)
    plan = _executed_plan(df)
    assert "BroadcastNestedLoopJoin" in plan  # non-equi join, tiny side
