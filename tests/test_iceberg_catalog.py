"""Iceberg catalog integration (SURVEY §7.7 / VERDICT r2 #8): the
write_spans/read_spans pair and the resume anti-join against a REAL
Iceberg catalog table. The sandbox ships no iceberg-spark-runtime jar,
so these skip here and run wherever the jar is on the classpath (the
code path they gate is `sources/tables.py`'s catalog branch)."""

import pytest


def _iceberg_on_classpath(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


@pytest.fixture()
def iceberg_catalog(spark, tmp_path):
    if not _iceberg_on_classpath(spark):
        pytest.skip("iceberg-spark-runtime not on the classpath")
    # catalog impls resolve lazily, so runtime conf on the shared
    # session is sufficient — no session restart needed
    spark.conf.set(
        "spark.sql.catalog.it_cat", "org.apache.iceberg.spark.SparkCatalog"
    )
    spark.conf.set("spark.sql.catalog.it_cat.type", "hadoop")
    spark.conf.set(
        "spark.sql.catalog.it_cat.warehouse", str(tmp_path / "warehouse")
    )
    yield "it_cat"


def test_write_read_spans_roundtrip_iceberg(spark, iceberg_catalog):
    from pyspark.sql import functions as F

    from html_to_document_spark.sources.tables import read_spans, write_spans

    df = spark.range(100).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("doc_id"),
        (F.col("id") % 8).alias("partition_id"),
        F.lit("text").alias("kind"),
        F.concat(F.lit("body "), F.col("id")).alias("text"),
    )
    target = f"{iceberg_catalog}.db.spans_rt"
    write_spans(df, target, partition_cols=("partition_id",))
    back = read_spans(spark, target)
    assert back.count() == 100
    assert sorted(back.columns) == sorted(df.columns)
    # partition pruning reaches the scan (manifest-level predicate)
    pruned = back.filter(F.col("partition_id") == 3)
    assert pruned.count() == 100 // 8 + (1 if 3 < 100 % 8 else 0)


def test_resume_antijoin_against_iceberg(spark, iceberg_catalog):
    from pyspark.sql import functions as F

    from html_to_document_spark.operators.lineage import lineage_of
    from html_to_document_spark.sources.tables import write_spans

    docs = spark.range(64).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("doc_id"),
        (F.col("id") % 4).alias("partition_id"),
    )
    done = docs.filter(F.col("partition_id") < 2)
    target = f"{iceberg_catalog}.db.lineage_done"
    write_spans(done, target, partition_cols=("partition_id",))

    from html_to_document_spark.sources.tables import read_spans

    completed = read_spans(spark, target).select("doc_id").distinct()
    remaining = docs.join(completed, "doc_id", "left_anti")
    assert remaining.count() == 32
    assert lineage_of is not None  # module intact
