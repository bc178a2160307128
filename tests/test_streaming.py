"""Streaming extraction: file source -> mapInPandas -> foreachBatch
sink with lineage; availableNow drain must match the batch path."""

from pyspark.sql import functions as F

from html_to_document_spark.operators.extract_spans import extract_spans
from html_to_document_spark.sources.synthetic import generate_corpus
from html_to_document_spark.streaming.stream import run_stream


def test_stream_matches_batch(spark, tmp_path):
    in_path = str(tmp_path / "in")
    out_path = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    lineage = str(tmp_path / "lineage")

    corpus = generate_corpus(spark, 40, seed=5, giant_frac=0.0)
    corpus.write.parquet(in_path)

    run_stream(spark, in_path, out_path, ckpt, lineage_path=lineage)

    streamed = spark.read.parquet(out_path)
    batch = extract_spans(spark.read.parquet(in_path))
    assert streamed.count() == 40
    diff = (
        streamed.select("doc_id", F.to_json("spans").alias("j"))
        .exceptAll(batch.select("doc_id", F.to_json("spans").alias("j")))
        .count()
    )
    assert diff == 0
    lin = spark.read.parquet(lineage)
    assert lin.agg(F.sum("input_count")).first()[0] == 40
