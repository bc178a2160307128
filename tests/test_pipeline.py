"""End-to-end training pipeline: extraction -> filters -> dedup chain
over synthetic interleaved docs with planted exact and near duplicates."""

from pyspark.sql import functions as F

from html_to_document_spark.plans.pipeline import build_training_pipeline
from html_to_document_spark.sources.synthetic import generate_corpus


def test_pipeline_end_to_end(spark):
    base = generate_corpus(spark, 80, seed=13, giant_frac=0.0)
    # plant exact duplicates (same spans, higher ids)
    dups = base.filter(F.col("doc_id") < "doc-000000000010").select(
        F.concat(F.lit("dup-"), "doc_id").alias("doc_id"), "spans"
    )
    docs = base.unionByName(dups)

    out = build_training_pipeline(
        docs, num_partitions=4, min_quality=0.0, near_dup_threshold=0.95
    ).cache()
    rows = out.collect()

    assert 0 < len(rows) <= 80  # planted dups removed, filters applied
    ids = {r.doc_id for r in rows}
    texts = [r.text for r in rows]
    # exact dups: keeper is the min id ("doc-..." < "dup-...")
    assert not any(i.startswith("dup-") for i in ids)
    assert len(set(texts)) == len(texts)  # no exact duplicates survive
    for r in rows:
        assert r.lang_pred in ("en", "es", "fr", "de")
        assert r.quality >= 0.0
        assert len(r.spans) > 0
