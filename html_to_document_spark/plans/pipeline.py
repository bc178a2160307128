"""End-to-end training-data pipeline composition.

``build_training_pipeline`` chains the engine's operators into the
job the task brief envisions at 10^12 docs:

    interleaved docs -> span extraction (skew-balanced)
      -> per-doc text assembly (JVM)
      -> language ID filter -> quality filter
      -> exact dedup -> MinHash-LSH near-dup removal
      -> (doc_id, text, lang_pred, quality, spans) corpus

Every stage is a DataFrame transformation; the only Python is the
extraction UDF. Filters are plain expressions BEFORE wide ops so
Catalyst prunes early; dedup shuffles on 8-byte digests; near-dup
removal drops the higher-id side of each LSH pair via a left-anti join.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from html_to_document_spark.core.extract import DEFAULT_OPTIONS, ExtractOptions
from html_to_document_spark.operators.dedup import exact_dedup, minhash_lsh_pairs
from html_to_document_spark.operators.extract_spans import (
    extract_spans_balanced,
)
from html_to_document_spark.operators.text_analysis import lang_id, quality_score

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame


def build_training_pipeline(
    docs: "DataFrame",
    options: ExtractOptions = DEFAULT_OPTIONS,
    *,
    num_partitions: int = 64,
    keep_langs: tuple = ("en", "es", "fr", "de"),
    min_quality: float = 0.3,
    near_dup_threshold: float = 0.85,
) -> "DataFrame":
    """(doc_id, spans[interleaved]) -> filtered, deduplicated corpus."""
    from pyspark.sql import functions as F

    spans = extract_spans_balanced(docs, options, num_partitions=num_partitions)

    # assembled plain text per doc (text spans only), JVM-side
    text = F.concat_ws(
        " ",
        F.filter(
            F.transform("spans", lambda s: F.when(s["kind"] == "text", s["text"])),
            lambda x: x.isNotNull() & (x != ""),
        ),
    )
    corpus = spans.select("doc_id", "spans", text.alias("text")).filter(
        F.length("text") > 0
    )

    langs = lang_id(corpus).select("doc_id", "lang_pred")
    quality = quality_score(corpus).select("doc_id", "quality")
    corpus = (
        corpus.join(langs, "doc_id")
        .join(quality, "doc_id")
        .filter(F.col("lang_pred").isin(*keep_langs))
        .filter(F.col("quality") >= min_quality)
    )

    corpus = exact_dedup(corpus)

    near = minhash_lsh_pairs(corpus, threshold=near_dup_threshold)
    losers = near.select(F.col("id_b").alias("doc_id")).distinct()
    corpus = corpus.join(losers, "doc_id", "left_anti")

    return corpus.select("doc_id", "text", "lang_pred", "quality", "spans")
