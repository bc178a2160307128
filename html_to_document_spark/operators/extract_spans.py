"""The core distributed extraction operator.

Spark-first design notes (the reference is a single-threaded per-doc
transducer; parallelism here is cross-document):

- one ``mapInPandas`` stage: JVM -> Arrow batch -> vectorized-per-batch
  Python extraction -> Arrow -> JVM. No per-row Python UDF calls, no
  collect, no driver-side loops.
- all row-level predicates (doc caps, kind filters) must be applied
  BEFORE this operator so Catalyst can push them into the scan — the
  UDF body is opaque to the optimizer (SURVEY.md §4).
- skew: giant pages are size-skew, not key-skew; ``salted_repartition``
  spreads docs uniformly at random (deterministic salt of doc_id) so a
  handful of 1000x documents can't pile onto one task (north_rule).
  AQE handles post-shuffle coalescing; it cannot split a running UDF
  task, hence the explicit salt.
- Arrow batch size should be tuned down for huge documents via
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` (job.py sets it).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from html_to_document_spark.core.extract import (
    DEFAULT_OPTIONS,
    ExtractOptions,
    assemble_html,
    extract_document,
)

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame

# output schema per BASELINE.json input_hint
SPANS_TYPE = "array<struct<kind:string,text:string,media_ref:string,offset:int>>"
OUTPUT_SCHEMA = f"doc_id string, spans {SPANS_TYPE}"


def _spans_to_rows(spans) -> list[dict]:
    return [
        {"kind": k, "text": t, "media_ref": r, "offset": o}
        for (k, t, r, o) in spans
    ]


def extract_spans(
    df: "DataFrame",
    options: ExtractOptions = DEFAULT_OPTIONS,
    *,
    fail_partition_expr=None,
) -> "DataFrame":
    """(doc_id, spans[input]) -> (doc_id, spans[extracted]).

    Input rows carry interleaved ``text``/``image`` spans; the HTML is
    assembled per doc (FIXTURES.md §1.1), extracted, and re-emitted as
    ordered ``text|image|table|pagebreak`` spans. Deterministic pure
    function of row content — stable under repartitioning.

    ``fail_partition_expr``: name of an int column; rows where it is
    negative raise (test hook for checkpoint-resume integration tests).
    """
    import pandas as pd

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if fail_partition_expr is not None and (
                pdf[fail_partition_expr] < 0
            ).any():
                raise RuntimeError("injected failure (checkpoint test)")
            out = [
                _spans_to_rows(extract_document(assemble_html(s), options))
                for s in pdf["spans"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "spans": out})

    return df.mapInPandas(fn, OUTPUT_SCHEMA)


def extract_spans_from_html(
    df: "DataFrame",
    html_col: str = "html",
    doc_id_col: str = "doc_id",
    options: ExtractOptions = DEFAULT_OPTIONS,
) -> "DataFrame":
    """Same operator for inputs that carry raw HTML in a string column."""
    import pandas as pd

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = [
                _spans_to_rows(extract_document(h, options))
                for h in pdf[html_col]
            ]
            yield pd.DataFrame({"doc_id": pdf[doc_id_col], "spans": out})

    return df.mapInPandas(fn, OUTPUT_SCHEMA)


def exploded(df: "DataFrame") -> "DataFrame":
    """(doc_id, spans) -> one row per span — the relational projection
    used by oracle comparisons and downstream text operators."""
    from pyspark.sql import functions as F

    return df.select(
        "doc_id", F.explode("spans").alias("s")
    ).select(
        "doc_id",
        F.col("s.offset").alias("offset"),
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
    )


def salted_repartition(
    df: "DataFrame", num_partitions: int, salt_seed: int = 42
) -> "DataFrame":
    """Deterministic salted-hash repartition of doc_id (north_rule skew
    defusal): giant pages land on uniformly-random partitions
    independent of input file layout."""
    from pyspark.sql import functions as F

    return df.repartition(
        num_partitions,
        F.pmod(F.xxhash64("doc_id", F.lit(salt_seed)), F.lit(num_partitions)),
    )
