"""Deterministic synthetic interleaved corpus (FIXTURES.md §3).

Seed-fixed, no external data: doc ``i`` is a pure function of
``(seed, i)``, so any two runs (and any two cluster sizes) generate
byte-identical input — required for the N-vs-4N scaling bench and for
checkpoint-resume tests.

Composition follows the fixture-class weights; a ``giant_frac``
fraction of docs are ~1000x "giant pages" to exercise the salted
repartition / skew path.
"""

from __future__ import annotations

import random
from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame, SparkSession

_VOCAB = (
    "the quick brown fox jumps over lazy dog spark shuffle partition "
    "arrow batch vector column iceberg lineage checksum resume salt skew "
    "document span heading table list image anchor fragment boiler "
    "content extract tokenize cascade style selector grid merge order"
).split()

_BLOCK_KINDS = [
    ("paragraph", 0.45),
    ("list", 0.15),
    ("table", 0.12),
    ("heading", 0.10),
    ("image", 0.08),
    ("pre", 0.05),
    ("pagebreak", 0.03),
    ("boilerplate", 0.02),
]
_KINDS = [k for k, _ in _BLOCK_KINDS]
_WEIGHTS = [w for _, w in _BLOCK_KINDS]

SPANS_TYPE = "array<struct<kind:string,text:string,media_ref:string,offset:int>>"
DOC_SCHEMA = f"doc_id string, spans {SPANS_TYPE}"


def _words(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(_VOCAB) for _ in range(n))


def _block_html(rng: random.Random, kind: str, doc_i: int, block_i: int) -> str:
    if kind == "paragraph":
        return f"<p>{_words(rng, rng.randint(4, 40))}</p>"
    if kind == "heading":
        level = block_i % 6 + 1
        return f"<h{level}>{_words(rng, rng.randint(2, 6))}</h{level}>"
    if kind == "list":
        items = "".join(
            f"<li>{_words(rng, rng.randint(2, 8))}</li>"
            for _ in range(rng.randint(2, 6))
        )
        tag = rng.choice(("ul", "ol"))
        return f"<{tag}>{items}</{tag}>"
    if kind == "table":
        rows = "".join(
            "<tr>"
            + "".join(
                f"<td>{_words(rng, rng.randint(1, 3))}</td>"
                for _ in range(rng.randint(1, 4))
            )
            + "</tr>"
            for _ in range(rng.randint(1, 4))
        )
        return f"<table>{rows}</table>"
    if kind == "pre":
        return f"<pre>{_words(rng, 3)}\n  {_words(rng, 3)}\n</pre>"
    if kind == "pagebreak":
        return '<section class="page-break"></section>'
    if kind == "boilerplate":
        return rng.choice(
            (
                "<script>var x = 1;</script>",
                f"<nav><a href='/{block_i}'>{_words(rng, 2)}</a></nav>",
                "<template><p>tmpl</p></template>",
            )
        )
    raise AssertionError(kind)


def gen_doc(i: int, seed: int = 42, giant_frac: float = 0.001) -> dict:
    """One interleaved document: pure function of (seed, i)."""
    rng = random.Random((seed << 34) ^ i)
    n_blocks = rng.randint(1, 50)
    if rng.random() < giant_frac:
        n_blocks *= 1000

    spans: list[dict] = []
    buf: list[str] = []
    offset = 0

    def flush_text() -> None:
        nonlocal offset
        if buf:
            spans.append(
                {"kind": "text", "text": "".join(buf), "media_ref": None,
                 "offset": offset}
            )
            offset += 1
            buf.clear()

    for b in range(n_blocks):
        kind = rng.choices(_KINDS, weights=_WEIGHTS, k=1)[0]
        if kind == "image":
            flush_text()
            ref = f"media://{rng.getrandbits(64):016x}"
            spans.append(
                {"kind": "image", "text": None, "media_ref": ref,
                 "offset": offset}
            )
            offset += 1
        else:
            buf.append(_block_html(rng, kind, i, b))
            # occasional interleave split inside the text stream
            if rng.random() < 0.15:
                flush_text()
    flush_text()
    if not spans:
        spans.append(
            {"kind": "text", "text": "<p>empty</p>", "media_ref": None,
             "offset": 0}
        )
    return {"doc_id": f"doc-{i:012d}", "spans": spans}


def generate_corpus(
    spark: "SparkSession",
    n_docs: int,
    seed: int = 42,
    giant_frac: float = 0.001,
    partitions: int | None = None,
) -> "DataFrame":
    """Distributed generation: spark.range fans the id space out across
    executors; each task materializes its docs independently."""
    import pandas as pd

    def fn(batches):
        for pdf in batches:
            docs = [gen_doc(int(i), seed, giant_frac) for i in pdf["id"]]
            yield pd.DataFrame(
                {
                    "doc_id": [d["doc_id"] for d in docs],
                    "spans": [d["spans"] for d in docs],
                }
            )

    rng_df = spark.range(n_docs, numPartitions=partitions)
    return rng_df.mapInPandas(fn, DOC_SCHEMA)
