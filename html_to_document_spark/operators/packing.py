"""Sequence packing: assign documents to fixed token-budget bins (the
training-prep step between a filtered corpus and a tokenized dataset —
packing short documents together raises accelerator utilization).

Spark-first shape: a GLOBAL optimal packing would serialize through
one task (bin state is sequential), so packing is deliberately
per-partition — each partition runs greedy first-fit-decreasing over
its own documents inside one Arrow batch stream, and bin ids are made
globally unique by offsetting with the partition id. At 100 TB this is
the only shape that scales: no shuffle beyond the one even-spread
repartition, no driver state, and FFD inside a partition is within
22% of optimal (classic bound 11/9 OPT + 6/9) — cross-partition
packing could only improve tail-bin utilization, which the utilization
stats expose anyway.

Documents larger than the budget get a bin of their own (flagged
``oversize`` — the caller decides whether to split or drop; splitting
belongs to tokenization, not packing).
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterator

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame

PACK_SCHEMA = (
    "doc_id string, bin_id long, n_tokens long, oversize boolean"
)

# bin-id layout: partition id in the high bits, local bin in the low
_BIN_SHIFT = 40


def pack_sequences(
    df: "DataFrame",
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int | None = None,
    tokens_col: str | None = None,
) -> "DataFrame":
    """(doc_id, bin_id, n_tokens, oversize): greedy first-fit-
    decreasing packing of token counts into ``budget``-sized bins,
    per partition. Deterministic for a fixed ``num_partitions``
    (rows are routed by hash of doc_id and sorted inside the
    partition); bin ids are opaque, globally unique labels.

    Counts come from ``tokens_col`` when given (e.g. the exact
    ``n_bpe_tokens`` of :func:`tokenizer.bpe_encode` — the real
    tokenize→pack path), else from the whitespace estimate over
    ``text_col``.

    NULL contract: a NULL count (NULL in ``tokens_col``, or NULL text
    in the whitespace path) packs as a 0-token document — it consumes
    no budget and is never ``oversize``. Without the coalesce the NULL
    would surface as a pandas NaN and ``int(n)`` would fail the whole
    task for one bad row; callers who want NULL-count rows dropped
    should filter before packing.
    """
    import pandas as pd
    from pyspark.sql import functions as F

    if budget <= 0:
        raise ValueError("budget must be positive")

    count_expr = F.coalesce(
        (
            F.col(tokens_col).cast("long")
            if tokens_col is not None
            else F.size(
                F.split(F.trim(F.col(text_col)), r"\s+")
            ).cast("long")
        ),
        F.lit(0),
    )
    counted = df.select(
        F.col(id_col).cast("string").alias("doc_id"),
        count_expr.alias("n_tokens"),
    )
    if num_partitions is not None:
        counted = counted.repartition(
            num_partitions, F.xxhash64("doc_id")
        )

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        base = pid << _BIN_SHIFT
        rows: list[tuple[str, int]] = []
        for pdf in batches:
            rows.extend(zip(pdf["doc_id"], pdf["n_tokens"]))
        # first-fit-decreasing; doc_id tiebreak for determinism
        rows.sort(key=lambda r: (-r[1], r[0]))
        bins: list[int] = []  # remaining capacity per bin
        out = {"doc_id": [], "bin_id": [], "n_tokens": [], "oversize": []}
        for doc_id, n in rows:
            n = int(n)
            if n > budget:
                bins.append(0)  # dedicated, already full
                out["oversize"].append(True)
                out["bin_id"].append(base + len(bins) - 1)
            else:
                for b in range(len(bins)):  # first fit
                    if bins[b] >= n:
                        bins[b] -= n
                        out["bin_id"].append(base + b)
                        break
                else:
                    bins.append(budget - n)
                    out["bin_id"].append(base + len(bins) - 1)
                out["oversize"].append(False)
            out["doc_id"].append(doc_id)
            out["n_tokens"].append(n)
        yield pd.DataFrame(out)

    return counted.mapInPandas(fn, PACK_SCHEMA)


def chunk_token_windows(
    df: "DataFrame",
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 512,
    stride: int = 384,
) -> "DataFrame":
    """Overlapping context-window chunking: split each document's
    whitespace tokens into windows of ``window`` tokens starting every
    ``stride`` tokens (stride < window => ``window - stride`` tokens
    of overlap — the standard LM-pretraining chunker shape). Start
    positions are 0, stride, 2*stride, ... up to the smallest start
    that still reaches the end, so every token is covered and only
    the last chunk may be short. Returns one row per chunk:
    (id_col, chunk_id, n_tokens, chunk, loss_start, n_loss_tokens).

    ``loss_start``/``n_loss_tokens`` are the stride-overlap LOSS MASK
    (the standard sliding-window training/eval rule: a token the
    previous chunk already covered must not contribute loss twice):
    the first ``loss_start`` tokens of a chunk repeat the previous
    chunk's tail and should be context-only; the remaining
    ``n_loss_tokens = n_tokens - loss_start`` are this chunk's loss
    tokens. Chunk 0 has ``loss_start = 0``;  later chunks have
    exactly ``min(window - stride, n_tokens)`` (the true overlap with
    the previous chunk's coverage, not just a clamp). Summing
    ``n_loss_tokens`` over a document's chunks always re-counts each
    token exactly once.

    Scale shape: a single shuffle-free projection + explode — the
    words array is materialized once as a column (the r4 lesson: a
    lambda referencing an outer split() re-evaluates it per element),
    chunk math is pure JVM `sequence`/`slice`/`array_join`, and no
    state crosses rows, so the operator parallelizes embarrassingly
    at any corpus size. Empty/whitespace-only documents yield zero
    chunks."""
    from pyspark.sql import functions as F

    if window < 1 or stride < 1:
        raise ValueError(f"window/stride must be >= 1, got {window}/{stride}")
    if stride > window:
        raise ValueError(
            f"stride {stride} > window {window} would skip tokens"
        )

    words = F.col("_w")
    n = F.size(words)
    n_chunks = F.ceil(F.greatest(n - window, F.lit(0)) / stride) + 1
    chunks = F.when(
        n > 0,
        F.transform(
            F.sequence(F.lit(0), (n_chunks - 1).cast("int")),
            lambda i: F.struct(
                i.cast("int").alias("chunk_id"),
                F.least(F.lit(window), n - i * stride).cast("int")
                .alias("n_tokens"),
                F.array_join(
                    F.slice(words, i * stride + 1, window), " "
                ).alias("chunk"),
                # overlap with the previous chunk's coverage:
                # min(prev_end, n) - this_start = min(window - stride,
                # n_tokens); 0 for chunk 0
                F.when(i == 0, F.lit(0))
                .otherwise(
                    F.least(F.lit(window - stride), n - i * stride)
                )
                .cast("int")
                .alias("loss_start"),
            ),
        ),
    ).otherwise(
        F.array().cast(
            "array<struct<chunk_id:int,n_tokens:int,chunk:string,"
            "loss_start:int>>"
        )
    )
    return (
        df.select(
            F.col(id_col).alias(id_col),
            F.split(F.trim(F.col(text_col)), r"\s+").alias("_w"),
        )
        .select(
            id_col,
            F.filter(words, lambda w: w != "").alias("_w"),
        )
        .select(id_col, F.explode(chunks).alias("_c"))
        .select(
            id_col,
            F.col("_c.chunk_id").alias("chunk_id"),
            F.col("_c.n_tokens").alias("n_tokens"),
            F.col("_c.chunk").alias("chunk"),
            F.col("_c.loss_start").alias("loss_start"),
            (F.col("_c.n_tokens") - F.col("_c.loss_start"))
            .alias("n_loss_tokens"),
        )
    )


def materialize_packed(
    df: "DataFrame",
    packed: "DataFrame",
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "<|endofdoc|>",
) -> "DataFrame":
    """(bin_id, n_docs, n_tokens, text): the actual training sequences
    from a :func:`pack_sequences` assignment — member texts joined in
    ascending ``id_col`` order (under the id column's own type
    ordering — pack_sequences emits string ids) with ``sep`` between
    documents.

    Deterministic concatenation without a sort: collect_list's
    arbitrary order is laundered through ``array_sort`` on
    (id, text) structs (ids are unique, so the order is total), the
    same trick as retrieval's sorted-term fold. Per-bin state is
    bounded by construction — a bin holds at most ``budget`` tokens —
    so the collect_list can never exceed one training sequence.
    ``oversize`` docs are excluded (they don't fit any bin; truncate
    or split upstream)."""
    from pyspark.sql import functions as F

    # pack_sequences emits its id as a STRING column named doc_id;
    # cast the member side explicitly — bare string==bigint equality
    # would coerce BOTH sides to double and collide distinct 64-bit
    # ids above 2^53 (review r5-cont4)
    j = packed.filter(~F.col("oversize")).join(
        df.select(
            F.col(id_col).cast("string").alias("_mid"),
            F.col(text_col).alias("_mtext"),
        ),
        F.col("doc_id") == F.col("_mid"),
    )
    return j.groupBy("bin_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("_mid"), F.col("_mtext")))
                ),
                lambda x: x["_mtext"],
            ),
            sep,
        ).alias("text"),
    )


# sentence boundary: terminal punctuation + whitespace. The marker
# (U+001E RECORD SEPARATOR) is injected after the punctuation and
# split on, so sentences KEEP their terminal mark and the pattern
# stays in the RE2 ∩ Java common dialect (no lookbehind).
SENTENCE_BOUNDARY_RE = r"([.!?])\s+"
_SENT_MARK = "\x1e"


def sentences_col(text_col) -> "Column":
    """text -> array of sentences (terminal punctuation kept, edge
    whitespace trimmed, empty elements dropped). Pure JVM."""
    from pyspark.sql import functions as F

    c = F.col(text_col) if isinstance(text_col, str) else text_col
    marked = F.regexp_replace(
        c, SENTENCE_BOUNDARY_RE, "$1" + _SENT_MARK
    )
    return F.filter(
        F.transform(F.split(marked, _SENT_MARK), lambda s: F.trim(s)),
        lambda s: s != "",
    )


def chunk_sentence_windows(
    df: "DataFrame",
    text_col: str = "text",
    id_col: str = "doc_id",
    max_tokens: int = 256,
) -> "DataFrame":
    """Sentence-boundary passage chunking — the RAG / retrieval-eval
    chunker: greedily pack whole sentences into passages of at most
    ``max_tokens`` whitespace tokens, never splitting inside a
    sentence (the quality reason this exists: a window cut mid-
    sentence embeds/retrieves worse than one cut at a boundary). A
    single sentence longer than the budget becomes its own oversized
    chunk (the standard fallback). Returns one row per chunk:
    (id_col, chunk_id, n_tokens, chunk).

    100 TB shape: one shuffle-free JVM projection — the greedy fold is
    ``F.aggregate`` over the per-row sentence array (the accumulator
    lambda reads only its own state and the lambda variable, so
    nothing outer is re-evaluated per element — the r4 transform-
    lambda lesson), followed by posexplode. No Python, no Exchange."""
    from pyspark.sql import functions as F

    def wc(s):
        return F.size(F.split(s, r"\s+"))

    acc0 = F.struct(
        F.array().cast("array<string>").alias("chunks"),
        F.array().cast("array<int>").alias("counts"),
        F.lit("").alias("cur"),
        F.lit(0).alias("cur_n"),
    )

    def step(acc, s):
        n = wc(s)
        overflow = (acc["cur_n"] > 0) & (acc["cur_n"] + n > max_tokens)
        return F.when(
            overflow,
            F.struct(
                F.concat(acc["chunks"], F.array(acc["cur"])).alias("chunks"),
                F.concat(acc["counts"], F.array(acc["cur_n"])).alias("counts"),
                s.alias("cur"),
                n.alias("cur_n"),
            ),
        ).otherwise(
            F.struct(
                acc["chunks"].alias("chunks"),
                acc["counts"].alias("counts"),
                F.when(acc["cur_n"] == 0, s)
                .otherwise(F.concat(acc["cur"], F.lit(" "), s))
                .alias("cur"),
                (acc["cur_n"] + n).alias("cur_n"),
            )
        )

    def finish(acc):
        return F.when(
            acc["cur_n"] > 0,
            F.struct(
                F.concat(acc["chunks"], F.array(acc["cur"])).alias("chunks"),
                F.concat(acc["counts"], F.array(acc["cur_n"])).alias("counts"),
            ),
        ).otherwise(
            F.struct(
                acc["chunks"].alias("chunks"),
                acc["counts"].alias("counts"),
            )
        )

    folded = df.select(
        F.col(id_col),
        F.aggregate(
            sentences_col(text_col), acc0, step, finish
        ).alias("_packed"),
    )
    return folded.select(
        id_col,
        F.posexplode(
            F.arrays_zip(
                F.col("_packed.chunks").alias("chunk"),
                F.col("_packed.counts").alias("n_tokens"),
            )
        ).alias("chunk_id", "_z"),
    ).select(
        id_col,
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.col("_z.n_tokens").alias("n_tokens"),
        F.col("_z.chunk").alias("chunk"),
    )


def packing_stats(
    packed: "DataFrame", budget: int
) -> "DataFrame":
    """One-row packing-efficiency datasheet over a
    :func:`pack_sequences` assignment frame — the numbers that decide
    whether a packing config wastes compute at training time:

    - ``n_bins`` / ``n_docs`` / ``total_tokens`` (oversize docs
      excluded — they don't occupy bins);
    - ``mean_fill``: total_tokens / (n_bins * budget) — the corpus
      fill rate, = 1 - padding waste;
    - ``min_bin_fill`` / ``p50_bin_fill``: worst and exact-median
      per-bin fill (r4) — FFD leaves at most one straggler bin per
      partition, and these surface it;
    - ``n_oversize``: docs that exceeded the budget outright.

    Scale shape: one groupBy(bin_id) pass over the packed frame, then
    a single-row aggregate — the oversize count rides the SAME pass
    as conditional sums (oversize docs occupy dedicated bins whose
    regular-doc count is 0, so they fall out of every fill metric
    without a second scan of the packing lineage). The exact median
    runs over the BIN frame — already reduced by
    ~budget/avg_doc_tokens versus the corpus — so its exchange is
    tiny; per-doc frames are never globally sorted."""
    from pyspark.sql import functions as F

    from html_to_document_spark.operators.text_analysis import r4

    ov = F.col("oversize")
    bins = packed.groupBy("bin_id").agg(
        F.sum(F.when(~ov, F.col("n_tokens"))).alias("bin_tokens"),
        F.count(F.when(~ov, F.lit(1))).alias("bin_docs"),
        F.sum(ov.cast("long")).alias("n_over"),
    )
    b = float(budget)
    regular = F.col("bin_docs") > 0
    reg_tokens = F.when(regular, F.col("bin_tokens"))
    n_bins = F.count(F.when(regular, F.lit(1)))
    return bins.agg(
        n_bins.alias("n_bins"),
        F.sum("bin_docs").alias("n_docs"),
        F.coalesce(F.sum(reg_tokens), F.lit(0)).alias("total_tokens"),
        r4(F.sum(reg_tokens) / (n_bins * F.lit(b))).alias("mean_fill"),
        r4(F.min(reg_tokens) / F.lit(b)).alias("min_bin_fill"),
        r4(
            F.expr(
                "median(case when bin_docs > 0 then bin_tokens end)"
            )
            / F.lit(b)
        ).alias("p50_bin_fill"),
        F.sum("n_over").alias("n_oversize"),
    )
