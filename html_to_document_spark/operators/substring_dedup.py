"""Cross-document exact substring deduplication (the ExactSubstr
technique of Lee et al. 2021, "Deduplicating Training Data Makes
Language Models Better"), as the hash-marking approximation standard
in open Spark pipelines: every word ``n``-gram occurrence is hashed;
any gram occurring more than once in the corpus (across OR within
documents) keeps its globally-first occurrence and marks every other
occurrence's word range for removal.

Differences from the paper's suffix-array formulation, stated plainly:
ranges are fixed-length n-gram windows merged per document (not
maximal repeated substrings), one pass by default (removal can stitch
words together into NEW adjacent duplicates — ``max_passes`` > 1
re-runs mark→rebuild until a pass produces no marks, bounded), and
removal rejoins words with single spaces (the same tokenization the
grams were built from).

Scale shape (100 TB lens):
- the gram explode emits (8-byte xxhash64, doc_id, pos) — the gram
  TEXT never enters a shuffle (collision policy as ``exact_dedup``).
- duplicated-gram detection and keeper selection are ONE groupBy on
  the hash (map-side combinable count + struct-min), and the mark join
  is hash-keyed against that aggregate. (The occurrence rows are
  re-shuffled for the join — the groupBy's exchange carries partial-
  aggregate rows, so the two exchanges cannot be one ReusedExchange;
  both carry 8-byte hashes, never gram text.) A boilerplate gram
  shared by millions of
  docs skews ONE JOIN KEY, which AQE's skew-join handles by splitting
  the probe side (unlike the LSH self-join case, no quadratic blowup —
  the build side holds exactly one row per hash).
- the rebuild stage shuffles (doc_id, sorted positions) — ints, not
  text — and rejoins the corpus once, doc-keyed.
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame

__all__ = [
    "exact_substring_ranges",
    "exact_substring_dedup",
    "dup_gram_stats",
]


def _gram_occurrences(df: "DataFrame", text_col: str, id_col: str, n: int):
    from pyspark.sql import functions as F

    from .parallelism import widen_small_scan

    # split materialized as a column FIRST: a lambda referencing the
    # outer split() makes Catalyst re-run the split per array element
    # (O(doc_len^2) per doc; measured on the gopher gram explode)
    words = F.col("_w")
    # widen tiny scans before the n-gram window explode (r6, guide
    # §2.2: ~(words-n) x n word-joins per doc would otherwise run at
    # single-file scan parallelism); no-op on wide inputs
    return widen_small_scan(df.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("_w"),
    )).select(
        "doc_id",
        F.explode(
            F.when(
                F.size(words) >= n,
                F.transform(
                    F.sequence(F.lit(0), F.size(words) - n),
                    lambda i: F.struct(
                        i.alias("pos"),
                        F.xxhash64(
                            F.array_join(F.slice(words, i + 1, n), " ")
                        ).alias("gh"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<pos:int,gh:long>>"))
        ).alias("g"),
    ).select("doc_id", F.col("g.pos").alias("pos"), F.col("g.gh").alias("gh"))


def dup_gram_stats(
    df: "DataFrame",
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 20,
) -> "DataFrame":
    """Per-document duplicate n-gram mass — the Dolma dedup TAGGER
    shape (Soldaini et al. 2024 tag attributes rather than rewrite):
    for each document, how many of its word ``n``-gram windows carry a
    gram that also occurs in at least one OTHER document, as a count
    and a fraction. Unlike :func:`exact_substring_ranges` this is a
    pure signal (no keeper exclusion, no rewrite): feed ``dup_frac``
    to a quality filter or a soft reweighter instead of destructively
    removing text.

    Returns (doc_id, n_windows, n_dup_windows, dup_frac); documents
    shorter than ``n`` words report 0 windows and dup_frac 0.0. The
    fraction is one double division of two exact integers —
    engine-reproducible.

    100 TB shape: the gram explode emits (doc_id, pos, 8-byte hash) —
    text never shuffles (collision contract as ``exact_dedup``).
    Cross-doc detection needs DISTINCT-doc counts per gram, computed
    as two map-side-combinable aggs (distinct (doc, hash), then count
    per hash) rather than a count_distinct; the per-occurrence join
    against that one-row-per-hash build side is AQE-skew-safe under a
    boilerplate gram shared by millions of docs."""
    from pyspark.sql import functions as F

    grams = _gram_occurrences(df, text_col, id_col, n)
    # distinct docs per gram: dedupe (doc, hash) first so the per-hash
    # count is exact without a count_distinct shuffle of raw pairs
    ndocs = (
        grams.select("doc_id", "gh")
        .distinct()
        .groupBy("gh")
        .agg(F.count("*").alias("_nd"))
    )
    per_doc = (
        grams.join(ndocs, "gh")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_windows"),
            F.sum(F.when(F.col("_nd") >= 2, 1).otherwise(0)).alias(
                "n_dup_windows"
            ),
        )
    )
    base = df.select(F.col(id_col).alias("doc_id"))
    return (
        base.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_windows"), F.lit(0)).alias("n_windows"),
            F.coalesce(F.col("n_dup_windows"), F.lit(0)).alias(
                "n_dup_windows"
            ),
        )
        .withColumn(
            "dup_frac",
            F.when(
                F.col("n_windows") > 0,
                F.col("n_dup_windows").cast("double")
                / F.col("n_windows").cast("double"),
            ).otherwise(F.lit(0.0)),
        )
    )


def exact_substring_ranges(
    df: "DataFrame",
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 50,
) -> "DataFrame":
    """Marked occurrences: (doc_id, pos) word positions starting an
    ``n``-gram that appears elsewhere in the corpus, EXCLUDING the
    global keeper occurrence (min by (doc_id, pos) — deterministic
    under any partitioning). Feed to :func:`exact_substring_dedup` or
    inspect directly for corpus forensics."""
    from pyspark.sql import functions as F

    grams = _gram_occurrences(df, text_col, id_col, n)
    keepers = grams.groupBy("gh").agg(
        F.count("*").alias("_cnt"),
        F.min(F.struct("doc_id", "pos")).alias("_keep"),
    )
    return (
        grams.join(keepers.filter(F.col("_cnt") > 1), "gh")
        .filter(
            (F.col("doc_id") != F.col("_keep.doc_id"))
            | (F.col("pos") != F.col("_keep.pos"))
        )
        .select("doc_id", "pos")
    )


def exact_substring_dedup(
    df: "DataFrame",
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 50,
    max_passes: int = 1,
) -> "DataFrame":
    """Corpus with duplicated ``n``-word substrings removed (keeper
    occurrence retained). Returns the input columns — ``id_col``
    keeps its name and type — with ``text_col`` replaced plus
    ``n_words_removed``; documents whose text empties entirely are
    dropped. Whitespace normalizes to single spaces (the gram
    tokenization).

    ``max_passes``: removal can stitch surviving words into NEW
    duplicated ``n``-grams (the paper's suffix-array formulation is a
    fixpoint); values > 1 re-run mark→rebuild on the rebuilt corpus
    until a pass marks nothing, at most ``max_passes`` times. Each
    extra pass re-shuffles the corpus and runs one driver-side
    convergence action (a sum over the per-pass removal counts), so
    the default stays the standard open-pipeline single pass;
    ``n_words_removed`` accumulates across passes. Intermediate
    passes are persisted for the convergence action and unpersisted
    before return — the returned frame is NOT persisted and its
    lineage replays every executed pass."""
    from pyspark.sql import functions as F

    if max_passes < 1:
        raise ValueError(f"max_passes must be >= 1, got {max_passes}")
    out = _dedup_pass(df, text_col, id_col, n)
    for _ in range(max_passes - 1):
        prev = out.persist()
        nxt = _dedup_pass(
            prev.withColumnRenamed("n_words_removed", "_rm_acc"),
            text_col,
            id_col,
            n,
        ).persist()
        # full actions (not limit-short-circuited) so nxt's cache is
        # complete before prev is released. Convergence needs BOTH
        # signals: the removed-word sum only covers SURVIVING rows, so
        # a pass that empties a document entirely (row dropped by the
        # length filter) would otherwise read as a no-op and the loop
        # would resurrect the duplicate by returning prev.
        pass_removed = nxt.agg(F.sum("n_words_removed")).first()[0] or 0
        if pass_removed == 0 and nxt.count() == prev.count():
            nxt.unpersist()
            prev.unpersist()
            return prev
        out = nxt.withColumn(
            "n_words_removed",
            (F.col("_rm_acc") + F.col("n_words_removed")).cast("int"),
        ).drop("_rm_acc")
        prev.unpersist()
        nxt.unpersist()
    return out


def _dedup_pass(
    df: "DataFrame",
    text_col: str,
    id_col: str,
    n: int,
) -> "DataFrame":
    """One mark→rebuild sweep (the original single-pass operator)."""
    import pandas as pd
    from pyspark.sql import functions as F

    marked = (
        exact_substring_ranges(df, text_col, id_col, n)
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("pos")).alias("_marked"))
        .withColumnRenamed("doc_id", id_col)
    )
    joined = df.join(marked, id_col, "left")

    other = [c for c in joined.columns if c not in (text_col, "_marked")]
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in joined.schema.fields
        if f.name in other
    ) + f", {text_col} string, n_words_removed int"

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = pdf[other].copy()
            texts, removed = [], []
            for text, pos_list in zip(pdf[text_col], pdf["_marked"]):
                words = re.split(r"\s+", text.strip()) if text else []
                if pos_list is None or len(pos_list) == 0:
                    texts.append(" ".join(words))
                    removed.append(0)
                    continue
                covered = set()
                for p in pos_list:
                    covered.update(range(int(p), int(p) + n))
                kept = [w for i, w in enumerate(words) if i not in covered]
                texts.append(" ".join(kept))
                removed.append(len(words) - len(kept))
            out[text_col] = texts
            out["n_words_removed"] = removed
            yield out

    return (
        joined.mapInPandas(fn, schema)
        .filter(F.length(text_col) > 0)
    )
