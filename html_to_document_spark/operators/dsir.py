"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling").

Complements the CCNet perplexity filter (``operators/lm_filter.py``):
where CCNet scores documents under ONE reference LM, DSIR contrasts a
*target* distribution (the data you want more of) against the *raw*
corpus distribution and weighs each document by how much more likely
its features are under the target:

    log w(x) = sum_{g in grams(x)} [ log p_hat(g) - log q_hat(g) ]

with ``grams(x)`` the word unigrams + bigrams of the document and
``p_hat`` / ``q_hat`` add-alpha-smoothed gram distributions fitted on
the target slice and the raw corpus.  Selection then resamples
documents with probability proportional to ``w`` (Gumbel top-k), which
the paper shows beats both random selection and hard perplexity
thresholds for pretraining-data curation.

Two feature modes:

- **raw-gram mode** (``num_buckets=None``): the feature space is the
  target's gram vocabulary (``min_count`` cut, rare grams pooled into
  ``<unk>``) — every quantity is an exact integer count, so the whole
  fit+score is expressible in ANSI SQL for the DuckDB oracle.
- **hashed mode** (``num_buckets=B``): the paper's formulation — grams
  hash into ``B`` buckets (CRC32, reproducible on the JVM via
  ``F.crc32`` and in Python via ``zlib.crc32``), bounding the model at
  ``B`` floats regardless of vocabulary size.  This is the 100 TB
  path: the broadcast model is ~80 KB at B=10k even over an unbounded
  crawl vocabulary.

Scale shape (100 TB lens):
- FIT touches the target slice and the raw corpus once each with an
  explode + map-side-combinable integer-count groupBy (hashed mode
  shuffles 8-byte bucket ids, never gram text); ``fit_fraction`` fits
  ``q_hat`` on a seeded sample — the raw distribution is a density
  estimate, a 1% sample of 10^12 docs is statistically exact.
- SCORING is shuffle-free: the model is an ``sc.broadcast`` dict /
  numpy array and the weight is ONE Arrow-batched ``mapInPandas``
  projection — the corpus is never joined or re-shuffled.
- SELECTION (``dsir_select``) is a stateless seeded projection:
  Gumbel noise derived from ``xxhash64(doc_id, seed)`` makes the
  resample deterministic under any partitioning, with no global sort
  (callers threshold the Gumbel key; an exact top-k would need one).

Reference behavioural parity: the reference engine has no data
selection — this operator belongs to the beyond-reference
training-data surface the task brief mandates.
"""

from __future__ import annotations

import math
import re
import zlib
from collections.abc import Iterator
from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd
    from pyspark.sql import Column, DataFrame

__all__ = ["fit_dsir", "dsir_log_weight", "dsir_select", "gumbel_key_col"]

UNK = "<unk>"
# ASCII \s, matching the JVM (Java regex \s) and DuckDB (RE2 \s)
# tokenizers bit-for-bit on interior whitespace: Python's default
# Unicode \s would split "foo bar" into two tokens the fit side
# never counted, scoring real web text against the wrong feature
# space. Leading/trailing whitespace is handled by the emptiness
# check below (whitespace-only docs = no tokens, all engines agree
# on the fixture corpus).
_WS = re.compile(r"\s+", re.ASCII)


def _words(text) -> list[str]:
    # non-str guards NULL rows reaching mapInPandas as None. No
    # .strip(): Python str.strip() is UNICODE-aware and would eat an
    # edge NBSP/thin-space that the ASCII-\s fit side keeps glued to
    # its word (review r5) — split raw, drop the '' edge tokens,
    # exactly what _gram_counts' filter-after-split does JVM-side.
    if not isinstance(text, str):
        return []
    return [w for w in _WS.split(text) if w]


def _doc_grams(words: list[str]) -> Iterator[str]:
    yield from words
    for i in range(len(words) - 1):
        yield words[i] + " " + words[i + 1]


def _gram_counts(df: "DataFrame", text_col: str) -> "DataFrame":
    """(gram, count) over word unigrams + bigrams — one explode, one
    map-side-combinable groupBy; gram construction is array-side (no
    positional self-join).

    The text projection is widened first (r6, guide §2.2): a tiny
    single-file scan plans 1 map task and the explode + count partial
    aggregate runs serial; no-op at scale."""
    from pyspark.sql import functions as F

    from .parallelism import widen_small_scan

    df = widen_small_scan(df.select(text_col))

    # empty-token filter after the split (F.trim strips ASCII spaces
    # only): a leading tab/newline would otherwise count a '' gram the
    # scorer's _words (.strip() + ASCII \s split) never emits — the
    # same fit/score-consistency filter as lm_filter.fit_ngram_lm and
    # tokenizer.fit_bpe, mirrored in the DuckDB oracle
    w = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    bigrams = F.when(
        F.size(w) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(w, i), F.element_at(w, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        df.select(F.explode(F.concat(w, bigrams)).alias("gram"))
        .groupBy("gram")
        .count()
    )


def fit_dsir(
    target_df: "DataFrame",
    raw_df: "DataFrame",
    text_col: str = "text",
    *,
    alpha: float = 0.5,
    min_count: int = 2,
    num_buckets: int | None = None,
    vocab_cap: int | None = 65536,
    fit_fraction: float | None = None,
    seed: int = 42,
) -> dict:
    """Fit the target/raw gram distributions; returns a broadcastable
    plain-dict model.

    raw-gram mode: ``{"mode": "gram", "alpha", "B", "Nt", "Nr",
    "ct", "cr", "vocab"}`` with ``ct``/``cr`` exact mapped-gram counts
    (feature space = target grams with count >= min_count, rare grams
    pooled into ``<unk>``) — identical under any partitioning.

    hashed mode (``num_buckets=B``): ``{"mode": "hash", ...,
    "ct"/"cr": list[int] of length B}`` with bucket = crc32(gram) % B.

    ``vocab_cap`` (default 65536) bounds the raw-gram-mode driver
    collect at the top-``cap`` target grams by (count desc, gram asc)
    regardless of the target slice's open gram vocabulary — the
    100 TB-safe shape is the default; pass ``vocab_cap=None`` to
    explicitly opt into an unbounded full-vocabulary collect. Hashed
    mode is bounded by ``B`` by construction and ignores the cap.
    ``fit_fraction`` samples the RAW side only (the target slice is
    the small trusted set; the raw side is the 100 TB corpus whose
    distribution a seeded sample estimates).
    """
    from pyspark.sql import functions as F

    if fit_fraction is not None:
        raw_df = raw_df.sample(False, fit_fraction, seed=seed)

    tgt = _gram_counts(target_df, text_col)
    raw = _gram_counts(raw_df, text_col)
    if num_buckets is None and vocab_cap is not None:
        # persisted: the capped raw-gram path reads this aggregate
        # twice — the driver collect and the vocab frame for the
        # raw-side mapping join (r6)
        tgt = tgt.persist()

    if num_buckets is not None:
        B = int(num_buckets)
        bucketed = lambda df: (  # noqa: E731
            df.groupBy(
                F.pmod(F.crc32(F.col("gram").cast("binary")), F.lit(B))
                .cast("int")
                .alias("bucket")
            )
            .agg(F.sum("count").alias("c"))
            .collect()
        )
        ct = [0] * B
        for r in bucketed(tgt):
            ct[r["bucket"]] = r["c"]
        cr = [0] * B
        for r in bucketed(raw):
            cr[r["bucket"]] = r["c"]
        return {
            "mode": "hash",
            "alpha": float(alpha),
            "B": B,
            "Nt": sum(ct),
            "Nr": sum(cr),
            "ct": ct,
            "cr": cr,
        }

    if vocab_cap is not None:
        tgt_rows = (
            tgt.orderBy(F.col("count").desc(), F.col("gram").asc())
            .limit(vocab_cap)
            .collect()
        )
    else:
        tgt_rows = tgt.collect()
    ct_raw = {r["gram"]: r["count"] for r in tgt_rows}
    vocab = {g for g, c in ct_raw.items() if c >= min_count}
    ct: dict[str, int] = {}
    for g, c in ct_raw.items():
        m = g if g in vocab else UNK
        ct[m] = ct.get(m, 0) + c
    # raw counts mapped through the SAME feature space JVM-side: the
    # collected raw rows are bounded by |vocab|+1, never the raw
    # corpus's open vocabulary — without this the driver collect would
    # be O(crawl vocab).
    # r6 (guide §3.1): the membership probe is a broadcast JOIN
    # against the vocab frame derived from the persisted target
    # aggregate (identical top-cap + min_count cut the driver
    # applied), not a |vocab|-literal isin — the InSet form rebuilt
    # the 65k-entry hash set once per task and bloated every plan
    # that analyzed it (see lm_filter.fit_ngram_lm).
    if vocab_cap is not None:
        vdf = (
            tgt.orderBy(F.col("count").desc(), F.col("gram").asc())
            .limit(vocab_cap)
            .where(F.col("count") >= int(min_count))
            .select(F.col("gram").alias("_vg"))
            .withColumn("_inv", F.lit(True))
        )
        raw_in = raw.join(
            F.broadcast(vdf), F.col("gram") == F.col("_vg"), "left"
        )
        in_vocab = F.col("_inv").isNotNull()
    else:
        raw_in = raw
        in_vocab = (
            F.col("gram").isin(sorted(vocab)) if vocab else F.lit(False)
        )
    raw_mapped = (
        raw_in.groupBy(
            F.when(in_vocab, F.col("gram"))
            .otherwise(F.lit(UNK))
            .alias("m")
        )
        .agg(F.sum("count").alias("c"))
        .collect()
    )
    if num_buckets is None and vocab_cap is not None:
        tgt.unpersist()
    cr = {r["m"]: r["c"] for r in raw_mapped}
    return {
        "mode": "gram",
        "alpha": float(alpha),
        "B": len(vocab) + 1,  # feature space incl. <unk>
        "Nt": sum(ct.values()),
        "Nr": sum(cr.values()),
        "ct": ct,
        "cr": cr,
        "vocab": vocab,
    }


def _r4(x: float) -> float:
    return math.floor(x * 10000 + 0.5) / 10000 if x >= 0 else -(
        math.floor(-x * 10000 + 0.5) / 10000
    )


def _score_text(text: str, m: dict) -> tuple[int, float]:
    """(n_grams, log importance weight) of one document."""
    words = _words(text)
    a, B, Nt, Nr = m["alpha"], m["B"], m["Nt"], m["Nr"]
    dt, dr = a * B + Nt, a * B + Nr
    lw, n = 0.0, 0
    if m["mode"] == "hash":
        ct, cr = m["ct"], m["cr"]
        nb = m["B"]
        for g in _doc_grams(words):
            b = zlib.crc32(g.encode("utf-8")) % nb
            lw += math.log((ct[b] + a) / dt) - math.log((cr[b] + a) / dr)
            n += 1
    else:
        ct, cr, vocab = m["ct"], m["cr"], m["vocab"]
        for g in _doc_grams(words):
            mg = g if g in vocab else UNK
            lw += math.log((ct.get(mg, 0) + a) / dt) - math.log(
                (cr.get(mg, 0) + a) / dr
            )
            n += 1
    return n, lw


def dsir_log_weight(
    df: "DataFrame",
    model: dict,
    text_col: str = "text",
    *,
    out_col: str = "log_weight",
    round4: bool = True,
) -> "DataFrame":
    """Append (n_grams, log_weight) — a shuffle-free broadcast-model
    Arrow-batched projection; all input columns pass through."""
    import pandas as pd  # noqa: F811
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    from .parallelism import widen_small_scan

    # widen tiny scans so the Python scorer uses every core (r6,
    # guide §2.2); no-op (no shuffle added) on wide inputs
    df = widen_small_scan(df)

    sc = df.sparkSession.sparkContext
    bmodel = sc.broadcast(model)

    # fresh StructType — StructType.add MUTATES in place, so chaining
    # it off df.schema would corrupt the source DataFrame's schema
    schema = StructType(
        list(df.schema.fields)
        + [StructField("n_grams", LongType()),
           StructField(out_col, DoubleType())]
    )

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        m = bmodel.value
        for pdf in batches:
            # no astype(str): it would turn a NULL row into the
            # literal token "None" with a nonzero weight — _words'
            # isinstance guard scores NULLs as (0, 0.0) instead,
            # matching the empty-text contract and the SQL oracle
            scored = [_score_text(t, m) for t in pdf[text_col]]
            pdf = pdf.copy()
            pdf["n_grams"] = pd.Series(
                [s[0] for s in scored], index=pdf.index, dtype="int64"
            )
            vals = [s[1] for s in scored]
            if round4:
                vals = [_r4(v) for v in vals]
            pdf[out_col] = pd.Series(vals, index=pdf.index, dtype="float64")
            yield pdf

    return df.mapInPandas(fn, schema)


def gumbel_key_col(
    log_weight_col: str = "log_weight",
    *,
    id_col: str = "doc_id",
    seed: int = 42,
) -> "Column":
    """Seeded Gumbel perturbation key: ``log_w + Gumbel(0,1)`` with the
    noise derived from ``xxhash64(id, seed)`` — fully deterministic
    under any partitioning (re-running the job reproduces the exact
    sample), which a ``rand()``-based resample would not be."""
    from pyspark.sql import functions as F

    h = F.xxhash64(F.col(id_col).cast("string"), F.lit(seed))
    # map the 64-bit hash to (0,1): shift into [0, 2^53) then scale,
    # +0.5 to keep u strictly inside the open interval
    u = (F.pmod(h, F.lit(1 << 53)) + F.lit(0.5)) / F.lit(float(1 << 53))
    return F.col(log_weight_col) + (-F.log(-F.log(u)))


def dsir_select(
    df: "DataFrame",
    *,
    min_gumbel_key: float,
    log_weight_col: str = "log_weight",
    id_col: str = "doc_id",
    seed: int = 42,
) -> "DataFrame":
    """Gumbel-threshold resampling: keep rows whose perturbed key
    clears ``min_gumbel_key``.  Thresholding (not exact top-k) keeps
    the selection a stateless projection — no global sort, no window;
    pick the threshold from a driver-side quantile probe when a target
    budget is needed (Gumbel-max: threshold selection IS importance
    resampling without replacement in expectation)."""
    key = gumbel_key_col(log_weight_col, id_col=id_col, seed=seed)
    return df.where(key >= float(min_gumbel_key))
